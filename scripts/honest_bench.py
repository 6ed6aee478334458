"""Honest on-device timing helpers.

The axon tunnel's block_until_ready does not wait for execution (an
8192^3 bf16 matmul "finishes" in 36 us = 30 PFLOP/s, 150x over v5e
peak), so wall timing of single dispatches measures submission, not
compute. Truth = slope of a serialized fori_loop chain inside ONE jit,
with a forced data dependency between iterations, result fetched to
host. The slope between two chain lengths cancels the ~25 ms tunnel
round-trip; min-aggregation over reps rejects its additive noise."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def honest_decode_time(decode_fn, fp, mlp, kbig: int = 64, ksmall: int = 8,
                       reps: int = 7):
    """Per-decode seconds: (T(kbig) - T(ksmall)) / (kbig - ksmall)."""
    def make(k):
        @jax.jit
        def run(fp, mlp):
            def body(i, s):
                fp_ = (fp[0] + s * 1e-30,) + tuple(fp[1:])
                out = decode_fn(fp_, mlp)
                return jnp.sum(out.astype(jnp.float32)) * 1e-9
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        float(run(fp, mlp))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(fp, mlp))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))
    t1, tk = make(ksmall), make(kbig)
    return (tk - t1) / (kbig - ksmall)

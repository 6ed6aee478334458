"""Where does the non-component step time go? (round-3 session 2)

The stage-2 component sum (gather 2.65 + MLP 2.66-2.75 + targets 0.01 +
adam 0.145 + psnr 0.1 + noise ~0.1) explains ~5.8 ms of the measured
7.6 ms step (131.9 steps/s). This probe separates:

  body      fori-slope of the full train_step body (no scan, no history)
  scan      train_many chunk rate (the production number)
  noiseless body with qat_noise monkeypatched to zeros (noise cost
            in-context, including its RNG)
  psnrless  body with tf_write_psnr=False

Run on TPU:  python scripts/r3_step_overhead.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nic.config import CompressionConfig
from nic.cli.image_compression import load_asset
from nic.train.ntc import NTCTrainer
from scripts.profile_train_step import slope_time


def body_rate(cfg, images, patch_noise=False):
    if patch_noise:
        import nic.core.quant as q
        import nic.train.ntc as ntc_mod

        orig = q.qat_noise
        zero_noise = lambda key, shape, bits, dtype: jnp.zeros(shape, dtype)
        q.qat_noise = zero_noise
        ntc_mod.qat_noise = zero_noise
    try:
        tr = NTCTrainer(cfg, images)
        step = tr._build_step(0, False, jit=False)
        s0 = tr.state
        key0 = jax.random.PRNGKey(1)

        def chain(k):
            @jax.jit
            def run():
                def body(i, carry):
                    fp, mlp, ofp, omlp = carry
                    fp, mlp, ofp, omlp, loss, p = step(
                        fp, mlp, ofp, omlp, jax.random.fold_in(key0, i))
                    return (fp, mlp, ofp, omlp)
                out = jax.lax.fori_loop(
                    0, k, body, (s0.fp, s0.mlp, s0.opt_fp, s0.opt_mlp))
                return jnp.sum(out[0][0])
            def timed():
                return run()
            return timed
        t = slope_time(chain, kbig=64, ksmall=4, reps=3)
        return 1.0 / t
    finally:
        if patch_noise:
            q.qat_noise = orig
            ntc_mod.qat_noise = orig


def scan_rate(cfg, images, n=1000):
    tr = NTCTrainer(cfg, images)
    tr.train_many(n, chunk=n)
    t0 = time.perf_counter()
    tr.train_many(n, chunk=n)
    return n / (time.perf_counter() - t0)


def main():
    import json

    base = dict(num_epochs=10**6, mlp_num_dtype=16, qat_noise_where="node",
                rng_impl="rbg", tf_write_psnr=False)
    out = {}
    for fwd in ("gather", "kernel2"):
        cfg = CompressionConfig(train_forward=fwd, **base)
        images = load_asset(cfg)
        out[f"{fwd}_body_steps_s"] = round(body_rate(cfg, images), 2)
        out[f"{fwd}_body_noiseless_steps_s"] = round(
            body_rate(cfg, images, patch_noise=True), 2)
        out[f"{fwd}_scan_steps_s"] = round(scan_rate(cfg, images), 2)
        print({k: v for k, v in out.items() if k.startswith(fwd)},
              flush=True)
    cfg = CompressionConfig(train_forward="gather",
                            **{**base, "tf_write_psnr": True})
    out["gather_body_psnr_steps_s"] = round(
        body_rate(cfg, load_asset(cfg)), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Benchmark: NTC full-image decode throughput on one TPU chip.

Decodes the flagship image_compression configuration (512² image, C=12
grid pyramid 129²+65², PE=6, MLP 73→64→64→3 — the reference's var2.py
defaults) and prints ONE JSON line with the decode throughput in GPix/s.

Two backends are measured:
- the XLA path (grid sampling via per-axis takes + MLP; XLA fuses the
  whole graph) — this is the shape of the reference's decode, so
  ``vs_baseline`` = best / xla_unfused on the same chip (the PyTorch
  reference publishes no numbers of its own, BASELINE.md);
- the fused Pallas kernel, attempted in a SUBPROCESS with a hard timeout
  so a pathological Mosaic compile can never hang the driver's bench run.

The north-star target from BASELINE.json is ≥ 1 GPix/s/chip.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

IMAGE_SIZE = 512        # reference-default size (pallas correctness gate)
BENCH_SIZE = 2048       # headline size: compute-dominated, tunnel-noise-free
CHANNELS, PE, HIDDEN = 12, 6, 64


def _setup(image_size: int = IMAGE_SIZE):
    import jax

    from nic.grids.pyramid import create_pyramid, pyramid_mip_levels
    from nic.models.mlp import init_mlp

    base = image_size // 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    fp, _ = create_pyramid(k1, base, CHANNELS, num_bits=8, ndim=2, no_mip=True)
    mip_to_level = pyramid_mip_levels(image_size, base, no_mip=True)
    mlp = init_mlp(k2, CHANNELS * 5 + PE * 2 + 1, HIDDEN, 3)
    return fp, mlp, mip_to_level


def _throughput(fn, *args, npix: int, iters: int = 30, warmup: int = 5) -> float:
    """Median GPix/s over ``iters`` timed calls (each blocked)."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return npix / float(np.median(times)) / 1e9


def bench_xla(dtype=None, image_size: int = IMAGE_SIZE) -> float:
    import jax
    import jax.numpy as jnp

    from nic.grids.sample import decoder_input
    from nic.models.mlp import apply_mlp

    fp, mlp, _ = _setup(image_size)
    if dtype is not None:
        fp = tuple(g.astype(dtype) for g in fp)
        mlp = jax.tree.map(lambda p: p.astype(dtype), mlp)

    @jax.jit
    def xla_decode(fp, mlp):
        x = decoder_input(
            fp, 0, jnp.zeros((2,), jnp.int32), 0.25, image_size,
            pe_channels=PE, mip_level=0, ndim=2, use_tri_pe=True,
            dtype=dtype or jnp.float32,
        )
        return apply_mlp(mlp, x).reshape(image_size, image_size, 3)

    return _throughput(xla_decode, fp, mlp, npix=image_size * image_size)


def bench_fast(dtype=None, image_size: int = IMAGE_SIZE) -> float:
    """Folded-first-layer decode (nic.grids.fastdecode)."""
    import jax

    from nic.grids.fastdecode import fast_decode

    fp, mlp, mip_to_level = _setup(image_size)
    if dtype is not None:
        fp = tuple(g.astype(dtype) for g in fp)
        mlp = jax.tree.map(lambda p: p.astype(dtype), mlp)

    fn = jax.jit(
        lambda fp, mlp: fast_decode(
            fp, mlp, 0, image_size=image_size, mip_to_level=mip_to_level,
            pe_channels=PE, use_tri_pe=True, ndim=2,
        )
    )
    return _throughput(fn, fp, mlp, npix=image_size * image_size)


def bench_pallas(version: int = 2, dtype=None) -> float:
    import jax
    import jax.numpy as jnp

    from nic.grids.fastdecode import fast_decode

    fp, mlp, mip_to_level = _setup()

    if version == 2:
        from nic.kernels.decode_fused_v2 import decode_image_fused_v2 as k
        kw = {"dtype": dtype}
    else:
        from nic.kernels.decode_fused import decode_image_fused as k
        kw = {}

    def fused(fp, mlp):
        return k(
            fp, mlp, 0, image_size=IMAGE_SIZE, mip_to_level=mip_to_level,
            pe_channels=PE, use_tri_pe=True, **kw,
        )

    # correctness gate vs the folded XLA path before timing
    ref = np.asarray(
        jax.jit(
            lambda fp, mlp: fast_decode(
                fp, mlp, 0, image_size=IMAGE_SIZE, mip_to_level=mip_to_level,
                pe_channels=PE, use_tri_pe=True, ndim=2,
            )
        )(fp, mlp)
    )
    got = np.asarray(fused(fp, mlp))
    max_err = float(np.abs(ref - got).max())
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-3
    if max_err > tol:
        raise RuntimeError(f"fused decode mismatch: max abs err {max_err}")
    return _throughput(fused, fp, mlp)


def bench_train_steps(num_steps: int = 600, mlp_num_dtype: int = 32) -> float:
    """NTC train steps/s at flagship defaults (8 × 256² crops/step,
    fwd+bwd+Adam+clamp, lax.scan-chunked) — the second axis BENCH_r0N
    tracks alongside decode throughput."""
    from nic.cli.image_compression import load_asset
    from nic.config import CompressionConfig
    from nic.train.ntc import NTCTrainer

    cfg = CompressionConfig(num_epochs=10**6, mlp_num_dtype=mlp_num_dtype,
                            rng_impl="rbg")
    trainer = NTCTrainer(cfg, load_asset(cfg))
    trainer.train_many(100, chunk=100)  # compile + warm
    t0 = time.perf_counter()
    trainer.train_many(num_steps, chunk=num_steps)
    return num_steps / (time.perf_counter() - t0)


def main() -> None:
    if "--fused-only" in sys.argv:
        import jax.numpy as jnp

        out = {"fused_gpix_s": bench_pallas(2)}
        try:
            out["fused_bf16_gpix_s"] = bench_pallas(2, jnp.bfloat16)
        except Exception as e:
            out["fused_bf16_note"] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps(out))
        return

    import jax.numpy as jnp

    # headline: 2048² (compute-dominated; 512² is dominated by per-dispatch
    # tunnel latency and jitters ±50%)
    xla_big = bench_xla(image_size=BENCH_SIZE)
    fast_big = bench_fast(image_size=BENCH_SIZE)
    fast_bf16_big = bench_fast(jnp.bfloat16, image_size=BENCH_SIZE)
    xla_gpix = bench_xla()
    fast_gpix = bench_fast()
    fast_bf16_gpix = bench_fast(jnp.bfloat16)

    pallas_gpix = None
    pallas_bf16_gpix = None
    pallas_note = None
    # off by default: the hand kernels are known layout-bound (BASELINE.md);
    # set NIC_BENCH_PALLAS=1 to re-measure them
    if os.environ.get("NIC_BENCH_PALLAS", "0") == "1":
        # subprocess + timeout so a pathological Mosaic compile can't hang
        # the driver's bench run
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--fused-only"],
                capture_output=True, text=True, timeout=420,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if proc.returncode == 0:
                d = json.loads(proc.stdout.strip().splitlines()[-1])
                pallas_gpix = d.get("fused_gpix_s")
                pallas_bf16_gpix = d.get("fused_bf16_gpix_s")
                pallas_note = d.get("fused_bf16_note")
            else:
                pallas_note = proc.stderr.strip().splitlines()[-1][:200] if proc.stderr else "nonzero exit"
        except subprocess.TimeoutExpired:
            pallas_note = "pallas kernel compile timed out (>420s)"
        except Exception as e:  # pragma: no cover
            pallas_note = f"{type(e).__name__}: {e}"

    train_steps_s = bench_train_steps()

    best_big = max(xla_big, fast_big, fast_bf16_big)
    result = {
        "metric": "ntc_decode_throughput_2048px",
        "value": round(best_big, 4),
        "unit": "GPix/s",
        # baseline = the unfused XLA graph (the shape of the reference's
        # own decode); the reference publishes no numbers (BASELINE.md)
        "vs_baseline": round(best_big / xla_big, 3),
        "xla_2048_gpix_s": round(xla_big, 4),
        "fast_2048_gpix_s": round(fast_big, 4),
        "fast_bf16_2048_gpix_s": round(fast_bf16_big, 4),
        "xla_512_gpix_s": round(xla_gpix, 4),
        "fast_512_gpix_s": round(fast_gpix, 4),
        "fast_bf16_512_gpix_s": round(fast_bf16_gpix, 4),
        # NOTE: 512² decode is per-dispatch-latency-bound through the
        # tunnel; the 2048² rows are the compute-throughput numbers.
        "train_steps_s": round(train_steps_s, 2),
    }
    if pallas_gpix is not None:
        result["pallas_gpix_s"] = round(pallas_gpix, 4)
    if pallas_bf16_gpix is not None:
        result["pallas_bf16_gpix_s"] = round(pallas_bf16_gpix, 4)
    if pallas_note:
        result["pallas_note"] = pallas_note
    print(json.dumps(result))


if __name__ == "__main__":
    main()

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

IMAGE_SIZE = 512
CHANNELS, PE, HIDDEN = 12, 6, 64


def _setup():
    import jax

    from nic.grids.pyramid import create_pyramid, pyramid_mip_levels
    from nic.models.mlp import init_mlp

    base = IMAGE_SIZE // 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    fp, _ = create_pyramid(k1, base, CHANNELS, num_bits=8, ndim=2, no_mip=True)
    mip_to_level = pyramid_mip_levels(IMAGE_SIZE, base, no_mip=True)
    mlp = init_mlp(k2, CHANNELS * 5 + PE * 2 + 1, HIDDEN, 3)
    return fp, mlp, mip_to_level


def _throughput(fn, *args, iters: int = 50, warmup: int = 5) -> float:
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
    npix = IMAGE_SIZE * IMAGE_SIZE
    return npix / float(np.median(times)) / 1e9


def bench_xla() -> float:
    import jax
    import jax.numpy as jnp

    from nic.grids.sample import decoder_input
    from nic.models.mlp import apply_mlp

    fp, mlp, _ = _setup()

    @jax.jit
    def xla_decode(fp, mlp):
        x = decoder_input(
            fp, 0, jnp.zeros((2,), jnp.int32), 0.25, IMAGE_SIZE,
            pe_channels=PE, mip_level=0, ndim=2, use_tri_pe=True,
        )
        return apply_mlp(mlp, x).reshape(IMAGE_SIZE, IMAGE_SIZE, 3)

    return _throughput(xla_decode, fp, mlp)


def bench_fused() -> float:
    import jax

    from nic.kernels.decode_fused import decode_image_fused

    fp, mlp, mip_to_level = _setup()

    def fused(fp, mlp):
        return decode_image_fused(
            fp, mlp, 0, image_size=IMAGE_SIZE, mip_to_level=mip_to_level,
            pe_channels=PE, use_tri_pe=True,
        )

    # correctness gate vs the XLA path before timing
    import jax.numpy as jnp

    from nic.grids.sample import decoder_input
    from nic.models.mlp import apply_mlp

    @jax.jit
    def xla_decode(fp, mlp):
        x = decoder_input(
            fp, 0, jnp.zeros((2,), jnp.int32), 0.25, IMAGE_SIZE,
            pe_channels=PE, mip_level=0, ndim=2, use_tri_pe=True,
        )
        return apply_mlp(mlp, x).reshape(IMAGE_SIZE, IMAGE_SIZE, 3)

    ref = np.asarray(xla_decode(fp, mlp))
    got = np.asarray(fused(fp, mlp))
    max_err = float(np.abs(ref - got).max())
    if max_err > 1e-3:
        raise RuntimeError(f"fused decode mismatch: max abs err {max_err}")
    return _throughput(fused, fp, mlp)


def main() -> None:
    if "--fused-only" in sys.argv:
        print(json.dumps({"fused_gpix_s": bench_fused()}))
        return

    xla_gpix = bench_xla()
    fused_gpix = None
    fused_note = None
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--fused-only"],
            capture_output=True, text=True, timeout=420,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if proc.returncode == 0:
            fused_gpix = json.loads(proc.stdout.strip().splitlines()[-1])["fused_gpix_s"]
        else:
            fused_note = proc.stderr.strip().splitlines()[-1][:200] if proc.stderr else "nonzero exit"
    except subprocess.TimeoutExpired:
        fused_note = "fused kernel compile timed out (>420s)"
    except Exception as e:  # pragma: no cover
        fused_note = f"{type(e).__name__}: {e}"

    best = max(xla_gpix, fused_gpix or 0.0)
    result = {
        "metric": "ntc_decode_throughput_512px",
        "value": round(best, 4),
        "unit": "GPix/s",
        "vs_baseline": round(best / xla_gpix, 3),
        "xla_gpix_s": round(xla_gpix, 4),
    }
    if fused_gpix is not None:
        result["fused_gpix_s"] = round(fused_gpix, 4)
    if fused_note:
        result["fused_note"] = fused_note
    print(json.dumps(result))


if __name__ == "__main__":
    main()

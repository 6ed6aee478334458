"""Benchmark: fused NTC decode throughput on one TPU chip.

Decodes the flagship image_compression configuration (512² image, C=12
grid pyramid 129²+65², PE=6, MLP 73→64→64→3 — var2.py defaults of the
reference) with the fused Pallas kernel and with the plain XLA path, and
prints ONE JSON line with the fused throughput in GPix/s.

``vs_baseline`` is measured against the reference's own decode: the
PyTorch reference decodes through an unfused gather+concat+MLP graph; its
own hardware numbers don't exist (BASELINE.md — nothing published), so the
honest baseline is our measured XLA unfused path on the same chip
(vs_baseline = fused / xla_unfused).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _bench(fn, *args, iters: int = 20, warmup: int = 3) -> float:
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from nic.grids.pyramid import create_pyramid, pyramid_mip_levels
    from nic.grids.sample import decoder_input
    from nic.kernels.decode_fused import decode_image_fused
    from nic.models.mlp import apply_mlp, init_mlp

    image_size = 512
    base = image_size // 4
    channels, pe, hidden = 12, 6, 64
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    fp, _ = create_pyramid(k1, base, channels, num_bits=8, ndim=2, no_mip=True)
    mip_to_level = pyramid_mip_levels(image_size, base, no_mip=True)
    mlp = init_mlp(k2, channels * 5 + pe * 2 + 1, hidden, 3)
    npix = image_size * image_size

    # --- XLA unfused path (the shape of the reference's decode graph) ---
    @jax.jit
    def xla_decode(fp, mlp):
        x = decoder_input(
            fp, 0, jnp.zeros((2,), jnp.int32), 0.25, image_size,
            pe_channels=pe, mip_level=0, ndim=2, use_tri_pe=True,
        )
        return apply_mlp(mlp, x).reshape(image_size, image_size, 3)

    t_xla = _bench(xla_decode, fp, mlp)
    xla_gpix = npix / t_xla / 1e9

    # --- fused Pallas kernel ---
    fused_gpix = None
    err = None
    try:
        def fused(fp, mlp):
            return decode_image_fused(
                fp, mlp, 0, image_size=image_size, mip_to_level=mip_to_level,
                pe_channels=pe, use_tri_pe=True,
            )

        ref = np.asarray(xla_decode(fp, mlp))
        got = np.asarray(fused(fp, mlp))
        max_err = float(np.abs(ref - got).max())
        if max_err > 1e-3:
            raise RuntimeError(f"fused decode mismatch: max abs err {max_err}")
        t_fused = _bench(fused, fp, mlp)
        fused_gpix = npix / t_fused / 1e9
    except Exception as e:  # pragma: no cover - report, fall back
        err = f"{type(e).__name__}: {e}"

    if fused_gpix is not None:
        result = {
            "metric": "fused_decode_throughput_512px",
            "value": round(fused_gpix, 4),
            "unit": "GPix/s",
            "vs_baseline": round(fused_gpix / xla_gpix, 3),
            "xla_unfused_gpix_s": round(xla_gpix, 4),
        }
    else:
        result = {
            "metric": "xla_decode_throughput_512px",
            "value": round(xla_gpix, 4),
            "unit": "GPix/s",
            "vs_baseline": 1.0,
            "fused_error": err,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

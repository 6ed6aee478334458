"""Decoder-only runtime: decode a compressed artifact without any training
state — the "ship it" loader (SURVEY.md §5 checkpoint row: one artifact
format, loader = decoder-only runtime).

Run:
  python -m nic.cli.decode runs/artifacts/name.npz --mip 0 --out out.png
  python -m nic.cli.decode art.npz --backend pallas     # fused kernel
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def run(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("artifact")
    p.add_argument("--mip", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument("--backend", choices=["auto", "fast", "xla", "pallas"],
                   default="auto",
                   help="auto = fused Pallas kernel on TPU (the fastest "
                        "backend, BASELINE.md), folded XLA path elsewhere")
    p.add_argument("--gelu",
                   choices=["exact", "tanh", "quick", "poly", "erfpoly",
                            "tanherf"],
                   default="exact",
                   help="pallas backend GELU: 'tanh'/'poly' are ~2x faster "
                        "with error well under one 8-bit quantization step; "
                        "'tanherf' (erf routed through the cheap hardware "
                        "tanh, |Δgelu| ≤ 1.4e-6) and 'erfpoly' "
                        "(|Δgelu| < 1e-6) are the exact-class modes")
    p.add_argument("--dtype", choices=["fp32", "bf16", "i16", "surgical"],
                   default="fp32",
                   help="pallas plane pipeline: fp32 (default, exact), "
                        "bf16 (single storage rounding, fastest), i16 "
                        "(int16 fixed-point planes + bf16 MXU dots — "
                        "surgical-class accuracy at bf16 speed; 2D and "
                        "3D), or surgical (fp32 planes, bf16 MXU dots; "
                        "2D only)")
    p.add_argument("--image_size", type=int, default=None,
                   help="override the stored image size")
    p.add_argument("--devices", type=int, default=1,
                   help="shard the pallas decode over this many local "
                        "devices (rows in 2D, frames in 3D — "
                        "nic.kernels.decode_sharded); 1 = single device")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from nic.grids.pyramid import pyramid_mip_levels
    from nic.grids.sample import decoder_input
    from nic.io.artifacts import load_compressed
    from nic.models.mlp import apply_mlp

    mlp, fp, meta = load_compressed(args.artifact)
    cfg_meta = meta.get("config", {})
    image_size = args.image_size or cfg_meta.get("image_size")
    image_size_w = cfg_meta.get("image_size_w", 0)
    if image_size is None:
        # infer 2D size from the G0 grid: base = size-1, image = 4*base
        image_size = (fp[0].shape[1] - 1) * 4
    pe_channels = cfg_meta.get("pe_channels", 6)
    no_mip = cfg_meta.get("tf_no_mip", len(fp) == 2)
    base = fp[0].shape[1] - 1
    mip_to_level = pyramid_mip_levels(image_size, base, no_mip)
    ndim = fp[0].ndim - 1
    # decode-graph switches come from the SAME rule the trainer used
    # (method 4 → sparse G0 + sinusoidal PE; 3D method 3 → triangular),
    # not the raw TF_USE_TRI_PE flag — a method-3 3D artifact trained with
    # TF_USE_TRI_PE=False must still decode with triangular PE
    from nic.grids.sample import effective_pe_flags

    use_tri_pe, sparse_g0 = effective_pe_flags(
        cfg_meta.get("compression_method", 1 if ndim == 2 else 3),
        ndim, cfg_meta.get("tf_use_tri_pe", True),
    )

    mip = args.mip
    fl = mip_to_level[mip]
    step = 2.0 ** (mip - (fl + 1) * 2)
    n = image_size // (2**mip)
    isz_2d = (
        (image_size, image_size_w)
        if image_size_w and image_size_w != image_size else image_size
    )

    backend = args.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "fast"
    pdtype = {"fp32": None, "bf16": jnp.bfloat16, "i16": "i16",
              "surgical": "surgical"}[args.dtype]
    if ndim != 2 and args.dtype == "surgical":
        pdtype = None  # surgical is a 2D-kernel mode; 3D stays fp32
    rect = bool(image_size_w) and image_size_w != image_size
    if rect and (ndim != 2 or backend == "xla"):
        # rectangular is 2D; the unfused xla path is square-only — route
        # rect to the folded path there (the fused v2 kernel takes
        # rectangular geometry natively since round 5)
        backend = "fast"
    if backend == "pallas" and ndim == 2 and sparse_g0:
        # sparse G0 is 3D-only in the reference; no 2D kernel covers it
        backend = "fast"
    # never drop a requested plane dtype silently (a user benchmarking
    # "--dtype i16" off-TPU or on an xla-routed artifact would otherwise
    # measure the fp32 pipeline and not know it)
    if args.dtype != "fp32" and backend != "pallas":
        print(f"note: --dtype {args.dtype} applies to the pallas backend "
              f"only; resolved backend '{backend}' decodes fp32", flush=True)
    elif ndim != 2 and args.dtype == "surgical":
        print("note: --dtype surgical is a 2D-kernel mode; this 3D decode "
              "runs fp32 planes", flush=True)
    if backend == "pallas":
        # the kernel entries fall back to folded XLA (fp32, no plane
        # dtype) on thumbnail-mip/odd geometries — say so up front
        # instead of printing backend=pallas over an fp32 decode
        if ndim == 2:
            from nic.kernels.decode_fused_v2 import kernel_covers_2d

            covered = kernel_covers_2d(mip, isz_2d, mip_to_level,
                                       mlp["w2"].shape[0])
        else:
            from nic.kernels.decode_fused_3d import kernel_covers_3d

            covered = kernel_covers_3d(mip, image_size, mip_to_level,
                                       mlp["w2"].shape[0])
        if not covered:
            note = (f" (--dtype {args.dtype} does not apply there)"
                    if args.dtype != "fp32" else "")
            print(f"note: mip {mip} geometry is outside the fused "
                  f"kernel's gate — decoding via the folded-XLA fp32 "
                  f"fallback{note}", flush=True)
    if backend == "pallas" and args.devices > 1:
        from nic.kernels.decode_sharded import (decode_image_fused_sharded,
                                                decode_volume_fused_sharded)
        from nic.parallel.mesh import make_mesh

        mesh = make_mesh(args.devices, data_axis=args.devices)
        if ndim == 3:
            decode = jax.jit(
                lambda fp, mlp: decode_volume_fused_sharded(
                    fp, mlp, mip, mesh, image_size=image_size,
                    mip_to_level=mip_to_level, pe_channels=pe_channels,
                    use_tri_pe=use_tri_pe, sparse_g0=sparse_g0,
                    gelu=args.gelu, dtype=pdtype,
                )
            )
        else:
            decode = jax.jit(
                lambda fp, mlp: decode_image_fused_sharded(
                    fp, mlp, mip, mesh, image_size=isz_2d,
                    mip_to_level=mip_to_level, pe_channels=pe_channels,
                    use_tri_pe=use_tri_pe, gelu=args.gelu, dtype=pdtype,
                )
            )
    elif backend == "pallas":
        if ndim == 3:
            from nic.kernels.decode_fused_3d import decode_volume_fused

            decode = jax.jit(
                lambda fp, mlp: decode_volume_fused(
                    fp, mlp, mip, image_size=image_size,
                    mip_to_level=mip_to_level, pe_channels=pe_channels,
                    use_tri_pe=use_tri_pe, sparse_g0=sparse_g0,
                    gelu=args.gelu, dtype=pdtype,
                )
            )
        else:
            from nic.kernels.decode_fused_v2 import decode_image_fused_v2

            decode = jax.jit(
                lambda fp, mlp: decode_image_fused_v2(
                    fp, mlp, mip, image_size=isz_2d,
                    mip_to_level=mip_to_level, pe_channels=pe_channels,
                    use_tri_pe=use_tri_pe, gelu=args.gelu, dtype=pdtype,
                )
            )
    elif backend == "fast":
        from nic.grids.fastdecode import fast_decode

        rect_n = (
            tuple(s // (2**mip) for s in (image_size, image_size_w))
            if image_size_w and ndim == 2 else None
        )
        decode = jax.jit(
            lambda fp, mlp: fast_decode(
                fp, mlp, mip, image_size=image_size, mip_to_level=mip_to_level,
                pe_channels=pe_channels, use_tri_pe=use_tri_pe, ndim=ndim,
                sparse_g0=sparse_g0, n=rect_n,
            )
        )
    else:
        @jax.jit
        def decode(fp, mlp):
            x = decoder_input(
                fp, fl, jnp.zeros((ndim,), jnp.int32), step, n,
                pe_channels=pe_channels, mip_level=mip, ndim=ndim,
                use_tri_pe=use_tri_pe, sparse_g0=sparse_g0,
            )
            return apply_mlp(mlp, x).reshape((n,) * ndim + (3,))

    import contextlib

    ctx = contextlib.nullcontext()
    if backend == "pallas" and jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
    with ctx:
        out = jax.block_until_ready(decode(fp, mlp))  # includes compile
        t0 = time.perf_counter()
        out = jax.block_until_ready(decode(fp, mlp))
        dt = time.perf_counter() - t0
        # SDC guard (nic.obs.integrity): the decoded image is the
        # product; require two bit-identical executions (round-3
        # axon-tunnel finding, NOTES_r3.md)
        from nic.obs.integrity import verified_result

        out = verified_result(lambda: np.asarray(decode(fp, mlp)),
                              warn=print)
    rec = np.clip(np.asarray(out, np.float32), 0, 1)
    npix = rec.size // 3
    # NOTE: wall time of one dispatch; through the axon tunnel this is a
    # submission rate, not device throughput — bench.py's fori-slope
    # harness measures the honest numbers (BASELINE.md)
    print(f"decoded {rec.shape} in {dt*1e3:.2f} ms wall "
          f"({npix/dt/1e9:.3f} GPix/s submission rate, "
          f"backend={backend}; honest numbers: bench.py)")
    if args.out:
        from nic.data.assets import save_png, write_timelaps

        u8 = (rec * 255 + 0.5).astype(np.uint8)
        if ndim == 2:
            save_png(u8, args.out)
        else:
            write_timelaps(u8, args.out)
        print(f"wrote {args.out}")
    return rec


if __name__ == "__main__":
    run(sys.argv[1:])

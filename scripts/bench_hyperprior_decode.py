"""Hyperprior codec end-to-end DECODE throughput (VERDICT r2 Missing #5).

Times ``HyperpriorCodec.decompress`` — host rANS z-decode → device
hyper-synthesis → host rANS y-decode → device synthesis → host image —
on a trained checkpoint. Every stage materializes its result on the host
(np.asarray), so plain wall-clock IS honest here, unlike device-only
graphs (the round-2 methodology note in bench.py applies to timing
un-fetched device work; this pipeline fetches at each stage by
construction). Median of ``--iters`` runs after a warmup.

Also reports the stage split (rANS vs transforms) so BASELINE.md can say
where the decode budget goes.

Usage (TPU):  python scripts/bench_hyperprior_decode.py \
    --ckpt runs/ckpt/hyperprior_lam0.018_n96_m128 --lam 0.018
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/ckpt/hyperprior_lam0.018_n96_m128")
    ap.add_argument("--lam", type=float, default=0.018)
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--image", default="data/sancho_512.png")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from PIL import Image

    from nic.io.artifacts import CheckpointManager
    from nic.train.hyperprior import HyperpriorCodec, HyperpriorTrainer

    trainer = HyperpriorTrainer(n=args.n, m=args.m, lam=args.lam,
                                patch=64, batch=1, seed=0)
    ckpt = args.ckpt
    if os.path.isdir(ckpt):
        newest = CheckpointManager(ckpt).paths_newest_first()
        if not newest:
            raise FileNotFoundError(f"no checkpoints under {ckpt}")
        ckpt = newest[0]
    trainer.load_checkpoint(ckpt)
    codec = HyperpriorCodec(trainer)

    img = np.asarray(Image.open(args.image).convert("RGB"), np.float32) / 255.0
    px = img.shape[0] * img.shape[1]
    blob = codec.compress(img)

    # correctness gate: decompress must reproduce the quantized eval
    rec = codec.decompress(blob)
    mse = float(np.mean((rec - img) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))

    codec.decompress(blob)  # warm (jit compiles)
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        codec.decompress(blob)
        times.append(time.perf_counter() - t0)
    t_e2e = float(np.median(times))

    # stage split: rANS alone, transforms alone
    import jax.numpy as jnp

    from nic.io import entropy as ec
    from nic.native import rans_decode

    n_ch = blob["z_shape"][-1]
    cdf_z = ec.logistic_cdf_table(
        np.asarray(codec._z_mu), np.asarray(codec._z_log_s), blob["a_z"])
    count_z = int(np.prod(blob["z_shape"]))
    bins_z = np.tile(np.arange(n_ch, dtype=np.int32), count_z // n_ch)
    z_hat = (rans_decode(blob["z"], bins_z, cdf_z) - blob["a_z"]).reshape(
        blob["z_shape"])
    # σ→bin mapping rides the jitted hyper-synthesis on device (codec
    # _h_s_bins) — the decoder never fetches σ itself
    bins_y = np.asarray(
        codec._h_s_bins(jnp.asarray(z_hat, np.float32))).reshape(-1)
    cdf_y = ec.gaussian_cdf_table(blob["a_y"])

    def stage_time(fn, iters):
        fn()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_rans = stage_time(
        lambda: (rans_decode(blob["z"], bins_z, cdf_z),
                 rans_decode(blob["y"], bins_y, cdf_y)), args.iters)
    y_hat = (rans_decode(blob["y"], bins_y, cdf_y) - blob["a_y"]).reshape(
        blob["y_shape"])
    t_xform = stage_time(
        lambda: (np.asarray(codec._h_s_bins(jnp.asarray(z_hat, np.float32))),
                 np.asarray(codec._g_s(jnp.asarray(y_hat, np.float32)))),
        args.iters)
    # host glue that a co-located deployment still pays: symbol→latent
    # arithmetic + reshapes + the (cached) table lookups
    y_syms = rans_decode(blob["y"], bins_y, cdf_y)
    z_syms = rans_decode(blob["z"], bins_z, cdf_z)

    def glue():
        ec.gaussian_cdf_table(blob["a_y"])
        zz = (z_syms - blob["a_z"]).reshape(blob["z_shape"])
        yy = (y_syms - blob["a_y"]).reshape(blob["y_shape"])
        np.tile(np.arange(n_ch, dtype=np.int32), count_z // n_ch)
        return zz, yy

    t_glue = stage_time(glue, args.iters)

    # device-only transform time (fori_loop slope, the bench.py
    # methodology): separates actual conv compute from the tunnel's
    # per-call H2D/D2H staging, which the wall numbers above include
    import jax

    m, p = trainer.model, trainer.params
    zj = jnp.asarray(z_hat, np.float32)
    yj = jnp.asarray(y_hat, np.float32)

    def slope(fn, arg, kbig=24, ksmall=2, reps=5):
        def make(k):
            @jax.jit
            def run(a):
                def body(i, s):
                    out = fn(a + s * 1e-30)
                    return jnp.sum(out.astype(jnp.float32)) * 1e-9
                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
            float(run(arg))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(run(arg))
                ts.append(time.perf_counter() - t0)
            return float(np.min(ts))
        t1, tk = make(ksmall), make(kbig)
        return (tk - t1) / (kbig - ksmall)

    t_hs_dev = slope(lambda z: m.apply(p, z, method=m.hyper_synthesis), zj)
    t_gs_dev = slope(lambda y: m.apply(p, y, method=m.synthesis), yj)

    print(json.dumps({
        "ckpt": ckpt, "image": args.image, "pixels": px,
        "psnr_roundtrip": round(psnr, 4),
        "bpp_bitstream": round(codec.num_bits(blob) / px, 4),
        "decode_ms_e2e": round(t_e2e * 1e3, 3),
        "decode_mpix_s": round(px / t_e2e / 1e6, 3),
        "rans_ms": round(t_rans * 1e3, 3),
        "transforms_ms": round(t_xform * 1e3, 3),
        "hyper_synthesis_device_ms": round(t_hs_dev * 1e3, 3),
        "synthesis_device_ms": round(t_gs_dev * 1e3, 3),
        "device_mpix_s": round(px / (t_hs_dev + t_gs_dev) / 1e6, 3),
        "host_glue_ms": round(t_glue * 1e3, 3),
        # co-located ceiling: host rANS + device transforms + host glue
        # (the tunnel's per-call staging excluded — a co-located host
        # pays PCIe microseconds, not tunnel milliseconds; methodology
        # as the round-3 97 MPix/s figure)
        "colocated_mpix_s": round(
            px / (t_rans + t_hs_dev + t_gs_dev + t_glue) / 1e6, 3),
        "iters": args.iters,
    }))


if __name__ == "__main__":
    main()

"""Stage-3 breakdown of the 3D (spatiotemporal) train step.

The 2D stage-3 profile (BASELINE.md, r4 queue1) attributed the kernel2
step and motivated kernel3 (in-kernel feature build, 230 → 408 steps/s).
The 3D path still rides kernel2 and runs ~7× more ns/pixel than 2D
(m3 112.7 steps/s × 262k px = 34 ns/px vs 2D's 4.7); nobody has measured
WHERE. Same fori-slope methodology as scripts/r3_stage3_profile.py, on
the misty-64³ protocol (8 × 32³ crops/step, the `.bat` grid's
CROP_MIP_LEVEL=5):

  feat_fwd        gather+PE forward (8-corner trilinear, [N, 127])
  noise_feat      the [N, F] feature-noise draw (the config default)
  noise_node      node-resolution alternative (two grid draws)
  targets         crop target dynamic_slices
  k3d_fwd         fused_mlp_loss_ng3 primal (kernel + XLA staging)
  k3d_fwd_bwd     value_and_grad wrt (g0, g1, mlp) — kernel + 3D unfold
  loss_fwd_bwd    the trainer's full loss_fn fwd+bwd
  adam_clamp      optax two-chain update + pyramid clamp
  step_rate       train_many steps/s at the same config

Run on TPU:  python scripts/r4_stage3_3d.py [--method 3|4] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def slope_time(make_chain, kbig=24, ksmall=2, reps=5):
    def run_k(k):
        fn = make_chain(k)
        float(fn())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn())
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))
    t1, tk = run_k(ksmall), run_k(kbig)
    return (tk - t1) / (kbig - ksmall)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--method", type=int, default=3, choices=(3, 4))
    args = ap.parse_args()
    kb, ks = (10, 2) if args.quick else (24, 2)

    import optax

    from nic.cli.image_compression import load_asset
    from nic.config import CompressionConfig
    from nic.core.quant import qat_noise
    from nic.grids import pyramid as fp_lib
    from nic.grids.sample import decoder_input
    from nic.kernels.train_fused import fused_mlp_loss_ng3, pick_block_rows
    from nic.train.ntc import NTCTrainer

    cfg = CompressionConfig(
        num_epochs=10**6, mlp_num_dtype=16, train_forward="kernel2",
        rng_impl="rbg", tf_write_psnr=False, compression_method=args.method,
        image_dimension=3, image_path="data/misty_64_64.avi", image_size=64,
        max_mip_level=6, crop_mip_level=5)
    images = load_asset(cfg)
    tr = NTCTrainer(cfg, images)
    fl, n, step = tr._geometry(0)
    ndim, num_crops = tr.ndim, cfg.num_crops
    assert ndim == 3
    sparse_g0 = tr._sparse_g0()
    fp, mlp = tr.state.fp, tr.state.mlp
    dataset = tr.images[0]
    data_size = dataset.shape[1]
    npix = num_crops * n**ndim
    nfeat = cfg.decoder_input_channels
    matmul_dtype = jnp.bfloat16
    # replicate the trainer's 3D kernel2 gate (ntc._k2_gate, ndim==3)
    f = int(round(1.0 / step))
    rows_cap = pick_block_rows(npix)
    rowsb = min(max(rows_cap // (n * n), 1), n)
    key0 = jax.random.PRNGKey(0)
    origins0 = jax.random.randint(key0, (num_crops, ndim), 0,
                                  data_size - n + 1)

    def noised(fp_t, nk):
        k0, k1 = jax.random.split(nk)
        fp_l = list(fp_t)
        fp_l[fl * 2] = fp_l[fl * 2] + qat_noise(
            k0, fp_l[fl * 2].shape, cfg.fp_bits, jnp.float32)
        fp_l[fl * 2 + 1] = fp_l[fl * 2 + 1] + qat_noise(
            k1, fp_l[fl * 2 + 1].shape, cfg.fp_bits, jnp.float32)
        return tuple(fp_l)

    def gather_only(fp_t, origins):
        def one(origin):
            return decoder_input(
                fp_t, fl, origin, step, n, pe_channels=cfg.pe_channels,
                mip_level=0, ndim=ndim, use_tri_pe=cfg.tf_use_tri_pe,
                sparse_g0=sparse_g0, dtype=jnp.float32,
                g1_quirk=cfg.tf_g1_quirk)
        return jax.vmap(one)(origins).reshape(npix, nfeat)

    def targets(origins):
        def one(origin):
            start = (jnp.zeros((), jnp.int32),) + tuple(origin)
            return jax.lax.dynamic_slice(dataset, start, (3,) + (n,) * ndim)
        t = jax.vmap(one)(origins)
        return jnp.moveaxis(t, 1, -1).reshape(npix, 3)

    x0 = jax.jit(lambda: gather_only(fp, origins0))()
    tgt0 = jax.jit(lambda: targets(origins0))()

    comps = {}

    def chain(body):
        def make(k):
            @jax.jit
            def run():
                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
            return run
        return make

    comps["feat_fwd"] = chain(
        lambda i, s: s + jnp.sum(gather_only(
            (fp[0] + s * 1e-30,) + tuple(fp[1:]), origins0)) * 1e-9)
    comps["noise_feat"] = chain(
        lambda i, s: s + jnp.sum(qat_noise(
            jax.random.fold_in(key0, i + jnp.int32(s * 1e-30)),
            (npix, nfeat), cfg.fp_bits, jnp.float32)) * 1e-9)
    comps["noise_node"] = chain(
        lambda i, s: s + sum(
            jnp.sum(g) for g in noised(
                (fp[0] + s * 1e-30,) + tuple(fp[1:]),
                jax.random.fold_in(key0, i))[fl * 2:fl * 2 + 2]) * 1e-9)
    comps["targets"] = chain(
        lambda i, s: s + jnp.sum(targets(
            (origins0 + jnp.int32(s * 1e-30)) % (data_size - n + 1))) * 1e-9)

    def k3d_call(g0, g1, mlp_, x):
        return fused_mlp_loss_ng3(
            g0, g1, mlp_, jax.lax.stop_gradient(x), tgt0, origins0,
            num_crops, n, rowsb, f, sparse_g0, matmul_dtype, cfg.train_gelu)

    comps["k3d_fwd"] = chain(
        lambda i, s: s + k3d_call(fp[fl * 2], fp[fl * 2 + 1], mlp,
                                  x0 + s * 1e-30)[0])

    k3d_grad = jax.value_and_grad(
        lambda g0, g1, m, x: k3d_call(g0, g1, m, x)[0], argnums=(0, 1, 2))

    def k3d_bwd_body(i, s):
        loss, (gg0, gg1, gm) = k3d_grad(fp[fl * 2], fp[fl * 2 + 1], mlp,
                                        x0 + s * 1e-30)
        return (s + loss + jnp.sum(gg0) * 1e-9 + jnp.sum(gg1) * 1e-9
                + jnp.sum(gm["w1"]) * 1e-9)
    comps["k3d_fwd_bwd"] = chain(k3d_bwd_body)

    def full_loss(fp_t, mlp_, origins, nk):
        x = gather_only(fp_t, origins).astype(jnp.float32) + qat_noise(
            nk, (npix, nfeat), cfg.fp_bits, jnp.float32)
        return fused_mlp_loss_ng3(
            fp_t[fl * 2], fp_t[fl * 2 + 1], mlp_,
            jax.lax.stop_gradient(x), targets(origins), origins,
            num_crops, n, rowsb, f, sparse_g0, matmul_dtype,
            cfg.train_gelu)[0]

    full_grad = jax.value_and_grad(full_loss, argnums=(0, 1))

    def full_body(i, s):
        loss, (gfp, gm) = full_grad(
            (fp[0] + s * 1e-30,) + tuple(fp[1:]), mlp, origins0,
            jax.random.fold_in(key0, i))
        return (s + loss + jnp.sum(gfp[fl * 2]) * 1e-9
                + jnp.sum(gm["w1"]) * 1e-9)
    comps["loss_fwd_bwd"] = chain(full_body)

    loss0, (gfp0, gmlp0) = jax.jit(
        lambda: full_grad(fp, mlp, origins0, key0))()
    opt_fp0, opt_mlp0 = tr.state.opt_fp, tr.state.opt_mlp

    def adam_body(i, s):
        gfp = tuple(g + s * 1e-30 for g in gfp0)
        upd_fp, _ = tr._tx_fp.update(gfp, opt_fp0, fp)
        fp2 = optax.apply_updates(fp, upd_fp)
        gmlp = {k: v + s * 1e-30 for k, v in gmlp0.items()}
        upd_mlp, _ = tr._tx_mlp.update(gmlp, opt_mlp0, mlp)
        mlp2 = optax.apply_updates(mlp, upd_mlp)
        fp2 = fp_lib.pyramid_clamp(fp2, fl, cfg.fp_bits)
        return s + jnp.sum(fp2[fl * 2]) * 1e-9 + jnp.sum(mlp2["w1"]) * 1e-9
    comps["adam_clamp"] = chain(adam_body)

    out = {"method": args.method, "pixels_per_step": npix, "rowsb": rowsb,
           "f": f, "nfeat": nfeat}
    for name, make in comps.items():
        t = slope_time(make, kbig=kb, ksmall=ks)
        out[f"{name}_ms"] = round(t * 1e3, 3)
        print(f"{name}: {out[f'{name}_ms']} ms", file=sys.stderr, flush=True)

    nsteps = 500 if args.quick else 2000
    tr2 = NTCTrainer(cfg, images)
    tr2.train_many(nsteps, chunk=nsteps)
    t0 = time.perf_counter()
    tr2.train_many(nsteps, chunk=nsteps)
    rate = nsteps / (time.perf_counter() - t0)
    out["step_rate"] = round(rate, 2)
    out["step_ms"] = round(1e3 / rate, 3)
    print(f"step_rate: {out['step_rate']} steps/s ({out['step_ms']} ms)",
          file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

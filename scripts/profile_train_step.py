"""Where does the NTC train step's time go? (VERDICT r2 Missing #6)

Honest on-device component ablation of the flagship train step (8 × 256²
crops = 524k px/step). jax.profiler traces are unreliable through the
axon tunnel, so this uses the fori_loop-slope methodology from
scripts/honest_bench.py on each component in isolation:

  feature_build   vmapped decoder_input → [524k, 73]  (gathers + PE)
  noise_draw      qat_noise [524k, 73]                (RNG)
  mlp_fwd         apply_mlp on a prebuilt [524k, 73]  (3 matmuls + GELU)
  fwd_loss        feature_build + noise + mlp + MSE
  fwd_bwd         value_and_grad of fwd_loss wrt (fp, mlp)
  full step       train_many steps/s (loss history fetched → honest)

plus full-step steps/s for the round-3 variants (TRAIN_FORWARD=folded,
QAT_NOISE_WHERE=node, RNG_IMPL=rbg) at fp32 and surgical bf16.

Run on TPU:  python scripts/profile_train_step.py [--quick]
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
    """Seconds per iteration: slope of a serialized fori_loop chain."""
    def run_k(k):
        fn = make_chain(k)
        float(fn())  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn())
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))
    t1, tk = run_k(ksmall), run_k(kbig)
    return (tk - t1) / (kbig - ksmall)


def build_components(cfg, images):
    from nic.core.quant import qat_noise
    from nic.grids.sample import decoder_input
    from nic.models.mlp import apply_mlp
    from nic.train.ntc import NTCTrainer

    tr = NTCTrainer(cfg, images)
    fl, n, step = tr._geometry(0)
    ndim, num_crops = tr.ndim, cfg.num_crops
    fp, mlp = tr.state.fp, tr.state.mlp
    dataset = tr.images[0]
    data_size = dataset.shape[1]
    key0 = jax.random.PRNGKey(0)
    origins0 = jax.random.randint(key0, (num_crops, ndim), 0,
                                  data_size - n + 1)
    nfeat = mlp["w1"].shape[0]
    npix = num_crops * n**ndim
    mixed = cfg.mlp_num_dtype == 16
    matmul_dtype = jnp.bfloat16 if mixed else None

    def make_features(grid_vjp="scatter"):
        def features(fp, origins):
            def one(origin):
                return decoder_input(
                    fp, fl, origin, step, n, pe_channels=cfg.pe_channels,
                    mip_level=0, ndim=ndim, use_tri_pe=cfg.tf_use_tri_pe,
                    dtype=jnp.float32, g1_quirk=cfg.tf_g1_quirk,
                    grid_vjp=grid_vjp)
            return jax.vmap(one)(origins).reshape(npix, nfeat)
        return features

    features = make_features()

    def targets(origins):
        def one(origin):
            start = (jnp.zeros((), jnp.int32),) + tuple(origin)
            return jax.lax.dynamic_slice(dataset, start, (3,) + (n,) * ndim)
        t = jax.vmap(one)(origins)
        return jnp.moveaxis(t, 1, -1).reshape(npix, 3)

    def loss_fn(fp, mlp, origins, nkey):
        x = features(fp, origins)
        x = x + qat_noise(nkey, x.shape, cfg.fp_bits, jnp.float32)
        out = apply_mlp(mlp, x, matmul_dtype=matmul_dtype)
        return jnp.mean((out - targets(origins)) ** 2)

    comps = {}

    def chain(body):
        def make(k):
            @jax.jit
            def run():
                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
            return run
        return make

    comps["feature_build"] = chain(
        lambda i, s: s + jnp.sum(features(
            (fp[0] + s * 1e-30,) + tuple(fp[1:]), origins0)) * 1e-9)
    comps["noise_draw"] = chain(
        lambda i, s: s + jnp.sum(qat_noise(
            jax.random.fold_in(key0, i), (npix, nfeat), cfg.fp_bits,
            jnp.float32)) * 1e-9 + s * 1e-30)
    x0 = jax.jit(lambda: features(fp, origins0))()
    comps["mlp_fwd"] = chain(
        lambda i, s: s + jnp.sum(apply_mlp(
            mlp, x0 + s * 1e-30, matmul_dtype=matmul_dtype)) * 1e-9)
    comps["fwd_loss"] = chain(
        lambda i, s: s + loss_fn(
            (fp[0] + s * 1e-30,) + tuple(fp[1:]), mlp, origins0,
            jax.random.fold_in(key0, i)))
    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

    def bwd_body(i, s):
        loss, (gfp, gmlp) = grad_fn(
            (fp[0] + s * 1e-30,) + tuple(fp[1:]), mlp, origins0,
            jax.random.fold_in(key0, i))
        return s + loss + jnp.sum(gfp[fl * 2]) * 1e-9 + jnp.sum(
            gmlp["w1"]) * 1e-9
    comps["fwd_bwd"] = chain(bwd_body)

    # ---- round-3 stage-2 components: where does the bwd/update go? ----
    comps["targets_build"] = chain(
        lambda i, s: s + jnp.sum(targets(
            (origins0 + jnp.int32(s * 1e-30)) % (data_size - n + 1))) * 1e-9)

    mlp_grad = jax.grad(
        lambda m, x: jnp.mean(apply_mlp(m, x, matmul_dtype=matmul_dtype)
                              ** 2), argnums=(0, 1))

    def mlp_bwd_body(i, s):
        gm, gx = mlp_grad(mlp, x0 + s * 1e-30)
        return s + jnp.sum(gm["w1"]) * 1e-9 + jnp.sum(gx) * 1e-9
    comps["mlp_fwd_bwd"] = chain(mlp_bwd_body)

    gather_grad = jax.grad(
        lambda f: jnp.mean(features(f, origins0) ** 2))

    def gather_bwd_body(i, s):
        gf = gather_grad((fp[0] + s * 1e-30,) + tuple(fp[1:]))
        return s + jnp.sum(gf[fl * 2]) * 1e-9
    comps["gather_fwd_bwd"] = chain(gather_bwd_body)

    # round-3: hand-written dense VJP (GRID_VJP=dense) vs autodiff scatter
    features_dv = make_features("dense")
    gather_grad_dv = jax.grad(
        lambda f: jnp.mean(features_dv(f, origins0) ** 2))

    def gather_bwd_dv_body(i, s):
        gf = gather_grad_dv((fp[0] + s * 1e-30,) + tuple(fp[1:]))
        return s + jnp.sum(gf[fl * 2]) * 1e-9
    comps["gather_fwd_bwd_densevjp"] = chain(gather_bwd_dv_body)

    from nic.core.metrics import psnr as psnr_fn
    from nic.core.quant import quantize_to_bit
    out0 = jax.jit(lambda: apply_mlp(mlp, x0, matmul_dtype=matmul_dtype))()
    tgt0 = jax.jit(lambda: targets(origins0))()
    comps["psnr_step"] = chain(
        lambda i, s: s + psnr_fn(
            quantize_to_bit(out0 + s * 1e-30, 8),
            quantize_to_bit(tgt0, 8)) * 1e-9)

    # Adam+clamp cost: same update math as the real step, applied to a
    # fixed opt state (state reuse is fine for timing — identical compute)
    loss0, (gfp0, gmlp0) = jax.jit(
        lambda: grad_fn(fp, mlp, origins0, key0))()
    opt_fp0, opt_mlp0 = tr.state.opt_fp, tr.state.opt_mlp
    import optax
    from nic.grids import pyramid as fp_lib

    def adam_body(i, s):
        gfp = tuple(g + s * 1e-30 for g in gfp0)
        upd_fp, _ = tr._tx_fp.update(gfp, opt_fp0, fp)
        fp2 = optax.apply_updates(fp, upd_fp)
        upd_mlp, _ = tr._tx_mlp.update(gmlp0, opt_mlp0, mlp)
        mlp2 = optax.apply_updates(mlp, upd_mlp)
        fp2 = fp_lib.pyramid_clamp(fp2, fl, cfg.fp_bits)
        return s + jnp.sum(fp2[fl * 2]) * 1e-9 + jnp.sum(mlp2["w1"]) * 1e-9
    comps["adam_clamp"] = chain(adam_body)
    return comps


def steps_per_s(cfg, images, num_steps):
    from nic.train.ntc import NTCTrainer

    tr = NTCTrainer(cfg, images)
    tr.train_many(num_steps, chunk=num_steps)  # warm at the timed size
    t0 = time.perf_counter()
    tr.train_many(num_steps, chunk=num_steps)
    return num_steps / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="64² / 2-crop shapes (CPU smoke test)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--stage2", action="store_true",
                    help="only the round-3 stage-2 additions (bwd-side "
                         "components + gather_node variant stack)")
    args = ap.parse_args()

    from nic.cli.image_compression import load_asset
    from nic.config import CompressionConfig

    shape_kw = (dict(image_size=64, crop_mip_level=5, num_crops=2)
                if args.tiny else {})
    base = CompressionConfig(num_epochs=10**6, **shape_kw)
    images = load_asset(base)
    out = {"pixels_per_step": base.num_crops * base.crop_size**2}

    STAGE2_COMPS = ("targets_build", "mlp_fwd_bwd", "gather_fwd_bwd",
                    "gather_fwd_bwd_densevjp", "psnr_step", "adam_clamp")

    # ---- component ablation (fp32 and surgical-bf16 reference shape) ----
    dtypes = (("bf16", 16),) if args.stage2 else (("fp32", 32), ("bf16", 16))
    for tag, dtype_bits in dtypes:
        cfg = CompressionConfig(num_epochs=10**6, mlp_num_dtype=dtype_bits, **shape_kw)
        comps = build_components(cfg, images)
        kb, ks = (8, 2) if args.quick else (24, 2)
        for name, make in comps.items():
            if args.stage2 and name not in STAGE2_COMPS:
                continue
            t = slope_time(make, kbig=kb, ksmall=ks)
            out[f"{tag}_{name}_ms"] = round(t * 1e3, 3)
            print(f"{tag}_{name}: {out[f'{tag}_{name}_ms']} ms",
                  file=sys.stderr)

    # ---- full-step rates across the round-3 variants ----
    n = 500 if args.quick else args.steps
    variants = [
        ("fp32_gather_feature", dict(mlp_num_dtype=32)),
        ("bf16_gather_feature", dict(mlp_num_dtype=16)),
        ("bf16_gather_feature_rbg", dict(mlp_num_dtype=16, rng_impl="rbg")),
        ("bf16_gather_node", dict(mlp_num_dtype=16, qat_noise_where="node")),
        ("bf16_folded_feature", dict(mlp_num_dtype=16,
                                     train_forward="folded")),
        ("bf16_folded_node", dict(mlp_num_dtype=16, train_forward="folded",
                                  qat_noise_where="node")),
        ("bf16_folded_node_rbg", dict(mlp_num_dtype=16,
                                      train_forward="folded",
                                      qat_noise_where="node",
                                      rng_impl="rbg")),
        # crop-batch scaling (VERDICT r2 #4: 16 crops bought only 1.5×
        # pixel throughput on the gather path — does the folded forward,
        # which never builds the [N, F] feature matrix, scale better?)
        ("bf16_gather_feature_crops16", dict(mlp_num_dtype=16,
                                             num_crops=16)),
        ("bf16_folded_node_crops16", dict(mlp_num_dtype=16,
                                          train_forward="folded",
                                          qat_noise_where="node",
                                          num_crops=16)),
        # round-3 stage 2: the on-chip winner was gather+node (folded
        # regressed on TPU); stack the remaining levers on top of it
        ("bf16_gather_node_rbg", dict(mlp_num_dtype=16,
                                      qat_noise_where="node",
                                      rng_impl="rbg")),
        ("bf16_gather_node_nopsnr", dict(mlp_num_dtype=16,
                                         qat_noise_where="node",
                                         tf_write_psnr=False)),
        ("bf16_gather_node_rbg_nopsnr", dict(mlp_num_dtype=16,
                                             qat_noise_where="node",
                                             rng_impl="rbg",
                                             tf_write_psnr=False)),
        # round-3 stage 3: the fused Pallas train kernel
        # (nic.kernels.train_fused) replacing the XLA MLP fwd+loss+bwd
        ("bf16_kernel_node_rbg", dict(mlp_num_dtype=16,
                                      train_forward="kernel",
                                      qat_noise_where="node",
                                      rng_impl="rbg")),
        ("bf16_kernel_feature", dict(mlp_num_dtype=16,
                                     train_forward="kernel")),
        # round-3 stage 4: dense grid-grad VJP (GRID_VJP=dense) on top of
        # the best configs
        ("bf16_gather_node_rbg_densevjp", dict(mlp_num_dtype=16,
                                               qat_noise_where="node",
                                               rng_impl="rbg",
                                               grid_vjp="dense")),
        ("bf16_kernel_node_rbg_densevjp", dict(mlp_num_dtype=16,
                                               train_forward="kernel",
                                               qat_noise_where="node",
                                               rng_impl="rbg",
                                               grid_vjp="dense")),
    ]
    for tag, kw in variants:
        if args.stage2 and "gather_node_" not in tag and "densevjp" not in tag:
            continue
        if "kernel" in tag and jax.default_backend() != "tpu":
            continue  # the fused train kernel has no CPU interpret path
        # variant kwargs win over the shape preset (--tiny pins num_crops;
        # the crops16 scaling variants override it)
        cfg = CompressionConfig(**{"num_epochs": 10**6, **shape_kw, **kw})
        out[f"steps_s_{tag}"] = round(steps_per_s(cfg, images, n), 2)
        print(f"{tag}: {out[f'steps_s_{tag}']} steps/s", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

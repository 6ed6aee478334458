"""Fused train kernel (nic/kernels/train_fused.py) vs XLA autodiff —
interpret mode on CPU; chip rates live in BASELINE.md."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from nic.kernels.train_fused import fused_mlp_loss, pick_block_rows
from nic.models.mlp import apply_mlp, init_mlp


def _setup(N=2048, F=73, H=64, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    mlp = init_mlp(k1, F, H, 3)
    x = jax.random.normal(k2, (N, F), jnp.float32) * 0.3
    tgt = jax.nn.sigmoid(jax.random.normal(k3, (N, 3)))
    return mlp, x, tgt


def _ref(mlp, x, tgt, md):
    out = apply_mlp(mlp, x, matmul_dtype=md)
    return jnp.mean((out - tgt) ** 2), out


@pytest.mark.parametrize("md,gelu,tol_loss,tol_grad", [
    (None, "erf", 1e-6, 1e-5),
    (jnp.bfloat16, "erf", 1e-5, 1e-2),
    (jnp.bfloat16, "poly", 1e-4, 1e-2),
])
def test_fused_matches_xla_value_and_grad(md, gelu, tol_loss, tol_grad):
    mlp, x, tgt = _setup()
    (l0, o0), (gm0, gx0) = jax.value_and_grad(
        lambda m, xx: _ref(m, xx, tgt, md), argnums=(0, 1), has_aux=True
    )(mlp, x)
    with pltpu.force_tpu_interpret_mode():
        (l1, o1), (gm1, gx1) = jax.value_and_grad(
            lambda m, xx: fused_mlp_loss(m, xx, tgt, md, gelu),
            argnums=(0, 1), has_aux=True,
        )(mlp, x)
    assert abs(float(l0 - l1)) / float(l0) < tol_loss
    # out is the aux monitoring output
    assert float(jnp.abs(o0 - o1).max()) < (1e-6 if md is None else 1e-3)
    rel = float(jnp.abs(gx0 - gx1).max() / (jnp.abs(gx0).max() + 1e-12))
    assert rel < tol_grad
    for k in gm0:
        rel = float(
            jnp.abs(gm0[k] - gm1[k]).max() / (jnp.abs(gm0[k]).max() + 1e-12)
        )
        assert rel < tol_grad, (k, rel)


def test_fused_forward_bit_matches_bf16_xla():
    """The bf16 fwd is the SAME computation (bf16 dot inputs, f32 accum,
    erf gelu): loss must agree to f32 roundoff."""
    mlp, x, tgt = _setup(N=4096)
    l0, _ = _ref(mlp, x, tgt, jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        l1, _ = fused_mlp_loss(mlp, x, tgt, jnp.bfloat16, "erf")
    assert abs(float(l0 - l1)) <= 1e-6 * float(l0) + 1e-12


def test_pick_block_rows():
    assert pick_block_rows(524288) == 2048
    assert pick_block_rows(2048) == 2048
    assert pick_block_rows(24) == 8
    assert pick_block_rows(12) is None  # not divisible by any 2^k ≥ 8
    assert pick_block_rows(1000) == 8


def test_trainer_kernel_mode_falls_back_under_mesh():
    """TRAIN_FORWARD=kernel is single-device; under a mesh the trainer
    must silently take the XLA SPMD path (identical losses to gather)."""
    from nic.cli.image_compression import load_asset
    from nic.config import CompressionConfig
    from nic.parallel.mesh import make_mesh
    from nic.train.ntc import NTCTrainer

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    cfg = lambda fwd: CompressionConfig(
        image_size=64, max_mip_level=6, crop_mip_level=5, num_epochs=50,
        image_path="data/sancho_512.png", train_forward=fwd,
    )
    img = load_asset(cfg("gather"))
    mesh = make_mesh(8, data_axis=8)
    with mesh:
        tr_k = NTCTrainer(cfg("kernel"), img, mesh=mesh)
        losses_k, _ = tr_k.train_many(3, chunk=3)
        tr_g = NTCTrainer(cfg("gather"), img, mesh=mesh)
        losses_g, _ = tr_g.train_many(3, chunk=3)
    np.testing.assert_allclose(np.asarray(losses_k), np.asarray(losses_g),
                               rtol=1e-6)


def test_trainer_kernel_forward_matches_gather():
    """NTCTrainer(TRAIN_FORWARD=kernel): the scan losses must track the
    gather path step for step (identical bf16 fwd; grads differ only in
    cotangent rounding, so a few steps stay within fp tolerance)."""
    from nic.cli.image_compression import load_asset
    from nic.config import CompressionConfig
    from nic.train.ntc import NTCTrainer

    res = {}
    for fwd in ("gather", "kernel"):
        cfg = CompressionConfig(
            image_size=64, max_mip_level=6, crop_mip_level=5, num_epochs=50,
            mlp_num_dtype=16, image_path="data/sancho_512.png",
            train_forward=fwd,
        )
        tr = NTCTrainer(cfg, load_asset(cfg))
        with pltpu.force_tpu_interpret_mode():
            losses, _ = tr.train_many(5, chunk=5)
        res[fwd] = np.asarray(losses)
    assert res["gather"][0] == pytest.approx(res["kernel"][0], rel=1e-6)
    np.testing.assert_allclose(res["gather"], res["kernel"], rtol=1e-4)

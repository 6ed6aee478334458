"""Fused MLP-forward + MSE-loss + full-backward Pallas train kernel.

The round-3 train-step profile (BASELINE.md) put the MLP fwd+bwd at
2.77 ms of the 7.6 ms step — ~10 TFLOP/s effective, far from both the
MXU roofline (~0.3 ms) and the HBM roofline (~0.4 ms): the XLA autodiff
graph materializes x, h1, h2, out and their cotangents to HBM between
every stage. This kernel computes, in ONE pass over row blocks of the
[N, F] feature matrix, everything ``value_and_grad`` of

    loss = mean((sigmoid(W3·gelu(W2·gelu(W1·x + b1) + b2) + b3) − tgt)²)

needs: the loss, the predictions (for the in-train PSNR aux), dL/dx
(which flows back into the grid-sampling VJP), and dL/dW·,b· — with all
activations and cotangents living only in VMEM. HBM traffic collapses
to: read x once, read tgt once, write dx once (+ small per-block
weight/grad tiles).

Semantics parity: the reference trains this exact decoder per step
(image_compression.py:242-258 of 21K1113/Neural_Image_Compression_V2 —
MSELoss over crop batches of the ColorDecoder's output); the kernel is
a faster evaluation of the same value and gradients (surgical-bf16
matmul semantics of nic.models.mlp.apply_mlp: bf16 dot inputs, fp32
accumulation, fp32 elementwise).

Layout rules learned from the decode kernels, applied here:

- every pallas_call operand window ADVANCES with the grid (the round-2
  bisect: a single constant-index window serializes ~0.5 ms per grid
  step). Weights are tiled per grid step; weight grads are emitted as
  per-step partials (advancing [steps, ...] windows) and reduced by one
  tiny XLA sum outside;
- nothing 3-lane-wide crosses the kernel boundary row-major: targets
  arrive and predictions leave PLANAR [3, N] in (3, R) blocks (an
  [R, 3] window is R strided 12-byte rows — the same pathology the
  planar decode output avoids), so the third layer runs transposed:
  z3ᵀ = W3ᵀ·h2ᵀ via one dot_general, and dW3/db3 come out [3, H]/[3, 1].

``gelu="erf"`` matches the XLA erf GELU bit-for-bit-close (A&S 7.1.26,
|Δerf| ≤ 1.5e-7 — Mosaic has no erf lowering); ``gelu="poly"`` swaps
fwd+bwd to the 8-FMA even-polynomial pair (|Δgelu| ≤ 3.6e-4, an order
below the FP8 QAT noise amplitude 2⁻⁹) — zero transcendentals and no
division in the whole kernel.

The custom_vjp only propagates the cotangent of ``loss``; the ``out``
output is aux-only (its cotangent is ignored — it is zero under
``value_and_grad(..., has_aux=True)``, the one way the trainer calls
this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nic.kernels.decode_fused import _erf
from nic.kernels.decode_fused_v2 import _GELU_POLY_C

__all__ = ["fused_mlp_loss", "pick_block_rows"]

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _gelu_fwd(z, kind: str):
    """(gelu(z), aux-for-bwd)."""
    if kind == "erf":
        cdf = 0.5 * (1.0 + _erf(z * _INV_SQRT2))
        return z * cdf, cdf
    # "poly": gelu = z/2 + q(z²) (even part), exact saturation outside ±4
    u = z * z
    acc = jnp.full_like(z, _GELU_POLY_C[-1])
    for c in _GELU_POLY_C[-2::-1]:
        acc = acc * u + c
    h = 0.5 * z + acc
    return jnp.where(z > 4.0, z, jnp.where(z < -4.0, 0.0, h)), None


def _gelu_bwd(z, aux, kind: str):
    """gelu'(z); for "erf", aux is the forward's Φ(z)."""
    if kind == "erf":
        return aux + z * (_INV_SQRT2PI * jnp.exp(-0.5 * z * z))
    # d/dz [z/2 + q(z²)] = 1/2 + 2z·q'(z²) — 7 more FMAs, still no
    # transcendental
    u = z * z
    acc = jnp.full_like(z, 8.0 * _GELU_POLY_C[8])
    for k in range(7, 0, -1):
        acc = acc * u + k * _GELU_POLY_C[k]
    g = 0.5 + 2.0 * z * acc
    return jnp.where(z > 4.0, 1.0, jnp.where(z < -4.0, 0.0, g))


def pick_block_rows(n_rows: int, max_r: int = 2048) -> int | None:
    """Largest power-of-two row-block size (≤``max_r``) dividing
    ``n_rows``, or None when the shape can't be blocked (caller falls
    back to the XLA apply_mlp path)."""
    r = max_r
    while r >= 8:
        if n_rows % r == 0:
            return r
        r //= 2
    return None


def _kernel(x_ref, tgt_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            loss_ref, out_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
            dw3_ref, db3_ref, *, cd, inv_total: float, gelu: str):
    f32 = jnp.float32
    x = x_ref[:, :]                    # [R, F] f32
    xb = x.astype(cd)
    w1, w2, w3 = w1_ref[0], w2_ref[0], w3_ref[0]   # cd; w3 is [H, OC]

    # ---- forward (fp32 accumulation, fp32 elementwise) ----
    z1 = jnp.dot(xb, w1, preferred_element_type=f32) + b1_ref[0]
    h1, aux1 = _gelu_fwd(z1, gelu)
    h1b = h1.astype(cd)
    z2 = jnp.dot(h1b, w2, preferred_element_type=f32) + b2_ref[0]
    h2, aux2 = _gelu_fwd(z2, gelu)
    h2b = h2.astype(cd)
    # third layer planar: z3ᵀ [OC, R] = W3 contracted on H with h2ᵀ
    z3t = jax.lax.dot_general(
        w3, h2b, (((0,), (1,)), ((), ())), preferred_element_type=f32
    ) + b3_ref[0]
    out = jax.nn.sigmoid(z3t)          # [OC, R] planar
    diff = out - tgt_ref[:, :]
    out_ref[:, :] = out
    # per-block partial of mean((out-tgt)²), broadcast over the lane dim
    loss_ref[0, 0, :] = jnp.full((loss_ref.shape[2],),
                                 jnp.sum(diff * diff) * inv_total, f32)

    # ---- backward (seeded by d(mean sq)/d out = 2·diff/total) ----
    dz3t = (2.0 * inv_total) * diff * out * (1.0 - out)     # [OC, R] f32
    dz3b = dz3t.astype(cd)
    dw3_ref[0] = jax.lax.dot_general(   # [OC, H] = dW3ᵀ
        dz3b, h2b, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    db3_ref[0] = jnp.sum(dz3t, axis=1, keepdims=True)       # [OC, 1]
    dh2 = jax.lax.dot_general(          # [R, H]
        dz3b, w3, (((0,), (1,)), ((), ())), preferred_element_type=f32)
    dz2 = dh2 * _gelu_bwd(z2, aux2, gelu)
    dz2b = dz2.astype(cd)
    dw2_ref[0] = jax.lax.dot_general(
        h1b, dz2b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    db2_ref[0] = jnp.sum(dz2, axis=0, keepdims=True)
    dh1 = jax.lax.dot_general(
        dz2b, w2, (((1,), (1,)), ((), ())), preferred_element_type=f32)
    dz1 = dh1 * _gelu_bwd(z1, aux1, gelu)
    dz1b = dz1.astype(cd)
    dw1_ref[0] = jax.lax.dot_general(
        xb, dz1b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    db1_ref[0] = jnp.sum(dz1, axis=0, keepdims=True)
    dx_ref[:, :] = jax.lax.dot_general(
        dz1b, w1, (((1,), (1,)), ((), ())), preferred_element_type=f32)


@functools.partial(jax.jit, static_argnames=("R", "matmul_dtype", "gelu"))
def _impl(x, tgt, w1, b1, w2, b2, w3, b3, *, R: int, matmul_dtype,
          gelu: str = "erf"):
    n, feat = x.shape
    hidden = w1.shape[1]
    oc = w3.shape[1]
    steps = n // R
    cd = matmul_dtype or jnp.float32
    f32 = jnp.float32

    tgt_t = tgt.T                       # [OC, N] planar (one small transpose)
    tile = lambda a: jnp.tile(a[None], (steps, 1, 1))
    w1t = tile(w1.astype(cd))
    w2t = tile(w2.astype(cd))
    w3t = tile(w3.astype(cd))
    b1t = tile(b1.astype(f32).reshape(1, hidden))
    b2t = tile(b2.astype(f32).reshape(1, hidden))
    b3t = tile(b3.astype(f32).reshape(oc, 1))

    kernel = functools.partial(_kernel, cd=cd, inv_total=1.0 / (n * oc),
                               gelu=gelu)
    row = lambda: pl.BlockSpec((R, feat), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    planar = lambda: pl.BlockSpec((oc, R), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    per_step = lambda a, b: pl.BlockSpec((1, a, b), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            row(),                       # x
            planar(),                    # tgtᵀ
            per_step(feat, hidden),      # W1 tile
            per_step(1, hidden),         # b1
            per_step(hidden, hidden),    # W2
            per_step(1, hidden),         # b2
            per_step(hidden, oc),        # W3
            per_step(oc, 1),             # b3 (planar column)
        ],
        out_specs=[
            per_step(1, 128),            # loss partials
            planar(),                    # outᵀ
            row(),                       # dx
            per_step(feat, hidden),      # dW1 partials
            per_step(1, hidden),         # db1 partials
            per_step(hidden, hidden),    # dW2
            per_step(1, hidden),         # db2
            per_step(oc, hidden),        # dW3ᵀ
            per_step(oc, 1),             # db3
        ],
        out_shape=[
            jax.ShapeDtypeStruct((steps, 1, 128), f32),
            jax.ShapeDtypeStruct((oc, n), f32),
            jax.ShapeDtypeStruct((n, feat), f32),
            jax.ShapeDtypeStruct((steps, feat, hidden), f32),
            jax.ShapeDtypeStruct((steps, 1, hidden), f32),
            jax.ShapeDtypeStruct((steps, hidden, hidden), f32),
            jax.ShapeDtypeStruct((steps, 1, hidden), f32),
            jax.ShapeDtypeStruct((steps, oc, hidden), f32),
            jax.ShapeDtypeStruct((steps, oc, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * (feat * hidden + hidden * hidden + hidden * oc),
            bytes_accessed=(2 * n * feat + 2 * n * oc) * 4,
            transcendentals=0 if gelu == "poly" else 4 * n * hidden,
        ),
    )(x, tgt_t, w1t, b1t, w2t, b2t, w3t, b3t)
    (loss_p, out_t, dx, dw1_p, db1_p, dw2_p, db2_p, dw3t_p, db3_p) = outs
    loss = jnp.sum(loss_p[:, 0, 0])
    grads = {
        "w1": jnp.sum(dw1_p, axis=0), "b1": jnp.sum(db1_p, axis=0)[0],
        "w2": jnp.sum(dw2_p, axis=0), "b2": jnp.sum(db2_p, axis=0)[0],
        "w3": jnp.sum(dw3t_p, axis=0).T, "b3": jnp.sum(db3_p, axis=0)[:, 0],
    }
    return loss, out_t.T, dx, grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_mlp_loss(mlp: dict, x, tgt, matmul_dtype=None, gelu: str = "erf"):
    """(loss, out) of the 3-layer decoder MLP + MSE vs ``tgt``, with a
    fused-kernel VJP. ``x``: [N, F] fp32 (N divisible by
    ``pick_block_rows(N)`` — the caller checks); ``tgt``: [N, OC] fp32.
    Only the ``loss`` cotangent is propagated; ``out`` is an aux output
    for monitoring (PSNR), as under ``value_and_grad(..., has_aux=True)``.
    """
    R = pick_block_rows(x.shape[0])
    loss, out, _, _ = _impl(x, tgt, mlp["w1"], mlp["b1"], mlp["w2"],
                            mlp["b2"], mlp["w3"], mlp["b3"], R=R,
                            matmul_dtype=matmul_dtype, gelu=gelu)
    return loss, out


def _fwd(mlp, x, tgt, matmul_dtype, gelu):
    R = pick_block_rows(x.shape[0])
    loss, out, dx, grads = _impl(
        x, tgt, mlp["w1"], mlp["b1"], mlp["w2"], mlp["b2"], mlp["w3"],
        mlp["b3"], R=R, matmul_dtype=matmul_dtype, gelu=gelu)
    return (loss, out), (dx, grads, tgt)


def _bwd(matmul_dtype, gelu, res, cot):
    dx, grads, tgt = res
    g_loss, _g_out = cot  # out is aux-only: its cotangent is ignored
    dmlp = jax.tree.map(lambda t: t * g_loss, grads)
    return dmlp, dx * g_loss, jnp.zeros_like(tgt)


fused_mlp_loss.defvjp(_fwd, _bwd)

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
  z3ᵀ = W3ᵀ·h2ᵀ via one dot_general, and dW3/db3 come out [3, H]/[3];
- window COUNT per grid step is itself a cost (each advancing window is
  a DMA per step): all six weight/bias operands ride ONE packed f32
  tile [rows_in, H] with 8-aligned section offsets, and all six weight
  grads + the loss partial ride ONE packed output tile — 3 input + 3
  output windows per step in total.

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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nic.kernels.decode_fused import _erf
from nic.kernels.decode_fused_v2 import _GELU_POLY_C

__all__ = ["fused_mlp_loss", "pick_block_rows"]

# Tests may flip this to run the node-gradient kernels through the
# CLASSIC pallas interpreter (interpret=True). The newer TPU-interpret
# mode (pltpu.force_tpu_interpret_mode) allocates buffers through
# io_callbacks, which DEADLOCKS when the kernel runs inside shard_map
# across multiple interpret devices; the classic interpreter is pure
# JAX ops and composes with shard_map.
INTERPRET = False

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


def _pad8(v: int) -> int:
    return -(-v // 8) * 8


def _layout(feat: int, hidden: int, oc: int) -> dict:
    """Row offsets of the packed weight/grad tiles (8-aligned sections
    so every in-kernel sublane slice starts on a tile boundary)."""
    o = {}
    o["w1"] = 0
    o["b1"] = _pad8(feat)
    o["w2"] = o["b1"] + 8
    o["b2"] = o["w2"] + _pad8(hidden)
    o["w3t"] = o["b2"] + 8
    o["b3"] = o["w3t"] + 8          # W3ᵀ has oc ≤ 8 rows
    o["loss"] = o["b3"] + 8
    o["rows_in"] = o["loss"]        # input tile carries no loss row
    o["rows_out"] = o["loss"] + 8
    return o


def _kernel(x_ref, tgt_ref, pk_ref, out_ref, dx_ref, gk_ref, *, cd,
            inv_total: float, gelu: str, feat: int, hidden: int, oc: int,
            lay: tuple):
    f32 = jnp.float32
    (o_w1, o_b1, o_w2, o_b2, o_w3t, o_b3, o_loss) = lay
    x = x_ref[:, :]                    # [R, F] f32
    xb = x.astype(cd)
    pk = pk_ref[0]                     # [rows_in, H] f32 packed params
    w1 = pk[o_w1:o_w1 + feat, :].astype(cd)
    b1 = pk[o_b1:o_b1 + 1, :]
    w2 = pk[o_w2:o_w2 + hidden, :].astype(cd)
    b2 = pk[o_b2:o_b2 + 1, :]
    w3t = pk[o_w3t:o_w3t + oc, :].astype(cd)   # [OC, H]
    b3col = pk[o_b3:o_b3 + oc, 0:1]            # [OC, 1]

    # ---- forward (fp32 accumulation, fp32 elementwise) ----
    z1 = jnp.dot(xb, w1, preferred_element_type=f32) + b1
    h1, aux1 = _gelu_fwd(z1, gelu)
    h1b = h1.astype(cd)
    z2 = jnp.dot(h1b, w2, preferred_element_type=f32) + b2
    h2, aux2 = _gelu_fwd(z2, gelu)
    h2b = h2.astype(cd)
    # third layer planar: z3ᵀ [OC, R] = W3ᵀ contracted on H with h2ᵀ
    z3t = jax.lax.dot_general(
        w3t, h2b, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ) + b3col
    out = jax.nn.sigmoid(z3t)          # [OC, R] planar
    diff = out - tgt_ref[:, :]
    out_ref[:, :] = out
    # per-block partial of mean((out-tgt)²) rides the grad tile
    gk_ref[0, o_loss:o_loss + 1, :] = jnp.full(
        (1, hidden), jnp.sum(diff * diff) * inv_total, f32)

    # ---- backward (seeded by d(mean sq)/d out = 2·diff/total) ----
    dz3t = (2.0 * inv_total) * diff * out * (1.0 - out)     # [OC, R] f32
    dz3b = dz3t.astype(cd)
    gk_ref[0, o_w3t:o_w3t + oc, :] = jax.lax.dot_general(   # dW3ᵀ [OC, H]
        dz3b, h2b, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    gk_ref[0, o_b3:o_b3 + oc, 0:1] = jnp.sum(dz3t, axis=1, keepdims=True)
    dh2 = jax.lax.dot_general(          # [R, H]
        dz3b, w3t, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dz2 = dh2 * _gelu_bwd(z2, aux2, gelu)
    dz2b = dz2.astype(cd)
    gk_ref[0, o_w2:o_w2 + hidden, :] = jax.lax.dot_general(
        h1b, dz2b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    gk_ref[0, o_b2:o_b2 + 1, :] = jnp.sum(dz2, axis=0, keepdims=True)
    dh1 = jax.lax.dot_general(
        dz2b, w2, (((1,), (1,)), ((), ())), preferred_element_type=f32)
    dz1 = dh1 * _gelu_bwd(z1, aux1, gelu)
    dz1b = dz1.astype(cd)
    gk_ref[0, o_w1:o_w1 + feat, :] = jax.lax.dot_general(
        xb, dz1b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    gk_ref[0, o_b1:o_b1 + 1, :] = jnp.sum(dz1, axis=0, keepdims=True)
    dx_ref[:, :] = jax.lax.dot_general(
        dz1b, w1, (((1,), (1,)), ((), ())), preferred_element_type=f32)


@functools.partial(jax.jit, static_argnames=("R", "matmul_dtype", "gelu"))
def _impl(x, tgt, w1, b1, w2, b2, w3, b3, *, R: int, matmul_dtype,
          gelu: str = "erf"):
    n, feat = x.shape
    hidden = w1.shape[1]
    oc = w3.shape[1]
    assert oc <= 8 and oc <= hidden
    steps = n // R
    cd = matmul_dtype or jnp.float32
    f32 = jnp.float32
    lay = _layout(feat, hidden, oc)

    tgt_t = tgt.T                       # [OC, N] planar (one small transpose)
    # one packed f32 parameter tile per grid step (weights cast to the
    # matmul dtype in-kernel; biases read f32 — baseline semantics)
    pk = jnp.zeros((lay["rows_in"], hidden), f32)
    pk = pk.at[lay["w1"]:lay["w1"] + feat].set(w1.astype(f32))
    pk = pk.at[lay["b1"]].set(b1.astype(f32))
    pk = pk.at[lay["w2"]:lay["w2"] + hidden].set(w2.astype(f32))
    pk = pk.at[lay["b2"]].set(b2.astype(f32))
    pk = pk.at[lay["w3t"]:lay["w3t"] + oc].set(w3.astype(f32).T)
    pk = pk.at[lay["b3"]:lay["b3"] + oc].set(
        jnp.broadcast_to(b3.astype(f32)[:, None], (oc, hidden)))
    pkt = jnp.tile(pk[None], (steps, 1, 1))

    kernel = functools.partial(
        _kernel, cd=cd, inv_total=1.0 / (n * oc), gelu=gelu, feat=feat,
        hidden=hidden, oc=oc,
        lay=(lay["w1"], lay["b1"], lay["w2"], lay["b2"], lay["w3t"],
             lay["b3"], lay["loss"]),
    )
    out_t, dx, gk = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((R, feat), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # x
            pl.BlockSpec((oc, R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),              # tgtᵀ
            pl.BlockSpec((1, lay["rows_in"], hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),              # packed params
        ],
        out_specs=[
            pl.BlockSpec((oc, R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),              # outᵀ
            pl.BlockSpec((R, feat), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # dx
            pl.BlockSpec((1, lay["rows_out"], hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),              # packed grads
        ],
        out_shape=[
            jax.ShapeDtypeStruct((oc, n), f32),
            jax.ShapeDtypeStruct((n, feat), f32),
            jax.ShapeDtypeStruct((steps, lay["rows_out"], hidden), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * (feat * hidden + hidden * hidden + hidden * oc),
            bytes_accessed=(2 * n * feat + 2 * n * oc) * 4,
            transcendentals=0 if gelu == "poly" else 4 * n * hidden,
        ),
    )(x, tgt_t, pkt)
    g = jnp.sum(gk, axis=0)             # [rows_out, H] summed partials
    loss = jnp.sum(gk[:, lay["loss"], 0])
    grads = {
        "w1": g[lay["w1"]:lay["w1"] + feat],
        "b1": g[lay["b1"]],
        "w2": g[lay["w2"]:lay["w2"] + hidden],
        "b2": g[lay["b2"]],
        "w3": g[lay["w3t"]:lay["w3t"] + oc].T,
        "b3": g[lay["b3"]:lay["b3"] + oc, 0],
    }
    return loss, out_t.T, dx, grads


# ---------------------------------------------------------------------------
# Node-gradient variant (TRAIN_FORWARD=kernel2)
#
# The scatter path's remaining cost is NOT the forward gather (0.15 ms) but
# its VJP: the kernel writes dx [N, F] f32 (153 MB at flagship shapes) and
# XLA scatter-adds it into the grids — ~2.5 ms of the 7.1 ms step. Both
# dense rewrites of that scatter (XLA-transposed lattice forward, and a
# hand-written per-axis dense VJP) measured SLOWER than the scatter
# (BASELINE.md round-3 negatives): at PIXEL resolution any path moves
# hundreds of MB. The fix is resolution, not scatter-vs-dense: dz1 is
# already in VMEM, and grid gradients are linear images of it —
#
#   dG0[:, i+o0, j+o1] += W1_o^T · dP[i, j],  dP[i, j]  = Σ_{px in cell} dz1[px]
#   dG1[:, node]       += W1_g1^T · dC1[node], dC1[node] = Σ_px w_px,node dz1[px]
#
# so the kernel reduces dz1 [R, H] to node-resolution dP/dC1 planes (phase
# reshape-sums over the crop lattice, per (crop, row-block) grid step) and
# never writes a pixel-resolution cotangent at all: HBM cost of the grid
# backward drops from ~300 MB to ~2 MB of node planes + four tiny
# node-resolution matmuls in the XLA unfold.
#
# Geometry: 2D dense-G0 crops on a power-of-two lattice with step ≤ 1
# (f = 1/step ∈ {1,2,4,8}, f1 = 2f | rows-per-block) — the flagship
# protocol and every upsampling mip. Other geometries fall back to
# fused_mlp_loss + autodiff scatter. Crop origins ride scalar prefetch;
# every operand/output window still advances with the grid (the rev-2
# layout rules).
# ---------------------------------------------------------------------------


def _colreduce(scr_ref, z, ph, f: int, ncols: int):
    """[rows, n, H] → [rows, ncols, H]: out[:, j] = Σ_{c: (c+ph)//f == j} z[:, c]
    for a traced phase ``ph`` ∈ [0, f). Dense: write z at static offset 8
    into the zero-margined scratch ref, read back with a dynamic-start
    ``pl.ds`` window (Mosaic supports dynamic starts on sublane dims —
    ``lax.dynamic_slice`` on VALUES has no TPU lowering), then an
    [n', f] reshape-sum over the phase axis."""
    rows, n, h = z.shape
    if f == 1:
        # every pixel col is its own node col; ph == 0 by construction
        return z[:, :ncols, :]
    scr_ref[:, 0:8, :] = jnp.zeros((rows, 8, h), z.dtype)
    scr_ref[:, 8:8 + n, :] = z
    scr_ref[:, 8 + n:, :] = jnp.zeros(
        (rows, scr_ref.shape[1] - 8 - n, h), z.dtype)
    zp = scr_ref[:, pl.ds(8 - ph, n + 8), :]
    g = zp.reshape(rows, (n + 8) // f, f, h).sum(axis=2)
    return g[:, :ncols, :]


def _rowreduce_sum(z, ph, f: int, nrows: int):
    """[rows, C, H] → [nrows, C, H]: slot (ri+ph)//f gets row ri (G0 cells)."""
    rows = z.shape[0]
    slots = []
    for q in range(nrows):
        acc = jnp.zeros(z.shape[1:], z.dtype)
        for ri in range(rows):
            acc = acc + jnp.where((ri + ph) // f == q, z[ri], 0.0)
        slots.append(acc[None])
    return jnp.concatenate(slots, axis=0)


def _rowreduce_g1(z, ph, f1: int, nrows: int):
    """[rows, C, H] → [nrows, C, H] with linear-interp row weights: row ri
    contributes (1-fu) to node (ri+ph)//f1 and fu to the next node."""
    rows = z.shape[0]
    slots = [jnp.zeros(z.shape[1:], z.dtype) for _ in range(nrows)]
    for ri in range(rows):
        q = (ri + ph) // f1
        fu = ((ri + ph) % f1).astype(jnp.float32) * (1.0 / f1)
        za = (1.0 - fu) * z[ri]
        zb = fu * z[ri]
        for q_ in range(nrows):
            slots[q_] = (slots[q_] + jnp.where(q == q_, za, 0.0)
                         + jnp.where(q + 1 == q_, zb, 0.0))
    return jnp.concatenate([s[None] for s in slots], axis=0)


def _mlp_core(x_ref, tgt_ref, pk_ref, out_ref, gk_ref, *, cd, inv_total,
              gelu, feat, hidden, oc, lay):
    """Shared fused MLP fwd + MSE + bwd body (the _kernel math without the
    dx writeback); returns the first-layer preactivation cotangent dz1
    [R, H] f32 for the caller's node-resolution grid reductions."""
    f32 = jnp.float32
    (o_w1, o_b1, o_w2, o_b2, o_w3t, o_b3, o_loss) = lay
    x = x_ref[:, :]                    # [R, F] f32
    xb = x.astype(cd)
    pk = pk_ref[0]
    w1 = pk[o_w1:o_w1 + feat, :].astype(cd)
    b1 = pk[o_b1:o_b1 + 1, :]
    w2 = pk[o_w2:o_w2 + hidden, :].astype(cd)
    b2 = pk[o_b2:o_b2 + 1, :]
    w3t = pk[o_w3t:o_w3t + oc, :].astype(cd)
    b3col = pk[o_b3:o_b3 + oc, 0:1]

    z1 = jnp.dot(xb, w1, preferred_element_type=f32) + b1
    h1, aux1 = _gelu_fwd(z1, gelu)
    h1b = h1.astype(cd)
    z2 = jnp.dot(h1b, w2, preferred_element_type=f32) + b2
    h2, aux2 = _gelu_fwd(z2, gelu)
    h2b = h2.astype(cd)
    z3t = jax.lax.dot_general(
        w3t, h2b, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ) + b3col
    out = jax.nn.sigmoid(z3t)
    diff = out - tgt_ref[:, :]
    out_ref[:, :] = out
    gk_ref[0, o_loss:o_loss + 1, :] = jnp.full(
        (1, hidden), jnp.sum(diff * diff) * inv_total, f32)

    dz3t = (2.0 * inv_total) * diff * out * (1.0 - out)
    dz3b = dz3t.astype(cd)
    gk_ref[0, o_w3t:o_w3t + oc, :] = jax.lax.dot_general(
        dz3b, h2b, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    gk_ref[0, o_b3:o_b3 + oc, 0:1] = jnp.sum(dz3t, axis=1, keepdims=True)
    dh2 = jax.lax.dot_general(
        dz3b, w3t, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dz2 = dh2 * _gelu_bwd(z2, aux2, gelu)
    dz2b = dz2.astype(cd)
    gk_ref[0, o_w2:o_w2 + hidden, :] = jax.lax.dot_general(
        h1b, dz2b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    gk_ref[0, o_b2:o_b2 + 1, :] = jnp.sum(dz2, axis=0, keepdims=True)
    dh1 = jax.lax.dot_general(
        dz2b, w2, (((1,), (1,)), ((), ())), preferred_element_type=f32)
    dz1 = dh1 * _gelu_bwd(z1, aux1, gelu)
    dz1b = dz1.astype(cd)
    gk_ref[0, o_w1:o_w1 + feat, :] = jax.lax.dot_general(
        xb, dz1b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    gk_ref[0, o_b1:o_b1 + 1, :] = jnp.sum(dz1, axis=0, keepdims=True)
    return dz1


def _kernel_ng(org_ref, x_ref, tgt_ref, pk_ref, out_ref, gk_ref, dp_ref,
               dc1_ref, scr_ref, *, cd, inv_total: float, gelu: str, feat: int,
               hidden: int, oc: int, lay: tuple, rowsb: int, ncols: int,
               f: int, f1: int, nr0: int, nc0: int, pc0: int, nr1: int,
               nc1: int, pc1: int):
    f32 = jnp.float32
    crop = pl.program_id(0)
    o0 = org_ref[crop, 0]
    o1 = org_ref[crop, 1]
    dz1 = _mlp_core(x_ref, tgt_ref, pk_ref, out_ref, gk_ref, cd=cd,
                    inv_total=inv_total, gelu=gelu, feat=feat,
                    hidden=hidden, oc=oc, lay=lay)

    # ---- node-resolution grid cotangents (replaces the dx writeback) ----
    z3d = dz1.reshape(rowsb, ncols, hidden)
    # G0: plain cell sums at period f
    dp = _rowreduce_sum(
        _colreduce(scr_ref, z3d, o1 % f if f > 1 else 0, f, nc0),
        o0 % f if f > 1 else 0, f, nr0)
    if pc0 > nc0:
        dp = jnp.concatenate(
            [dp, jnp.zeros((nr0, pc0 - nc0, hidden), f32)], axis=1)
    dp_ref[0] = dp
    # G1: linear-interp-weighted sums at period f1 (floor + next node)
    ph1c = o1 % f1
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, ncols, 1), 1)
    fu_c = ((cc + ph1c) % f1).astype(f32) * (1.0 / f1)
    sa = _colreduce(scr_ref, z3d * (1.0 - fu_c), ph1c, f1, nc1 - 1)
    sb = _colreduce(scr_ref, z3d * fu_c, ph1c, f1, nc1 - 1)
    zrow = jnp.zeros((rowsb, 1, hidden), f32)
    dcol = (jnp.concatenate([sa, zrow], axis=1)
            + jnp.concatenate([zrow, sb], axis=1))      # [rowsb, nc1, H]
    dc1 = _rowreduce_g1(dcol, o0 % f1, f1, nr1)
    if pc1 > nc1:
        dc1 = jnp.concatenate(
            [dc1, jnp.zeros((nr1, pc1 - nc1, hidden), f32)], axis=1)
    dc1_ref[0] = dc1


@functools.partial(
    jax.jit,
    static_argnames=("crops", "ncols", "rowsb", "f", "matmul_dtype", "gelu",
                     "interpret"))
def _impl_ng(x, tgt, origins, w1, b1, w2, b2, w3, b3, *, crops: int,
             ncols: int, rowsb: int, f: int, matmul_dtype,
             gelu: str = "erf", interpret: bool = False):
    n_total, feat = x.shape
    hidden = w1.shape[1]
    oc = w3.shape[1]
    assert oc <= 8 and oc <= hidden
    R = rowsb * ncols
    B = (ncols * ncols) // (rowsb * ncols)   # blocks per crop
    steps = crops * B
    assert steps * R == n_total
    f1 = 2 * f
    nr0 = (rowsb + f - 2) // f + 1
    nc0 = (ncols + f - 2) // f + 1
    nr1 = (rowsb + f1 - 2) // f1 + 2
    nc1 = ncols // f1 + 2
    pc0 = _pad8(nc0)
    pc1 = _pad8(nc1)
    cd = matmul_dtype or jnp.float32
    f32 = jnp.float32
    lay = _layout(feat, hidden, oc)

    tgt_t = tgt.T
    pk = jnp.zeros((lay["rows_in"], hidden), f32)
    pk = pk.at[lay["w1"]:lay["w1"] + feat].set(w1.astype(f32))
    pk = pk.at[lay["b1"]].set(b1.astype(f32))
    pk = pk.at[lay["w2"]:lay["w2"] + hidden].set(w2.astype(f32))
    pk = pk.at[lay["b2"]].set(b2.astype(f32))
    pk = pk.at[lay["w3t"]:lay["w3t"] + oc].set(w3.astype(f32).T)
    pk = pk.at[lay["b3"]:lay["b3"] + oc].set(
        jnp.broadcast_to(b3.astype(f32)[:, None], (oc, hidden)))
    pkt = jnp.tile(pk[None], (steps, 1, 1))

    kernel = functools.partial(
        _kernel_ng, cd=cd, inv_total=1.0 / (n_total * oc), gelu=gelu,
        feat=feat, hidden=hidden, oc=oc,
        lay=(lay["w1"], lay["b1"], lay["w2"], lay["b2"], lay["w3t"],
             lay["b3"], lay["loss"]),
        rowsb=rowsb, ncols=ncols, f=f, f1=f1, nr0=nr0, nc0=nc0, pc0=pc0,
        nr1=nr1, nc1=nc1, pc1=pc1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(crops, B),
        in_specs=[
            pl.BlockSpec((R, feat), lambda c, b, org: (c * B + b, 0)),
            pl.BlockSpec((oc, R), lambda c, b, org: (0, c * B + b)),
            pl.BlockSpec((1, lay["rows_in"], hidden),
                         lambda c, b, org: (c * B + b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((oc, R), lambda c, b, org: (0, c * B + b)),
            pl.BlockSpec((1, lay["rows_out"], hidden),
                         lambda c, b, org: (c * B + b, 0, 0)),
            pl.BlockSpec((1, nr0, pc0, hidden),
                         lambda c, b, org: (c * B + b, 0, 0, 0)),
            pl.BlockSpec((1, nr1, pc1, hidden),
                         lambda c, b, org: (c * B + b, 0, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((rowsb, ncols + 16, hidden),
                                   jnp.float32)],
    )
    out_t, gk, dp, dc1 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((oc, n_total), f32),
            jax.ShapeDtypeStruct((steps, lay["rows_out"], hidden), f32),
            jax.ShapeDtypeStruct((steps, nr0, pc0, hidden), f32),
            jax.ShapeDtypeStruct((steps, nr1, pc1, hidden), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n_total * (feat * hidden + hidden * hidden
                                 + hidden * oc),
            bytes_accessed=(n_total * feat + 2 * n_total * oc) * 4,
            transcendentals=0 if gelu == "poly" else 4 * n_total * hidden,
        ),
    )(origins.astype(jnp.int32), x, tgt_t, pkt)
    g = jnp.sum(gk, axis=0)
    loss = jnp.sum(gk[:, lay["loss"], 0])
    grads = {
        "w1": g[lay["w1"]:lay["w1"] + feat],
        "b1": g[lay["b1"]],
        "w2": g[lay["w2"]:lay["w2"] + hidden],
        "b2": g[lay["b2"]],
        "w3": g[lay["w3t"]:lay["w3t"] + oc].T,
        "b3": g[lay["b3"]:lay["b3"] + oc, 0],
    }
    return loss, out_t.T, grads, dp, dc1


# ---------------------------------------------------------------------------
# Lane-packed node-gradient variant (two row-blocks per grid step)
#
# With H = 64 every intermediate of _mlp_core occupies HALF of each
# 128-lane f32 vreg, so the VPU pays full issue slots for half-empty
# vectors and the thin [*,64] matmuls waste MXU output width. This
# variant processes TWO CONSECUTIVE row-blocks of the same crop per grid
# step, carrying block A in lanes 0:64 and block B in lanes 64:128 of
# every activation:
#   - x is packed into a [R, 256] VMEM scratch (block A at lane 0, block
#     B at lane 128 — both section starts lane-aligned, no relayout) and
#     multiplied by a 256-row W1 tile whose two row-sections target
#     disjoint lane halves; zero rows make the cross terms exactly 0.
#   - W2 is block-diagonal [128, 128]; layer 2+3, every GELU, the MSE,
#     and the whole backward run on full 128-lane vregs — same element
#     count, half the vreg ops.
#   - weight-grad matmuls produce per-half grads in diagonal blocks
#     (cross blocks are discarded in the XLA unfold; summing the two
#     diagonal blocks IS the true grad).
#   - the node-resolution reductions run packed too: consecutive blocks
#     of one crop share all lattice phases (the gate guarantees
#     rowsb ≡ 0 mod f1), so dp/dc1 come out with the two blocks in lane
#     halves and are re-interleaved to the standard [steps, ...] layout.
# Zero-padding contributes exact 0.0 to every dot product, so the packed
# kernel computes the SAME math as _impl_ng; differences are pure
# floating summation-order roundoff where the wider contraction changes
# the backend's reduction grouping (measured: loss and out bit-equal;
# node planes ≤ 3e-5 relative in bf16, bit-equal in fp32; weight-grad
# cross-step sums ≤ 1.3e-7 relative). Gate: 2·hidden ≤ 128 lanes,
# feat ≤ 128, 2·oc ≤ 8, and an even block count per crop; anything else
# falls back to _impl_ng.
# ---------------------------------------------------------------------------


def _layout2(feat: int, hidden: int, oc: int) -> dict:
    """Row offsets of the packed-by-lane-half parameter/grad tile
    (hidden2 = 2·hidden lanes wide)."""
    o = {}
    o["w1"] = 0                      # 2 sections of 128 rows
    o["b1"] = 256
    o["w2"] = o["b1"] + 8            # block-diagonal, 2·hidden rows
    o["b2"] = o["w2"] + 2 * hidden
    o["w3t"] = o["b2"] + 8           # 2·oc rows
    o["b3"] = o["w3t"] + 8
    o["loss"] = o["b3"] + 8
    o["rows_in"] = o["loss"]
    o["rows_out"] = o["loss"] + 8
    return o


def _mlp_core2(xa_ref, xb_ref, tgta_ref, tgtb_ref, pk_ref, out_ref, gk_ref,
               xp_ref, *, cd, inv_total, gelu, feat, hidden, oc, lay):
    """Packed twin of _mlp_core: returns dz1p [R, 2H] f32 (lane halves =
    the two blocks)."""
    f32 = jnp.float32
    (o_w1, o_b1, o_w2, o_b2, o_w3t, o_b3, o_loss) = lay
    h2w = 2 * hidden                   # packed lane width (128)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _zero_gaps():
        # scratch gaps multiply only zero W rows, but fresh VMEM may hold
        # NaN bit patterns and NaN·0 = NaN — zero them once
        rows = xp_ref.shape[0]
        xp_ref[:, feat:128] = jnp.zeros((rows, 128 - feat), f32)
        xp_ref[:, 128 + feat:] = jnp.zeros(
            (rows, xp_ref.shape[1] - 128 - feat), f32)

    xp_ref[:, 0:feat] = xa_ref[:, :]
    xp_ref[:, 128:128 + feat] = xb_ref[:, :]
    xpb = xp_ref[:, :].astype(cd)
    pk = pk_ref[0]
    w1 = pk[o_w1:o_w1 + 256, :].astype(cd)
    b1 = pk[o_b1:o_b1 + 1, :]
    w2 = pk[o_w2:o_w2 + h2w, :].astype(cd)
    b2 = pk[o_b2:o_b2 + 1, :]
    w3t = pk[o_w3t:o_w3t + 2 * oc, :].astype(cd)   # [2OC, 2H]
    b3col = pk[o_b3:o_b3 + 2 * oc, 0:1]            # [2OC, 1]

    z1 = jnp.dot(xpb, w1, preferred_element_type=f32) + b1     # [R, 2H]
    h1, aux1 = _gelu_fwd(z1, gelu)
    h1b = h1.astype(cd)
    z2 = jnp.dot(h1b, w2, preferred_element_type=f32) + b2
    h2, aux2 = _gelu_fwd(z2, gelu)
    h2b = h2.astype(cd)
    z3t = jax.lax.dot_general(
        w3t, h2b, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ) + b3col                                                   # [2OC, R]
    out = jax.nn.sigmoid(z3t)
    tgt = jnp.concatenate([tgta_ref[:, :], tgtb_ref[:, :]], axis=0)
    diff = out - tgt
    out_ref[:, :] = out
    gk_ref[0, o_loss:o_loss + 1, :] = jnp.full(
        (1, h2w), jnp.sum(diff * diff) * inv_total, f32)

    dz3t = (2.0 * inv_total) * diff * out * (1.0 - out)
    dz3b = dz3t.astype(cd)
    gk_ref[0, o_w3t:o_w3t + 2 * oc, :] = jax.lax.dot_general(
        dz3b, h2b, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    gk_ref[0, o_b3:o_b3 + 2 * oc, 0:1] = jnp.sum(dz3t, axis=1, keepdims=True)
    dh2 = jax.lax.dot_general(
        dz3b, w3t, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dz2 = dh2 * _gelu_bwd(z2, aux2, gelu)
    dz2b = dz2.astype(cd)
    gk_ref[0, o_w2:o_w2 + h2w, :] = jax.lax.dot_general(
        h1b, dz2b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    gk_ref[0, o_b2:o_b2 + 1, :] = jnp.sum(dz2, axis=0, keepdims=True)
    dh1 = jax.lax.dot_general(
        dz2b, w2, (((1,), (1,)), ((), ())), preferred_element_type=f32)
    dz1 = dh1 * _gelu_bwd(z1, aux1, gelu)
    dz1b = dz1.astype(cd)
    gk_ref[0, o_w1:o_w1 + 256, :] = jax.lax.dot_general(
        xpb, dz1b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    gk_ref[0, o_b1:o_b1 + 1, :] = jnp.sum(dz1, axis=0, keepdims=True)
    return dz1


def _kernel_ng2(org_ref, xa_ref, xb_ref, tgta_ref, tgtb_ref, pk_ref,
                out_ref, gk_ref, dp_ref, dc1_ref, xp_ref, scr_ref, *, cd,
                inv_total: float, gelu: str, feat: int, hidden: int, oc: int,
                lay: tuple, rowsb: int, ncols: int, f: int, f1: int,
                nr0: int, nc0: int, pc0: int, nr1: int, nc1: int, pc1: int):
    f32 = jnp.float32
    crop = pl.program_id(0)
    o0 = org_ref[crop, 0]
    o1 = org_ref[crop, 1]
    dz1 = _mlp_core2(xa_ref, xb_ref, tgta_ref, tgtb_ref, pk_ref, out_ref,
                     gk_ref, xp_ref, cd=cd, inv_total=inv_total, gelu=gelu,
                     feat=feat, hidden=hidden, oc=oc, lay=lay)

    # packed reductions: both lane halves are blocks of the SAME crop at
    # row bases ≡ 0 (mod f1), so every phase below applies to both
    h2w = 2 * hidden
    z3d = dz1.reshape(rowsb, ncols, h2w)
    dp = _rowreduce_sum(
        _colreduce(scr_ref, z3d, o1 % f if f > 1 else 0, f, nc0),
        o0 % f if f > 1 else 0, f, nr0)
    if pc0 > nc0:
        dp = jnp.concatenate(
            [dp, jnp.zeros((nr0, pc0 - nc0, h2w), f32)], axis=1)
    dp_ref[0] = dp
    ph1c = o1 % f1
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, ncols, 1), 1)
    fu_c = ((cc + ph1c) % f1).astype(f32) * (1.0 / f1)
    sa = _colreduce(scr_ref, z3d * (1.0 - fu_c), ph1c, f1, nc1 - 1)
    sb = _colreduce(scr_ref, z3d * fu_c, ph1c, f1, nc1 - 1)
    zrow = jnp.zeros((rowsb, 1, h2w), f32)
    dcol = (jnp.concatenate([sa, zrow], axis=1)
            + jnp.concatenate([zrow, sb], axis=1))
    dc1 = _rowreduce_g1(dcol, o0 % f1, f1, nr1)
    if pc1 > nc1:
        dc1 = jnp.concatenate(
            [dc1, jnp.zeros((nr1, pc1 - nc1, h2w), f32)], axis=1)
    dc1_ref[0] = dc1


@functools.partial(
    jax.jit,
    static_argnames=("crops", "ncols", "rowsb", "f", "matmul_dtype", "gelu",
                     "interpret"))
def _impl_ng2(x, tgt, origins, w1, b1, w2, b2, w3, b3, *, crops: int,
              ncols: int, rowsb: int, f: int, matmul_dtype,
              gelu: str = "erf", interpret: bool = False):
    n_total, feat = x.shape
    hidden = w1.shape[1]
    oc = w3.shape[1]
    assert 2 * oc <= 8 and 2 * hidden <= 128 and feat <= 128
    R = rowsb * ncols
    B = (ncols * ncols) // (rowsb * ncols)
    assert B % 2 == 0
    B2 = B // 2
    steps2 = crops * B2
    assert steps2 * 2 * R == n_total
    f1 = 2 * f
    nr0 = (rowsb + f - 2) // f + 1
    nc0 = (ncols + f - 2) // f + 1
    nr1 = (rowsb + f1 - 2) // f1 + 2
    nc1 = ncols // f1 + 2
    pc0 = _pad8(nc0)
    pc1 = _pad8(nc1)
    cd = matmul_dtype or jnp.float32
    f32 = jnp.float32
    h2w = 2 * hidden
    lay = _layout2(feat, hidden, oc)

    tgt_t = tgt.T
    pkt = jnp.tile(
        _pack_params2(w1, b1, w2, b2, w3, b3, lay, feat, hidden, oc)[None],
        (steps2, 1, 1))

    kernel = functools.partial(
        _kernel_ng2, cd=cd, inv_total=1.0 / (n_total * oc), gelu=gelu,
        feat=feat, hidden=hidden, oc=oc,
        lay=(lay["w1"], lay["b1"], lay["w2"], lay["b2"], lay["w3t"],
             lay["b3"], lay["loss"]),
        rowsb=rowsb, ncols=ncols, f=f, f1=f1, nr0=nr0, nc0=nc0, pc0=pc0,
        nr1=nr1, nc1=nc1, pc1=pc1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(crops, B2),
        in_specs=[
            pl.BlockSpec((R, feat), lambda c, b, org: (c * B + 2 * b, 0)),
            pl.BlockSpec((R, feat), lambda c, b, org: (c * B + 2 * b + 1, 0)),
            pl.BlockSpec((oc, R), lambda c, b, org: (0, c * B + 2 * b)),
            pl.BlockSpec((oc, R), lambda c, b, org: (0, c * B + 2 * b + 1)),
            pl.BlockSpec((1, lay["rows_in"], h2w),
                         lambda c, b, org: (c * B2 + b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((2 * oc, R), lambda c, b, org: (0, c * B2 + b)),
            pl.BlockSpec((1, lay["rows_out"], h2w),
                         lambda c, b, org: (c * B2 + b, 0, 0)),
            pl.BlockSpec((1, nr0, pc0, h2w),
                         lambda c, b, org: (c * B2 + b, 0, 0, 0)),
            pl.BlockSpec((1, nr1, pc1, h2w),
                         lambda c, b, org: (c * B2 + b, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 256), jnp.float32),
            pltpu.VMEM((rowsb, ncols + 16, h2w), jnp.float32),
        ],
    )
    out_p, gk, dp, dc1 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((2 * oc, steps2 * R), f32),
            jax.ShapeDtypeStruct((steps2, lay["rows_out"], h2w), f32),
            jax.ShapeDtypeStruct((steps2, nr0, pc0, h2w), f32),
            jax.ShapeDtypeStruct((steps2, nr1, pc1, h2w), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n_total * (feat * hidden + hidden * hidden
                                 + hidden * oc),
            bytes_accessed=(n_total * feat + 2 * n_total * oc) * 4,
            transcendentals=0 if gelu == "poly" else 4 * n_total * hidden,
        ),
    )(origins.astype(jnp.int32), x, x, tgt_t, tgt_t, pkt)
    # unpack lane halves back to the standard layouts
    out_t = jnp.stack([out_p[:oc], out_p[oc:]], axis=0)      # [2, OC, S2·R]
    out_t = out_t.reshape(2, oc, steps2, R).transpose(1, 2, 0, 3).reshape(
        oc, n_total)
    loss, grads = _extract_grads2(gk, lay, feat, hidden, oc)
    dp_u = jnp.stack([dp[..., :hidden], dp[..., hidden:]], axis=1).reshape(
        steps2 * 2, nr0, pc0, hidden)
    dc1_u = jnp.stack([dc1[..., :hidden], dc1[..., hidden:]],
                      axis=1).reshape(steps2 * 2, nr1, pc1, hidden)
    return loss, out_t.T, grads, dp_u, dc1_u


def _pack_params2(w1, b1, w2, b2, w3, b3, lay: dict, feat: int, hidden: int,
                  oc: int) -> jnp.ndarray:
    """Build the lane-half-packed parameter tile (see _layout2)."""
    f32 = jnp.float32
    h2w = 2 * hidden
    pk = jnp.zeros((lay["rows_in"], h2w), f32)
    w1f = w1.astype(f32)
    pk = pk.at[lay["w1"]:lay["w1"] + feat, :hidden].set(w1f)
    pk = pk.at[lay["w1"] + 128:lay["w1"] + 128 + feat, hidden:].set(w1f)
    b1f = b1.astype(f32)
    pk = pk.at[lay["b1"], :hidden].set(b1f)
    pk = pk.at[lay["b1"], hidden:].set(b1f)
    w2f = w2.astype(f32)
    pk = pk.at[lay["w2"]:lay["w2"] + hidden, :hidden].set(w2f)
    pk = pk.at[lay["w2"] + hidden:lay["w2"] + h2w, hidden:].set(w2f)
    b2f = b2.astype(f32)
    pk = pk.at[lay["b2"], :hidden].set(b2f)
    pk = pk.at[lay["b2"], hidden:].set(b2f)
    w3tf = w3.astype(f32).T
    pk = pk.at[lay["w3t"]:lay["w3t"] + oc, :hidden].set(w3tf)
    pk = pk.at[lay["w3t"] + oc:lay["w3t"] + 2 * oc, hidden:].set(w3tf)
    b3f = b3.astype(f32)
    pk = pk.at[lay["b3"]:lay["b3"] + oc].set(
        jnp.broadcast_to(b3f[:, None], (oc, h2w)))
    pk = pk.at[lay["b3"] + oc:lay["b3"] + 2 * oc].set(
        jnp.broadcast_to(b3f[:, None], (oc, h2w)))
    return pk


def _extract_grads2(gk, lay: dict, feat: int, hidden: int, oc: int):
    """Sum the per-step packed grad tiles and fold lane halves (the two
    diagonal blocks) into the true grads; returns (loss, grads dict)."""
    h2w = 2 * hidden
    g = jnp.sum(gk, axis=0)
    loss = jnp.sum(gk[:, lay["loss"], 0])
    grads = {
        "w1": (g[lay["w1"]:lay["w1"] + feat, :hidden]
               + g[lay["w1"] + 128:lay["w1"] + 128 + feat, hidden:]),
        "b1": g[lay["b1"], :hidden] + g[lay["b1"], hidden:],
        "w2": (g[lay["w2"]:lay["w2"] + hidden, :hidden]
               + g[lay["w2"] + hidden:lay["w2"] + h2w, hidden:]),
        "b2": g[lay["b2"], :hidden] + g[lay["b2"], hidden:],
        "w3": (g[lay["w3t"]:lay["w3t"] + oc, :hidden]
               + g[lay["w3t"] + oc:lay["w3t"] + 2 * oc, hidden:]).T,
        "b3": (g[lay["b3"]:lay["b3"] + oc, 0]
               + g[lay["b3"] + oc:lay["b3"] + 2 * oc, 0]),
    }
    return loss, grads


def _ng_packable(crops: int, ncols: int, rowsb: int, hidden: int,
                 feat: int, oc: int) -> bool:
    B = ncols // rowsb
    return (2 * hidden <= 128 and feat <= 128 and 2 * oc <= 8
            and B % 2 == 0
            and not os.environ.get("NIC_NG_NO_PACK"))


def _accumulate_node_planes(dp, dc1, origins, *, crops: int, ncols: int,
                            rowsb: int, f: int, g0_nodes, g1_nodes,
                            hidden: int):
    """Overlap-add the per-block node planes and place each crop's window
    into full-grid accumulators. Returns (P, C1) with P
    [g0_rows+1, g0_cols+1, H] (cell-resolution dz1 sums) and C1
    [g1_rows+2, g1_cols+2, H] (interp-weighted dz1 sums) — the
    resolution-reduced cotangents both dG0/dG1 (via W1) and dW1 (via the
    grid values, nic.kernels.train_fused_ff) contract against.

    ``g0_nodes``/``g1_nodes``: node counts per grid, an int (square) or a
    (rows, cols) tuple (rectangular images — crops stay ncols×ncols)."""
    f32 = jnp.float32
    g0r, g0c = ((g0_nodes, g0_nodes) if isinstance(g0_nodes, int)
                else g0_nodes)
    g1r, g1c = ((g1_nodes, g1_nodes) if isinstance(g1_nodes, int)
                else g1_nodes)
    f1 = 2 * f
    B = (ncols * ncols) // (rowsb * ncols)
    nr0 = (rowsb + f - 2) // f + 1
    nc0 = (ncols + f - 2) // f + 1
    nr1 = (rowsb + f1 - 2) // f1 + 2
    nc1 = ncols // f1 + 2
    s0 = rowsb // f
    s1 = max(rowsb // f1, 1)

    dp = dp.reshape(crops, B, nr0, -1, hidden)[:, :, :, :nc0]
    rows0 = (B - 1) * s0 + nr0
    acc0 = jnp.zeros((crops, rows0, nc0, hidden), f32)
    for q in range(nr0):
        acc0 = acc0.at[:, q:q + (B - 1) * s0 + 1:s0].add(dp[:, :, q])

    dc1 = dc1.reshape(crops, B, nr1, -1, hidden)[:, :, :, :nc1]
    rows1 = (B - 1) * s1 + nr1
    acc1 = jnp.zeros((crops, rows1, nc1, hidden), f32)
    for q in range(nr1):
        acc1 = acc1.at[:, q:q + (B - 1) * s1 + 1:s1].add(dc1[:, :, q])

    if os.environ.get("NIC_UNFOLD2D_LOOP") == "1":
        # original serialized dynamic_update_slice placement, kept for A/B
        P = jnp.zeros((g0r + 1, g0c + 1, hidden), f32)
        C1 = jnp.zeros((g1r + 2, g1c + 2, hidden), f32)
        for i in range(crops):
            r0 = origins[i, 0] // f
            c0 = origins[i, 1] // f
            cur = jax.lax.dynamic_slice(P, (r0, c0, 0),
                                        (rows0, nc0, hidden))
            P = jax.lax.dynamic_update_slice(P, cur + acc0[i], (r0, c0, 0))
            r1 = origins[i, 0] // f1
            c1_ = origins[i, 1] // f1
            cur1 = jax.lax.dynamic_slice(C1, (r1, c1_, 0),
                                         (rows1, nc1, hidden))
            C1 = jax.lax.dynamic_update_slice(C1, cur1 + acc1[i],
                                              (r1, c1_, 0))
        return P, C1

    # one-hot placement contractions (see _scatter_embed) — the parallel
    # form of the 2·crops-deep serialized RMW chain above
    e0r = _scatter_embed(origins[:, 0] // f, rows0, g0r + 1)
    e0c = _scatter_embed(origins[:, 1] // f, nc0, g0c + 1)
    t = jnp.einsum("irR,irch->iRch", e0r, acc0)
    P = jnp.einsum("icC,iRch->RCh", e0c, t)
    e1r = _scatter_embed(origins[:, 0] // f1, rows1, g1r + 2)
    e1c = _scatter_embed(origins[:, 1] // f1, nc1, g1c + 2)
    t = jnp.einsum("irR,irch->iRch", e1r, acc1)
    C1 = jnp.einsum("icC,iRch->RCh", e1c, t)
    return P, C1


def _unfold_node_grads(dp, dc1, origins, w1, *, crops: int, ncols: int,
                       rowsb: int, f: int, g0_nodes, g1_nodes,
                       channels: int):
    """XLA-side backward tail: overlap-add the per-block node planes,
    place each crop's window into full-grid accumulators, and contract
    with the W1 feature blocks → (dG0, dG1) in grid layout [C, s, s]
    ([C, sr, sc] for rectangular grids — node counts as int or tuple)."""
    f32 = jnp.float32
    hidden = w1.shape[1]
    g0r, g0c = ((g0_nodes, g0_nodes) if isinstance(g0_nodes, int)
                else g0_nodes)
    g1r, g1c = ((g1_nodes, g1_nodes) if isinstance(g1_nodes, int)
                else g1_nodes)
    P, C1 = _accumulate_node_planes(
        dp, dc1, origins, crops=crops, ncols=ncols, rowsb=rowsb, f=f,
        g0_nodes=(g0r, g0c), g1_nodes=(g1r, g1c), hidden=hidden)

    ch = channels
    dg0 = jnp.zeros((g0r + 2, g0c + 2, ch), f32)
    for k, (o0, o1) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        blk = w1[k * ch:(k + 1) * ch]          # [ch, H]
        t = jax.lax.dot_general(P, blk, (((2,), (1,)), ((), ())),
                                preferred_element_type=f32)
        dg0 = dg0.at[o0:o0 + g0r + 1, o1:o1 + g0c + 1].add(t)
    dg0 = jnp.moveaxis(dg0[:g0r, :g0c], -1, 0)

    blk1 = w1[4 * ch:5 * ch]
    t1 = jax.lax.dot_general(C1, blk1, (((2,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dg1 = jnp.moveaxis(t1[:g1r, :g1c], -1, 0)
    return dg0, dg1


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def fused_mlp_loss_ng(g0, g1, mlp: dict, x, tgt, origins, crops: int,
                      ncols: int, rowsb: int, f: int, matmul_dtype=None,
                      gelu: str = "erf"):
    """(loss, out) with grid gradients delivered at NODE resolution.

    ``g0``/``g1``: the active pyramid grids ([C, s, s] — their VALUES are
    unused in the primal; ``x`` already contains the gathered features,
    and the caller must ``stop_gradient`` it so grid gradients flow ONLY
    through this function's hand-built backward). ``origins``: [crops, 2]
    int32 crop origins in output-pixel units. Geometry must satisfy the
    kernel lattice gate (see trainer); semantics otherwise identical to
    :func:`fused_mlp_loss`.

    Dispatches to the lane-packed two-blocks-per-step kernel
    (:func:`_impl_ng2` — bit-identical math) whenever the geometry
    allows (``_ng_packable``); ``NIC_NG_NO_PACK=1`` forces the unpacked
    kernel for A/B measurement.
    """
    impl = (_impl_ng2 if _ng_packable(crops, ncols, rowsb,
                                      mlp["w1"].shape[1], mlp["w1"].shape[0],
                                      mlp["w3"].shape[1]) else _impl_ng)
    loss, out, _, _, _ = impl(
        x, tgt, origins, mlp["w1"], mlp["b1"], mlp["w2"], mlp["b2"],
        mlp["w3"], mlp["b3"], crops=crops, ncols=ncols, rowsb=rowsb, f=f,
        matmul_dtype=matmul_dtype, gelu=gelu, interpret=INTERPRET)
    return loss, out


def _fwd_ng(g0, g1, mlp, x, tgt, origins, crops, ncols, rowsb, f,
            matmul_dtype, gelu):
    impl = (_impl_ng2 if _ng_packable(crops, ncols, rowsb,
                                      mlp["w1"].shape[1], mlp["w1"].shape[0],
                                      mlp["w3"].shape[1]) else _impl_ng)
    loss, out, grads, dp, dc1 = impl(
        x, tgt, origins, mlp["w1"], mlp["b1"], mlp["w2"], mlp["b2"],
        mlp["w3"], mlp["b3"], crops=crops, ncols=ncols, rowsb=rowsb, f=f,
        matmul_dtype=matmul_dtype, gelu=gelu, interpret=INTERPRET)
    # g0/g1 ride the residuals for their STATIC shapes only (same buffers,
    # no copies — they are live params anyway)
    res = (grads, dp, dc1, origins, mlp["w1"], g0, g1)
    return (loss, out), res


def _bwd_ng(crops, ncols, rowsb, f, matmul_dtype, gelu, res, cot):
    import numpy as np

    (grads, dp, dc1, origins, w1, g0_res, g1_res) = res
    g0_shape, g1_shape = g0_res.shape, g1_res.shape
    g_loss, _ = cot
    dg0, dg1 = _unfold_node_grads(
        dp, dc1, origins, w1, crops=crops, ncols=ncols, rowsb=rowsb, f=f,
        g0_nodes=(g0_shape[1], g0_shape[2]),
        g1_nodes=(g1_shape[1], g1_shape[2]), channels=g0_shape[0])
    dmlp = jax.tree.map(lambda t: t * g_loss, grads)
    feat = w1.shape[0]
    oc = grads["w3"].shape[1]
    n_total = crops * ncols * ncols
    return (dg0 * g_loss, dg1 * g_loss, dmlp,
            jnp.zeros((n_total, feat), jnp.float32),
            jnp.zeros((n_total, oc), jnp.float32),
            np.zeros(origins.shape, jax.dtypes.float0))


fused_mlp_loss_ng.defvjp(_fwd_ng, _bwd_ng)


# ---------------------------------------------------------------------------
# 3D node-gradient variant (methods 3 and 4 — dense 8-corner or sparse
# even-parity 4-corner G0, trilinear G1). Same structure as 2D: dz1 is
# reduced axis-by-axis to node resolution inside VMEM. Axis order of a
# [rowsb, n, n] block of a crop: slabs (coord 0, outer), a1 (coord 1),
# a2 (coord 2). The a2/a1 reductions ride _colreduce (a1 with the
# (node, H) tail merged into lanes — free contiguous reshapes); the slab
# reduction uses the masked row adds. Slab phases are per (crop, block)
# and computed in-kernel from program_id, so rowsb need NOT be divisible
# by f1 — the XLA unfold places dc1 blocks at per-block dynamic bases.
# ---------------------------------------------------------------------------


def _outerreduce(scr_ref, z4, ph, f: int, nslots: int):
    """[rowsb, n, C, H] → [rowsb, nslots, C, H]: slot (ri+ph)//f along the
    OUTER axis 1 — the _colreduce scratch trick on a rank-4 ref (dynamic
    start on an outer dim; the reshape splits an outer dim only, which
    Mosaic allows — per-row masked adds at n=32 crashed the compiler)."""
    rowsb, n, c, h = z4.shape
    if f == 1:
        return z4[:, :nslots]
    scr_ref[:, 0:8] = jnp.zeros((rowsb, 8, c, h), z4.dtype)
    scr_ref[:, 8:8 + n] = z4
    scr_ref[:, 8 + n:] = jnp.zeros(
        (rowsb, scr_ref.shape[1] - 8 - n, c, h), z4.dtype)
    zp = scr_ref[:, pl.ds(8 - ph, n + 8)]
    g = zp.reshape(rowsb, (n + 8) // f, f, c, h).sum(axis=2)
    return g[:, :nslots]


def _kernel_ng3(org_ref, x_ref, tgt_ref, pk_ref, out_ref, gk_ref, dp_ref,
                dc1_ref, scrA_ref, scrB_ref, scrC_ref, *, cd,
                inv_total: float, gelu: str, feat: int, hidden: int,
                oc: int, lay: tuple, rowsb: int, n: int, f: int, f1: int,
                nr0: int, na0: int, pa0: int, nr1: int, na1: int, pa1: int):
    f32 = jnp.float32
    crop = pl.program_id(0)
    b = pl.program_id(1)
    o0 = org_ref[crop, 0]
    o1 = org_ref[crop, 1]
    o2 = org_ref[crop, 2]
    dz1 = _mlp_core(x_ref, tgt_ref, pk_ref, out_ref, gk_ref, cd=cd,
                    inv_total=inv_total, gelu=gelu, feat=feat,
                    hidden=hidden, oc=oc, lay=lay)

    z3 = dz1.reshape(rowsb * n, n, hidden)     # [(slab,a1), a2, H]
    ph0 = (rowsb * b + o0) % f if f > 1 else 0
    ph0_1 = (rowsb * b + o0) % f1

    # ---- G0: plain cell sums at period f, axis by axis ----
    ca2 = _colreduce(scrA_ref, z3, o2 % f if f > 1 else 0, f, na0)
    z4 = ca2.reshape(rowsb, n, na0, hidden)    # outer split only
    ca1 = _outerreduce(scrB_ref, z4, o1 % f if f > 1 else 0, f, na0)
    dp = _rowreduce_sum(ca1, ph0, f, nr0)      # [nr0, na0, na0, H]
    if pa0 > na0:
        dp = jnp.concatenate(
            [dp, jnp.zeros((nr0, na0, pa0 - na0, hidden), f32)], axis=2)
    dp_ref[0] = dp

    # ---- G1: trilinear-weighted sums at period f1, axis by axis ----
    ph2_1 = o2 % f1
    cc2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    fu2 = ((cc2 + ph2_1) % f1).astype(f32) * (1.0 / f1)
    sa = _colreduce(scrA_ref, z3 * (1.0 - fu2), ph2_1, f1, na1 - 1)
    sb = _colreduce(scrA_ref, z3 * fu2, ph2_1, f1, na1 - 1)
    zrow = jnp.zeros((rowsb * n, 1, hidden), f32)
    d2 = (jnp.concatenate([sa, zrow], axis=1)
          + jnp.concatenate([zrow, sb], axis=1))    # [(slab,a1), na1, H]
    z5 = d2.reshape(rowsb, n, na1, hidden)
    ph1_1 = o1 % f1
    cc1 = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1, 1), 1)
    fu1 = ((cc1 + ph1_1) % f1).astype(f32) * (1.0 / f1)
    ta = _outerreduce(scrC_ref, z5 * (1.0 - fu1), ph1_1, f1, na1 - 1)
    tb = _outerreduce(scrC_ref, z5 * fu1, ph1_1, f1, na1 - 1)
    zsl = jnp.zeros((rowsb, 1, na1, hidden), f32)
    d1 = (jnp.concatenate([ta, zsl], axis=1)
          + jnp.concatenate([zsl, tb], axis=1))     # [rowsb, na1, na1, H]
    dc1 = _rowreduce_g1(d1, ph0_1, f1, nr1)         # [nr1, na1, na1, H]
    if pa1 > na1:
        dc1 = jnp.concatenate(
            [dc1, jnp.zeros((nr1, na1, pa1 - na1, hidden), f32)], axis=2)
    dc1_ref[0] = dc1


@functools.partial(
    jax.jit,
    static_argnames=("crops", "n", "rowsb", "f", "sparse_g0",
                     "matmul_dtype", "gelu", "interpret"))
def _impl_ng3(x, tgt, origins, w1, b1, w2, b2, w3, b3, *, crops: int,
              n: int, rowsb: int, f: int, sparse_g0: bool, matmul_dtype,
              gelu: str = "erf", interpret: bool = False):
    n_total, feat = x.shape
    hidden = w1.shape[1]
    oc = w3.shape[1]
    assert oc <= 8 and oc <= hidden
    R = rowsb * n * n
    B = n // rowsb                      # slab blocks per crop
    steps = crops * B
    assert steps * R == n_total
    f1 = 2 * f
    nr0 = (rowsb + f - 2) // f + 1
    na0 = (n + f - 2) // f + 1
    nr1 = (rowsb + f1 - 2) // f1 + 2
    na1 = n // f1 + 2
    pa0 = _pad8(na0)
    pa1 = _pad8(na1)
    cd = matmul_dtype or jnp.float32
    f32 = jnp.float32
    lay = _layout(feat, hidden, oc)

    tgt_t = tgt.T
    pk = jnp.zeros((lay["rows_in"], hidden), f32)
    pk = pk.at[lay["w1"]:lay["w1"] + feat].set(w1.astype(f32))
    pk = pk.at[lay["b1"]].set(b1.astype(f32))
    pk = pk.at[lay["w2"]:lay["w2"] + hidden].set(w2.astype(f32))
    pk = pk.at[lay["b2"]].set(b2.astype(f32))
    pk = pk.at[lay["w3t"]:lay["w3t"] + oc].set(w3.astype(f32).T)
    pk = pk.at[lay["b3"]:lay["b3"] + oc].set(
        jnp.broadcast_to(b3.astype(f32)[:, None], (oc, hidden)))
    pkt = jnp.tile(pk[None], (steps, 1, 1))

    kernel = functools.partial(
        _kernel_ng3, cd=cd, inv_total=1.0 / (n_total * oc), gelu=gelu,
        feat=feat, hidden=hidden, oc=oc,
        lay=(lay["w1"], lay["b1"], lay["w2"], lay["b2"], lay["w3t"],
             lay["b3"], lay["loss"]),
        rowsb=rowsb, n=n, f=f, f1=f1, nr0=nr0, na0=na0, pa0=pa0,
        nr1=nr1, na1=na1, pa1=pa1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(crops, B),
        in_specs=[
            pl.BlockSpec((R, feat), lambda c, b, org: (c * B + b, 0)),
            pl.BlockSpec((oc, R), lambda c, b, org: (0, c * B + b)),
            pl.BlockSpec((1, lay["rows_in"], hidden),
                         lambda c, b, org: (c * B + b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((oc, R), lambda c, b, org: (0, c * B + b)),
            pl.BlockSpec((1, lay["rows_out"], hidden),
                         lambda c, b, org: (c * B + b, 0, 0)),
            pl.BlockSpec((1, nr0, na0, pa0, hidden),
                         lambda c, b, org: (c * B + b, 0, 0, 0, 0)),
            pl.BlockSpec((1, nr1, na1, pa1, hidden),
                         lambda c, b, org: (c * B + b, 0, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((rowsb * n, n + 16, hidden), jnp.float32),
            pltpu.VMEM((rowsb, n + 16, na0, hidden), jnp.float32),
            pltpu.VMEM((rowsb, n + 16, na1, hidden), jnp.float32),
        ],
    )
    out_t, gk, dp, dc1 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((oc, n_total), f32),
            jax.ShapeDtypeStruct((steps, lay["rows_out"], hidden), f32),
            jax.ShapeDtypeStruct((steps, nr0, na0, pa0, hidden), f32),
            jax.ShapeDtypeStruct((steps, nr1, na1, pa1, hidden), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n_total * (feat * hidden + hidden * hidden
                                 + hidden * oc),
            bytes_accessed=(n_total * feat + 2 * n_total * oc) * 4,
            transcendentals=0 if gelu == "poly" else 4 * n_total * hidden,
        ),
    )(origins.astype(jnp.int32), x, tgt_t, pkt)
    g = jnp.sum(gk, axis=0)
    loss = jnp.sum(gk[:, lay["loss"], 0])
    grads = {
        "w1": g[lay["w1"]:lay["w1"] + feat],
        "b1": g[lay["b1"]],
        "w2": g[lay["w2"]:lay["w2"] + hidden],
        "b2": g[lay["b2"]],
        "w3": g[lay["w3t"]:lay["w3t"] + oc].T,
        "b3": g[lay["b3"]:lay["b3"] + oc, 0],
    }
    return loss, out_t.T, grads, dp, dc1


# ---------------------------------------------------------------------------
# Lane-packed 3D variant: two consecutive SLAB blocks per grid step.
#
# The MLP math packs exactly as in 2D (_mlp_core2). The reductions differ
# in one way: consecutive slab blocks do NOT share the frame-axis phase
# (slab bases b·rowsb are generally not ≡ 0 mod f1 — rowsb can be as
# small as 2), while the two minor-axis phases (o1, o2) are shared. The
# frame-axis reducers (_rowreduce_sum/_rowreduce_g1) are slot-mask loops,
# so they take a PER-LANE phase vector: lanes 0:H get block A's phase,
# lanes H:2H block B's, and the jnp.where masks broadcast lane-wise —
# the packed reduction stays one full-width pass.
# ---------------------------------------------------------------------------


def _kernel_ng3_2(org_ref, xa_ref, xb_ref, tgta_ref, tgtb_ref, pk_ref,
                  out_ref, gk_ref, dp_ref, dc1_ref, xp_ref, scrA_ref,
                  scrB_ref, scrC_ref, *, cd, inv_total: float, gelu: str,
                  feat: int, hidden: int, oc: int, lay: tuple, rowsb: int,
                  n: int, f: int, f1: int, nr0: int, na0: int, pa0: int,
                  nr1: int, na1: int, pa1: int):
    f32 = jnp.float32
    crop = pl.program_id(0)
    bp = pl.program_id(1)
    o0 = org_ref[crop, 0]
    o1 = org_ref[crop, 1]
    o2 = org_ref[crop, 2]
    dz1 = _mlp_core2(xa_ref, xb_ref, tgta_ref, tgtb_ref, pk_ref, out_ref,
                     gk_ref, xp_ref, cd=cd, inv_total=inv_total, gelu=gelu,
                     feat=feat, hidden=hidden, oc=oc, lay=lay)
    h2w = 2 * hidden

    # per-lane slab phases (halves carry blocks 2bp and 2bp+1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h2w), 2)
    baseA = rowsb * (2 * bp) + o0
    baseB = rowsb * (2 * bp + 1) + o0
    ph0 = (jnp.where(lane < hidden, baseA % f, baseB % f)
           if f > 1 else 0)
    ph0_1 = jnp.where(lane < hidden, baseA % f1, baseB % f1)

    z3 = dz1.reshape(rowsb * n, n, h2w)
    ca2 = _colreduce(scrA_ref, z3, o2 % f if f > 1 else 0, f, na0)
    z4 = ca2.reshape(rowsb, n, na0, h2w)
    ca1 = _outerreduce(scrB_ref, z4, o1 % f if f > 1 else 0, f, na0)
    dp = _rowreduce_sum(ca1, ph0, f, nr0)          # [nr0, na0, na0, 2H]
    if pa0 > na0:
        dp = jnp.concatenate(
            [dp, jnp.zeros((nr0, na0, pa0 - na0, h2w), f32)], axis=2)
    dp_ref[0] = dp

    ph2_1 = o2 % f1
    cc2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    fu2 = ((cc2 + ph2_1) % f1).astype(f32) * (1.0 / f1)
    sa = _colreduce(scrA_ref, z3 * (1.0 - fu2), ph2_1, f1, na1 - 1)
    sb = _colreduce(scrA_ref, z3 * fu2, ph2_1, f1, na1 - 1)
    zrow = jnp.zeros((rowsb * n, 1, h2w), f32)
    d2 = (jnp.concatenate([sa, zrow], axis=1)
          + jnp.concatenate([zrow, sb], axis=1))
    z5 = d2.reshape(rowsb, n, na1, h2w)
    ph1_1 = o1 % f1
    cc1 = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1, 1), 1)
    fu1 = ((cc1 + ph1_1) % f1).astype(f32) * (1.0 / f1)
    ta = _outerreduce(scrC_ref, z5 * (1.0 - fu1), ph1_1, f1, na1 - 1)
    tb = _outerreduce(scrC_ref, z5 * fu1, ph1_1, f1, na1 - 1)
    zsl = jnp.zeros((rowsb, 1, na1, h2w), f32)
    d1 = (jnp.concatenate([ta, zsl], axis=1)
          + jnp.concatenate([zsl, tb], axis=1))
    dc1 = _rowreduce_g1(d1, ph0_1, f1, nr1)
    if pa1 > na1:
        dc1 = jnp.concatenate(
            [dc1, jnp.zeros((nr1, na1, pa1 - na1, h2w), f32)], axis=2)
    dc1_ref[0] = dc1


@functools.partial(
    jax.jit,
    static_argnames=("crops", "n", "rowsb", "f", "sparse_g0",
                     "matmul_dtype", "gelu", "interpret"))
def _impl_ng3_2(x, tgt, origins, w1, b1, w2, b2, w3, b3, *, crops: int,
                n: int, rowsb: int, f: int, sparse_g0: bool, matmul_dtype,
                gelu: str = "erf", interpret: bool = False):
    n_total, feat = x.shape
    hidden = w1.shape[1]
    oc = w3.shape[1]
    assert 2 * oc <= 8 and 2 * hidden <= 128 and feat <= 128
    R = rowsb * n * n
    B = n // rowsb
    assert B % 2 == 0
    B2 = B // 2
    steps2 = crops * B2
    assert steps2 * 2 * R == n_total
    f1 = 2 * f
    nr0 = (rowsb + f - 2) // f + 1
    na0 = (n + f - 2) // f + 1
    nr1 = (rowsb + f1 - 2) // f1 + 2
    na1 = n // f1 + 2
    pa0 = _pad8(na0)
    pa1 = _pad8(na1)
    cd = matmul_dtype or jnp.float32
    f32 = jnp.float32
    h2w = 2 * hidden
    lay = _layout2(feat, hidden, oc)

    tgt_t = tgt.T
    pkt = jnp.tile(
        _pack_params2(w1, b1, w2, b2, w3, b3, lay, feat, hidden, oc)[None],
        (steps2, 1, 1))

    kernel = functools.partial(
        _kernel_ng3_2, cd=cd, inv_total=1.0 / (n_total * oc), gelu=gelu,
        feat=feat, hidden=hidden, oc=oc,
        lay=(lay["w1"], lay["b1"], lay["w2"], lay["b2"], lay["w3t"],
             lay["b3"], lay["loss"]),
        rowsb=rowsb, n=n, f=f, f1=f1, nr0=nr0, na0=na0, pa0=pa0,
        nr1=nr1, na1=na1, pa1=pa1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(crops, B2),
        in_specs=[
            pl.BlockSpec((R, feat), lambda c, b, org: (c * B + 2 * b, 0)),
            pl.BlockSpec((R, feat),
                         lambda c, b, org: (c * B + 2 * b + 1, 0)),
            pl.BlockSpec((oc, R), lambda c, b, org: (0, c * B + 2 * b)),
            pl.BlockSpec((oc, R),
                         lambda c, b, org: (0, c * B + 2 * b + 1)),
            pl.BlockSpec((1, lay["rows_in"], h2w),
                         lambda c, b, org: (c * B2 + b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((2 * oc, R), lambda c, b, org: (0, c * B2 + b)),
            pl.BlockSpec((1, lay["rows_out"], h2w),
                         lambda c, b, org: (c * B2 + b, 0, 0)),
            pl.BlockSpec((1, nr0, na0, pa0, h2w),
                         lambda c, b, org: (c * B2 + b, 0, 0, 0, 0)),
            pl.BlockSpec((1, nr1, na1, pa1, h2w),
                         lambda c, b, org: (c * B2 + b, 0, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 256), jnp.float32),
            pltpu.VMEM((rowsb * n, n + 16, h2w), jnp.float32),
            pltpu.VMEM((rowsb, n + 16, na0, h2w), jnp.float32),
            pltpu.VMEM((rowsb, n + 16, na1, h2w), jnp.float32),
        ],
    )
    out_p, gk, dp, dc1 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((2 * oc, steps2 * R), f32),
            jax.ShapeDtypeStruct((steps2, lay["rows_out"], h2w), f32),
            jax.ShapeDtypeStruct((steps2, nr0, na0, pa0, h2w), f32),
            jax.ShapeDtypeStruct((steps2, nr1, na1, pa1, h2w), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n_total * (feat * hidden + hidden * hidden
                                 + hidden * oc),
            bytes_accessed=(n_total * feat + 2 * n_total * oc) * 4,
            transcendentals=0 if gelu == "poly" else 4 * n_total * hidden,
        ),
    )(origins.astype(jnp.int32), x, x, tgt_t, tgt_t, pkt)
    out_t = jnp.stack([out_p[:oc], out_p[oc:]], axis=0)
    out_t = out_t.reshape(2, oc, steps2, R).transpose(1, 2, 0, 3).reshape(
        oc, n_total)
    loss, grads = _extract_grads2(gk, lay, feat, hidden, oc)
    dp_u = jnp.stack([dp[..., :hidden], dp[..., hidden:]], axis=1).reshape(
        steps2 * 2, nr0, na0, pa0, hidden)
    dc1_u = jnp.stack([dc1[..., :hidden], dc1[..., hidden:]],
                      axis=1).reshape(steps2 * 2, nr1, na1, pa1, hidden)
    return loss, out_t.T, grads, dp_u, dc1_u


def _ng3_packable(n: int, rowsb: int, hidden: int, feat: int,
                  oc: int) -> bool:
    B = n // rowsb
    return (2 * hidden <= 128 and feat <= 128 and 2 * oc <= 8
            and B % 2 == 0
            and not os.environ.get("NIC_NG_NO_PACK"))


# method-4 sparse G0 corner order — must match
# nic.grids.sample.EVEN_PARITY_CORNERS_3D
_CORNERS_3D_DENSE = tuple(
    (a, b_, c) for a in (0, 1) for b_ in (0, 1) for c in (0, 1))
_CORNERS_3D_SPARSE = ((0, 0, 0), (0, 1, 1), (1, 0, 1), (1, 1, 0))


def _scatter_embed(idx, span: int, full: int):
    """One-hot placement matrices E [crops, span, full]: E[i, q, idx[i]+q]
    = 1. Contracting a per-crop window against E places it at a TRACED
    offset as a tiny matmul — the parallel form of the serialized
    dynamic_update_slice read-modify-write chain (roundoff-order change
    only)."""
    ar_span = jnp.arange(span, dtype=jnp.int32)
    ar_full = jnp.arange(full, dtype=jnp.int32)
    return (idx[:, None, None] + ar_span[None, :, None]
            == ar_full[None, None, :]).astype(jnp.float32)


def _accumulate_node_volumes(dp, dc1, origins, *, crops: int, n: int,
                             rowsb: int, f: int, g0_nodes: int,
                             g1_nodes: int, hidden: int):
    """Overlap-add the per-block node VOLUMES and place each crop's window
    into full-grid accumulators; returns (P, C1) — the 3D analog of
    :func:`_accumulate_node_planes`, shared by dG0/dG1 (via W1) and dW1
    (via the grid values).

    Slab bases are per (crop, block) and DYNAMIC (rowsb may be smaller
    than f — the R ≤ 2048 Mosaic block cap), so the strided static adds of
    the 2D path don't apply. The original implementation serialized
    2·crops·B dynamic_update_slice read-modify-write chains (256 at the
    misty protocol) — latency-bound on TPU. This scatters with one-hot
    contractions instead (:func:`_scatter_embed`): one batched matmul per
    plane family plus three per-axis placement einsums, all parallel.
    ``NIC_UNFOLD3D_LOOP=1`` selects the old loop for A/B."""
    f32 = jnp.float32
    f1 = 2 * f
    B = n // rowsb
    nr0 = (rowsb + f - 2) // f + 1
    na0 = (n + f - 2) // f + 1
    nr1 = (rowsb + f1 - 2) // f1 + 2
    na1 = n // f1 + 2
    rows0 = na0
    rows1 = (n + f1 - 2) // f1 + 2

    # dp: [steps, nr0, na0(a1), pa0(a2 padded), H]
    dp = dp.reshape(crops, B, nr0, na0, -1, hidden)[:, :, :, :, :na0]
    dc1 = dc1.reshape(crops, B, nr1, na1, -1, hidden)[:, :, :, :, :na1]

    if os.environ.get("NIC_UNFOLD3D_LOOP") == "1":
        return _accumulate_node_volumes_loop(
            dp, dc1, origins, crops=crops, f=f, g0_nodes=g0_nodes,
            g1_nodes=g1_nodes, hidden=hidden, nr0=nr0, na0=na0, nr1=nr1,
            na1=na1, rows0=rows0, rows1=rows1, rowsb=rowsb, B=B)

    b_idx = jnp.arange(B, dtype=jnp.int32)
    # per-(crop, block) slab bases: (rowsb·b + o0)//f − o0//f
    base0 = ((rowsb * b_idx[None, :] + origins[:, 0:1]) // f
             - origins[:, 0:1] // f)                       # [crops, B]
    j0 = jnp.arange(rows0 + nr0, dtype=jnp.int32)
    m0 = (base0[:, :, None, None] +
          jnp.arange(nr0, dtype=jnp.int32)[None, None, :, None]
          == j0[None, None, None, :]).astype(f32)          # [i, b, q, j]
    acc0 = jnp.einsum("ibqj,ibqach->ijach", m0, dp)[:, :rows0]

    base1 = ((rowsb * b_idx[None, :] + origins[:, 0:1]) // f1
             - origins[:, 0:1] // f1)
    j1 = jnp.arange(rows1 + nr1, dtype=jnp.int32)
    m1 = (base1[:, :, None, None] +
          jnp.arange(nr1, dtype=jnp.int32)[None, None, :, None]
          == j1[None, None, None, :]).astype(f32)
    acc1 = jnp.einsum("ibqj,ibqach->ijach", m1, dc1)[:, :rows1]

    # per-crop window placement into the full grids: three per-axis
    # one-hot placements, summed over crops
    r0 = _scatter_embed(origins[:, 0] // f, rows0, g0_nodes + 1)
    a0 = _scatter_embed(origins[:, 1] // f, na0, g0_nodes + 1)
    c0 = _scatter_embed(origins[:, 2] // f, na0, g0_nodes + 1)
    t = jnp.einsum("irR,irach->iRach", r0, acc0)
    t = jnp.einsum("iaA,iRach->iRAch", a0, t)
    t = jnp.einsum("icC,iRAch->iRACh", c0, t)
    P = t.sum(0)

    r1 = _scatter_embed(origins[:, 0] // f1, rows1, g1_nodes + 2)
    a1_ = _scatter_embed(origins[:, 1] // f1, na1, g1_nodes + 2)
    c1_ = _scatter_embed(origins[:, 2] // f1, na1, g1_nodes + 2)
    t = jnp.einsum("irR,irach->iRach", r1, acc1)
    t = jnp.einsum("iaA,iRach->iRAch", a1_, t)
    t = jnp.einsum("icC,iRAch->iRACh", c1_, t)
    C1 = t.sum(0)
    return P, C1


def _accumulate_node_volumes_loop(dp, dc1, origins, *, crops: int, f: int,
                                  g0_nodes: int, g1_nodes: int, hidden: int,
                                  nr0: int, na0: int, nr1: int, na1: int,
                                  rows0: int, rows1: int, rowsb: int, B: int):
    """The original serialized dynamic_update_slice accumulation, kept for
    A/B (NIC_UNFOLD3D_LOOP=1)."""
    f32 = jnp.float32
    f1 = 2 * f
    acc0 = jnp.zeros((crops, rows0 + nr0, na0, na0, hidden), f32)
    for i in range(crops):
        for b in range(B):
            base = (rowsb * b + origins[i, 0]) // f - origins[i, 0] // f
            cur = jax.lax.dynamic_slice(
                acc0, (i, base, 0, 0, 0), (1, nr0, na0, na0, hidden))
            acc0 = jax.lax.dynamic_update_slice(
                acc0, cur + dp[i, b][None], (i, base, 0, 0, 0))
    acc0 = acc0[:, :rows0]

    acc1 = jnp.zeros((crops, rows1 + nr1, na1, na1, hidden), f32)
    for i in range(crops):
        for b in range(B):
            base = (rowsb * b + origins[i, 0]) // f1 - origins[i, 0] // f1
            cur = jax.lax.dynamic_slice(
                acc1, (i, base, 0, 0, 0), (1, nr1, na1, na1, hidden))
            acc1 = jax.lax.dynamic_update_slice(
                acc1, cur + dc1[i, b][None], (i, base, 0, 0, 0))
    acc1 = acc1[:, :rows1]

    P = jnp.zeros((g0_nodes + 1,) * 3 + (hidden,), f32)
    C1 = jnp.zeros((g1_nodes + 2,) * 3 + (hidden,), f32)
    for i in range(crops):
        r0 = origins[i, 0] // f
        a0 = origins[i, 1] // f
        b0 = origins[i, 2] // f
        cur = jax.lax.dynamic_slice(
            P, (r0, a0, b0, 0), (rows0, na0, na0, hidden))
        P = jax.lax.dynamic_update_slice(P, cur + acc0[i], (r0, a0, b0, 0))
        r1 = origins[i, 0] // f1
        a1_ = origins[i, 1] // f1
        b1_ = origins[i, 2] // f1
        cur1 = jax.lax.dynamic_slice(
            C1, (r1, a1_, b1_, 0), (rows1, na1, na1, hidden))
        C1 = jax.lax.dynamic_update_slice(
            C1, cur1 + acc1[i], (r1, a1_, b1_, 0))
    return P, C1


def _unfold_node_grads_3d(dp, dc1, origins, w1, *, crops: int, n: int,
                          rowsb: int, f: int, sparse_g0: bool,
                          g0_nodes: int, g1_nodes: int, channels: int):
    """3D backward tail: overlap-add per-block node volumes (slab bases
    per (crop, block) dynamic), place per-crop windows into full-grid
    accumulators, contract with the W1 feature blocks → (dG0, dG1) in
    grid layout [C, s, s, s]."""
    f32 = jnp.float32
    hidden = w1.shape[1]
    P, C1 = _accumulate_node_volumes(
        dp, dc1, origins, crops=crops, n=n, rowsb=rowsb, f=f,
        g0_nodes=g0_nodes, g1_nodes=g1_nodes, hidden=hidden)

    ch = channels
    corners = _CORNERS_3D_SPARSE if sparse_g0 else _CORNERS_3D_DENSE
    dg0 = jnp.zeros((g0_nodes + 2,) * 3 + (ch,), f32)
    for k, (o0, o1, o2) in enumerate(corners):
        blk = w1[k * ch:(k + 1) * ch]          # [ch, H]
        t = jax.lax.dot_general(P, blk, (((3,), (1,)), ((), ())),
                                preferred_element_type=f32)
        dg0 = dg0.at[o0:o0 + g0_nodes + 1, o1:o1 + g0_nodes + 1,
                     o2:o2 + g0_nodes + 1].add(t)
    dg0 = jnp.moveaxis(dg0[:g0_nodes, :g0_nodes, :g0_nodes], -1, 0)

    kg1 = len(corners)
    blk1 = w1[kg1 * ch:(kg1 + 1) * ch]
    t1 = jax.lax.dot_general(C1, blk1, (((3,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dg1 = jnp.moveaxis(t1[:g1_nodes, :g1_nodes, :g1_nodes], -1, 0)
    return dg0, dg1


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def fused_mlp_loss_ng3(g0, g1, mlp: dict, x, tgt, origins, crops: int,
                       n: int, rowsb: int, f: int, sparse_g0: bool,
                       matmul_dtype=None, gelu: str = "erf"):
    """3D :func:`fused_mlp_loss_ng`: grid gradients at node resolution
    for n³ crops over [C, s, s, s] grids (method 3 dense-G0 / method 4
    sparse even-parity G0). Caller must ``stop_gradient(x)``.

    Dispatches to the lane-packed two-slabs-per-step kernel
    (:func:`_impl_ng3_2` — same math, per-lane slab phases) whenever the
    geometry allows; ``NIC_NG_NO_PACK=1`` forces the unpacked kernel."""
    impl = (_impl_ng3_2 if _ng3_packable(n, rowsb, mlp["w1"].shape[1],
                                         mlp["w1"].shape[0],
                                         mlp["w3"].shape[1]) else _impl_ng3)
    loss, out, _, _, _ = impl(
        x, tgt, origins, mlp["w1"], mlp["b1"], mlp["w2"], mlp["b2"],
        mlp["w3"], mlp["b3"], crops=crops, n=n, rowsb=rowsb, f=f,
        sparse_g0=sparse_g0, matmul_dtype=matmul_dtype, gelu=gelu,
        interpret=INTERPRET)
    return loss, out


def _fwd_ng3(g0, g1, mlp, x, tgt, origins, crops, n, rowsb, f, sparse_g0,
             matmul_dtype, gelu):
    impl = (_impl_ng3_2 if _ng3_packable(n, rowsb, mlp["w1"].shape[1],
                                         mlp["w1"].shape[0],
                                         mlp["w3"].shape[1]) else _impl_ng3)
    loss, out, grads, dp, dc1 = impl(
        x, tgt, origins, mlp["w1"], mlp["b1"], mlp["w2"], mlp["b2"],
        mlp["w3"], mlp["b3"], crops=crops, n=n, rowsb=rowsb, f=f,
        sparse_g0=sparse_g0, matmul_dtype=matmul_dtype, gelu=gelu,
        interpret=INTERPRET)
    res = (grads, dp, dc1, origins, mlp["w1"], g0, g1)
    return (loss, out), res


def _bwd_ng3(crops, n, rowsb, f, sparse_g0, matmul_dtype, gelu, res, cot):
    import numpy as np

    (grads, dp, dc1, origins, w1, g0_res, g1_res) = res
    g_loss, _ = cot
    dg0, dg1 = _unfold_node_grads_3d(
        dp, dc1, origins, w1, crops=crops, n=n, rowsb=rowsb, f=f,
        sparse_g0=sparse_g0, g0_nodes=g0_res.shape[1],
        g1_nodes=g1_res.shape[1], channels=g0_res.shape[0])
    dmlp = jax.tree.map(lambda t: t * g_loss, grads)
    feat = w1.shape[0]
    oc = grads["w3"].shape[1]
    n_total = crops * n * n * n
    return (dg0 * g_loss, dg1 * g_loss, dmlp,
            jnp.zeros((n_total, feat), jnp.float32),
            jnp.zeros((n_total, oc), jnp.float32),
            np.zeros(origins.shape, jax.dtypes.float0))


fused_mlp_loss_ng3.defvjp(_fwd_ng3, _bwd_ng3)


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

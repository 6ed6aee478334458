"""Feature-free fused train kernel (TRAIN_FORWARD=kernel3).

The round-4 stage-3 profile (BASELINE.md) attributed the last ~1.1 ms of
the 4.31 ms kernel2 train step to the [N, F] feature matrix's life cycle:
0.41 ms of XLA gather building it, ~0.67 ms of HBM round-trip feeding it
to the kernel (153 MB/step at flagship shapes), and a superlinear gather
regression at 16 crops (0.41 → 1.96 ms). This kernel removes the matrix
entirely — the reference's hot feature build
(``Projects/fp_def.py:115-145`` + ``image_compression.py:239-258`` of
21K1113/Neural_Image_Compression_V2) happens inside VMEM:

- **forward**: the MLP's first layer is folded into the grids once per
  step at NODE resolution (the decode-side fastdecode algebra —
  ``P = Σ_k shift_k(G0)·W1_k``, ``C1 = G1·W1_g1``, tiny matmuls), and the
  kernel rebuilds the pixel-resolution preactivation z1 from small P/C1
  windows: nearest/bilinear window expansion (repeat + phase slice via
  scratch), the separable triangular PE computed in-kernel from crop
  coordinates, bias + LOD folded in. The fold is cheap because weights
  are per-step constants ACROSS the whole crop batch — the same reason
  the decode kernels fold (the round-3 ``folded`` TRAIN_FORWARD negative
  was autodiff differentiating *through* the fold; here the backward is
  hand-written, so the fold costs only its forward).
- **backward**: dz1 is reduced to node-resolution dP/dC1 planes in VMEM
  (exactly kernel2's reduction — nic.kernels.train_fused), which now
  serve double duty: contracted with W1 they give dG0/dG1 (the existing
  unfold), contracted with the GRID VALUES they give the W1 gradient
  blocks (``dW1_k = Σ_cells G0[cell+off_k] ⊗ dP[cell]``), so dW1 never
  needs the feature matrix either. The PE weight gradients contract the
  in-kernel PE tables against row/column sums of dz1 (two tiny MXU dots);
  the LOD row is ``lod·db1``.

Lane-packed only (two consecutive row blocks of a crop per grid step,
activations on full 128-lane vregs): the per-block P/C1 windows of the
two halves are shifted copies of each other, so the XLA staging packs
them into lane halves and every in-kernel expansion runs once at full
width. Geometry gate: 2D dense-G0 power-of-two crop lattice with
step ≤ 1, triangular PE, H ≤ 64, even blocks per crop — the flagship
protocol and every upsampling mip. Both QAT noise modes are supported:
node-resolution noise perturbs the grids before the fold, and the
default feature-resolution noise is drawn INSIDE the kernel (see the
``eps_uniform`` section below). Everything else falls back to
kernel2/kernel/gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nic.kernels.train_fused import (
    _accumulate_node_planes,
    _colreduce,
    _gelu_bwd,
    _gelu_fwd,
    _pad8,
    _rowreduce_g1,
    _rowreduce_sum,
)

__all__ = ["fused_train_ff", "ff_geometry", "eps_uniform"]

# Classic-interpreter switch for CPU tests (see train_fused.INTERPRET).
INTERPRET = False


def _padto(v: int, m: int) -> int:
    return -(-v // m) * m


# ---------------------------------------------------------------------------
# In-kernel feature-resolution QAT noise.
#
# The reference's default QAT mode draws iid uniform noise on every decoder
# input feature ([N, F] per step — image_compression.py:250). kernel3 never
# materializes that matrix, so the noise is drawn INSIDE the kernel from a
# counter-based hash (pure jnp int32 ops — identical on TPU and the CPU
# interpreters, unlike pltpu.prng_*, and exactly reproducible outside the
# kernel for the autodiff parity tests): eps = u(hash(pixel·fslot + j)) with
# u mapping 32 bits to [−0.5, 0.5)·2^−bits, the same distribution as
# core.quant.qat_noise. A different stream than jax.random — accepted on the
# same 320k-convergence-evidence basis as the rng_impl=rbg default
# (BASELINE.md). z1 picks it up as eps·W1 (one MXU dot — the folded-basis
# identity (x+ε)W1 = xW1 + εW1), and dW1 picks up the missing εᵀ·dz1 term as
# a second dot written to the grad tile.
# ---------------------------------------------------------------------------


def _mix32(x):
    """lowbias32-style avalanche (int32, wrapping multiplies)."""
    sr = jax.lax.shift_right_logical
    x = x ^ sr(x, 16)
    x = x * jnp.int32(0x21F0AAAD)
    x = x ^ sr(x, 15)
    x = x * jnp.int32(0x735A2D97)
    x = x ^ sr(x, 15)
    return x


def eps_uniform(ctr, s0, s1, bits: int):
    """Counter-hash uniform noise in [−0.5, 0.5)·2^−bits (f32).

    ``ctr`` int32 array (unique per draw), ``s0``/``s1`` int32 scalars
    (per-step stream id). Distribution parity with
    ``core.quant.qat_noise``; stream differs by construction."""
    x = _mix32(ctr ^ s0)
    x = _mix32(x ^ s1)
    m = jax.lax.shift_right_logical(x, 9) | jnp.int32(0x3F800000)
    u = jax.lax.bitcast_convert_type(m, jnp.float32) - 1.5
    return u * (2.0 ** (-bits))


def ff_geometry(*, crops: int, n: int, rowsb: int, f: int, hidden: int,
                pe_channels: int, oc: int = 3) -> bool:
    """Eligibility gate for the feature-free kernel (see module doc)."""
    f1 = 2 * f
    B = n // rowsb
    return (
        2 * hidden <= 128
        and 2 * oc <= 8
        and pe_channels <= 8
        and f1 <= 8
        and rowsb >= f1
        and rowsb % f1 == 0
        and n % rowsb == 0
        and B % 2 == 0
        and (rowsb * n) % 128 == 0
        and (n + 8) % f == 0
        and (n + 8) % f1 == 0
    )


def _layout3(hidden: int, oc: int, fslot: int = 0) -> dict:
    """Row offsets of the packed parameter/grad tiles (lane width 2H).

    Parameter tile: [pe0 | pe1 | bvec | w2 | b2 | w3t | b3]; grad tile
    adds a loss row. pe0 is block-diagonal over lane halves (row o < 8 =
    W1_pe0[o] in lanes :H, row 8+o in lanes H:), pe1/bvec are duplicated
    across halves, w2/w3t/b3 follow train_fused._layout2.

    ``fslot > 0`` (in-kernel feature noise): both tiles grow 2·fslot rows
    at ``w1n`` — the FULL W1 in block-diagonal lane halves on the way in,
    the εᵀ·dz1 dW1 contribution on the way out."""
    o = {}
    o["pe0"] = 0
    o["pe1"] = 16
    o["bv"] = o["pe1"] + 8
    o["w2"] = o["bv"] + 8
    o["b2"] = o["w2"] + 2 * hidden
    o["w3t"] = o["b2"] + 8
    o["b3"] = o["w3t"] + 8
    o["loss"] = o["b3"] + 8
    o["w1n"] = o["loss"] + 8
    rows = o["w1n"] + 2 * fslot if fslot else o["loss"]
    o["rows_in"] = rows if fslot else o["loss"]
    o["rows_out"] = rows if fslot else o["loss"] + 8
    return o


def _tri_slot_consts(npe: int):
    """Per-PE-row (valid, 1/2^octave, offset) of the triangular encoding
    (nic.core.encodings.triangular_pe — utils.py:211-223 semantics
    including the skipped (octave 0, offset 0.5) slot)."""
    octs = npe // 2
    out = []
    for r in range(npe):
        j = npe - 1 - r
        if j == 0 or j >= 2 * octs:
            out.append((0.0, 1.0, 0.0))
        else:
            out.append((1.0, 1.0 / (2.0 ** (j // 2)),
                        0.5 if j % 2 == 0 else 0.0))
    return out


def _lane_const(lane_idx, consts, width: int):
    """Broadcast python constants per (lane_idx % 8) slot onto an f32
    array shaped like ``lane_idx`` (static unroll — npe ≤ 8)."""
    acc = jnp.zeros(lane_idx.shape, jnp.float32)
    for k, v in enumerate(consts):
        acc = jnp.where(lane_idx % 8 == k, jnp.float32(v), acc)
    return acc


def _tri_table(t, lane_idx, slots):
    """tri((t / 2^octave) − offset per lane slot), zeroed on unfilled
    slots. ``t``: f32 coordinates broadcast to lane_idx.shape."""
    valid = _lane_const(lane_idx, [s[0] for s in slots], 8)
    inv_div = _lane_const(lane_idx, [s[1] for s in slots], 8)
    off = _lane_const(lane_idx, [s[2] for s in slots], 8)
    u = t * inv_div - off
    m = u - 2.0 * jnp.floor(u * 0.5)          # u mod 2
    return valid * (2.0 * jnp.abs(m - 1.0) - 1.0)


def _colexpand(scr_ref, win, fexp: int, start, count: int):
    """[rows, wc, L] → [rows, count, L]: out[:, j] = win[:, (start+j)//fexp]
    for a traced phase ``start`` ∈ [0, fexp). Repeat (broadcast-reshape —
    an outer-dim split, lanes unchanged) + dynamic sublane slice via the
    scratch ref (lax.dynamic_slice on VALUES has no TPU lowering)."""
    rows, wc, lanes = win.shape
    if fexp == 1:
        return win[:, :count, :]
    rep = jnp.broadcast_to(win[:, :, None, :], (rows, wc, fexp, lanes))
    rep = rep.reshape(rows, wc * fexp, lanes)
    scr_ref[:rows, : wc * fexp, :] = rep
    return scr_ref[:rows, pl.ds(start, count), :]


def _rowexpand(scr_ref, x, fexp: int, start, count: int):
    """[wr, n, L] → [count, n, L]: out[i] = x[(start+i)//fexp] (nearest
    row expansion with traced phase)."""
    wr, nn, lanes = x.shape
    if fexp == 1:
        return x[:count]
    rep = jnp.concatenate(
        [x[k // fexp : k // fexp + 1] for k in range(count + fexp)], axis=0)
    scr_ref[: count + fexp, :nn, :] = rep
    return scr_ref[pl.ds(start, count), :nn, :]


def _rowinterp_pair(scr_ref, x, f1: int, start, count: int):
    """Row-interp samples: (a, b) with a[i] = x[(start+i)//f1],
    b[i] = x[(start+i)//f1 + 1]."""
    wr, nn, lanes = x.shape
    total = count + 2 * f1
    rep = jnp.concatenate(
        [x[k // f1 : k // f1 + 1] for k in range(total)], axis=0)
    scr_ref[:total, :nn, :] = rep
    a = scr_ref[pl.ds(start, count), :nn, :]
    b = scr_ref[pl.ds(start + f1, count), :nn, :]
    return a, b


def _kernel_ff(org_ref, pm_ref, ph_ref, c1m_ref, c1a_ref, c1b_ref, tgta_ref,
               tgtb_ref, pk_ref, out_ref, gk_ref, dp_ref, dc1_ref, scrc_ref,
               scrr_ref, scrd_ref, *, cd, inv_total: float, gelu: str,
               hidden: int, oc: int, npe: int, lodf: float, lay: tuple,
               rowsb: int, n: int, f: int, f1: int, mh0: int, mh1: int,
               nr0: int, nc0: int, pc0: int, nr1: int, nc1: int, pc1: int,
               nbits: int | None = None, fslot: int = 0, bpc: int = 0):
    f32 = jnp.float32
    (o_pe0, o_pe1, o_bv, o_w2, o_b2, o_w3t, o_b3, o_loss, o_w1n) = lay
    h2w = 2 * hidden
    crop = pl.program_id(0)
    bp = pl.program_id(1)
    o0 = org_ref[crop, 0]
    o1 = org_ref[crop, 1]
    ph0 = o0 % f if f > 1 else 0
    phc0 = o1 % f if f > 1 else 0
    ph1 = o0 % f1
    phc1 = o1 % f1

    pk = pk_ref[0]
    w2 = pk[o_w2 : o_w2 + h2w, :].astype(cd)
    b2 = pk[o_b2 : o_b2 + 1, :]
    w3t = pk[o_w3t : o_w3t + 2 * oc, :].astype(cd)
    b3col = pk[o_b3 : o_b3 + 2 * oc, 0:1]

    # ---- z1 build: G0 fold window, nearest expansion ----
    pwin = jnp.concatenate([pm_ref[:, :, :], ph_ref[:, :, :]], axis=0)
    g0cols = _colexpand(scrc_ref, pwin, f, phc0, n)    # [mh0+1, n, 2H]
    g0t = _rowexpand(scrr_ref, g0cols, f, ph0, rowsb)  # [rowsb, n, 2H]

    # ---- C1 fold window, bilinear expansion ----
    c1win = jnp.concatenate(
        [c1m_ref[:, :, :], c1a_ref[:, :, :], c1b_ref[:, :, :]], axis=0)
    ca = _colexpand(scrc_ref, c1win, f1, phc1, n)
    cb = _colexpand(scrc_ref, c1win, f1, phc1 + f1, n)
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    fu_c = ((cc + phc1) % f1).astype(f32) * (1.0 / f1)
    c1cols = (1.0 - fu_c) * ca + fu_c * cb             # [mh1+2, n, 2H]
    ra, rb = _rowinterp_pair(scrr_ref, c1cols, f1, ph1, rowsb)
    rr = jax.lax.broadcasted_iota(jnp.int32, (rowsb, 1, 1), 0)
    fu_r = ((rr + ph1) % f1).astype(f32) * (1.0 / f1)
    c1t = (1.0 - fu_r) * ra + fu_r * rb                # [rowsb, n, 2H]

    # ---- separable triangular PE, computed in-kernel ----
    slots = _tri_slot_consts(npe)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (rowsb, 16), 1)
    irow = jax.lax.broadcasted_iota(jnp.int32, (rowsb, 16), 0)
    y_a = (o0 + 2 * bp * rowsb).astype(f32)
    yy = irow.astype(f32) + jnp.where(lane16 < 8, y_a, y_a + rowsb)
    trow = _tri_table(yy * (1.0 / f1), lane16, slots)   # [rowsb, 16]
    peu = jnp.dot(trow, pk[o_pe0 : o_pe0 + 16, :],
                  preferred_element_type=f32)           # [rowsb, 2H]
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (n, 8), 1)
    icol = jax.lax.broadcasted_iota(jnp.int32, (n, 8), 0)
    tcol = _tri_table((icol.astype(f32) + o1.astype(f32)) * (1.0 / f1),
                      lane8, slots)                     # [n, 8]
    colterm = jnp.dot(tcol, pk[o_pe1 : o_pe1 + 8, :],
                      preferred_element_type=f32)       # [n, 2H]

    z1_3d = (g0t + c1t + peu[:, None, :] + colterm[None, :, :]
             + pk[o_bv : o_bv + 1, :][None, :, :])
    z1 = z1_3d.reshape(rowsb * n, h2w)

    # ---- in-kernel feature-resolution QAT noise (module doc above) ----
    eps_cd = None
    if nbits is not None:
        R2 = rowsb * n
        slot2 = 2 * fslot
        irow = jax.lax.broadcasted_iota(jnp.int32, (R2, slot2), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R2, slot2), 1)
        half = jnp.where(lane >= fslot, jnp.int32(1), jnp.int32(0))
        j = lane - fslot * half
        # gid = flat pixel index in (crop, row-major) order — the same
        # order as the gather path's [N, F] rows, so the parity tests can
        # rebuild ε outside the kernel with arange. The seed payload's
        # third word is a pixel-index base: under shard_map each device
        # passes didx·crops_local·n² so the sharded stream is
        # BIT-IDENTICAL to the single-device one.
        sp = pl.num_programs(0)
        gid = (crop * bpc + 2 * bp + half) * R2 + irow + org_ref[sp + 1, 0]
        eps = eps_uniform(gid * fslot + j, org_ref[sp, 0],
                          org_ref[sp, 1], nbits)
        eps_cd = eps.astype(cd)
        z1 = z1 + jnp.dot(
            eps_cd, pk[o_w1n : o_w1n + slot2, :].astype(cd),
            preferred_element_type=f32)

    # ---- MLP tail fwd + MSE + bwd (train_fused._mlp_core2 sans layer 1) --
    h1, aux1 = _gelu_fwd(z1, gelu)
    h1b = h1.astype(cd)
    z2 = jnp.dot(h1b, w2, preferred_element_type=f32) + b2
    h2, aux2 = _gelu_fwd(z2, gelu)
    h2b = h2.astype(cd)
    z3t = jax.lax.dot_general(
        w3t, h2b, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ) + b3col                                           # [2OC, R]
    out = jax.nn.sigmoid(z3t)
    tgt = jnp.concatenate([tgta_ref[:, :], tgtb_ref[:, :]], axis=0)
    diff = out - tgt
    out_ref[:, :] = out
    gk_ref[0, o_loss : o_loss + 1, :] = jnp.full(
        (1, h2w), jnp.sum(diff * diff) * inv_total, f32)

    dz3t = (2.0 * inv_total) * diff * out * (1.0 - out)
    dz3b = dz3t.astype(cd)
    gk_ref[0, o_w3t : o_w3t + 2 * oc, :] = jax.lax.dot_general(
        dz3b, h2b, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    gk_ref[0, o_b3 : o_b3 + 2 * oc, 0:1] = jnp.sum(dz3t, axis=1,
                                                   keepdims=True)
    dh2 = jax.lax.dot_general(
        dz3b, w3t, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dz2 = dh2 * _gelu_bwd(z2, aux2, gelu)
    dz2b = dz2.astype(cd)
    gk_ref[0, o_w2 : o_w2 + h2w, :] = jax.lax.dot_general(
        h1b, dz2b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    gk_ref[0, o_b2 : o_b2 + 1, :] = jnp.sum(dz2, axis=0, keepdims=True)
    dh1 = jax.lax.dot_general(
        dz2b, w2, (((1,), (1,)), ((), ())), preferred_element_type=f32)
    dz1 = dh1 * _gelu_bwd(z1, aux1, gelu)

    # ---- PE / bias gradients (tiny MXU dots against the tables) ----
    z3d = dz1.reshape(rowsb, n, h2w)
    rowsum = jnp.sum(z3d, axis=1)                       # [rowsb, 2H]
    colsum = jnp.sum(z3d, axis=0)                       # [n, 2H]
    gk_ref[0, o_pe0 : o_pe0 + 16, :] = jax.lax.dot_general(
        trow, rowsum, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    gk_ref[0, o_pe1 : o_pe1 + 8, :] = jax.lax.dot_general(
        tcol, colsum, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    gk_ref[0, o_bv : o_bv + 1, :] = jnp.sum(dz1, axis=0, keepdims=True)
    if nbits is not None:
        # dW1 = (x+ε)ᵀ·dz1: the xᵀ part comes from the node-plane unfold;
        # this is the εᵀ·dz1 remainder (lane halves folded at extraction)
        gk_ref[0, o_w1n : o_w1n + 2 * fslot, :] = jax.lax.dot_general(
            eps_cd, dz1.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    # ---- node-resolution grid cotangents (kernel2's packed reductions) --
    dp = _rowreduce_sum(
        _colreduce(scrd_ref, z3d, phc0, f, nc0),
        ph0, f, nr0)
    if pc0 > nc0:
        dp = jnp.concatenate(
            [dp, jnp.zeros((nr0, pc0 - nc0, h2w), f32)], axis=1)
    dp_ref[0] = dp
    sa = _colreduce(scrd_ref, z3d * (1.0 - fu_c), phc1, f1, nc1 - 1)
    sb = _colreduce(scrd_ref, z3d * fu_c, phc1, f1, nc1 - 1)
    zrow = jnp.zeros((rowsb, 1, h2w), f32)
    dcol = (jnp.concatenate([sa, zrow], axis=1)
            + jnp.concatenate([zrow, sb], axis=1))
    dc1 = _rowreduce_g1(dcol, ph1, f1, nr1)
    if pc1 > nc1:
        dc1 = jnp.concatenate(
            [dc1, jnp.zeros((nr1, pc1 - nc1, h2w), f32)], axis=1)
    dc1_ref[0] = dc1


@functools.partial(
    jax.jit,
    static_argnames=("crops", "n", "rowsb", "f", "npe", "lodf",
                     "matmul_dtype", "gelu", "interpret", "nbits"))
def _impl_ff(g0, g1, w1, b1, w2, b2, w3, b3, tgt, origins, seed, *,
             crops: int, n: int, rowsb: int, f: int, npe: int, lodf: float,
             matmul_dtype, gelu: str = "erf", interpret: bool = False,
             nbits: int | None = None):
    f32 = jnp.float32
    cd = matmul_dtype or f32
    hidden = w2.shape[0]
    oc = w3.shape[1]
    ch = g0.shape[0]
    f1 = 2 * f
    B = n // rowsb
    B2 = B // 2
    R = rowsb * n
    steps2 = crops * B2
    n_total = crops * n * n
    h2w = 2 * hidden
    mh0 = rowsb // f
    mh1 = rowsb // f1
    wc0p = _pad8(n // f + 1)
    wc1p = _pad8(n // f1 + 2)
    rpc0 = _padto(n // f + 1, mh0)
    rpc1 = _padto(n // f1 + 2, mh1)
    nr0 = (rowsb + f - 2) // f + 1
    nc0 = (n + f - 2) // f + 1
    nr1 = (rowsb + f1 - 2) // f1 + 2
    nc1 = n // f1 + 2
    pc0 = _pad8(nc0)
    pc1 = _pad8(nc1)
    nfeat = 5 * ch + 2 * npe + 1
    fslot = _pad8(nfeat) if nbits is not None else 0
    lay = _layout3(hidden, oc, fslot)

    # ---- fold the first layer into the grids (node resolution) ----
    # (per-axis cell counts: rectangular images have [C, sr, sc] grids;
    # crops are still n×n so the kernel geometry is unchanged)
    corners = ((0, 0), (0, 1), (1, 0), (1, 1))
    cells_r = g0.shape[1] - 1
    cells_c = g0.shape[2] - 1
    p_plane = None
    for k, (a, b) in enumerate(corners):
        sl = jnp.moveaxis(
            g0[:, a : a + cells_r, b : b + cells_c], 0, -1)  # [cr, cc, C]
        blk = w1[k * ch : (k + 1) * ch].astype(cd)
        term = jax.lax.dot_general(
            sl.astype(cd), blk, (((2,), (0,)), ((), ())),
            preferred_element_type=f32)
        p_plane = term if p_plane is None else p_plane + term
    w_g1 = w1[4 * ch : 5 * ch].astype(cd)
    c1_plane = jax.lax.dot_general(
        jnp.moveaxis(g1, 0, -1).astype(cd), w_g1, (((2,), (0,)), ((), ())),
        preferred_element_type=f32)

    # padding so every staged window read is in-bounds (extra entries are
    # zeros, only ever multiplied by zero interp weight / never selected)
    pr0 = rpc0 - n // f + mh0
    pcol0 = wc0p - n // f
    p_pad = jnp.pad(p_plane, ((0, pr0), (0, pcol0), (0, 0)))
    pr1 = rpc1 - n // f1 + mh1 + 1
    pcol1 = wc1p - n // f1
    c1_pad = jnp.pad(c1_plane, ((0, pr1), (0, pcol1), (0, 0)))

    # ---- per-crop window staging (dynamic_slice + lane-shift pack) ----
    def stage(org):
        r0 = org[0] // f
        c0 = org[1] // f
        a = jax.lax.dynamic_slice(
            p_pad, (r0, c0, 0), (rpc0 + mh0, wc0p, hidden))
        pw = jnp.concatenate([a[:rpc0], a[mh0 : mh0 + rpc0]], axis=-1)
        r1 = org[0] // f1
        c1i = org[1] // f1
        bwin = jax.lax.dynamic_slice(
            c1_pad, (r1, c1i, 0), (rpc1 + mh1, wc1p, hidden))
        c1w = jnp.concatenate([bwin[:rpc1], bwin[mh1 : mh1 + rpc1]], axis=-1)
        return pw, c1w

    pw_all, c1w_all = jax.vmap(stage)(origins)
    pw_all = pw_all.reshape(crops * rpc0, wc0p, h2w)
    c1w_all = c1w_all.reshape(crops * rpc1, wc1p, h2w)

    # ---- packed parameter tile ----
    pk = jnp.zeros((lay["rows_in"], h2w), f32)
    base = 5 * ch
    wpe0 = w1[base : base + npe].astype(f32)            # [npe, H]
    wpe1 = w1[base + npe : base + 2 * npe].astype(f32)
    w_lod = w1[base + 2 * npe].astype(f32)
    pk = pk.at[lay["pe0"] : lay["pe0"] + npe, :hidden].set(wpe0)
    pk = pk.at[lay["pe0"] + 8 : lay["pe0"] + 8 + npe, hidden:].set(wpe0)
    pk = pk.at[lay["pe1"] : lay["pe1"] + npe, :hidden].set(wpe1)
    pk = pk.at[lay["pe1"] : lay["pe1"] + npe, hidden:].set(wpe1)
    bvec = b1.astype(f32) + lodf * w_lod
    pk = pk.at[lay["bv"], :hidden].set(bvec)
    pk = pk.at[lay["bv"], hidden:].set(bvec)
    w2f = w2.astype(f32)
    pk = pk.at[lay["w2"] : lay["w2"] + hidden, :hidden].set(w2f)
    pk = pk.at[lay["w2"] + hidden : lay["w2"] + h2w, hidden:].set(w2f)
    b2f = b2.astype(f32)
    pk = pk.at[lay["b2"], :hidden].set(b2f)
    pk = pk.at[lay["b2"], hidden:].set(b2f)
    w3tf = w3.astype(f32).T
    pk = pk.at[lay["w3t"] : lay["w3t"] + oc, :hidden].set(w3tf)
    pk = pk.at[lay["w3t"] + oc : lay["w3t"] + 2 * oc, hidden:].set(w3tf)
    b3f = b3.astype(f32)
    pk = pk.at[lay["b3"] : lay["b3"] + oc].set(
        jnp.broadcast_to(b3f[:, None], (oc, h2w)))
    pk = pk.at[lay["b3"] + oc : lay["b3"] + 2 * oc].set(
        jnp.broadcast_to(b3f[:, None], (oc, h2w)))
    orgs = origins.astype(jnp.int32)
    if nbits is not None:
        # full W1 in block-diagonal lane halves for the ε·W1 noise dot
        w1f = w1.astype(f32)
        pk = pk.at[lay["w1n"] : lay["w1n"] + nfeat, :hidden].set(w1f)
        pk = pk.at[lay["w1n"] + fslot : lay["w1n"] + fslot + nfeat,
                   hidden:].set(w1f)
        # the stream id [s0, s1] + pixel base ride as two extra
        # scalar-prefetch rows (read at org_ref[num_programs(0)] and the
        # row after — no index_map changes)
        orgs = jnp.concatenate([orgs, seed.reshape(2, 2)], axis=0)
    pkt = jnp.tile(pk[None], (steps2, 1, 1))

    tgt_t = tgt.T

    kernel = functools.partial(
        _kernel_ff, cd=cd, inv_total=1.0 / (n_total * oc), gelu=gelu,
        hidden=hidden, oc=oc, npe=npe, lodf=lodf,
        lay=(lay["pe0"], lay["pe1"], lay["bv"], lay["w2"], lay["b2"],
             lay["w3t"], lay["b3"], lay["loss"], lay["w1n"]),
        rowsb=rowsb, n=n, f=f, f1=f1, mh0=mh0, mh1=mh1, nr0=nr0, nc0=nc0,
        pc0=pc0, nr1=nr1, nc1=nc1, pc1=pc1, nbits=nbits, fslot=fslot,
        bpc=B,
    )
    rb0 = rpc0 // mh0
    rb1 = rpc1 // mh1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(crops, B2),
        in_specs=[
            pl.BlockSpec((mh0, wc0p, h2w),
                         lambda c, b, org: (c * rb0 + 2 * b, 0, 0)),
            pl.BlockSpec((1, wc0p, h2w),
                         lambda c, b, org: (c * rpc0 + (2 * b + 1) * mh0,
                                            0, 0)),
            pl.BlockSpec((mh1, wc1p, h2w),
                         lambda c, b, org: (c * rb1 + 2 * b, 0, 0)),
            pl.BlockSpec((1, wc1p, h2w),
                         lambda c, b, org: (c * rpc1 + (2 * b + 1) * mh1,
                                            0, 0)),
            pl.BlockSpec((1, wc1p, h2w),
                         lambda c, b, org: (c * rpc1 + (2 * b + 1) * mh1 + 1,
                                            0, 0)),
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
            pltpu.VMEM((max(mh0 + 1, mh1 + 2),
                        max(wc0p * f, wc1p * f1), h2w), jnp.float32),
            pltpu.VMEM((rowsb + 2 * f1, n, h2w), jnp.float32),
            pltpu.VMEM((rowsb, n + 16, h2w), jnp.float32),
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
            flops=6 * n_total * (hidden * hidden + hidden * oc),
            bytes_accessed=(pw_all.size + c1w_all.size
                            + 2 * n_total * oc) * 4,
            transcendentals=0 if gelu == "poly" else 4 * n_total * hidden,
        ),
    )(orgs, pw_all, pw_all, c1w_all, c1w_all, c1w_all,
      tgt_t, tgt_t, pkt)

    # unpack lane halves back to the standard layouts
    out_t = jnp.stack([out_p[:oc], out_p[oc:]], axis=0)
    out_t = out_t.reshape(2, oc, steps2, R).transpose(1, 2, 0, 3).reshape(
        oc, n_total)
    loss, dw2, db2, dw3, db3, dpe0, dpe1, db1, dw1e = _extract_ff(
        gk, lay, hidden, oc, npe, nfeat, fslot)
    dp_u = jnp.stack([dp[..., :hidden], dp[..., hidden:]], axis=1).reshape(
        steps2 * 2, nr0, pc0, hidden)
    dc1_u = jnp.stack([dc1[..., :hidden], dc1[..., hidden:]],
                      axis=1).reshape(steps2 * 2, nr1, pc1, hidden)
    return (loss, out_t.T, dw2, db2, dw3, db3, dpe0, dpe1, db1, dp_u, dc1_u,
            dw1e)


def _extract_ff(gk, lay: dict, hidden: int, oc: int, npe: int,
                nfeat: int = 0, fslot: int = 0):
    """Sum per-step grad tiles and fold lane halves; returns
    (loss, dw2, db2, dw3, db3, dpe0, dpe1, db1, dw1e) — ``dw1e`` is the
    εᵀ·dz1 W1 contribution (None when feature noise is off)."""
    h2w = 2 * hidden
    g = jnp.sum(gk, axis=0)
    loss = jnp.sum(gk[:, lay["loss"], 0])
    dw2 = (g[lay["w2"] : lay["w2"] + hidden, :hidden]
           + g[lay["w2"] + hidden : lay["w2"] + h2w, hidden:])
    db2 = g[lay["b2"], :hidden] + g[lay["b2"], hidden:]
    dw3 = (g[lay["w3t"] : lay["w3t"] + oc, :hidden]
           + g[lay["w3t"] + oc : lay["w3t"] + 2 * oc, hidden:]).T
    db3 = (g[lay["b3"] : lay["b3"] + oc, 0]
           + g[lay["b3"] + oc : lay["b3"] + 2 * oc, 0])
    dpe0 = (g[lay["pe0"] : lay["pe0"] + npe, :hidden]
            + g[lay["pe0"] + 8 : lay["pe0"] + 8 + npe, hidden:])
    dpe1 = (g[lay["pe1"] : lay["pe1"] + npe, :hidden]
            + g[lay["pe1"] : lay["pe1"] + npe, hidden:])
    db1 = g[lay["bv"], :hidden] + g[lay["bv"], hidden:]
    dw1e = None
    if fslot:
        dw1e = (g[lay["w1n"] : lay["w1n"] + nfeat, :hidden]
                + g[lay["w1n"] + fslot : lay["w1n"] + fslot + nfeat, hidden:])
    return loss, dw2, db2, dw3, db3, dpe0, dpe1, db1, dw1e


def _unfold_ff(dp, dc1, origins, g0, g1, w1, db1, dpe0, dpe1, *,
               crops: int, n: int, rowsb: int, f: int, npe: int,
               lodf: float, channels: int):
    """XLA backward tail: accumulate the node planes once, then contract
    BOTH ways — with W1 blocks for (dG0, dG1) (train_fused semantics) and
    with the grid VALUES for the W1 feature blocks:

        dW1_k  = Σ_cells G0[:, cell+off_k] ⊗ dP[cell]
        dW1_g1 = Σ_nodes G1[:, node] ⊗ dC1[node]

    (the transpose of the dG0/dG1 contractions — the grids here are the
    same noised values the forward folded). PE rows come from the
    in-kernel table contractions; the LOD row is lod·db1."""
    f32 = jnp.float32
    hidden = w1.shape[1]
    ch = channels
    g0r, g0c = g0.shape[1], g0.shape[2]
    g1r, g1c = g1.shape[1], g1.shape[2]
    pacc, c1acc = _accumulate_node_planes(
        dp, dc1, origins, crops=crops, ncols=n, rowsb=rowsb, f=f,
        g0_nodes=(g0r, g0c), g1_nodes=(g1r, g1c), hidden=hidden)

    corners = ((0, 0), (0, 1), (1, 0), (1, 1))
    dg0 = jnp.zeros((g0r + 2, g0c + 2, ch), f32)
    g0p = jnp.pad(g0.astype(f32), ((0, 0), (0, 2), (0, 2)))
    g1p = jnp.pad(g1.astype(f32), ((0, 0), (0, 2), (0, 2)))
    w1_rows = []
    for k, (a, b) in enumerate(corners):
        blk = w1[k * ch : (k + 1) * ch]
        t = jax.lax.dot_general(pacc, blk, (((2,), (1,)), ((), ())),
                                preferred_element_type=f32)
        dg0 = dg0.at[a : a + g0r + 1, b : b + g0c + 1].add(t)
        # dW1 block k: grid window ⊗ accumulated dP
        gsl = g0p[:, a : a + g0r + 1, b : b + g0c + 1]
        w1_rows.append(jax.lax.dot_general(
            gsl.reshape(ch, -1), pacc.reshape(-1, hidden),
            (((1,), (0,)), ((), ())), preferred_element_type=f32))
    dg0 = jnp.moveaxis(dg0[:g0r, :g0c], -1, 0)

    blk1 = w1[4 * ch : 5 * ch]
    t1 = jax.lax.dot_general(c1acc, blk1, (((2,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dg1 = jnp.moveaxis(t1[:g1r, :g1c], -1, 0)
    w1_rows.append(jax.lax.dot_general(
        g1p[:, : g1r + 2, : g1c + 2].reshape(ch, -1),
        c1acc.reshape(-1, hidden),
        (((1,), (0,)), ((), ())), preferred_element_type=f32))
    w1_rows.append(dpe0)
    w1_rows.append(dpe1)
    w1_rows.append(lodf * db1[None, :])
    dw1 = jnp.concatenate(w1_rows, axis=0)
    return dg0, dg1, dw1


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12,
                                                    13, 14))
def fused_train_ff(g0, g1, mlp: dict, tgt, origins, seed, crops: int, n: int,
                   rowsb: int, f: int, npe: int, lodf: float,
                   matmul_dtype=None, gelu: str = "erf",
                   noise_bits: int | None = None):
    """(loss, out) of the flagship train objective with the FEATURE BUILD
    fused into the kernel: no [N, F] matrix exists anywhere (forward or
    backward). ``g0``/``g1``: the active (possibly node-noised) grids,
    whose VALUES drive the fold and the W1 gradient; all their gradients
    and the full MLP gradient are hand-built (node-resolution planes +
    tiny contractions). ``origins``: [crops, 2] int32 crop origins.
    ``noise_bits`` ≠ None: feature-resolution QAT noise is drawn INSIDE
    the kernel (``eps_uniform`` stream) from ``seed`` [4] int32 =
    [s0, s1, pixel_base, 0] — pass zeros when off; ``pixel_base`` offsets
    the flat pixel counter so shard_map'ed devices reproduce the exact
    single-device stream. Geometry must satisfy :func:`ff_geometry`;
    triangular PE only.

    Matches the reference's per-epoch loss and gradients
    (image_compression.py:239-267) to summation-order rounding — the
    parity tests drive this against the gather+autodiff path."""
    res = _impl_ff(
        g0, g1, mlp["w1"], mlp["b1"], mlp["w2"], mlp["b2"], mlp["w3"],
        mlp["b3"], tgt, origins, seed, crops=crops, n=n, rowsb=rowsb, f=f,
        npe=npe, lodf=lodf, matmul_dtype=matmul_dtype, gelu=gelu,
        interpret=INTERPRET, nbits=noise_bits)
    return res[0], res[1]


def _fwd_ff(g0, g1, mlp, tgt, origins, seed, crops, n, rowsb, f, npe, lodf,
            matmul_dtype, gelu, noise_bits):
    (loss, out, dw2, db2, dw3, db3, dpe0, dpe1, db1, dp, dc1,
     dw1e) = _impl_ff(
        g0, g1, mlp["w1"], mlp["b1"], mlp["w2"], mlp["b2"], mlp["w3"],
        mlp["b3"], tgt, origins, seed, crops=crops, n=n, rowsb=rowsb, f=f,
        npe=npe, lodf=lodf, matmul_dtype=matmul_dtype, gelu=gelu,
        interpret=INTERPRET, nbits=noise_bits)
    res = (dw2, db2, dw3, db3, dpe0, dpe1, db1, dp, dc1, origins,
           mlp["w1"], g0, g1, dw1e, seed)
    return (loss, out), res


def _bwd_ff(crops, n, rowsb, f, npe, lodf, matmul_dtype, gelu, noise_bits,
            res, cot):
    import numpy as np

    (dw2, db2, dw3, db3, dpe0, dpe1, db1, dp, dc1, origins, w1, g0,
     g1, dw1e, seed) = res
    g_loss, _ = cot
    oc = dw3.shape[1]
    dg0, dg1, dw1 = _unfold_ff(
        dp, dc1, origins, g0, g1, w1, db1, dpe0, dpe1, crops=crops, n=n,
        rowsb=rowsb, f=f, npe=npe, lodf=lodf, channels=g0.shape[0])
    if dw1e is not None:
        dw1 = dw1 + dw1e
    dmlp = {
        "w1": dw1 * g_loss, "b1": db1 * g_loss,
        "w2": dw2 * g_loss, "b2": db2 * g_loss,
        "w3": dw3 * g_loss, "b3": db3 * g_loss,
    }
    return (dg0 * g_loss, dg1 * g_loss, dmlp,
            jnp.zeros((crops * n * n, oc), jnp.float32),
            np.zeros(origins.shape, jax.dtypes.float0),
            np.zeros(seed.shape, jax.dtypes.float0))


fused_train_ff.defvjp(_fwd_ff, _bwd_ff)

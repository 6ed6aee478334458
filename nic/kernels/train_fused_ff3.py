"""Feature-free fused 3D train kernel (TRAIN_FORWARD=kernel3, ndim=3).

The 3D analog of :mod:`nic.kernels.train_fused_ff`: the spatiotemporal
feature build of the reference's methods 3/4
(``Projects/fp_def.py:148-223`` + ``image_compression.py:242-245`` of
21K1113/Neural_Image_Compression_V2 — 8-corner/sparse-4-corner G0
gathers + trilinear G1 + 3-axis PE) never materializes the [N, 127]
feature matrix. Division of labor (different from the 2D kernel, which
rebuilds everything in-kernel):

- **XLA fold** (once per step): ``P = Σ_k shift_k(G0)·W1_k`` at CELL
  resolution and ``C1 = G1·W1_g1`` at node resolution — identical
  algebra to the decode-side fastdecode fold; sparse method-4 G0 only
  changes the corner set.
- **XLA per-crop staging**: the a1/a2 (intra-frame) axes are expanded to
  pixel resolution at SLAB-CELL granularity — P nearest-expanded along
  a1 only ([wr0 slab-cells, n, wa0 a2-cells, H], the a2 expansion stays
  in-kernel to keep HBM traffic at ~f× below pixel volume), C1
  a1-interpolated ([wr1 slab-nodes, n, wb1 a2-nodes, H]), and the a1/a2
  PE terms + b1 + lod·w_lod folded into the P planes. The 3-axis PE is
  computed with the real encodings functions here, so BOTH triangular
  and sinusoidal PE are supported (the 2D kernel's in-kernel tri tables
  are tri-only).
- **Kernel** (per slab block): fetches each slab's cell/node planes via
  SCALAR-PREFETCH-dependent index maps — the slab position of block b of
  crop c is ``(origin₀ % f + rowsb·b + i) // f``, data-dependent block
  indices being exactly what PrefetchScalarGridSpec exists for — then
  a2-expands in VMEM (nearest for P, linear for C1), interpolates the
  slab axis with traced weights, adds the slab-PE rows, optionally draws
  in-kernel feature noise (the 2D kernel's ``eps_uniform`` stream), runs
  the MLP tail fwd+MSE+bwd, and reduces dz1 to node volumes with the
  EXACT `_kernel_ng3` reduction sequence. Three extra row-sum outputs
  (slab/a1/a2 sums of dz1) feed the PE gradients.
- **XLA unfold**: the vectorized :func:`_accumulate_node_volumes` plus
  contractions give dG0/dG1 (via W1) and the W1 gradient blocks (via the
  grid values), PE rows via table contractions, lod row = lod·db1.

Geometry gate: :func:`ff3_geometry` — 3D dense or sparse-G0 power-of-two
lattice, step ≤ 1, per-block rows ≤ 2048 (the Mosaic block cap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nic.kernels.train_fused import (
    _CORNERS_3D_DENSE,
    _CORNERS_3D_SPARSE,
    _accumulate_node_volumes,
    _colreduce,
    _gelu_bwd,
    _gelu_fwd,
    _outerreduce,
    _pad8,
    _rowreduce_g1,
    _rowreduce_sum,
)
from nic.kernels.train_fused_ff import _colexpand, eps_uniform

__all__ = ["fused_train_ff3", "ff3_geometry"]

# Classic-interpreter switch for CPU tests (see train_fused.INTERPRET).
INTERPRET = False


def ff3_geometry(*, crops: int, n: int, rowsb: int, f: int, hidden: int,
                 pe_channels: int, oc: int = 3, nfeat: int = 0) -> bool:
    """Eligibility gate for the 3D feature-free kernel."""
    f1 = 2 * f
    R = rowsb * n * n
    fslot = _pad8(nfeat) if nfeat else 8
    return (
        hidden <= 128
        and oc <= 8
        and pe_channels <= 8
        and f1 <= 8
        and 1 <= rowsb <= n
        and n % rowsb == 0
        and R <= 2048
        and R % 128 == 0
        and (n + 8) % f == 0
        and (n + 8) % f1 == 0
        and crops >= 1
        # in-kernel noise counter gid·fslot + j must stay in int32
        and crops * n**3 * fslot < 2**31
    )


def _layout4(hidden: int, oc: int, fslot: int = 0) -> dict:
    """Row offsets of the packed parameter/grad tiles (lane width H).
    b1/lod are folded into the staged planes, so the tile holds only the
    MLP tail [w2 | b2 | w3t | b3] + a loss row (+ the full W1 for the
    in-kernel noise dot / dW1-noise term when ``fslot`` > 0)."""
    o = {}
    o["w2"] = 0
    o["b2"] = hidden
    o["w3t"] = o["b2"] + 8
    o["b3"] = o["w3t"] + 8
    o["loss"] = o["b3"] + 8
    o["w1n"] = o["loss"] + 8
    o["rows_in"] = o["w1n"] + fslot if fslot else o["loss"]
    o["rows_out"] = o["w1n"] + fslot if fslot else o["loss"] + 8
    return o


def _kernel_ff3(org_ref, *refs, cd, inv_total: float, gelu: str,
                hidden: int, oc: int, lay: tuple, rowsb: int, n: int,
                f: int, f1: int, wa0p: int, wb1p: int, nr0: int, na0: int,
                pa0: int, nr1: int, na1: int, pa1: int,
                nbits: int | None = None, fslot: int = 0):
    f32 = jnp.float32
    (o_w2, o_b2, o_w3t, o_b3, o_loss, o_w1n) = lay
    # unpack refs: rowsb P planes, 2·rowsb C1 taps, pe0, tgt, pk |
    # out, gk, dp, dc1, dsum | scratches
    p_refs = refs[:rowsb]
    c_refs = refs[rowsb:3 * rowsb]
    pe0_ref, tgt_ref, pk_ref = refs[3 * rowsb:3 * rowsb + 3]
    (out_ref, gk_ref, dp_ref, dc1_ref, dsum_ref,
     scrA_ref, scrB_ref, scrC_ref, scrE_ref) = refs[3 * rowsb + 3:]

    crop = pl.program_id(0)
    b = pl.program_id(1)
    o0 = org_ref[crop, 0]
    o2 = org_ref[crop, 2]
    ph2 = o2 % f if f > 1 else 0
    ph2_1 = o2 % f1
    ph0_1 = o0 % f1

    pk = pk_ref[0]
    w2 = pk[o_w2:o_w2 + hidden, :].astype(cd)
    b2 = pk[o_b2:o_b2 + 1, :]
    w3t = pk[o_w3t:o_w3t + oc, :].astype(cd)
    b3col = pk[o_b3:o_b3 + oc, 0:1]

    # ---- z1 build: per-slab a2 expansion + slab interpolation ----
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    fu_c = ((cc + ph2_1) % f1).astype(f32) * (1.0 / f1)
    pe2pl = pe0_ref[0, n:2 * n, :]                  # a2-PE plane [n, H]
    slabs = []
    for i in range(rowsb):
        # P: nearest a2 expansion (a1 PE + bias already folded in staging)
        g0t = _colexpand(scrE_ref, p_refs[i][0, 0], f, ph2, n)  # [n, n, H]
        # C1 taps: linear a2 expansion, then slab interp
        posn = (ph0_1 + rowsb * b + i).astype(f32)
        fu0 = (posn - jnp.floor(posn * (1.0 / f1)) * f1) * (1.0 / f1)
        ca = c_refs[2 * i][0, 0]
        cb = c_refs[2 * i + 1][0, 0]
        ta = _colexpand(scrE_ref, ca, f1, ph2_1, n)
        tb = _colexpand(scrE_ref, ca, f1, ph2_1 + f1, n)
        cai = (1.0 - fu_c) * ta + fu_c * tb
        ta = _colexpand(scrE_ref, cb, f1, ph2_1, n)
        tb = _colexpand(scrE_ref, cb, f1, ph2_1 + f1, n)
        cbi = (1.0 - fu_c) * ta + fu_c * tb
        ci = (1.0 - fu0) * cai + fu0 * cbi
        # slab-PE row of this slab (traced row rowsb·b + i) + a2-PE plane
        pe0row = pe0_ref[0, pl.ds(rowsb * b + i, 1), :]         # [1, H]
        slabs.append(g0t + ci + pe0row[None, :, :]
                     + pe2pl[None, :, :])
    z1_3d = jnp.concatenate(slabs, axis=0)          # [rowsb·n, n, H]
    R = rowsb * n * n
    z1 = z1_3d.reshape(R, hidden)

    # ---- in-kernel feature-resolution QAT noise (train_fused_ff doc) ----
    eps_cd = None
    if nbits is not None:
        irow = jax.lax.broadcasted_iota(jnp.int32, (R, fslot), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (R, fslot), 1)
        nb = pl.num_programs(1)
        gid = (crop * nb + b) * R + irow + org_ref[pl.num_programs(0), 2]
        eps = eps_uniform(gid * fslot + j, org_ref[pl.num_programs(0), 0],
                          org_ref[pl.num_programs(0), 1], nbits)
        eps_cd = eps.astype(cd)
        z1 = z1 + jnp.dot(eps_cd, pk[o_w1n:o_w1n + fslot, :].astype(cd),
                          preferred_element_type=f32)

    # ---- MLP tail fwd + MSE + bwd (train_fused._mlp_core sans layer 1) --
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
    if nbits is not None:
        gk_ref[0, o_w1n:o_w1n + fslot, :] = jax.lax.dot_general(
            eps_cd, dz1.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    # ---- dz1 row sums for the PE gradients (contracted in XLA) ----
    # ONE one-hot indicator matmul on the 2D dz1 [R, H]: Mosaic rejects
    # the relayouts that vector reductions over the [slab, a1, a2]
    # reshape produce ("non-singleton logical dimension is replicated in
    # destination" — both the axis-1 reduce and its per-slab static-slice
    # variant hit it on chip), so the three grouped row sums ride the MXU
    # instead. Row r of dz1 decomposes as r = (slab·n + a1)·n + a2; the
    # indicator stacks [slab-groups | a1-groups | a2-groups] so the
    # product lands in dsum's exact layout.
    nsum = rowsb + 2 * n
    g_i = jax.lax.broadcasted_iota(jnp.int32, (nsum, R), 0)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (nsum, R), 1)
    e_slab = (g_i < rowsb) & (r_i // (n * n) == g_i)
    e_a1 = ((g_i >= rowsb) & (g_i < rowsb + n)
            & ((r_i // n) % n == g_i - rowsb))
    e_a2 = (g_i >= rowsb + n) & (r_i % n == g_i - rowsb - n)
    esum = (e_slab | e_a1 | e_a2).astype(f32)
    dsum_ref[0, :nsum, :] = jax.lax.dot_general(
        esum, dz1, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    z3 = dz1.reshape(rowsb * n, n, hidden)     # [(slab,a1), a2, H]

    # ---- node-resolution grid cotangents (_kernel_ng3's reductions) ----
    o1 = org_ref[crop, 1]
    ph0 = (rowsb * b + o0) % f if f > 1 else 0
    ph0_1b = (rowsb * b + o0) % f1
    ca2 = _colreduce(scrA_ref, z3, o2 % f if f > 1 else 0, f, na0)
    z4 = ca2.reshape(rowsb, n, na0, hidden)
    ca1 = _outerreduce(scrB_ref, z4, o1 % f if f > 1 else 0, f, na0)
    dp = _rowreduce_sum(ca1, ph0, f, nr0)
    if pa0 > na0:
        dp = jnp.concatenate(
            [dp, jnp.zeros((nr0, na0, pa0 - na0, hidden), f32)], axis=2)
    dp_ref[0] = dp

    sa = _colreduce(scrA_ref, z3 * (1.0 - fu_c), ph2_1, f1, na1 - 1)
    sb = _colreduce(scrA_ref, z3 * fu_c, ph2_1, f1, na1 - 1)
    zrow = jnp.zeros((rowsb * n, 1, hidden), f32)
    d2 = (jnp.concatenate([sa, zrow], axis=1)
          + jnp.concatenate([zrow, sb], axis=1))
    z5 = d2.reshape(rowsb, n, na1, hidden)
    ph1_1 = o1 % f1
    cc1 = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1, 1), 1)
    fu1 = ((cc1 + ph1_1) % f1).astype(f32) * (1.0 / f1)
    ta = _outerreduce(scrC_ref, z5 * (1.0 - fu1), ph1_1, f1, na1 - 1)
    tb = _outerreduce(scrC_ref, z5 * fu1, ph1_1, f1, na1 - 1)
    zsl = jnp.zeros((rowsb, 1, na1, hidden), f32)
    d1 = (jnp.concatenate([ta, zsl], axis=1)
          + jnp.concatenate([zsl, tb], axis=1))
    dc1 = _rowreduce_g1(d1, ph0_1b, f1, nr1)
    if pa1 > na1:
        dc1 = jnp.concatenate(
            [dc1, jnp.zeros((nr1, na1, pa1 - na1, hidden), f32)], axis=2)
    dc1_ref[0] = dc1


@functools.partial(
    jax.jit,
    static_argnames=("crops", "n", "rowsb", "f", "npe", "lodf", "sparse_g0",
                     "use_tri_pe", "matmul_dtype", "gelu", "interpret",
                     "nbits"))
def _impl_ff3(g0, g1, w1, b1, w2, b2, w3, b3, tgt, origins, seed, *,
              crops: int, n: int, rowsb: int, f: int, npe: int, lodf: float,
              sparse_g0: bool, use_tri_pe: bool, matmul_dtype,
              gelu: str = "erf", interpret: bool = False,
              nbits: int | None = None):
    from nic.core.encodings import sinusoidal_pe, triangular_pe

    f32 = jnp.float32
    cd = matmul_dtype or f32
    hidden = w2.shape[0]
    oc = w3.shape[1]
    ch = g0.shape[0]
    f1 = 2 * f
    B = n // rowsb
    R = rowsb * n * n
    steps = crops * B
    n_total = crops * n**3
    corners = _CORNERS_3D_SPARSE if sparse_g0 else _CORNERS_3D_DENSE
    ncor = len(corners)
    nfeat = (ncor + 1) * ch + 3 * npe + 1
    fslot = _pad8(nfeat) if nbits is not None else 0
    lay = _layout4(hidden, oc, fslot)
    # staged window extents (slab cells / nodes, a2 cells / nodes)
    wr0 = n // f + 1
    wa0 = n // f + 1
    wr1 = n // f1 + 2
    wb1 = n // f1 + 2
    wa0p = _pad8(wa0)
    wb1p = _pad8(wb1)
    # node-volume output extents (must match _accumulate_node_volumes)
    nr0 = (rowsb + f - 2) // f + 1
    na0 = (n + f - 2) // f + 1
    nr1 = (rowsb + f1 - 2) // f1 + 2
    na1 = n // f1 + 2
    pa0 = _pad8(na0)
    pa1 = _pad8(na1)

    # ---- fold W1 into the grids (cell/node resolution, decode algebra) --
    cells = g0.shape[1] - 1
    p_vol = None
    for k, off in enumerate(corners):
        sl = g0
        for d, o in enumerate(off):
            sl = jax.lax.slice_in_dim(sl, o, o + cells, axis=1 + d)
        blk = w1[k * ch:(k + 1) * ch].astype(cd)
        term = jax.lax.dot_general(
            jnp.moveaxis(sl, 0, -1).astype(cd), blk,
            (((3,), (0,)), ((), ())), preferred_element_type=f32)
        p_vol = term if p_vol is None else p_vol + term
    w_g1 = w1[ncor * ch:(ncor + 1) * ch].astype(cd)
    c1_vol = jax.lax.dot_general(
        jnp.moveaxis(g1, 0, -1).astype(cd), w_g1, (((3,), (0,)), ((), ())),
        preferred_element_type=f32)

    base = (ncor + 1) * ch
    pe_blocks = [w1[base + d * npe:base + (d + 1) * npe].astype(f32)
                 for d in range(3)]
    bvec = b1.astype(f32) + lodf * w1[base + 3 * npe].astype(f32)
    pe_fn = triangular_pe if use_tri_pe else sinusoidal_pe

    # padding so every staged window slice is in-bounds (padded entries
    # are never selected by the in-window sample indices)
    p_pad = jnp.pad(p_vol, ((0, wr0 + 2), (0, wa0 + 2), (0, wa0 + 2),
                            (0, 0)))
    c1_pad = jnp.pad(c1_vol, ((0, wr1 + 2), (0, wb1 + 2), (0, wb1 + 2),
                              (0, 0)))
    ar = jnp.arange(n, dtype=jnp.int32)

    def stage(org):
        o0, o1, o2 = org[0], org[1], org[2]
        # P window: a1 nearest-expanded, a2 left at cell resolution
        win = jax.lax.dynamic_slice(
            p_pad, (o0 // f, o1 // f, o2 // f, 0), (wr0, wa0, wa0, hidden))
        idx1 = (ar + o1 % f) // f
        win = jnp.take(win, idx1, axis=1)               # [wr0, n, wa0, H]
        # a1/a2 PE + b1 + lod fold into the P planes
        t1 = (ar.astype(f32) + o1.astype(f32)) * (1.0 / f1)
        t2 = (ar.astype(f32) + o2.astype(f32)) * (1.0 / f1)
        pe1 = pe_fn(t1[None, :], npe).T @ pe_blocks[1]  # [n, H]
        pe2 = pe_fn(t2[None, :], npe).T @ pe_blocks[2]  # [n, H]
        # the a1 axis is pixel-resolution here, so a1 PE + bias + lod
        # fold straight into the P planes; a2 PE varies per PIXEL and the
        # staged a2 axis is cell-resolution, so it rides separately (the
        # kernel adds it as an a2-aligned [n, H] plane)
        win = win + (pe1 + bvec)[None, :, None, :]
        win = jnp.pad(win, ((0, 0), (0, 0), (0, wa0p - wa0), (0, 0)))
        # C1 window: a1 linearly interpolated, a2 left at node resolution
        cwin = jax.lax.dynamic_slice(
            c1_pad, (o0 // f1, o1 // f1, o2 // f1, 0),
            (wr1, wb1, wb1, hidden))
        pos1 = ar + o1 % f1
        i1 = pos1 // f1
        fu1 = (pos1 % f1).astype(f32) * (1.0 / f1)
        cwin = ((1.0 - fu1)[None, :, None, None]
                * jnp.take(cwin, i1, axis=1)
                + fu1[None, :, None, None]
                * jnp.take(cwin, i1 + 1, axis=1))       # [wr1, n, wb1, H]
        cwin = jnp.pad(cwin, ((0, 0), (0, 0), (0, wb1p - wb1), (0, 0)))
        # slab-axis PE rows
        t0 = (ar.astype(f32) + o0.astype(f32)) * (1.0 / f1)
        pe0 = pe_fn(t0[None, :], npe).T @ pe_blocks[0]  # [n, H]
        return win, cwin, pe0, pe2

    pw_all, cw_all, pe0_all, pe2_all = jax.vmap(stage)(
        origins.astype(jnp.int32))
    # one small per-crop PE array: rows [0, n) are the slab-PE rows
    # (kernel reads row rowsb·b + i per slab), rows [n, 2n) the a2-PE
    # plane (added along the a2 axis)
    pe_all = jnp.concatenate([pe0_all, pe2_all], axis=1)  # [crops, 2n, H]

    tgt_t = tgt.T

    # ---- packed parameter tile ----
    pk = jnp.zeros((lay["rows_in"], hidden), f32)
    pk = pk.at[lay["w2"]:lay["w2"] + hidden].set(w2.astype(f32))
    pk = pk.at[lay["b2"]].set(b2.astype(f32))
    pk = pk.at[lay["w3t"]:lay["w3t"] + oc].set(w3.astype(f32).T)
    pk = pk.at[lay["b3"]:lay["b3"] + oc].set(
        jnp.broadcast_to(b3.astype(f32)[:, None], (oc, hidden)))
    orgs = origins.astype(jnp.int32)
    if nbits is not None:
        pk = pk.at[lay["w1n"]:lay["w1n"] + nfeat].set(w1.astype(f32))
        # seed rides as one extra scalar-prefetch row [s0, s1, pixel_base]
        orgs = jnp.concatenate([orgs, seed[:3].reshape(1, 3)], axis=0)
    pkt = jnp.tile(pk[None], (steps, 1, 1))

    kernel = functools.partial(
        _kernel_ff3, cd=cd, inv_total=1.0 / (n_total * oc), gelu=gelu,
        hidden=hidden, oc=oc,
        lay=(lay["w2"], lay["b2"], lay["w3t"], lay["b3"], lay["loss"],
             lay["w1n"]),
        rowsb=rowsb, n=n, f=f, f1=f1, wa0p=wa0p, wb1p=wb1p, nr0=nr0,
        na0=na0, pa0=pa0, nr1=nr1, na1=na1, pa1=pa1, nbits=nbits,
        fslot=fslot)

    in_specs = []
    # P planes: slab i of block b sits at cell (o0%f + rowsb·b + i)//f —
    # scalar-prefetch-dependent block indices
    for i in range(rowsb):
        in_specs.append(pl.BlockSpec(
            (1, 1, n, wa0p, hidden),
            functools.partial(
                lambda c, b, org, i=0: (
                    c, (org[c, 0] % f + rowsb * b + i) // f, 0, 0, 0),
                i=i)))
    # C1 taps: nodes (o0%f1 + rowsb·b + i)//f1 and +1
    for i in range(rowsb):
        for tap in (0, 1):
            in_specs.append(pl.BlockSpec(
                (1, 1, n, wb1p, hidden),
                functools.partial(
                    lambda c, b, org, i=0, tap=0: (
                        c, (org[c, 0] % f1 + rowsb * b + i) // f1 + tap,
                        0, 0, 0),
                    i=i, tap=tap)))
    # pe rows: pe0 slab rows [rowsb] at offset b·rowsb plus the shared
    # a2-PE plane [n] — fetch the whole [2n, H] per crop (small)
    in_specs.append(pl.BlockSpec((1, 2 * n, hidden),
                                 lambda c, b, org: (c, 0, 0)))
    in_specs.append(pl.BlockSpec((oc, R), lambda c, b, org: (0, c * B + b)))
    in_specs.append(pl.BlockSpec((1, lay["rows_in"], hidden),
                                 lambda c, b, org: (c * B + b, 0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(crops, B),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((oc, R), lambda c, b, org: (0, c * B + b)),
            pl.BlockSpec((1, lay["rows_out"], hidden),
                         lambda c, b, org: (c * B + b, 0, 0)),
            pl.BlockSpec((1, nr0, na0, pa0, hidden),
                         lambda c, b, org: (c * B + b, 0, 0, 0, 0)),
            pl.BlockSpec((1, nr1, na1, pa1, hidden),
                         lambda c, b, org: (c * B + b, 0, 0, 0, 0)),
            pl.BlockSpec((1, rowsb + 2 * n, hidden),
                         lambda c, b, org: (c * B + b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((rowsb * n, n + 16, hidden), jnp.float32),
            pltpu.VMEM((rowsb, n + 16, na0, hidden), jnp.float32),
            pltpu.VMEM((rowsb, n + 16, na1, hidden), jnp.float32),
            pltpu.VMEM((n, max(wa0p * f, wb1p * f1) + f1, hidden),
                       jnp.float32),
        ],
    )
    out_t, gk, dp, dc1, dsum = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((oc, n_total), f32),
            jax.ShapeDtypeStruct((steps, lay["rows_out"], hidden), f32),
            jax.ShapeDtypeStruct((steps, nr0, na0, pa0, hidden), f32),
            jax.ShapeDtypeStruct((steps, nr1, na1, pa1, hidden), f32),
            jax.ShapeDtypeStruct((steps, rowsb + 2 * n, hidden), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n_total * (hidden * hidden + hidden * oc)
            + (6 * n_total * fslot * hidden if nbits is not None else 0),
            bytes_accessed=(steps * (rowsb * n * wa0p
                                     + 2 * rowsb * n * wb1p) * hidden
                            + 2 * n_total * oc) * 4,
            transcendentals=0 if gelu == "poly" else 4 * n_total * hidden,
        ),
    )(orgs, *([pw_all] * rowsb), *([cw_all] * (2 * rowsb)), pe_all,
      tgt_t, pkt)

    g = jnp.sum(gk, axis=0)
    loss = jnp.sum(gk[:, lay["loss"], 0])
    dw2 = g[lay["w2"]:lay["w2"] + hidden]
    db2 = g[lay["b2"]]
    dw3 = g[lay["w3t"]:lay["w3t"] + oc].T
    db3 = g[lay["b3"]:lay["b3"] + oc, 0]
    dw1e = g[lay["w1n"]:lay["w1n"] + nfeat] if fslot else None

    # ---- PE gradients: per-crop table contractions of the dz1 sums ----
    s0 = dsum[:, :rowsb].reshape(crops, n, hidden)
    s1 = dsum[:, rowsb:rowsb + n].reshape(crops, B, n, hidden).sum(1)
    s2 = dsum[:, rowsb + n:].reshape(crops, B, n, hidden).sum(1)
    t_ax = [(origins[:, d:d + 1].astype(f32) + ar.astype(f32)[None, :])
            * (1.0 / f1) for d in range(3)]
    tables = [jax.vmap(lambda t: pe_fn(t[None, :], npe).T)(t_ax[d])
              for d in range(3)]                       # [crops, n, npe]
    dpe0 = jnp.einsum("cnp,cnh->ph", tables[0], s0)
    dpe1 = jnp.einsum("cnp,cnh->ph", tables[1], s1)
    dpe2 = jnp.einsum("cnp,cnh->ph", tables[2], s2)
    db1 = s0.sum((0, 1))

    return (loss, out_t.T, dw2, db2, dw3, db3, dpe0, dpe1, dpe2, db1,
            dp, dc1, dw1e)


def _unfold_ff3(dp, dc1, origins, g0, g1, w1, db1, dpe0, dpe1, dpe2, *,
                crops: int, n: int, rowsb: int, f: int, npe: int,
                lodf: float, sparse_g0: bool, channels: int):
    """XLA backward tail: vectorized node-volume accumulation, then
    contract BOTH ways — with W1 blocks for (dG0, dG1) and with the grid
    VALUES for the W1 feature blocks (the 3D mirror of train_fused_ff's
    _unfold_ff)."""
    f32 = jnp.float32
    hidden = w1.shape[1]
    ch = channels
    g0_nodes = g0.shape[1]
    g1_nodes = g1.shape[1]
    P, C1 = _accumulate_node_volumes(
        dp, dc1, origins, crops=crops, n=n, rowsb=rowsb, f=f,
        g0_nodes=g0_nodes, g1_nodes=g1_nodes, hidden=hidden)

    corners = _CORNERS_3D_SPARSE if sparse_g0 else _CORNERS_3D_DENSE
    dg0 = jnp.zeros((g0_nodes + 2,) * 3 + (ch,), f32)
    g0p = jnp.pad(g0.astype(f32), ((0, 0), (0, 2), (0, 2), (0, 2)))
    g1p = jnp.pad(g1.astype(f32), ((0, 0), (0, 2), (0, 2), (0, 2)))
    w1_rows = []
    for k, (a, b, c) in enumerate(corners):
        blk = w1[k * ch:(k + 1) * ch]
        t = jax.lax.dot_general(P, blk, (((3,), (1,)), ((), ())),
                                preferred_element_type=f32)
        dg0 = dg0.at[a:a + g0_nodes + 1, b:b + g0_nodes + 1,
                     c:c + g0_nodes + 1].add(t)
        gsl = g0p[:, a:a + g0_nodes + 1, b:b + g0_nodes + 1,
                  c:c + g0_nodes + 1]
        w1_rows.append(jax.lax.dot_general(
            gsl.reshape(ch, -1), P.reshape(-1, hidden),
            (((1,), (0,)), ((), ())), preferred_element_type=f32))
    dg0 = jnp.moveaxis(dg0[:g0_nodes, :g0_nodes, :g0_nodes], -1, 0)

    kg1 = len(corners)
    blk1 = w1[kg1 * ch:(kg1 + 1) * ch]
    t1 = jax.lax.dot_general(C1, blk1, (((3,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dg1 = jnp.moveaxis(t1[:g1_nodes, :g1_nodes, :g1_nodes], -1, 0)
    w1_rows.append(jax.lax.dot_general(
        g1p[:, :g1_nodes + 2, :g1_nodes + 2, :g1_nodes + 2].reshape(ch, -1),
        C1.reshape(-1, hidden),
        (((1,), (0,)), ((), ())), preferred_element_type=f32))
    w1_rows.append(dpe0)
    w1_rows.append(dpe1)
    w1_rows.append(dpe2)
    w1_rows.append(lodf * db1[None, :])
    dw1 = jnp.concatenate(w1_rows, axis=0)
    return dg0, dg1, dw1


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12,
                                                    13, 14, 15, 16))
def fused_train_ff3(g0, g1, mlp: dict, tgt, origins, seed, crops: int,
                    n: int, rowsb: int, f: int, npe: int, lodf: float,
                    sparse_g0: bool = False, use_tri_pe: bool = True,
                    matmul_dtype=None, gelu: str = "erf",
                    noise_bits: int | None = None):
    """(loss, out) of the 3D train objective with the feature build fused
    into the kernel: no [N, F] matrix exists in either direction. Supports
    methods 3 (dense 8-corner G0) and 4 (sparse even-parity G0) and both
    PE families. ``seed`` [3] int32 = [s0, s1, pixel_base] for the
    in-kernel feature noise (pass zeros when ``noise_bits`` is None).
    Matches the reference's per-epoch loss and gradients
    (image_compression.py:242-267, fp_def.py:148-223) to summation-order
    rounding — parity-tested against the gather+autodiff path."""
    res = _impl_ff3(
        g0, g1, mlp["w1"], mlp["b1"], mlp["w2"], mlp["b2"], mlp["w3"],
        mlp["b3"], tgt, origins, seed, crops=crops, n=n, rowsb=rowsb, f=f,
        npe=npe, lodf=lodf, sparse_g0=sparse_g0, use_tri_pe=use_tri_pe,
        matmul_dtype=matmul_dtype, gelu=gelu, interpret=INTERPRET,
        nbits=noise_bits)
    return res[0], res[1]


def _fwd_ff3(g0, g1, mlp, tgt, origins, seed, crops, n, rowsb, f, npe,
             lodf, sparse_g0, use_tri_pe, matmul_dtype, gelu, noise_bits):
    (loss, out, dw2, db2, dw3, db3, dpe0, dpe1, dpe2, db1, dp, dc1,
     dw1e) = _impl_ff3(
        g0, g1, mlp["w1"], mlp["b1"], mlp["w2"], mlp["b2"], mlp["w3"],
        mlp["b3"], tgt, origins, seed, crops=crops, n=n, rowsb=rowsb, f=f,
        npe=npe, lodf=lodf, sparse_g0=sparse_g0, use_tri_pe=use_tri_pe,
        matmul_dtype=matmul_dtype, gelu=gelu, interpret=INTERPRET,
        nbits=noise_bits)
    res = (dw2, db2, dw3, db3, dpe0, dpe1, dpe2, db1, dp, dc1, origins,
           mlp["w1"], g0, g1, dw1e, seed)
    return (loss, out), res


def _bwd_ff3(crops, n, rowsb, f, npe, lodf, sparse_g0, use_tri_pe,
             matmul_dtype, gelu, noise_bits, res, cot):
    import numpy as np

    (dw2, db2, dw3, db3, dpe0, dpe1, dpe2, db1, dp, dc1, origins, w1, g0,
     g1, dw1e, seed) = res
    g_loss, _ = cot
    oc = dw3.shape[1]
    dg0, dg1, dw1 = _unfold_ff3(
        dp, dc1, origins, g0, g1, w1, db1, dpe0, dpe1, dpe2, crops=crops,
        n=n, rowsb=rowsb, f=f, npe=npe, lodf=lodf, sparse_g0=sparse_g0,
        channels=g0.shape[0])
    if dw1e is not None:
        dw1 = dw1 + dw1e
    dmlp = {
        "w1": dw1 * g_loss, "b1": db1 * g_loss,
        "w2": dw2 * g_loss, "b2": db2 * g_loss,
        "w3": dw3 * g_loss, "b3": db3 * g_loss,
    }
    return (dg0 * g_loss, dg1 * g_loss, dmlp,
            jnp.zeros((crops * n**3, oc), jnp.float32),
            np.zeros(origins.shape, jax.dtypes.float0),
            np.zeros(seed.shape, jax.dtypes.float0))


fused_train_ff3.defvjp(_fwd_ff3, _bwd_ff3)

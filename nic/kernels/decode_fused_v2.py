"""Fused decode kernel v2 (rev 2): the one-Pallas-kernel hot path.

Folded-first-layer decode (see nic.grids.fastdecode for the algebra:
the MLP's first layer commutes with gather/interp, so P = G0·W1 and
C1 = G1·W1 are precomputed on the grid). rev 1 of this kernel measured
4 orders of magnitude below the XLA path; the round-2 bisect found the
actual root cause — NOT Mosaic relayouts but **non-advancing operand
windows**: any pallas_call operand whose index_map does not move with
the grid costs ~0.5 ms of serialization per grid step on this toolchain
(a no-op copy kernel goes 0.04 ms → 33 ms when one constant window is
added). rev 2 is designed so that EVERY operand window advances:

- host/XLA column stage (cheap, cell-column resolution — 4–8× smaller
  than the full accumulator): upsample the folded P plane along columns,
  interpolate the folded C1 plane along columns, and fold the separable
  column-PE + bias + LOD term into C1 (the row-interp weights sum to 1,
  so a constant added to every C1 row passes through the interpolation
  unchanged);
- one Pallas kernel over a 2-D grid of (R pixel rows × C pixel cols)
  tiles: row-upsample of the P window (outermost-axis repeat — no
  relayout), row-interp of the C1 window (static per-row weights, halo
  row fetched via a SECOND advancing height-1 window of the same
  array), + row-PE window, then the full MLP tail GELU → W2 (MXU) →
  GELU → W3 → sigmoid. RGB is written PLANAR [3, N, N] in (3, R, C)
  blocks (an [R·C, 3] window would lane-pad 3 → 128 and blow VMEM;
  planar blocks are cheap). Per-tile params/PE ride tiled so their
  windows advance too; C caps the per-tile VMEM footprint under the
  16 MB scoped limit at any image size.

When the MLP is 64-wide (the reference default), the kernel runs LANE
PACKED: two adjacent pixel columns share one 128-lane vreg row (a free
reshape on the contiguous [.., N, 64] planes) and the MLP uses
block-diagonal weights — halving both VPU elementwise work and MXU row
count for the same useful FLOPs.

Covers the upsampling decodes (e ≤ 0 — every mip the flagship protocol
actually renders); e ≥ 1 (tiny thumbnail mips) falls back to the XLA
fast path. 2D only, like rev 1.

Reference semantics: create_g0_g1 fp_def.py:115-145 via the fold;
the G1 step==2 quirk lives in the fallback (g1_quirk threaded).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nic.core.encodings import sinusoidal_pe, triangular_pe
from nic.grids.fastdecode import _axis_take_up, fast_decode, precompute_first_layer
from nic.kernels.decode_fused import _gelu_exact

__all__ = ["decode_image_fused_v2"]


def _gelu_tanh(x):
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _gelu_quick(x):
    return x * jax.nn.sigmoid(1.702 * x)


# gelu(x) = 0.5x + x·erf(x/√2)/2; the second term is EVEN, so it is a
# polynomial in x² — 8 FMAs + clamp + 2 selects, no transcendental.
# Max |err| 3.6e-4 on ℝ (fit on [-4,4], exact saturation outside),
# below both the tanh approximation's 4.7e-4 and one u8 step (3.9e-3).
_GELU_POLY_C = (
    6.063213460406e-06, 3.988279991626e-01, -6.618728056429e-02,
    9.689185146121e-03, -1.058572076001e-03, 8.262109727744e-05,
    -4.286269517788e-06, 1.303813961965e-07, -1.739696971198e-09,
)


def _gelu_poly(x):
    u = x * x
    acc = jnp.full_like(x, _GELU_POLY_C[-1])
    for coef in _GELU_POLY_C[-2::-1]:
        acc = acc * u + coef
    y = 0.5 * x + acc  # gelu = x/2 + even-part p(x²)
    return jnp.where(x > 4.0, x, jnp.where(x < -4.0, 0.0, y))


# erf(z) ≈ z·p(v), v = 2z²/B² − 1, B = 3.9188 (erf(B) = 1 − 2⁻²⁶):
# deg-16 monomial converted from a Chebyshev interpolant of erf(z)/z.
# Max |Δerf| 1.6e-7 in f32 Horner — float32-exact class (vs tanh's 4.7e-4
# and the round-2 even-poly's 3.6e-4), giving u8-IDENTICAL decodes at
# polynomial cost: 16 FMAs, no transcendental, no division.
_ERF_COEFS_V = (
    0.36084712417350057, -0.18016249079808996, 0.1341197098397116,
    -0.1092031839839547, 0.09062792421675198, -0.0739776908469364,
    0.0581495074523071, -0.0435456971886969, 0.030547198182092263,
    -0.019592030398672442, 0.012233327075772783, -0.008136814407460185,
    0.004267563623966739, -0.001049107566569795, 0.0006108818677171472,
    -0.0009324910271702735, 0.0003764209620008347,
)
_ERF_B2 = 3.9188 * 3.9188  # z² scale; gelu saturates for |x| > √2·B


def _gelu_erfpoly(x):
    u = x * x
    v = u * (1.0 / _ERF_B2) - 1.0  # v = 2z²/B² − 1 with z² = x²/2
    acc = jnp.full_like(x, _ERF_COEFS_V[-1])
    for co in _ERF_COEFS_V[-2::-1]:
        acc = acc * v + co
    erf = (x * 0.7071067811865476) * acc  # erf(x/√2)
    y = 0.5 * x * (1.0 + erf)
    lim = 5.54212  # √2·B
    return jnp.where(x > lim, x, jnp.where(x < -lim, 0.0, y))


# erf(x/√2) ≈ tanh(x·p(x²)): on this TPU the hardware tanh is CHEAP
# (tanh mode 1.56 GPix/s) and the hardware erf EXPENSIVE (exact mode
# 0.72), so routing erf THROUGH tanh buys near-erf accuracy at
# near-tanh cost. p = 6-coef odd minimax-polished fit on [0, 5]
# (atanh∘erf is smooth there); max |Δgelu| ≤ 1.44e-6 over ℝ in f32
# Horner, dominated by the |x| = 5 saturation clamp (1.4e-6) — ~250×
# below the 8-FMA even-poly (3.6e-4) and ~2700× below one u8 step.
# 5 FMAs + 1 mul + tanh + 2 selects per element.
_TANHERF_C = (
    0.7978726340911436, 0.03636569087245362, -5.790097523219499e-05,
    -4.725206537106127e-05, 2.7966636242742257e-06,
    -5.653256767756493e-08,
)


def _gelu_tanherf(x):
    u = x * x
    p = jnp.full_like(x, _TANHERF_C[-1])
    for coef in _TANHERF_C[-2::-1]:
        p = p * u + coef
    y = 0.5 * x * (1.0 + jnp.tanh(p * x))
    return jnp.where(x > 5.0, x, jnp.where(x < -5.0, 0.0, y))


_GELUS = {"exact": _gelu_exact, "tanh": _gelu_tanh, "quick": _gelu_quick,
          "poly": _gelu_poly, "erfpoly": _gelu_erfpoly,
          "tanherf": _gelu_tanherf}


def _kernel(pc_ref, c1_ref, c1h_ref, peu_ref, w2_ref, b2_ref, w3t_ref,
            b3_ref, *rest, R: int, f: int, f1: int, acc_dtype, gelu,
            out_ch: int = 3, scaled: bool = False):
    # rest = (s_ref, out_ref) in i16 mode (scaled=True), else (out_ref,)
    out_ref = rest[-1]
    cols = pc_ref.shape[1]
    m = R // f1

    # convert (and, in i16 mode, scale) ONCE at NODE resolution — the
    # upsample/interp below then slice fp32 data. Converting after the
    # row-expansion costs f× (P) / ~2× (C1) more int→float converts,
    # which is what separated i16 (1.08 GPix/s) from bf16 (1.66) in the
    # first chip probe.
    pcf = pc_ref[:, :, :].astype(acc_dtype)
    c1f = c1_ref[:, :, :].astype(acc_dtype)
    c1hf = c1h_ref[0:1, :, :].astype(acc_dtype)
    if scaled:  # i16 fixed-point planes: scale folds at node resolution
        s = rest[0][0, 0]
        pcf, c1f, c1hf = pcf * s, c1f * s, c1hf * s

    # G0 term: nearest row-upsample (outermost-axis repeat) of the
    # column-upsampled P window [R/f, C, H] → [R, C, H]
    if f == 1:
        g0 = pcf
    else:
        g0 = jnp.concatenate(
            [pcf[r // f : r // f + 1, :, :] for r in range(R)], axis=0
        )

    # G1 term: static per-row linear interp over the column-interpolated
    # C1 window; row r uses C1 rows r//f1 and r//f1+1 (the last +1 is the
    # halo row from the second advancing window)
    parts = []
    for r in range(R):
        ia, fu = r // f1, (r % f1) / f1
        ca = c1f[ia : ia + 1, :, :] if ia < m else c1hf
        cb = c1f[ia + 1 : ia + 2, :, :] if ia + 1 < m else c1hf
        parts.append((1.0 - fu) * ca + fu * cb)
    acc = g0 + jnp.concatenate(parts, axis=0)
    _mlp_tail(acc, peu_ref, w2_ref, b2_ref, w3t_ref, b3_ref, out_ref,
              R=R, cols=cols, acc_dtype=acc_dtype, gelu=gelu, out_ch=out_ch)


def _kernel_z1mm(pc_ref, c1_ref, a_ref, peu_ref, w2_ref, b2_ref, w3t_ref,
                 b3_ref, out_ref, *, R: int, f: int, f1: int, acc_dtype,
                 gelu, out_ch: int = 3):
    """z1-matmul kernel body: the row-upsample of P and the row-interp of
    C1 become two small MXU contractions against STATIC matrices (the
    roofline's "augmented first-layer contraction", BASELINE.md round-4
    roofline note). Chip-measured NEGATIVE (BASELINE.md round-4,
    results/r4_z1mm_probe.json): 0.60–0.79× vs the VPU per-row kernel at
    bit-exact parity — the tiny-contraction dots sit on the critical
    path into the GELU and the MXU round-trip serializes against the VPU
    stream instead of overlapping. Kept opt-in as a measured design
    point. The C1 halo row is pre-gathered host-side into (m+1)-row
    blocks, so there is no second window and no in-kernel concatenate.
    ``a_ref`` carries [A0 | A1] tiled per grid step (Pallas refuses
    captured array constants, and a non-advancing window serializes —
    module docstring); A0[r, r//f] = 1, A1[r, r//f1] = 1−fu,
    A1[r, r//f1+1] = fu. Gated by "auto" to hidden = 128 (post-pack), so
    the [rows, C, H] → [rows, C·H] collapses are lane-exact and free."""
    cols = pc_ref.shape[1]
    m = R // f1
    hidden = pc_ref.shape[2]
    k0 = R // f

    c2 = c1_ref[:, :, :].reshape(m + 1, cols * hidden)
    g1 = jnp.dot(a_ref[:, k0:], c2, preferred_element_type=acc_dtype)
    if f == 1:  # A0 is the identity: add P directly, skip the matmul
        acc = g1.reshape(R, cols, hidden) + pc_ref[:, :, :].astype(acc_dtype)
    else:
        p2 = pc_ref[:, :, :].reshape(k0, cols * hidden)
        acc = (
            jnp.dot(a_ref[:, :k0], p2, preferred_element_type=acc_dtype) + g1
        ).reshape(R, cols, hidden)
    _mlp_tail(acc, peu_ref, w2_ref, b2_ref, w3t_ref, b3_ref, out_ref,
              R=R, cols=cols, acc_dtype=acc_dtype, gelu=gelu, out_ch=out_ch)


def _mlp_tail(acc, peu_ref, w2_ref, b2_ref, w3t_ref, b3_ref, out_ref, *,
              R, cols, acc_dtype, gelu, out_ch):

    # separable row-PE vectors (column PE + bias + LOD are pre-folded
    # into C1 host-side)
    acc = acc + peu_ref[:, :].astype(acc_dtype)[:, None, :]

    h = gelu(acc).reshape(R * cols, -1)
    dtype = w2_ref.dtype
    h = jnp.dot(h.astype(dtype), w2_ref[:, :], preferred_element_type=acc_dtype)
    h = gelu(h + b2_ref[0:1, :].astype(acc_dtype))
    # planar output: [OC, R·C] = W3ᵀ (OC, H) · h (R·C, H) contracted on H
    rgb = jax.lax.dot_general(
        w3t_ref[0:out_ch, :].astype(dtype), h.astype(dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=acc_dtype,
    )
    rgb = jax.nn.sigmoid(rgb + b3_ref[0:out_ch, :].astype(acc_dtype))
    # written flat tile-major: the (3, R·C) dot output goes straight to
    # lanes — a (3, R, C) block would need a lane→sublane relayout here
    out_ref[:, :] = rgb.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n", "R", "C", "f", "f1", "out_dtype", "gelu", "packed",
                     "nc", "z1mm"),
)
def _call(pc, c1v, pe_u, w2, b2, w3, b3, plane_scale=None, *, n: int,
          R: int, C: int, f: int, f1: int, out_dtype, gelu: str = "exact",
          packed: bool = False, nc: int | None = None, z1mm: bool = False):
    # n = output rows; nc = output columns (defaults to n — square image).
    # The rectangular form is what the row-sharded multi-device decode
    # (nic.kernels.decode_sharded) runs per device.
    nc = n if nc is None else nc
    nrow, ncol = n // R, nc // C
    steps = nrow * ncol
    m = R // f1
    hidden = w2.shape[0]

    if packed:
        # lane packing: H=64 fills only half of each 128-lane vreg and
        # half the MXU contraction dim. Pack two ADJACENT pixel columns
        # into one 128-lane row — a FREE reshape on the [.., N, 64]
        # planes (contiguous memory) — and run the MLP with
        # block-diagonal weights: halves both VPU elementwise work and
        # MXU row count for the same useful FLOPs.
        C = C // 2  # ncol is unchanged: packed columns halve with C
        pc = pc.reshape(pc.shape[0], nc // 2, 2 * hidden)
        c1v = c1v.reshape(c1v.shape[0], nc // 2, 2 * hidden)
        pe_u = jnp.concatenate([pe_u, pe_u], axis=-1)
        z = jnp.zeros_like(w2)
        w2 = jnp.concatenate(
            [jnp.concatenate([w2, z], 1), jnp.concatenate([z, w2], 1)], 0
        )  # blockdiag [2H, 2H]
        b2 = jnp.concatenate([b2, b2])
        zw3 = jnp.zeros_like(w3)
        w3 = jnp.concatenate(
            [jnp.concatenate([w3, zw3], 1), jnp.concatenate([zw3, w3], 1)], 0
        )  # [2H, 6]: cols 0-2 even-pixel rgb, 3-5 odd
        b3 = jnp.concatenate([b3, b3])
        hidden = 2 * hidden
    out_ch = w3.shape[1]
    useful_h = hidden // 2 if packed else hidden

    scaled = plane_scale is not None
    if z1mm and scaled:
        # defense for direct _call users; the public entry raises on an
        # explicit z1_matmul=True + i16 instead of downgrading silently
        z1mm = False
    # z1mm is gated to the packed layout by "auto" (hidden = 128 post-pack
    # → lane-exact [rows,C,H]→[rows,C·H] collapses); an explicit True is
    # honored at any width (correct, possibly relayout-slow) except under
    # i16 planes, where the public entry rejects it
    kernel = functools.partial(
        _kernel_z1mm if z1mm else _kernel, R=R, f=f, f1=f1,
        acc_dtype=jnp.float32, gelu=_GELUS[gelu], out_ch=out_ch,
        **({} if z1mm else {"scaled": scaled}),
    )
    # params tiled per grid step so their windows advance (see module doc)
    tile8 = lambda a: jnp.tile(a.reshape(1, -1), (steps * 8, 1))
    pad8 = 8 - out_ch
    w3t8 = jnp.tile(jnp.pad(w3.T, ((0, pad8), (0, 0))), (steps, 1))
    b3t = jnp.tile(jnp.pad(b3.reshape(-1, 1), ((0, pad8), (0, 0))), (steps, 1))
    # row-PE: each R-row chunk duplicated per column block
    peu_t = jnp.broadcast_to(
        pe_u.reshape(nrow, 1, R, hidden), (nrow, ncol, R, hidden)
    ).reshape(steps * R, hidden)
    # retile the planes column-block-major so every kernel window is a
    # CONTIGUOUS DMA: a (rows, C, H) window cut from a (rows, N, H) array
    # is N/C separate 128-byte-row strided transfers and runs ~3× slower
    # (measured at N=2048); one host transpose per decode is ~0.3 ms
    pc_t = (
        pc.reshape(nrow, R // f, ncol, C, hidden)
        .transpose(2, 0, 1, 3, 4)
        .reshape(ncol * nrow * (R // f), C, hidden)
    )
    c1_pad = jnp.pad(c1v, ((0, (nrow + 1) * m - c1v.shape[0]), (0, 0), (0, 0)))
    if z1mm:
        # pre-gather the halo row into (m+1)-row blocks: block (i, j)
        # covers c1 rows [i·m, i·m + m] inclusive — no second window and
        # no in-kernel concatenate; one extra (m+1)/m copy host-side
        idx = (
            np.arange(nrow)[:, None] * m + np.arange(m + 1)[None, :]
        ).reshape(-1)
        c1_t = (
            c1_pad[idx]
            .reshape(nrow * (m + 1), ncol, C, hidden)
            .transpose(1, 0, 2, 3)
            .reshape(ncol * nrow * (m + 1), C, hidden)
        )
        # [A0 | A1] static row-upsample/interp matrices, tiled per step
        k0 = R // f
        a_np = np.zeros((R, k0 + m + 1), np.float32)
        for r in range(R):
            a_np[r, r // f] = 1.0
            fu_ = (r % f1) / f1  # k/f1, f1 a power of two — bf16-exact
            a_np[r, k0 + r // f1] = 1.0 - fu_
            a_np[r, k0 + r // f1 + 1] += fu_
        a_t = jnp.tile(jnp.asarray(a_np, pc.dtype), (steps, 1))
        c1_specs = [
            pl.BlockSpec((m + 1, C, hidden), lambda i, j: (j * nrow + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, k0 + m + 1), lambda i, j: (i * ncol + j, 0),
                         memory_space=pltpu.VMEM),
        ]
        c1_ops = (c1_t, a_t)
    else:
        c1_t = (
            c1_pad.reshape((nrow + 1) * m, ncol, C, hidden)
            .transpose(1, 0, 2, 3)
            .reshape(ncol * (nrow + 1) * m, C, hidden)
        )
        c1_specs = [
            pl.BlockSpec((m, C, hidden),
                         lambda i, j: (j * (nrow + 1) + i, 0, 0),
                         memory_space=pltpu.VMEM),
            # halo: height-1 advancing window one row past block i's rows
            pl.BlockSpec((1, C, hidden),
                         lambda i, j: ((j * (nrow + 1) + i + 1) * m, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        c1_ops = (c1_t, c1_t)
    out = pl.pallas_call(
        kernel,
        grid=(nrow, ncol),
        in_specs=[
            pl.BlockSpec((R // f, C, hidden), lambda i, j: (j * nrow + i, 0, 0),
                         memory_space=pltpu.VMEM),
            *c1_specs,
            pl.BlockSpec((R, hidden), lambda i, j: (i * ncol + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, hidden), lambda i, j: (i * ncol + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hidden), lambda i, j: (i * ncol + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hidden), lambda i, j: (i * ncol + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda i, j: (i * ncol + j, 0),
                         memory_space=pltpu.VMEM),
            # i16 mode: the shared plane scale, tiled per step so its
            # window advances like every other operand (module docstring);
            # (8,1) VMEM blocks — the same shape rule as b3 (SMEM refuses
            # sub-(8,·) blocks)
            *([pl.BlockSpec((8, 1), lambda i, j: (i * ncol + j, 0),
                            memory_space=pltpu.VMEM)] if scaled else []),
        ],
        out_specs=pl.BlockSpec((out_ch, R * C), lambda i, j: (0, i * ncol + j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_ch, steps * R * C), out_dtype),
        cost_estimate=pl.CostEstimate(
            # useful FLOPs: the packed block-diagonal weights' zero
            # blocks do no useful work; poly GELU has no transcendentals
            flops=2 * n * nc * (useful_h * useful_h + useful_h * 3),
            bytes_accessed=(pc.size + 2 * c1v.size) * pc.dtype.itemsize
            + n * nc * 3 * 4,
            transcendentals=0 if gelu == "poly" else 2 * n * nc * useful_h,
        ),
    )(pc_t, *c1_ops, peu_t, jnp.tile(w2, (steps, 1)), tile8(b2), w3t8, b3t,
      *([jnp.tile(plane_scale.reshape(1, 1), (steps * 8, 1))]
        if scaled else []))
    # untile: (OC, tile-major pixels) → [N, NC, 3] (one XLA transpose)
    if packed:
        # axis 0: [r,g,b] of even pixel, then [r,g,b] of odd pixel
        return (
            out.reshape(2, 3, nrow, ncol, R, C)
            .transpose(2, 4, 3, 5, 0, 1)
            .reshape(n, nc, 3)
        )
    return out.reshape(3, nrow, ncol, R, C).transpose(1, 3, 2, 4, 0).reshape(
        n, nc, 3
    )


def _geometry_ok(e, nr, ncl, R, C, f, f1) -> bool:
    """The 2D kernel's static geometry gate (thumbnail mips with e > 0
    and non-divisible tile shapes take the XLA fallback)."""
    return not (e > 0 or nr % R or nr < R or ncl % C or R % f1 or R % f)


def kernel_covers_2d(mip_level: int, image_size, mip_to_level: dict,
                     hidden: int, block_rows=None, block_cols=None) -> bool:
    """Pure-geometry predicate: will ``decode_image_fused_v2`` run the
    Pallas kernel for this (mip, size) or fall back to folded XLA?
    Mirrors ``_prepare_2d``'s gate without doing any compute — callers
    (e.g. the decode CLI) use it to report the fallback instead of
    silently decoding fp32 when a plane dtype was requested."""
    hw = ((image_size, image_size) if isinstance(image_size, int)
          else tuple(image_size))
    fl = mip_to_level[mip_level]
    e = mip_level - (fl + 1) * 2
    if e > 0:
        return False  # thumbnail mips (e ≥ 2 would even be a negative
        # shift in the f1 expression below)
    nr, ncl = (s // (2**mip_level) for s in hw)
    f = 1 << (-e) if e < 0 else 1
    f1 = 1 << (1 - e)
    R = block_rows or max(8, f1)
    C = block_cols or min(ncl, 2048 if 2 * hidden == 128 else 1024)
    return _geometry_ok(e, nr, ncl, R, C, f, f1)


def _prepare_2d(
    fp, mlp, mip_level: int, *, image_size, mip_to_level: dict,
    pe_channels: int, use_tri_pe: bool, dtype, block_rows, block_cols,
):
    """Host/XLA column stage shared by the single-device entry and the
    row-sharded multi-device entry (nic.kernels.decode_sharded). Returns
    ``None`` when the geometry needs the XLA fallback, else
    ``(pc, c1v, pe_u, w2, b2, w3, b3, geom)`` with ``geom`` the static
    kwargs for ``_call``.

    ``image_size`` may be an int (square) or an (H, W) pair — NATIVE
    rectangular geometry (the Kodak 768×512 target; the reference is
    square-only, var2.py:60). The kernel body is already rectangular
    (``_call``'s n×nc grid); rows and columns just carry separate counts
    through the column stage."""
    hw = ((image_size, image_size) if isinstance(image_size, int)
          else tuple(image_size))
    fl = mip_to_level[mip_level]
    e = mip_level - (fl + 1) * 2
    nr, ncl = (s // (2**mip_level) for s in hw)
    channels = fp[fl * 2].shape[0]

    if e > 0:
        return None  # thumbnail mip: XLA fallback (e ≥ 2 would be a
        # negative shift in f1 — pre-round-5 this crashed instead of
        # falling back when the kernel entry was called directly)
    f = 1 << (-e) if e < 0 else 1
    f1 = 1 << (1 - e)  # G1 sample period in pixels (e ≤ 0)
    R = block_rows or max(8, f1)
    # lane packing halves the per-tile VMEM footprint, so packed-eligible
    # MLPs take 2× wider column blocks — at n=2048 that makes ncol=1 (no
    # retile transposes, fully contiguous windows): measured +39%
    hidden_ = mlp["w2"].shape[0]
    C = block_cols or min(ncl, 2048 if 2 * hidden_ == 128 else 1024)
    if not _geometry_ok(e, nr, ncl, R, C, f, f1):
        return None

    # ``dtype`` modes:
    #   None      — fp32 everything (planes, kernel windows, MXU dots)
    #   a dtype   — plane STORAGE and the MXU dots in that dtype. Since
    #               round 5 the ARITHMETIC runs fp32: the fp32 folds
    #               round ONCE to storage at NODE resolution, the
    #               upsample/repeat/slice ops are pure data movement
    #               (rounding commutes through them), and the column
    #               interp computes fp32 on the storage-rounded nodes
    #               inside one fusion — no fp32 pixel-resolution
    #               intermediate ever hits HBM (the r5 probe measured
    #               −23% throughput when those materialized fp32). Two
    #               storage roundings total vs r4's bf16 arithmetic
    #               chain.
    #   "surgical" — fp32 planes/windows/elementwise, bf16 ONLY at the
    #               MXU dots (W2/W3) — the decode analogue of the
    #               training side's MLP_NUM_DTYPE=16 split (round-5
    #               directive #3: the accuracy-ceiling tier; fp32
    #               storage pays ~2× plane DMA)
    #   "i16"     — int16 FIXED-POINT plane storage + bf16 MXU dots.
    #               The r5 sweep showed the decode is plane-DMA-bound
    #               (surgical's fp32 planes cost ~2×; arithmetic is fp32
    #               in every mode) and that the bf16-family envelope IS
    #               the storage rounding (2⁻⁸ RELATIVE → large error at
    #               plane-max magnitude → 7 u8 LSB at fp8 on trained
    #               models). Fixed point converts that to an ABSOLUTE
    #               step, max|plane|/32767 — ~100× tighter at the
    #               magnitudes that set the envelope — at the SAME 2-byte
    #               DMA as bf16. P and C1 share one dynamic scale (bound
    #               computed at node resolution: upsample/interp are
    #               convex, so no full-res reduction pass), folded into a
    #               single in-kernel FMA; the remaining error is the
    #               bf16 dot-input rounding, i.e. surgical-class
    #               accuracy at bf16-mode speed. (fp16 storage would be
    #               the floating alternative but Mosaic rejects f16:
    #               "Unsupported type in mosaic dialect" — measured
    #               round-5 negative.)
    surgical = isinstance(dtype, str) and dtype == "surgical"
    i16 = isinstance(dtype, str) and dtype == "i16"
    plane_dtype = None if (surgical or i16) else dtype

    p_plane, c1_plane, pe_blocks, w_lod, b1 = precompute_first_layer(
        fp, fl, mlp, ndim=2, channels=channels, pe_channels=pe_channels
    )
    if plane_dtype is not None:
        # the ONE storage rounding of the fp32 folds (node resolution)
        p_plane = p_plane.astype(plane_dtype)
        c1_plane = c1_plane.astype(plane_dtype)

    # ---- column stage (XLA, cell-column resolution) ----
    # column sample positions t_v = v·2^(e-1) (weights always active at
    # e ≤ 0). j1 = v // f1 and j1+1 are pure repeat+shift patterns at
    # origin 0, so the two samples are layout ops (repeat+slice), not
    # gathers.
    tv = jnp.arange(ncl, dtype=jnp.float32) * (2.0 ** (e - 1))
    j1 = jnp.floor(tv).astype(jnp.int32)
    fv = (tv - j1.astype(jnp.float32))[None, :, None]  # fp32 weights
    rows = nr // f1 + 1
    cols_nodes = ncl // f1 + 1

    # separable PE tables folded through W1; the column term + bias + LOD
    # folds into C1 (row-interp weights sum to 1)
    tu = jnp.arange(nr, dtype=jnp.float32) * (2.0 ** (e - 1))
    pe_fn = triangular_pe if use_tri_pe else sinusoidal_pe
    table_u = pe_fn(tu[None, :], pe_channels).T  # [NR, PE]
    pe_u = table_u @ pe_blocks[0]  # [NR, H] fp32
    table_v = (table_u if ncl == nr
               else pe_fn(tv[None, :], pe_channels).T)  # [NC, PE]
    a_col = table_v @ pe_blocks[1] + mlp["b1"] + float(mip_level) * w_lod

    plane_scale = None
    if i16:
        # shared P/C1 scale from TRUE NODE-RESOLUTION maxes (round-5
        # tightening: the original analytic bound — |P| ≤ ½·maxΣ|W1_g0|,
        # |C1| ≤ ½·maxΣ|W1_g1| + |a_col| from |g| ≤ ½ — measured 4 u8
        # LSB worst-cell on the trained mip ladder, breaking the ≤3
        # exact-class cap; its slack is the sign-alignment assumption in
        # Σ|W1|). The node planes exist before any movement and
        # upsample/interp are convex, so node maxes bound the full-res
        # values; |a_col| stays a triangle term on C1. Cost: the two
        # plane-max passes are the −11% the r5 probe measured
        # (1.47 → 1.31 GPix/s @2048²) — paid, because the mode's whole
        # point is the exact-class envelope at bf16-tier speed, and
        # 1.31 still clears the ≥1 GPix/s north star. Storage rounding
        # happens at NODE resolution, mirroring the bf16 scheme
        # (quantizing full-res planes instead materializes an fp32
        # pixel-resolution intermediate in HBM — the −23% trap the r5
        # probe measured for bf16).
        s = jnp.maximum(
            jnp.maximum(jnp.abs(p_plane).max(),
                        jnp.abs(c1_plane).max() + jnp.abs(a_col).max()),
            jnp.float32(1e-12),
        ).astype(jnp.float32)
        inv = 32767.0 / s
        qnode = lambda a: jnp.clip(
            jnp.round(a * inv), -32767.0, 32767.0).astype(jnp.int16)
        p_plane = qnode(p_plane)
        c1_plane = qnode(c1_plane)
        a_col = a_col * inv  # a_col joins C1 in i16 units
        plane_scale = s / jnp.float32(32767.0)

    # P: nearest column upsample, rows cropped to the NR/f the kernel
    # reads — pure movement, storage dtype
    pc = _axis_take_up(p_plane, e, ncl, 0, axis=1)[: nr // f]  # [NR/f, NC, H]

    c1r = jax.lax.slice_in_dim(c1_plane, 0, rows, axis=0)
    c1c = jax.lax.slice_in_dim(c1r, 0, cols_nodes, axis=1)
    rep = jnp.repeat(c1c, f1, axis=1)  # [rows, NC+f1, H] storage dtype
    c1a = jax.lax.slice_in_dim(rep, 0, ncl, axis=1)
    c1b = jax.lax.slice_in_dim(rep, f1, ncl + f1, axis=1)
    # interp + a_col fp32 INSIDE one fusion (storage-dtype operands
    # upcast per element; only the storage-dtype result materializes)
    c1v = ((1.0 - fv) * c1a.astype(jnp.float32)
           + fv * c1b.astype(jnp.float32) + a_col[None, :, :])
    if i16:
        # the ONE full-resolution rounding of C1 (i16 units; ≤ 0.5 step)
        c1v = jnp.clip(jnp.round(c1v), -32767.0, 32767.0).astype(jnp.int16)
        # pe_u stays fp32 (tiny [NR, H] table; the kernel adds it after
        # the scale FMA)
    else:
        out_plane = pc.dtype
        c1v = c1v.astype(out_plane)
        pe_u = pe_u.astype(out_plane)

    w2, b2 = mlp["w2"], mlp["b2"]
    w3, b3 = mlp["w3"], mlp["b3"]
    if dtype is not None:  # surgical/i16: bf16 dots under fp32/i16 planes
        mxu_dtype = jnp.bfloat16 if (surgical or i16) else dtype
        w2, w3 = w2.astype(mxu_dtype), w3.astype(mxu_dtype)

    hidden = w2.shape[0]
    packed = (
        2 * hidden == 128
        and C % 16 == 0
        and (R * C // 2) % 128 == 0
        and ncl % 2 == 0
    )
    geom = dict(n=nr, nc=ncl, R=R, C=C, f=f, f1=f1, packed=packed)
    return pc, c1v, pe_u, w2, b2, w3, b3, plane_scale, geom


def decode_image_fused_v2(
    fp, mlp, mip_level: int, *, image_size, mip_to_level: dict,
    pe_channels: int, use_tri_pe: bool = True, g1_quirk: bool = True,
    dtype=None, out_dtype=jnp.float32, block_rows: int | None = None,
    block_cols: int | None = None, gelu: str = "exact",
    z1_matmul: bool | str = False,
):
    """Full-image 2D fused decode, v2 rev2 (one Pallas kernel).

    ``image_size``: int (square) or (H, W) — native rectangular decode
    runs through the same kernel (rectangular tile grid).

    ``z1_matmul``: route the z1 build (P row-upsample + C1 row-interp)
    through the MXU instead of VPU element-ops (``_kernel_z1mm``);
    ``"auto"`` enables it exactly when the lane-packed layout is active
    (hidden = 128 post-pack, so the 2-D collapses are free)."""
    prep = _prepare_2d(
        fp, mlp, mip_level, image_size=image_size, mip_to_level=mip_to_level,
        pe_channels=pe_channels, use_tri_pe=use_tri_pe, dtype=dtype,
        block_rows=block_rows, block_cols=block_cols,
    )
    if prep is None:
        # thumbnail mips / odd sizes: XLA fast path
        hw = ((image_size, image_size) if isinstance(image_size, int)
              else tuple(image_size))
        out = fast_decode(
            fp, mlp, mip_level, image_size=hw[0],
            mip_to_level=mip_to_level, pe_channels=pe_channels,
            use_tri_pe=use_tri_pe, ndim=2, g1_quirk=g1_quirk,
            n=(None if hw[0] == hw[1]
               else tuple(s // (2**mip_level) for s in hw)),
        )
        return out.astype(out_dtype)
    pc, c1v, pe_u, w2, b2, w3, b3, plane_scale, geom = prep
    z1mm = geom["packed"] if z1_matmul == "auto" else bool(z1_matmul)
    if z1mm and plane_scale is not None:
        if z1_matmul == "auto":
            z1mm = False  # auto: i16 planes take the VPU kernel
        else:
            # any explicit truthy request (True, 1, ...) must not
            # silently measure the other kernel (int16 operands can't
            # ride the z1mm MXU dots)
            raise ValueError(
                "z1_matmul=True is incompatible with dtype='i16' planes "
                "(int16 cannot feed the z1 MXU dots); use z1_matmul="
                "'auto' or a float plane dtype")
    return _call(pc, c1v, pe_u, w2, b2, w3, b3, plane_scale,
                 out_dtype=out_dtype, gelu=gelu, z1mm=z1mm, **geom)

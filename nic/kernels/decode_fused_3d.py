"""Fused 3D/spatiotemporal decode: the v2-rev2 Pallas design over volumes.

Extends nic.kernels.decode_fused_v2 (2D) to the 3D feature-pyramid
decodes — the flagship's FP_DIMENSION=3 methods 3 (dense 8-corner G0,
reference ``Projects/fp_def.py:148-184``) and 4 (sparse even-parity
4-corner G0, ``fp_def.py:187-223``; selected ``image_compression.py:
242-243,317-318``). The reference's movie decode is a host loop over
``finally_decode_input_3d`` tiles (``image_compression.py:335-340``);
here the whole volume runs through one Pallas kernel.

Design (same rules as v2 rev2 — every operand window advances):

- the FRAME axis (coordinate 0) becomes the outermost grid dimension:
  the host/XLA stage nearest-upsamples the folded P volume and linearly
  interpolates the folded C1 volume along frames (both are layout ops +
  one lerp at cell/node row resolution), producing per-frame planes;
- the column stage and the in-kernel row stage are exactly the 2D
  kernel's: columns pre-upsampled/interpolated host-side, rows
  repeated/interpolated in-kernel with an advancing height-1 halo
  window; the kernel body is IMPORTED from decode_fused_v2 unchanged;
- per-frame constants fold into C1 (frame-PE · W1_pe0, like the 2D
  kernel folds column-PE + bias + LOD: row-interp weights sum to 1, so
  per-frame constants pass through the row interpolation unchanged);
- method 4 is free at the kernel level: sparse G0 only changes the
  P-volume fold (4 even-parity corners instead of 8,
  nic.grids.fastdecode.precompute_first_layer), not the kernel;
- lane packing (two adjacent pixel columns per 128-lane vreg,
  block-diagonal MLP) applies as in 2D when the MLP is 64-wide.

Covers e = mip - 2(fl+1) ≤ 0 (every mip the protocol renders);
thumbnail mips fall back to the XLA fast path, as in 2D.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nic.core.encodings import sinusoidal_pe, triangular_pe
from nic.grids.fastdecode import (_axis_take_up, fast_decode,
                                  precompute_first_layer)
from nic.kernels.decode_fused_v2 import _GELUS, _kernel

__all__ = ["decode_volume_fused"]


def _axis_interp(plane, e: int, n: int, axis: int):
    """Linear interp of ``plane`` at t = arange(n)·2^(e-1) along ``axis``
    (the G1 sampling pattern at origin 0, weights always active at e ≤ 0).
    Pure repeat + slice + one lerp — no gather (decode_fused_v2's column
    stage, factored out for reuse on the frame axis).

    Computes fp32 regardless of storage dtype (round 5: the single-
    rounding scheme the 2D column stage adopted — the caller rounds the
    final C1 once; volumes are small enough that fp32 intermediates are
    free) and returns fp32."""
    f1 = 1 << (1 - e)
    tv = jnp.arange(n, dtype=jnp.float32) * (2.0 ** (e - 1))
    j1 = jnp.floor(tv).astype(jnp.int32)
    shape = [1] * plane.ndim
    shape[axis] = n
    fv = (tv - j1.astype(jnp.float32)).reshape(shape)
    rows = n // f1 + 1
    src = jax.lax.slice_in_dim(plane, 0, rows, axis=axis)
    rep = jnp.repeat(src, f1, axis=axis)  # [.., n + f1, ..]
    a = jax.lax.slice_in_dim(rep, 0, n, axis=axis)
    b = jax.lax.slice_in_dim(rep, f1, n + f1, axis=axis)
    return (1.0 - fv) * a.astype(jnp.float32) + fv * b.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("n", "n_t", "R", "C", "f", "f1", "out_dtype", "gelu",
                     "packed"),
)
def _call3(pc, c1v, pe_u, w2, b2, w3, b3, plane_scale=None, *, n: int,
           n_t: int, R: int, C: int, f: int, f1: int, out_dtype,
           gelu: str = "exact", packed: bool = False):
    """pc: [T, n/f, n, H] per-frame column-upsampled P planes;
    c1v: [T, n/f1+1, n, H] per-frame column+frame-interpolated C1 planes
    (per-frame constants already folded in); pe_u: [n, H] row-PE."""
    nrow, ncol = n // R, n // C
    steps = n_t * nrow * ncol
    m = R // f1
    hidden = w2.shape[0]

    if packed:
        # two adjacent pixel columns per 128-lane row (free reshape on the
        # contiguous [.., n, H] planes) + block-diagonal MLP weights
        C = C // 2
        pc = pc.reshape(n_t, pc.shape[1], n // 2, 2 * hidden)
        c1v = c1v.reshape(n_t, c1v.shape[1], n // 2, 2 * hidden)
        pe_u = jnp.concatenate([pe_u, pe_u], axis=-1)
        z = jnp.zeros_like(w2)
        w2 = jnp.concatenate(
            [jnp.concatenate([w2, z], 1), jnp.concatenate([z, w2], 1)], 0
        )
        b2 = jnp.concatenate([b2, b2])
        zw3 = jnp.zeros_like(w3)
        w3 = jnp.concatenate(
            [jnp.concatenate([w3, zw3], 1), jnp.concatenate([zw3, w3], 1)], 0
        )
        b3 = jnp.concatenate([b3, b3])
        hidden = 2 * hidden
    out_ch = w3.shape[1]
    useful_h = hidden // 2 if packed else hidden

    scaled = plane_scale is not None
    kernel = functools.partial(
        _kernel, R=R, f=f, f1=f1, acc_dtype=jnp.float32, gelu=_GELUS[gelu],
        out_ch=out_ch, scaled=scaled,
    )
    # params tiled per grid step so their windows advance (v2 module doc)
    tile8 = lambda a: jnp.tile(a.reshape(1, -1), (steps * 8, 1))
    pad8 = 8 - out_ch
    w3t8 = jnp.tile(jnp.pad(w3.T, ((0, pad8), (0, 0))), (steps, 1))
    b3t = jnp.tile(jnp.pad(b3.reshape(-1, 1), ((0, pad8), (0, 0))), (steps, 1))
    # row-PE is frame-independent; tiled [T, ncol, nrow, R, H] to match the
    # (t·ncol + j)·nrow + i window index
    peu_t = jnp.broadcast_to(
        pe_u.reshape(1, 1, nrow, R, hidden), (n_t, ncol, nrow, R, hidden)
    ).reshape(steps * R, hidden)
    # retile column-block-major per frame → every window is one contiguous
    # DMA (v2 finding: strided (rows, C, H) windows cut from (rows, n, H)
    # run ~3× slower)
    pc_t = (
        pc.reshape(n_t, nrow, R // f, ncol, C, hidden)
        .transpose(0, 3, 1, 2, 4, 5)
        .reshape(n_t * ncol * nrow * (R // f), C, hidden)
    )
    c1_pad = jnp.pad(
        c1v, ((0, 0), (0, (nrow + 1) * m - c1v.shape[1]), (0, 0), (0, 0))
    )
    c1_t = (
        c1_pad.reshape(n_t, nrow + 1, m, ncol, C, hidden)
        .transpose(0, 3, 1, 2, 4, 5)
        .reshape(n_t * ncol * (nrow + 1) * m, C, hidden)
    )
    flat = lambda t, i, j: (t * ncol + j) * nrow + i
    out = pl.pallas_call(
        kernel,
        grid=(n_t, nrow, ncol),
        in_specs=[
            pl.BlockSpec((R // f, C, hidden),
                         lambda t, i, j: ((t * ncol + j) * nrow + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, C, hidden),
                         lambda t, i, j: ((t * ncol + j) * (nrow + 1) + i, 0, 0),
                         memory_space=pltpu.VMEM),
            # halo: height-1 advancing window one node row past block i
            pl.BlockSpec((1, C, hidden),
                         lambda t, i, j: (
                             ((t * ncol + j) * (nrow + 1) + i + 1) * m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, hidden), lambda t, i, j: (flat(t, i, j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, hidden), lambda t, i, j: (flat(t, i, j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hidden), lambda t, i, j: (flat(t, i, j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hidden), lambda t, i, j: (flat(t, i, j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda t, i, j: (flat(t, i, j), 0),
                         memory_space=pltpu.VMEM),
            # i16: shared plane scale, tiled per step (advancing window)
            *([pl.BlockSpec((8, 1), lambda t, i, j: (flat(t, i, j), 0),
                            memory_space=pltpu.VMEM)] if scaled else []),
        ],
        out_specs=pl.BlockSpec((out_ch, R * C),
                               lambda t, i, j: (0, flat(t, i, j)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_ch, steps * R * C), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_t * n * n * (useful_h * useful_h + useful_h * 3),
            bytes_accessed=(pc.size + 2 * c1v.size) * pc.dtype.itemsize
            + n_t * n * n * 3 * 4,
            transcendentals=0 if gelu == "poly" else
            2 * n_t * n * n * useful_h,
        ),
    )(pc_t, c1_t, c1_t, peu_t, jnp.tile(w2, (steps, 1)), tile8(b2), w3t8, b3t,
      *([jnp.tile(plane_scale.reshape(1, 1), (steps * 8, 1))]
        if scaled else []))
    # untile: (OC, tile-major pixels) → [T, n, n, 3]; the block sequence
    # follows flat = (t·ncol + j)·nrow + i, i.e. (t, j, i) order
    if packed:
        return (
            out.reshape(2, 3, n_t, ncol, nrow, R, C)
            .transpose(2, 4, 5, 3, 6, 0, 1)
            .reshape(n_t, n, n, 3)
        )
    return (
        out.reshape(3, n_t, ncol, nrow, R, C)
        .transpose(1, 3, 4, 2, 5, 0)
        .reshape(n_t, n, n, 3)
    )


def kernel_covers_3d(mip_level: int, image_size: int, mip_to_level: dict,
                     hidden: int, block_rows=None, block_cols=None) -> bool:
    """Pure-geometry predicate: will ``decode_volume_fused`` run the 3D
    Pallas kernel for this (mip, size) or fall back to folded XLA?
    Mirrors ``_prepare_3d``'s gate without doing any compute (see
    ``decode_fused_v2.kernel_covers_2d``)."""
    fl = mip_to_level[mip_level]
    e = mip_level - (fl + 1) * 2
    n = image_size // (2**mip_level)
    if e > 0:
        return False  # thumbnail mips (negative shift in f1 below)
    f = 1 << (-e) if e < 0 else 1
    f1 = 1 << (1 - e)
    R = block_rows or max(f1, f, min(n, 32))
    C = block_cols or min(n, 2048 if 2 * hidden == 128 else 1024)
    return not (n % R or n < R or n % C or R % f1 or R % f)


def _prepare_3d(
    fp, mlp, mip_level: int, *, image_size: int, mip_to_level: dict,
    pe_channels: int, use_tri_pe: bool, sparse_g0: bool, dtype,
    block_rows, block_cols,
):
    """Host/XLA frame+column stage shared by the single-device entry and
    the frame-sharded multi-device entry (nic.kernels.decode_sharded).
    Returns ``None`` when the geometry needs the XLA fallback, else
    ``(pc, c1v, pe_u, w2, b2, w3, b3, geom)``."""
    fl = mip_to_level[mip_level]
    e = mip_level - (fl + 1) * 2
    n = image_size // (2**mip_level)
    channels = fp[fl * 2].shape[0]

    if e > 0:
        return None  # thumbnail mip: XLA fallback (e ≥ 2 would be a
        # negative shift in f1 below)
    f = 1 << (-e) if e < 0 else 1
    f1 = 1 << (1 - e)
    # small frames: take the whole frame's rows per block when legal
    R = block_rows or max(f1, f, min(n, 32))
    C = block_cols or min(n, 2048 if 2 * mlp["w2"].shape[0] == 128 else 1024)
    if n % R or n < R or n % C or R % f1 or R % f:
        return None

    # dtype modes mirror the 2D kernel (decode_fused_v2._prepare_2d):
    # None = fp32; a dtype = storage rounding at node + one full-res
    # rounding (arithmetic fp32 since round 5); "i16" = int16 fixed-point
    # storage with one shared true-max scale + bf16 MXU dots.
    i16 = isinstance(dtype, str) and dtype == "i16"
    if isinstance(dtype, str) and not i16:
        dtype = None  # "surgical" is a 2D-kernel mode: 3D runs fp32
    storage = None if i16 else dtype

    p_vol, c1_vol, pe_blocks, w_lod, b1 = precompute_first_layer(
        fp, fl, mlp, ndim=3, channels=channels, pe_channels=pe_channels,
        sparse_g0=sparse_g0,
    )
    if storage is not None:
        p_vol = p_vol.astype(storage)
        c1_vol = c1_vol.astype(storage)

    # separable PE tables through W1: rows ride as the kernel's peu
    # operand; frame + column terms + bias + LOD fold into C1 (row-interp
    # weights sum to 1)
    t1 = jnp.arange(n, dtype=jnp.float32) * (2.0 ** (e - 1))
    pe_fn = triangular_pe if use_tri_pe else sinusoidal_pe
    table = pe_fn(t1[None, :], pe_channels).T    # [n, PE]
    a_frame = table @ pe_blocks[0]               # [n, H]
    pe_u = table @ pe_blocks[1]                  # [n, H] fp32
    a_col = table @ pe_blocks[2] + mlp["b1"] + float(mip_level) * w_lod

    plane_scale = None
    # ---- frame + column stage (XLA) ----
    # C1 first, in REAL units: linear interp along frames (axis 0) and
    # columns (axis 2); rows (axis 1) stay at node resolution (+1 halo
    # row) for the kernel. Interp arithmetic is fp32 in every mode
    # (storage-dtype operands upcast per element), so in i16 mode the
    # fully-formed fp32 C1 takes its scale from its own TRUE max and
    # rounds ONCE at full resolution.
    c1r = jax.lax.slice_in_dim(c1_vol, 0, n // f1 + 1, axis=1)
    c1t = _axis_interp(c1r, e, n, axis=0)        # [n, n/f1+1, S1, H] fp32
    c1v = _axis_interp(c1t, e, n, axis=2)        # [n, n/f1+1, n, H] fp32
    c1v = c1v + a_frame[:, None, None, :] + a_col[None, None, :, :]
    if i16:
        # shared P/C1 scale from TRUE maxes (round-5 3D tightening: the
        # analytic ½·maxΣ|W1| + |a_frame| + |a_col| bound's triangle-
        # inequality slack over the deeper 3D stack measured 4–5 u8 LSB
        # worst-cell in the r5 sweep vs ≤3 on the 2D kernel). C1's max
        # is exact — the fp32 full-res volume exists in every mode
        # before rounding; P's node max bounds the in-kernel window
        # because corner-interp weights are convex. The extra reduction
        # rides the misty-protocol volume (~10 MB), not a 2048² plane —
        # the 2D kernel takes node-resolution true maxes for exactly that
        # bandwidth reason (r5 probe: plane-max pass cost 1.47→1.31).
        s = jnp.maximum(
            jnp.maximum(jnp.abs(p_vol).max(), jnp.abs(c1v).max()),
            jnp.float32(1e-12),
        ).astype(jnp.float32)
        inv = 32767.0 / s
        # the ONE P rounding (node resolution; window interp is convex)
        p_vol = jnp.clip(
            jnp.round(p_vol * inv), -32767.0, 32767.0).astype(jnp.int16)
        # the ONE C1 rounding (full resolution, real-unit max ⇒ no clip
        # saturation possible)
        c1v = jnp.clip(
            jnp.round(c1v * inv), -32767.0, 32767.0).astype(jnp.int16)
        plane_scale = s / jnp.float32(32767.0)
        # pe_u stays fp32 (added after the in-kernel scale FMA)

    # P: nearest upsample along frames (axis 0) and columns (axis 2);
    # rows (axis 1) stay at cell resolution for the in-kernel repeat —
    # pure movement, storage dtype (int16 after the i16 rounding above)
    pr = jax.lax.slice_in_dim(p_vol, 0, n // f, axis=1)
    pt = _axis_take_up(pr, e, n, 0, axis=0)      # [n, n/f, cells, H]
    pc = _axis_take_up(pt, e, n, 0, axis=2)      # [n, n/f, n, H]

    if not i16:
        c1v = c1v.astype(pc.dtype)
        pe_u = pe_u.astype(pc.dtype)

    w2, b2 = mlp["w2"], mlp["b2"]
    w3, b3 = mlp["w3"], mlp["b3"]
    if dtype is not None:  # i16: bf16 dots under i16 planes
        mxu_dtype = jnp.bfloat16 if i16 else dtype
        w2, w3 = w2.astype(mxu_dtype), w3.astype(mxu_dtype)

    hidden = w2.shape[0]
    packed = (
        2 * hidden == 128
        and C % 16 == 0
        and (R * C // 2) % 128 == 0
        and n % 2 == 0
    )
    geom = dict(n=n, R=R, C=C, f=f, f1=f1, packed=packed)
    return pc, c1v, pe_u, w2, b2, w3, b3, plane_scale, geom


def decode_volume_fused(
    fp, mlp, mip_level: int, *, image_size: int, mip_to_level: dict,
    pe_channels: int, use_tri_pe: bool = True, sparse_g0: bool = False,
    g1_quirk: bool = True, dtype=None, out_dtype=jnp.float32,
    block_rows: int | None = None, block_cols: int | None = None,
    gelu: str = "exact",
):
    """Full-volume 3D fused decode (one Pallas kernel over all frames).

    Returns [n, n, n, 3] with n = image_size // 2^mip_level. Methods 3
    (dense G0) and 4 (``sparse_g0=True``) share the kernel — only the
    host-side P fold differs."""
    prep = _prepare_3d(
        fp, mlp, mip_level, image_size=image_size,
        mip_to_level=mip_to_level, pe_channels=pe_channels,
        use_tri_pe=use_tri_pe, sparse_g0=sparse_g0, dtype=dtype,
        block_rows=block_rows, block_cols=block_cols,
    )
    if prep is None:
        out = fast_decode(
            fp, mlp, mip_level, image_size=image_size,
            mip_to_level=mip_to_level, pe_channels=pe_channels,
            use_tri_pe=use_tri_pe, ndim=3, sparse_g0=sparse_g0,
            g1_quirk=g1_quirk,
        )
        return out.astype(out_dtype)
    pc, c1v, pe_u, w2, b2, w3, b3, plane_scale, geom = prep
    n = geom.pop("n")
    return _call3(pc, c1v, pe_u, w2, b2, w3, b3, plane_scale, n=n, n_t=n,
                  out_dtype=out_dtype, gelu=gelu, **geom)

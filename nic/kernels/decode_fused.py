"""Fused NTC decode kernel v1 (Pallas/TPU): coords → PE → G0/G1
gather+interp → tiny MLP → RGB, in one kernel.

SUPERSEDED by decode_fused_v2 (folded first layer): v1 assembles the raw
73-feature matrix in-kernel, which forces 12-lane (channels-last) layouts
on every VPU op and measured far below the XLA path on-chip. Kept as the
direct kernelization of the reference's decode graph and as the baseline
v2 is measured against.

This is the north-star fusion of the reference's decode stack
(``Projects/image_compression.py:170-211,307-346`` feeding the 73→64→64→3
MLP, and transitively the per-pixel loop of ``pixel_comp.py:155-168`` —
SURVEY.md §3.2) re-thought for the TPU memory hierarchy:

- the full-image decode lattice is **regular**: G0 indices along an axis
  are ``floor((r0 + i) * 2^e)`` — an upsample (e<0) or strided slice (e≥0)
  of the grid, never a pointwise gather. Each kernel instance slices its
  grid window out of the **VMEM-resident** grid and expands it with
  ``pltpu.repeat`` / strided loads;
- G1 bilinear weights are periodic in the pixel index (period ``2^(1-e)``)
  and are synthesized from ``broadcasted_iota`` on the VPU — no coordinate
  tensors are ever read from HBM;
- the triangular / sinusoidal PE is separable per axis: one [rows, PE]
  and one [cols, PE] table per block, broadcast multiplied — VPU math;
- the feature matrix [block_pixels, 73] lives only in registers/VMEM and
  feeds three MXU matmuls (W1 73→64, W2 64→64, W3 64→3) with exact-erf
  GELU and a sigmoid head. The XLA path materializes that matrix in HBM
  (~292 B/pixel of traffic); fusing removes it.

Grids are channel-LAST here ([S, S, C]); :func:`decode_image_fused`
adapts from the pyramid's canonical [C, S, S] layout once per call.

The reference's G1 unweighted-sum quirk (weights skipped when step == 2,
fp_def.py:136-144) is reproduced — ``e == 1`` sums the four corners raw.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


__all__ = ["decode_image_fused", "fused_rows_per_block"]


def _tri(x, offset):
    return 2.0 * jnp.abs((x - offset) % 2.0 - 1.0) - 1.0


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| ≤ 1.5e-7) — Mosaic has no
    erf/erfc lowering, so the kernel carries its own (exp is supported)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """Exact-erf GELU (torch's default, what the XLA path uses)."""
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def _pe_table_1d(coords, pe_channels: int, use_tri_pe: bool):
    """[n] continuous coords → [n, pe_channels] per-axis PE table.

    Row layout matches nic.core.encodings (reference utils.py:198-227):
    triangular: feature r ← j = pe-1-r; zero rows at j == 0 / j ≥ 2*octaves;
    sinusoidal: feature 2k = sin(x·w_k), 2k+1 = cos(x·w_k).
    """
    cols = []
    if use_tri_pe:
        octaves = pe_channels // 2
        for r in range(pe_channels):
            j = pe_channels - 1 - r
            if j == 0 or j >= 2 * octaves:
                cols.append(jnp.zeros_like(coords))
            else:
                octave, i = j // 2, j % 2
                offset = 0.5 if i == 0 else 0.0
                cols.append(_tri(coords / (2.0**octave), offset))
    else:
        for r in range(pe_channels):
            k = r // 2
            w = math.exp(-2 * k * math.log(10000.0) / pe_channels)
            cols.append(jnp.sin(coords * w) if r % 2 == 0 else jnp.cos(coords * w))
    return jnp.stack(cols, axis=-1)  # [n, pe]


def _erepeat(x, f: int, axis: int):
    """Element-wise repeat (a a b b…) along ``axis`` via broadcast+reshape —
    pltpu.repeat TILES whole copies (a b a b), which is not an upsample."""
    if f == 1:
        return x
    x = jnp.expand_dims(x, axis + 1)
    shape = list(x.shape)
    shape[axis + 1] = f
    x = jnp.broadcast_to(x, shape)
    out_shape = list(x.shape)
    out_shape[axis] *= f
    del out_shape[axis + 1]
    return x.reshape(out_shape)


def _frac_pattern(base: int, n: int, e: int, dtype, axis_dim: int):
    """Periodic fractional part of (base + i) * 2^(e-1) for i < n, as a
    column/row vector broadcastable over the block. e-1 < 0 only."""
    f1 = 1 << (1 - e)  # period
    shape = (n, 1) if axis_dim == 0 else (1, n)
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis_dim) + base
    return (idx % f1).astype(dtype) / jnp.asarray(float(f1), dtype)


def _decode_kernel(
    g0_ref, g1_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
    *, rows: int, cols: int, e: int, channels: int, pe_channels: int,
    use_tri_pe: bool, sparse_g0: bool, mip_level: int, acc_dtype,
):
    pid = pl.program_id(0)
    r0 = pid * rows
    dtype = g0_ref.dtype

    def window(ref, ee, n_rows, n_cols, row_start):
        """Load the grid window covering this block at step 2^ee and
        return the 4 corner tiles [n_rows, n_cols, C] (2D)."""
        if ee < 0:
            f = 1 << (-ee)
            rcells = n_rows // f
            ccells = n_cols // f
            # row_start is a multiple of n_rows ⇒ of f
            blk = ref[pl.ds(row_start // f, rcells + 1), :, :]  # [rc+1, S, C]
            blk = jax.lax.slice_in_dim(blk, 0, ccells + 1, axis=1)
            up = _erepeat(_erepeat(blk, f, axis=0), f, axis=1)
            def corner(du, dv):
                # du/dv/f are static ⇒ plain slices (Mosaic has no value-level
                # dynamic_slice; the only dynamic start is the ref read above)
                t = jax.lax.slice_in_dim(up, du * f, du * f + n_rows, axis=0)
                return jax.lax.slice_in_dim(t, dv * f, dv * f + n_cols, axis=1)
            return corner
        s = 1 << ee
        blk = ref[pl.ds(row_start * s, (n_rows - 1) * s + 2), :, :]
        blk = jax.lax.slice_in_dim(blk, 0, (n_cols - 1) * s + 2, axis=1)
        def corner(du, dv):
            t = jax.lax.slice_in_dim(blk, du, du + (n_rows - 1) * s + 1, axis=0)
            t = jax.lax.slice_in_dim(t, dv, dv + (n_cols - 1) * s + 1, axis=1)
            if s > 1:
                t = jax.lax.slice_in_dim(t, 0, (n_rows - 1) * s + 1, stride=s, axis=0)
                t = jax.lax.slice_in_dim(t, 0, (n_cols - 1) * s + 1, stride=s, axis=1)
            return t
        return corner

    # ---- G0 corners ----
    g0_corner = window(g0_ref, e, rows, cols, r0)
    if sparse_g0:
        g0_tiles = [g0_corner(0, 0)]  # 2D sparse not used; placeholder
    else:
        g0_tiles = [g0_corner(0, 0), g0_corner(0, 1), g0_corner(1, 0), g0_corner(1, 1)]

    # ---- G1: interp (or the e==1 raw-sum quirk) ----
    g1_corner = window(g1_ref, e - 1, rows, cols, r0)
    weights_on = int(1 // (2.0**e / 2)) != 1
    if weights_on and (e - 1) < 0:
        fu = _frac_pattern(r0, rows, e, acc_dtype, 0)[:, :, None]  # [rows,1,1]
        fv = _frac_pattern(0, cols, e, acc_dtype, 1)[:, :, None]   # [1,cols,1]
        g1 = (
            g1_corner(0, 0).astype(acc_dtype) * (1 - fu) * (1 - fv)
            + g1_corner(0, 1).astype(acc_dtype) * (1 - fu) * fv
            + g1_corner(1, 0).astype(acc_dtype) * fu * (1 - fv)
            + g1_corner(1, 1).astype(acc_dtype) * fu * fv
        )
    elif weights_on:
        # e ≥ 2: G1 coords integral, weights reduce to corner (0,0)
        g1 = g1_corner(0, 0).astype(acc_dtype)
    else:
        g1 = (
            g1_corner(0, 0).astype(acc_dtype) + g1_corner(0, 1).astype(acc_dtype)
            + g1_corner(1, 0).astype(acc_dtype) + g1_corner(1, 1).astype(acc_dtype)
        )

    # ---- PE (separable per axis, G1-resolution coords) ----
    step1 = 2.0 ** (e - 1)
    u = (jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + r0).astype(acc_dtype)
    v = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1).astype(acc_dtype)
    pe_u = _pe_table_1d(u * step1, pe_channels, use_tri_pe)  # [rows, 1, pe]
    pe_v = _pe_table_1d(v * step1, pe_channels, use_tri_pe)  # [1, cols, pe]
    pe_u = jnp.broadcast_to(pe_u, (rows, cols, pe_channels))
    pe_v = jnp.broadcast_to(pe_v, (rows, cols, pe_channels))

    lod = jnp.full((rows, cols, 1), float(mip_level), acc_dtype)

    # ---- feature matrix (VMEM-only) ----
    x = jnp.concatenate(
        [t.astype(acc_dtype) for t in g0_tiles] + [g1, pe_u, pe_v, lod], axis=-1
    ).reshape(rows * cols, -1)

    # ---- tiny MLP on the MXU (exact-erf GELU, sigmoid head) ----
    h = jnp.dot(x.astype(dtype), w1_ref[:, :], preferred_element_type=acc_dtype)
    h = _gelu_exact(h + b1_ref[:, :].astype(acc_dtype))
    h = jnp.dot(h.astype(dtype), w2_ref[:, :], preferred_element_type=acc_dtype)
    h = _gelu_exact(h + b2_ref[:, :].astype(acc_dtype))
    h = jnp.dot(h.astype(dtype), w3_ref[:, :], preferred_element_type=acc_dtype)
    rgb = jax.nn.sigmoid(h + b3_ref[:, :].astype(acc_dtype))
    out_ref[:, :, :] = rgb.reshape(rows, cols, out_ref.shape[-1]).astype(out_ref.dtype)


def fused_rows_per_block(decode_size: int, e: int, channels: int) -> int:
    """Pick a row-block size: ≥ 2048 feature rows per MXU pass when
    possible, aligned to the coarsest upsample factor (8 covers e ≥ -2)."""
    target = max(1, 4096 // max(decode_size, 1))
    rows = 8
    while rows < target and rows * 2 <= decode_size:
        rows *= 2
    f = 1 << max(0, 1 - e)  # G1 upsample factor
    rows = max(rows, f)
    while decode_size % rows:
        rows //= 2
    return max(rows, 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "e", "decode_size", "pe_channels", "use_tri_pe", "mip_level", "out_dtype",
    ),
)
def _decode_fused_2d(
    g0_cl, g1_cl, mlp, *, e: int, decode_size: int, pe_channels: int,
    use_tri_pe: bool, mip_level: int, out_dtype,
):
    channels = g0_cl.shape[-1]
    rows = fused_rows_per_block(decode_size, e, channels)
    grid = (decode_size // rows,)
    acc_dtype = jnp.float32
    dtype = g0_cl.dtype

    kernel = functools.partial(
        _decode_kernel,
        rows=rows, cols=decode_size, e=e, channels=channels,
        pe_channels=pe_channels, use_tri_pe=use_tri_pe, sparse_g0=False,
        mip_level=mip_level, acc_dtype=acc_dtype,
    )
    w1, b1 = mlp["w1"].astype(dtype), mlp["b1"].reshape(1, -1).astype(dtype)
    w2, b2 = mlp["w2"].astype(dtype), mlp["b2"].reshape(1, -1).astype(dtype)
    w3, b3 = mlp["w3"].astype(dtype), mlp["b3"].reshape(1, -1).astype(dtype)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops_per_pixel = 2 * (w1.shape[0] * w1.shape[1] + w2.shape[0] * w2.shape[1] + w3.shape[0] * w3.shape[1])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem] * 8,
        out_specs=pl.BlockSpec(
            (rows, decode_size, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((decode_size, decode_size, 3), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pixel * decode_size * decode_size,
            bytes_accessed=(g0_cl.size + g1_cl.size) * g0_cl.dtype.itemsize
            + decode_size * decode_size * 3 * 4,
            transcendentals=4 * decode_size * decode_size * w1.shape[1],
        ),
    )(g0_cl, g1_cl, w1, b1, w2, b2, w3, b3)


def decode_image_fused(
    fp, mlp, mip_level: int, *, cfg=None, image_size: int | None = None,
    mip_to_level: dict | None = None, pe_channels: int = 6,
    use_tri_pe: bool = True, dtype=None, out_dtype=jnp.float32,
):
    """Full-image fused decode at ``mip_level`` (2D pyramids).

    fp: canonical [C, S, S] pyramid tuple; mlp: nic.models.mlp params.
    Accepts either a CompressionConfig via ``cfg`` or explicit
    image_size/mip_to_level/pe settings. Returns [N, N, 3].
    """
    if cfg is not None:
        from nic.grids.pyramid import pyramid_mip_levels

        image_size = cfg.image_size
        mip_to_level = pyramid_mip_levels(
            cfg.image_size, cfg.feature_pyramid_size, cfg.tf_no_mip
        )
        pe_channels = cfg.pe_channels
        use_tri_pe = cfg.tf_use_tri_pe
    fl = mip_to_level[mip_level]
    e = mip_level - (fl + 1) * 2
    decode_size = image_size // (2**mip_level)
    g0 = jnp.moveaxis(fp[fl * 2], 0, -1)  # [S, S, C] channel-last
    g1 = jnp.moveaxis(fp[fl * 2 + 1], 0, -1)
    if dtype is not None:
        g0, g1 = g0.astype(dtype), g1.astype(dtype)
    return _decode_fused_2d(
        g0, g1, mlp, e=e, decode_size=decode_size, pe_channels=pe_channels,
        use_tri_pe=use_tri_pe, mip_level=mip_level, out_dtype=out_dtype,
    )

"""Fused decode kernel v2: folded first layer (see nic.grids.fastdecode).

v1 (decode_fused.py) assembled the raw 73-feature matrix in-kernel and paid
for 12-lane layouts everywhere. v2 exploits the algebraic identity that the
MLP's first layer commutes with gather/interp: the host precomputes

    P  = Σ_corners shift(G0)·W1_corner   [cells, cells, H]
    C1 = G1·W1_g1                        [S1, S1, H]
    pe_u/pe_v = PE tables · W1_pe        [N, H] per axis
    b1' = b1 + mip·W1_lod

(tiny matmuls, done once per decode), and the kernel does only H-lane work:
nearest-upsample of P + bilinear sample of C1 + separable PE broadcast →
GELU → W2 → GELU → W3 → sigmoid. Per-pixel matmul FLOPs drop ~2× vs v1 and
every VPU op runs at full 64/128-lane occupancy.

The G1 step==2 raw-sum quirk is inherited (weights_on gate as in
fp_def.py:136-144 of the reference).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nic.core.encodings import sinusoidal_pe, triangular_pe
from nic.grids.fastdecode import precompute_first_layer
from nic.grids.sample import _g1_weights_active
from nic.kernels.decode_fused import _erepeat, _gelu_exact

__all__ = ["decode_image_fused_v2"]


def _window_up(ref, ee: int, n_rows: int, n_cols: int, row_start, corners: bool):
    """Slice an H-lane plane ref at step 2^ee over this block; return either
    the nearest-sampled block (corners=False) or a corner(du,dv) getter."""
    if ee < 0:
        f = 1 << (-ee)
        rcells = n_rows // f
        ccells = n_cols // f
        extra = 1 if corners else 0
        blk = ref[pl.ds(row_start // f, rcells + extra), :, :]
        blk = jax.lax.slice_in_dim(blk, 0, ccells + extra, axis=1)
        up = _erepeat(_erepeat(blk, f, axis=0), f, axis=1)
        if not corners:
            return up  # exactly [n_rows, n_cols, H]

        def corner(du, dv):
            t = jax.lax.slice_in_dim(up, du * f, du * f + n_rows, axis=0)
            return jax.lax.slice_in_dim(t, dv * f, dv * f + n_cols, axis=1)

        return corner
    s = 1 << ee
    extra = 1 if corners else 0
    blk = ref[pl.ds(row_start * s, (n_rows - 1) * s + 1 + extra), :, :]
    blk = jax.lax.slice_in_dim(blk, 0, (n_cols - 1) * s + 1 + extra, axis=1)

    def strided(t, du, dv):
        t = jax.lax.slice_in_dim(t, du, du + (n_rows - 1) * s + 1, axis=0)
        t = jax.lax.slice_in_dim(t, dv, dv + (n_cols - 1) * s + 1, axis=1)
        if s > 1:
            t = jax.lax.slice_in_dim(t, 0, (n_rows - 1) * s + 1, stride=s, axis=0)
            t = jax.lax.slice_in_dim(t, 0, (n_cols - 1) * s + 1, stride=s, axis=1)
        return t

    if not corners:
        return strided(blk, 0, 0)
    return lambda du, dv: strided(blk, du, dv)


def _frac(base, n: int, e: int, dtype, axis: int):
    f1 = 1 << (1 - e)
    shape = (n, 1) if axis == 0 else (1, n)
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis) + base
    return ((idx % f1).astype(dtype) / float(f1))[:, :, None]


def _kernel(p_ref, c1_ref, peu_ref, pev_ref, b1_ref, w2_ref, b2_ref,
            w3_ref, b3_ref, out_ref, *, rows: int, cols: int, e: int,
            acc_dtype):
    pid = pl.program_id(0)
    r0 = pid * rows

    # G0 term: nearest sample of the folded plane
    acc = _window_up(p_ref, e, rows, cols, r0, corners=False).astype(acc_dtype)

    # G1 term: bilinear sample of C1 (step==2 → raw corner sum)
    corner = _window_up(c1_ref, e - 1, rows, cols, r0, corners=True)
    weights_on = _g1_weights_active(2.0**e)
    if weights_on and (e - 1) < 0:
        fu = _frac(r0, rows, e, acc_dtype, 0)
        fv = _frac(0, cols, e, acc_dtype, 1)
        acc = acc + (
            corner(0, 0).astype(acc_dtype) * (1 - fu) * (1 - fv)
            + corner(0, 1).astype(acc_dtype) * (1 - fu) * fv
            + corner(1, 0).astype(acc_dtype) * fu * (1 - fv)
            + corner(1, 1).astype(acc_dtype) * fu * fv
        )
    elif weights_on:
        acc = acc + corner(0, 0).astype(acc_dtype)
    else:
        acc = acc + (
            corner(0, 0).astype(acc_dtype) + corner(0, 1).astype(acc_dtype)
            + corner(1, 0).astype(acc_dtype) + corner(1, 1).astype(acc_dtype)
        )

    # separable PE row/col vectors + folded bias
    pe_u = peu_ref[pl.ds(r0, rows), :]  # [rows, H]
    acc = acc + pe_u[:, None, :].astype(acc_dtype)
    acc = acc + pev_ref[:, :][None, :, :].astype(acc_dtype)
    acc = acc + b1_ref[:, :][None, :, :].astype(acc_dtype)

    h = _gelu_exact(acc).reshape(rows * cols, -1)
    dtype = p_ref.dtype
    h = jnp.dot(h.astype(dtype), w2_ref[:, :], preferred_element_type=acc_dtype)
    h = _gelu_exact(h + b2_ref[:, :].astype(acc_dtype))
    h = jnp.dot(h.astype(dtype), w3_ref[:, :], preferred_element_type=acc_dtype)
    rgb = jax.nn.sigmoid(h + b3_ref[:, :].astype(acc_dtype))
    out_ref[:, :, :] = rgb.reshape(rows, cols, -1).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("e", "decode_size", "rows", "out_dtype"),
)
def _call(p_plane, c1_plane, pe_u, pe_v, b1p, w2, b2, w3, b3, *, e: int,
          decode_size: int, rows: int, out_dtype):
    kernel = functools.partial(
        _kernel, rows=rows, cols=decode_size, e=e, acc_dtype=jnp.float32
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hidden = w2.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(decode_size // rows,),
        in_specs=[vmem] * 9,
        out_specs=pl.BlockSpec(
            (rows, decode_size, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((decode_size, decode_size, 3), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * decode_size * decode_size * (hidden * hidden + hidden * 3),
            bytes_accessed=(p_plane.size + c1_plane.size) * p_plane.dtype.itemsize
            + decode_size * decode_size * 3 * 4,
            transcendentals=2 * decode_size * decode_size * hidden,
        ),
    )(p_plane, c1_plane, pe_u, pe_v, b1p, w2, b2, w3, b3)


def decode_image_fused_v2(
    fp, mlp, mip_level: int, *, image_size: int, mip_to_level: dict,
    pe_channels: int, use_tri_pe: bool = True, dtype=None,
    out_dtype=jnp.float32,
):
    """Full-image 2D fused decode, v2 (folded first layer)."""
    fl = mip_to_level[mip_level]
    e = mip_level - (fl + 1) * 2
    decode_size = image_size // (2**mip_level)
    channels = fp[fl * 2].shape[0]

    p_plane, c1_plane, pe_blocks, w_lod, b1 = precompute_first_layer(
        fp, fl, mlp, ndim=2, channels=channels, pe_channels=pe_channels
    )
    # PE tables folded through W1 (host-side; tiny)
    t = (jnp.arange(decode_size, dtype=jnp.float32)) * (2.0 ** (e - 1))
    pe_fn = triangular_pe if use_tri_pe else sinusoidal_pe
    table = pe_fn(t[None, :], pe_channels).T  # [N, PE]
    pe_u = table @ pe_blocks[0]
    pe_v = table @ pe_blocks[1]
    b1p = (b1 + float(mip_level) * w_lod).reshape(1, -1)

    w2, b2 = mlp["w2"], mlp["b2"].reshape(1, -1)
    w3, b3 = mlp["w3"], mlp["b3"].reshape(1, -1)
    if dtype is not None:
        cast = lambda x: x.astype(dtype)
        p_plane, c1_plane, pe_u, pe_v = map(cast, (p_plane, c1_plane, pe_u, pe_v))
        w2, w3 = cast(w2), cast(w3)

    # row block: G1 upsample factor must divide it; ≥2048 rows per matmul
    f1 = 1 << max(0, 1 - e)
    rows = max(f1, min(decode_size, max(8, 4096 // max(decode_size, 1))))
    while decode_size % rows:
        rows //= 2
    rows = max(rows, f1)

    return _call(
        p_plane, c1_plane, pe_u, pe_v, b1p, w2, b2, w3, b3,
        e=e, decode_size=decode_size, rows=rows, out_dtype=out_dtype,
    )

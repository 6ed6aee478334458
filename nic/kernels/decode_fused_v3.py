"""Fused decode kernel v3: the layout-informed split.

v1/v2 measured 4 orders of magnitude below the XLA path on this chip —
Mosaic relayouts for the in-kernel P/C1 upsample patterns dominate
(BASELINE.md decode table). v3 tests the judge-suggested variant: XLA
computes the folded first-layer accumulator (nearest-upsample of P +
multilinear C1 + separable PE — pure layout ops it lowers well,
``nic.grids.fastdecode.first_layer_acc``), and the Pallas kernel is ONLY
the H-lane MLP tail: GELU → W2 (MXU) → GELU → W3 → sigmoid, pipelined
over row blocks of the [S, S, H] accumulator.

The trade is explicit: the accumulator (S²·H floats — 67 MB at 512²,
1 GB at 2048²) materializes through HBM instead of staying in registers
inside one XLA fusion, so the roofline is HBM bandwidth ≈
BW / (H·(4+2)·bytes) pixels/s, well below the fully-fused XLA path at
large S. The kernel exists to measure exactly that — the numbers in
BASELINE.md justify keeping XLA fusion as the production decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nic.grids.fastdecode import first_layer_acc
from nic.kernels.decode_fused import _gelu_exact

__all__ = ["decode_image_fused_v3", "mlp_tail"]


def _kernel(acc_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref, *, acc_dtype):
    rows, cols, hidden = acc_ref.shape
    h = _gelu_exact(acc_ref[:, :, :].astype(acc_dtype)).reshape(
        rows * cols, hidden
    )
    dtype = w2_ref.dtype
    h = jnp.dot(h.astype(dtype), w2_ref[:, :], preferred_element_type=acc_dtype)
    h = _gelu_exact(h + b2_ref[:, :].astype(acc_dtype))
    h = jnp.dot(h.astype(dtype), w3_ref[:, :], preferred_element_type=acc_dtype)
    rgb = jax.nn.sigmoid(h + b3_ref[:, :].astype(acc_dtype))
    out_ref[:, :, :] = rgb.reshape(rows, cols, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "out_dtype"))
def mlp_tail(acc, w2, b2, w3, b3, *, rows: int = 256, out_dtype=jnp.float32):
    """[S, S, H] pre-GELU accumulator → [S, S, 3] pixels via a Pallas
    row-block pipeline (GELU → W2 → GELU → W3 → sigmoid)."""
    s, cols, hidden = acc.shape
    while s % rows:
        rows //= 2
    kernel = functools.partial(_kernel, acc_dtype=jnp.float32)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(s // rows,),
        in_specs=[
            pl.BlockSpec((rows, cols, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vmem, vmem, vmem, vmem,
        ],
        out_specs=pl.BlockSpec((rows, cols, 3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, cols, 3), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * cols * (hidden * hidden + hidden * 3),
            bytes_accessed=s * cols * hidden * acc.dtype.itemsize
            + s * cols * 3 * 4,
            transcendentals=2 * s * cols * hidden,
        ),
    )(acc, w2, b2.reshape(1, -1), w3, b3.reshape(1, -1))


def decode_image_fused_v3(
    fp, mlp, mip_level: int, *, image_size: int, mip_to_level: dict,
    pe_channels: int, use_tri_pe: bool = True, sparse_g0: bool = False,
    g1_quirk: bool = True, dtype=None, out_dtype=jnp.float32,
):
    """Full-image 2D decode: XLA first-layer accumulator + Pallas MLP tail."""
    if dtype is not None:
        fp = tuple(g.astype(dtype) for g in fp)
        mlp = jax.tree.map(lambda p: p.astype(dtype), mlp)
    acc = first_layer_acc(
        fp, mlp, mip_level, image_size=image_size, mip_to_level=mip_to_level,
        pe_channels=pe_channels, use_tri_pe=use_tri_pe, ndim=2,
        sparse_g0=sparse_g0, g1_quirk=g1_quirk,
    )
    return mlp_tail(acc, mlp["w2"], mlp["b2"], mlp["w3"], mlp["b3"],
                    out_dtype=out_dtype)

"""Fused decode kernel v3: the two-stage split (measured design point).

v3 splits the decode: XLA computes the folded first-layer accumulator
(nearest-upsample of P + multilinear C1 + separable PE,
``nic.grids.fastdecode.first_layer_acc``), and the Pallas kernel is ONLY
the H-lane MLP tail: GELU → W2 (MXU) → GELU → W3 → sigmoid, pipelined
over pixel blocks of the [S², H] accumulator.

The trade is explicit: the accumulator (S²·H floats — 67 MB at 512²,
1 GB at 2048²) materializes through HBM instead of staying VMEM-resident
as in the fully-fused v2 rev2 (`decode_fused_v2.py` — the production
backend, which beats this split AND the XLA graphs; see BASELINE.md's
round-2 decode table). v3 is kept as the measured intermediate design
point between "all XLA" and "one fused kernel", and as the minimal demo
of the advancing-window rule below.

(Historical note: rev 1 of v2 measured 4 orders of magnitude below XLA;
the round-2 bisect attributed that to NON-ADVANCING operand windows,
not Mosaic relayouts.)
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
    h = _gelu_exact(acc_ref[:, :].astype(acc_dtype))
    dtype = w2_ref.dtype
    h = jnp.dot(h.astype(dtype), w2_ref[:, :], preferred_element_type=acc_dtype)
    h = _gelu_exact(h + b2_ref[0:1, :].astype(acc_dtype))
    h = jnp.dot(h.astype(dtype), w3_ref[:, :], preferred_element_type=acc_dtype)
    rgb = jax.nn.sigmoid(h + b3_ref[0:1, :].astype(acc_dtype))
    out_ref[:, :] = rgb.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "out_dtype"))
def mlp_tail(acc, w2, b2, w3, b3, *, block: int = 4096, out_dtype=jnp.float32):
    """[S, S, H] pre-GELU accumulator → [S, S, 3] pixels via a Pallas
    pipeline over 1-D pixel blocks of the flattened [S², H] view
    (GELU → W2 → GELU → W3 → sigmoid).

    Two layout rules, both load-bearing on this chip (round-2 bisect):

    - 2-D windows tile the VMEM (8, 128) lanes cleanly; 3-D
      [rows, S, H] windows lane-pad the H and RGB axes to 128 and blow
      VMEM at S ≥ 512. block=4096 keeps the double-buffered windows
      within the 16 MB scoped-VMEM limit.
    - Every operand's window must ADVANCE with the grid index. A
      non-advancing (constant index_map) window — however the spec is
      written — costs ~0.5 ms of serialization PER GRID STEP on this
      toolchain (measured: a no-op copy kernel goes 0.04 ms → 33 ms the
      moment one constant-window operand is added; this is the root
      cause of v1/v2's "4 orders of magnitude" slowdown). So the MLP
      params are tiled ``steps``× along axis 0 and every window strides
      by its block — the re-read is ≤16 KB/step, noise next to the
      accumulator stream."""
    s, cols, hidden = acc.shape
    n = s * cols
    while n % block:
        block //= 2
    steps = n // block
    kernel = functools.partial(_kernel, acc_dtype=jnp.float32)
    tile = lambda a: jnp.tile(a, (steps, 1))
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((block, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 3), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (hidden * hidden + hidden * 3),
            bytes_accessed=n * hidden * acc.dtype.itemsize + n * 3 * 4,
            transcendentals=2 * n * hidden,
        ),
    )(acc.reshape(n, hidden), tile(w2),
      jnp.tile(b2.reshape(1, -1), (steps * 8, 1)),
      tile(w3), jnp.tile(b3.reshape(1, -1), (steps * 8, 1)))
    return out.reshape(s, cols, 3)


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

"""Conv / transposed-conv implemented as explicit im2col + MXU matmuls.

Motivation (see NOTES_r1.md): on this image's experimental TPU backend the
conv-AE converges ~8× worse in loss than the SAME code on CPU, across
seeds, learning rates, optimizers, and matmul-precision settings — the
conv/conv-grad lowering is the remaining suspect. These modules express
the identical math through pad/slice/concat + ``jnp.dot`` only (the MXU
path with well-defined ``preferred_element_type=float32`` accumulation),
avoiding the convolution primitive entirely.

- :class:`MatmulConv`: k×k, stride s, torch-style symmetric padding —
  patches are gathered as k² strided slices and contracted in one dot.
- :class:`MatmulConvTranspose`: torch ConvTranspose(k, s, p, op) via
  zero-insertion upsampling followed by a stride-1 MatmulConv with the
  flipped kernel (the textbook equivalence), so shapes match
  nic.models.autoencoder exactly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["MatmulConv", "MatmulConvTranspose"]


import itertools


def _im2col(x, k: int, stride: int, pad_lo: int, pad_hi: int):
    """[B, *spatial, C] → [B, *out_spatial, kⁿ·C] patches (torch conv
    geometry), for 2D or 3D spatial dims."""
    ndim = x.ndim - 2
    pad = ((0, 0),) + ((pad_lo, pad_hi),) * ndim + ((0, 0),)
    x = jnp.pad(x, pad)
    outs = [(x.shape[1 + d] - k) // stride + 1 for d in range(ndim)]
    parts = []
    for offs in itertools.product(range(k), repeat=ndim):
        sl = [slice(None)]
        for d, o in enumerate(offs):
            sl.append(slice(o, o + (outs[d] - 1) * stride + 1, stride))
        sl.append(slice(None))
        parts.append(x[tuple(sl)])
    return jnp.concatenate(parts, axis=-1)  # [B, *out, kⁿ·C]


class MatmulConv(nn.Module):
    """n-D (2D/3D) conv as im2col + dot; torch-style symmetric padding."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        ndim = x.ndim - 2
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel**ndim * c_in, self.features), self.dtype,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), self.dtype)
        patches = _im2col(x.astype(self.dtype), self.kernel, self.stride,
                          self.padding, self.padding)
        return jnp.dot(patches, w, preferred_element_type=jnp.float32).astype(
            self.dtype
        ) + b


class MatmulConvTranspose(nn.Module):
    """torch ConvTranspose(k, s, p, output_padding=op) ≡ insert (s−1) zeros
    between inputs, pad (k−1−p) [+op on the high side], stride-1 conv."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        ndim = x.ndim - 2
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel**ndim * c_in, self.features), self.dtype,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), self.dtype)
        s = self.stride
        up_shape = (x.shape[0],) + tuple(
            (x.shape[1 + d] - 1) * s + 1 for d in range(ndim)
        ) + (c_in,)
        up = jnp.zeros(up_shape, x.dtype)
        idx = (slice(None),) + (slice(None, None, s),) * ndim + (slice(None),)
        up = up.at[idx].set(x)
        pad_lo = self.kernel - 1 - self.padding
        pad_hi = pad_lo + self.output_padding
        pad = ((0, 0),) + ((pad_lo, pad_hi),) * ndim + ((0, 0),)
        up = jnp.pad(up, pad)
        patches = _im2col(up.astype(self.dtype), self.kernel, 1, 0, 0)
        return jnp.dot(patches, w, preferred_element_type=jnp.float32).astype(
            self.dtype
        ) + b

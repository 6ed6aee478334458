"""Folded-first-layer decode must equal the standard path exactly
(to float rounding), across mips, methods, and dims."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nic.grids.fastdecode import fast_decode
from nic.grids.pyramid import create_pyramid, pyramid_mip_levels
from nic.grids.sample import decoder_input
from nic.models.mlp import apply_mlp, init_mlp


def _standard(fp, mlp, mip, image_size, m2l, pe, ndim, use_tri_pe, sparse):
    fl = m2l[mip]
    step = 2.0 ** (mip - (fl + 1) * 2)
    n = image_size // (2**mip)
    x = decoder_input(
        fp, fl, jnp.zeros((ndim,), jnp.int32), step, n,
        pe_channels=pe, mip_level=mip, ndim=ndim, use_tri_pe=use_tri_pe,
        sparse_g0=sparse,
    )
    return apply_mlp(mlp, x).reshape((n,) * ndim + (3,))


@pytest.mark.parametrize("use_tri_pe", [True, False])
@pytest.mark.parametrize("mip", [0, 1, 2, 3, 4])
def test_fast_decode_2d_exact(mip, use_tri_pe):
    image_size, base, c, pe = 64, 16, 4, 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    fp, _ = create_pyramid(k1, base, c, 8, ndim=2)
    m2l = pyramid_mip_levels(image_size, base)
    mlp = init_mlp(k2, c * 5 + pe * 2 + 1, 16, 3)
    want = np.asarray(_standard(fp, mlp, mip, image_size, m2l, pe, 2, use_tri_pe, False))
    got = np.asarray(
        fast_decode(fp, mlp, mip, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, use_tri_pe=use_tri_pe, ndim=2)
    )
    np.testing.assert_allclose(got, want, atol=3e-6)


@pytest.mark.parametrize("sparse", [False, True])
@pytest.mark.parametrize("mip", [0, 2, 3])
def test_fast_decode_3d_exact(mip, sparse):
    image_size, base, c, pe = 16, 4, 2, 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    fp, _ = create_pyramid(k1, base, c, 8, ndim=3)
    m2l = pyramid_mip_levels(image_size, base)
    g0_corners = 4 if sparse else 8
    mlp = init_mlp(k2, c * (g0_corners + 1) + pe * 3 + 1, 16, 3)
    use_tri = not sparse
    want = np.asarray(_standard(fp, mlp, mip, image_size, m2l, pe, 3, use_tri, sparse))
    got = np.asarray(
        fast_decode(fp, mlp, mip, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, use_tri_pe=use_tri, ndim=3, sparse_g0=sparse)
    )
    np.testing.assert_allclose(got, want, atol=3e-6)


def test_fast_decode_tile():
    image_size, base, c, pe = 32, 8, 4, 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    fp, _ = create_pyramid(k1, base, c, 8, ndim=2, no_mip=True)
    m2l = pyramid_mip_levels(image_size, base, no_mip=True)
    mlp = init_mlp(k2, c * 5 + pe * 2 + 1, 16, 3)
    whole = np.asarray(
        fast_decode(fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, ndim=2)
    )
    tile = np.asarray(
        fast_decode(fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, ndim=2, origin=(16, 8), n=16)
    )
    np.testing.assert_allclose(tile, whole[16:32, 8:24], atol=1e-6)

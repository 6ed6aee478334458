"""Tests for nic.grids.pyramid vs reference pyramid structure
(fp_def.py:8-78, :227-268)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nic.core.quant import quant_range
from nic.grids import pyramid
import reference_oracle as oracle


@pytest.mark.parametrize("base", [16, 64, 128, 256])
def test_levels(base):
    assert pyramid.pyramid_levels(base) == oracle.pyramid_levels(base)


def test_levels_values():
    # (log2+1)//2: 128 → (7+1)//2 = 4 levels; 64 → 3; 16 → 2
    assert pyramid.pyramid_levels(128) == 4
    assert pyramid.pyramid_levels(64) == 3
    assert pyramid.pyramid_levels(16) == 2


@pytest.mark.parametrize("no_mip", [False, True])
def test_mip_levels_dict(no_mip):
    got = pyramid.pyramid_mip_levels(512, 128, no_mip)
    want = oracle.mip_levels_dict(512, 128, no_mip)
    assert got == want
    assert set(got) == set(range(10))  # mips 0..9 for a 512 image
    if not no_mip:
        assert got[0] == 0 and got[1] == 0 and got[2] == 0
        assert got[4] == 1 and got[9] == 3  # clamped to levels-1


@pytest.mark.parametrize("ndim", [2, 3])
def test_create_pyramid_shapes_and_range(ndim):
    base = 32 if ndim == 3 else 128
    bits = 4
    fp, levels = pyramid.create_pyramid(
        jax.random.PRNGKey(0), base, channels=12, num_bits=bits, ndim=ndim
    )
    assert levels == pyramid.pyramid_levels(base)
    assert len(fp) == 2 * levels
    q_min, q_max = quant_range(bits)
    for i, g in enumerate(fp):
        s = base // (2**i)
        assert g.shape == (12,) + (s + 1,) * ndim
        assert float(g.min()) >= q_min and float(g.max()) <= q_max


def test_no_mip_single_level():
    fp, levels = pyramid.create_pyramid(
        jax.random.PRNGKey(0), 128, 12, 8, ndim=2, no_mip=True
    )
    assert levels == 1 and len(fp) == 2
    assert fp[0].shape == (12, 129, 129)
    assert fp[1].shape == (12, 65, 65)  # G1 at half resolution


def test_clamp_only_active_pair():
    fp, _ = pyramid.create_pyramid(jax.random.PRNGKey(1), 64, 4, 2, ndim=2)
    hot = tuple(g + 10.0 for g in fp)  # blow past the range
    clamped = pyramid.pyramid_clamp(hot, fl=1, num_bits=2)
    q_min, q_max = quant_range(2)
    assert float(clamped[2].max()) <= q_max and float(clamped[3].max()) <= q_max
    # other levels untouched
    assert float(clamped[0].max()) > q_max


def test_quantize_pack_unpack_roundtrip():
    bits = 4
    fp, _ = pyramid.create_pyramid(jax.random.PRNGKey(2), 64, 6, bits, ndim=2)
    fq = pyramid.pyramid_quantize_all(fp, bits)
    codes = pyramid.pyramid_pack(fq, bits)
    for c in codes:
        assert c.dtype == jnp.uint8
        assert int(np.asarray(c).max()) <= 2**bits - 1
    back = pyramid.pyramid_unpack(codes, bits)
    for a, b in zip(back, fq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bpp_accounting():
    fp, _ = pyramid.create_pyramid(jax.random.PRNGKey(3), 128, 12, 4, ndim=2, no_mip=True)
    n = 12 * (129 * 129 + 65 * 65)
    assert pyramid.pyramid_num_elements(fp) == n
    assert pyramid.pyramid_bits(fp, 4) == 4 * n

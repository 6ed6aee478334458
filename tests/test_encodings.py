"""Golden-value tests for nic.core.encodings vs reference PE formulas
(utils.py:198-227)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nic.core import encodings
import reference_oracle as oracle


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("nc", [4, 6, 8])
def test_sinusoidal_matches_oracle(dim, nc):
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 64, size=(dim, 37))
    got = np.asarray(encodings.sinusoidal_pe(jnp.asarray(coords, jnp.float32), nc))
    want = oracle.sinusoidal_pe(coords, nc)
    assert got.shape == (nc * dim, 37)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("nc", [4, 6, 8])
def test_triangular_matches_oracle(dim, nc):
    rng = np.random.default_rng(1)
    coords = rng.uniform(0, 64, size=(dim, 41))
    got = np.asarray(encodings.triangular_pe(jnp.asarray(coords, jnp.float32), nc))
    want = oracle.triangular_pe(coords, nc)
    assert got.shape == (nc * dim, 41)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_triangular_top_row_zero():
    # the reference skips the (octave 0, offset 0.5) slot: row nc-1 of every
    # dimension block stays zero (utils.py:219-220)
    nc = 6
    coords = jnp.asarray(np.random.default_rng(2).uniform(0, 8, (2, 13)), jnp.float32)
    pe = np.asarray(encodings.triangular_pe(coords, nc))
    np.testing.assert_allclose(pe[nc - 1], 0.0)
    np.testing.assert_allclose(pe[2 * nc - 1], 0.0)
    # all other rows nonzero somewhere
    assert np.all(np.abs(pe[: nc - 1]).max(axis=1) > 0)


def test_tri_wave_shape():
    x = jnp.asarray([0.0, 0.5, 1.0, 1.5, 2.0])
    np.testing.assert_allclose(
        np.asarray(encodings.tri(x, offset=0.0)), [1.0, 0.0, -1.0, 0.0, 1.0], atol=1e-6
    )


def test_triangular_pe_gather_2d_matches_oracle():
    """Gather-based tri-PE variants (utils.py:230-284, the test14.py
    lineage): LUT rows vs a NumPy transcription, and the 2-D gather at a
    non-zero window start."""
    import jax.numpy as jnp

    from nic.core.encodings import (convert_coordinate_start,
                                    triangular_pe_gather_2d,
                                    triangular_pe_table)

    def np_tri(x, offset):
        return 2 * np.abs((x - offset) % 2 - 1) - 1

    x = np.arange(8, dtype=np.float32)
    rows = []
    for octave in range(3):
        for i, off in enumerate((0.0, 0.5)):
            if octave == 0 and i == 1:
                continue
            rows.append(np_tri(x / 2**octave, off))
    rows.append(np.zeros(8, np.float32))
    oracle_table = np.stack(rows)
    np.testing.assert_allclose(np.asarray(triangular_pe_table()),
                               oracle_table, atol=1e-6)

    coords = jnp.asarray([[0, 0], [3, 5]])
    pe = np.asarray(triangular_pe_gather_2d(coords, 4, 4))
    assert pe.shape == (2, 12, 4, 4)
    fx, fy = convert_coordinate_start(coords, 4, 4)
    for b in range(2):
        exp_x = oracle_table[:, np.asarray(fx)[b] % 8].reshape(6, 4, 4)
        exp_y = oracle_table[:, np.asarray(fy)[b] % 8].reshape(6, 4, 4)
        np.testing.assert_allclose(pe[b, :6], exp_x, atol=1e-6)
        np.testing.assert_allclose(pe[b, 6:], exp_y, atol=1e-6)

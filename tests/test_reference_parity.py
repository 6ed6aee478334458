"""DIRECT parity tests against the PyTorch reference implementation.

These import the reference's library modules (models.py / utils.py /
fp_def.py of 21K1113/Neural_Image_Compression_V2) straight from the
read-only mount and compare nic's outputs against them numerically — a
stronger check than the transcribed NumPy oracle. Skipped wholesale when
the reference mount (or torch) is unavailable, so the repo stays
standalone.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/Projects"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not available"
)


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        import models as ref_models  # noqa
        import fp_def as ref_fp  # noqa
        import utils as ref_utils  # noqa
    except Exception as e:  # sympy etc. missing
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)

    class R:
        pass

    R.torch = torch
    R.models = ref_models
    R.fp = ref_fp
    R.utils = ref_utils
    return R


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_quantize_bitexact(ref, bits):
    import jax.numpy as jnp

    from nic.core.quant import quantize

    x = np.random.default_rng(0).uniform(0, 1, 4096).astype(np.float32)
    want = ref.models.quantize_torch(ref.torch.tensor(x), bits).numpy()
    got = np.asarray(quantize(jnp.asarray(x), bits))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_save_load4fp_bitexact(ref, bits):
    import jax.numpy as jnp

    from nic.core.quant import pack_grid, unpack_grid, quant_range

    q_min, q_max = quant_range(bits)
    x = np.random.default_rng(1).uniform(q_min, q_max, 4096).astype(np.float32)
    want_codes = ref.models.save4fp(ref.torch.tensor(x), bits, ref.torch.uint8).numpy()
    got_codes = np.asarray(pack_grid(jnp.asarray(x), bits))
    np.testing.assert_array_equal(got_codes, want_codes)
    want_back = ref.models.load4fp(ref.torch.tensor(want_codes), bits, ref.torch.float32).numpy()
    got_back = np.asarray(unpack_grid(jnp.asarray(got_codes), bits))
    np.testing.assert_allclose(got_back, want_back, atol=1e-7)


@pytest.mark.parametrize("nc", [4, 6])
@pytest.mark.parametrize("dim", [2, 3])
def test_triangular_pe_parity(ref, nc, dim):
    import jax.numpy as jnp

    from nic.core.encodings import triangular_pe

    coords = np.random.default_rng(2).uniform(0, 32, (dim, 97)).astype(np.float32)
    want = ref.utils.triangular_positional_encoding(
        ref.torch.tensor(coords), nc, "cpu", ref.torch.float32
    ).numpy()
    got = np.asarray(triangular_pe(jnp.asarray(coords), nc))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("nc", [4, 6])
@pytest.mark.parametrize("dim", [2, 3])
def test_sinusoidal_pe_parity(ref, nc, dim):
    import jax.numpy as jnp

    from nic.core.encodings import sinusoidal_pe

    coords = np.random.default_rng(3).uniform(0, 32, (dim, 83)).astype(np.float32)
    want = ref.utils.positional_encoding(
        tuple(ref.torch.tensor(coords[d]) for d in range(dim)), nc, "cpu",
        ref.torch.float32,
    ).numpy()
    got = np.asarray(sinusoidal_pe(jnp.asarray(coords), nc))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pyramid_structure_parity(ref):
    from nic.grids.pyramid import pyramid_levels, pyramid_mip_levels

    for base in (16, 32, 64, 128, 256):
        assert pyramid_levels(base) == ref.fp.return_pyramid_levels(base)
    for (img, base) in ((512, 128), (64, 16)):
        want = dict(ref.fp.create_pyramid_mip_levels(img, base))
        got = pyramid_mip_levels(img, base)
        assert got == want


@pytest.mark.parametrize("step,n,origin", [
    (0.25, 6, (0, 0)), (0.25, 4, (3, 5)), (0.5, 4, (2, 7)),
    (1.0, 4, (1, 2)), (2.0, 3, (0, 1)), (4.0, 2, (0, 0)),
])
@pytest.mark.parametrize("use_tri_pe", [True, False])
def test_create_g0_g1_parity(ref, step, n, origin, use_tri_pe):
    """Full decoder-input block vs the reference's create_g0_g1 + concat
    (image_compression.py:94-95 layout), under the documented grid
    transpose (reference gathers fp[:, y, x])."""
    import jax.numpy as jnp

    from nic.grids.sample import decoder_input

    torch = ref.torch
    rng = np.random.default_rng(4)
    base, c, pe, fl = 64, 3, 6, 0
    fp_np = []
    for i in range(4):
        s = base // (2**i)
        fp_np.append(rng.uniform(-0.4, 0.5, (c, s + 1, s + 1)).astype(np.float32))
    fp_t = [torch.tensor(g) for g in fp_np]

    x0, y0 = origin
    xr = torch.arange(n, dtype=torch.float32)
    outs = ref.fp.create_g0_g1(
        fp_t, fl, torch.tensor(float(x0)), torch.tensor(float(y0)), step,
        xr, xr.clone(), pe, "cpu", torch.float32, use_tri_pe,
    )
    g0_parts = [o.numpy() for o in outs[:4]]
    g1_sum = sum(o.numpy() for o in outs[4:8])
    pe_feat = outs[8].numpy()
    want = np.concatenate(g0_parts + [g1_sum, pe_feat], axis=0).T  # [n², F-1]

    nic_fp = tuple(jnp.asarray(g.transpose(0, 2, 1)) for g in fp_np)
    got = np.asarray(decoder_input(
        nic_fp, fl, jnp.asarray([x0, y0]), step, n, pe_channels=pe,
        mip_level=0, ndim=2, use_tri_pe=use_tri_pe,
    ))
    np.testing.assert_allclose(got[:, :-1], want, atol=2e-5)

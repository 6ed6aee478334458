"""Golden parity tests for nic.grids.sample vs the reference's gather+interp
math (fp_def.py:81-223, image_compression.py:71-211), via the NumPy oracle.

Convention note: nic grids index (coord0, coord1[, coord2]) on axes 1..;
the reference gathers fp[:, y, x] / fp[:, z, y, x] — so oracle grids are
transposed on the spatial axes before being handed to nic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nic.grids import sample
import reference_oracle as oracle


def _mk_pyramid_2d(rng, base, channels, levels):
    fp = []
    for i in range(levels * 2):
        s = base // (2**i)
        fp.append(rng.uniform(-0.4, 0.5, size=(channels, s + 1, s + 1)))
    return fp


def _mk_pyramid_3d(rng, base, channels, levels):
    fp = []
    for i in range(levels * 2):
        s = base // (2**i)
        fp.append(rng.uniform(-0.4, 0.5, size=(channels, s + 1, s + 1, s + 1)))
    return fp


def _nic_fp_2d(fp):
    return tuple(jnp.asarray(g.transpose(0, 2, 1), jnp.float64) for g in fp)


def _nic_fp_3d(fp):
    return tuple(jnp.asarray(g.transpose(0, 3, 2, 1), jnp.float64) for g in fp)


# step values that occur in practice: 2^(mip - (fl+1)*2) ∈ {0.25, 0.5, 1, 2, 4}
@pytest.mark.parametrize(
    "fl,step,n,origin",
    [
        (0, 0.25, 8, (0, 0)),
        (0, 0.25, 4, (3, 5)),
        (0, 0.5, 4, (2, 7)),
        (0, 1.0, 4, (1, 2)),
        (0, 2.0, 3, (0, 1)),  # the unweighted-sum quirk (step == 2)
        (1, 0.25, 4, (2, 1)),
        (1, 4.0, 2, (0, 0)),
    ],
)
@pytest.mark.parametrize("use_tri_pe", [True, False])
def test_decoder_input_2d_matches_oracle(fl, step, n, origin, use_tri_pe):
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(42)
        base = 64
        fp = _mk_pyramid_2d(rng, base, channels=3, levels=2)
        want = oracle.create_g0_g1_2d(
            fp, fl, origin[0], origin[1], step, n, pe_channels=6, use_tri_pe=use_tri_pe
        )
        got = sample.decoder_input(
            _nic_fp_2d(fp),
            fl,
            jnp.asarray(origin),
            step,
            n,
            pe_channels=6,
            mip_level=3,
            ndim=2,
            use_tri_pe=use_tri_pe,
            dtype=jnp.float64,
        )
        got = np.asarray(got)
        assert got.shape == (n * n, 3 * 5 + 6 * 2 + 1)
        np.testing.assert_allclose(got[:, -1], 3.0)  # lod plane
        np.testing.assert_allclose(got[:, :-1], want, atol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize(
    "fl,step,n,origin,sparse",
    [
        (0, 0.25, 3, (0, 1, 2), False),
        (0, 1.0, 2, (1, 0, 3), False),
        (0, 2.0, 2, (0, 1, 0), False),  # quirk in 3D
        (0, 0.25, 3, (2, 0, 1), True),  # method 4: sparse G0 + sinusoidal PE
        (1, 0.25, 2, (1, 1, 1), True),
    ],
)
def test_decoder_input_3d_matches_oracle(fl, step, n, origin, sparse):
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(7)
        base = 16
        fp = _mk_pyramid_3d(rng, base, channels=2, levels=2)
        want = oracle.create_g0_g1_3d(
            fp, fl, origin, step, n, pe_channels=4, sparse_g0=sparse
        )
        got = sample.decoder_input(
            _nic_fp_3d(fp),
            fl,
            jnp.asarray(origin),
            step,
            n,
            pe_channels=4,
            mip_level=1,
            ndim=3,
            use_tri_pe=not sparse,  # method 4 hardcodes sinusoidal PE
            sparse_g0=sparse,
            dtype=jnp.float64,
        )
        got = np.asarray(got)
        g0_corners = 4 if sparse else 8
        assert got.shape == (n**3, 2 * (g0_corners + 1) + 4 * 3 + 1)
        np.testing.assert_allclose(got[:, :-1], want, atol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_decoder_input_jit_vmap_grad():
    """The sampler must compose with jit / vmap-over-crops / grad-to-grids."""
    fp_np = _mk_pyramid_2d(np.random.default_rng(0), 64, 4, 2)
    fp = tuple(jnp.asarray(g, jnp.float32) for g in fp_np)
    origins = jnp.asarray([[0, 0], [3, 1], [5, 5]])

    def batch_input(fp, origins):
        f = lambda o: sample.decoder_input(
            fp, 0, o, 0.25, 4, pe_channels=6, mip_level=0, ndim=2
        )
        return jax.vmap(f)(origins)

    out = jax.jit(batch_input)(fp, origins)
    assert out.shape == (3, 16, 4 * 5 + 12 + 1)

    def loss(fp):
        return jnp.sum(batch_input(fp, origins) ** 2)

    grads = jax.grad(loss)(fp)
    # G0/G1 of level 0 receive gradient; level 1 stays zero
    assert float(jnp.abs(grads[0]).max()) > 0
    assert float(jnp.abs(grads[1]).max()) > 0
    assert float(jnp.abs(grads[2]).max()) == 0
    assert float(jnp.abs(grads[3]).max()) == 0


def test_g1_quirk_flag():
    """TF_G1_QUIRK=False applies bilinear weights even at step==2 (the
    suspected-intended behavior, readme.md:7); True = reference parity."""
    import jax.numpy as jnp
    from nic.grids import sample

    fp_np = _mk_pyramid_2d(np.random.default_rng(3), 64, 3, 2)
    fp = tuple(jnp.asarray(g, jnp.float32) for g in fp_np)
    kw = dict(pe_channels=4, mip_level=3, ndim=2)
    a = np.asarray(sample.decoder_input(fp, 0, jnp.asarray([0, 1]), 2.0, 3,
                                        g1_quirk=True, **kw))
    b = np.asarray(sample.decoder_input(fp, 0, jnp.asarray([0, 1]), 2.0, 3,
                                        g1_quirk=False, **kw))
    # G1 block (features 4C..5C) differs: raw 4-sum vs weighted (= corner 00)
    c = 3
    assert np.abs(a[:, 4 * c : 5 * c] - b[:, 4 * c : 5 * c]).max() > 1e-3
    # G0 blocks identical
    np.testing.assert_allclose(a[:, : 4 * c], b[:, : 4 * c])


@pytest.mark.parametrize("ndim,sparse,step,n,origin", [
    (2, False, 2.0, 8, (1, 2)),
    (2, False, 1.0, 16, (3, 5)),
    (2, False, 0.25, 16, (2, 9)),
    (2, False, 0.0625, 32, (11, 3)),
    (3, False, 0.5, 8, (3, 1, 0)),
    (3, True, 0.25, 8, (2, 5, 7)),
])
def test_lattice_path_bit_matches_take(ndim, sparse, step, n, origin):
    """The scatter-free crop-lattice sampler (corner_features_lattice,
    opt-in — measured slower than take/scatter on chip, kept as a
    documented negative) must be BIT-identical to the take path in both
    forward values and grid gradients (its VJP is dense slice/repeat
    transposes instead of scatter-adds)."""
    import jax
    import jax.numpy as jnp
    from nic.grids import sample

    if ndim == 2:
        fp_np = _mk_pyramid_2d(np.random.default_rng(5), 64, 4, 2)
    else:
        fp_np = _mk_pyramid_3d(np.random.default_rng(5), 16, 3, 2)
    fp = tuple(jnp.asarray(g, jnp.float32) for g in fp_np)
    o = jnp.asarray(origin, jnp.int32)
    kw = dict(pe_channels=4, mip_level=0, ndim=ndim, sparse_g0=sparse,
              use_tri_pe=not sparse)

    a = sample.decoder_input(fp, 0, o, step, n, lattice=True, **kw)
    b = sample.decoder_input(fp, 0, o, step, n, lattice=False, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(fpp, lat):
        x = sample.decoder_input(fpp, 0, o, step, n, lattice=lat, **kw)
        return jnp.sum(x * x * 0.5)

    ga = jax.grad(lambda f: loss(f, True))(fp)
    gb = jax.grad(lambda f: loss(f, False))(fp)
    for x, y in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("ndim,sparse,step,n,origins", [
    (2, False, 2.0, 8, [(1, 2), (0, 0), (8, 8)]),
    (2, False, 1.0, 16, [(3, 5), (0, 48), (48, 48)]),
    (2, False, 0.25, 16, [(2, 9), (0, 0), (240, 240), (239, 1)]),
    (2, False, 0.0625, 32, [(11, 3), (0, 992), (992, 992)]),
    (3, False, 0.5, 8, [(3, 1, 0), (24, 24, 24)]),
    (3, True, 0.25, 8, [(2, 5, 7), (0, 0, 0), (56, 56, 56)]),
    (2, False, 0.5, 16, [(7, 0), (112, 112)]),
])
def test_dense_vjp_matches_take(ndim, sparse, step, n, origins):
    """grid_vjp="dense" (take forward + hand-written phase-reshape-sum
    backward, _axis_take_dense_vjp) must match the autodiff take path:
    forward BIT-identical, gradients to summation-order rounding — across
    steps >=1 and <1, 2D/3D, sparse G0, interior AND boundary origins
    (the dynamic_update_slice placement must never clamp-shift)."""
    import jax
    import jax.numpy as jnp
    from nic.grids import sample

    if ndim == 2:
        fp_np = _mk_pyramid_2d(np.random.default_rng(7), 64, 4, 2)
    else:
        fp_np = _mk_pyramid_3d(np.random.default_rng(7), 16, 3, 2)
    fp = tuple(jnp.asarray(g, jnp.float32) for g in fp_np)
    kw = dict(pe_channels=4, mip_level=0, ndim=ndim, sparse_g0=sparse,
              use_tri_pe=not sparse)

    for origin in origins:
        o = jnp.asarray(origin, jnp.int32)
        a = sample.decoder_input(fp, 0, o, step, n, grid_vjp="dense", **kw)
        b = sample.decoder_input(fp, 0, o, step, n, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        def loss(fpp, vjp, o=o):
            x = sample.decoder_input(fpp, 0, o, step, n, grid_vjp=vjp, **kw)
            return jnp.sum(x * x * 0.5)

        ga = jax.grad(lambda f: loss(f, "dense"))(fp)
        gb = jax.grad(lambda f: loss(f, "scatter"))(fp)
        for x, y in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-6)


def test_dense_vjp_under_vmap():
    """The custom-vjp take must batch correctly under vmap over crop
    origins (the trainer's shape), including through jax.grad."""
    import jax
    import jax.numpy as jnp
    from nic.grids import sample

    fp_np = _mk_pyramid_2d(np.random.default_rng(11), 64, 4, 2)
    fp = tuple(jnp.asarray(g, jnp.float32) for g in fp_np)
    kw = dict(pe_channels=4, mip_level=0, ndim=2, sparse_g0=False,
              use_tri_pe=True)
    origins = jnp.asarray([[2, 9], [0, 0], [240, 240], [17, 133]], jnp.int32)
    step, n = 0.25, 16

    def batch(fpp, vjp):
        def one(o):
            return sample.decoder_input(fpp, 0, o, step, n, grid_vjp=vjp,
                                        **kw)
        return jax.vmap(one)(origins)

    a = batch(fp, "dense")
    b = batch(fp, "scatter")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ga = jax.grad(lambda f: jnp.sum(batch(f, "dense") ** 2))(fp)
    gb = jax.grad(lambda f: jnp.sum(batch(f, "scatter") ** 2))(fp)
    for x, y in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-6)

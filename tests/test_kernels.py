"""Fused Pallas decode kernel vs the XLA reference path (interpret mode on
CPU; the real-TPU numbers come from bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from nic.grids.pyramid import create_pyramid, pyramid_mip_levels
from nic.grids.sample import decoder_input
from nic.kernels.decode_fused import decode_image_fused
from nic.models.mlp import apply_mlp, init_mlp


def _xla_decode(fp, mlp, mip, image_size, mip_to_level, pe_channels, use_tri_pe):
    fl = mip_to_level[mip]
    step = 2.0 ** (mip - (fl + 1) * 2)
    n = image_size // (2**mip)
    x = decoder_input(
        fp, fl, jnp.zeros((2,), jnp.int32), step, n,
        pe_channels=pe_channels, mip_level=mip, ndim=2, use_tri_pe=use_tri_pe,
    )
    return apply_mlp(mlp, x).reshape(n, n, 3)


@pytest.mark.parametrize("use_tri_pe", [True, False])
@pytest.mark.parametrize("mip", [0, 1, 2, 3, 4])
def test_fused_matches_xla_across_mips(mip, use_tri_pe):
    """Covers e = mip - (fl+1)*2 ∈ {-2, -1, 0, 1 (quirk), 0 (fl=1)}."""
    image_size = 64
    base = image_size // 4  # 16 → 2 pyramid levels
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    fp, levels = create_pyramid(k1, base, channels=4, num_bits=8, ndim=2)
    assert levels == 2
    mip_to_level = pyramid_mip_levels(image_size, base)
    pe = 4
    mlp = init_mlp(k2, 4 * 5 + pe * 2 + 1, 16, 3)

    want = np.asarray(
        _xla_decode(fp, mlp, mip, image_size, mip_to_level, pe, use_tri_pe)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            decode_image_fused(
                fp, mlp, mip, image_size=image_size, mip_to_level=mip_to_level,
                pe_channels=pe, use_tri_pe=use_tri_pe,
            )
        )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_multiblock_grid():
    """decode_size larger than one row-block → multiple kernel programs."""
    image_size = 128
    base = 32
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    fp, _ = create_pyramid(k1, base, channels=4, num_bits=8, ndim=2, no_mip=True)
    mip_to_level = pyramid_mip_levels(image_size, base, no_mip=True)
    pe = 6
    mlp = init_mlp(k2, 4 * 5 + pe * 2 + 1, 16, 3)
    want = np.asarray(_xla_decode(fp, mlp, 0, image_size, mip_to_level, pe, True))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            decode_image_fused(
                fp, mlp, 0, image_size=image_size, mip_to_level=mip_to_level,
                pe_channels=pe, use_tri_pe=True,
            )
        )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("use_tri_pe", [True, False])
@pytest.mark.parametrize("mip", [0, 1, 2, 3, 4])
def test_fused_v2_matches_fastdecode(mip, use_tri_pe):
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_v2 import decode_image_fused_v2

    image_size, base, c, pe = 64, 16, 4, 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    fp, _ = create_pyramid(k1, base, c, 8, ndim=2)
    m2l = pyramid_mip_levels(image_size, base)
    mlp = init_mlp(k2, c * 5 + pe * 2 + 1, 16, 3)
    want = np.asarray(
        fast_decode(fp, mlp, mip, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, use_tri_pe=use_tri_pe, ndim=2)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            decode_image_fused_v2(
                fp, mlp, mip, image_size=image_size, mip_to_level=m2l,
                pe_channels=pe, use_tri_pe=use_tri_pe,
            )
        )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_v2_multiblock():
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_v2 import decode_image_fused_v2

    image_size, base = 128, 32
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    fp, _ = create_pyramid(k1, base, 4, 8, ndim=2, no_mip=True)
    m2l = pyramid_mip_levels(image_size, base, no_mip=True)
    mlp = init_mlp(k2, 4 * 5 + 6 * 2 + 1, 16, 3)
    want = np.asarray(
        fast_decode(fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=6, ndim=2)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            decode_image_fused_v2(
                fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                pe_channels=6,
            )
        )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_v3_matches_fast_decode():
    """v3 (XLA first-layer accumulator + Pallas MLP tail) must equal the
    folded XLA path exactly."""
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_v3 import decode_image_fused_v3

    image_size = 64
    base = image_size // 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    fp, _ = create_pyramid(k1, base, channels=4, num_bits=8, ndim=2)
    mip_to_level = pyramid_mip_levels(image_size, base)
    pe = 4
    mlp = init_mlp(k2, 4 * 5 + pe * 2 + 1, 16, 3)
    ref = np.asarray(fast_decode(
        fp, mlp, 0, image_size=image_size, mip_to_level=mip_to_level,
        pe_channels=pe, use_tri_pe=True, ndim=2,
    ))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(decode_image_fused_v3(
            fp, mlp, 0, image_size=image_size, mip_to_level=mip_to_level,
            pe_channels=pe, use_tri_pe=True,
        ))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("fast_gelu,tol", [
    ("tanh", 1e-3), ("poly", 1e-3),
    # erf routed through tanh: |Δgelu| ≤ 1.4e-6, so the decode must sit
    # in the exact-erf class (tolerance dominated by the fused pipeline's
    # own f32 rounding, not the GELU)
    ("tanherf", 2e-5),
])
def test_fused_v2_gelu_tanh_close(fast_gelu, tol):
    """The fast GELU modes must match the exact-erf path to well under
    one 8-bit quantization step (1/255 ≈ 4e-3); tanherf to exact-class
    tolerance."""
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_v2 import decode_image_fused_v2

    image_size, base, c, pe = 64, 16, 4, 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    fp, _ = create_pyramid(k1, base, c, 8, ndim=2, no_mip=True)
    m2l = pyramid_mip_levels(image_size, base, no_mip=True)
    mlp = init_mlp(k2, c * 5 + pe * 2 + 1, 16, 3)
    want = np.asarray(
        fast_decode(fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, ndim=2)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            decode_image_fused_v2(
                fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                pe_channels=pe, gelu=fast_gelu,
            )
        )
    assert np.abs(got - want).max() < tol


def test_trainer_pallas_backend_matches_fast():
    """NTCTrainer with DECODE_BACKEND=pallas must decode (bit-near) the
    same image as the fast XLA backend."""
    from nic.config import CompressionConfig
    from nic.train.ntc import NTCTrainer

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    outs = {}
    for backend in ("fast", "pallas"):
        cfg = CompressionConfig(
            image_size=32, crop_mip_level=4, num_crops=2, num_epochs=5,
            fp_bits=8, feature_pyramid_channels=4, pe_channels=4,
            hidden_layer_channels=16, tf_no_mip=True, seed=0,
            decode_backend=backend,
        )
        trainer = NTCTrainer(cfg, [img])
        with pltpu.force_tpu_interpret_mode():
            outs[backend] = np.asarray(trainer.decode(0, div_size=10))
    assert outs["fast"].shape == outs["pallas"].shape
    np.testing.assert_allclose(outs["pallas"], outs["fast"], atol=2e-5)


def test_fused_v2_lane_packed_path():
    """The lane-packed path (hidden=64 — the reference default and the
    benchmark config) must be exercised and bit-near the XLA path; a
    parity-axis swap in the packed untile would scramble columns."""
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_v2 import _call, decode_image_fused_v2

    image_size, base, c, pe, hidden = 128, 32, 12, 6, 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    fp, _ = create_pyramid(k1, base, c, 8, ndim=2, no_mip=True)
    m2l = pyramid_mip_levels(image_size, base, no_mip=True)
    mlp = init_mlp(k2, c * 5 + pe * 2 + 1, hidden, 3)
    want = np.asarray(
        fast_decode(fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, ndim=2)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            decode_image_fused_v2(
                fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                pe_channels=pe,
            )
        )
        # multi-column-block grid forces the packed retile path too
        got2 = np.asarray(
            decode_image_fused_v2(
                fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                pe_channels=pe, block_cols=64,
            )
        )
    # the eligibility gate must actually select the packed path here
    import nic.kernels.decode_fused_v2 as v2mod
    seen = {}
    orig = v2mod._call

    def spy(*a, **kw):
        seen["packed"] = kw.get("packed")
        return orig(*a, **kw)

    v2mod._call = spy
    try:
        with pltpu.force_tpu_interpret_mode():
            decode_image_fused_v2(
                fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                pe_channels=pe,
            )
    finally:
        v2mod._call = orig
    assert seen["packed"] is True
    np.testing.assert_allclose(got, want, atol=2e-5)
    np.testing.assert_allclose(got2, want, atol=2e-5)


@pytest.mark.parametrize("gelu", ["exact", "tanherf"])
def test_fused_v2_surgical_mode(gelu):
    """dtype="surgical" (round-5 directive #3): fp32 planes/windows with
    bf16 only at the MXU dots. Must sit within one u8 step of the fp32
    folded decode — far tighter than the all-bf16 plane pipeline's bound."""
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_v2 import decode_image_fused_v2

    image_size, base, c, pe, hidden = 128, 32, 12, 6, 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(21))
    fp, _ = create_pyramid(k1, base, c, 8, ndim=2, no_mip=True)
    m2l = pyramid_mip_levels(image_size, base, no_mip=True)
    mlp = init_mlp(k2, c * 5 + pe * 2 + 1, hidden, 3)
    want = np.asarray(
        fast_decode(fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, ndim=2)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            decode_image_fused_v2(
                fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                pe_channels=pe, dtype="surgical", gelu=gelu,
            )
        )
    u8 = lambda a: np.clip(a * 255 + 0.5, 0, 255).astype(np.int32)
    assert np.abs(got - want).max() < 2e-3  # bf16-dot rounding only
    assert np.abs(u8(got) - u8(want)).max() <= 1


@pytest.mark.parametrize("gelu", ["exact", "tanh"])
def test_fused_v2_i16_mode(gelu):
    """dtype="i16" (round 5): int16 fixed-point plane STORAGE with one
    shared dynamic scale (absolute step max|plane|/32767 — ~100× below
    bf16's relative error at plane-max magnitude, which set the bf16
    family's 7-LSB envelope) + bf16 MXU dots, at the same 2-byte plane
    DMA as bf16. Mosaic rejects fp16 ("Unsupported type in mosaic
    dialect: 'f16'" — measured r5 negative), so fixed point is the
    2-byte accuracy tier. Must be surgical-class: within one u8 step of
    the fp32 folded decode."""
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_v2 import decode_image_fused_v2

    image_size, base, c, pe, hidden = 128, 32, 12, 6, 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(23))
    fp, _ = create_pyramid(k1, base, c, 8, ndim=2, no_mip=True)
    m2l = pyramid_mip_levels(image_size, base, no_mip=True)
    mlp = init_mlp(k2, c * 5 + pe * 2 + 1, hidden, 3)
    want = np.asarray(
        fast_decode(fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, ndim=2)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            decode_image_fused_v2(
                fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                pe_channels=pe, dtype="i16", gelu=gelu,
            )
        )
    u8 = lambda a: np.clip(a * 255 + 0.5, 0, 255).astype(np.int32)
    assert np.abs(got - want).max() < 3e-3  # i16 storage + bf16-dot
    assert np.abs(u8(got) - u8(want)).max() <= 1


@pytest.mark.parametrize("hw", [(64, 96), (96, 64)])
@pytest.mark.parametrize("mip", [0, 1, 2])
def test_fused_v2_rectangular_matches_fastdecode(hw, mip):
    """NATIVE rectangular geometry (IMAGE_SIZE_W — the Kodak 768×512
    target; the reference is square-only, var2.py:60) must ride the SAME
    fused kernel: v2's tile grid is n_rows×n_cols. Parity vs the folded
    XLA path with per-axis sample counts. Covers e ∈ {-2, -1, 0} and
    both orientations."""
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_v2 import decode_image_fused_v2

    base = tuple(s // 4 for s in hw)
    c, pe = 4, 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    fp, _ = create_pyramid(k1, base, c, 8, ndim=2, no_mip=True)
    m2l = pyramid_mip_levels(hw[0], min(base), no_mip=True)
    mlp = init_mlp(k2, c * 5 + pe * 2 + 1, 16, 3)
    ns = tuple(s // (2**mip) for s in hw)
    want = np.asarray(
        fast_decode(fp, mlp, mip, image_size=hw[0], mip_to_level=m2l,
                    pe_channels=pe, ndim=2, n=ns)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            decode_image_fused_v2(
                fp, mlp, mip, image_size=hw, mip_to_level=m2l,
                pe_channels=pe,
            )
        )
    assert got.shape == ns + (3,)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_v2_rectangular_lane_packed():
    """Rect + the packed (hidden=64, reference-default) layout: the
    column count drives packing/retiling, the row count the tile grid —
    an axis swap anywhere would scramble the image."""
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_v2 import decode_image_fused_v2

    hw, c, pe, hidden = (64, 96), 12, 6, 64
    base = tuple(s // 4 for s in hw)
    k1, k2 = jax.random.split(jax.random.PRNGKey(12))
    fp, _ = create_pyramid(k1, base, c, 8, ndim=2, no_mip=True)
    m2l = pyramid_mip_levels(hw[0], min(base), no_mip=True)
    mlp = init_mlp(k2, c * 5 + pe * 2 + 1, hidden, 3)
    want = np.asarray(
        fast_decode(fp, mlp, 0, image_size=hw[0], mip_to_level=m2l,
                    pe_channels=pe, ndim=2, n=hw)
    )
    import nic.kernels.decode_fused_v2 as v2mod

    seen = []
    orig = v2mod._call

    def spy(*a, **kw):
        seen.append(kw.get("packed"))
        return orig(*a, **kw)

    v2mod._call = spy
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                decode_image_fused_v2(
                    fp, mlp, 0, image_size=hw, mip_to_level=m2l,
                    pe_channels=pe,
                )
            )
            # multi-column-block grid forces the retile path too (48-wide
            # blocks fail the packed sublane gate — unpacked rect kernel)
            got2 = np.asarray(
                decode_image_fused_v2(
                    fp, mlp, 0, image_size=hw, mip_to_level=m2l,
                    pe_channels=pe, block_cols=48,
                )
            )
    finally:
        v2mod._call = orig
    # the default single-block geometry must select the packed layout
    assert seen[0] is True
    assert got.shape == hw + (3,)
    np.testing.assert_allclose(got, want, atol=2e-5)
    np.testing.assert_allclose(got2, want, atol=2e-5)


@pytest.mark.parametrize("sparse_g0", [False, True])
@pytest.mark.parametrize("mip", [0, 1, 2, 3, 4])
def test_fused_3d_matches_fastdecode(mip, sparse_g0):
    """3D fused kernel parity vs the folded XLA path across mips, for
    method 3 (dense 8-corner G0, tri-PE) and method 4 (sparse even-parity
    G0, sinusoidal PE). mip=3 is e=1 → internal fast_decode fallback."""
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_3d import decode_volume_fused

    image_size, base, c, pe = 32, 8, 4, 4  # small: interpret mode is slow
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    fp, levels = create_pyramid(k1, base, channels=c, num_bits=8, ndim=3)
    assert levels == 2
    m2l = pyramid_mip_levels(image_size, base)
    n_corners = 4 if sparse_g0 else 8
    use_tri_pe = not sparse_g0  # reference: method 4 hardcodes sinusoidal
    mlp = init_mlp(k2, c * (n_corners + 1) + pe * 3 + 1, 16, 3)

    want = np.asarray(
        fast_decode(fp, mlp, mip, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, use_tri_pe=use_tri_pe, ndim=3,
                    sparse_g0=sparse_g0)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            decode_volume_fused(
                fp, mlp, mip, image_size=image_size, mip_to_level=m2l,
                pe_channels=pe, use_tri_pe=use_tri_pe, sparse_g0=sparse_g0,
            )
        )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("sparse_g0", [False, True])
def test_fused_3d_i16_mode(sparse_g0):
    """dtype="i16" on the 3D kernel (round 5): int16 fixed-point planes
    with a shared analytic scale + bf16 MXU dots — the movie family's
    exact-class fast mode. Must sit within one u8 step of the fp32
    folded decode."""
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_3d import decode_volume_fused

    image_size, base, c, pe = 32, 8, 4, 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(29))
    fp, _ = create_pyramid(k1, base, channels=c, num_bits=8, ndim=3)
    m2l = pyramid_mip_levels(image_size, base)
    n_corners = 4 if sparse_g0 else 8
    use_tri_pe = not sparse_g0
    mlp = init_mlp(k2, c * (n_corners + 1) + pe * 3 + 1, 16, 3)
    want = np.asarray(
        fast_decode(fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, use_tri_pe=use_tri_pe, ndim=3,
                    sparse_g0=sparse_g0)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            decode_volume_fused(
                fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                pe_channels=pe, use_tri_pe=use_tri_pe, sparse_g0=sparse_g0,
                dtype="i16", gelu="exact",
            )
        )
    u8 = lambda a: np.clip(a * 255 + 0.5, 0, 255).astype(np.int32)
    assert np.abs(got - want).max() < 3e-3
    assert np.abs(u8(got) - u8(want)).max() <= 1


def test_fused_3d_lane_packed_multiblock():
    """hidden=64 (reference default) → the packed block-diagonal path;
    block_rows/cols below the frame size force a multi-block grid with
    the per-frame halo windows and the column-block-major retile."""
    import nic.kernels.decode_fused_3d as k3mod
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_3d import decode_volume_fused

    image_size, base, c, pe, hidden = 32, 8, 12, 6, 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(13))
    fp, _ = create_pyramid(k1, base, channels=c, num_bits=8, ndim=3)
    m2l = pyramid_mip_levels(image_size, base)
    mlp = init_mlp(k2, c * 9 + pe * 3 + 1, hidden, 3)
    want = np.asarray(
        fast_decode(fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, use_tri_pe=True, ndim=3)
    )
    seen = {}
    orig = k3mod._call3

    def spy(*a, **kw):
        seen["packed"] = kw.get("packed")
        return orig(*a, **kw)

    k3mod._call3 = spy
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                decode_volume_fused(
                    fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, use_tri_pe=True,
                )
            )
            got2 = np.asarray(
                decode_volume_fused(
                    fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, use_tri_pe=True, block_rows=16,
                    block_cols=16,
                )
            )
    finally:
        k3mod._call3 = orig
    assert seen["packed"] is True
    np.testing.assert_allclose(got, want, atol=2e-5)
    np.testing.assert_allclose(got2, want, atol=2e-5)


@pytest.mark.parametrize("mip", [0, 1, 2, 4])
def test_fused_v2_z1_matmul_parity(mip):
    """z1_matmul routes the z1 build (P row-upsample + C1 row-interp)
    through the MXU against static matrices; same values as the VPU
    per-row kernel up to f32 summation order. Mips cover f ∈ {4, 2, 1}
    and both fl levels."""
    from nic.kernels.decode_fused_v2 import decode_image_fused_v2

    image_size = 64
    base = image_size // 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    fp, _ = create_pyramid(k1, base, channels=4, num_bits=8, ndim=2)
    mip_to_level = pyramid_mip_levels(image_size, base)
    pe = 4
    mlp = init_mlp(k2, 4 * 5 + pe * 2 + 1, 16, 3)
    kw = dict(image_size=image_size, mip_to_level=mip_to_level,
              pe_channels=pe, use_tri_pe=True)
    with pltpu.force_tpu_interpret_mode():
        vpu = np.asarray(decode_image_fused_v2(fp, mlp, mip, **kw))
        mxu = np.asarray(
            decode_image_fused_v2(fp, mlp, mip, z1_matmul=True, **kw)
        )
    np.testing.assert_allclose(mxu, vpu, atol=1e-5)


def test_fused_v2_z1_matmul_auto_packed():
    """z1_matmul="auto" must resolve to the MXU kernel exactly on the
    lane-packed geometry (hidden 64 → 128 post-pack) and stay bit-near
    the XLA fast path there."""
    import nic.kernels.decode_fused_v2 as v2mod
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_v2 import decode_image_fused_v2

    image_size, base, c, pe, hidden = 128, 32, 12, 6, 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(13))
    fp, _ = create_pyramid(k1, base, c, 8, ndim=2, no_mip=True)
    m2l = pyramid_mip_levels(image_size, base, no_mip=True)
    mlp = init_mlp(k2, c * 5 + pe * 2 + 1, hidden, 3)
    want = np.asarray(
        fast_decode(fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, ndim=2)
    )
    seen = {}
    orig = v2mod._call

    def spy(*a, **kw):
        seen["z1mm"] = kw.get("z1mm")
        seen["packed"] = kw.get("packed")
        return orig(*a, **kw)

    v2mod._call = spy
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                decode_image_fused_v2(
                    fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, z1_matmul="auto",
                )
            )
            # multi-column-block grid: the pre-gathered halo blocks must
            # tile correctly per column block too
            got2 = np.asarray(
                decode_image_fused_v2(
                    fp, mlp, 0, image_size=image_size, mip_to_level=m2l,
                    pe_channels=pe, z1_matmul="auto", block_cols=64,
                )
            )
    finally:
        v2mod._call = orig
    assert seen["packed"] is True and seen["z1mm"] is True
    np.testing.assert_allclose(got, want, atol=2e-5)
    np.testing.assert_allclose(got2, want, atol=2e-5)


def test_thumbnail_mips_fall_back_not_crash():
    """e ≥ 2 thumbnail mips must take the XLA fallback (pre-round-5 the
    kernel entries crashed on a negative shift computing f1 when called
    directly), and the pure-geometry predicates must say so without
    doing any compute."""
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_3d import (decode_volume_fused,
                                             kernel_covers_3d)
    from nic.kernels.decode_fused_v2 import (decode_image_fused_v2,
                                             kernel_covers_2d)

    image_size, base, c, pe = 32, 8, 4, 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(13))
    fp, _ = create_pyramid(k1, base, channels=c, num_bits=8, ndim=2,
                           no_mip=True)
    m2l = pyramid_mip_levels(image_size, base, no_mip=True)
    mlp = init_mlp(k2, c * 5 + pe * 2 + 1, 16, 3)
    # find a thumbnail mip with e >= 2 in the map
    mips = [m for m in sorted(m2l) if m - (m2l[m] + 1) * 2 >= 2]
    assert mips, "protocol map should contain an e>=2 thumbnail mip"
    mip = mips[0]
    assert not kernel_covers_2d(mip, image_size, m2l, mlp["w2"].shape[0])
    got = np.asarray(decode_image_fused_v2(
        fp, mlp, mip, image_size=image_size, mip_to_level=m2l,
        pe_channels=pe))
    want = np.asarray(fast_decode(
        fp, mlp, mip, image_size=image_size, mip_to_level=m2l,
        pe_channels=pe, ndim=2))
    np.testing.assert_allclose(got, want, atol=2e-5)
    # covered geometries still report True
    assert kernel_covers_2d(0, image_size, m2l, mlp["w2"].shape[0])

    fp3, _ = create_pyramid(k1, base, channels=c, num_bits=8, ndim=3,
                            no_mip=True)
    m2l3 = pyramid_mip_levels(image_size, base, no_mip=True)
    mlp3 = init_mlp(k2, c * 9 + pe * 3 + 1, 16, 3)
    mips3 = [m for m in sorted(m2l3) if m - (m2l3[m] + 1) * 2 >= 2]
    assert mips3, "3D map should contain an e>=2 thumbnail mip"
    assert not kernel_covers_3d(mips3[0], image_size, m2l3,
                                mlp3["w2"].shape[0])
    got3 = np.asarray(decode_volume_fused(
        fp3, mlp3, mips3[0], image_size=image_size, mip_to_level=m2l3,
        pe_channels=pe, use_tri_pe=True, sparse_g0=False))
    want3 = np.asarray(fast_decode(
        fp3, mlp3, mips3[0], image_size=image_size, mip_to_level=m2l3,
        pe_channels=pe, ndim=3))
    np.testing.assert_allclose(got3, want3, atol=2e-5)
    assert kernel_covers_3d(0, image_size, m2l3, mlp3["w2"].shape[0])


def test_kernel_covers_predicates_match_prepare_gates():
    """kernel_covers_2d/3d duplicate the _prepare gate arithmetic so the
    CLI can report fallbacks without doing the fold — lock the two
    together across the protocol's whole mip range so they can't drift."""
    from nic.kernels import decode_fused_3d as k3
    from nic.kernels import decode_fused_v2 as k2

    image_size, base, c, pe = 32, 8, 4, 4
    k1, kk = jax.random.split(jax.random.PRNGKey(17))
    mlp = init_mlp(kk, c * 5 + pe * 2 + 1, 16, 3)
    for no_mip in (True, False):
        fp, _ = create_pyramid(k1, base, channels=c, num_bits=8, ndim=2,
                               no_mip=no_mip)
        m2l = pyramid_mip_levels(image_size, base, no_mip=no_mip)
        for mip in sorted(m2l):
            prep = k2._prepare_2d(
                fp, mlp, mip, image_size=image_size, mip_to_level=m2l,
                pe_channels=pe, use_tri_pe=True, dtype=None,
                block_rows=None, block_cols=None)
            assert k2.kernel_covers_2d(
                mip, image_size, m2l, mlp["w2"].shape[0]) == (
                prep is not None), f"2D drift at mip={mip} no_mip={no_mip}"

    mlp3 = init_mlp(kk, c * 9 + pe * 3 + 1, 16, 3)
    for no_mip in (True, False):
        fp3, _ = create_pyramid(k1, base, channels=c, num_bits=8, ndim=3,
                                no_mip=no_mip)
        m2l3 = pyramid_mip_levels(image_size, base, no_mip=no_mip)
        for mip in sorted(m2l3):
            prep = k3._prepare_3d(
                fp3, mlp3, mip, image_size=image_size, mip_to_level=m2l3,
                pe_channels=pe, use_tri_pe=True, sparse_g0=False,
                dtype=None, block_rows=None, block_cols=None)
            assert k3.kernel_covers_3d(
                mip, image_size, m2l3, mlp3["w2"].shape[0]) == (
                prep is not None), f"3D drift at mip={mip} no_mip={no_mip}"

"""Golden-value tests for nic.core.quant vs the reference quantizer formulas
(models.py:5-71; ranges cross-checked against the reference's own
test12.py 2-bit derivation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nic.core import quant
import reference_oracle as oracle


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_quantize_matches_oracle(bits):
    x = np.linspace(0.0, 1.0, 257)
    got = np.asarray(quant.quantize(jnp.asarray(x, jnp.float32), bits))
    want = oracle.quantize(x, bits)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_quantize_half_up_not_banker():
    # code boundary at exactly .5 steps must round UP (floor(x*s+0.5)),
    # where jnp.round would round half-to-even
    bits = 2  # scale 3
    x = jnp.asarray([0.5 / 3.0, 1.5 / 3.0, 2.5 / 3.0])
    got = np.asarray(quant.quantize(x, bits)) * 3.0
    np.testing.assert_allclose(got, [1.0, 2.0, 3.0], atol=1e-6)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_quant_range(bits):
    q_min, q_max = quant.quant_range(bits)
    o_min, o_max = oracle.quant_range(bits)
    assert q_min == o_min and q_max == o_max
    # 2-bit sanity from the reference's test12.py derivation:
    if bits == 2:
        assert q_min == -3.0 / 8.0 and q_max == 0.5


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_pack_unpack_grid_roundtrip(bits):
    q_min, q_max = quant.quant_range(bits)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (512,), minval=q_min, maxval=q_max)
    xq = quant.quantize(x, bits)
    code = quant.pack_grid(xq, bits)
    # parity with save4fp byte values
    np.testing.assert_array_equal(
        np.asarray(code), oracle.save4fp(np.asarray(xq), bits)
    )
    # lossless roundtrip of quantized values
    back = quant.unpack_grid(code, bits)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xq), atol=1e-6)
    # full b-bit code range fits uint8 with the +2^(b-1)-1 offset
    assert int(np.asarray(code).max()) <= 2**bits - 1


@pytest.mark.parametrize("bits", [1, 2, 3, 4, 5, 6, 7, 8])
def test_subbyte_bitpack_roundtrip(bits):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2**bits, size=1001).astype(np.uint8)
    packed = quant.pack_bits(codes, bits)
    assert packed.nbytes == -(-1001 * bits // 8)  # true payload size
    back = quant.unpack_bits(packed, bits, 1001)
    np.testing.assert_array_equal(back, codes)


def test_bitpack_layout_backward_compatible():
    """For b | 8 the true-bit-stream layout must equal the historical
    codes-per-byte layout (old artifacts stay readable)."""
    for bits in (1, 2, 4):
        per_byte = 8 // bits
        codes = np.arange(per_byte * 3, dtype=np.uint8) % (1 << bits)
        legacy = np.zeros(3, np.uint8)
        for i in range(per_byte):
            legacy |= codes.reshape(-1, per_byte)[:, i] << (i * bits)
        np.testing.assert_array_equal(quant.pack_bits(codes, bits), legacy)


def test_qat_noise_range():
    bits = 4
    key = jax.random.PRNGKey(1)
    noise = quant.qat_noise(key, (10000,), bits)
    amp = 1.0 / 2 ** (bits + 1)
    assert float(jnp.max(jnp.abs(noise))) <= amp
    assert float(jnp.std(noise)) > amp / 4  # actually spread out


def test_quantize_ste_gradient():
    bits = 4
    g = jax.grad(lambda x: jnp.sum(quant.quantize_ste(x, bits)))(jnp.ones(3) * 0.3)
    np.testing.assert_allclose(np.asarray(g), 1.0)
    g0 = jax.grad(lambda x: jnp.sum(quant.quantize(x, bits)))(jnp.ones(3) * 0.3)
    np.testing.assert_allclose(np.asarray(g0), 0.0)  # reference semantics


def test_scale_normalize_roundtrip():
    x = jnp.linspace(0, 1, 11)
    y = quant.normalize_from_bit(quant.scale_to_bit(x, 8), 8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

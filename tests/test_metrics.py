"""Tests for nic.core.metrics (PSNR conventions, safe_statistics)."""

import numpy as np
import jax.numpy as jnp

from nic.core import metrics


def test_psnr_reference_convention():
    a = np.zeros((8, 8), np.float32)
    b = np.full((8, 8), 16.0, np.float32)  # mse = 256
    # reference convention: max = 2^8 = 256 → 10*log10(256²/256) = 10*log10(256)
    got = float(metrics.psnr(a, b))
    assert abs(got - 10 * np.log10(256.0)) < 1e-4
    # standard convention (255) is ~0.034 dB lower
    got255 = float(metrics.psnr(a, b, max_value=255.0))
    assert abs((got - got255) - 20 * np.log10(256.0 / 255.0)) < 1e-4


def test_psnr_identical_inf():
    a = np.ones((4, 4), np.float32)
    assert np.isinf(float(metrics.psnr(a, a)))


def test_average_psnr_is_frame_mean():
    rng = np.random.default_rng(0)
    orig = rng.uniform(0, 255, (5, 8, 8, 3)).astype(np.float32)
    rec = orig + rng.normal(0, 4, orig.shape).astype(np.float32)
    per_frame = [float(metrics.psnr(orig[i], rec[i])) for i in range(5)]
    got = float(metrics.average_psnr(orig, rec))
    assert abs(got - np.mean(per_frame)) < 1e-3


def test_safe_statistics():
    x = jnp.asarray([1.0, 2.0, jnp.nan, jnp.inf, -3.0])
    s = metrics.safe_statistics(x)
    assert s["has_nan"] and s["has_inf"]
    assert s["num_valid"] == 3
    assert s["max"] == 2.0 and s["min"] == -3.0
    assert abs(s["mean"] - 0.0) < 1e-6

    clean = metrics.safe_statistics(jnp.asarray([1.0, 3.0]))
    assert not clean["has_nan"] and not clean["has_inf"]
    assert abs(clean["var"] - 2.0) < 1e-6  # torch.var default: unbiased

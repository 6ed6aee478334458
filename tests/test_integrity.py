"""SDC guards (nic/obs/integrity.py) — round-3 axon-tunnel finding."""

import numpy as np
import jax.numpy as jnp
import pytest

from nic.obs.integrity import verified_fetch, verified_result


def test_verified_fetch_stable():
    x = jnp.arange(1024, dtype=jnp.float32).reshape(32, 32)
    out = verified_fetch(x)
    np.testing.assert_array_equal(out, np.asarray(x))


def test_verified_result_stable():
    calls = []

    def fn():
        calls.append(1)
        return np.full((8, 8), 3.0)

    out = verified_result(fn)
    assert len(calls) == 2  # exactly one confirmation run
    np.testing.assert_array_equal(out, np.full((8, 8), 3.0))


def test_verified_result_retries_past_one_corruption():
    vals = [np.zeros(4), np.ones(4), np.ones(4)]  # first fetch corrupted
    warns = []
    out = verified_result(
        lambda: vals.pop(0), warn=lambda m: warns.append(m)
    )
    np.testing.assert_array_equal(out, np.ones(4))
    assert len(warns) == 1 and "corruption" in warns[0]


def test_verified_result_raises_on_persistent_corruption():
    import itertools

    counter = itertools.count()

    def always_different():
        return np.full(4, next(counter), dtype=np.float64)

    with pytest.raises(RuntimeError, match="no stable result"):
        verified_result(always_different, retries=3)


def test_verified_result_nan_stable():
    out = verified_result(lambda: np.array([np.nan, 1.0]))
    assert np.isnan(out[0]) and out[1] == 1.0


def test_verified_result_tuple_output():
    a, b = verified_result(lambda: (np.ones(3), np.zeros((2, 2))))
    np.testing.assert_array_equal(a, np.ones(3))
    np.testing.assert_array_equal(b, np.zeros((2, 2)))

    vals = [(np.zeros(2), np.ones(2)), (np.ones(2), np.ones(2)),
            (np.ones(2), np.ones(2))]
    warns = []
    a, b = verified_result(lambda: vals.pop(0),
                           warn=lambda m: warns.append(m))
    np.testing.assert_array_equal(a, np.ones(2))
    assert len(warns) == 1

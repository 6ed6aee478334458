"""Native C++ runtime helpers vs the numpy reference implementations."""

import numpy as np
import pytest

from nic import native
from nic.core import quant


needs_so = pytest.mark.skipif(
    not native.available(), reason="libnic_native.so not built (make -C nic/native)"
)


@needs_so
@pytest.mark.parametrize("bits", [1, 2, 3, 4, 5, 6, 7, 8])
def test_native_pack_matches_numpy(bits):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2**bits, size=10007).astype(np.uint8)
    got = native.pack_bits(codes, bits)
    want = quant.pack_bits(codes, bits)
    np.testing.assert_array_equal(got, want)
    back = native.unpack_bits(got, bits, len(codes))
    np.testing.assert_array_equal(back, codes)


@needs_so
def test_native_lut_csv_matches_python(tmp_path):
    from nic.data.assets import save_lut_csv

    lut = np.random.default_rng(1).uniform(0, 1, (5, 5, 5, 3)).astype(np.float32)
    p_native = str(tmp_path / "n.csv")
    p_python = str(tmp_path / "p.csv")
    native.write_lut_csv(lut, p_native)
    save_lut_csv(lut, p_python)
    a = [[float(v) for v in line.rstrip(",").split(",")]
         for line in open(p_native).read().strip().splitlines()]
    b = [[float(v) for v in line.rstrip(",").split(",")]
         for line in open(p_python).read().strip().splitlines()]
    assert len(a) == len(b) == 25
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_fallback_without_so(monkeypatch):
    # force the numpy path regardless of the build
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_SO_PATH", "/nonexistent.so")
    codes = np.arange(16, dtype=np.uint8) % 4
    got = native.pack_bits(codes, 2)
    np.testing.assert_array_equal(got, quant.pack_bits(codes, 2))

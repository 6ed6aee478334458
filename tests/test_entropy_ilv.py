"""Interleaved word-renormalized rANS (stream format 2) + entropy-layer
speedups: native/python parity, legacy backcompat, and the bit-stability
guarantee quantize_pmf owes to persisted entropy-coded artifacts.

The format-1 coder is nic/io/entropy.py's byte-renorm scalar state machine;
format 2 (nic/native/rans.cpp + rans_*_ilv_py) splits symbols round-robin
over 8 lanes and renormalizes 16 bits at a time. Old artifacts rebuild
their CDFs via quantize_pmf on a stored histogram, so that function must
stay bit-identical across optimizations.
"""

import json
import struct

import numpy as np
import pytest

from nic.io import entropy as ec
from nic import native


def _workload(n=5000, max_abs=12, seed=0):
    rng = np.random.default_rng(seed)
    cdf = ec.gaussian_cdf_table(max_abs)
    bins = rng.integers(0, cdf.shape[0], n).astype(np.int32)
    syms = rng.integers(0, cdf.shape[1] - 1, n).astype(np.int32)
    return syms, bins, cdf


def test_ilv_python_roundtrip_and_tails():
    syms, bins, cdf = _workload()
    for n in (0, 1, 5, 7, 8, 9, 131, 4096):
        payload, lens = ec.rans_encode_ilv_py(syms[:n], bins[:n], cdf, 8)
        assert len(lens) == 8 and sum(lens) == len(payload)
        out = ec.rans_decode_ilv_py(payload, lens, bins[:n], cdf)
        np.testing.assert_array_equal(out, syms[:n])


@pytest.mark.skipif(not native.rans_available(), reason="no native build")
def test_ilv_native_matches_python_oracle():
    syms, bins, cdf = _workload(n=20000)
    blob = native.rans_encode(syms, bins, cdf)
    # native encode emits a self-describing stream (format 3 since round 4;
    # format-2 bit-parity vs this oracle held through round 3)
    assert blob[:2] == b"NR" and blob[3] == 1
    np.testing.assert_array_equal(native.rans_decode(blob, bins, cdf), syms)
    # the format-2 python coder cross-decodes its own streams and the
    # native wrapper still dispatches them by magic
    payload, lens = ec.rans_encode_ilv_py(syms, bins, cdf, 8)
    np.testing.assert_array_equal(
        ec.rans_decode_ilv_py(payload, lens, bins, cdf), syms
    )


@pytest.mark.skipif(not native.rans_available(), reason="no native build")
def test_ilv_native_tail_sizes_and_lut_path():
    syms, bins, cdf = _workload(max_abs=4)
    for n in (0, 1, 7, 8, 9, 63):
        blob = native.rans_encode(syms[:n], bins[:n], cdf)
        np.testing.assert_array_equal(
            native.rans_decode(blob, bins[:n], cdf), syms[:n]
        )
    # large stream takes the dense-LUT branch (n >= n_bins * 4096)
    syms2, bins2, cdf2 = _workload(n=cdf.shape[0] * 4096 + 5, max_abs=4, seed=3)
    blob2 = native.rans_encode(syms2, bins2, cdf2)
    np.testing.assert_array_equal(native.rans_decode(blob2, bins2, cdf2), syms2)


def test_legacy_format_decodes_through_wrapper():
    syms, bins, cdf = _workload(n=3000)
    legacy = ec.rans_encode_py(syms, bins, cdf)
    np.testing.assert_array_equal(
        native.rans_decode(legacy, bins, cdf, legacy=True), syms
    )
    # auto-detect: no format-2 magic → legacy path
    np.testing.assert_array_equal(native.rans_decode(legacy, bins, cdf), syms)
    # explicit format-2 on a legacy stream must fail loudly, not misdecode
    with pytest.raises(ValueError):
        native.rans_decode(legacy, bins, cdf, legacy=False)


def test_quantize_pmf_bit_stable_vs_original():
    """Vectorized drift fix must reproduce the original per-step loop
    exactly — persisted artifacts rebuild CDFs with quantize_pmf."""

    def quantize_pmf_v1(pmf):
        pmf = np.maximum(np.asarray(pmf, np.float64), 1e-12)
        pmf = pmf / pmf.sum()
        freqs = np.maximum(np.round(pmf * ec.PROB_SCALE).astype(np.int64), 1)
        drift = ec.PROB_SCALE - freqs.sum()
        order = np.argsort(-freqs)
        i = 0
        while drift != 0:
            j = order[i % len(freqs)]
            step = 1 if drift > 0 else -1
            if freqs[j] + step >= 1:
                freqs[j] += step
                drift -= step
            i += 1
        cdf = np.zeros(len(freqs) + 1, np.int32)
        cdf[1:] = np.cumsum(freqs)
        return cdf

    rng = np.random.default_rng(7)
    cases = [rng.dirichlet(np.full(int(rng.integers(2, 300)),
                                   rng.uniform(0.01, 5.0)))
             for _ in range(100)]
    cases += [
        np.array([1e-30] * 51 + [1.0]),   # peaked: large negative drift
        np.ones(52) / 52,
        np.array([0.5, 0.5]),
        np.full(4096, 1 / 4096),
    ]
    for p in cases:
        np.testing.assert_array_equal(ec.quantize_pmf(p), quantize_pmf_v1(p))


def test_scale_bin_indices_conservative_and_near_searchsorted():
    rng = np.random.default_rng(2)
    s = np.concatenate(
        [np.exp(rng.normal(0, 1.5, 20000)).clip(0.05, 100), ec.scale_table()]
    )
    idx = ec.scale_bin_indices(s)
    table = ec.scale_table()
    # the coding contract: the chosen bin's σ is ≥ the true σ (or capped)
    assert ((table[idx] >= s) | (idx == ec.NUM_SCALE_BINS - 1)).all()
    # and it matches searchsorted everywhere except exact-boundary floats
    ref = np.searchsorted(table, s, side="left").clip(
        0, ec.NUM_SCALE_BINS - 1
    ).astype(np.int32)
    assert (idx != ref).mean() < 1e-2


def test_gaussian_table_cache_returns_same_array():
    a = ec.gaussian_cdf_table(9)
    b = ec.gaussian_cdf_table(9)
    assert a is b
    assert a.shape == (ec.NUM_SCALE_BINS, 2 * 9 + 2)
    assert (a[:, -1] == ec.PROB_SCALE).all() and (a[:, 0] == 0).all()


def test_artifact_legacy_rans_format_backcompat(tmp_path):
    """An entropy-coded artifact written by the round-2 code (format-1
    streams, no rans_format key) must still load bit-exactly."""
    import jax
    import jax.numpy as jnp

    from nic.grids.pyramid import create_pyramid
    from nic.io.artifacts import load_compressed, save_compressed

    pyr, _ = create_pyramid(jax.random.PRNGKey(0), base_size=32, channels=4,
                            num_bits=4)
    mlp = {"w0": np.ones((4, 3), np.float32)}
    path = str(tmp_path / "art.npz")
    save_compressed(path, mlp, pyr, fp_bits=4, meta={"kind": "test"},
                    entropy_coded=True)
    m1, p1, meta1 = load_compressed(path)
    assert meta1["rans_format"] in (2, 3)

    # rewrite the npz as the old code would have: legacy streams, no key
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    meta = json.loads(bytes(data["__meta__"]).decode())
    for i, shape in enumerate(meta["grid_shapes"]):
        hist = data[f"hist{i}"]
        cdf = ec.quantize_pmf(hist / max(1, hist.sum()))[None, :]
        count = int(np.prod(shape))
        codes = native.rans_decode(
            data[f"grid{i}"].tobytes(), np.zeros(count, np.int32), cdf
        )
        legacy = ec.rans_encode_py(codes, np.zeros(count, np.int32), cdf)
        data[f"grid{i}"] = np.frombuffer(legacy, np.uint8)
    del meta["rans_format"]
    data["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    legacy_path = str(tmp_path / "art_legacy.npz")
    np.savez(legacy_path, **data)

    m2, p2, meta2 = load_compressed(legacy_path)
    assert "rans_format" not in meta2
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert jnp.asarray(m1["w0"]).dtype == jnp.asarray(m2["w0"]).dtype


# ---------------------------------------------------------------------------
# stream format 3: 64-lane shared-stream word rANS (SIMD decode)
# ---------------------------------------------------------------------------


def test_ilv3_python_roundtrip_and_tails():
    syms, bins, cdf = _workload()
    for n in (0, 1, 5, 63, 64, 65, 131, 4096):
        payload = ec.rans_encode_ilv3_py(syms[:n], bins[:n], cdf)
        out = ec.rans_decode_ilv3_py(payload, bins[:n], cdf)
        np.testing.assert_array_equal(out, syms[:n])


@pytest.mark.skipif(not native.rans_available(), reason="no native build")
def test_ilv3_native_matches_python_oracle_bit_exact():
    """The C++ format-3 encoder must produce the EXACT bytes of the python
    oracle (same state machine), and both decoders must invert both.
    Streams over the size gate go through the public wrapper; smaller
    tails exercise the raw binding."""
    import ctypes

    syms, bins, cdf = _workload(n=20000, seed=3)
    lib = native._load_rans()
    for n in (1, 63, 64, 200, 2000, 20000):
        py = ec.rans_encode_ilv3_py(syms[:n], bins[:n], cdf)
        if n >= 16384:
            blob = native.rans_encode(syms[:n], bins[:n], cdf)
            assert blob[:4] == b"NR3\x01" and blob[4:] == py
        else:
            s = np.ascontiguousarray(syms[:n]); b = np.ascontiguousarray(bins[:n])
            out_buf = np.empty(n * 2 + 600, np.uint8)
            total = lib.nic_rans_encode_ilv3(
                native._i32p(s), native._i32p(b), n, native._i32p(cdf),
                cdf.shape[1], native._u8p(out_buf), out_buf.size)
            assert total == len(py) and out_buf[:total].tobytes() == py
            blob = b"NR3\x01" + py
        out = native.rans_decode(blob, bins[:n], cdf)
        np.testing.assert_array_equal(out, syms[:n])
        out_py = ec.rans_decode_ilv3_py(blob[4:], bins[:n], cdf)
        np.testing.assert_array_equal(out_py, syms[:n])


@pytest.mark.skipif(not native.rans_available(), reason="no native build")
def test_ilv3_wide_alphabet_and_many_bins():
    """Coarse-LUT + correction path across bucket boundaries: a wide
    (260-symbol) alphabet over many bins."""
    rng = np.random.default_rng(7)
    n_bins, S = 96, 260
    pmf = rng.integers(1, 100, (n_bins, S)).astype(np.float64)
    ip = np.maximum(
        1, np.floor(pmf / pmf.sum(1, keepdims=True) * (65536 - S))
    ).astype(np.int64)
    ip[:, 0] += 65536 - ip.sum(1)
    cdf = np.zeros((n_bins, S + 1), np.int32)
    cdf[:, 1:] = np.cumsum(ip, 1)
    n = 10007
    syms = rng.integers(0, S, n).astype(np.int32)
    bins = rng.integers(0, n_bins, n).astype(np.int32)
    blob = native.rans_encode(syms, bins, cdf)
    out = native.rans_decode(blob, bins, cdf)
    np.testing.assert_array_equal(out, syms)


@pytest.mark.skipif(not native.rans_available(), reason="no native build")
def test_format2_streams_still_decode():
    """Persisted format-2 streams (old artifacts) must keep decoding
    through the wrapper's magic dispatch."""
    syms, bins, cdf = _workload(n=500, seed=5)
    payload, lens = ec.rans_encode_ilv_py(syms, bins, cdf, 8)
    blob2 = b"NR2\x01" + struct.pack("<B8I", 8, *lens) + payload
    out = native.rans_decode(blob2, bins, cdf)
    np.testing.assert_array_equal(out, syms)

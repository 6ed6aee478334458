"""ctypes bindings for the native runtime helpers (libnic_native.so).

Build with ``make -C nic/native`` (plain g++, no pybind11). Every entry
point has a numpy fallback, so the framework works without the build —
``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_SO_PATH = os.path.join(os.path.dirname(__file__), "libnic_native.so")
_RANS_PATH = os.path.join(os.path.dirname(__file__), "librans.so")
_lib = None
_rans = None
_build_attempted = False


def _ensure_built() -> None:
    """Build the .so's from the checked-in C++ sources on first use.

    Binaries are NOT vendored in the repo (reviewers can't verify a binary
    against its source); `make -C nic/native` is cheap (<2 s) and failures
    fall through to the numpy implementations. Set NIC_NO_NATIVE_BUILD=1
    to skip."""
    global _build_attempted
    if _build_attempted or os.environ.get("NIC_NO_NATIVE_BUILD"):
        return
    _build_attempted = True
    if os.path.exists(_SO_PATH) and os.path.exists(_RANS_PATH):
        return
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(__file__)],
            capture_output=True, timeout=120, check=False,
        )
    except Exception:
        pass  # numpy fallbacks take over


def _load():
    global _lib
    _ensure_built()
    if _lib is None and os.path.exists(_SO_PATH):
        lib = ctypes.CDLL(_SO_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.nic_pack_bits.restype = ctypes.c_int64
        lib.nic_pack_bits.argtypes = [u8p, ctypes.c_int64, ctypes.c_int, u8p]
        lib.nic_unpack_bits.restype = None
        lib.nic_unpack_bits.argtypes = [u8p, ctypes.c_int64, ctypes.c_int, u8p]
        lib.nic_write_lut_csv.restype = ctypes.c_int
        lib.nic_write_lut_csv.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_char_p
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _load_rans():
    global _rans
    _ensure_built()
    if _rans is None and os.path.exists(_RANS_PATH):
        lib = ctypes.CDLL(_RANS_PATH)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.nic_rans_encode.restype = ctypes.c_int64
        lib.nic_rans_encode.argtypes = [
            i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int64, u8p, ctypes.c_int64
        ]
        lib.nic_rans_decode.restype = ctypes.c_int
        lib.nic_rans_decode.argtypes = [
            u8p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, ctypes.c_int64, i32p
        ]
        lib.nic_rans_encode_ilv.restype = ctypes.c_int64
        lib.nic_rans_encode_ilv.argtypes = [
            i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int64, ctypes.c_int32,
            u8p, ctypes.c_int64, i64p,
        ]
        lib.nic_rans_decode_ilv.restype = ctypes.c_int
        lib.nic_rans_decode_ilv.argtypes = [
            u8p, i64p, ctypes.c_int32, i32p, ctypes.c_int64, i32p,
            ctypes.c_int64, u16p, i32p,
        ]
        lib.nic_rans_build_lut.restype = None
        lib.nic_rans_build_lut.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, u16p]
        lib.nic_rans_encode_ilv3.restype = ctypes.c_int64
        lib.nic_rans_encode_ilv3.argtypes = [
            i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int64, u8p,
            ctypes.c_int64,
        ]
        lib.nic_rans_decode_ilv3.restype = ctypes.c_int
        lib.nic_rans_decode_ilv3.argtypes = [
            u8p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, ctypes.c_int64,
            u16p, ctypes.c_int32, i32p,
        ]
        lib.nic_rans_build_lut_coarse.restype = None
        lib.nic_rans_build_lut_coarse.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, u16p,
        ]
        lib.nic_rans_simd_available.restype = ctypes.c_int
        _rans = lib
    return _rans


def rans_available() -> bool:
    return _load_rans() is not None


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


# stream format 2: interleaved word-renormalized lanes (rans.cpp) behind a
# self-describing header. Format-1 (headerless scalar byte-renorm) streams
# persist in old entropy-coded artifacts; callers with stored metadata pass
# legacy=True explicitly, everything else auto-detects on the magic.
_RANS2_MAGIC = b"NR2\x01"
# format 3: 64-lane (4 x 16) SINGLE-stream word rANS, AVX-512-decodable
# (rans.cpp format-3 section). Header is just the magic — the payload is
# self-contained (64 u32 states + shared u16 word stream + pad).
_RANS3_MAGIC = b"NR3\x01"
# format 3 carries ~384 B of fixed overhead (64 u32 states + load pad);
# small streams stay format 2 where that would cost real bpp
_RANS3_MIN_SYMS = 16384
_RANS_LANES = 8
_LUT3_SHIFT = 6  # coarse cum->symbol buckets: 2^(16-6) entries/bin (2 KB)


def rans_encode(
    symbols: np.ndarray, bins: np.ndarray, cdf: np.ndarray, lanes: int = _RANS_LANES
) -> bytes:
    """rANS-encode ``symbols`` (each drawn from its ``bins`` row of the
    int32 [n_bins, S+1] 16-bit-total ``cdf``). With the native library
    present, emits a format-3 stream (``b"NR3\\x01"`` + the 64-lane
    shared-stream payload — SIMD-decodable); otherwise a format-2 stream
    via the pure-python coder. Decoders auto-detect on the magic."""
    import struct

    symbols = np.ascontiguousarray(symbols, np.int32).reshape(-1)
    bins = np.ascontiguousarray(bins, np.int32).reshape(-1)
    cdf = np.ascontiguousarray(cdf, np.int32)
    lib = _load_rans()
    if (lib is not None and hasattr(lib, "nic_rans_encode_ilv3")
            and symbols.size >= _RANS3_MIN_SYMS):
        cap = symbols.size * 2 + 64 * 4 + 256
        out = np.empty(cap, np.uint8)
        total = lib.nic_rans_encode_ilv3(
            _i32p(symbols), _i32p(bins), symbols.size, _i32p(cdf),
            cdf.shape[1], _u8p(out), cap,
        )
        if total < 0:
            raise ValueError("rans encode failed (symbol out of CDF range?)")
        return _RANS3_MAGIC + out[:total].tobytes()
    if lib is None:
        from nic.io.entropy import rans_encode_ilv_py

        payload, lens = rans_encode_ilv_py(symbols, bins, cdf, lanes)
    else:
        cap = symbols.size * 2 + 8 * lanes + 64
        out = np.empty(cap, np.uint8)
        lane_lens = np.empty(lanes, np.int64)
        n = lib.nic_rans_encode_ilv(
            _i32p(symbols), _i32p(bins), symbols.size, _i32p(cdf),
            cdf.shape[1], lanes, _u8p(out), cap,
            lane_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if n < 0:
            raise ValueError("rans encode failed (symbol out of CDF range?)")
        payload, lens = out[:n].tobytes(), lane_lens.tolist()
    header = _RANS2_MAGIC + struct.pack(f"<B{lanes}I", lanes, *lens)
    return header + payload


# cum→symbol LUT cache: one load per decoded symbol instead of a binary
# search. Keyed by the CDF contents; bounded (tables are ≤ tens of MB).
_LUT_CACHE: dict = {}


def _decode_lut(cdf: np.ndarray):
    import hashlib

    key = (cdf.shape, hashlib.blake2b(cdf.tobytes(), digest_size=16).digest())
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    lib = _load_rans()
    lut = np.empty(cdf.shape[0] << 16, np.uint16)
    lib.nic_rans_build_lut(
        _i32p(cdf), cdf.shape[0], cdf.shape[1],
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    if len(_LUT_CACHE) >= 4:
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = lut
    return lut


def _decode_lut_coarse(cdf: np.ndarray):
    """Coarse cum→symbol buckets for the format-3 SIMD decode: 2 KB per
    bin (vs the exact table's 128 KB — which misses L2 and was measured
    as the SIMD decode's bottleneck), corrected by an in-loop increment
    over the cache-hot CDF rows. Always cheap to build, so no size gate."""
    import hashlib

    key = ("c", cdf.shape,
           hashlib.blake2b(cdf.tobytes(), digest_size=16).digest())
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    lib = _load_rans()
    lut = np.empty((cdf.shape[0] << (16 - _LUT3_SHIFT)) + 2, np.uint16)
    lib.nic_rans_build_lut_coarse(
        _i32p(cdf), cdf.shape[0], cdf.shape[1], _LUT3_SHIFT,
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    if len(_LUT_CACHE) >= 8:
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = lut
    return lut


def rans_decode(
    data: bytes, bins: np.ndarray, cdf: np.ndarray, legacy: bool | None = None
) -> np.ndarray:
    """Decode a rANS stream. ``legacy=True`` forces the format-1 scalar
    decoder (old persisted artifacts — nic.io.artifacts passes this from
    the stored ``rans_format``), ``False`` requires format 2, ``None``
    auto-detects on the format-2 magic."""
    import struct

    bins = np.ascontiguousarray(bins, np.int32).reshape(-1)
    cdf = np.ascontiguousarray(cdf, np.int32)
    if data.startswith(_RANS3_MAGIC):
        return _rans_decode3(data[len(_RANS3_MAGIC):], bins, cdf)
    if legacy is None:
        legacy = not data.startswith(_RANS2_MAGIC)
    elif not legacy and not data.startswith(_RANS2_MAGIC):
        raise ValueError("rans stream lacks the format-2/3 header")
    lib = _load_rans()
    if legacy:
        if lib is None:
            from nic.io.entropy import rans_decode_py

            return rans_decode_py(data, bins, cdf)
        buf = np.frombuffer(data, np.uint8)
        out = np.empty(bins.size, np.int32)
        rc = lib.nic_rans_decode(
            _u8p(np.ascontiguousarray(buf)), buf.size, _i32p(bins), bins.size,
            _i32p(cdf), cdf.shape[1], _i32p(out),
        )
        if rc != 0:
            raise ValueError("rans decode failed")
        return out
    lanes = data[4]
    lens = struct.unpack_from(f"<{lanes}I", data, 5)
    payload = data[5 + 4 * lanes:]
    if lib is None:
        from nic.io.entropy import rans_decode_ilv_py

        return rans_decode_ilv_py(payload, list(lens), bins, cdf)
    off = np.zeros(lanes + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    buf = np.ascontiguousarray(np.frombuffer(payload, np.uint8))
    out = np.empty(bins.size, np.int32)
    # the dense LUT only pays when the symbol count amortizes its build
    # (~2^16 writes per bin); small streams use the branchless search
    use_lut = bins.size >= cdf.shape[0] * 4096
    lut = _decode_lut(cdf) if use_lut else None
    rc = lib.nic_rans_decode_ilv(
        _u8p(buf), off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lanes, _i32p(bins), bins.size, _i32p(cdf), cdf.shape[1],
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)) if use_lut
        else ctypes.cast(None, ctypes.POINTER(ctypes.c_uint16)),
        _i32p(out),
    )
    if rc != 0:
        raise ValueError("rans decode failed")
    return out


def _rans_decode3(payload: bytes, bins: np.ndarray, cdf: np.ndarray):
    lib = _load_rans()
    if lib is None or not hasattr(lib, "nic_rans_decode_ilv3"):
        from nic.io.entropy import rans_decode_ilv3_py

        return rans_decode_ilv3_py(payload, bins, cdf)
    buf = np.ascontiguousarray(np.frombuffer(payload, np.uint8))
    out = np.empty(bins.size, np.int32)
    lut = _decode_lut_coarse(cdf)
    rc = lib.nic_rans_decode_ilv3(
        _u8p(buf), buf.size, _i32p(bins), bins.size, _i32p(cdf),
        cdf.shape[1],
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), _LUT3_SHIFT,
        _i32p(out),
    )
    if rc != 0:
        raise ValueError("rans decode failed")
    return out


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def pack_bits(codes: np.ndarray, bits: int) -> np.ndarray:
    """Native-or-numpy sub-byte packing (see nic.core.quant.pack_bits)."""
    lib = _load()
    codes = np.ascontiguousarray(np.asarray(codes, dtype=np.uint8).reshape(-1))
    if lib is None:
        from nic.core.quant import pack_bits as np_pack

        return np_pack(codes, bits)
    out = np.empty((len(codes) * bits + 7) // 8, dtype=np.uint8)
    n = lib.nic_pack_bits(_u8p(codes), len(codes), bits, _u8p(out))
    return out[:n]


def unpack_bits(packed: np.ndarray, bits: int, count: int) -> np.ndarray:
    lib = _load()
    packed = np.ascontiguousarray(np.asarray(packed, dtype=np.uint8).reshape(-1))
    if lib is None:
        from nic.core.quant import unpack_bits as np_unpack

        return np_unpack(packed, bits, count)
    out = np.empty(count, dtype=np.uint8)
    lib.nic_unpack_bits(_u8p(packed), count, bits, _u8p(out))
    return out


def write_lut_csv(lut: np.ndarray, path: str) -> None:
    """Native-or-python LUT CSV export (reference utils.py:97-113 layout)."""
    lib = _load()
    lut = np.ascontiguousarray(np.asarray(lut, dtype=np.float32))
    assert lut.ndim == 4 and lut.shape[3] == 3 and lut.shape[0] == lut.shape[1] == lut.shape[2]
    if lib is None:
        from nic.data.assets import save_lut_csv

        save_lut_csv(lut, path)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rc = lib.nic_write_lut_csv(
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lut.shape[0], path.encode(),
    )
    if rc != 0:
        raise OSError(f"nic_write_lut_csv failed for {path}")

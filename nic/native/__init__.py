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
_lib = None


def _load():
    global _lib
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


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def pack_bits(codes: np.ndarray, bits: int) -> np.ndarray:
    """Native-or-numpy sub-byte packing (see nic.core.quant.pack_bits)."""
    lib = _load()
    codes = np.ascontiguousarray(np.asarray(codes, dtype=np.uint8).reshape(-1))
    if lib is None:
        from nic.core.quant import pack_bits as np_pack

        return np_pack(codes, bits)
    per_byte = 8 // bits
    out = np.empty((len(codes) + per_byte - 1) // per_byte, dtype=np.uint8)
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

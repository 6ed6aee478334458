"""Persistent hyperprior bitstream container (.nicx).

The north star keeps "bitstream I/O host-side"; this is the on-disk half:
`HyperpriorCodec.compress` produces a blob dict (y/z rANS streams +
coding header), and this module gives it a stable single-file format so
bitstreams survive the process that made them — the reference has no
entropy coding at all (SURVEY.md §0), so the layout is ours:

    magic  b"NICX\\x01"
    u32le  header length
    JSON   header: a_y, a_z, y_shape, z_shape, hw, len_y, len_z,
           rans_format, model: {n, m, params_digest}
    bytes  y stream (format-2 rANS, self-describing NR2 header)
    bytes  z stream

The params digest binds a bitstream to the checkpoint that encoded it:
`decompress` with a different model would silently produce garbage
(σ comes from the decoded z through the model's hyper-synthesis), so
`read_nicx` callers verify it loudly instead.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct

import numpy as np

__all__ = ["params_digest", "write_nicx", "read_nicx", "NICX_MAGIC"]

# \x02: σ→scale-bin mapping moved on-device (f32 log in the jitted
# hyper-synthesis) — bins must match between encode and decode, and a
# boundary σ could bin differently under the old host-f64 mapping, so
# old streams are rejected by magic rather than risking silent symbol
# corruption.
NICX_MAGIC = b"NICX\x02"


def params_digest(params) -> str:
    """Order-stable blake2b fingerprint of a model's parameter pytree."""
    import jax

    h = hashlib.blake2b(digest_size=16)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    h.update(str(treedef).encode())
    for leaf in leaves:
        a = np.asarray(leaf)
        h.update(str((a.dtype.str, a.shape)).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def write_nicx(path: str, blob: dict, model_info: dict) -> int:
    """Serialize a HyperpriorCodec blob. Returns total bytes written."""
    header = {
        "a_y": int(blob["a_y"]),
        "a_z": int(blob["a_z"]),
        "y_shape": [int(v) for v in blob["y_shape"]],
        "z_shape": [int(v) for v in blob["z_shape"]],
        "hw": [int(v) for v in blob["hw"]],
        "len_y": len(blob["y"]),
        "len_z": len(blob["z"]),
        "rans_format": 3 if blob["y"][:4] == b"NR3\x01" else 2,
        "model": model_info,
    }
    payload = json.dumps(header, sort_keys=True).encode()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(NICX_MAGIC)
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)
        f.write(blob["y"])
        f.write(blob["z"])
    os.replace(tmp, path)  # atomic, like the artifact writer
    return len(NICX_MAGIC) + 4 + len(payload) + len(blob["y"]) + len(blob["z"])


def read_nicx(path: str) -> tuple[dict, dict]:
    """Read a .nicx file → (blob dict for HyperpriorCodec.decompress,
    header's ``model`` info for the caller to verify)."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(NICX_MAGIC):
        raise ValueError(f"{path}: not a .nicx bitstream (bad magic)")
    (hlen,) = struct.unpack_from("<I", data, len(NICX_MAGIC))
    off = len(NICX_MAGIC) + 4
    header = json.loads(data[off : off + hlen].decode())
    off += hlen
    y = data[off : off + header["len_y"]]
    off += header["len_y"]
    z = data[off : off + header["len_z"]]
    if len(y) != header["len_y"] or len(z) != header["len_z"]:
        raise ValueError(f"{path}: truncated bitstream")
    blob = {
        "y": y,
        "z": z,
        "a_y": header["a_y"],
        "a_z": header["a_z"],
        "y_shape": tuple(header["y_shape"]),
        "z_shape": tuple(header["z_shape"]),
        "hw": tuple(header["hw"]),
    }
    return blob, header.get("model", {})

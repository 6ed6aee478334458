"""Compressed-artifact + checkpoint I/O.

One coherent format replaces the reference's scattered
``model/*.pth`` + ``feature_pyramid/*.pth`` + ``comp/*.npy`` artifacts
(SURVEY.md Appendix B; image_compression.py:380-396 of
21K1113/Neural_Image_Compression_V2):

- :func:`save_compressed` / :func:`load_compressed` — a single ``.npz``
  holding the decoder MLP params, the **bit-packed** pyramid (true b-bit
  payload, not one-byte-per-code like fp_def.py:250-255), and the config
  JSON needed to rebuild the decode graph. This is the "ship it" file a
  decoder-only runtime loads.
- :func:`save_latent` / :func:`load_latent` — conv-AE uint8 latent
  (image_comp.py:124-152 parity).
- :func:`save_checkpoint` / :func:`load_checkpoint` — mid-training
  params+opt-state snapshots for resume (movie_3d_comp.py:29-35
  ``encode_from_middle`` parity), step-tagged.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from nic.core.quant import pack_grid, unpack_grid

# native (C++) bit-packing when libnic_native.so is built; numpy otherwise
from nic.native import pack_bits, unpack_bits

__all__ = [
    "save_compressed",
    "load_compressed",
    "compressed_num_bits",
    "save_latent",
    "load_latent",
    "save_checkpoint",
    "load_checkpoint",
    "CheckpointManager",
]


def _atomic_savez(path: str, **arrays) -> None:
    """np.savez to a tmp file in the same dir, then os.replace into place.

    Every artifact/checkpoint write goes through here so a preemption or
    kill mid-write (exactly the scenario TF_RESUME targets) can never
    leave a truncated file at the final path.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"  # keep the .npz suffix so savez doesn't append
    try:
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _flatten_tree(tree, prefix: str) -> dict:
    flat = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        key = prefix + "/" + "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_compressed(
    path: str,
    mlp_params: dict,
    pyramid,
    fp_bits: int,
    meta: dict,
    mlp_store_bits: int = 32,
    entropy_coded: bool = False,
) -> int:
    """Write the single-file compressed artifact. Returns payload bits
    (pyramid codes + MLP params) for bpp accounting.

    ``mlp_store_bits=16`` stores the decoder weights as float16, halving
    the fixed per-image MLP overhead (~1.1 bpp at 512² defaults → ~0.56)
    for a negligible PSNR cost; the loader upcasts.

    ``entropy_coded=True`` rANS-codes each grid's codes against its own
    histogram (stored alongside, 2^bits ints) instead of fixed-length
    packing — lossless, and smaller whenever the trained code distribution
    is non-uniform. An extension past the reference, whose rate is always
    exactly fp_bits per element."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: dict = {}
    shapes = []
    from nic.obs.integrity import verified_result

    for i, g in enumerate(pyramid):
        # SDC-guarded fetch: the artifact is the product — a corrupted
        # device→host transfer here would silently poison it
        # (nic/obs/integrity.py; axon-tunnel finding, NOTES_r3.md)
        codes = verified_result(lambda g=g: np.asarray(pack_grid(g, fp_bits)))
        shapes.append(list(codes.shape))
        if entropy_coded:
            from nic.io.entropy import quantize_pmf
            from nic.native import rans_encode

            flat = codes.reshape(-1)
            hist = np.bincount(flat, minlength=2**fp_bits).astype(np.int64)
            cdf = quantize_pmf(hist / max(1, hist.sum()))[None, :]
            blob = rans_encode(flat.astype(np.int32),
                               np.zeros(flat.size, np.int32), cdf)
            arrays[f"grid{i}"] = np.frombuffer(blob, np.uint8)
            arrays[f"hist{i}"] = hist
            continue
        arrays[f"grid{i}"] = pack_bits(codes, fp_bits)
    if mlp_store_bits == 16:
        mlp_params = jax.tree.map(
            lambda p: np.asarray(p).astype(np.float16), mlp_params
        )
    arrays.update(_flatten_tree(mlp_params, "mlp"))
    meta = dict(meta)
    meta["fp_bits"] = fp_bits
    meta["grid_shapes"] = shapes
    meta["entropy_coded"] = entropy_coded
    if entropy_coded:
        # 3 = 64-lane shared-stream (SIMD decode), 2 = per-lane streams;
        # informational only — the decoder auto-detects on the magic
        meta["rans_format"] = 3 if arrays["grid0"][:4].tobytes() == b"NR3\x01" else 2
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    _atomic_savez(path, **arrays)

    if entropy_coded:
        payload_bits = sum(
            arrays[f"grid{i}"].size * 8 + arrays[f"hist{i}"].size * 32
            for i in range(len(pyramid))
        )
    else:
        payload_bits = sum(int(np.prod(s)) for s in shapes) * fp_bits
    payload_bits += sum(
        int(np.asarray(p).size) * np.asarray(p).dtype.itemsize * 8
        for p in jax.tree.leaves(mlp_params)
    )
    return payload_bits


def load_compressed(path: str, dtype=jnp.float32):
    """Read the artifact → (mlp_params, pyramid, meta)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        fp_bits = meta["fp_bits"]
        pyramid = []
        for i, shape in enumerate(meta["grid_shapes"]):
            count = int(np.prod(shape))
            if meta.get("entropy_coded"):
                from nic.io.entropy import quantize_pmf
                from nic.native import rans_decode

                hist = z[f"hist{i}"]
                cdf = quantize_pmf(hist / max(1, hist.sum()))[None, :]
                codes = rans_decode(
                    z[f"grid{i}"].tobytes(), np.zeros(count, np.int32), cdf,
                    legacy=meta.get("rans_format", 1) == 1,
                ).astype(np.uint8).reshape(shape)
            else:
                codes = unpack_bits(z[f"grid{i}"], fp_bits, count).reshape(shape)
            pyramid.append(unpack_grid(jnp.asarray(codes), fp_bits, dtype))
        mlp: dict = {}
        for key in z.files:
            if key.startswith("mlp/"):
                mlp[key[4:]] = jnp.asarray(z[key], dtype)
    return mlp, tuple(pyramid), meta


def compressed_num_bits(path: str) -> int:
    """True payload bits of a saved artifact, computed from what is
    actually stored: entropy-coded blob sizes + histogram overhead when
    ``entropy_coded``, fixed-length code bits otherwise, plus the MLP
    params at their stored dtype (fp16 under MLP_STORE_BITS=16)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta.get("entropy_coded"):
            bits = sum(
                int(z[f"grid{i}"].size) * 8 + int(z[f"hist{i}"].size) * 32
                for i in range(len(meta["grid_shapes"]))
            )
        else:
            bits = sum(int(np.prod(s)) for s in meta["grid_shapes"]) * meta["fp_bits"]
        for key in z.files:
            if key.startswith("mlp/"):
                bits += z[key].size * z[key].dtype.itemsize * 8
    return bits


def save_latent(path: str, latent_codes: np.ndarray, num_bits: int) -> None:
    """Conv-AE latent codes (0..2^b-1) → uint8 .npy (image_comp.py:131-139)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, np.asarray(latent_codes).astype(np.uint8))


def load_latent(path: str, num_bits: int, dtype=jnp.float32):
    """uint8 .npy → dequantized latent in [0,1] (image_comp.py:142-145)."""
    codes = np.load(path)
    return jnp.asarray(codes, dtype) / (2.0**num_bits - 1.0)


def save_checkpoint(path: str, step: int, params, opt_state=None, extra: dict | None = None) -> None:
    """Step-tagged training snapshot (npz of flattened pytrees).
    Atomic (tmp + replace) so a mid-write kill never corrupts a resume."""
    arrays = _flatten_tree(params, "params")
    if opt_state is not None:
        arrays.update(_flatten_tree(opt_state, "opt"))
    meta = {"step": step, **(extra or {})}
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    _atomic_savez(path, **arrays)


class CheckpointManager:
    """Step-tagged checkpoints with retention — the preemption-safe manager
    SURVEY.md §5 calls for (the reference only has manual every-100k saves,
    image_compression.py:301-303). Atomic writes (tmp + rename), keeps the
    newest ``keep`` snapshots, ``latest()`` for resume-after-kill."""

    def __init__(self, directory: str, name: str = "ckpt", keep: int = 3):
        self.directory = directory
        self.name = name
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"{self.name}_{step:012d}.npz")

    def steps(self) -> list[int]:
        out = []
        for f in os.listdir(self.directory):
            if f.startswith(self.name + "_") and f.endswith(".npz"):
                try:
                    out.append(int(f[len(self.name) + 1 : -4]))
                except ValueError:
                    pass
        return sorted(out)

    def path_for(self, step: int) -> str:
        """Checkpoint path for ``step`` (for writers that serialize their
        own composite state, e.g. NTCTrainer.save_checkpoint); call
        :meth:`prune` afterwards to apply retention."""
        return self._path(step)

    def prune(self) -> None:
        for old in self.steps()[: -self.keep]:
            os.remove(self._path(old))

    def save(self, step: int, params, opt_state=None, extra: dict | None = None) -> str:
        path = self._path(step)
        save_checkpoint(path, step, params, opt_state, extra)  # atomic
        self.prune()
        return path

    def latest(self) -> str | None:
        steps = self.steps()
        return self._path(steps[-1]) if steps else None

    def paths_newest_first(self) -> list[str]:
        """All retained checkpoint paths, newest first — resume loaders
        should walk this list so an unreadable newest snapshot falls back
        to the previous good one."""
        return [self._path(s) for s in reversed(self.steps())]

    def restore_latest(self, params_template, opt_template=None):
        path = self.latest()
        if path is None:
            return None
        return load_checkpoint(path, params_template, opt_template)


def load_checkpoint(path: str, params_template, opt_template=None):
    """Restore (step, params[, opt_state]) into the template pytree shapes."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())

        def restore(template, prefix):
            leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
            new_leaves = []
            for path_keys, leaf in leaves_with_paths:
                key = prefix + "/" + "/".join(
                    str(getattr(p, "key", getattr(p, "idx", p))) for p in path_keys
                )
                arr = z[key]
                if tuple(arr.shape) != tuple(np.shape(leaf)):
                    # loading a checkpoint into a template built from a
                    # different architecture (e.g. hyperprior --n/--m not
                    # matching the trained model) must fail loudly, not
                    # restore silently-wrong params
                    raise ValueError(
                        f"checkpoint {path!r} field {key}: stored shape "
                        f"{tuple(arr.shape)} != template {tuple(np.shape(leaf))}"
                        " — config/architecture mismatch"
                    )
                new_leaves.append(jnp.asarray(arr, jnp.asarray(leaf).dtype))
            return jax.tree_util.tree_unflatten(treedef, new_leaves)

        params = restore(params_template, "params")
        if opt_template is not None:
            return meta["step"], params, restore(opt_template, "opt")
    return meta["step"], params

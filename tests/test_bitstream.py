"""Persistent .nicx bitstream container + hyperprior_codec CLI.

Covers: file roundtrip is bit-exact with the in-process blob decode,
the parameter digest binds bitstreams to their checkpoint (wrong model
fails loudly), and container-level corruption is detected.
"""

import os

import numpy as np
import pytest

from nic.io.bitstream import params_digest, read_nicx, write_nicx


def _toy_images(n, size, seed=0):
    rng = np.random.default_rng(seed)
    xs = np.linspace(0, 1, size, dtype=np.float32)
    out = []
    for i in range(n):
        g = np.stack(np.meshgrid(xs, xs), -1).sum(-1) / 2
        noise = rng.uniform(0, 0.2, (size, size, 3)).astype(np.float32)
        out.append(np.clip(g[..., None] * 0.8 + noise + 0.05 * i, 0, 1))
    return out


@pytest.fixture(scope="module")
def tiny_codec_ckpt(tmp_path_factory):
    from nic.train.hyperprior import HyperpriorCodec, HyperpriorTrainer

    tr = HyperpriorTrainer(n=16, m=24, lam=0.01, patch=64, batch=2, seed=0)
    imgs = _toy_images(2, 64)
    rng = np.random.default_rng(2)
    for _ in range(5):
        tr.train_step(tr.sample_patches(imgs, rng))
    path = str(tmp_path_factory.mktemp("ckpt") / "ckpt_000000000005.npz")
    tr.save_checkpoint(path)
    return path, HyperpriorCodec(tr)


def test_nicx_roundtrip_bit_exact(tiny_codec_ckpt, tmp_path):
    _, codec = tiny_codec_ckpt
    img = _toy_images(1, 80, seed=3)[0]
    blob = codec.compress(img)
    path = str(tmp_path / "x.nicx")
    total = write_nicx(path, blob, {"n": 16, "m": 24, "params_digest": "d"})
    assert os.path.getsize(path) == total
    blob2, model = read_nicx(path)
    assert model["params_digest"] == "d"
    assert blob2["y"] == blob["y"] and blob2["z"] == blob["z"]
    for k in ("a_y", "a_z", "y_shape", "z_shape", "hw"):
        assert tuple(np.atleast_1d(blob2[k])) == tuple(np.atleast_1d(blob[k]))
    np.testing.assert_array_equal(codec.decompress(blob2),
                                  codec.decompress(blob))


def test_nicx_rejects_corruption(tiny_codec_ckpt, tmp_path):
    _, codec = tiny_codec_ckpt
    img = _toy_images(1, 64, seed=4)[0]
    blob = codec.compress(img)
    path = str(tmp_path / "x.nicx")
    write_nicx(path, blob, {})
    raw = open(path, "rb").read()
    open(path, "wb").write(b"JUNK" + raw[4:])
    with pytest.raises(ValueError, match="magic"):
        read_nicx(path)
    open(path, "wb").write(raw[: len(raw) - 8])  # truncate payload
    with pytest.raises(ValueError, match="truncated"):
        read_nicx(path)


def test_codec_cli_roundtrip_and_digest_binding(tiny_codec_ckpt, tmp_path):
    from PIL import Image

    from nic.cli.hyperprior_codec import run

    ckpt, codec = tiny_codec_ckpt
    img = _toy_images(1, 96, seed=5)[0]
    img_u8 = (img * 255 + 0.5).astype(np.uint8)
    img_path = str(tmp_path / "in.png")
    Image.fromarray(img_u8).save(img_path)

    bs = str(tmp_path / "in.nicx")
    res = run(["compress", img_path, "--ckpt", ckpt, "--n", "16", "--m", "24",
               "--out", bs])
    assert os.path.exists(bs) and res["bpp"] > 0

    out_png = str(tmp_path / "dec.png")
    run(["decompress", bs, "--ckpt", ckpt, "--n", "16", "--m", "24",
         "--out", out_png])
    rec_cli = np.asarray(Image.open(out_png), np.float32) / 255.0
    # the CLI wrote exactly the codec's decompression of what it compressed
    ref = codec.decompress(codec.compress(np.asarray(img_u8, np.float32) / 255.0))
    np.testing.assert_allclose(rec_cli, ref, atol=1.0 / 255.0 + 1e-6)

    # a different model must be rejected by the digest check
    from nic.train.hyperprior import HyperpriorTrainer

    other = HyperpriorTrainer(n=16, m=24, lam=0.01, patch=64, batch=2, seed=9)
    other_ckpt = str(tmp_path / "other.npz")
    other.save_checkpoint(other_ckpt)
    with pytest.raises(ValueError, match="digest|encoded by model"):
        run(["decompress", bs, "--ckpt", other_ckpt, "--n", "16", "--m", "24",
             "--out", str(tmp_path / "bad.png")])
    # unless explicitly forced
    run(["decompress", bs, "--ckpt", other_ckpt, "--n", "16", "--m", "24",
         "--allow_model_mismatch", "--out", str(tmp_path / "forced.png")])
    assert os.path.exists(str(tmp_path / "forced.png"))


def test_params_digest_sensitivity(tiny_codec_ckpt):
    _, codec = tiny_codec_ckpt
    d1 = params_digest(codec.t.params)
    import jax

    bumped = jax.tree.map(lambda a: a, codec.t.params)
    d2 = params_digest(bumped)
    assert d1 == d2  # pure restructure → same digest
    leaves, treedef = jax.tree_util.tree_flatten(codec.t.params)
    leaves = [np.asarray(v).copy() for v in leaves]
    leaves[0].flat[0] += 1e-3
    d3 = params_digest(jax.tree_util.tree_unflatten(treedef, leaves))
    assert d3 != d1

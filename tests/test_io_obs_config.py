"""Unit tests: artifact/checkpoint I/O, asset helpers, logging, config."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nic.config import CompressionConfig, config_echo, parse_overrides
from nic.data import assets
from nic.io import artifacts
from nic.obs.log import RunLog, ScalarWriter, make_filename_by_seq


# ---------------- config ----------------

def test_config_defaults_match_reference():
    cfg = CompressionConfig()
    assert cfg.decoder_input_channels == 12 * 5 + 6 * 2 + 1  # 73 (var2.py:114)
    assert cfg.feature_pyramid_size == 128
    assert cfg.crop_size == 256
    assert cfg.effective_max_mip_level == 0  # TF_NO_MIP default


def test_config_overrides_uppercase_keys():
    cfg = parse_overrides([
        "FP_BITS=4", "COMPRESSION_METHOD=4", "IMAGE_DIMENSION=3",
        "TF_NO_MIP=False", "UNIFORM_DISTRIBUTION_RATE=0.1",
        "IMAGE_PATH=data/misty_64_64.avi",
    ])
    assert cfg.fp_bits == 4 and cfg.compression_method == 4
    assert cfg.image_dtype == "movie"
    # method 4: sparse G0 → C·5 + PE·3 + 1 (var2.py:117-118)
    assert cfg.decoder_input_channels == 12 * 5 + 6 * 3 + 1
    assert not cfg.tf_no_mip and cfg.effective_max_mip_level == 9
    assert cfg.uniform_distribution_rate == 0.1


def test_config_method2_flattens_to_2d():
    cfg = parse_overrides(["COMPRESSION_METHOD=2", "IMAGE_DIMENSION=3"])
    assert cfg.fp_dimension == 2


def test_config_rejects_unknown_and_bad_bool():
    with pytest.raises(ValueError):
        parse_overrides(["NOT_A_KEY=1"])
    with pytest.raises(ValueError):
        parse_overrides(["TF_NO_MIP=maybe"])


def test_config_echo_covers_whitelist():
    lines = config_echo(CompressionConfig())
    assert any(l.startswith("FP_BITS :") for l in lines)
    assert any(l.startswith("TF_USE_TRI_PE :") for l in lines)


# ---------------- obs/log ----------------

def test_make_filename_by_seq(tmp_path):
    d = str(tmp_path / "printlog")
    p0 = make_filename_by_seq(d, "run.txt")
    assert p0.endswith("run_000.txt")
    open(p0, "w").write("x")
    p1 = make_filename_by_seq(d, "run.txt")
    assert p1.endswith("run_001.txt")


def test_runlog_and_span(tmp_path):
    path = str(tmp_path / "log.txt")
    log = RunLog(path)
    log("hello")
    with log.span("phase"):
        pass
    text = open(path).read()
    assert "hello" in text and "phase: " in text


def test_scalar_writer_csv(tmp_path):
    csv_path = str(tmp_path / "scalars.csv")
    w = ScalarWriter(None, csv_path)
    w.add_scalar("Loss/train_epoch_label", 0.5, 1)
    w.add_scalar("PSNR/epoch", 30.0, 1)
    w.close()
    text = open(csv_path).read()
    assert "Loss/train_epoch_label,1,0.5" in text


# ---------------- data/assets ----------------

def test_image_mips(tmp_path):
    img = (np.random.default_rng(0).uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    p = str(tmp_path / "a.png")
    assets.save_png(img, p)
    mips = assets.load_image_mips(p, 64, 3)
    assert [m.shape for m in mips] == [(3, 64, 64), (3, 32, 32), (3, 16, 16), (3, 8, 8)]
    assert mips[0].max() <= 1.0


def test_video_roundtrip(tmp_path):
    movie = (np.random.default_rng(1).uniform(0, 255, (8, 16, 16, 3))).astype(np.uint8)
    p = str(tmp_path / "v.avi")
    assets.write_timelaps(movie, p)
    back = assets.read_clip(p)
    assert back.shape == (8, 16, 16, 3)  # lossy codec: shape-only check


def test_flatten_unflatten_roundtrip():
    vol = np.arange(16 * 8 * 8 * 3).reshape(16, 8, 8, 3).astype(np.uint8)
    sheet = assets.flatten_3d_to_2d(vol, 32)
    assert sheet.shape == (32, 32, 3)
    back = assets.unflatten_2d_to_3d(sheet, 8, 16)
    np.testing.assert_array_equal(back, vol)


def test_save_lut_csv(tmp_path):
    lut = np.random.default_rng(2).uniform(0, 1, (4, 4, 4, 3)).astype(np.float32)
    p = str(tmp_path / "lut.csv")
    assets.save_lut_csv(lut, p)
    lines = open(p).read().strip().splitlines()
    assert len(lines) == 16  # size² rows
    assert len(lines[0].rstrip(",").split(",")) == 4 * 3


def test_asset_kind():
    assert assets.asset_kind("x.npy") == "ndarray"
    assert assets.asset_kind("x.AVI") == "movie"
    assert assets.asset_kind("x.jpeg") == "image"
    with pytest.raises(ValueError):
        assets.asset_kind("x.txt")


# ---------------- io/artifacts ----------------

def test_checkpoint_roundtrip(tmp_path):
    import optax

    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    upd, opt = tx.update(g, opt, params)
    params = optax.apply_updates(params, upd)
    p = str(tmp_path / "c.ckpt.npz")
    artifacts.save_checkpoint(p, 7, params, opt, extra={"note": "t"})
    step, p2, o2 = artifacts.load_checkpoint(p, params, opt)
    assert step == 7
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(o2), jax.tree.leaves(opt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_latent_roundtrip(tmp_path):
    codes = np.random.default_rng(0).integers(0, 16, (1, 8, 8, 8)).astype(np.uint8)
    p = str(tmp_path / "l.npy")
    artifacts.save_latent(p, codes, 4)
    z = artifacts.load_latent(p, 4)
    np.testing.assert_allclose(np.asarray(z) * 15.0, codes, atol=1e-5)


def test_compressed_num_bits(tmp_path):
    from nic.grids.pyramid import create_pyramid
    from nic.models.mlp import init_mlp, mlp_param_bits
    from nic.grids.pyramid import pyramid_bits

    fp, _ = create_pyramid(jax.random.PRNGKey(0), 16, 4, 2, ndim=2, no_mip=True)
    mlp = init_mlp(jax.random.PRNGKey(1), 29, 16, 3)
    p = str(tmp_path / "a.npz")
    bits = artifacts.save_compressed(p, mlp, fp, 2, {})
    assert bits == artifacts.compressed_num_bits(p)
    assert bits == pyramid_bits(fp, 2) + mlp_param_bits(mlp)
    # 2-bit packing: file grid payload is a quarter of one-byte-per-code
    import numpy as _np

    with _np.load(p) as z:
        grid_bytes = z["grid0"].nbytes + z["grid1"].nbytes
    assert grid_bytes <= (fp[0].size + fp[1].size) // 4 + 2


def test_checkpoint_manager(tmp_path):
    import jax.numpy as jnp

    mgr = artifacts.CheckpointManager(str(tmp_path / "ck"), keep=2)
    assert mgr.latest() is None
    params = {"w": jnp.ones((2, 2))}
    for step in (10, 20, 30):
        mgr.save(step, {"w": params["w"] * step})
    assert mgr.steps() == [20, 30]  # retention pruned step 10
    step, restored = artifacts.load_checkpoint(mgr.latest(), params)
    assert step == 30
    np.testing.assert_allclose(np.asarray(restored["w"]), 30.0)
    got = mgr.restore_latest(params)
    assert got[0] == 30


def test_mlp_store_bits_16(tmp_path):
    from nic.grids.pyramid import create_pyramid
    from nic.models.mlp import init_mlp

    fp, _ = create_pyramid(jax.random.PRNGKey(0), 16, 4, 4, ndim=2, no_mip=True)
    mlp = init_mlp(jax.random.PRNGKey(1), 29, 16, 3)
    p32 = str(tmp_path / "a32.npz")
    p16 = str(tmp_path / "a16.npz")
    bits32 = artifacts.save_compressed(p32, mlp, fp, 4, {})
    bits16 = artifacts.save_compressed(p16, mlp, fp, 4, {}, mlp_store_bits=16)
    from nic.grids.pyramid import pyramid_bits

    grid_bits = pyramid_bits(fp, 4)
    assert bits16 - grid_bits == (bits32 - grid_bits) // 2
    mlp16, _, _ = artifacts.load_compressed(p16)
    for k in mlp:
        np.testing.assert_allclose(np.asarray(mlp16[k]), np.asarray(mlp[k]),
                                   atol=2e-3)


def test_entropy_coded_artifact_roundtrip(tmp_path):
    from nic.grids.pyramid import create_pyramid, pyramid_quantize_all
    from nic.models.mlp import init_mlp

    bits = 4
    fp, _ = create_pyramid(jax.random.PRNGKey(0), 32, 4, bits, ndim=2, no_mip=True)
    # skew the distribution so entropy < bits
    fp = tuple(g * 0.2 for g in fp)
    fp = pyramid_quantize_all(fp, bits)
    mlp = init_mlp(jax.random.PRNGKey(1), 29, 16, 3)
    p_fix = str(tmp_path / "fix.npz")
    p_ent = str(tmp_path / "ent.npz")
    bits_fix = artifacts.save_compressed(p_fix, mlp, fp, bits, {})
    bits_ent = artifacts.save_compressed(p_ent, mlp, fp, bits, {},
                                         entropy_coded=True)
    mlp_e, fp_e, meta = artifacts.load_compressed(p_ent)
    assert meta["entropy_coded"]
    for a, b in zip(fp_e, fp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # skewed codes entropy-code smaller than fixed-length packing
    assert bits_ent < bits_fix


def test_compressed_num_bits_entropy_coded(tmp_path):
    """compressed_num_bits must report the actual stored payload for
    entropy-coded artifacts (blobs + histograms), not fixed-length bits
    (ADVICE r1)."""
    from nic.grids.pyramid import create_pyramid
    from nic.models.mlp import init_mlp

    fp, _ = create_pyramid(jax.random.PRNGKey(0), 16, 4, 4, ndim=2, no_mip=True)
    mlp = init_mlp(jax.random.PRNGKey(1), 29, 16, 3)
    p = str(tmp_path / "ec.npz")
    bits = artifacts.save_compressed(p, mlp, fp, 4, {}, entropy_coded=True)
    assert bits == artifacts.compressed_num_bits(p)


def test_compressed_num_bits_fp16_mlp(tmp_path):
    """Stored-fp16 MLP weights must be counted at 16 bits even though the
    loader upcasts to fp32 (ADVICE r1)."""
    from nic.grids.pyramid import create_pyramid
    from nic.models.mlp import init_mlp, mlp_param_bits

    fp, _ = create_pyramid(jax.random.PRNGKey(0), 16, 4, 4, ndim=2, no_mip=True)
    mlp = init_mlp(jax.random.PRNGKey(1), 29, 16, 3)
    p = str(tmp_path / "h.npz")
    bits = artifacts.save_compressed(p, mlp, fp, 4, {}, mlp_store_bits=16)
    assert bits == artifacts.compressed_num_bits(p)
    assert artifacts.compressed_num_bits(p) < 16 * 16 + mlp_param_bits(mlp)


def test_checkpoint_write_is_atomic(tmp_path, monkeypatch):
    """A kill mid-write must never leave a truncated file at the final
    checkpoint path (ADVICE r1 medium)."""
    import jax.numpy as jnp

    path = str(tmp_path / "c.npz")
    orig_savez = np.savez

    def exploding_savez(file, **arrays):
        orig_savez(file, **arrays)
        raise KeyboardInterrupt("simulated preemption after write, before replace")

    # crash between tmp-write and replace: final path must not exist
    monkeypatch.setattr(np, "savez", exploding_savez)
    try:
        artifacts.save_checkpoint(path, 1, {"w": jnp.ones((2,))})
    except KeyboardInterrupt:
        pass
    monkeypatch.setattr(np, "savez", orig_savez)
    assert not os.path.exists(path)
    assert not os.path.exists(path + ".tmp.npz")  # tmp cleaned up
    artifacts.save_checkpoint(path, 2, {"w": jnp.ones((2,))})
    assert os.path.exists(path)


def test_checkpoint_manager_fallback_list(tmp_path):
    import jax.numpy as jnp

    mgr = artifacts.CheckpointManager(str(tmp_path / "ck"), keep=3)
    for step in (10, 20):
        mgr.save(step, {"w": jnp.ones((2,)) * step})
    newest_first = mgr.paths_newest_first()
    assert newest_first == [mgr.path_for(20), mgr.path_for(10)]
    # corrupt the newest; a resume loop must be able to read the older one
    with open(mgr.path_for(20), "wb") as f:
        f.write(b"garbage")
    import pytest

    with pytest.raises(Exception):
        artifacts.load_checkpoint(newest_first[0], {"w": jnp.ones((2,))})
    step, params = artifacts.load_checkpoint(newest_first[1], {"w": jnp.ones((2,))})
    assert step == 10


def test_scalar_writer_nonfinite_scalars(tmp_path):
    """Mip-mode in-train PSNR hits +inf on exactly-reconstructed tiny
    crops; TB rejects non-finite points (torch warns per point), so the
    TB sink skips them while the CSV mirror records the true value."""
    import math

    from nic.obs.log import ScalarWriter

    csv_path = str(tmp_path / "s.csv")
    w = ScalarWriter(str(tmp_path / "tb"), csv_path)
    w.add_scalar("PSNR/epoch", float("inf"), 1)
    w.add_scalar("PSNR/epoch", float("nan"), 2)
    w.add_scalar("PSNR/epoch", 33.5, 3)
    w.close()
    rows = open(csv_path).read().strip().splitlines()
    assert rows[1].endswith("inf") and rows[3].endswith("33.5")
    assert math.isnan(float(rows[2].split(",")[-1]))

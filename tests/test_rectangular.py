"""Native rectangular geometry (IMAGE_SIZE_W) — round-4 north-star
extension. The reference is square-only (var2.py:60 of
21K1113/Neural_Image_Compression_V2); a real Kodak harness must score
768x512 frames natively. Covers: per-axis pyramids, rectangular crops,
folded rectangular decode, artifact/decoder-runtime roundtrip, and the
eval_rd --native-geometry path."""

import os

import numpy as np
import pytest

from nic.cli.image_compression import load_asset
from nic.config import CompressionConfig
from nic.core.metrics import psnr
from nic.train.ntc import NTCTrainer


def _cfg(**kw):
    base = dict(image_size=64, image_size_w=96, crop_mip_level=5,
                num_epochs=400, qat_noise_where="node")
    base.update(kw)
    return CompressionConfig(**base)


def test_rect_train_decode_end_to_end():
    cfg = _cfg()
    imgs = load_asset(cfg)
    assert imgs[0].shape == (3, 64, 96)
    tr = NTCTrainer(cfg, imgs)
    # per-axis grids: [C, H/4+1, W/4+1] and the half-res pair
    assert tr.state.fp[0].shape == (12, 17, 25)
    assert tr.state.fp[1].shape == (12, 9, 13)
    tr.train_many(400, chunk=100)
    rec = np.asarray(tr.decode(0))
    assert rec.shape == (64, 96, 3)
    tgt = np.moveaxis(np.asarray(imgs[0]), 0, -1)
    # max_value=1.0: rec/tgt are [0,1] floats — the default 2^8
    # convention is for 0..255 codes and would inflate by ~48 dB
    # (round-5 fix; measured 23.9 dB at this protocol)
    assert float(psnr(rec, tgt, max_value=1.0)) > 21.0


def test_rect_kodak_shape_trains():
    """The Kodak 768x512 geometry compiles and runs (3 steps + decode)."""
    cfg = _cfg(image_size=512, image_size_w=768, crop_mip_level=8,
               num_epochs=100)
    imgs = load_asset(cfg)
    assert imgs[0].shape == (3, 512, 768)
    tr = NTCTrainer(cfg, imgs)
    tr.train_many(3, chunk=3)
    rec = np.asarray(tr.decode(0))
    assert rec.shape == (512, 768, 3)


def test_rect_trainer_pallas_backend_matches_fast():
    """Rectangular decode through DECODE_BACKEND=pallas (the fused v2
    kernel's rectangular tile grid — round-5 directive #1) must match the
    folded XLA backend bit-near. Before round 5 rect silently fell back
    to the 0.1 GPix/s folded path."""
    from jax.experimental.pallas import tpu as pltpu

    outs = {}
    for backend in ("fast", "pallas"):
        cfg = _cfg(image_size=32, image_size_w=64, crop_mip_level=4,
                   num_crops=2, num_epochs=5, fp_bits=8,
                   feature_pyramid_channels=4, pe_channels=4,
                   hidden_layer_channels=16, seed=0,
                   decode_backend=backend)
        tr = NTCTrainer(cfg, load_asset(cfg))
        with pltpu.force_tpu_interpret_mode():
            outs[backend] = np.asarray(tr.decode(0, div_size=10))
    assert outs["pallas"].shape == (32, 64, 3)
    np.testing.assert_allclose(outs["pallas"], outs["fast"], atol=2e-5)


def test_rect_decode_runtime_pallas_backend(tmp_path):
    """The decoder-only runtime must route a rectangular artifact through
    the fused kernel when --backend pallas is requested (interpret mode
    off-TPU) and reproduce the folded decode."""
    from nic.cli.decode import run as decode_main
    from nic.io.artifacts import save_compressed

    cfg = _cfg(num_epochs=50)
    imgs = load_asset(cfg)
    tr = NTCTrainer(cfg, imgs)
    tr.train_many(50, chunk=50)
    tr.freeze_and_quantize()
    art = str(tmp_path / "rectp.npz")
    save_compressed(
        art, tr.state.mlp, tr.state.fp, cfg.fp_bits,
        {"save_name": "rectp", "config": {
            "image_size": cfg.image_size, "image_size_w": cfg.image_size_w,
            "pe_channels": cfg.pe_channels, "tf_use_tri_pe": True,
            "tf_no_mip": True, "compression_method": 1,
            "image_dimension": 2}},
    )
    fast = decode_main([art, "--backend", "fast"])
    pallas = decode_main([art, "--backend", "pallas"])
    assert np.asarray(pallas).shape == (64, 96, 3)
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(fast),
                               atol=2e-5)


def test_rect_mip_training_end_to_end():
    """Rect + mip/LOD — the reference's flagship mode
    (image_compression.py:221-245) on Kodak-shaped geometry (round-5
    directive #4; the round-4 gate raised ValueError here). Trains with
    LOD sampling across mips, then decodes every mip at its own
    per-axis size."""
    cfg = _cfg(tf_no_mip=False, max_mip_level=3, num_epochs=300)
    imgs = load_asset(cfg)
    assert imgs[2].shape == (3, 16, 24)
    tr = NTCTrainer(cfg, imgs)
    # per-axis pyramid with min-axis level count, mip map consistent
    assert len(tr.state.fp) == 2 * tr.levels
    assert max(tr.mip_to_level.values()) <= tr.levels - 1
    tr.train_many(300, chunk=100)
    for mip in range(cfg.max_mip_level + 1):
        rec = np.asarray(tr.decode(mip))
        assert rec.shape == (64 // 2**mip, 96 // 2**mip, 3)
    rec0 = np.asarray(tr.decode(0))
    tgt = np.moveaxis(np.asarray(imgs[0]), 0, -1)
    # [0,1] floats → max_value=1.0 (measured ~21.9 dB @200 steps)
    assert float(psnr(rec0, tgt, max_value=1.0)) > 17.0


def test_rect_mip_cli_run(tmp_path):
    """The flagship CLI in rect mip mode: train, per-mip decode/PSNR,
    artifact — the reference behavior (image_compression.py:400-404)
    rect previously couldn't reach."""
    from nic.cli.image_compression import run as icomp

    res = icomp(["IMAGE_SIZE=64", "IMAGE_SIZE_W=96", "CROP_MIP_LEVEL=5",
                 "NUM_EPOCHS=60", "MAX_MIP_LEVEL=2", "TF_NO_MIP=False",
                 "QAT_NOISE_WHERE=node", f"OUTPUT_ROOT={tmp_path}"])
    assert len(res["psnr"]) == 3 and res["bpp"] > 0


def test_rect_is_2d_only():
    cfg = _cfg(image_size=16, image_size_w=32, image_dimension=3,
               compression_method=3,
               image_path="data/misty_64_64.avi")
    with pytest.raises(ValueError):
        NTCTrainer(cfg, [np.zeros((3, 16, 16, 16), np.float32)])


def test_rect_artifact_roundtrip_through_decode_runtime(tmp_path):
    from nic.cli.decode import run as decode_main
    from nic.io.artifacts import save_compressed

    cfg = _cfg(num_epochs=200)
    imgs = load_asset(cfg)
    tr = NTCTrainer(cfg, imgs)
    tr.train_many(200, chunk=100)
    tr.freeze_and_quantize()
    art = str(tmp_path / "rect.npz")
    save_compressed(
        art, tr.state.mlp, tr.state.fp, cfg.fp_bits,
        {"save_name": "rect", "config": {
            "image_size": cfg.image_size, "image_size_w": cfg.image_size_w,
            "pe_channels": cfg.pe_channels, "tf_use_tri_pe": True,
            "tf_no_mip": True, "compression_method": 1,
            "image_dimension": 2}},
    )
    out = str(tmp_path / "rect.png")
    decode_main([art, "--out", out])
    from PIL import Image

    rec = np.asarray(Image.open(out), np.float32) / 255.0
    assert rec.shape == (64, 96, 3)
    ref = np.asarray(tr.decode(0))
    # the runtime must reproduce the trainer's own decode to u8 rounding
    assert np.abs(rec - ref).max() < 2.5 / 255.0


def test_eval_rd_native_geometry(tmp_path):
    from PIL import Image

    from nic.cli.eval_rd import run as eval_main

    d = str(tmp_path / "imgs")
    os.makedirs(d)
    rng = np.random.default_rng(0)
    # one landscape, one portrait — both % 4 == 0
    for name, (h, w) in (("a.png", (48, 64)), ("b.png", (64, 48))):
        arr = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(d, name))
    out = str(tmp_path / "rd.json")
    eval_main(["--dir", d, "--codec", "ntc", "--native-geometry",
               "--out", out, "--output_root", str(tmp_path),
               "NUM_EPOCHS=50", "CROP_MIP_LEVEL=5",
               "QAT_NOISE_WHERE=node"])
    import json

    res = json.load(open(out))
    assert res["protocol"]["geometry"].startswith("native")
    assert len(res["images"]) == 2 and res["mean_bpp"] > 0

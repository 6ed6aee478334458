"""Image-set (Kodak-protocol) RD evaluation harness: walks any directory
of images and reports per-image + mean PSNR/bpp (north-star extension —
the reference only ever scores its single overfit asset,
image_compression.py:482-489)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i, shape in enumerate([(32, 32), (48, 32)]):  # one non-square
        y, x = np.mgrid[0 : shape[0], 0 : shape[1]].astype(np.float32)
        img = np.stack(
            [np.sin(x / 4 + i), np.cos(y / 5), (x + y) / sum(shape)], axis=-1
        )
        img = ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / f"img{i}.png")
    return str(d)


def test_eval_rd_ntc(image_dir, tmp_path):
    from nic.cli.eval_rd import run

    out = str(tmp_path / "rd.json")
    res = run([
        "--dir", image_dir, "--codec", "ntc", "--out", out,
        "--output_root", str(tmp_path / "runs"),
        "IMAGE_SIZE=32", "NUM_EPOCHS=60", "FP_BITS=4",
        "FEATURE_PYRAMID_CHANNELS=4", "PE_CHANNELS=4",
        "HIDDEN_LAYER_CHANNELS=16", "CROP_MIP_LEVEL=4", "NUM_CROPS=2",
    ])
    assert len(res["images"]) == 2
    assert all(np.isfinite(r["psnr"]) and r["bpp"] > 0 for r in res["images"])
    assert res["mean_bpp"] > 0
    with open(out) as f:
        on_disk = json.load(f)
    assert on_disk["mean_psnr"] == res["mean_psnr"]
    assert on_disk["protocol"]["fp_bits"] == 4


def test_eval_rd_hyperprior(image_dir, tmp_path):
    from nic.cli.eval_rd import run
    from nic.io.artifacts import CheckpointManager
    from nic.train.hyperprior import HyperpriorTrainer

    # train a couple of steps and snapshot — the harness loads the newest
    # transforms downsample 16×/64× — patch must be a multiple of 64
    trainer = HyperpriorTrainer(n=8, m=12, lam=0.01, patch=64, batch=2, seed=0)
    imgs = [np.random.default_rng(1).random((64, 64, 3), np.float32)]
    rng = np.random.default_rng(2)
    for _ in range(2):
        trainer.train_step(trainer.sample_patches(imgs, rng))
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    trainer.save_checkpoint(mgr.path_for(trainer.step))

    res = run([
        "--dir", image_dir, "--codec", "hyperprior", "--ckpt", ckpt_dir,
        "--n", "8", "--m", "12", "--out", str(tmp_path / "hp.json"),
        "--output_root", str(tmp_path / "runs"),
    ])
    assert len(res["images"]) == 2
    for r in res["images"]:
        assert np.isfinite(r["psnr"])
        assert r["bpp_bitstream"] > 0
    assert res["mean_bpp_bitstream"] > 0

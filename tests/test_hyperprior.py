"""Hyperprior RD-training smoke tests (north-star extension)."""

import numpy as np
import pytest

from nic.train.hyperprior import HyperpriorTrainer, eval_image_set


def _toy_images(n=3, size=96):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
        img = np.stack([np.sin((i + 2) * x), y, x * y], axis=-1) * 0.5 + 0.25
        out.append(np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1).astype(np.float32))
    return out


def test_rd_training_reduces_loss():
    tr = HyperpriorTrainer(n=16, m=24, lam=0.01, patch=64, batch=2, seed=0)
    imgs = _toy_images()
    rng = np.random.default_rng(1)
    losses = []
    for _ in range(30):
        batch = tr.sample_patches(imgs, rng)
        loss, bpp, mse = tr.train_step(batch)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert float(bpp) > 0  # rate term is live


def test_eval_padding_and_bpp():
    tr = HyperpriorTrainer(n=16, m=24, lam=0.01, patch=64, batch=2, seed=0)
    img = _toy_images(1, 80)[0]  # 80 is not a multiple of 64 → pad path
    psnr, bpp, x_hat = tr.evaluate(img)
    assert x_hat.shape == img.shape
    assert np.isfinite(psnr) and bpp > 0


def test_eval_image_set(tmp_path):
    from PIL import Image

    tr = HyperpriorTrainer(n=16, m=24, lam=0.01, patch=64, batch=2, seed=0)
    paths = []
    for i, img in enumerate(_toy_images(2, 64)):
        p = str(tmp_path / f"i{i}.png")
        Image.fromarray((img * 255).astype(np.uint8)).save(p)
        paths.append(p)
    res = eval_image_set(tr, paths)
    assert len(res["images"]) == 2
    assert np.isfinite(res["mean_psnr"]) and res["mean_bpp"] > 0

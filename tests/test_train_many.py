"""Compiled multi-step (lax.scan) training paths must behave like the
per-step paths: same phase boundaries, comparable convergence."""

import numpy as np

from nic.config import CompressionConfig
from nic.train.conv_ae import ConvAETrainer
from nic.train.ntc import NTCTrainer
from nic.train.pixel import PixelTrainer


def _toy_image(size):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    return np.clip(np.stack([x, y, (x + y) / 2], axis=0), 0, 1)


def test_ntc_train_many_scan():
    cfg = CompressionConfig(
        image_size=32, crop_mip_level=4, num_crops=2, num_epochs=100,
        fp_bits=4, feature_pyramid_channels=4, pe_channels=4,
        hidden_layer_channels=16, tf_no_mip=True, seed=0,
    )
    img = _toy_image(32)
    tr = NTCTrainer(cfg, [img])
    losses, psnrs = tr.train_many(100, chunk=40)
    assert losses.shape == (100,) and psnrs.shape == (100,)
    assert tr.state.step == 100
    assert tr.state.frozen  # boundary at step 96 crossed inside the chunks
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_ntc_train_many_mip_scan():
    """Mip/LOD training runs in the compiled switch-in-scan path: one
    dispatch per chunk, LOD sequence identical to the per-step path."""
    cfg = CompressionConfig(
        image_size=32, crop_mip_level=4, num_crops=2, num_epochs=50,
        fp_bits=4, feature_pyramid_channels=4, pe_channels=4,
        hidden_layer_channels=16, tf_no_mip=False, max_mip_level=3, seed=0,
    )
    img = _toy_image(32)
    mips = [img[:, :: 2**i, :: 2**i] for i in range(4)]
    tr = NTCTrainer(cfg, mips)
    losses, psnrs = tr.train_many(50, chunk=20)
    assert losses.shape == (50,) and np.all(np.isfinite(losses))
    assert tr.state.step == 50
    assert tr.state.frozen  # 95% boundary (48) crossed inside a chunk
    # the compiled path must consume the SAME host LOD stream as the
    # per-step path (same gate + rng objects, same draw order)
    tr2 = NTCTrainer(cfg, mips)
    lods_per_step = [tr2.train_step()[2] for _ in range(50)]
    from nic.train.ntc import UniformLodSchedule, sample_lod

    rng = np.random.default_rng(cfg.seed + 1)
    gate = UniformLodSchedule(cfg.uniform_distribution_rate)
    expected = [sample_lod(rng, gate(), tr.max_mip) for _ in range(50)]
    assert lods_per_step == expected
    # mip decode still works from the scan-trained state at every level
    for mip in range(2):
        rec = np.asarray(tr.decode(mip))
        assert rec.shape == (32 // 2**mip,) * 2 + (3,)
        assert np.all(np.isfinite(rec))


def test_conv_ae_train_many():
    tr = ConvAETrainer(_toy_image(16).transpose(1, 2, 0), num_bits=4,
                       num_epochs=60, seed=0)
    losses = tr.train_many(60, chunk=25)
    assert losses.shape == (60,) and tr.step == 60
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_pixel_train_many():
    tr = PixelTrainer(_toy_image(16).transpose(1, 2, 0), num_epochs=60,
                      batch_pixels=32, seed=0)
    losses = tr.train_many(60, chunk=25)
    assert losses.shape == (60,) and tr.step == 60
    assert np.all(np.isfinite(losses))

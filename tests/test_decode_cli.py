"""Decoder-only runtime CLI: train → save artifact → decode standalone."""

import dataclasses
import os

import numpy as np

from nic.config import CompressionConfig
from nic.io.artifacts import save_compressed
from nic.train.ntc import NTCTrainer


def test_decode_cli_roundtrip(tmp_path):
    from nic.cli.decode import run as decode_run

    cfg = CompressionConfig(
        image_size=32, crop_mip_level=4, num_crops=2, num_epochs=40,
        fp_bits=4, feature_pyramid_channels=4, pe_channels=4,
        hidden_layer_channels=16, tf_no_mip=True, seed=0,
    )
    y, x = np.mgrid[0:32, 0:32].astype(np.float32) / 32
    img = np.clip(np.stack([x, y, x * y], axis=0), 0, 1)
    tr = NTCTrainer(cfg, [img])
    tr.train_many(40)
    tr.freeze_and_quantize()
    art = str(tmp_path / "a.npz")
    save_compressed(art, tr.state.mlp, tr.state.fp, cfg.fp_bits, {
        "config": {
            "image_size": 32, "pe_channels": 4, "tf_use_tri_pe": True,
            "tf_no_mip": True,
        },
    })
    out_png = str(tmp_path / "o.png")
    rec = decode_run([art, "--mip", "0", "--out", out_png])
    assert rec.shape == (32, 32, 3)
    assert os.path.exists(out_png)
    # standalone decode equals the trainer's decode
    np.testing.assert_allclose(
        rec, np.clip(np.asarray(tr.decode(0)), 0, 1), atol=1e-5
    )

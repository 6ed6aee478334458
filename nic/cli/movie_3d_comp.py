"""True-3D video compression (reference ``Projects/movie_3d_comp.py``):
Conv3d autoencoder over the [T, H, W, 3] volume, 8-bit latent, per-frame
average PSNR, checkpoint/resume (the ``encode_from_middle`` flags →
--resume/--resume_step). The reference's undefined-``quantize_norm``
crash (movie_3d_comp.py:87,120) is fixed by construction.

Run: ``python -m nic.cli.movie_3d_comp --image_path data/misty_64_64.avi``."""

from __future__ import annotations

import datetime
import os
import sys

import numpy as np

from nic.cli import common
from nic.data.assets import read_clip
from nic.io.artifacts import save_latent
from nic.obs.log import RunLog, ScalarWriter, make_filename_by_seq
from nic.train.conv_ae import ConvAETrainer

PROJECT = "movie_3d"


def run(argv=None) -> float:
    parser = common.standard_parser(
        __doc__, image_path="data/misty_64_64.avi", num_bits=8,
        num_epochs=3200000, latent_channels=16, hidden_channels=32,
    )
    args = parser.parse_args(argv)
    name = common.save_name(PROJECT, args)
    out = lambda *p: os.path.join(args.output_root, *p)
    log = RunLog(make_filename_by_seq(out("printlog"), f"{name}.txt"))
    log(datetime.datetime.now())

    movie = read_clip(args.image_path).astype(np.float32) / 255.0  # [T,H,W,3]

    trainer = ConvAETrainer(
        movie, num_bits=args.num_bits, latent_channels=args.latent_channels,
        hidden_channels=args.hidden_channels, num_epochs=args.num_epochs,
        lr=args.lr, seed=args.seed, qat_ste=args.qat_ste,
        mesh=common.maybe_mesh(args, log),
    )
    common.maybe_resume(trainer, args, log, PROJECT)
    writer = ScalarWriter(out("log", name), out("log", f"{name}_scalars.csv"))
    if args.train_model:
        common.run_training(trainer, args, log, writer, PROJECT)

    if args.save_model:
        with log.span("encode time"):
            latent = trainer.encode()
        save_latent(out("comp", f"{name}.npy"), latent, args.num_bits)
        log(f"latent shape: {latent.shape}")
    else:
        latent = np.load(out("comp", f"{name}.npy"))

    with log.span("decode time"):
        rec = trainer.decode(latent)
    p = common.report_video(
        log, movie, rec, make_filename_by_seq(out("image"), f"{name}.avi")
    )
    writer.close()
    log(datetime.datetime.now())
    return p


if __name__ == "__main__":
    run(sys.argv[1:])

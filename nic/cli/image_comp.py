"""Whole-image conv-AE compression (reference ``Projects/image_comp.py``):
train a Conv2D autoencoder on one image, quantize the latent to num_bits
(default 4), store it as uint8 .npy, decode in a single call, report PSNR.

Run: ``python -m nic.cli.image_comp [--image_path ... --num_bits 4 ...]``.
``nic.cli.movie_lavel_comp`` aliases this workload (the reference file is a
byte-identical copy of image_comp.py — SURVEY.md §2.4 item 9)."""

from __future__ import annotations

import datetime
import os
import sys

import numpy as np

from nic.cli import common
from nic.data.assets import load_image_mips
from nic.io.artifacts import save_latent
from nic.obs.log import RunLog, ScalarWriter, make_filename_by_seq
from nic.train.conv_ae import ConvAETrainer

PROJECT = "image"


def run(argv=None, project: str = PROJECT) -> float:
    args = common.standard_parser(__doc__, num_bits=4, num_epochs=80000).parse_args(argv)
    name = common.save_name(project, args)
    out = lambda *p: os.path.join(args.output_root, *p)
    log = RunLog(make_filename_by_seq(out("printlog"), f"{name}.txt"))
    log(datetime.datetime.now())

    image = load_image_mips(args.image_path, args.image_size, 0)[0]  # [3,H,W]
    image_hw3 = image.transpose(1, 2, 0)

    trainer = ConvAETrainer(
        image_hw3, num_bits=args.num_bits, latent_channels=args.latent_channels,
        hidden_channels=args.hidden_channels, num_epochs=args.num_epochs,
        lr=args.lr, seed=args.seed, qat_ste=args.qat_ste,
        mesh=common.maybe_mesh(args, log),
    )
    common.maybe_resume(trainer, args, log, project)
    writer = ScalarWriter(out("log", name), out("log", f"{name}_scalars.csv"))
    if args.train_model:
        common.run_training(trainer, args, log, writer, project)

    if args.save_model:
        with log.span("encode time"):
            latent = trainer.encode()
        save_latent(out("comp", f"{name}.npy"), latent, args.num_bits)
        log(f"latent shape: {latent.shape}")
    else:
        latent = np.load(out("comp", f"{name}.npy"))

    with log.span("decode time"):
        rec = trainer.decode(latent)
    p = common.report_image(
        log, image_hw3, rec,
        make_filename_by_seq(out("image"), f"{name}.png"),
    )
    writer.close()
    log(datetime.datetime.now())
    return p


if __name__ == "__main__":
    run(sys.argv[1:])

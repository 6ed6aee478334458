"""Per-pixel MLP decode compression (reference ``Projects/pixel_comp.py``):
conv-encode once to a (S/4+1)² latent lattice, train a tiny MLP to decode
each pixel from its 2×2 latent patch, store the quantized lattice as uint8
.npy. Decode here is fully vectorized (one batched matmul) — the
reference's 512×512 Python loop of single-row MLP calls
(pixel_comp.py:155-168) is the fusion target SURVEY.md §3.2 calls out; its
timing print is preserved so the speedup is visible.

Run: ``python -m nic.cli.pixel_comp [--image_path ...]``."""

from __future__ import annotations

import datetime
import os
import sys

import numpy as np

from nic.cli import common
from nic.data.assets import load_image_mips
from nic.io.artifacts import save_latent
from nic.obs.log import RunLog, ScalarWriter, make_filename_by_seq
from nic.train.pixel import PixelTrainer

PROJECT = "pixel"
USE_PE = False


def run(argv=None, project: str = PROJECT, use_pe: bool = USE_PE) -> float:
    parser = common.standard_parser(__doc__, num_bits=8, num_epochs=20000)
    parser.add_argument("--batch_pixels", type=int, default=256)
    parser.add_argument("--pe_channels", type=int, default=4)
    parser.add_argument("--hidden", type=int, default=64)
    args = parser.parse_args(argv)
    name = common.save_name(project, args)
    out = lambda *p: os.path.join(args.output_root, *p)
    log = RunLog(make_filename_by_seq(out("printlog"), f"{name}.txt"))
    log(datetime.datetime.now())

    image = load_image_mips(args.image_path, args.image_size, 0)[0].transpose(1, 2, 0)

    trainer = PixelTrainer(
        image, num_bits=args.num_bits, latent_channels=args.latent_channels,
        hidden=args.hidden, num_epochs=args.num_epochs,
        batch_pixels=args.batch_pixels, use_pe=use_pe,
        pe_channels=args.pe_channels, lr=args.lr, seed=args.seed,
        qat_ste=args.qat_ste,
    )
    common.maybe_resume(trainer, args, log, project)
    writer = ScalarWriter(out("log", name), out("log", f"{name}_scalars.csv"))
    if args.train_model:
        common.run_training(trainer, args, log, writer, project)

    if args.save_model:
        with log.span("encode time"):
            latent = trainer.encode()
        save_latent(out("comp", f"{name}.npy"), latent, args.num_bits)
    else:
        latent = np.load(out("comp", f"{name}.npy"))

    with log.span("decode time"):  # the reference's 解凍時間 measurement
        rec = trainer.decode(latent)
    p = common.report_image(
        log, image, rec, make_filename_by_seq(out("image"), f"{name}.png")
    )
    writer.close()
    log(datetime.datetime.now())
    return p


if __name__ == "__main__":
    run(sys.argv[1:])

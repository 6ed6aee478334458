"""movie_lavel workload.

The reference's ``movie_lavel_comp.py`` is a byte-identical copy of
``image_comp.py`` (diff-verified, SURVEY.md §2.4 item 9); the per-frame
label-embedding method it was named for exists only in the sample08–11
lineage. This entry point provides BOTH:

- default: the image_comp alias (byte-copy parity);
- ``--label_embedding true --image_path <video>``: the actual per-frame
  label method (nic.train.movie_label), completing what the reference
  left unfinished.
"""

from __future__ import annotations

import datetime
import os
import sys

import numpy as np

from nic.cli import common
from nic.cli.image_comp import run as _image_run


def run(argv=None):
    argv = list(argv) if argv is not None else sys.argv[1:]
    if "--label_embedding" in argv:
        i = argv.index("--label_embedding")
        flag = argv[i + 1].lower() in ("true", "1")
        del argv[i : i + 2]
        if flag:
            return _run_label(argv)
    return _image_run(argv, project="movie_lavel")


def _run_label(argv) -> float:
    from nic.data.assets import read_clip
    from nic.io.artifacts import save_latent
    from nic.obs.log import RunLog, make_filename_by_seq
    from nic.train.movie_label import MovieLabelTrainer

    parser = common.standard_parser(
        "per-frame label-embedding video compression",
        image_path="data/misty_64_64.avi", num_bits=8, num_epochs=50000,
    )
    args = parser.parse_args(argv)
    name = common.save_name("movie_label", args)
    out = lambda *p: os.path.join(args.output_root, *p)
    log = RunLog(make_filename_by_seq(out("printlog"), f"{name}.txt"))
    log(datetime.datetime.now())

    movie = read_clip(args.image_path).astype(np.float32) / 255.0
    trainer = MovieLabelTrainer(
        movie, num_bits=args.num_bits, latent_channels=args.latent_channels,
        hidden_channels=args.hidden_channels, num_epochs=args.num_epochs,
        lr=args.lr, seed=args.seed, qat_ste=args.qat_ste,
        mesh=common.maybe_mesh(args, log),
    )
    with log.span("train time"):
        trainer.train_many(args.num_epochs)
    with log.span("encode time"):
        latent = trainer.encode()
    save_latent(out("comp", f"{name}.npy"), latent, args.num_bits)
    with log.span("decode time"):
        rec = trainer.decode(latent)
    p = common.report_video(
        log, movie, rec, make_filename_by_seq(out("image"), f"{name}.avi")
    )
    log(datetime.datetime.now())
    return p


if __name__ == "__main__":
    run(sys.argv[1:])

"""Production-ized frame-flattened video compression (reference
``Projects/movie_2d_comp.py``): same tiling as movie_frame_comp but with
TensorBoard scalars, periodic checkpoints, and resume flags. The
reference's final-5% phase crashes on an undefined ``quantize_norm``
(movie_2d_comp.py:81,114 — SURVEY.md §2.4 item 1); here QAT quantization
is nic.core.quant.quantize by construction.

Run: ``python -m nic.cli.movie_2d_comp --image_path data/misty_64_64.avi``."""

import sys

from nic.cli import movie_frame_comp


def run(argv=None) -> float:
    argv = list(argv) if argv is not None else sys.argv[1:]
    if not any(a.startswith("--num_epochs") for a in argv):
        argv = ["--num_epochs", "3200000"] + argv  # reference default scale
    return movie_frame_comp.run(argv, project="movie_2d")


if __name__ == "__main__":
    run(sys.argv[1:])

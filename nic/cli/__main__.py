"""Workload dispatcher: ``python -m nic.cli <workload> [args...]``.

Workloads mirror the reference's entry scripts (SURVEY.md §2.2) plus the
framework extensions.
"""

from __future__ import annotations

import sys

WORKLOADS = {
    "pixel_comp": "nic.cli.pixel_comp",
    "pixel_pos_comp": "nic.cli.pixel_pos_comp",
    "image_comp": "nic.cli.image_comp",
    "movie_lavel_comp": "nic.cli.movie_lavel_comp",
    "movie_frame_comp": "nic.cli.movie_frame_comp",
    "movie_2d_comp": "nic.cli.movie_2d_comp",
    "movie_3d_comp": "nic.cli.movie_3d_comp",
    "image_compression": "nic.cli.image_compression",
    "hyperprior_comp": "nic.cli.hyperprior_comp",
    "decode": "nic.cli.decode",
}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m nic.cli <workload> [args...]\nworkloads:")
        for name in WORKLOADS:
            print(f"  {name}")
        raise SystemExit(0 if len(sys.argv) >= 2 else 1)
    name = sys.argv[1]
    if name not in WORKLOADS:
        raise SystemExit(f"unknown workload {name!r}; try --help")
    import importlib

    mod = importlib.import_module(WORKLOADS[name])
    mod.run(sys.argv[2:])


if __name__ == "__main__":
    main()

"""Alias workload: the reference's ``movie_lavel_comp.py`` is a
byte-identical copy of ``image_comp.py`` (diff-verified, SURVEY.md §2.4
item 9 — the per-frame-label method it was named after only exists in the
sample08–11 lineage). Kept as a distinct entry point for CLI parity."""

import sys

from nic.cli.image_comp import run as _run


def run(argv=None):
    return _run(argv, project="movie_lavel")


if __name__ == "__main__":
    run(sys.argv[1:])

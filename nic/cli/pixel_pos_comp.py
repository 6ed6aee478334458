"""pixel_comp + sinusoidal positional encoding of (x, y) concatenated to
the MLP input (reference ``Projects/pixel_pos_comp.py``: decoder input
8·4 latent + 4·2 PE = 40, pixel_pos_comp.py:20-23,76-84).

Run: ``python -m nic.cli.pixel_pos_comp [--image_path ...]``."""

import sys

from nic.cli.pixel_comp import run as _run


def run(argv=None):
    return _run(argv, project="pixel_pos", use_pe=True)


if __name__ == "__main__":
    run(sys.argv[1:])

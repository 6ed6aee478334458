"""Logging / observability: dual console+file logger, versioned filenames,
TensorBoard-compatible scalar writer, span timers, tensor audits.

Reference parity (21K1113/Neural_Image_Compression_V2):
- ``print_`` dual logging → :class:`RunLog` (utils.py:34-37);
- ``make_filename_by_seq`` sequential versioned filenames (utils.py:40-62);
- TensorBoard scalars with the same names the reference emits
  (``Loss/train_epoch_label``, ``Time/epoch_label``, ``PSNR/epoch``,
  ``PSNR/mip0`` — image_compression.py:275-290) via tensorboardX when
  available, always mirrored to a CSV so runs are greppable without TB;
- wall-clock span prints (学習時間/圧縮時間/展開時間 → train/encode/decode).
"""

from __future__ import annotations

import contextlib
import csv
import glob
import math
import os
import re
import time


def make_filename_by_seq(dirname: str, filename: str, seq_digit: int = 3) -> str:
    """Next free ``{dirname}/{stem}_NNN{ext}`` (utils.py:40-62 semantics)."""
    os.makedirs(dirname, exist_ok=True)
    stem, ext = os.path.splitext(filename)
    prog = re.compile(rf"{re.escape(stem)}_([0-9]+){re.escape(ext)}$")
    max_seq = -1
    for f in glob.glob(os.path.join(dirname, f"{stem}_*{ext}")):
        m = prog.match(os.path.basename(f))
        if m:
            max_seq = max(max_seq, int(m.group(1)))
    return os.path.join(dirname, f"{stem}_{max_seq + 1:0{seq_digit}}{ext}")


class RunLog:
    """Print to console and append to a per-run text log (utils.py:34-37)."""

    def __init__(self, path: str | None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def __call__(self, msg) -> None:
        print(msg)
        if self.path:
            with open(self.path, "a") as f:
                print(msg, file=f)

    @contextlib.contextmanager
    def span(self, label: str):
        """Timed span; prints ``{label}: {seconds}`` on exit
        (parity with the reference's 学習時間/圧縮時間/展開時間 prints)."""
        start = time.perf_counter()
        yield
        self(f"{label}: {time.perf_counter() - start}")


class ScalarWriter:
    """Step-scalar sink: tensorboardX (if importable) + CSV mirror."""

    def __init__(self, logdir: str | None, csv_path: str | None = None):
        self._tb = None
        if logdir:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None
        self._csv_path = csv_path
        self._csv_file = None
        self._csv = None
        if csv_path:
            os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
            self._csv_file = open(csv_path, "w", newline="")
            self._csv = csv.writer(self._csv_file)
            self._csv.writerow(["tag", "step", "value"])

    def add_scalar(self, tag: str, value, step: int) -> None:
        value = float(value)
        # TB chokes on non-finite scalars (torch prints "NaN or Inf found
        # in input tensor." per point — mip-mode in-train PSNR hits +inf
        # whenever a tiny high-LOD crop reconstructs exactly); the CSV
        # mirror keeps the faithful value
        if self._tb is not None and math.isfinite(value):
            self._tb.add_scalar(tag, value, step)
        if self._csv is not None:
            self._csv.writerow([tag, step, value])

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        if self._csv_file is not None:
            self._csv_file.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._csv_file is not None:
            self._csv_file.close()


def log_safe_statistics(x, log: RunLog) -> dict:
    """Audit a tensor and print the reference-style lines (utils.py:149-181)."""
    from nic.core.metrics import safe_statistics

    stats = safe_statistics(x)
    if stats["num_valid"] == 0:
        log("No valid numbers in the tensor.")
    else:
        log(f"Max: {stats['max']}")
        log(f"Min: {stats['min']}")
        log(f"Mean: {stats['mean']}")
        log(f"Variance: {stats['var']}")
    log(f"Contains NaN: {stats['has_nan']}")
    log(f"Contains Inf: {stats['has_inf']}")
    return stats

"""Variance probe 2 (round-5 session 4): the two remaining headline
figures whose run-to-run spread was asserted from few observations —
the hyperprior co-located decode (268–395 MPix/s across three runs) and
the Kodak-geometry exact-class decode (`pallas_rect_kodak_i16_tanherf`,
one observation at 1.378 GPix/s). Repeats each N times with the exact
bench implementations and records min/median/max.

Usage (TPU, chip otherwise idle): python scripts/r5_variance_probe2.py
Writes results/r5_variance_probe2.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    n = int(os.environ.get("PROBE_REPS", "7"))
    out: dict = {"reps": n}

    from bench import bench_decode_rect

    vals = [round(bench_decode_rect(dtype="i16", gelu="tanherf"), 4)
            for _ in range(n)]
    out["rect_kodak_i16_tanherf"] = {
        "gpix_s": vals, "min": float(np.min(vals)),
        "median": float(np.median(vals)), "max": float(np.max(vals)),
    }
    print(out["rect_kodak_i16_tanherf"], flush=True)

    ck = "runs/ckpt/hyperprior_lam0.018_n96_m128"
    if os.path.isdir(ck):
        from PIL import Image

        from nic.io.artifacts import CheckpointManager
        from nic.train.hyperprior import (HyperpriorCodec, HyperpriorTrainer,
                                          bench_decode_stages)

        newest = CheckpointManager(ck).paths_newest_first()
        tr = HyperpriorTrainer(n=96, m=128, lam=0.018, patch=64, batch=1,
                               seed=0)
        tr.load_checkpoint(newest[0])
        codec = HyperpriorCodec(tr)
        img = np.asarray(Image.open("data/sancho_512.png").convert("RGB"),
                         np.float32) / 255.0
        px = img.shape[0] * img.shape[1]
        blob = codec.compress(img)
        codec.decompress(blob)  # warm
        cvals = [bench_decode_stages(codec, blob, px, iters=20)
                 ["colocated_mpix_s"] for _ in range(n)]
        out["hyperprior_colocated_mpix_s"] = {
            "vals": cvals, "min": float(np.min(cvals)),
            "median": float(np.median(cvals)), "max": float(np.max(cvals)),
        }
        print(out["hyperprior_colocated_mpix_s"], flush=True)
    else:
        out["hyperprior_colocated_mpix_s"] = "checkpoint absent"

    os.makedirs("results", exist_ok=True)
    with open("results/r5_variance_probe2.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/r5_variance_probe2.json", flush=True)


if __name__ == "__main__":
    main()

"""Run the BASELINE.md measurement protocol on the real TPU chip.

Establishes the numbers the reference never published (SURVEY.md §6): PSNR
at matched bpp for the 512² overfit at FP_BITS ∈ {2,4,8}, the misty 64³
video at methods 3/4, and the conv-AE path; plus decode throughput and
train steps/s. Results append to BASELINE_RESULTS.json; BASELINE.md is
updated by hand from it.

Usage:
  python scripts/measure_baseline.py sancho8 sancho4 sancho2
  python scripts/measure_baseline.py video34
  python scripts/measure_baseline.py convae pixel
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BASELINE_RESULTS.json")


def record(entry: dict) -> None:
    rows = []
    if os.path.exists(RESULTS):
        rows = json.load(open(RESULTS))
    rows.append(entry)
    json.dump(rows, open(RESULTS, "w"), indent=1)
    print("RECORDED", json.dumps(entry))


def run_sancho(fp_bits: int, epochs: int = 100000) -> None:
    from nic.cli.image_compression import run

    t0 = time.time()
    res = run([
        "IMAGE_PATH=data/sancho_512.png", f"FP_BITS={fp_bits}",
        f"NUM_EPOCHS={epochs}", "INTERVAL_PRINT=10000",
        "OUTPUT_ROOT=runs/baseline",
    ])
    record({
        "config": f"sancho_512 FP_BITS={fp_bits}", "epochs": epochs,
        "psnr_refconv": res["psnr"][0], "psnr_255": res["psnr_255"][0],
        "bpp": res["bpp"], "wall_s": round(time.time() - t0, 1),
        "hardware": "TPU v5e (1 chip)",
    })


def run_video(method: int, fp_bits: int, epochs: int = 50000) -> None:
    from nic.cli.image_compression import run

    t0 = time.time()
    res = run([
        "IMAGE_PATH=data/misty_64_64.avi", "IMAGE_DIMENSION=3",
        f"COMPRESSION_METHOD={method}", "IMAGE_SIZE=64", "MAX_MIP_LEVEL=6",
        f"FP_BITS={fp_bits}", f"NUM_EPOCHS={epochs}", "CROP_MIP_LEVEL=5",
        "INTERVAL_PRINT=10000", "OUTPUT_ROOT=runs/baseline",
    ])
    record({
        "config": f"misty_64 method={method} FP_BITS={fp_bits}",
        "epochs": epochs, "psnr_refconv": res["psnr"][0],
        "psnr_255": res["psnr_255"][0], "bpp": res["bpp"],
        "wall_s": round(time.time() - t0, 1), "hardware": "TPU v5e (1 chip)",
    })


def run_convae(epochs: int = 80000) -> None:
    import numpy as np

    from nic.data.assets import load_image_mips
    from nic.train.conv_ae import ConvAETrainer
    from nic.core.metrics import psnr

    img = load_image_mips("data/sancho_512.png", 512, 0)[0].transpose(1, 2, 0)
    t0 = time.time()
    tr = ConvAETrainer(img, num_bits=4, num_epochs=epochs)
    loss_trace = []
    done = 0
    while done < epochs:
        n = min(10000, epochs - done)
        losses = tr.train_many(n)
        done += n
        loss_trace.append(round(float(np.mean(losses[-100:])), 6))
        print(f"convae step {done}: loss {loss_trace[-1]}", flush=True)
    latent = tr.encode()
    rec = tr.decode(latent)
    rec_u8 = np.clip(rec * 255, 0, 255).astype(np.uint8)
    p = float(psnr(img * 255, rec_u8.astype(np.float32), max_value=255.0))
    bpp = latent.size * 4 / (512 * 512)
    record({
        "config": "image_comp conv-AE 4-bit latent", "epochs": epochs,
        "psnr_255": p, "bpp": bpp, "loss_trace_10k": loss_trace,
        "wall_s": round(time.time() - t0, 1), "hardware": "TPU v5e (1 chip)",
    })


def run_pixel(epochs: int = 20000) -> None:
    import numpy as np

    from nic.data.assets import load_image_mips
    from nic.train.pixel import PixelTrainer
    from nic.core.metrics import psnr

    img = load_image_mips("data/sancho_512.png", 512, 0)[0].transpose(1, 2, 0)
    t0 = time.time()
    tr = PixelTrainer(img, num_epochs=epochs, batch_pixels=1024)
    tr.train_many(epochs)
    t1 = time.time()
    latent = tr.encode()
    rec = tr.decode(latent)
    decode_s = time.time() - t1
    rec_u8 = np.clip(rec * 255, 0, 255).astype(np.uint8)
    p = float(psnr(img * 255, rec_u8.astype(np.float32), max_value=255.0))
    record({
        "config": "pixel_comp 8-bit latent", "epochs": epochs,
        "psnr_255": p, "bpp": latent.size * 8 / (512 * 512),
        "decode_s_includes_encode": round(decode_s, 3),
        "wall_s": round(time.time() - t0, 1), "hardware": "TPU v5e (1 chip)",
    })


TASKS = {
    "sancho8": lambda: run_sancho(8),
    "sancho4": lambda: run_sancho(4),
    "sancho2": lambda: run_sancho(2),
    "video34": lambda: [run_video(m, b) for m in (3, 4) for b in (8, 4, 2)],
    "convae": run_convae,
    "pixel": run_pixel,
}

if __name__ == "__main__":
    for name in sys.argv[1:]:
        print(f"=== {name} ===", flush=True)
        TASKS[name]()

#!/bin/sh
# Round-3 chip queue #8: 3D kernel2 validation + rates.
# [1] 3D trainer ladder on misty 64^3 (methods 3 and 4, gather vs kernel2);
# [2] 3D 5k-epoch quality check m3 (guarded decode) with kernel2;
# [3] bench.py refresh (pinned-gather parity metric + fast metric).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue8.log
echo "=== r3 queue8 start $(date) ===" >> "$LOG"

echo "--- [1/3] 3D trainer ladder (misty 64^3) ---" >> "$LOG"
timeout 3600 python -u - <<'PYEOF' >> "$LOG" 2>&1
import time
from nic.config import CompressionConfig
from nic.cli.image_compression import load_asset
from nic.train.ntc import NTCTrainer
for method in (3, 4):
    for fwd in ("gather", "kernel2"):
        cfg = CompressionConfig(
            image_path="data/misty_64_64.avi", image_dimension=3,
            compression_method=method, image_3d_size=64, image_size=64,
            crop_mip_level=5, max_mip_level=6, num_epochs=10**6,
            mlp_num_dtype=16, train_forward=fwd, qat_noise_where="node",
            rng_impl="rbg", tf_write_psnr=False)
        tr = NTCTrainer(cfg, load_asset(cfg))
        tr.train_many(600, chunk=600)
        t0 = time.perf_counter()
        tr.train_many(600, chunk=600)
        dt = time.perf_counter() - t0
        px = 600 * cfg.num_crops * 32**3 / dt / 1e6
        print(f"m{method} {fwd}: {600/dt:.2f} steps/s = {px:.1f} MPix/s "
              f"(mode={tr._forward_mode})", flush=True)
PYEOF

echo "--- [2/3] 3D 5k quality m3 kernel2 (guarded decode) ---" >> "$LOG"
timeout 2400 python -m nic.cli.image_compression \
    IMAGE_PATH=data/misty_64_64.avi IMAGE_DIMENSION=3 COMPRESSION_METHOD=3 \
    IMAGE_SIZE=64 CROP_MIP_LEVEL=5 MAX_MIP_LEVEL=6 NUM_EPOCHS=5000 \
    MLP_NUM_DTYPE=16 TRAIN_FORWARD=kernel2 QAT_NOISE_WHERE=node \
    RNG_IMPL=rbg INTERVAL_PRINT=2500 >> "$LOG" 2>&1

echo "--- [3/3] bench.py refresh ---" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1

echo "=== r3 queue8 done $(date) ===" >> "$LOG"

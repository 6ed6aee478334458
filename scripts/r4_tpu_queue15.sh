#!/bin/sh
# Round-4 queue #15: re-run everything the machine restart (wiped /tmp)
# took out of queue13/14, ordered by decision value:
# [1] zero-flag 320k convergence at FP4 then FP2 — gates the kernel3
#     in-kernel-feature-noise flag-free default (FP8 landed 41.99).
#     References (BASELINE.md): FP4 37.14 fp32 / 37.38 feature arm;
#     FP2 29.37 fp32 / 29.52 feature arm.
# [2] 3D kernel3 ladder rows that died in queue12, one process per
#     variant (a wedged device context must not shadow the next).
# [3] 5k m3 kernel3 quality (r3 kernel2 reference: 31.87 dB @ 3.60 bpp).
# [4] GELU parity sweep m3/m4 cells only (merge into existing JSON).
# [5] bench.py final refresh.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue15.log
echo "=== r4 queue15 start $(date) ===" >> "$LOG"

echo "--- [1a] 320k FP_BITS=4, zero other flags ---" >> "$LOG"
timeout 7000 python -m nic.cli.image_compression NUM_EPOCHS=320000 \
    FP_BITS=4 INTERVAL_PRINT=80000 >> "$LOG" 2>&1
echo "--- [1b] 320k FP_BITS=2, zero other flags ---" >> "$LOG"
timeout 7000 python -m nic.cli.image_compression NUM_EPOCHS=320000 \
    FP_BITS=2 INTERVAL_PRINT=80000 >> "$LOG" 2>&1

echo "--- [2] 3D kernel3 ladder (one process per variant) ---" >> "$LOG"
for spec in \
    "3 kernel3 node" \
    "4 kernel3 node" \
    "4 kernel3 feature" \
; do
    set -- $spec
    M=$1 FWD=$2 NOISE=$3 timeout 2000 python -u - <<'PYEOF' >> "$LOG" 2>&1
import os
from bench import bench_train_steps
m, fwd, noise = (int(os.environ["M"]), os.environ["FWD"],
                 os.environ["NOISE"])
kw = dict(compression_method=m, image_dimension=3,
          image_path="data/misty_64_64.avi", image_size=64,
          max_mip_level=6, crop_mip_level=5, tf_write_psnr=False,
          mlp_num_dtype=None, train_forward=fwd)
if noise == "node":
    kw["qat_noise_where"] = "node"
try:
    r = bench_train_steps(num_steps=1000, **kw)
    print(f"m{m} {fwd}/{noise}: {r:.1f} steps/s", flush=True)
except Exception as e:
    print(f"m{m} {fwd}/{noise}: FAILED {type(e).__name__}: {e}"[:2000],
          flush=True)
PYEOF
done

echo "--- [3] 5k m3 kernel3 quality ---" >> "$LOG"
timeout 2500 python -m nic.cli.image_compression NUM_EPOCHS=5000 \
    COMPRESSION_METHOD=3 IMAGE_DIMENSION=3 IMAGE_PATH=data/misty_64_64.avi \
    IMAGE_SIZE=64 MAX_MIP_LEVEL=6 CROP_MIP_LEVEL=5 \
    INTERVAL_PRINT=2500 >> "$LOG" 2>&1

echo "--- [4] parity sweep m3/m4 cells (merge) ---" >> "$LOG"
SWEEP_CELLS=m3,m4 timeout 6000 python -u scripts/r4_gelu_parity_sweep.py \
    >> "$LOG" 2>&1

echo "--- [5] bench.py ---" >> "$LOG"
timeout 4000 python bench.py >> "$LOG" 2>&1
echo "=== r4 queue15 done $(date) ===" >> "$LOG"

#!/bin/sh
# Round-4 queue #14: recover everything the transient compile-helper
# crashes took out of queue11/12 (the probe r4_ff3_compile_probe.py
# confirmed all four ff3 variants now AOT-compile post-e86f9b5):
# [1] GELU parity sweep m3/m4 cells only (merged into the existing JSON
#     via SWEEP_CELLS — m1 + mip rows from queue12 are kept);
# [2] 3D kernel3 ladder rows that died: m3/m4 × node noise + m4
#     flag-free, one PROCESS per variant (a wedged device context after
#     a failed compile must not shadow the next variant);
# [3] 5k m3 kernel3 quality + guarded decode (queue11 [4] re-run;
#     r3 kernel2 reference: 31.87 dB @ 3.60 bpp);
# [4] bench.py final refresh.
# Runs after queue13 (pid in /tmp/r4_queue13.pid).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue14.log
PREV=$(cat /tmp/r4_queue13.pid 2>/dev/null)
if [ -n "$PREV" ]; then
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
echo "=== r4 queue14 start $(date) ===" >> "$LOG"

echo "--- [1] parity sweep m3/m4 cells (merge) ---" >> "$LOG"
SWEEP_CELLS=m3,m4 timeout 6000 python -u scripts/r4_gelu_parity_sweep.py \
    >> "$LOG" 2>&1

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

echo "--- [4] bench.py ---" >> "$LOG"
timeout 4000 python bench.py >> "$LOG" 2>&1
echo "=== r4 queue14 done $(date) ===" >> "$LOG"

#!/bin/sh
# Round-4 queue #6: chip validation of kernel3's IN-KERNEL feature noise
# (the new flag-free default path: auto -> kernel3 + eps_uniform stream).
# Runs after queue5 (pid in /tmp/r4_queue5.pid).
# [1] rate: default-flag config at 8 and 16 crops (vs kernel2's 227/101
#     and kernel3+node's 408/204);
# [2] 20k quality, ZERO flags (band from r3/r4: 38.45-38.82 dB);
# [3] 320k convergence, ZERO flags (fp32 reference 41.96; surgical-bf16
#     41.95; kernel3+node path 41.95);
# [4] bench.py refresh under current defaults.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue6.log
PREV=$(cat /tmp/r4_queue5.pid 2>/dev/null)
if [ -n "$PREV" ]; then
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
echo "=== r4 queue6 start $(date) ===" >> "$LOG"

echo "--- [1] kernel3 feature-noise rate ladder ---" >> "$LOG"
timeout 4000 python -u - <<'PYEOF' >> "$LOG" 2>&1
from bench import bench_train_steps
for label, kw in (
    ("k3 feature 8c (flag-free)", dict(mlp_num_dtype=16, num_crops=8)),
    ("k3 feature 16c", dict(mlp_num_dtype=16, num_crops=16)),
):
    r = bench_train_steps(**kw)
    print(f"{label}: {r:.1f} steps/s", flush=True)
PYEOF

echo "--- [2] 20k quality, zero flags ---" >> "$LOG"
timeout 2500 python -m nic.cli.image_compression NUM_EPOCHS=20000 \
    INTERVAL_PRINT=10000 >> "$LOG" 2>&1

echo "--- [3] 320k convergence, zero flags ---" >> "$LOG"
timeout 7000 python -m nic.cli.image_compression NUM_EPOCHS=320000 \
    INTERVAL_PRINT=40000 >> "$LOG" 2>&1

echo "--- [4] bench.py ---" >> "$LOG"
timeout 4000 python bench.py > /tmp/r4_bench6.json 2>> "$LOG"
cat /tmp/r4_bench6.json >> "$LOG"
echo "=== r4 queue6 done $(date) ===" >> "$LOG"

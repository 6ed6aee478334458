#!/bin/sh
# Round-4 queue #4: the serialized chip backlog for this session.
# [1] FP2/feature 320k completion — the queue2b arm killed at 280k.
#     Gates the node-noise default flip: the QAT 95/5 protocol's final
#     hard-quantization phase jumps PSNR in the last 5% (node went
#     28.12 -> 29.36 in the final 40k), so the 280k value of the killed
#     arm can NOT be extrapolated; the A/B needs the finished number.
# [2] queue3 payload: kernel3 chip validation (smoke, rate ladder,
#     20k quality, mip rate).
# [3] exact-class GELU parity sweep (VERDICT r3 directive #3).
# [4] hyperprior lam=0.018 50k retrain (checkpoints did not survive) +
#     format-3 codec decode clock (VERDICT r3 directive #4).
# [5] full bench.py under current defaults.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue4.log
echo "=== r4 queue4 start $(date) ===" >> "$LOG"

echo "--- [1] 320k FP_BITS=2 QAT_NOISE_WHERE=feature (completion) ---" >> "$LOG"
timeout 7000 python -m nic.cli.image_compression NUM_EPOCHS=320000 \
    FP_BITS=2 QAT_NOISE_WHERE=feature INTERVAL_PRINT=20000 >> "$LOG" 2>&1

sh scripts/r4_tpu_queue3.sh >> "$LOG" 2>&1

echo "--- [3] gelu parity sweep ---" >> "$LOG"
timeout 8000 python -u scripts/r4_gelu_parity_sweep.py >> "$LOG" 2>&1

echo "--- [4] hyperprior retrain lam=0.018 (50k, clipped) ---" >> "$LOG"
STEPS=50000 LAMS="0.018" sh scripts/sweep_hyperprior.sh >> "$LOG" 2>&1
echo "--- [4b] codec decode clock (format 3) ---" >> "$LOG"
timeout 1800 python -u scripts/bench_hyperprior_decode.py >> "$LOG" 2>&1

echo "--- [5] bench.py ---" >> "$LOG"
timeout 4000 python bench.py > /tmp/r4_bench.json 2>> "$LOG"
cat /tmp/r4_bench.json >> "$LOG"
echo "=== r4 queue4 done $(date) ===" >> "$LOG"

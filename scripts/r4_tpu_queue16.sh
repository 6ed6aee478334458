#!/bin/sh
# Round-4 queue #16: the machine restart also took runs/ckpt — the
# hyperprior codec checkpoint is gone, so bench.py's codec fields (incl.
# the NEW hyperprior_decode_mpix_s_colocated) silently skip. Retrain the
# lam=0.018 point, clock the codec, and re-run bench with the full field
# set. Runs after queue15 (pid in /tmp/r4_queue15.pid).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue16.log
PREV=$(cat /tmp/r4_queue15.pid 2>/dev/null)
if [ -n "$PREV" ]; then
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
echo "=== r4 queue16 start $(date) ===" >> "$LOG"

echo "--- [1] hyperprior retrain lam=0.018 (50k, clipped) ---" >> "$LOG"
STEPS=50000 LAMS="0.018" sh scripts/sweep_hyperprior.sh >> "$LOG" 2>&1

echo "--- [2] codec decode clock (format 3, stage split) ---" >> "$LOG"
timeout 1800 python -u scripts/bench_hyperprior_decode.py >> "$LOG" 2>&1

echo "--- [3] bench.py (full fields incl. colocated codec) ---" >> "$LOG"
timeout 4500 python bench.py >> "$LOG" 2>&1
echo "=== r4 queue16 done $(date) ===" >> "$LOG"

#!/bin/sh
# Round-4 queue #13: zero-flag 320k convergence at FP4 and FP2 — the
# flag-free default now trains through kernel3's IN-KERNEL feature-noise
# stream; FP8 landed at 41.99 (queue10). FP2 is the sensitive case (the
# node-noise default flip failed there), so gate the default on all
# three. References (BASELINE.md): FP4 37.14 fp32 / 37.38 feature-noise
# A/B arm; FP2 29.37 fp32 / 29.52 feature arm.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue13.log
PREV=$(cat /tmp/r4_queue12.pid 2>/dev/null)
if [ -n "$PREV" ]; then
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
echo "=== r4 queue13 start $(date) ===" >> "$LOG"
echo "--- [1] 320k FP_BITS=4, zero other flags ---" >> "$LOG"
timeout 7000 python -m nic.cli.image_compression NUM_EPOCHS=320000 \
    FP_BITS=4 INTERVAL_PRINT=80000 >> "$LOG" 2>&1
echo "--- [2] 320k FP_BITS=2, zero other flags ---" >> "$LOG"
timeout 7000 python -m nic.cli.image_compression NUM_EPOCHS=320000 \
    FP_BITS=2 INTERVAL_PRINT=80000 >> "$LOG" 2>&1
echo "=== r4 queue13 done $(date) ===" >> "$LOG"

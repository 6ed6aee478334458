#!/bin/sh
# Round-4 queue #12: re-run the GELU parity sweep (queue10's run died at
# the first 3D cell on the ff3 Mosaic relayout, now fixed) + a fresh
# bench.py. Runs after queue11.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue12.log
PREV=$(cat /tmp/r4_queue11.pid 2>/dev/null)
if [ -n "$PREV" ]; then
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
echo "=== r4 queue12 start $(date) ===" >> "$LOG"
echo "--- [1] gelu parity sweep (fixed) ---" >> "$LOG"
timeout 9000 python -u scripts/r4_gelu_parity_sweep.py >> "$LOG" 2>&1
echo "--- [2] bench.py ---" >> "$LOG"
timeout 4000 python bench.py > /tmp/r4_bench12.json 2>> "$LOG"
cat /tmp/r4_bench12.json >> "$LOG"
echo "=== r4 queue12 done $(date) ===" >> "$LOG"

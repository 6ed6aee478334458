#!/bin/sh
# Round-4 queue #5: waits for queue4 (pid in /tmp/r4_queue4.pid) to
# drain, then clocks the z1-matmul decode kernel A/B on the chip.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue5.log
PREV=$(cat /tmp/r4_queue4.pid 2>/dev/null)
if [ -n "$PREV" ]; then
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
echo "=== r4 queue5 start $(date) ===" >> "$LOG"
echo "--- [1] z1mm decode A/B ---" >> "$LOG"
timeout 2400 python -u scripts/r4_z1mm_probe.py >> "$LOG" 2>&1
echo "=== r4 queue5 done $(date) ===" >> "$LOG"

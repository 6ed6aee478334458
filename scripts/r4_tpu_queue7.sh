#!/bin/sh
# Round-4 queue #7: hyperprior codec re-clock after the device-side
# sigma->bin mapping (colocated_mpix_s field; VERDICT r3 #4 target
# >= 200 MPix/s at the 0.68 bpp point). Runs after queue6.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue7.log
PREV=$(cat /tmp/r4_queue6.pid 2>/dev/null)
if [ -n "$PREV" ]; then
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
echo "=== r4 queue7 start $(date) ===" >> "$LOG"
echo "--- [1] hyperprior decode clock (device bins) ---" >> "$LOG"
timeout 1800 python -u scripts/bench_hyperprior_decode.py >> "$LOG" 2>&1
echo "=== r4 queue7 done $(date) ===" >> "$LOG"

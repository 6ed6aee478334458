#!/bin/sh
# Round-4 queue #1: stage-3 step breakdown (VERDICT r3 Missing #1 / Weak #1)
# [1] quick validation pass; [2] full 8-crop profile; [3] 16-crop profile
# (VERDICT #9: attribute the 16-crop residual).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue1.log
echo "=== r4 queue1 start $(date) ===" >> "$LOG"
echo "--- [1] quick validation ---" >> "$LOG"
timeout 1800 python -u scripts/r3_stage3_profile.py --quick >> "$LOG" 2>&1
echo "--- [2] full profile, 8 crops ---" >> "$LOG"
timeout 3600 python -u scripts/r3_stage3_profile.py >> "$LOG" 2>&1
echo "--- [3] full profile, 16 crops ---" >> "$LOG"
timeout 3600 python -u scripts/r3_stage3_profile.py --crops 16 >> "$LOG" 2>&1
echo "=== r4 queue1 done $(date) ===" >> "$LOG"

#!/bin/sh
# Round-4 queue #2b: relaunch of queue2's 320k A/B (the original was killed
# when the previous session ended, mid first run). Cache probe already done
# (2.31s -> 1.26s, recorded). Runs: 320k full protocol at FP_BITS in {4,2}
# x QAT_NOISE_WHERE in {node, feature} under the round-4 defaults
# (bf16 + rbg + auto->packed kernel2 + poly) — the evidence gate for
# flipping the node-noise default (VERDICT r3 Missing #5 / Next #2).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue2.log
echo "=== r4 queue2b start $(date) ===" >> "$LOG"
for BITS in 4 2; do
  for WHERE in node feature; do
    echo "--- 320k FP_BITS=$BITS QAT_NOISE_WHERE=$WHERE $(date) ---" >> "$LOG"
    timeout 7000 python -m nic.cli.image_compression NUM_EPOCHS=320000 \
        FP_BITS=$BITS QAT_NOISE_WHERE=$WHERE \
        INTERVAL_PRINT=20000 >> "$LOG" 2>&1
  done
done
echo "=== r4 queue2b done $(date) ===" >> "$LOG"

#!/bin/sh
# Round-3 chip queue #1 (VERDICT directives 6 & 7): long confirmation
# runs, sequential on the single tunneled chip. Results append to
# /tmp/r3_queue1.log; run artifacts land in runs/ as usual.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue1.log
echo "=== r3 queue1 start $(date) ===" >> "$LOG"

echo "--- [1/6] flagship surgical-bf16, full 320k protocol ---" >> "$LOG"
timeout 7200 python -m nic.cli.image_compression NUM_EPOCHS=320000 \
    MLP_NUM_DTYPE=16 >> "$LOG" 2>&1

echo "--- [2/6] surgical-bf16 FP_BITS=4, 100k ---" >> "$LOG"
timeout 2700 python -m nic.cli.image_compression NUM_EPOCHS=100000 \
    MLP_NUM_DTYPE=16 FP_BITS=4 >> "$LOG" 2>&1

echo "--- [3/6] surgical-bf16 FP_BITS=2, 100k ---" >> "$LOG"
timeout 2700 python -m nic.cli.image_compression NUM_EPOCHS=100000 \
    MLP_NUM_DTYPE=16 FP_BITS=2 >> "$LOG" 2>&1

# hyperprior generalization: train on mandrill, eval on held-out sancho
for LAM in 0.006 0.018 0.05; do
  echo "--- hyperprior split lam=$LAM 50k ---" >> "$LOG"
  timeout 2700 python -m nic.cli.hyperprior_comp \
      --train_dir data_split/train --eval_dir data_split/eval \
      --steps 50000 --lam "$LAM" \
      --output_root runs/split >> "$LOG" 2>&1
done

echo "=== r3 queue1 done $(date) ===" >> "$LOG"

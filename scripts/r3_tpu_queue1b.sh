#!/bin/sh
# Round-3 chip queue #1b (VERDICT directives 6 & 7) — fixed relaunch of
# r3_tpu_queue1.sh: that script left INTERVAL_PRINT at its default (100),
# so the full-decode + checkpoint-save interval work ran every 100 steps
# and dragged the 320k run to ~28 steps/s (vs ~105 pure); item [1] resumes
# from its 126.3k-step checkpoint with a 10k interval instead.
# Sequential on the single tunneled chip; results append to
# /tmp/r3_queue1.log; run artifacts land in runs/ as usual.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue1.log
echo "=== r3 queue1b start $(date) ===" >> "$LOG"

echo "--- [1/6] flagship surgical-bf16, 320k protocol (resume) ---" >> "$LOG"
timeout 4500 python -m nic.cli.image_compression NUM_EPOCHS=320000 \
    MLP_NUM_DTYPE=16 TF_RESUME=True INTERVAL_PRINT=10000 >> "$LOG" 2>&1

echo "--- [2/6] surgical-bf16 FP_BITS=4, 100k ---" >> "$LOG"
timeout 2700 python -m nic.cli.image_compression NUM_EPOCHS=100000 \
    MLP_NUM_DTYPE=16 FP_BITS=4 INTERVAL_PRINT=10000 >> "$LOG" 2>&1

echo "--- [3/6] surgical-bf16 FP_BITS=2, 100k ---" >> "$LOG"
timeout 2700 python -m nic.cli.image_compression NUM_EPOCHS=100000 \
    MLP_NUM_DTYPE=16 FP_BITS=2 INTERVAL_PRINT=10000 >> "$LOG" 2>&1

# hyperprior generalization: train on mandrill, eval on held-out sancho
mkdir -p data_split/train data_split/eval
[ -f data_split/train/mandrill.png ] || cp data/mandrill.png data_split/train/
[ -f data_split/eval/sancho_512.png ] || cp data/sancho_512.png data_split/eval/
for LAM in 0.006 0.018 0.05; do
  echo "--- hyperprior split lam=$LAM 50k ---" >> "$LOG"
  timeout 2700 python -m nic.cli.hyperprior_comp \
      --train_dir data_split/train --eval_dir data_split/eval \
      --steps 50000 --lam "$LAM" \
      --output_root runs/split >> "$LOG" 2>&1
done

echo "=== r3 queue1b done $(date) ===" >> "$LOG"

#!/bin/sh
# Round-3 chip queue #5 (post-lattice-revert):
# [1] regenerate hyperprior lam=0.018 checkpoint (50k, overfit protocol) —
#     queue4's decode bench failed on the missing file;
# [2] hyperprior codec decode clock (VERDICT r2 Missing #5, last gap);
# [3] clean stage-2 train profile (queue4's numbers were polluted by the
#     lattice regression);
# [4] full-protocol 320k flagship run of the fast train config
#     (kernel/node/rbg + surgical bf16) — the convergence evidence needed
#     before flipping training defaults;
# [5] bench.py refresh (train_steps_s recovers post-revert).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue5.log
echo "=== r3 queue5 start $(date) ===" >> "$LOG"

echo "--- [1/5] hyperprior lam=0.018 50k train (segmented) ---" >> "$LOG"
ATTEMPT=0
while [ ! -f "runs/hyperprior_lam0.018_50000_eval.json" ] && [ $ATTEMPT -lt 4 ]; do
    ATTEMPT=$((ATTEMPT + 1))
    echo "=== lam=0.018 attempt $ATTEMPT $(date) ===" >> "$LOG"
    timeout 3600 python -m nic.cli.hyperprior_comp \
        --train_dir data --eval_dir data --steps 50000 \
        --lam 0.018 --resume --interval_print 5000 \
        --interval_checkpoint 2000 >> "$LOG" 2>&1
    sleep 5
done

echo "--- [2/5] hyperprior decode clock ---" >> "$LOG"
timeout 1800 python scripts/bench_hyperprior_decode.py >> "$LOG" 2>&1

echo "--- [3/5] stage-2 profile (post-revert) ---" >> "$LOG"
timeout 3600 python scripts/profile_train_step.py --stage2 >> "$LOG" 2>&1

echo "--- [4/5] 320k flagship, fast train config ---" >> "$LOG"
timeout 7000 python -m nic.cli.image_compression NUM_EPOCHS=320000 \
    MLP_NUM_DTYPE=16 TRAIN_FORWARD=kernel QAT_NOISE_WHERE=node RNG_IMPL=rbg \
    INTERVAL_PRINT=10000 >> "$LOG" 2>&1

echo "--- [5/5] bench.py refresh ---" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1

echo "=== r3 queue5 done $(date) ===" >> "$LOG"

#!/bin/sh
# Hyperprior λ sweep on the real TPU — 4 RD points at 50k steps each.
#
# Segmented against the platform's ~hourly stall pattern (NOTES_r1.md):
# each λ runs under `timeout`; on a stall the process is killed and
# relaunched with --resume, which restores params+opt from the newest
# checkpoint (written every 2000 steps). A λ point is done when its
# eval JSON exists AND its checkpoint dir does (round-4 advisor: a
# machine restart can wipe runs/ckpt but leave the eval JSON, and the
# eval-only gate then silently skips the retrain the caller needs —
# exactly the failure queue16 existed to fix). FORCE=1 re-runs a λ
# regardless.
cd "$(dirname "$0")/.." || exit 1
STEPS=${STEPS:-50000}
LAMS=${LAMS:-"0.002 0.006 0.018 0.05"}
for LAM in $LAMS; do
    DONE="runs/hyperprior_lam${LAM}_${STEPS}_eval.json"
    CKDIR="runs/ckpt/hyperprior_lam${LAM}_n96_m128"
    if [ -n "$FORCE" ] || { [ -f "$DONE" ] && ! ls "$CKDIR"/ckpt_*.npz \
            >/dev/null 2>&1; }; then
        echo "=== lam=$LAM: stale eval without checkpoint (or FORCE) — re-running ==="
        rm -f "$DONE"
    fi
    ATTEMPT=0
    while [ ! -f "$DONE" ] && [ $ATTEMPT -lt 8 ]; do
        ATTEMPT=$((ATTEMPT + 1))
        echo "=== lam=$LAM attempt $ATTEMPT $(date) ==="
        timeout 3600 python -m nic.cli.hyperprior_comp \
            --train_dir data --eval_dir data --steps "$STEPS" \
            --lam "$LAM" --resume --interval_print 1000 \
            --interval_checkpoint 2000
        sleep 5
    done
done
echo "=== sweep finished $(date) ==="
ls -la runs/hyperprior_*_eval.json

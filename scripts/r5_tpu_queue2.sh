#!/bin/sh
# Round-5 chip queue 2 (single TPU client at a time — verify skill rule):
#   [0] wait for the parity sweep (pid file /tmp/r5_parity.pid)
#   [1] hyperprior λ=0.018 retrain (checkpoint restart-wiped AGAIN; the
#       segmented sweep driver handles stall/resume) — restores the
#       bench.py `hyperprior_decode_mpix_s_colocated` evidence chain
#       (VERDICT r4 directive #2: the real field, not the recorded one)
#   [2] re-clock the codec stage split on the fresh checkpoint →
#       results/r5_hyperprior_decode.json (committed artifact)
# Later items (3D i16 re-sweep, full bench) are launched separately so
# their go/no-go can depend on CPU test results and remaining wall.
cd "$(dirname "$0")/.." || exit 1
echo $$ > /tmp/r5_queue2.pid

while kill -0 "$(cat /tmp/r5_parity.pid 2>/dev/null)" 2>/dev/null; do
    sleep 20
done
echo "=== [1] hyperprior retrain $(date) ==="
LAMS=0.018 sh scripts/sweep_hyperprior.sh
echo "=== [2] codec stage clock $(date) ==="
# write to a temp first: never clobber the committed artifact with an
# empty file if the clock fails
python scripts/bench_hyperprior_decode.py \
    --ckpt runs/ckpt/hyperprior_lam0.018_n96_m128 --lam 0.018 \
    | tail -1 > /tmp/r5_hp_clock.json
if python -c "import json;d=json.load(open('/tmp/r5_hp_clock.json'));assert 'colocated_mpix_s' in json.dumps(d)"; then
    cp /tmp/r5_hp_clock.json results/r5_hyperprior_decode.json
    cat results/r5_hyperprior_decode.json
else
    echo "codec clock FAILED — committed artifact left untouched"
fi
echo "=== queue2 done $(date) ==="

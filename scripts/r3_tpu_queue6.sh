#!/bin/sh
# Round-3 chip queue #6 (kernel2 + follow-ups):
# [1] trainer ladder: kernel2 vs kernel vs gather (node/rbg, bf16);
# [2] 16-crop scaling: does kernel2 fix the sublinear crop scaling?
# [3] 20k full-protocol quality A/B with kernel2 (guarded decode);
# [4] clipped hyperprior retrain lam=0.018 (verify no explosion) +
#     decode re-clock at the protocol bpp;
# [5] bench.py refresh.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue6.log
echo "=== r3 queue6 start $(date) ===" >> "$LOG"

echo "--- [1/5] trainer ladder: kernel2 ---" >> "$LOG"
timeout 3000 python -u - <<'PYEOF' >> "$LOG" 2>&1
import time
from nic.config import CompressionConfig
from nic.cli.image_compression import load_asset
from nic.train.ntc import NTCTrainer
for fwd in ("kernel2", "kernel", "gather"):
    cfg = CompressionConfig(num_epochs=10**6, mlp_num_dtype=16,
                            train_forward=fwd, qat_noise_where="node",
                            rng_impl="rbg", tf_write_psnr=False)
    tr = NTCTrainer(cfg, load_asset(cfg))
    tr.train_many(1000, chunk=1000)
    t0 = time.perf_counter()
    tr.train_many(1000, chunk=1000)
    dt = time.perf_counter() - t0
    print(f"{fwd}/node/rbg: {1000/dt:.2f} steps/s "
          f"(mode={tr._forward_mode})", flush=True)
PYEOF

echo "--- [2/5] 16-crop scaling: gather vs kernel2 ---" >> "$LOG"
timeout 2400 python -u - <<'PYEOF' >> "$LOG" 2>&1
import time
from nic.config import CompressionConfig
from nic.cli.image_compression import load_asset
from nic.train.ntc import NTCTrainer
for fwd in ("gather", "kernel2"):
    for crops in (8, 16):
        cfg = CompressionConfig(num_epochs=10**6, mlp_num_dtype=16,
                                train_forward=fwd, qat_noise_where="node",
                                rng_impl="rbg", tf_write_psnr=False,
                                num_crops=crops)
        tr = NTCTrainer(cfg, load_asset(cfg))
        tr.train_many(600, chunk=600)
        t0 = time.perf_counter()
        tr.train_many(600, chunk=600)
        dt = time.perf_counter() - t0
        mpix = 600 * crops * 256 * 256 / dt / 1e6
        print(f"{fwd} crops={crops}: {600/dt:.2f} steps/s = {mpix:.1f} "
              f"MPix/s (mode={tr._forward_mode})", flush=True)
PYEOF

echo "--- [3/5] 20k quality A/B: kernel2 ---" >> "$LOG"
timeout 1800 python -m nic.cli.image_compression NUM_EPOCHS=20000 \
    MLP_NUM_DTYPE=16 TRAIN_FORWARD=kernel2 QAT_NOISE_WHERE=node RNG_IMPL=rbg \
    INTERVAL_PRINT=5000 >> "$LOG" 2>&1

echo "--- [4/5] clipped hyperprior retrain + decode re-clock ---" >> "$LOG"
rm -rf runs/ckpt/hyperprior_lam0.018_n96_m128 runs/hyperprior_lam0.018_50000_eval.json
ATTEMPT=0
while [ ! -f "runs/hyperprior_lam0.018_50000_eval.json" ] && [ $ATTEMPT -lt 3 ]; do
    ATTEMPT=$((ATTEMPT + 1))
    echo "=== clipped lam=0.018 attempt $ATTEMPT $(date) ===" >> "$LOG"
    timeout 3600 python -m nic.cli.hyperprior_comp \
        --train_dir data --eval_dir data --steps 50000 \
        --lam 0.018 --resume --interval_print 5000 \
        --interval_checkpoint 2000 >> "$LOG" 2>&1
    sleep 5
done
timeout 1800 python scripts/bench_hyperprior_decode.py >> "$LOG" 2>&1

echo "--- [5/5] bench.py refresh ---" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1

echo "=== r3 queue6 done $(date) ===" >> "$LOG"

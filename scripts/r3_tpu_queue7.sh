#!/bin/sh
# Round-3 chip queue #7: kernel2 after the Mosaic dynamic_slice fix
# (queue6 [1]-[3] errored on the unsupported primitive).
# [1] compile probe with full traceback;
# [2] trainer ladder kernel2/kernel/gather;
# [3] 16-crop scaling gather vs kernel2;
# [4] 20k full-protocol quality A/B with kernel2;
# [5] bench.py refresh (now includes train_steps_s_fast).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue7.log
echo "=== r3 queue7 start $(date) ===" >> "$LOG"

echo "--- [1/5] kernel2 compile probe ---" >> "$LOG"
timeout 1200 python -u - <<'PYEOF' >> "$LOG" 2>&1
from nic.config import CompressionConfig
from nic.cli.image_compression import load_asset
from nic.train.ntc import NTCTrainer
cfg = CompressionConfig(num_epochs=10**6, mlp_num_dtype=16,
                        train_forward="kernel2", qat_noise_where="node",
                        rng_impl="rbg", tf_write_psnr=False)
tr = NTCTrainer(cfg, load_asset(cfg))
losses, _ = tr.train_many(3, chunk=3)
print("kernel2 probe ok, mode:", tr._forward_mode, "losses:", losses)
PYEOF

echo "--- [2/5] trainer ladder ---" >> "$LOG"
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

echo "--- [3/5] 16-crop scaling ---" >> "$LOG"
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

echo "--- [4/5] 20k quality A/B: kernel2 ---" >> "$LOG"
timeout 1800 python -m nic.cli.image_compression NUM_EPOCHS=20000 \
    MLP_NUM_DTYPE=16 TRAIN_FORWARD=kernel2 QAT_NOISE_WHERE=node RNG_IMPL=rbg \
    INTERVAL_PRINT=5000 >> "$LOG" 2>&1

echo "--- [4b] step-overhead probe ---" >> "$LOG"
timeout 2400 python scripts/r3_step_overhead.py >> "$LOG" 2>&1

echo "--- [5/5] bench.py refresh ---" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1

echo "=== r3 queue7 done $(date) ===" >> "$LOG"

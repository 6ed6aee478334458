#!/bin/sh
# Round-3 final chip queue: mip-mode kernel2 + fresh bench.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue9.log
echo "=== r3 queue9 start $(date) ===" >> "$LOG"

echo "--- [1/2] mip-mode training rate: gather vs kernel2 ---" >> "$LOG"
timeout 3000 python -u - <<'PYEOF' >> "$LOG" 2>&1
import time
from nic.config import CompressionConfig
from nic.cli.image_compression import load_asset
from nic.train.ntc import NTCTrainer
for fwd in ("gather", "kernel2"):
    cfg = CompressionConfig(num_epochs=10**6, mlp_num_dtype=16,
                            train_forward=fwd, qat_noise_where="node",
                            rng_impl="rbg", tf_write_psnr=False,
                            tf_no_mip=False)
    tr = NTCTrainer(cfg, load_asset(cfg))
    tr.train_many(1000, chunk=1000)
    t0 = time.perf_counter()
    tr.train_many(1000, chunk=1000)
    dt = time.perf_counter() - t0
    print(f"mip {fwd}: {1000/dt:.2f} steps/s", flush=True)
PYEOF

echo "--- [2/2] bench.py refresh (final) ---" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1

echo "=== r3 queue9 done $(date) ===" >> "$LOG"

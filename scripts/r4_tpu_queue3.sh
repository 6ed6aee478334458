#!/bin/sh
# Round-4 queue #3: kernel3 chip validation (the feature-free train step).
# [1] smoke: default config (auto -> kernel3) 2k steps;
# [2] rate ladder: kernel2 vs kernel3 at flagship shapes, 8 and 16 crops,
#     plus the SDC-guard overhead (guard on vs off);
# [3] 20k default-config quality run (band: 38.45-38.82 dB);
# [4] mip-mode rate (kernel3 inside the LOD switch).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue3.log
echo "=== r4 queue3 start $(date) ===" >> "$LOG"

echo "--- [1] kernel3 smoke (2k default) ---" >> "$LOG"
timeout 3000 python -u - <<'PYEOF' >> "$LOG" 2>&1
from nic.cli.image_compression import load_asset
from nic.config import CompressionConfig
from nic.train.ntc import NTCTrainer
cfg = CompressionConfig(num_epochs=10**6, qat_noise_where="node")
tr = NTCTrainer(cfg, load_asset(cfg))
tr._build_step(0, False, jit=False)
print("forward mode:", tr._forward_mode, flush=True)
losses, _ = tr.train_many(200, chunk=100)
print("smoke losses head/tail:", float(losses[0]), float(losses[-1]), flush=True)
PYEOF

echo "--- [2] rate ladder ---" >> "$LOG"
timeout 6000 python -u - <<'PYEOF' >> "$LOG" 2>&1
import time
from bench import bench_train_steps
for label, kw in (
    ("kernel2 node rbg 8c", dict(mlp_num_dtype=16, train_forward="kernel2",
                                 qat_noise_where="node")),
    ("kernel3 node rbg 8c", dict(mlp_num_dtype=16, train_forward="kernel3",
                                 qat_noise_where="node")),
    ("kernel3 guard-off 8c", dict(mlp_num_dtype=16, train_forward="kernel3",
                                  qat_noise_where="node",
                                  sdc_guard_train=False)),
    ("kernel2 node 16c", dict(mlp_num_dtype=16, train_forward="kernel2",
                              qat_noise_where="node", num_crops=16)),
    ("kernel3 node 16c", dict(mlp_num_dtype=16, train_forward="kernel3",
                              qat_noise_where="node", num_crops=16)),
):
    try:
        r = bench_train_steps(2000, **kw)
        print(f"{label}: {r:.1f} steps/s", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)
PYEOF

echo "--- [3] 20k default-config quality (kernel3) ---" >> "$LOG"
timeout 3000 python -m nic.cli.image_compression NUM_EPOCHS=20000 \
    QAT_NOISE_WHERE=node INTERVAL_PRINT=10000 >> "$LOG" 2>&1

echo "--- [4] mip-mode kernel3 rate ---" >> "$LOG"
timeout 6000 python -u - <<'PYEOF' >> "$LOG" 2>&1
from bench import bench_train_steps
for label, kw in (
    ("kernel3 mip", dict(mlp_num_dtype=16, train_forward="kernel3",
                         qat_noise_where="node", tf_no_mip=False)),
    ("kernel2 mip", dict(mlp_num_dtype=16, train_forward="kernel2",
                         qat_noise_where="node", tf_no_mip=False)),
):
    try:
        r = bench_train_steps(2000, **kw)
        print(f"{label}: {r:.1f} steps/s", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)
PYEOF
echo "=== r4 queue3 done $(date) ===" >> "$LOG"

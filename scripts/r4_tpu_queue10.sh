#!/bin/sh
# Round-4 queue #10 (session 5 consolidated): the /tmp wipe lost queue6-9
# logs, so this re-runs every still-unrecorded chip validation in one
# sequential chain (one TPU process at a time):
# [1] CORRECTED kernel3 feature-noise rate ladder (queue9 body — queue6
#     accidentally pinned the gather path via mlp_num_dtype!=None);
# [2] 20k quality, ZERO flags (band 38.45-38.82 dB);
# [3] tanherf decode clock vs tanh/exact (queue8 [1]);
# [4] 320k convergence, ZERO flags (gate: >= ~41.9 dB else revert the
#     kernel3 in-kernel-noise auto gate);
# [5] hyperprior lam=0.018 50k retrain + format-3 device-bin decode
#     clock (queue7; target colocated >= 200 MPix/s);
# [6] 19-cell GELU parity sweep incl tanherf (queue8 [2] — the evidence
#     gate for tanherf entering bench value_exact);
# [7] bench.py refresh under current defaults.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue10.log
echo "=== r4 queue10 start $(date) ===" >> "$LOG"

echo "--- [1] kernel3 feature-noise rate ladder (corrected) ---" >> "$LOG"
timeout 5000 python -u - <<'PYEOF' >> "$LOG" 2>&1
from bench import bench_train_steps
for label, kw in (
    ("k3+feature-noise 8c flag-free", dict(mlp_num_dtype=None,
                                           tf_write_psnr=False)),
    ("k3+feature-noise 16c", dict(mlp_num_dtype=None, tf_write_psnr=False,
                                  num_crops=16)),
    ("k3+node-noise 8c (opt-in)", dict(mlp_num_dtype=None,
                                       tf_write_psnr=False,
                                       qat_noise_where="node")),
    ("k3+feature-noise 8c psnr-on", dict(mlp_num_dtype=None)),
):
    r = bench_train_steps(**kw)
    print(f"{label}: {r:.1f} steps/s", flush=True)
PYEOF

echo "--- [2] 20k quality, zero flags ---" >> "$LOG"
timeout 2500 python -m nic.cli.image_compression NUM_EPOCHS=20000 \
    INTERVAL_PRINT=10000 >> "$LOG" 2>&1

echo "--- [3] tanherf decode clock ---" >> "$LOG"
timeout 2400 python -u - <<'PYEOF' >> "$LOG" 2>&1
import jax.numpy as jnp
from bench import bench_decode
for size in (2048, 512):
    for gelu in ("tanherf", "tanh", "exact"):
        g = bench_decode("pallas", size, dtype=jnp.bfloat16, gelu=gelu)
        print(f"{gelu}@{size}: {g:.4f} GPix/s", flush=True)
PYEOF

echo "--- [4] 320k convergence, zero flags ---" >> "$LOG"
timeout 7000 python -m nic.cli.image_compression NUM_EPOCHS=320000 \
    INTERVAL_PRINT=40000 >> "$LOG" 2>&1

echo "--- [5] hyperprior retrain lam=0.018 (50k, clipped) ---" >> "$LOG"
STEPS=50000 LAMS="0.018" sh scripts/sweep_hyperprior.sh >> "$LOG" 2>&1
echo "--- [5b] codec decode clock (format 3, device bins) ---" >> "$LOG"
timeout 1800 python -u scripts/bench_hyperprior_decode.py >> "$LOG" 2>&1

echo "--- [6] gelu parity sweep incl tanherf ---" >> "$LOG"
timeout 9000 python -u scripts/r4_gelu_parity_sweep.py >> "$LOG" 2>&1

echo "--- [7] bench.py ---" >> "$LOG"
timeout 4000 python bench.py > /tmp/r4_bench10.json 2>> "$LOG"
cat /tmp/r4_bench10.json >> "$LOG"
echo "=== r4 queue10 done $(date) ===" >> "$LOG"

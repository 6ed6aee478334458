#!/bin/sh
# Round-2 post-sweep TPU measurement batch. Run AFTER the hyperprior
# sweep releases the chip (single-TPU-client rule). Sequential, each
# step bounded by timeout; results append to /tmp/r2_measure.log.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r2_measure.log
echo "=== r2 measurements start $(date) ===" >> "$LOG"

echo "--- [1/5] packed fused-kernel decode ---" >> "$LOG"
timeout 1500 python -u - <<'EOF' >> "$LOG" 2>&1
import numpy as np, jax, jax.numpy as jnp
import bench
from scripts.honest_bench import honest_decode_time
from nic.kernels.decode_fused_v2 import decode_image_fused_v2
from nic.grids.fastdecode import fast_decode

for size, kbig in ((512, 128), (2048, 12)):
    fp, mlp, m2l = bench._setup(size)
    ref = np.asarray(jax.jit(lambda fp, mlp: fast_decode(
        fp, mlp, 0, image_size=size, mip_to_level=m2l,
        pe_channels=bench.PE, use_tri_pe=True, ndim=2))(fp, mlp))
    for dt, dn in ((jnp.bfloat16, "bf16"), (None, "fp32")):
        for g in ("tanh", "poly", "exact"):
            fn = lambda fp_, mlp_: decode_image_fused_v2(
                fp_, mlp_, 0, image_size=size, mip_to_level=m2l,
                pe_channels=bench.PE, use_tri_pe=True, dtype=dt, gelu=g)
            got = np.asarray(jax.jit(fn)(fp, mlp))
            err = float(np.abs(ref - got).max())
            t = honest_decode_time(fn, fp, mlp, kbig=kbig, ksmall=2)
            print(f"packed {dn} {g} {size}: {t*1e3:.3f} ms = "
                  f"{size*size/t/1e9:.2f} GPix/s maxerr={err:.1e}", flush=True)
EOF

echo "--- [2/5] mip-mode vs no-mip train steps/s ---" >> "$LOG"
timeout 900 python -u - <<'EOF' >> "$LOG" 2>&1
import time
from nic.cli.image_compression import load_asset
from nic.config import CompressionConfig
from nic.train.ntc import NTCTrainer

for no_mip in (True, False):
    cfg = CompressionConfig(num_epochs=10**6, tf_no_mip=no_mip,
                            rng_impl="rbg")
    tr = NTCTrainer(cfg, load_asset(cfg))
    # warm at the SAME chunk size so the timed call reuses the compile
    tr.train_many(600, chunk=600)
    t0 = time.perf_counter()
    tr.train_many(600, chunk=600)
    r = 600 / (time.perf_counter() - t0)
    print(f"tf_no_mip={no_mip}: {r:.1f} steps/s", flush=True)
EOF

echo "--- [3/5] pixel baseline (matmul conv impl) ---" >> "$LOG"
timeout 1500 python scripts/measure_baseline.py pixel >> "$LOG" 2>&1

echo "--- [4/5] eval_rd NTC protocol (bundled set, 20k ep) ---" >> "$LOG"
timeout 3000 python -m nic.cli.eval_rd --dir data --codec ntc \
    NUM_EPOCHS=20000 FP_BITS=8 >> "$LOG" 2>&1
timeout 3000 python -m nic.cli.eval_rd --dir data --codec ntc \
    NUM_EPOCHS=20000 FP_BITS=4 >> "$LOG" 2>&1

echo "--- [5/5] bench.py (driver contract) ---" >> "$LOG"
timeout 3000 python bench.py >> "$LOG" 2>&1

echo "=== r2 measurements done $(date) ===" >> "$LOG"

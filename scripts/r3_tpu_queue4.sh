#!/bin/sh
# Round-3 chip queue #4 (priority-ordered — the tunnel died 20:05 and the
# remaining chip window is unknown):
# [1] trainer steps/s ladder: lattice sampling (new default) × TRAIN_FORWARD
#     {gather,kernel} — answers VERDICT #4's ≥1.5× directly;
# [2] packed train-kernel micro-bench (erf/poly × R) vs 2.70 ms XLA;
# [3] 20k quality A/B at full protocol, SDC-guarded decodes;
# [4] hyperprior decode: device-only transform slope;
# [5] stage-2 component profile (gather_fwd_bwd after lattice);
# [6] bench.py refresh.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue4.log
echo "=== r3 queue4 start $(date) ===" >> "$LOG"

echo "--- [1/6] trainer steps/s: lattice x {gather,kernel} ---" >> "$LOG"
timeout 3000 python -u - <<'PYEOF' >> "$LOG" 2>&1
import time
from nic.config import CompressionConfig
from nic.cli.image_compression import load_asset
from nic.train.ntc import NTCTrainer
for fwd, noise, rng in (("gather","node","rbg"), ("kernel","node","rbg"),
                        ("gather","feature","threefry2x32"),
                        ("kernel","feature","threefry2x32")):
    cfg = CompressionConfig(num_epochs=10**6, mlp_num_dtype=16,
                            train_forward=fwd, qat_noise_where=noise,
                            rng_impl=rng, tf_write_psnr=False)
    tr = NTCTrainer(cfg, load_asset(cfg))
    tr.train_many(1000, chunk=1000)
    t0 = time.perf_counter()
    tr.train_many(1000, chunk=1000)
    print(f"{fwd}/{noise}/{rng}: {1000/(time.perf_counter()-t0):.2f} steps/s",
          flush=True)
PYEOF

echo "--- [2/6] packed-kernel micro-bench ---" >> "$LOG"
timeout 2400 python -u - <<'PYEOF' >> "$LOG" 2>&1
import sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from scripts.profile_train_step import slope_time
from nic.models.mlp import init_mlp
import nic.kernels.train_fused as tf

N, F, H = 524288, 73, 64
k1,k2,k3 = jax.random.split(jax.random.PRNGKey(0),3)
mlp = init_mlp(k1, F, H, 3)
x0 = jax.random.normal(k2,(N,F),jnp.float32)*0.3
tgt = jax.nn.sigmoid(jax.random.normal(k3,(N,3)))
md = jnp.bfloat16

def chain(body):
    def make(kk):
        @jax.jit
        def run():
            return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
        return run
    return make

for gl in ("erf", "poly"):
    for R in (2048, 1024):
        tf.pick_block_rows = lambda n, _R=R: _R
        fg = jax.grad(lambda m, x: tf.fused_mlp_loss(m, x, tgt, md, gl)[0],
                      argnums=(0,1))
        def f_body(i, s):
            gm, gx = fg(mlp, x0 + s*1e-30)
            return s + jnp.sum(gm["w1"])*1e-9 + jnp.sum(gx)*1e-9
        try:
            t = slope_time(chain(f_body), kbig=12, ksmall=2, reps=3)
            print(f"fused-packed gelu={gl} R={R}: {t*1e3:.3f} ms", flush=True)
        except Exception as e:
            print(f"fused-packed gelu={gl} R={R}: {type(e).__name__} "
                  f"{str(e)[:160]}", flush=True)
PYEOF

echo "--- [3/6] 20k quality A/B (guarded decodes) ---" >> "$LOG"
timeout 1800 python -m nic.cli.image_compression NUM_EPOCHS=20000 \
    MLP_NUM_DTYPE=16 TRAIN_FORWARD=kernel QAT_NOISE_WHERE=node RNG_IMPL=rbg \
    INTERVAL_PRINT=5000 >> "$LOG" 2>&1
timeout 1800 python -m nic.cli.image_compression NUM_EPOCHS=20000 \
    MLP_NUM_DTYPE=16 INTERVAL_PRINT=5000 >> "$LOG" 2>&1

echo "--- [4/6] hyperprior decode: device-only transform slope ---" >> "$LOG"
timeout 1800 python scripts/bench_hyperprior_decode.py >> "$LOG" 2>&1

echo "--- [5/6] stage-2 profile after lattice sampling ---" >> "$LOG"
timeout 3600 python scripts/profile_train_step.py --stage2 >> "$LOG" 2>&1

echo "--- [6/6] bench.py refresh ---" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1

echo "=== r3 queue4 done $(date) ===" >> "$LOG"

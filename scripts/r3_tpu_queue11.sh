#!/bin/sh
# Round-3 session-3 queue #11: train-kernel GELU probe.
# The decode kernel is VPU-transcendental-bound (tanh 1.58 vs erf 0.71
# GPix/s); the fused TRAIN kernels have always run gelu="erf" (2 erf + 1
# exp per hidden activation per step). TRAIN_GELU=poly swaps in the 8-FMA
# even-polynomial pair (|dgelu| <= 3.6e-4, no transcendentals).
# [1] steps/s ladder: kernel2 x {erf, poly}, kernel x {erf, poly},
#     mip-kernel2 x {erf, poly};
# [2] isolated fused_mlp_loss_ng value+grad slope, erf vs poly;
# [3] if poly wins: 20k full-protocol quality run with TRAIN_GELU=poly.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue11.log
echo "=== r3 queue11 start $(date) ===" >> "$LOG"

echo "--- [1] steps/s ladder erf vs poly ---" >> "$LOG"
timeout 3600 python -u - <<'PYEOF' >> "$LOG" 2>&1
import time
from nic.config import CompressionConfig
from nic.cli.image_compression import load_asset
from nic.train.ntc import NTCTrainer
for fwd, mip in (("kernel2", True), ("kernel2", False), ("kernel", True)):
    for gelu in ("erf", "poly"):
        cfg = CompressionConfig(num_epochs=10**6, mlp_num_dtype=16,
                                train_forward=fwd, qat_noise_where="node",
                                rng_impl="rbg", tf_write_psnr=False,
                                tf_no_mip=mip, train_gelu=gelu)
        tr = NTCTrainer(cfg, load_asset(cfg))
        tr.train_many(1000, chunk=1000)
        t0 = time.perf_counter()
        tr.train_many(1000, chunk=1000)
        dt = time.perf_counter() - t0
        tag = f"{fwd}{'' if mip else '+mip'}/{gelu}"
        print(f"{tag}: {1000/dt:.2f} steps/s", flush=True)
PYEOF

echo "--- [2] isolated ng kernel slope erf vs poly ---" >> "$LOG"
timeout 1200 python -u - <<'PYEOF' >> "$LOG" 2>&1
import time
import numpy as np
import jax, jax.numpy as jnp
from nic.models.mlp import init_mlp
from nic.kernels.train_fused import fused_mlp_loss_ng

C, PE, H, n, crops = 12, 6, 64, 256, 8
F = C * 5 + PE * 2 + 1
ks = jax.random.split(jax.random.PRNGKey(0), 5)
g0 = jax.random.uniform(ks[0], (C, 129, 129), jnp.float32)
g1 = jax.random.uniform(ks[1], (C, 65, 65), jnp.float32)
mlp = init_mlp(ks[2], F, H, 3)
N = crops * n * n
x = jax.random.normal(ks[3], (N, F), jnp.float32) * 0.3
tgt = jax.nn.sigmoid(jax.random.normal(ks[4], (N, 3)))
origins = jnp.zeros((crops, 2), jnp.int32)

def slope(gelu, rowsb=2048, f=4):
    def loss(g0_, g1_, m):
        l, _ = fused_mlp_loss_ng(g0_, g1_, m, x, tgt, origins, crops, n,
                                 rowsb, f, jnp.bfloat16, gelu)
        return l
    vg = jax.value_and_grad(loss, argnums=(0, 1, 2))
    def make(k):
        @jax.jit
        def run(g0_, g1_, m):
            def body(i, s):
                l, gr = vg(g0_ + s * 1e-30, g1_, m)
                # fold every grad leaf into the carry so the backward
                # can't be dead-code-eliminated out of the timed chain
                gsum = sum(jnp.sum(v) for v in jax.tree.leaves(gr))
                return (l + gsum) * 1e-9
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        float(run(g0, g1, mlp))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); float(run(g0, g1, mlp))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))
    t1, tk = make(2), make(26)
    return (tk - t1) / 24

for gelu in ("erf", "poly"):
    t = slope(gelu)
    print(f"ng kernel+unfold vg slope {gelu}: {t*1e3:.3f} ms", flush=True)
PYEOF

echo "--- [3] 20k quality run TRAIN_GELU=poly ---" >> "$LOG"
timeout 1800 python -m nic.cli.image_compression NUM_EPOCHS=20000 \
    MLP_NUM_DTYPE=16 TRAIN_FORWARD=kernel2 QAT_NOISE_WHERE=node RNG_IMPL=rbg \
    TRAIN_GELU=poly INTERVAL_PRINT=10000 >> "$LOG" 2>&1

echo "=== r3 queue11 done $(date) ===" >> "$LOG"

#!/bin/sh
# Round-3 session-3 queue #13: lane-packed ng kernel (two blocks/step,
# full 128-lane activations) chip A/B.
# [1] kernel2 steps/s: packed vs NIC_NG_NO_PACK=1, x {erf, poly};
# [2] mip kernel2 packed poly (stacking the session's two wins);
# [3] corrected isolated kernel slope (perturb x — queue12 [1] perturbed
#     g0, whose values the primal ignores, so XLA hoisted the kernel out
#     of the timed loop);
# [4] 20k full-protocol quality run, packed + poly.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue13.log
echo "=== r3 queue13 start $(date) ===" >> "$LOG"

echo "--- [1] packed vs unpacked ladder ---" >> "$LOG"
timeout 3600 python -u - <<'PYEOF' >> "$LOG" 2>&1
import os, time
from nic.config import CompressionConfig
from nic.cli.image_compression import load_asset
from nic.train.ntc import NTCTrainer
import nic.kernels.train_fused as tf

for pack in (True, False):
    os.environ.pop("NIC_NG_NO_PACK", None)
    if not pack:
        os.environ["NIC_NG_NO_PACK"] = "1"
    for gelu in ("erf", "poly"):
        for mip in (True, False):
            cfg = CompressionConfig(num_epochs=10**6, mlp_num_dtype=16,
                                    train_forward="kernel2",
                                    qat_noise_where="node", rng_impl="rbg",
                                    tf_write_psnr=False, tf_no_mip=mip,
                                    train_gelu=gelu)
            tr = NTCTrainer(cfg, load_asset(cfg))
            tr.train_many(1000, chunk=1000)
            t0 = time.perf_counter()
            tr.train_many(1000, chunk=1000)
            dt = time.perf_counter() - t0
            tag = (f"{'packed' if pack else 'unpacked'}/{gelu}"
                   f"{'' if mip else '+mip'}")
            print(f"{tag}: {1000/dt:.2f} steps/s", flush=True)
PYEOF

echo "--- [3] isolated kernel slope (x perturbed) ---" >> "$LOG"
timeout 1800 python -u - <<'PYEOF' >> "$LOG" 2>&1
import os, time
import numpy as np
import jax, jax.numpy as jnp
from nic.models.mlp import init_mlp
import nic.kernels.train_fused as tf

C, PE, H, n, crops = 12, 6, 64, 256, 8
F = C * 5 + PE * 2 + 1
ks = jax.random.split(jax.random.PRNGKey(0), 5)
mlp = init_mlp(ks[2], F, H, 3)
N = crops * n * n
x = jax.random.normal(ks[3], (N, F), jnp.float32) * 0.3
tgt = jax.nn.sigmoid(jax.random.normal(ks[4], (N, 3)))
origins = jnp.zeros((crops, 2), jnp.int32)

def slope(impl, gelu, kbig=26, ksmall=2):
    def call(x_):
        return impl(x_, tgt, origins, mlp["w1"], mlp["b1"], mlp["w2"],
                    mlp["b2"], mlp["w3"], mlp["b3"], crops=crops, ncols=n,
                    rowsb=8, f=4, matmul_dtype=jnp.bfloat16, gelu=gelu)
    def make(k):
        @jax.jit
        def run(x_):
            def body(i, s):
                r = call(x_ + s * 1e-30)   # x feeds the kernel: real dep
                return sum(jnp.sum(v) for v in jax.tree.leaves(r)) * 1e-9
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        float(run(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); float(run(x))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))
    t1, tk = make(ksmall), make(kbig)
    return (tk - t1) / (kbig - ksmall)

for name, impl in (("unpacked", tf._impl_ng), ("packed", tf._impl_ng2)):
    for gelu in ("erf", "poly"):
        t = slope(impl, gelu)
        print(f"{name}/{gelu}: kernel+outputs {t*1e3:.3f} ms", flush=True)
PYEOF

echo "--- [4] 20k quality packed + poly ---" >> "$LOG"
timeout 1800 python -m nic.cli.image_compression NUM_EPOCHS=20000 \
    MLP_NUM_DTYPE=16 TRAIN_FORWARD=kernel2 QAT_NOISE_WHERE=node RNG_IMPL=rbg \
    TRAIN_GELU=poly INTERVAL_PRINT=10000 >> "$LOG" 2>&1

echo "=== r3 queue13 done $(date) ===" >> "$LOG"

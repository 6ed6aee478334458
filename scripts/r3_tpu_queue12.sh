#!/bin/sh
# Round-3 session-3 queue #12:
# [1] corrected isolated ng-kernel slope (rowsb=8, f=4 — queue11 [2] passed
#     the wrong block geometry) to size the kernel fraction of the step;
# [2] 320k full-protocol convergence run with TRAIN_GELU=poly (the 20k
#     point was in-band; this decides whether poly can be a default).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue12.log
echo "=== r3 queue12 start $(date) ===" >> "$LOG"

echo "--- [1] isolated ng kernel slope (correct geometry) ---" >> "$LOG"
timeout 1800 python -u - <<'PYEOF' >> "$LOG" 2>&1
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

def slope(fn, args, kbig=26, ksmall=2):
    def make(k):
        @jax.jit
        def run(*a):
            def body(i, s):
                r = fn(*((a[0] + s * 1e-30,) + a[1:]))
                leaves = jax.tree.leaves(r)
                return sum(jnp.sum(v) for v in leaves) * 1e-9
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        float(run(*args))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); float(run(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))
    t1, tk = make(ksmall), make(kbig)
    return (tk - t1) / (kbig - ksmall)

for gelu in ("erf", "poly"):
    def loss(g0_, g1_, m):
        l, _ = fused_mlp_loss_ng(g0_, g1_, m, x, tgt, origins, crops, n,
                                 8, 4, jnp.bfloat16, gelu)
        return l
    vg = jax.value_and_grad(loss, argnums=(0, 1, 2))
    t_vg = slope(lambda a, b, c: vg(a, b, c), (g0, g1, mlp))
    t_fwd = slope(lambda a, b, c: loss(a, b, c), (g0, g1, mlp))
    print(f"ng {gelu}: fwd(kernel only, no unfold cotangent) "
          f"{t_fwd*1e3:.3f} ms, value+grad {t_vg*1e3:.3f} ms", flush=True)

# reference: the gather forward alone at these shapes (feature assembly)
from nic.grids.sample import decoder_input
def feats(g0_, g1_, m):
    def one(origin):
        return decoder_input((g0_, g1_), 0, origin, 0.25, n, pe_channels=PE,
                             mip_level=0, ndim=2, use_tri_pe=True,
                             dtype=jnp.float32)
    return jax.vmap(one)(origins).reshape(N, F)
t_g = slope(feats, (g0, g1, mlp))
print(f"gather forward (feature assembly): {t_g*1e3:.3f} ms", flush=True)
PYEOF

echo "--- [2] 320k TRAIN_GELU=poly convergence ---" >> "$LOG"
timeout 3000 python -m nic.cli.image_compression NUM_EPOCHS=320000 \
    MLP_NUM_DTYPE=16 TRAIN_FORWARD=kernel2 QAT_NOISE_WHERE=node RNG_IMPL=rbg \
    TRAIN_GELU=poly INTERVAL_PRINT=10000 >> "$LOG" 2>&1

echo "=== r3 queue12 done $(date) ===" >> "$LOG"

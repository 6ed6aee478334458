#!/bin/sh
# Round-4 queue #8: the tanherf GELU mode (erf routed through the cheap
# hardware tanh, |Dgelu| <= 1.44e-6).
# [1] chip clock at 2048^2 / 512^2 (bf16, vs the mode ladder);
# [2] re-run the 19-cell u8-parity sweep with tanherf included — the
#     evidence gate for bench.py's value_exact inclusion.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue8.log
PREV=$(cat /tmp/r4_queue7.pid 2>/dev/null)
if [ -n "$PREV" ]; then
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
echo "=== r4 queue8 start $(date) ===" >> "$LOG"

echo "--- [1] tanherf decode clock ---" >> "$LOG"
timeout 2400 python -u - <<'PYEOF' >> "$LOG" 2>&1
import jax.numpy as jnp
from bench import bench_decode
for size in (2048, 512):
    for gelu in ("tanherf", "tanh", "exact"):
        g = bench_decode("pallas", size, dtype=jnp.bfloat16, gelu=gelu)
        print(f"{gelu}@{size}: {g:.4f} GPix/s", flush=True)
PYEOF

echo "--- [2] parity sweep incl tanherf ---" >> "$LOG"
timeout 8000 python -u scripts/r4_gelu_parity_sweep.py >> "$LOG" 2>&1
echo "=== r4 queue8 done $(date) ===" >> "$LOG"

#!/bin/sh
# Round-4 queue #2:
# [0] persistent-compile-cache probe (VERDICT #7): same jit in two fresh
#     processes — the second should hit .jax_cache and compile in seconds;
# [1-4] 320k full-protocol A/B at FP_BITS in {4,2} x QAT_NOISE_WHERE in
#     {node, feature} (VERDICT #2): the evidence gate for flipping the
#     node-noise default. All runs use the new round-4 defaults
#     (bf16 + rbg + auto->packed kernel2 + poly).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue2.log
echo "=== r4 queue2 start $(date) ===" >> "$LOG"

echo "--- [0] compile-cache probe ---" >> "$LOG"
for i in 1 2; do
timeout 1800 python -u - <<'PYEOF' >> "$LOG" 2>&1
import time
import nic  # wires the persistent compilation cache
import jax, jax.numpy as jnp
t0 = time.time()
# a distinctive shape unlikely to be cached by other runs
f = jax.jit(lambda x: jnp.tanh(x @ x.T + 0.12345).sum())
x = jnp.ones((1537, 771), jnp.bfloat16)
print("result", f(x), "compile+run s:", round(time.time() - t0, 2))
PYEOF
done

for BITS in 4 2; do
  for WHERE in node feature; do
    echo "--- 320k FP_BITS=$BITS QAT_NOISE_WHERE=$WHERE $(date) ---" >> "$LOG"
    timeout 7000 python -m nic.cli.image_compression NUM_EPOCHS=320000 \
        FP_BITS=$BITS QAT_NOISE_WHERE=$WHERE \
        INTERVAL_PRINT=20000 >> "$LOG" 2>&1
  done
done
echo "=== r4 queue2 done $(date) ===" >> "$LOG"

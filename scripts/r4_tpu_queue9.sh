#!/bin/sh
# Round-4 queue #9: CORRECTED kernel3 feature-noise rate ladder (queue6
# [1] accidentally pinned train_forward="gather" via the bench helper's
# parity-row convention: mlp_num_dtype!=None implies the gather path).
# Flag-free rows use mlp_num_dtype=None (pure config defaults).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue9.log
PREV=$(cat /tmp/r4_queue8.pid 2>/dev/null)
if [ -n "$PREV" ]; then
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
echo "=== r4 queue9 start $(date) ===" >> "$LOG"
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
echo "=== r4 queue9 done $(date) ===" >> "$LOG"

#!/bin/bash
# Probe until the TPU tunnel recovers, then finish the measurement session:
# pixel baseline + final bench.
set -u
cd /root/repo
echo "[recover] probing TPU..."
while true; do
  if timeout 90 python -c "import jax, jax.numpy as jnp; jnp.sum(jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
    echo "[recover] TPU alive at $(date)"
    break
  fi
  echo "[recover] still down at $(date)"
  sleep 60
done

echo "[recover] === pixel baseline ==="
timeout 1200 python scripts/measure_baseline.py pixel 2>&1 | grep -a RECORDED | tail -2

echo "[recover] === final bench ==="
NIC_BENCH_PALLAS=0 timeout 900 python bench.py 2>&1 | tail -1

echo "[recover] done at $(date)"

#!/bin/bash
# Wait for the video sweep to finish, then run the TPU perf session:
# bench (all decode backends incl. Pallas v2), train-step probes, and the
# conv-AE re-measure with loss tracing. ONE TPU client at a time.
set -u
cd /root/repo

echo "[session] waiting for measure_baseline to exit..."
while pgrep -f "measure_baseline.py video34" > /dev/null; do sleep 30; done
echo "[session] sweep done at $(date)"

echo "[session] === bench.py ==="
timeout 1200 python bench.py 2>&1 | tail -3

echo "[session] === perf_probe train ==="
timeout 1800 python scripts/perf_probe.py train 2>&1 | grep -v WARNING | tail -8

echo "[session] === perf_probe decode ==="
timeout 1200 python scripts/perf_probe.py decode 2>&1 | grep -v WARNING | tail -6

echo "[session] === convae re-measure ==="
timeout 1500 python scripts/measure_baseline.py convae 2>&1 | grep -E "convae step|RECORDED" | tail -12

echo "[session] all done at $(date)"

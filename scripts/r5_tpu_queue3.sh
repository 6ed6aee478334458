#!/bin/sh
# Round-5 chip queue 3 (after queue2's hyperprior retrain + clock):
#   [1] full parity-sweep re-run — both i16 scale tightenings (2D
#       true-node-max, 3D true-max + single C1 rounding) change the
#       i16 columns, and bench gates exact-class membership on this
#       table, so the evidence must be re-measured on the shipped code
#   [2] full bench.py → results/r5_bench.json (the driver runs its own
#       BENCH_r05 at round end; this run records the numbers for
#       BASELINE.md and catches surprises while there is wall left)
cd "$(dirname "$0")/.." || exit 1
echo $$ > /tmp/r5_queue3.pid

while kill -0 "$(cat /tmp/r5_queue2.pid 2>/dev/null)" 2>/dev/null; do
    sleep 30
done
echo "=== [1] parity sweep re-run $(date) ==="
# write to a side table and promote ONLY on completion: a partial
# re-run table would be missing exactly the worst cells the gate needs
SWEEP_OUT=results/r5_gelu_parity_rerun.json \
    python scripts/r5_gelu_parity_sweep.py > /tmp/r5_parity2.log 2>&1
# promote only a COMPLETE, error-free table: safe_cell swallows per-cell
# exceptions into error rows (and decode_modes drops failed i16 keys),
# yet the final "wrote" line still prints — bench's worst-cell gate
# skips those rows, so promoting them would admit a mode to the exact
# class on evidence that never measured its worst cells
if python - <<'PYEOF'
import json, sys
try:
    rows = json.load(open("results/r5_gelu_parity_rerun.json"))["rows"]
except Exception:
    sys.exit(1)
errs = [r for r in rows if "error" in r]
need = [r for r in rows if "error" not in r
        and "pallas_i16_tanherf_max_lsb" not in r]
sys.exit(0 if len(rows) >= 20 and not errs and not need else 1)
PYEOF
then
    cp results/r5_gelu_parity_rerun.json results/r5_gelu_parity.json
    echo "sweep complete — table promoted"
else
    echo "sweep INCOMPLETE/errored — keeping the previous committed table"
fi
echo "=== [2] bench $(date) ==="
python bench.py 2>/tmp/r5_bench.err | tail -1 > /tmp/r5_bench.json
if python -c "import json;json.load(open('/tmp/r5_bench.json'))"; then
    cp /tmp/r5_bench.json results/r5_bench.json
    cat results/r5_bench.json
else
    echo "bench FAILED:"; tail -5 /tmp/r5_bench.err
fi
echo "=== queue3 done $(date) ==="

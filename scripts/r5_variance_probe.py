"""Run-to-run variance of the headline decode slopes (round-5 session 4).

results/r5_bench.json and the intermediate bench run measured the same
i16·tanherf 2048² mode at 0.991 and 1.048 GPix/s — a spread that
straddles the ≥1 GPix/s north star. This probe repeats the EXACT bench
measurement (same honest fori-slope harness, same shapes) N times per
mode and records min/median/max, so the claim about measurement noise
is itself measured rather than asserted.

Usage (TPU, chip otherwise idle):  python scripts/r5_variance_probe.py
Writes results/r5_variance_probe.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    import jax.numpy as jnp

    from bench import BENCH_SIZE, bench_decode

    n = int(os.environ.get("PROBE_REPS", "7"))
    modes = [
        ("i16_tanherf", dict(dtype="i16", gelu="tanherf")),
        ("bf16_tanh", dict(dtype=jnp.bfloat16, gelu="tanh")),
    ]
    out: dict = {"reps": n, "size": BENCH_SIZE}
    for name, kw in modes:
        vals = [round(bench_decode("pallas", BENCH_SIZE, **kw), 4)
                for _ in range(n)]
        out[name] = {
            "gpix_s": vals,
            "min": float(np.min(vals)),
            "median": float(np.median(vals)),
            "max": float(np.max(vals)),
        }
        print(name, out[name], flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/r5_variance_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/r5_variance_probe.json", flush=True)


if __name__ == "__main__":
    main()

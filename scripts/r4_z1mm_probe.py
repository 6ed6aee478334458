"""Chip A/B for the z1-matmul decode kernel (_kernel_z1mm).

Clocks the packed 2048² fused decode with the z1 build on the VPU
(baseline) vs on the MXU (z1_matmul=True) across the GELU modes that
matter (tanh = headline, poly = exact-class, erfpoly = f32-exact class),
plus a 512² row and a parity check per mode. Writes
results/r4_z1mm_probe.json.

Motivation: the round-4 decode roofline (BASELINE.md) shows the kernel
VPU-issue-bound with MXU/HBM 11×+ slack; the z1 build (P row-upsample +
C1 row-interp) is ~5 element-ops/elem of VPU work that two small
contractions against static matrices can move onto the idle MXU.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from bench import _decode_fn, _setup
from scripts.honest_bench import honest_decode_time


def main():
    out = {}
    for size in (2048, 512):
        fp, mlp, m2l = _setup(size)
        kbig = 96 if size <= 512 else 12
        for gelu in ("tanh", "poly", "erfpoly"):
            base_fn = _decode_fn("pallas", size, m2l, jnp.bfloat16, gelu,
                                 z1_matmul=False)
            mm_fn = _decode_fn("pallas", size, m2l, jnp.bfloat16, gelu,
                               z1_matmul=True)
            # parity first (u8-scale agreement; both bf16 planes)
            a = np.asarray(base_fn(fp, mlp), np.float32)
            b = np.asarray(mm_fn(fp, mlp), np.float32)
            lsb = float(np.abs(a - b).max() * 255.0)
            t0 = honest_decode_time(base_fn, fp, mlp, kbig=kbig, ksmall=2)
            t1 = honest_decode_time(mm_fn, fp, mlp, kbig=kbig, ksmall=2)
            row = {
                "vpu_gpix_s": round(size * size / t0 / 1e9, 4),
                "mxu_gpix_s": round(size * size / t1 / 1e9, 4),
                "speedup": round(t0 / t1, 4),
                "max_abs_diff_lsb": round(lsb, 3),
            }
            out[f"{gelu}_{size}"] = row
            print(f"{gelu}@{size}: {row}", flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/r4_z1mm_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

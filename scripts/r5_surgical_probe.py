"""Round-5 directive #3 probe: an exact-envelope decode mode ≥ 1 GPix/s.

Ladder over (plane dtype × GELU) at the flagship 2048² geometry:
honest fori-slope GPix/s + max u8 LSB vs the fp32 folded-XLA decode.

Modes:
- bf16 planes (since round 5: fp32 column-stage math, ONE storage
  rounding) × {exact-erf, tanherf, tanh}
- "surgical" (fp32 planes/windows/elementwise, bf16 MXU dots — the
  decode analogue of MLP_NUM_DTYPE=16) × the same three
- fp32 reference row (tanh) for the cost-of-fp32 anchor

Writes results/r5_surgical_probe.json; the bench relabeling of
value_exact keys off this evidence (plus the full parity sweep).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax.numpy as jnp

    from bench import BENCH_SIZE, PE, _setup, bench_decode
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_v2 import decode_image_fused_v2

    fp, mlp, m2l = _setup(BENCH_SIZE)
    ref = np.asarray(fast_decode(
        fp, mlp, 0, image_size=BENCH_SIZE, mip_to_level=m2l,
        pe_channels=PE, use_tri_pe=True, ndim=2))
    ref_u8 = np.clip(ref * 255 + 0.5, 0, 255).astype(np.int32)

    rows = []
    ladder = [
        ("bf16", jnp.bfloat16), ("surgical", "surgical"), ("fp32", None),
    ]
    for dname, dtype in ladder:
        gelus = ("exact", "tanherf", "tanh") if dname != "fp32" else ("tanh",)
        for gelu in gelus:
            got = np.asarray(decode_image_fused_v2(
                fp, mlp, 0, image_size=BENCH_SIZE, mip_to_level=m2l,
                pe_channels=PE, use_tri_pe=True, dtype=dtype, gelu=gelu))
            got_u8 = np.clip(got * 255 + 0.5, 0, 255).astype(np.int32)
            lsb = int(np.abs(got_u8 - ref_u8).max())
            maxd = float(np.abs(got - ref).max())
            g = bench_decode("pallas", BENCH_SIZE, dtype=dtype, gelu=gelu)
            rows.append({"planes": dname, "gelu": gelu,
                         "gpix_s": round(g, 4), "u8_lsb": lsb,
                         "max_abs": maxd})
            print(rows[-1])

    out = {"size": BENCH_SIZE, "rows": rows}
    os.makedirs("results", exist_ok=True)
    with open("results/r5_surgical_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

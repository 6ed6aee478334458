"""AOT compile probe for the 3D feature-free train kernel (ff3).

Queue11/12 showed fused_train_ff3 failing Mosaic compilation on the chip
server for the NOISE-OFF variant (qat_noise_where=node, and the frozen
95% hard-quantize tail of EVERY 3D run) while the in-kernel-noise
variant compiles and runs (bench 387.5 steps/s). The failure arrives as
"tpu_compile_helper subprocess exit code 1" with the detail truncated.

This probe lower()+compile()s (chipless AOT — no device execution, safe
to run beside a training queue) every variant at the misty-64³ train
geometry and prints the FULL error per variant:

  noise ∈ {in-kernel (nbits=8), off (node/frozen)} × m3/m4 × gelu poly.

Run on the axon chip terminal:  python scripts/r4_ff3_compile_probe.py
"""

from __future__ import annotations

import os
import sys
import traceback

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    from nic.kernels.train_fused_ff3 import ff3_geometry, fused_train_ff3

    # misty-64³ train geometry (crop_mip_level=5): n=32, f=4, rowsb=2
    n, f, rowsb, crops = 32, 4, 2, 8
    C, pe, hidden = 12, 6, 64
    step = 1.0 / f
    g0n = int(round(n * 2 * step)) + 1  # data_size=64 → nodes along axis
    g0 = jnp.zeros((C, 17, 17, 17), jnp.float32)
    g1 = jnp.zeros((C, 9, 9, 9), jnp.float32)
    mlp = {
        "w1": jnp.zeros((0, hidden), jnp.float32),  # rebuilt per variant
        "b1": jnp.zeros((hidden,), jnp.float32),
        "w2": jnp.zeros((hidden, hidden), jnp.float32),
        "b2": jnp.zeros((hidden,), jnp.float32),
        "w3": jnp.zeros((hidden, 3), jnp.float32),
        "b3": jnp.zeros((3,), jnp.float32),
    }
    tgt = jnp.zeros((crops * n**3, 3), jnp.float32)
    origins = jnp.zeros((crops, 3), jnp.int32)
    seed = jnp.zeros((3,), jnp.int32)

    for sparse in (False, True):
        ncor = 4 if sparse else 8
        nfeat = (ncor + 1) * C + 3 * pe + 1
        mlp_v = dict(mlp, w1=jnp.zeros((nfeat, hidden), jnp.float32))
        assert ff3_geometry(crops=crops, n=n, rowsb=rowsb, f=f,
                            hidden=hidden, pe_channels=pe, nfeat=nfeat)
        for nbits in (8, None):
            tag = f"{'m4' if sparse else 'm3'}/{'noise' if nbits else 'OFF'}"

            def lossf(g0_, g1_, m):
                loss, _ = fused_train_ff3(
                    g0_, g1_, m, tgt, origins, seed, crops, n, rowsb, f,
                    pe, 0.0, sparse, not sparse, jnp.bfloat16, "poly",
                    nbits)
                return loss

            try:
                lowered = jax.jit(jax.value_and_grad(
                    lossf, argnums=(0, 1, 2))).lower(g0, g1, mlp_v)
                lowered.compile()
                print(f"[{tag}] COMPILE OK", flush=True)
            except Exception as e:
                print(f"[{tag}] COMPILE FAILED:", flush=True)
                msg = f"{type(e).__name__}: {e}"
                print(msg[:4000], flush=True)
                if "relayout" not in msg and "Mosaic" not in msg:
                    traceback.print_exc(limit=5)


if __name__ == "__main__":
    main()

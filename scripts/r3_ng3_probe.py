"""Bisect the 3D kernel2 chip-compile failure (queue8: tpu_compile_helper
subprocess exit code 1, no Mosaic op in the error).

Variants, smallest first; each in a fresh jit so one failure doesn't
poison the next:
  tiny    n=8, crops=1, rowsb=4  (the interpret-test shape class)
  mid     n=16, crops=2, rowsb=8
  misty   n=32, crops=8, rowsb=4 (the real protocol shape)
Run each for fwd only (loss) and fwd+grad.
"""
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nic.models.mlp import init_mlp
from nic.kernels.train_fused import fused_mlp_loss_ng3


def run_case(tag, n, crops, rowsb, f, sparse=False, C=12, pe=6, H=64):
    nc = 4 if sparse else 8
    F = C * (nc + 1) + pe * 3 + 1
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    g0n = n * 2  # plenty of nodes
    g1n = n
    g0 = jax.random.uniform(ks[0], (C,) + (g0n,) * 3, jnp.float32)
    g1 = jax.random.uniform(ks[1], (C,) + (g1n,) * 3, jnp.float32)
    mlp = init_mlp(ks[2], F, H, 3)
    x = jax.random.normal(ks[3], (crops * n**3, F), jnp.float32) * 0.3
    tgt = jax.nn.sigmoid(jax.random.normal(ks[4], (crops * n**3, 3)))
    origins = jnp.zeros((crops, 3), jnp.int32)

    def loss(g0g1, m):
        return fused_mlp_loss_ng3(
            g0g1[0], g0g1[1], m, jax.lax.stop_gradient(x), tgt, origins,
            crops, n, rowsb, f, sparse, jnp.bfloat16, "erf")

    try:
        (l, _), g = jax.value_and_grad(loss, has_aux=True)((g0, g1), mlp)
        l = float(l)
        print(f"{tag}: OK loss={l:.5f}", flush=True)
        return True
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return False


if __name__ == "__main__":
    run_case("tiny n=8 c=1 r=4 f=2", 8, 1, 4, 2)
    run_case("tiny n=8 c=1 r=4 f=4", 8, 1, 4, 4)
    run_case("mid n=16 c=2 r=8 f=4", 16, 2, 8, 4)
    run_case("misty n=32 c=8 r=4 f=4", 32, 8, 4, 4)
    run_case("misty sparse m4", 32, 8, 4, 4, sparse=True)

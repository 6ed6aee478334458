"""TPU performance probe: isolate the NTC train-step bottleneck and compare
decode backends. Run alone (one TPU client!) after baseline sweeps finish.

  python scripts/perf_probe.py train   # step-rate A/Bs
  python scripts/perf_probe.py decode  # backend shootout incl. 2048²
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _rate(trainer, steps=1000):
    trainer.train_many(100, chunk=100)  # warm
    t0 = time.time()
    trainer.train_many(steps, chunk=steps)
    return steps / (time.time() - t0)


def probe_train():
    import jax.numpy as jnp

    from nic.config import CompressionConfig
    from nic.train.ntc import NTCTrainer

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (3, 512, 512)).astype(np.float32)

    variants = {
        "defaults(fp32,threefry)": {},
        "rbg_noise": {"rng_impl": "rbg"},
        "bf16": {"mlp_num_dtype": 16},
        "bf16+rbg": {"mlp_num_dtype": 16, "rng_impl": "rbg"},
        "crops16": {"num_crops": 16},
    }
    for name, kw in variants.items():
        cfg = CompressionConfig(num_epochs=10**6, tf_no_mip=True, **kw)
        tr = NTCTrainer(cfg, [img])
        print(f"{name}: {_rate(tr):.1f} steps/s", flush=True)


def probe_decode():
    import jax
    import jax.numpy as jnp

    from nic.grids.fastdecode import fast_decode
    from nic.grids.pyramid import create_pyramid, pyramid_mip_levels
    from nic.models.mlp import init_mlp

    for size in (512, 2048):
        base = size // 4
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        fp, _ = create_pyramid(k1, base, 12, 8, ndim=2, no_mip=True)
        m2l = pyramid_mip_levels(size, base, no_mip=True)
        mlp = init_mlp(k2, 73, 64, 3)
        for dtype, tag in ((None, "fp32"), (jnp.bfloat16, "bf16")):
            fpc = tuple(g.astype(dtype) for g in fp) if dtype else fp
            mlpc = jax.tree.map(lambda p: p.astype(dtype), mlp) if dtype else mlp
            fn = jax.jit(lambda a, b: fast_decode(
                a, b, 0, image_size=size, mip_to_level=m2l, pe_channels=6,
                use_tri_pe=True, ndim=2))
            jax.block_until_ready(fn(fpc, mlpc))
            times = []
            for _ in range(20):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(fpc, mlpc))
                times.append(time.perf_counter() - t0)
            gpix = size * size / np.median(times) / 1e9
            print(f"fast decode {size}² {tag}: {gpix:.2f} GPix/s", flush=True)


if __name__ == "__main__":
    for arg in sys.argv[1:] or ["train", "decode"]:
        {"train": probe_train, "decode": probe_decode}[arg]()

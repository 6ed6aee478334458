"""Chip A/B: gather fwd+bwd slope with lattice sampling ON vs OFF.

Queue4's stage-2 profile showed gather_fwd_bwd at 10.55 ms where queue3
(pre-lattice) measured 2.81 ms; trainer rate fell 131.8 -> 58 steps/s.
This isolates whether corner_features_lattice (commit bf143eb) is the
regression, holding everything else fixed.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nic.config import CompressionConfig
from nic.cli.image_compression import load_asset
from nic.grids.sample import decoder_input
from nic.train.ntc import NTCTrainer
from scripts.profile_train_step import slope_time


def main():
    cfg = CompressionConfig(mlp_num_dtype=16, tf_write_psnr=False)
    tr = NTCTrainer(cfg, load_asset(cfg))
    fl, n, step = tr._geometry(0)
    ndim, num_crops = tr.ndim, cfg.num_crops
    fp = tr.state.fp
    dataset = tr.images[0]
    data_size = dataset.shape[1]
    key0 = jax.random.PRNGKey(0)
    origins0 = jax.random.randint(key0, (num_crops, ndim), 0,
                                  data_size - n + 1)
    nfeat = cfg.decoder_input_channels
    npix = num_crops * n**ndim

    def make_features(lattice):
        def features(fp, origins):
            def one(origin):
                return decoder_input(
                    fp, fl, origin, step, n, pe_channels=cfg.pe_channels,
                    mip_level=0, ndim=ndim, use_tri_pe=cfg.tf_use_tri_pe,
                    dtype=jnp.float32, g1_quirk=cfg.tf_g1_quirk,
                    lattice=lattice)
            return jax.vmap(one)(origins).reshape(npix, nfeat)
        return features

    def chain(body):
        def make(k):
            @jax.jit
            def run():
                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
            return run
        return make

    out = {}
    for lattice in (True, False):
        features = make_features(lattice)
        gather_grad = jax.grad(lambda f: jnp.mean(features(f, origins0) ** 2))

        def bwd_body(i, s):
            gf = gather_grad((fp[0] + s * 1e-30,) + tuple(fp[1:]))
            return s + jnp.sum(gf[fl * 2]) * 1e-9

        def fwd_body(i, s):
            return s + jnp.sum(features(
                (fp[0] + s * 1e-30,) + tuple(fp[1:]), origins0)) * 1e-9

        t_fwd = slope_time(chain(fwd_body), kbig=12, ksmall=2, reps=3)
        t = slope_time(chain(bwd_body), kbig=12, ksmall=2, reps=3)
        out[f"lattice={lattice}"] = (t_fwd, t)
        print(f"lattice={lattice}: fwd {t_fwd*1e3:.3f} ms, "
              f"fwd+bwd {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()

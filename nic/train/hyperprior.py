"""Rate–distortion trainer for the scale-hyperprior codec + image-set eval
harness (Kodak-style: PSNR/bpp over a directory of images).

North-star extension — no reference counterpart (SURVEY.md §0): the
reference's conv-AE rate is fixed num_bits; this trains R + λD end to end
and evaluates estimated bpp (code lengths under the learned priors).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nic.models.hyperprior import HyperpriorModel, rd_loss

__all__ = ["HyperpriorTrainer", "eval_image_set"]


class HyperpriorTrainer:
    def __init__(
        self,
        *,
        n: int = 96,
        m: int = 128,
        lam: float = 0.01,
        lr: float = 1e-4,
        patch: int = 256,
        batch: int = 8,
        seed: int = 0,
    ):
        self.model = HyperpriorModel(n, m)
        self.lam = lam
        self.patch = patch
        self.batch = batch
        k_init, self._key = jax.random.split(jax.random.PRNGKey(seed))
        dummy = jnp.zeros((1, patch, patch, 3), jnp.float32)
        self.params = self.model.init({"params": k_init}, dummy, None)
        self._tx = optax.adam(lr)
        self.opt_state = self._tx.init(self.params)
        self.step = 0
        self._jit_step = self._build_step()
        self._jit_eval = jax.jit(
            lambda p, x: self.model.apply(p, x, None)
        )

    def _build_step(self):
        model, lam, tx = self.model, self.lam, self._tx

        def loss_fn(params, batch, key):
            x_hat, y_bits, z_bits = model.apply(params, batch, key)
            loss, bpp, mse = rd_loss(x_hat, batch, y_bits, z_bits, lam)
            return loss, (bpp, mse)

        def step(params, opt_state, batch, key):
            (loss, (bpp, mse)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, bpp, mse

        return jax.jit(step, donate_argnums=(0, 1))

    def sample_patches(self, images: list[np.ndarray], rng: np.random.Generator):
        """Random [batch, patch, patch, 3] crops from a list of HWC images."""
        out = np.empty((self.batch, self.patch, self.patch, 3), np.float32)
        for i in range(self.batch):
            img = images[rng.integers(len(images))]
            h, w = img.shape[:2]
            r = rng.integers(0, max(1, h - self.patch + 1))
            c = rng.integers(0, max(1, w - self.patch + 1))
            out[i] = img[r : r + self.patch, c : c + self.patch]
        return out

    def train_step(self, batch: np.ndarray):
        self._key, sub = jax.random.split(self._key)
        self.params, self.opt_state, loss, bpp, mse = self._jit_step(
            self.params, self.opt_state, jnp.asarray(batch), sub
        )
        self.step += 1
        return loss, bpp, mse

    def evaluate(self, image: np.ndarray):
        """Hard-quantized PSNR/bpp on one HWC image in [0,1] (padded to a
        multiple of 64 as strided transforms require)."""
        h, w = image.shape[:2]
        ph = (-h) % 64
        pw = (-w) % 64
        x = np.pad(image, ((0, ph), (0, pw), (0, 0)), mode="edge")[None]
        x_hat, y_bits, z_bits = self._jit_eval(self.params, jnp.asarray(x))
        x_hat = np.clip(np.asarray(x_hat)[0, :h, :w], 0, 1)
        mse = float(np.mean((x_hat - image) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        bpp = float(y_bits[0] + z_bits[0]) / (h * w)
        return psnr, bpp, x_hat


def eval_image_set(trainer: HyperpriorTrainer, paths: list[str]):
    """Kodak-style harness: mean PSNR (255-domain equivalent) and bpp over
    a directory/list of images."""
    from PIL import Image

    rows = []
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        psnr, bpp, _ = trainer.evaluate(img)
        rows.append({"image": os.path.basename(p), "psnr": psnr, "bpp": bpp})
    mean_psnr = float(np.mean([r["psnr"] for r in rows]))
    mean_bpp = float(np.mean([r["bpp"] for r in rows]))
    return {"images": rows, "mean_psnr": mean_psnr, "mean_bpp": mean_bpp}

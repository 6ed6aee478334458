"""Round-5 directive #8: speed up the hyperprior decode's dominant stage.

The co-located decode splits as rANS 0.34 ms + hyper-synthesis+bins
0.02 ms + SYNTHESIS 0.75 ms + glue 0.02 ms (results/
r5_hyperprior_decode.json) — the synthesis transform is ~66% of the
budget and is pure matmul-conv. The bitstream-neutral lever (streams are
byte-identical, reconstruction-only): feed its MXU dots bf16 inputs with
fp32 accumulation (``HyperpriorCodec(synthesis_mxu_dtype=bf16)``).

Measures, on the trained λ=0.018 checkpoint:
  - stage split + colocated MPix/s for fp32 vs bf16-dot synthesis
  - reconstruction quality of both (PSNR vs original; max u8 LSB of
    bf16 vs fp32 reconstruction)

Writes results/r5_hp_bf16_synth.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax.numpy as jnp
    from PIL import Image

    from nic.core.metrics import psnr
    from nic.io.artifacts import CheckpointManager
    from nic.train.hyperprior import (HyperpriorCodec, HyperpriorTrainer,
                                      bench_decode_stages)

    ck = "runs/ckpt/hyperprior_lam0.018_n96_m128"
    newest = CheckpointManager(ck).paths_newest_first()
    if not newest:
        raise FileNotFoundError(f"no checkpoints under {ck}")
    tr = HyperpriorTrainer(n=96, m=128, lam=0.018, patch=64, batch=1, seed=0)
    tr.load_checkpoint(newest[0])

    img = np.asarray(
        Image.open("data/sancho_512.png").convert("RGB"), np.float32) / 255.0
    px = img.shape[0] * img.shape[1]

    out = {"ckpt": newest[0], "pixels": px}
    recs = {}
    for name, md in (("fp32", None), ("bf16", jnp.bfloat16)):
        codec = HyperpriorCodec(tr, synthesis_mxu_dtype=md)
        blob = codec.compress(img)
        rec = codec.decompress(blob)
        recs[name] = rec
        out[f"psnr_{name}"] = round(
            float(psnr(rec * 255.0, img * 255.0, max_value=255.0)), 4)
        out[f"bpp_{name}"] = round(codec.num_bits(blob) / px, 4)
        st = bench_decode_stages(codec, blob, px, iters=20)
        out[f"stages_{name}"] = st
    u8 = lambda a: np.clip(a * 255 + 0.5, 0, 255).astype(np.int32)
    out["bf16_vs_fp32_u8_lsb"] = int(
        np.abs(u8(recs["bf16"]) - u8(recs["fp32"])).max())
    out["psnr_delta_db"] = round(out["psnr_bf16"] - out["psnr_fp32"], 4)

    os.makedirs("results", exist_ok=True)
    with open("results/r5_hp_bf16_synth.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

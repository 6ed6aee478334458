"""Round-5 rect chip smoke: Kodak-geometry (512×768) on the real TPU.

[1] mip-mode training smoke (the reference's flagship LOD schedule,
    image_compression.py:221-245, on rect geometry — round-5 directive
    #4): a few hundred steps, loss must fall, fused-kernel gate modes
    recorded per LOD.
[2] u8 decode parity: the fused Pallas rect decode (bf16 pipeline, each
    GELU mode) vs the fp32 folded-XLA decode on the SAME trained state —
    the rect analogue of the round-4 19-cell sweep's per-cell check.
    Pass = each mode's max u8 LSB deviation ≤ its square-sweep envelope
    (exact/erfpoly ≤ 3, tanherf ≤ 4, tanh ≤ 7).

Writes results/r5_rect_chip_smoke.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax.numpy as jnp

    from nic.cli.image_compression import load_asset
    from nic.config import CompressionConfig
    from nic.core.metrics import psnr
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_v2 import decode_image_fused_v2
    from nic.train.ntc import NTCTrainer

    out: dict = {}
    lines: list = []

    # ---- [1] rect mip-mode training smoke ----
    cfg = CompressionConfig(
        image_size=512, image_size_w=768, crop_mip_level=8,
        num_epochs=2000, max_mip_level=4, tf_no_mip=False,
    )
    imgs = load_asset(cfg)
    tr = NTCTrainer(cfg, imgs, log=lines.append)
    t0 = time.perf_counter()
    losses, _psnrs = tr.train_many(200, chunk=100)
    t_train = time.perf_counter() - t0
    # compile-inclusive wall (per-LOD kernel compiles dominate this
    # smoke; steady-state rect rates are a bench concern, not a smoke's)
    out["train_200_wall_s_incl_compiles"] = round(t_train, 1)
    losses = np.asarray(losses)
    out["loss_first"] = float(np.mean(losses[:20]))
    out["loss_last"] = float(np.mean(losses[-20:]))
    out["forward_mode_last"] = tr._forward_mode
    rec0 = np.asarray(tr.decode(0))
    out["decode0_shape"] = list(rec0.shape)
    tgt = np.moveaxis(np.asarray(imgs[0]), 0, -1)
    # [0,1] floats → max_value=1.0 (the default 2^8 convention is for
    # 0..255 codes and inflates [0,1] inputs by ~48 dB)
    out["psnr_mip0_200steps"] = round(
        float(psnr(rec0, tgt, max_value=1.0)), 2)
    for m in (1, 2):
        out[f"decode{m}_shape"] = list(np.asarray(tr.decode(m)).shape)
    out["gate_lines"] = [str(x) for x in lines]

    # ---- [2] u8 parity: fused rect decode vs fp32 folded ----
    fp, mlp = tr.state.fp, tr.state.mlp
    hw = cfg.image_hw
    m2l = tr.mip_to_level
    ref = np.asarray(fast_decode(
        fp, mlp, 0, image_size=hw[0], mip_to_level=m2l,
        pe_channels=cfg.pe_channels, use_tri_pe=True, ndim=2, n=hw))
    ref_u8 = np.clip(ref * 255 + 0.5, 0, 255).astype(np.int32)
    envel = {"exact": 3, "erfpoly": 3, "tanherf": 4, "tanh": 7}
    ok = True
    for gelu, cap in envel.items():
        got = np.asarray(decode_image_fused_v2(
            fp, mlp, 0, image_size=hw, mip_to_level=m2l,
            pe_channels=cfg.pe_channels, use_tri_pe=True,
            dtype=jnp.bfloat16, gelu=gelu))
        got_u8 = np.clip(got * 255 + 0.5, 0, 255).astype(np.int32)
        lsb = int(np.abs(got_u8 - ref_u8).max())
        out[f"rect_u8_lsb_{gelu}"] = lsb
        ok = ok and lsb <= cap
    out["parity_within_square_envelope"] = bool(ok)

    os.makedirs("results", exist_ok=True)
    with open("results/r5_rect_chip_smoke.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

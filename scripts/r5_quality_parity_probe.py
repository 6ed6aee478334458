"""Quality cost of the shipped exact-class decode mode (r5 session 4).

Trains the flagship protocol to 100k epochs (flag-free defaults), then
decodes the SAME frozen/quantized grids through the fp32 folded-XLA
reference path and the shipped pallas modes (i16·tanherf =
`value_exact`, bf16·tanh = headline fast), reporting PSNR per mode and
the u8 LSB envelope vs fp32 — the user-facing statement of what the
fast modes cost at convergence (expected: ~0.00 dB).

Usage (TPU): python scripts/r5_quality_parity_probe.py
Writes results/r5_quality_parity.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from nic.cli.image_compression import load_asset
    from nic.config import CompressionConfig
    from nic.core.quant import quantize_to_bit
    from nic.grids import pyramid as fp_lib
    from nic.grids.fastdecode import fast_decode
    from nic.kernels.decode_fused_v2 import decode_image_fused_v2
    from nic.obs.integrity import verified_result
    from nic.train.ntc import NTCTrainer

    epochs = int(os.environ.get("PROBE_EPOCHS", "100000"))
    cfg = CompressionConfig(num_epochs=epochs, interval_print=10**9,
                            tf_write_psnr=False)
    asset = load_asset(cfg)
    tr = NTCTrainer(cfg, asset)
    tr.train_many(epochs)
    tr.freeze_and_quantize()

    fp = fp_lib.pyramid_quantize_all(tr.state.fp, cfg.fp_bits)
    mlp = tr.state.mlp
    m2l = tr.mip_to_level
    tri = tr._use_tri_pe()
    ref = np.asarray(asset[0]).transpose(1, 2, 0)  # [H, W, 3] in [0,1]
    out: dict = {"epochs": epochs}

    def u8(fn):
        rec = verified_result(lambda: np.asarray(jax.jit(fn)(fp, mlp)))
        return np.asarray(quantize_to_bit(rec, 8)).astype(np.int32)

    def psnr_db(img_u8):
        mse = np.mean((img_u8.astype(np.float32) / 255.0 - ref) ** 2)
        return float(10 * np.log10(1.0 / max(mse, 1e-12)))

    modes = {
        "fast_fp32": lambda f, m: fast_decode(
            f, m, 0, image_size=cfg.image_size, mip_to_level=m2l,
            pe_channels=cfg.pe_channels, use_tri_pe=tri, ndim=2,
            g1_quirk=cfg.tf_g1_quirk),
        "pallas_i16_tanherf": lambda f, m: decode_image_fused_v2(
            f, m, 0, image_size=cfg.image_size, mip_to_level=m2l,
            pe_channels=cfg.pe_channels, use_tri_pe=tri,
            g1_quirk=cfg.tf_g1_quirk, dtype="i16", gelu="tanherf"),
        "pallas_bf16_tanh": lambda f, m: decode_image_fused_v2(
            f, m, 0, image_size=cfg.image_size, mip_to_level=m2l,
            pe_channels=cfg.pe_channels, use_tri_pe=tri,
            g1_quirk=cfg.tf_g1_quirk, dtype=jnp.bfloat16, gelu="tanh"),
    }
    base = None
    for name, fn in modes.items():
        img = u8(fn)
        rec = {"psnr_db": round(psnr_db(img), 4)}
        if base is None:
            base = img
        else:
            rec["u8_lsb_vs_fp32"] = int(np.abs(img - base).max())
            rec["psnr_delta_db_vs_fp32"] = round(
                rec["psnr_db"] - out["fast_fp32"]["psnr_db"], 4)
        out[name] = rec
        print(name, rec, flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/r5_quality_parity.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/r5_quality_parity.json", flush=True)


if __name__ == "__main__":
    main()

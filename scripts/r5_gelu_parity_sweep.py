"""Round-5 decode-mode u8-parity sweep (supersedes r4_gelu_parity).

Round-5 finding: the r4 sweep decoded its 2D/3D cells with
``dtype=None`` (fp32 planes + fp32 MXU dots) while bench.py's reported
modes run ``dtype=bf16`` — the envelope labels were not measuring the
shipped modes. This sweep measures EXACTLY the mode set bench reports:

  - fp32 folded XLA        (the reference-semantics baseline)
  - pallas bf16 · {exact-erf, poly, tanh, tanherf}   (bench's ladder;
    since round 5 the column stage computes fp32 and rounds ONCE)
  - pallas surgical · {exact, tanherf, tanh}          (fp32 planes,
    bf16 MXU dots — 2D only)
  - pallas fp32 · exact    (continuity with the r4 table's rows)

over FP_BITS {8,4,2} × methods {1,3,4} at mip 0, a mip ladder on the
mip-trained method-1 FP8 artifact, and (new) a rectangular 512×768
cell. Max u8 LSB vs the fp32 baseline per mode, SDC-guarded decodes,
plus the analytic Lipschitz budgets. Writes
results/r5_gelu_parity.json (incremental flush; SWEEP_CELLS=prefix,...
re-runs matching cells and merges).

bench.py's value_exact gating reads this file (falling back to the r4
table when absent).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("SWEEP_OUT", "results/r5_gelu_parity.json")


def lsb_budget(mlp, eps: float) -> float:
    w2 = np.abs(np.asarray(mlp["w2"])).sum(0).max()
    w3 = np.abs(np.asarray(mlp["w3"])).sum(0).max()
    return float(0.25 * w3 * (1.13 * w2 + 1.0) * eps * 255.0)


def decode_modes(trainer, mip: int):
    """u8 decodes of every shipped backend/GELU/dtype mode (guarded)."""
    import jax
    import jax.numpy as jnp

    from nic.core.quant import quantize_to_bit
    from nic.grids import pyramid as fp_lib
    from nic.kernels.decode_fused_3d import decode_volume_fused
    from nic.kernels.decode_fused_v2 import decode_image_fused_v2
    from nic.obs.integrity import verified_result

    cfg = trainer.cfg
    fp = fp_lib.pyramid_quantize_all(trainer.state.fp, cfg.fp_bits)
    mlp = trainer.state.mlp
    m2l = trainer.mip_to_level
    ndim = trainer.ndim
    sparse = trainer._sparse_g0()
    tri = trainer._use_tri_pe()
    hw = cfg.image_hw if ndim == 2 else None
    rect = ndim == 2 and len(set(hw)) > 1
    isz = hw if rect else cfg.image_size

    def u8(fn):
        rec = verified_result(lambda: np.asarray(jax.jit(fn)(fp, mlp)))
        return np.asarray(quantize_to_bit(rec, 8)).astype(np.int32)

    out = {}
    from nic.grids.fastdecode import fast_decode

    out["fast_fp32"] = u8(lambda f, m: fast_decode(
        f, m, mip, image_size=cfg.image_size, mip_to_level=m2l,
        pe_channels=cfg.pe_channels, use_tri_pe=tri, ndim=ndim,
        sparse_g0=sparse, g1_quirk=cfg.tf_g1_quirk,
        n=(tuple(s // (2**mip) for s in hw) if rect else None)))

    def fused2d(dtype, gelu):
        return lambda f, m: decode_image_fused_v2(
            f, m, mip, image_size=isz, mip_to_level=m2l,
            pe_channels=cfg.pe_channels, use_tri_pe=tri,
            g1_quirk=cfg.tf_g1_quirk, dtype=dtype, gelu=gelu)

    def fused3d(dtype, gelu):
        return lambda f, m: decode_volume_fused(
            f, m, mip, image_size=cfg.image_size, mip_to_level=m2l,
            pe_channels=cfg.pe_channels, use_tri_pe=tri, sparse_g0=sparse,
            g1_quirk=cfg.tf_g1_quirk, dtype=dtype, gelu=gelu)

    fused = fused2d if ndim == 2 else fused3d
    import jax.numpy as jnp  # noqa: F811

    for gelu in ("exact", "poly", "tanh", "tanherf"):
        out[f"pallas_{gelu}"] = u8(fused(jnp.bfloat16, gelu))
    if ndim == 2:
        for gelu in ("exact", "tanherf", "tanh"):
            out[f"pallas_surgical_{gelu}"] = u8(fused("surgical", gelu))
    # i16: int16 fixed-point plane storage + bf16 MXU dots (2-byte
    # DMA like bf16, absolute-step quantization — the
    # surgical-class-at-bf16-speed candidate; fp16 is rejected by
    # Mosaic, measured r5 negative). 2D AND 3D. Guarded per mode:
    # i16 support is being established by this very sweep.
    for gelu in ("exact", "tanh", "tanherf"):
        try:
            out[f"pallas_i16_{gelu}"] = u8(fused("i16", gelu))
        except Exception as e:  # pragma: no cover
            print(f"i16/{gelu} failed: {type(e).__name__}: "
                  f"{e}"[:200], flush=True)
    out["pallas_fp32_exact"] = u8(fused(None, "exact"))
    return out


def main() -> None:
    from nic.cli.image_compression import load_asset
    from nic.config import CompressionConfig
    from nic.train.ntc import NTCTrainer

    epochs = int(os.environ.get("SWEEP_EPOCHS", "20000"))
    only = [p for p in os.environ.get("SWEEP_CELLS", "").split(",") if p]
    rows = []
    if only and os.path.exists(OUT):
        with open(OUT) as f:
            rows = [r for r in json.load(f)["rows"]
                    if not any(r["cell"].startswith(p) for p in only)]

    def run_cell(tag, mips, **kw):
        cfg = CompressionConfig(num_epochs=epochs, qat_noise_where="node",
                                interval_print=10**9, tf_write_psnr=False,
                                **kw)
        tr = NTCTrainer(cfg, load_asset(cfg))
        tr.train_many(epochs)
        tr.freeze_and_quantize()
        for mip in mips:
            recs = decode_modes(tr, mip)
            base = recs.pop("fast_fp32")
            row = {"cell": tag, "mip": mip,
                   "budget_poly_lsb": lsb_budget(tr.state.mlp, 3.6e-4),
                   "budget_tanh_lsb": lsb_budget(tr.state.mlp, 4.7e-4),
                   "budget_tanherf_lsb": lsb_budget(tr.state.mlp, 1.5e-6)}
            for k, v in recs.items():
                row[f"{k}_max_lsb"] = int(np.abs(v - base).max())
            rows.append(row)
            print(row, flush=True)

    def flush():
        os.makedirs("results", exist_ok=True)
        with open(OUT, "w") as f:
            json.dump({"epochs": epochs, "rows": rows}, f, indent=1)

    def safe_cell(tag, mips, **kw):
        if only and not any(tag.startswith(p) for p in only):
            return
        try:
            run_cell(tag, mips, **kw)
        except Exception as e:  # pragma: no cover
            rows.append({"cell": tag, "error": f"{type(e).__name__}: "
                                               f"{e}"[:300]})
            print(rows[-1], flush=True)
        flush()

    for bits in (8, 4, 2):
        safe_cell(f"m1_fp{bits}", [0], fp_bits=bits)
    # rectangular Kodak-geometry cell (round-5: rect rides the kernel)
    safe_cell("m1_rect_fp8", [0], fp_bits=8, image_size=512,
              image_size_w=768, crop_mip_level=8)
    for method in (3, 4):
        for bits in (8, 4, 2):
            safe_cell(
                f"m{method}_fp{bits}", [0], fp_bits=bits,
                compression_method=method, image_dimension=3,
                image_path="data/misty_64_64.avi", image_size=64,
                max_mip_level=6, crop_mip_level=5)
    safe_cell("m1_fp8_mip", list(range(10)), fp_bits=8, tf_no_mip=False)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()

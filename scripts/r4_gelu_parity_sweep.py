"""Exact-class GELU parity sweep (VERDICT r4 directive #3).

Round 3 labeled the 8-FMA polynomial GELU decode "exact-class" on the
strength of one artifact's ≤2-LSB check. This script makes it a measured
TABLE: for FP_BITS ∈ {2,4,8} × compression methods {1, 3, 4} (+ a mip
ladder on a mip-trained method-1 artifact), train a short artifact, then
decode it through

  - fp32 folded XLA (the reference-semantics baseline),
  - pallas exact-erf  (|Δerf| ≤ 1.5e-7),
  - pallas poly       (8-FMA even polynomial, |Δgelu| ≤ 3.6e-4),
  - pallas tanh       (|Δgelu| ≤ 4.7e-4),

and record the max u8 LSB difference of each mode vs the fp32 baseline
(every decode SDC-guarded). Also computes the ANALYTIC per-artifact
error budget: with |Δgelu| ≤ ε pointwise and gelu 1.13-Lipschitz,

  |Δout| ≤ 0.25 · ||W3||₁→₁ · (1.13 · ||W2||₁→₁ + 1) · ε

(sigmoid is 1/4-Lipschitz; norms are max column absolute sums of the
TRAINED weights), reported in u8 LSB (×255). Writes one JSON to
results/r4_gelu_parity.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def lsb_budget(mlp, eps: float) -> float:
    w2 = np.abs(np.asarray(mlp["w2"])).sum(0).max()
    w3 = np.abs(np.asarray(mlp["w3"])).sum(0).max()
    return float(0.25 * w3 * (1.13 * w2 + 1.0) * eps * 255.0)


def decode_modes(trainer, mip: int):
    """u8 decodes of every backend/GELU mode (guarded)."""
    import jax

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

    def u8(fn):
        rec = verified_result(lambda: np.asarray(jax.jit(fn)(fp, mlp)))
        return np.asarray(quantize_to_bit(rec, 8)).astype(np.int32)

    out = {}
    # fp32 folded XLA baseline (exact reference semantics)
    from nic.grids.fastdecode import fast_decode

    out["fast_fp32"] = u8(lambda f, m: fast_decode(
        f, m, mip, image_size=cfg.image_size, mip_to_level=m2l,
        pe_channels=cfg.pe_channels, use_tri_pe=tri, ndim=ndim,
        sparse_g0=sparse, g1_quirk=cfg.tf_g1_quirk))
    for gelu in ("exact", "poly", "tanh", "tanherf"):
        if ndim == 2:
            fn = lambda f, m, g=gelu: decode_image_fused_v2(
                f, m, mip, image_size=cfg.image_size, mip_to_level=m2l,
                pe_channels=cfg.pe_channels, use_tri_pe=tri,
                g1_quirk=cfg.tf_g1_quirk, dtype=None, gelu=g)
        else:
            fn = lambda f, m, g=gelu: decode_volume_fused(
                f, m, mip, image_size=cfg.image_size, mip_to_level=m2l,
                pe_channels=cfg.pe_channels, use_tri_pe=tri,
                sparse_g0=sparse, g1_quirk=cfg.tf_g1_quirk, gelu=g)
        out[f"pallas_{gelu}"] = u8(fn)
    return out


def main() -> None:
    from nic.cli.image_compression import load_asset
    from nic.config import CompressionConfig
    from nic.train.ntc import NTCTrainer

    epochs = int(os.environ.get("SWEEP_EPOCHS", "20000"))
    # SWEEP_CELLS=m3,m4 re-runs only cells whose tag starts with one of
    # the prefixes, MERGING into the existing JSON (other rows kept) —
    # for re-running cells that died to transient compile-server errors.
    only = [p for p in os.environ.get("SWEEP_CELLS", "").split(",") if p]
    rows = []
    if only and os.path.exists("results/r4_gelu_parity.json"):
        with open("results/r4_gelu_parity.json") as f:
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
        with open("results/r4_gelu_parity.json", "w") as f:
            json.dump({"epochs": epochs, "rows": rows}, f, indent=1)

    def safe_cell(tag, mips, **kw):
        # one bad cell (e.g. a kernel compile regression) must not kill
        # the sweep — record the error and keep going; rows flush
        # incrementally so a crash still leaves the partial table
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
    for method in (3, 4):
        for bits in (8, 4, 2):
            safe_cell(
                f"m{method}_fp{bits}", [0], fp_bits=bits,
                compression_method=method, image_dimension=3,
                image_path="data/misty_64_64.avi", image_size=64,
                max_mip_level=6, crop_mip_level=5)
    # mip ladder (method 1, FP8, mip-trained)
    cfg_mips = list(range(10))
    safe_cell("m1_fp8_mip", cfg_mips, fp_bits=8, tf_no_mip=False)
    print("wrote results/r4_gelu_parity.json", flush=True)


if __name__ == "__main__":
    main()

#!/bin/sh
# Round-3 chip queue #15: lane-packed 3D ng kernel validation + rates.
# [1] 3D trainer ladder on misty 64^3: (m3, m4) x (erf, poly) x
#     (packed default, NIC_NG_NO_PACK=1) — the packed kernel landed with
#     interpret parity only (commit 2f7c57f); this is its chip A/B.
# [2] 3D 5k-epoch m3 quality check with the packed+poly default.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue15.log
echo "=== r3 queue15 start $(date) ===" >> "$LOG"

echo "--- [1/2] 3D packed-vs-unpacked ladder (misty 64^3) ---" >> "$LOG"
timeout 3600 python -u - <<'PYEOF' >> "$LOG" 2>&1
import os, time
from nic.config import CompressionConfig
from nic.cli.image_compression import load_asset
from nic.train.ntc import NTCTrainer
for pack in (True, False):
    os.environ.pop("NIC_NG_NO_PACK", None)
    if not pack:
        os.environ["NIC_NG_NO_PACK"] = "1"
    for method in (3, 4):
        for gelu in ("poly", "erf"):
            cfg = CompressionConfig(
                image_path="data/misty_64_64.avi", image_dimension=3,
                compression_method=method, image_3d_size=64, image_size=64,
                crop_mip_level=5, max_mip_level=6, num_epochs=10**6,
                mlp_num_dtype=16, train_forward="kernel2",
                qat_noise_where="node", rng_impl="rbg",
                tf_write_psnr=False, train_gelu=gelu)
            tr = NTCTrainer(cfg, load_asset(cfg))
            tr.train_many(600, chunk=600)
            t0 = time.perf_counter()
            tr.train_many(600, chunk=600)
            dt = time.perf_counter() - t0
            tag = f"{'packed' if pack else 'unpacked'}/m{method}/{gelu}"
            print(f"{tag}: {600/dt:.2f} steps/s", flush=True)
PYEOF

echo "--- [2/2] 3D 5k quality m3 packed+poly (guarded decode) ---" >> "$LOG"
timeout 2400 python -m nic.cli.image_compression \
    IMAGE_PATH=data/misty_64_64.avi IMAGE_DIMENSION=3 COMPRESSION_METHOD=3 \
    IMAGE_SIZE=64 CROP_MIP_LEVEL=5 MAX_MIP_LEVEL=6 NUM_EPOCHS=5000 \
    MLP_NUM_DTYPE=16 TRAIN_FORWARD=kernel2 QAT_NOISE_WHERE=node \
    RNG_IMPL=rbg TRAIN_GELU=poly INTERVAL_PRINT=2500 >> "$LOG" 2>&1

echo "=== r3 queue15 done $(date) ===" >> "$LOG"

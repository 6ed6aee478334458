#!/bin/sh
# Round-3 chip queue #3: (a) bisect the end-of-run decode PSNR anomaly
# (chip CLI tail reports ~1.1 dB low at FP8 vs artifact/CPU/interval
# decodes of the SAME state — every artifact re-audits HIGHER on CPU),
# (b) poly-GELU u8-parity on the real artifact (backs bench.py's
# exact-class label), (c) stage-2 train profile (bwd-side components +
# gather_node variant stack), (d) the misty-3D real-artifact regression
# that queue2 [5] fumbled (missing IMAGE_DIMENSION=3).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue3.log
echo "=== r3 queue3 start $(date) ===" >> "$LOG"

echo "--- [1/5] end-decode anomaly: fresh-process chip repro ---" >> "$LOG"
timeout 1200 python -u - <<'PYEOF' >> "$LOG" 2>&1
import numpy as np
from nic.config import CompressionConfig
from nic.cli.image_compression import load_asset
from nic.train.ntc import NTCTrainer
from nic.core.metrics import psnr
from nic.core.quant import quantize_to_bit

CKPT = "runs/ckpt/image_compression_sancho_512.png_1_8_16/ckpt_000000320000.npz"
ART = "runs/artifacts/image_compression_tpu_sancho_512.png_16_True_True_1_320000_8.npz"

for backend in ("auto", "fast"):
    cfg = CompressionConfig(num_epochs=320000, mlp_num_dtype=16,
                            decode_backend=backend)
    images = load_asset(cfg)
    tr = NTCTrainer(cfg, images)
    tr.load_checkpoint(CKPT)
    orig = np.moveaxis(np.asarray(images[0]), 0, -1).astype(np.float32) * 255.0
    for stage in ("as-loaded", "post-freeze"):
        rec = np.asarray(tr.decode(0))
        rc = np.asarray(quantize_to_bit(rec, 8)).astype(np.float32)
        print(f"backend={backend} {stage}: {float(psnr(orig, rc)):.4f} (256-max)")
        if stage == "as-loaded":
            tr.freeze_and_quantize()
# is the device-resident target image intact after all this?
from nic.data.assets import load_image_mips
host = load_image_mips("data/sancho_512.png", 512, 0)[0]
dev = np.asarray(images[0])
print("device-vs-host image max|diff|:", float(np.abs(host - dev).max()))
# reference point: artifact decode in this same process
from nic.cli import decode as dec
rec = np.asarray(dec.run([ART, "--backend", "auto"]))
u8 = (np.clip(rec, 0, 1) * 255 + 0.5).astype(np.float32)
o255 = np.moveaxis(host, 0, -1).astype(np.float32) * 255.0
print("artifact auto decode:", float(psnr(o255, u8)), "(256-max)")
PYEOF

echo "--- [2/5] poly u8-parity on the flagship artifact ---" >> "$LOG"
timeout 900 python -u - <<'PYEOF' >> "$LOG" 2>&1
import numpy as np
from nic.cli import decode as dec
from nic.core.metrics import psnr
from nic.data.assets import load_image_mips
ART = "runs/artifacts/image_compression_tpu_sancho_512.png_16_True_True_1_320000_8.npz"
img = load_image_mips("data/sancho_512.png", 512, 0)[0].transpose(1, 2, 0)
o255 = (img * 255.0).astype(np.float32)
outs = {}
for be, gl in (("fast", "exact"), ("auto", "poly"), ("auto", "tanh")):
    rec = np.asarray(dec.run([ART, "--backend", be, "--gelu", gl]))
    u8 = (np.clip(rec, 0, 1) * 255 + 0.5).astype(np.uint8)
    outs[(be, gl)] = u8
    print(f"backend={be} gelu={gl}: psnr {float(psnr(o255, u8.astype(np.float32), max_value=255.0)):.4f} dB (255-max)")
for k in (("auto", "poly"), ("auto", "tanh")):
    d = np.abs(outs[k].astype(int) - outs[("fast", "exact")].astype(int)).max()
    print(f"max u8 |{k} - fast_exact| = {int(d)}")
PYEOF

echo "--- [3/5] stage-2 train profile ---" >> "$LOG"
timeout 3600 python scripts/profile_train_step.py --stage2 >> "$LOG" 2>&1

echo "--- [4/5] misty m3 3D real-artifact train + fused-decode regression ---" >> "$LOG"
timeout 1800 python -m nic.cli.image_compression \
    IMAGE_PATH=data/misty_64_64.avi IMAGE_DIMENSION=3 COMPRESSION_METHOD=3 \
    IMAGE_SIZE=64 MAX_MIP_LEVEL=6 CROP_MIP_LEVEL=5 \
    NUM_EPOCHS=5000 INTERVAL_PRINT=1000 >> "$LOG" 2>&1
timeout 900 python -u - <<'PYEOF' >> "$LOG" 2>&1
import glob, os
import numpy as np
arts = sorted(glob.glob("runs/artifacts/image_compression_*misty*_5000_*.npz"),
              key=os.path.getmtime)
art = arts[-1]
print("artifact:", art)
from nic.cli import decode as dec
recs = {}
for be in ("fast", "auto"):
    recs[be] = np.asarray(dec.run([art, "--backend", be]))
d = np.abs(recs["auto"].astype(np.float64) - recs["fast"].astype(np.float64)).max()
u8 = np.abs((np.clip(recs["auto"],0,1)*255+0.5).astype(int)
            - (np.clip(recs["fast"],0,1)*255+0.5).astype(int)).max()
print(f"3D auto-vs-fast: max|diff| = {d:.3e}, max u8 diff = {int(u8)}")
PYEOF

echo "--- [5/5] 20k quality+rate A/B: gather+node at 16 crops ---" >> "$LOG"
timeout 1800 python -m nic.cli.image_compression NUM_EPOCHS=20000 \
    MLP_NUM_DTYPE=16 QAT_NOISE_WHERE=node NUM_CROPS=16 \
    INTERVAL_PRINT=5000 >> "$LOG" 2>&1

echo "=== r3 queue3 done $(date) ===" >> "$LOG"

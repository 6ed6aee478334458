#!/bin/sh
# Round-3 chip queue #2: measurements (VERDICT directives 1-4 + 6).
# Sequential on the single tunneled chip, run AFTER r3_tpu_queue1b.sh.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue2.log
echo "=== r3 queue2 start $(date) ===" >> "$LOG"

echo "--- [1/6] bench.py (3D fused + erfpoly + dual headline) ---" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1

echo "--- [2/6] train-step profile + variant rates ---" >> "$LOG"
timeout 3600 python scripts/profile_train_step.py >> "$LOG" 2>&1

echo "--- [3/6] hyperprior codec decode throughput ---" >> "$LOG"
timeout 1200 python scripts/bench_hyperprior_decode.py \
    --ckpt runs/ckpt/hyperprior_lam0.018_n96_m128 --lam 0.018 >> "$LOG" 2>&1

echo "--- [4/6] default(auto)-backend real-artifact decode regression ---" >> "$LOG"
timeout 900 python -u - <<'PYEOF' >> "$LOG" 2>&1
import glob, os
import numpy as np
arts = sorted(glob.glob("runs/artifacts/image_compression_*20000*.npz"),
              key=os.path.getmtime)
art = arts[-1]
print("artifact:", art)
from nic.cli import decode as dec
from nic.core.metrics import psnr
from nic.data.assets import load_image_mips
img = load_image_mips("data/sancho_512.png", 512, 0)[0].transpose(1, 2, 0)
img_u8 = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
outs = {}
for be, gl in (("fast", "exact"), ("auto", "exact"), ("auto", "erfpoly")):
    rec = np.asarray(dec.run([art, "--backend", be, "--gelu", gl]))
    u8 = (np.clip(rec, 0, 1) * 255 + 0.5).astype(np.uint8)
    outs[(be, gl)] = u8
    p = float(psnr(u8.astype(np.float32), img_u8.astype(np.float32),
                   max_value=255.0))
    print(f"backend={be} gelu={gl}: psnr {p:.4f} dB")
for k in (("auto", "exact"), ("auto", "erfpoly")):
    d = np.abs(outs[k].astype(int) - outs[("fast", "exact")].astype(int)).max()
    print(f"max u8 |{k} - fast_exact| = {int(d)}")
PYEOF

echo "--- [5/6] 3D real-artifact fused-decode regression (misty m3) ---" >> "$LOG"
timeout 1800 python -m nic.cli.image_compression \
    IMAGE_PATH=data/misty_64_64.avi COMPRESSION_METHOD=3 CROP_MIP_LEVEL=5 \
    NUM_EPOCHS=5000 INTERVAL_PRINT=1000 >> "$LOG" 2>&1
timeout 900 python -u - <<'PYEOF' >> "$LOG" 2>&1
import glob, os
import numpy as np
arts = sorted(glob.glob("runs/artifacts/image_compression_*misty*5000*.npz"),
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

echo "--- [6/6] 20k quality A/B: node noise + folded forward ---" >> "$LOG"
for VAR in "QAT_NOISE_WHERE=node" "TRAIN_FORWARD=folded QAT_NOISE_WHERE=node"; do
  echo "--- A/B: MLP_NUM_DTYPE=16 $VAR ---" >> "$LOG"
  timeout 1200 python -m nic.cli.image_compression NUM_EPOCHS=20000 \
      MLP_NUM_DTYPE=16 INTERVAL_PRINT=5000 $VAR >> "$LOG" 2>&1
done

echo "=== r3 queue2 done $(date) ===" >> "$LOG"

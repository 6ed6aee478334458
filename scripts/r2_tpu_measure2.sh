#!/bin/sh
# Round-2 TPU batch #2: movie-family baseline rows + real-artifact
# pallas-decode PSNR check.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r2_measure2.log
echo "=== batch2 start $(date) ===" >> "$LOG"

echo "--- [1/3] movie_3d baseline (misty 64^3, 20k ep) ---" >> "$LOG"
timeout 3000 python -m nic.cli.movie_3d_comp --image_path data/misty_64_64.avi \
    --num_epochs 20000 >> "$LOG" 2>&1

echo "--- [2/3] movie_frame baseline (misty sheet, 20k ep) ---" >> "$LOG"
timeout 3000 python -m nic.cli.movie_frame_comp --image_path data/misty_64_64.avi \
    --num_epochs 20000 >> "$LOG" 2>&1

echo "--- [3/3] sancho 20k artifact + pallas-vs-fast decode PSNR ---" >> "$LOG"
timeout 1800 python -m nic.cli.image_compression NUM_EPOCHS=20000 >> "$LOG" 2>&1
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
for be, gl in (("fast", "exact"), ("pallas", "tanh"), ("pallas", "exact")):
    rec = np.asarray(dec.run([art, "--backend", be, "--gelu", gl]))
    u8 = (np.clip(rec, 0, 1) * 255 + 0.5).astype(np.uint8)
    outs[(be, gl)] = u8
    p = float(psnr(u8.astype(np.float32), img_u8.astype(np.float32),
                   max_value=255.0))
    print(f"backend={be} gelu={gl}: psnr {p:.4f} dB")
d = np.abs(outs[("pallas", "tanh")].astype(int)
           - outs[("fast", "exact")].astype(int)).max()
print("max u8 |pallas_tanh - fast| =", int(d))
PYEOF
echo "=== batch2 done $(date) ===" >> "$LOG"

#!/bin/sh
# Round-4 queue #11: chip validation of the NEW 3D train path.
# [1] 3D stage-3 attribution (kernel2 components, m3) — where the 34
#     ns/px goes; quick m4 pass too;
# [2] 3D rate ladder: m3/m4 × gather/kernel2/kernel3 × node noise, plus
#     kernel3 + in-kernel feature noise (the flag-free default path);
# [3] unfold-vectorization A/B: kernel2 m3 rate with the old serialized
#     loop (NIC_UNFOLD3D_LOOP=1) vs the one-hot contractions;
# [4] quality: 5k m3 kernel3 train + guarded decode (r3 reference:
#     kernel2 31.87 dB @ 3.60 bpp).
# Runs after queue10 (pid in /tmp/r4_queue10.pid).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue11.log
PREV=$(cat /tmp/r4_queue10.pid 2>/dev/null)
if [ -n "$PREV" ]; then
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
echo "=== r4 queue11 start $(date) ===" >> "$LOG"

echo "--- [1] 3D stage-3 attribution (m3 full, m4 quick) ---" >> "$LOG"
timeout 3000 python -u scripts/r4_stage3_3d.py --method 3 >> "$LOG" 2>&1
timeout 2000 python -u scripts/r4_stage3_3d.py --method 4 --quick >> "$LOG" 2>&1

echo "--- [2] 3D rate ladder ---" >> "$LOG"
timeout 6000 python -u - <<'PYEOF' >> "$LOG" 2>&1
from bench import bench_train_steps
kw3d = dict(compression_method=3, image_dimension=3,
            image_path="data/misty_64_64.avi", image_size=64,
            max_mip_level=6, crop_mip_level=5, tf_write_psnr=False,
            mlp_num_dtype=None)
for m in (3, 4):
    for label, extra in (
        ("gather/node", dict(train_forward="gather",
                             qat_noise_where="node")),
        ("kernel2/node", dict(train_forward="kernel2",
                              qat_noise_where="node")),
        ("kernel3/node", dict(train_forward="kernel3",
                              qat_noise_where="node")),
        ("kernel3/feature-inkernel (flag-free)", dict()),
    ):
        kw = {**kw3d, **extra, "compression_method": m}
        try:
            r = bench_train_steps(num_steps=1000, **kw)
            print(f"m{m} {label}: {r:.1f} steps/s", flush=True)
        except Exception as e:
            print(f"m{m} {label}: FAILED {type(e).__name__}: {e}",
                  flush=True)
PYEOF

echo "--- [3] unfold-vectorization A/B (kernel2 m3) ---" >> "$LOG"
timeout 2500 python -u - <<'PYEOF' >> "$LOG" 2>&1
from bench import bench_train_steps
kw = dict(compression_method=3, image_dimension=3,
          image_path="data/misty_64_64.avi", image_size=64,
          max_mip_level=6, crop_mip_level=5, tf_write_psnr=False,
          mlp_num_dtype=None, train_forward="kernel2",
          qat_noise_where="node")
r = bench_train_steps(num_steps=1000, **kw)
print(f"kernel2 m3, vectorized unfold: {r:.1f} steps/s", flush=True)
PYEOF
NIC_UNFOLD3D_LOOP=1 timeout 2500 python -u - <<'PYEOF' >> "$LOG" 2>&1
from bench import bench_train_steps
kw = dict(compression_method=3, image_dimension=3,
          image_path="data/misty_64_64.avi", image_size=64,
          max_mip_level=6, crop_mip_level=5, tf_write_psnr=False,
          mlp_num_dtype=None, train_forward="kernel2",
          qat_noise_where="node")
r = bench_train_steps(num_steps=1000, **kw)
print(f"kernel2 m3, LOOP unfold (old): {r:.1f} steps/s", flush=True)
PYEOF

echo "--- [4] 5k m3 kernel3 quality ---" >> "$LOG"
timeout 2500 python -m nic.cli.image_compression NUM_EPOCHS=5000 \
    COMPRESSION_METHOD=3 IMAGE_DIMENSION=3 IMAGE_PATH=data/misty_64_64.avi \
    IMAGE_SIZE=64 MAX_MIP_LEVEL=6 CROP_MIP_LEVEL=5 \
    INTERVAL_PRINT=2500 >> "$LOG" 2>&1
echo "=== r4 queue11 done $(date) ===" >> "$LOG"

#!/bin/sh
# Round-3 session-3 chip queue:
# [1] mip-mode (TF_NO_MIP=0) 20k quality A/B: gather vs kernel2 — backs the
#     195.4 steps/s fastest-mode claim with a decoded-PSNR comparison;
# [2] hyperprior codec COMPRESS clock (analysis + tables + format-2 rANS);
# [3] conv-AE (image_comp tier) decode throughput — device-only slope +
#     wall, the one family without a decode number in BASELINE.md;
# [4] bench.py refresh on the current tree.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_queue10.log
echo "=== r3 queue10 start $(date) ===" >> "$LOG"

echo "--- [1a] mip 20k gather ---" >> "$LOG"
timeout 1800 python -m nic.cli.image_compression NUM_EPOCHS=20000 \
    MLP_NUM_DTYPE=16 TRAIN_FORWARD=gather QAT_NOISE_WHERE=node RNG_IMPL=rbg \
    TF_NO_MIP=0 INTERVAL_PRINT=10000 >> "$LOG" 2>&1

echo "--- [1b] mip 20k kernel2 ---" >> "$LOG"
timeout 1800 python -m nic.cli.image_compression NUM_EPOCHS=20000 \
    MLP_NUM_DTYPE=16 TRAIN_FORWARD=kernel2 QAT_NOISE_WHERE=node RNG_IMPL=rbg \
    TF_NO_MIP=0 INTERVAL_PRINT=10000 >> "$LOG" 2>&1

echo "--- [2] hyperprior compress clock ---" >> "$LOG"
timeout 1200 python -u - <<'PYEOF' >> "$LOG" 2>&1
import json, os, time
import numpy as np
from PIL import Image
from nic.io.artifacts import CheckpointManager
from nic.train.hyperprior import HyperpriorCodec, HyperpriorTrainer

tr = HyperpriorTrainer(n=96, m=128, lam=0.018, patch=64, batch=1, seed=0)
ckpt = CheckpointManager("runs/ckpt/hyperprior_lam0.018_n96_m128").paths_newest_first()[0]
tr.load_checkpoint(ckpt)
codec = HyperpriorCodec(tr)
img = np.asarray(Image.open("data/sancho_512.png").convert("RGB"), np.float32) / 255.0
px = img.shape[0] * img.shape[1]
blob = codec.compress(img)  # warm: jit compiles + tables cache
ts = []
for _ in range(20):
    t0 = time.perf_counter(); codec.compress(img); ts.append(time.perf_counter() - t0)
t_e2e = float(np.median(ts))
# host-coder share: tables + bins + the two format-2 rANS encodes on the
# exact latents/sigma the codec produced (same code path as compress)
import jax.numpy as jnp
from nic.io import entropy as ec
from nic.native import rans_encode
from nic.train.hyperprior import _pad64
x, _ = _pad64(img)
y = np.asarray(codec._g_a(jnp.asarray(x)))
z = np.asarray(codec._h_a(jnp.asarray(y)))
z_hat = np.round(z).astype(np.int32)
y_hat = np.round(y).astype(np.int32)
sigma = np.asarray(codec._h_s(jnp.asarray(z_hat, np.float32)))
a_y = max(1, int(np.abs(y_hat).max())); a_z = max(1, int(np.abs(z_hat).max()))
n_ch = z_hat.shape[-1]
bins_z = np.tile(np.arange(n_ch, dtype=np.int32), z_hat.size // n_ch)
def host_side():
    cdf_y = ec.gaussian_cdf_table(a_y)
    bins_y = ec.scale_bin_indices(sigma).reshape(-1)
    rans_encode(y_hat.reshape(-1) + a_y, bins_y, cdf_y)
    rans_encode(z_hat.reshape(-1) + a_z, bins_z, codec._cdf_z(a_z))
host_side(); hs = []
for _ in range(20):
    t0 = time.perf_counter(); host_side(); hs.append(time.perf_counter() - t0)
print(json.dumps({
    "compress_wall_ms_median": round(t_e2e * 1e3, 2),
    "compress_mpix_s_wall": round(px / t_e2e / 1e6, 3),
    "host_tables_bins_rans_ms": round(float(np.median(hs)) * 1e3, 3),
    "bpp_bitstream": round(codec.num_bits(blob) / px, 4),
}))
PYEOF

echo "--- [3] conv-AE decode throughput ---" >> "$LOG"
timeout 1200 python -u - <<'PYEOF' >> "$LOG" 2>&1
import json, time
import numpy as np
import jax, jax.numpy as jnp
from PIL import Image
from nic.train.conv_ae import ConvAETrainer
from scripts.honest_bench import honest_decode_time

img = np.asarray(Image.open("data/sancho_512.png").convert("RGB"), np.float32) / 255.0
tr = ConvAETrainer(img, num_bits=4, latent_channels=8, hidden_channels=16)
codes = tr.encode()  # uint8 latent codes (trainer.decode's own input)
zf = jnp.asarray(codes, jnp.float32) / (2.0**tr.num_bits - 1.0)
dec_fn = lambda fp, p: tr.model.decoder.apply(p["dec"], fp[0])
t_dev = honest_decode_time(dec_fn, (zf,), tr.params, kbig=48, ksmall=2)
px = img.shape[0] * img.shape[1]
# wall (includes tunnel staging)
tr.decode(codes); ts = []
for _ in range(10):
    t0 = time.perf_counter(); tr.decode(codes); ts.append(time.perf_counter() - t0)
print(json.dumps({
    "family": "image_comp conv-AE (matmul convs, 4-bit latent, 512^2)",
    "decode_device_ms": round(t_dev * 1e3, 3),
    "decode_device_mpix_s": round(px / t_dev / 1e6, 2),
    "decode_wall_ms_median": round(float(np.median(ts)) * 1e3, 2),
}))
PYEOF

echo "--- [4] bench.py refresh ---" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1

echo "=== r3 queue10 done $(date) ===" >> "$LOG"

"""Entropy-coding layer: quantized CDF tables + rANS bitstreams.

Turns the hyperprior's learned priors (nic.models.hyperprior) into actual
host-side bitstreams — functionality the reference lacks entirely (its
rate is fixed-length num_bits quantization, SURVEY.md §0). The coder is
the C++ rANS in nic/native/rans.cpp (pure-python fallback here, bit-exact
with the native one: same state machine).

Pipeline (scale-hyperprior):
  ŷ symbols → Gaussian CDFs from a log-spaced σ bin table (CompressAI-style
  scale table); ẑ symbols → per-channel logistic CDFs. Alphabets are sized
  from the observed symbol range and stored in the header, so coding is
  lossless w.r.t. the quantized latents.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "quantize_pmf",
    "gaussian_cdf_table",
    "logistic_cdf_table",
    "scale_bin_indices",
    "rans_encode_py",
    "rans_decode_py",
    "SCALE_MIN",
    "SCALE_MAX",
    "NUM_SCALE_BINS",
]

PROB_BITS = 16
PROB_SCALE = 1 << PROB_BITS
RANS_L = 1 << 23

SCALE_MIN = 0.11
SCALE_MAX = 64.0
NUM_SCALE_BINS = 64


def scale_table() -> np.ndarray:
    """Log-spaced σ bins (the standard scale-hyperprior table)."""
    return np.exp(
        np.linspace(math.log(SCALE_MIN), math.log(SCALE_MAX), NUM_SCALE_BINS)
    )


def scale_bin_indices(scales: np.ndarray) -> np.ndarray:
    """Each σ → index of the smallest table entry ≥ σ (conservative bin)."""
    table = scale_table()
    return np.searchsorted(table, np.asarray(scales), side="left").clip(
        0, NUM_SCALE_BINS - 1
    ).astype(np.int32)


def quantize_pmf(pmf: np.ndarray) -> np.ndarray:
    """float pmf row → int32 CDF row summing to exactly 2^16, every symbol
    frequency ≥ 1 (so any symbol stays decodable)."""
    pmf = np.maximum(np.asarray(pmf, np.float64), 1e-12)
    pmf = pmf / pmf.sum()
    freqs = np.maximum(np.round(pmf * PROB_SCALE).astype(np.int64), 1)
    # fix the rounding drift on the most probable symbol
    drift = PROB_SCALE - freqs.sum()
    order = np.argsort(-freqs)
    i = 0
    while drift != 0:
        j = order[i % len(freqs)]
        step = 1 if drift > 0 else -1
        if freqs[j] + step >= 1:
            freqs[j] += step
            drift -= step
        i += 1
    cdf = np.zeros(len(freqs) + 1, np.int32)
    cdf[1:] = np.cumsum(freqs)
    return cdf


def _std_normal_cdf(x):
    from math import erf, sqrt

    v = np.asarray(x, np.float64)
    return 0.5 * (1.0 + np.vectorize(lambda t: erf(t / sqrt(2.0)))(v))


def gaussian_cdf_table(max_abs: int) -> np.ndarray:
    """int32 [NUM_SCALE_BINS, 2*max_abs+2] CDF table for symbols
    v ∈ [-max_abs, max_abs] under N(0, σ_bin²); edge symbols absorb tails."""
    vs = np.arange(-max_abs, max_abs + 1, dtype=np.float64)
    rows = []
    for sigma in scale_table():
        upper = _std_normal_cdf((vs + 0.5) / sigma)
        lower = _std_normal_cdf((vs - 0.5) / sigma)
        pmf = upper - lower
        pmf[0] += lower[0]
        pmf[-1] += 1.0 - upper[-1]
        rows.append(quantize_pmf(pmf))
    return np.stack(rows)


def logistic_cdf_table(mu: np.ndarray, log_s: np.ndarray, max_abs: int) -> np.ndarray:
    """int32 [channels, 2*max_abs+2] CDF table for the factorized z prior
    (per-channel logistic(μ_c, s_c), matching nic.models.hyperprior)."""
    vs = np.arange(-max_abs, max_abs + 1, dtype=np.float64)
    s = np.exp(np.asarray(log_s, np.float64))
    mu = np.asarray(mu, np.float64)
    rows = []
    for c in range(len(mu)):
        upper = 1.0 / (1.0 + np.exp(-((vs + 0.5 - mu[c]) / s[c])))
        lower = 1.0 / (1.0 + np.exp(-((vs - 0.5 - mu[c]) / s[c])))
        pmf = upper - lower
        pmf[0] += lower[0]
        pmf[-1] += 1.0 - upper[-1]
        rows.append(quantize_pmf(pmf))
    return np.stack(rows)


# ---------------------------------------------------------------------------
# pure-python rANS (fallback + oracle for the C++ coder; same state machine)
# ---------------------------------------------------------------------------


def rans_encode_py(symbols: np.ndarray, bins: np.ndarray, cdf: np.ndarray) -> bytes:
    out = bytearray()
    x = RANS_L
    for i in range(len(symbols) - 1, -1, -1):
        row = cdf[bins[i]]
        s = int(symbols[i])
        start = int(row[s])
        freq = int(row[s + 1]) - start
        x_max = ((RANS_L >> PROB_BITS) << 8) * freq
        while x >= x_max:
            out.append(x & 0xFF)
            x >>= 8
        x = ((x // freq) << PROB_BITS) + (x % freq) + start
    for _ in range(4):
        out.append(x & 0xFF)
        x >>= 8
    out.reverse()
    return bytes(out)


def rans_decode_py(data: bytes, bins: np.ndarray, cdf: np.ndarray) -> np.ndarray:
    pos = 0

    def rd():
        nonlocal pos
        b = data[pos] if pos < len(data) else 0
        pos += 1
        return b

    x = 0
    for _ in range(4):
        x = (x << 8) | rd()
    mask = PROB_SCALE - 1
    out = np.empty(len(bins), np.int32)
    for i in range(len(bins)):
        row = cdf[bins[i]]
        cum = x & mask
        s = int(np.searchsorted(row, cum, side="right")) - 1
        start = int(row[s])
        freq = int(row[s + 1]) - start
        out[i] = s
        x = freq * (x >> PROB_BITS) + cum - start
        while x < RANS_L:
            x = (x << 8) | rd()
    return out

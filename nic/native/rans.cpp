// rANS entropy coder (host-side bitstream I/O for the hyperprior codec).
//
// The reference repo has no entropy coding at all (fixed-length num_bits
// quantization only — SURVEY.md §0); the north star calls for
// "hyperprior entropy-model likelihood/rate-loss ... with bitstream I/O
// kept host-side". This is that bitstream layer: a 32-bit rANS coder with
// 16-bit quantized CDFs (scale_bits = 16), byte-wise renormalization
// (state lower bound 1<<23), encoding in reverse symbol order so decode
// streams forward. Symbols are indices into per-element CDF rows selected
// by a bin index (scale bins for y under N(0,σ); one bin per channel for
// the factorized z prior).
//
// API (extern "C", ctypes-bound):
//   nic_rans_encode(symbols, bins, n, cdf, cdf_len, max_sym, out, out_cap)
//     → bytes written (or -1 if out_cap too small / symbol out of range)
//   nic_rans_decode(bytes, n_bytes, bins, n, cdf, cdf_len, max_sym, out)
//     → 0 on success
//
// cdf layout: int32 [n_bins, max_sym + 1], row b monotonically increasing
// from 0 to 1<<16; symbol s of bin b spans [cdf[b][s], cdf[b][s+1]).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr uint32_t kProbBits = 16;
constexpr uint32_t kProbScale = 1u << kProbBits;
constexpr uint32_t kRansL = 1u << 23;  // renorm lower bound
}  // namespace

extern "C" {

int64_t nic_rans_encode(const int32_t* symbols, const int32_t* bins,
                        int64_t n, const int32_t* cdf, int64_t cdf_cols,
                        uint8_t* out, int64_t out_cap) {
    std::vector<uint8_t> buf;
    buf.reserve(static_cast<size_t>(n) * 2 + 16);
    uint32_t x = kRansL;
    // encode in reverse so the decoder reads symbols forward
    for (int64_t i = n - 1; i >= 0; --i) {
        const int32_t* row = cdf + static_cast<int64_t>(bins[i]) * cdf_cols;
        const int32_t s = symbols[i];
        if (s < 0 || s + 1 >= cdf_cols) return -1;
        const uint32_t start = static_cast<uint32_t>(row[s]);
        const uint32_t freq = static_cast<uint32_t>(row[s + 1]) - start;
        if (freq == 0) return -1;
        // renorm: keep x < ((L >> prob_bits) << 8) * freq
        const uint32_t x_max = ((kRansL >> kProbBits) << 8) * freq;
        while (x >= x_max) {
            buf.push_back(static_cast<uint8_t>(x & 0xff));
            x >>= 8;
        }
        x = ((x / freq) << kProbBits) + (x % freq) + start;
    }
    // flush state (little-endian, 4 bytes)
    for (int k = 0; k < 4; ++k) {
        buf.push_back(static_cast<uint8_t>(x & 0xff));
        x >>= 8;
    }
    const int64_t total = static_cast<int64_t>(buf.size());
    if (total > out_cap) return -1;
    // bytes were produced backwards; reverse into out
    for (int64_t i = 0; i < total; ++i) out[i] = buf[total - 1 - i];
    return total;
}

int nic_rans_decode(const uint8_t* bytes, int64_t n_bytes,
                    const int32_t* bins, int64_t n, const int32_t* cdf,
                    int64_t cdf_cols, int32_t* out) {
    int64_t pos = 0;
    auto rd = [&]() -> uint32_t {
        return pos < n_bytes ? bytes[pos++] : 0u;
    };
    // state was flushed little-endian then the whole buffer reversed, so
    // the stream starts with the state bytes most-significant first
    uint32_t x = 0;
    for (int k = 0; k < 4; ++k) x = (x << 8) | rd();
    const uint32_t mask = kProbScale - 1;
    for (int64_t i = 0; i < n; ++i) {
        const int32_t* row = cdf + static_cast<int64_t>(bins[i]) * cdf_cols;
        const uint32_t cum = x & mask;
        // binary search: largest s with row[s] <= cum
        int32_t lo = 0, hi = static_cast<int32_t>(cdf_cols) - 1;
        while (hi - lo > 1) {
            const int32_t mid = (lo + hi) / 2;
            if (static_cast<uint32_t>(row[mid]) <= cum) lo = mid;
            else hi = mid;
        }
        const int32_t s = lo;
        const uint32_t start = static_cast<uint32_t>(row[s]);
        const uint32_t freq = static_cast<uint32_t>(row[s + 1]) - start;
        out[i] = s;
        x = freq * (x >> kProbBits) + cum - start;
        while (x < kRansL) x = (x << 8) | rd();
    }
    return 0;
}

}  // extern "C"

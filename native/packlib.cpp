// packlib — native host-side bit-packing for gptq_tpu.
//
// TPU-native counterpart of the reference's host packing responsibilities
// (reference: quant.py:152-187 numpy packing loop; lut_gemm/lutgemm_cuda.cpp
// `parsing` host repack, :110-159). Checkpoint conversion of multi-billion-
// parameter models packs tens of GB of codes; the numpy path allocates
// several intermediates per tensor, this one streams with OpenMP.
//
// Exposed C ABI (ctypes):
//   pack_field    — byteplane bit-field pack: within each subblock of SB
//                   rows (SB = subblock(K, groupsize), passed in), row
//                   SB*s + e*4*Wsb + 4*j + b (Wsb = SB*fb/32 words, e <
//                   8/fb sub-byte shifts, b < 4 bytes) lands in word
//                   s*Wsb + j at bit 8*b + fb*e; the 8-bit field stores
//                   code XOR 0x80. Matches ops/pack.py pack_codes; this is
//                   the order the TPU kernel's `shift & mask -> int8
//                   bitcast -> concat` unpack reads for free.
//   unpack_field  — inverse
//   quantize_pack — fused round((W^T/scale)+zero)->clip->pack for one field
//   pack_signs    — BCQ {-1,+1} -> 1-bit blocked bitplanes
//
// Build: cc -O3 -fopenmp -shared -fPIC packlib.cpp -o libpacklib.so

#include <cstdint>
#include <cmath>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// row index within a subblock for word j, byte b, sub-byte shift e
static inline int64_t bp_row(int64_t Wsb, int e, int64_t j, int b) {
  return (int64_t)e * 4 * Wsb + 4 * j + b;
}

// codes: (K, N) int32 values in [0, 2^fb); out: (K/P, N) uint32
// sb: subblock length (ops/pack.py subblock(K, groupsize))
void pack_field(const int32_t* codes, uint32_t* out,
                int64_t K, int64_t N, int fb, int shift, int64_t sb) {
  const int P = 32 / fb;
  const int E = 8 / fb;
  const int64_t Kw = K / P;
  const int64_t Wsb = sb / P;
  const uint32_t mask = (1u << fb) - 1u;
  const uint32_t flip = (fb == 8) ? 0x80u : 0u;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < Kw; ++i) {
    const int64_t s = i / Wsb, j = i % Wsb;
    uint32_t* dst = out + i * N;
    std::memset(dst, 0, sizeof(uint32_t) * N);
    for (int e = 0; e < E; ++e) {
      for (int b = 0; b < 4; ++b) {
        const int32_t* src = codes + (s * sb + bp_row(Wsb, e, j, b)) * N;
        const int sh = 8 * b + fb * e;
        for (int64_t n = 0; n < N; ++n) {
          dst[n] |= (((((uint32_t)(src[n] >> shift)) & mask) ^ flip)) << sh;
        }
      }
    }
  }
}

// words: (K/P, N) uint32 -> codes (K, N) int32 (shifted back up by `shift`)
void unpack_field(const uint32_t* words, int32_t* codes,
                  int64_t K, int64_t N, int fb, int shift, int64_t sb) {
  const int P = 32 / fb;
  const int E = 8 / fb;
  const int64_t Kw = K / P;
  const int64_t Wsb = sb / P;
  const uint32_t mask = (1u << fb) - 1u;
  const uint32_t flip = (fb == 8) ? 0x80u : 0u;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < Kw; ++i) {
    const int64_t s = i / Wsb, j = i % Wsb;
    const uint32_t* src = words + i * N;
    for (int e = 0; e < E; ++e) {
      for (int b = 0; b < 4; ++b) {
        int32_t* dst = codes + (s * sb + bp_row(Wsb, e, j, b)) * N;
        const int sh = 8 * b + fb * e;
        for (int64_t n = 0; n < N; ++n) {
          dst[n] = (int32_t)((((src[n] >> sh) & mask) ^ flip) << shift);
        }
      }
    }
  }
}

// W: (N, K) f32 dequantized weight (row-major, out-features first)
// scale/zero: (num_groups, N) f32 ; codes out: (K, N) int32
// codes[k, n] = clip(round(W[n, k]/scale[g(k), n] + zero[g(k), n]), 0, maxq)
void quantize_codes(const float* W, const float* scale, const float* zero,
                    int32_t* codes, int64_t N, int64_t K,
                    int64_t num_groups, int32_t maxq) {
  const int64_t g = K / num_groups;
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < K; ++k) {
    const int64_t gi = k / g;
    const float* srow = scale + gi * N;
    const float* zrow = zero + gi * N;
    int32_t* dst = codes + k * N;
    for (int64_t n = 0; n < N; ++n) {
      float q = std::nearbyint(W[n * K + k] / srow[n] + zrow[n]);
      if (q < 0.f) q = 0.f;
      if (q > (float)maxq) q = (float)maxq;
      dst[n] = (int32_t)q;
    }
  }
}

// B: (N, K, bits) f32 signs in {-1, +1} -> planes (bits, K/32, N) uint32,
// bit set <=> +1, byteplane row order (matches ops/pack.py pack_bcq)
void pack_signs(const float* B, uint32_t* planes,
                int64_t N, int64_t K, int bits, int64_t sb) {
  const int64_t Kw = K / 32;
  const int64_t Wsb = sb / 32;
#pragma omp parallel for collapse(2) schedule(static)
  for (int b = 0; b < bits; ++b) {
    for (int64_t i = 0; i < Kw; ++i) {
      const int64_t s = i / Wsb, j = i % Wsb;
      uint32_t* dst = planes + (b * Kw + i) * N;
      std::memset(dst, 0, sizeof(uint32_t) * N);
      for (int e = 0; e < 8; ++e) {
        for (int byte = 0; byte < 4; ++byte) {
          const int64_t k = s * sb + bp_row(Wsb, e, j, byte);
          const int sh = 8 * byte + e;
          for (int64_t n = 0; n < N; ++n) {
            if (B[(n * K + k) * bits + b] > 0.f) dst[n] |= (1u << sh);
          }
        }
      }
    }
  }
}

int packlib_version() { return 2; }

}  // extern "C"

// packlib — native host-side bit-packing for gptq_tpu.
//
// TPU-native counterpart of the reference's host packing responsibilities
// (reference: quant.py:152-187 numpy packing loop; lut_gemm/lutgemm_cuda.cpp
// `parsing` host repack, :110-159). Checkpoint conversion of multi-billion-
// parameter models packs tens of GB of codes; the numpy path allocates
// several intermediates per tensor, this one streams with OpenMP.
//
// Exposed C ABI (ctypes):
//   pack_field    — blocked bit-field pack: word i holds positions
//                   [i*P,(i+1)*P), position p at bit fb*p (P = 32/fb)
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

// codes: (K, N) int32 values in [0, 2^fb); out: (K/P, N) uint32
void pack_field(const int32_t* codes, uint32_t* out,
                int64_t K, int64_t N, int fb, int shift) {
  const int P = 32 / fb;
  const int64_t Kw = K / P;
  const uint32_t mask = (1u << fb) - 1u;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < Kw; ++i) {
    uint32_t* dst = out + i * N;
    std::memset(dst, 0, sizeof(uint32_t) * N);
    for (int p = 0; p < P; ++p) {
      const int32_t* src = codes + (i * P + p) * N;
      const int sh = fb * p;
      for (int64_t n = 0; n < N; ++n) {
        dst[n] |= (((uint32_t)(src[n] >> shift)) & mask) << sh;
      }
    }
  }
}

// words: (K/P, N) uint32 -> codes (K, N) int32 (shifted back up by `shift`)
void unpack_field(const uint32_t* words, int32_t* codes,
                  int64_t K, int64_t N, int fb, int shift) {
  const int P = 32 / fb;
  const int64_t Kw = K / P;
  const uint32_t mask = (1u << fb) - 1u;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < Kw; ++i) {
    const uint32_t* src = words + i * N;
    for (int p = 0; p < P; ++p) {
      int32_t* dst = codes + (i * P + p) * N;
      const int sh = fb * p;
      for (int64_t n = 0; n < N; ++n) {
        dst[n] = (int32_t)(((src[n] >> sh) & mask) << shift);
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
// bit set <=> +1 (matches ops/pack.py pack_bcq layout)
void pack_signs(const float* B, uint32_t* planes,
                int64_t N, int64_t K, int bits) {
  const int64_t Kw = K / 32;
#pragma omp parallel for collapse(2) schedule(static)
  for (int b = 0; b < bits; ++b) {
    for (int64_t i = 0; i < Kw; ++i) {
      uint32_t* dst = planes + (b * Kw + i) * N;
      std::memset(dst, 0, sizeof(uint32_t) * N);
      for (int p = 0; p < 32; ++p) {
        const int64_t k = i * 32 + p;
        for (int64_t n = 0; n < N; ++n) {
          if (B[(n * K + k) * bits + b] > 0.f) dst[n] |= (1u << p);
        }
      }
    }
  }
}

int packlib_version() { return 1; }

}  // extern "C"

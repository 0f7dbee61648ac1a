// packlib: native bit-packing/unpacking for GPTQ checkpoint tensors.
//
// Role: the host-side heavy lifting at pack/load time — the counterpart of
// the reference's CPU packing loops (qlinear_cuda_old.py:110-200, run
// single-threaded under threadpoolctl in modeling/_utils.py:301-322) and of
// exllamav2's load-time weight shuffle (q_matrix.cu:19-42). Quantized models
// are repacked from the reference int32 layout into the TPU runtime layout
// once per load; for a 70B model that is ~35 GB of nibble shuffling, which
// this library does multithreaded in C++ instead of via NumPy temporaries.
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).
//
// Build: make -C csrc  (produces libpacklib.so)

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Pack 2/4/8-bit values (uint32 in [0, 2^bits)) along axis 0 into int32
// words, little-endian within the word (reference qweight layout).
// in:  values[K, N] uint32 (row-major), out: packed[K*bits/32, N] uint32.
void pack_rows_pow2(const uint32_t* values, uint32_t* out, int64_t k,
                    int64_t n, int bits) {
  const int per_word = 32 / bits;
  const int64_t rows_out = k / per_word;
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < rows_out; ++r) {
    const uint32_t* src = values + r * per_word * n;
    uint32_t* dst = out + r * n;
    for (int64_t j = 0; j < n; ++j) dst[j] = 0;
    for (int p = 0; p < per_word; ++p) {
      const uint32_t* row = src + p * n;
      const int shift = bits * p;
      for (int64_t j = 0; j < n; ++j) dst[j] |= row[j] << shift;
    }
  }
}

// Inverse of pack_rows_pow2. out: values[K, N] uint32.
void unpack_rows_pow2(const uint32_t* packed, uint32_t* out, int64_t rows_in,
                      int64_t n, int bits) {
  const int per_word = 32 / bits;
  const uint32_t mask = (bits == 32) ? 0xffffffffu : ((1u << bits) - 1u);
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < rows_in; ++r) {
    const uint32_t* src = packed + r * n;
    uint32_t* dst = out + r * per_word * n;
    for (int p = 0; p < per_word; ++p) {
      uint32_t* row = dst + p * n;
      const int shift = bits * p;
      for (int64_t j = 0; j < n; ++j) row[j] = (src[j] >> shift) & mask;
    }
  }
}

// 3-bit pack: 32 K-values -> 3 words, reference interleave
// (qlinear_cuda_old.py:141-159). in: values[K, N], out: packed[K*3/32, N].
void pack_rows_3bit(const uint32_t* values, uint32_t* out, int64_t k,
                    int64_t n) {
  const int64_t blocks = k / 32;
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < blocks; ++b) {
    const uint32_t* v = values + b * 32 * n;
    uint32_t* w0 = out + (b * 3 + 0) * n;
    uint32_t* w1 = out + (b * 3 + 1) * n;
    uint32_t* w2 = out + (b * 3 + 2) * n;
    for (int64_t j = 0; j < n; ++j) {
      uint32_t a = 0, c = 0, d = 0;
      for (int p = 0; p < 10; ++p) a |= (v[p * n + j] & 7u) << (3 * p);
      a |= (v[10 * n + j] & 7u) << 30;
      c |= (v[10 * n + j] & 7u) >> 2;
      for (int p = 0; p < 10; ++p) c |= (v[(11 + p) * n + j] & 7u) << (3 * p + 1);
      c |= (v[21 * n + j] & 7u) << 31;
      d |= ((v[21 * n + j] & 7u) >> 1) & 0x3u;
      for (int p = 0; p < 10; ++p) d |= (v[(22 + p) * n + j] & 7u) << (3 * p + 2);
      w0[j] = a;
      w1[j] = c;
      w2[j] = d;
    }
  }
}

// Inverse of pack_rows_3bit. out: values[K, N] with K = rows_in*32/3.
void unpack_rows_3bit(const uint32_t* packed, uint32_t* out, int64_t rows_in,
                      int64_t n) {
  const int64_t blocks = rows_in / 3;
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < blocks; ++b) {
    const uint32_t* w0 = packed + (b * 3 + 0) * n;
    const uint32_t* w1 = packed + (b * 3 + 1) * n;
    const uint32_t* w2 = packed + (b * 3 + 2) * n;
    uint32_t* v = out + b * 32 * n;
    for (int64_t j = 0; j < n; ++j) {
      for (int p = 0; p < 10; ++p) v[p * n + j] = (w0[j] >> (3 * p)) & 7u;
      v[10 * n + j] = ((w0[j] >> 30) | (w1[j] << 2)) & 7u;
      for (int p = 0; p < 10; ++p) v[(11 + p) * n + j] = (w1[j] >> (3 * p + 1)) & 7u;
      v[21 * n + j] = ((w1[j] >> 31) | (w2[j] << 1)) & 7u;
      for (int p = 0; p < 10; ++p) v[(22 + p) * n + j] = (w2[j] >> (3 * p + 2)) & 7u;
    }
  }
}

// TPU runtime repack: K-interleaved nibbles. byte[k, n] = v[2k, n] |
// v[2k+1, n] << 4, with optional row permutation applied first
// (perm == nullptr -> identity). values in [0, 16).
void repack_kint4(const uint32_t* values, const int32_t* perm, uint8_t* out,
                  int64_t k, int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < k / 2; ++r) {
    const int64_t r0 = perm ? perm[2 * r] : 2 * r;
    const int64_t r1 = perm ? perm[2 * r + 1] : 2 * r + 1;
    const uint32_t* lo = values + r0 * n;
    const uint32_t* hi = values + r1 * n;
    uint8_t* dst = out + r * n;
    for (int64_t j = 0; j < n; ++j)
      dst[j] = (uint8_t)((lo[j] & 0xFu) | ((hi[j] & 0xFu) << 4));
  }
}

// Planar sub-byte repack (2-bit path): out[k, j] |= v[k, j + p*C] << (sbits*p)
// for p in [0, planes), C = n / planes. Optional row perm as above.
void repack_planar(const uint32_t* values, const int32_t* perm, uint8_t* out,
                   int64_t k, int64_t n, int planes, int sbits) {
  const int64_t c = n / planes;
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < k; ++r) {
    const int64_t rs = perm ? perm[r] : r;
    const uint32_t* src = values + rs * n;
    uint8_t* dst = out + r * c;
    for (int64_t j = 0; j < c; ++j) {
      uint8_t acc = 0;
      for (int p = 0; p < planes; ++p)
        acc |= (uint8_t)((src[p * c + j] & ((1u << sbits) - 1u)) << (sbits * p));
      dst[j] = acc;
    }
  }
}

// Fused reference-qweight -> ki32 runtime repack (4-bit only).
//
// The load-time hot path for the DEFAULT runtime layout: reads nibbles
// straight out of the reference int32 pack (row k of column n lives at
// qw[k/8, n] >> 4*(k%8)) and emits the per-group quarter-split ki32 words
// (see ops/quantlinear._ki32_pack) in ONE pass — no [K, N] uint32
// intermediate (64 MB/layer for 7B shapes), no separate perm gather, no
// pad copies. Semantics match:
//     w_int = unpack_qweight(qw)[ :k_in][perm]; pad K to k_out with zeros;
//     pad N to n_out with zeros; _ki32_pack(w_int, gs)
// perm may be null (identity). perm[r] indexes logical rows < k_in; output
// rows whose post-perm index r >= k_in (K padding) decode to code 0.
// out must be [k_out/8, n_out] (columns >= n zeroed here).
void repack_ki32(const uint32_t* qw, const int32_t* perm, uint32_t* out,
                 int64_t k_in, int64_t k_out, int64_t n, int64_t n_out,
                 int64_t gs) {
  const int64_t groups = k_out / gs;
  const int64_t q = gs / 4;  // quarter rows per group
#pragma omp parallel for schedule(static)
  for (int64_t g = 0; g < groups; ++g) {
    for (int64_t j = 0; j < gs / 8; ++j) {
      uint32_t* dst = out + (g * (gs / 8) + j) * n_out;
      // the 8 logical (post-perm) rows feeding this word: quarter m,
      // entries 2j (low half-word) and 2j+1 (high half-word)
      const uint32_t* src[8];
      int shift_src[8];
      uint32_t nib_shift[8] = {0, 4, 8, 12, 16, 20, 24, 28};
      for (int e = 0; e < 2; ++e) {
        for (int m = 0; m < 4; ++m) {
          const int64_t r = g * gs + m * q + 2 * j + e;
          const int64_t rs = (r < k_in) ? (perm ? perm[r] : r) : -1;
          const int slot = e * 4 + m;  // word bit position 4*slot
          if (rs < 0) {
            src[slot] = nullptr;
            shift_src[slot] = 0;
          } else {
            src[slot] = qw + (rs / 8) * n;
            shift_src[slot] = 4 * (int)(rs % 8);
          }
        }
      }
      for (int64_t col = 0; col < n; ++col) {
        uint32_t w = 0;
        for (int s = 0; s < 8; ++s)
          if (src[s])
            w |= ((src[s][col] >> shift_src[s]) & 0xFu) << nib_shift[s];
        dst[col] = w;
      }
      for (int64_t col = n; col < n_out; ++col) dst[col] = 0;
    }
  }
}

// ki32 pack from already-unpacked values (3-bit path after the native
// 3-bit unpack, or any uint32 [K, N] code matrix). Same perm/pad semantics
// as repack_ki32; values rows are PRE-perm logical rows.
void pack_ki32_values(const uint32_t* values, const int32_t* perm,
                      uint32_t* out, int64_t k_in, int64_t k_out, int64_t n,
                      int64_t n_out, int64_t gs) {
  const int64_t groups = k_out / gs;
  const int64_t q = gs / 4;
#pragma omp parallel for schedule(static)
  for (int64_t g = 0; g < groups; ++g) {
    for (int64_t j = 0; j < gs / 8; ++j) {
      uint32_t* dst = out + (g * (gs / 8) + j) * n_out;
      const uint32_t* src[8];
      uint32_t nib_shift[8] = {0, 4, 8, 12, 16, 20, 24, 28};
      for (int e = 0; e < 2; ++e) {
        for (int m = 0; m < 4; ++m) {
          const int64_t r = g * gs + m * q + 2 * j + e;
          const int64_t rs = (r < k_in) ? (perm ? perm[r] : r) : -1;
          src[e * 4 + m] = (rs < 0) ? nullptr : values + rs * n;
        }
      }
      for (int64_t col = 0; col < n; ++col) {
        uint32_t w = 0;
        for (int s = 0; s < 8; ++s)
          if (src[s]) w |= (src[s][col] & 0xFu) << nib_shift[s];
        dst[col] = w;
      }
      for (int64_t col = n; col < n_out; ++col) dst[col] = 0;
    }
  }
}

// Fused reference-qweight -> k2i32 runtime repack (2-bit, 16 rows/word
// source, per-group EIGHTH-split destination — see _k2i32_pack).
void repack_k2i32(const uint32_t* qw, const int32_t* perm, uint32_t* out,
                  int64_t k_in, int64_t k_out, int64_t n, int64_t n_out,
                  int64_t gs) {
  const int64_t groups = k_out / gs;
  const int64_t e8 = gs / 8;  // eighth rows per group
#pragma omp parallel for schedule(static)
  for (int64_t g = 0; g < groups; ++g) {
    for (int64_t j = 0; j < gs / 16; ++j) {
      uint32_t* dst = out + (g * (gs / 16) + j) * n_out;
      const uint32_t* src[16];
      int shift_src[16];
      uint32_t bit_shift[16];
      for (int e = 0; e < 2; ++e) {    // e=0 -> low half-word, e=1 -> high
        for (int m = 0; m < 8; ++m) {  // eighth index -> bit pair 2m
          const int64_t r = g * gs + m * e8 + 2 * j + e;
          const int64_t rs = (r < k_in) ? (perm ? perm[r] : r) : -1;
          const int slot = e * 8 + m;
          bit_shift[slot] = (uint32_t)(16 * e + 2 * m);
          if (rs < 0) {
            src[slot] = nullptr;
            shift_src[slot] = 0;
          } else {
            src[slot] = qw + (rs / 16) * n;
            shift_src[slot] = 2 * (int)(rs % 16);
          }
        }
      }
      for (int64_t col = 0; col < n; ++col) {
        uint32_t w = 0;
        for (int s = 0; s < 16; ++s)
          if (src[s])
            w |= ((src[s][col] >> shift_src[s]) & 0x3u) << bit_shift[s];
        dst[col] = w;
      }
      for (int64_t col = n; col < n_out; ++col) dst[col] = 0;
    }
  }
}

int packlib_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"

// SIMD (AVX2+FMA) twins of the host bilinear resize inner loops.
//
// Exactness contract: each vector lane executes the IDENTICAL IEEE-754
// operation sequence as the scalar Blend4 in vpp_host.cpp (mul/mul/mul/
// fma/fma/fma, then truncation toward zero), so the vector path is
// bit-for-bit equal to the scalar path — it exists purely to widen it.
// Columns whose 4-byte gather window would cross the row end are left to
// the caller's scalar tail (the functions only process [0, ncols_vec),
// which the caller computes so that base[j] + 3 < src_w for every lane).
//
// Dispatch: Available() is true when the CPU supports AVX2+FMA and the
// env toggle TS_HOST_SIMD is not "0" (the toggle lets tests prove
// scalar == SIMD on the same machine).
#pragma once

#include <cstdint>

namespace ts {
namespace simd {

bool Available();

// Bilinear Y (full-res plane): dst[i*dst_w + j] for i in [0, nrows),
// j in [0, ncols_vec) — ncols_vec must be a multiple of 8.
// rc_of_ra: per-row +1 tap collapse is resolved by the caller (row
// pointers are passed per row internally from ybase/yw).
void BilinearY(const uint8_t* src, int src_w, int src_h, uint8_t* dst,
               int dst_w, int nrows, int ncols_vec, const int* xbase,
               const float* xw, const int* ybase, const float* yw);

// Bilinear interleaved UV (half-height plane, U at even / V at odd
// columns): processes output pairs j in [0, npairs_vec) — multiple of 8;
// caller guarantees 2*xbase[j] + 3 < src_w for those lanes.
void BilinearUV(const uint8_t* src, int src_w, int src_h2, uint8_t* dst,
                int dst_w, int nrows2, int npairs_vec, const int* xbase,
                const float* xw, const int* ybase, const float* yw);

}  // namespace simd
}  // namespace ts

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
void BilinearY(const uint8_t* src, int src_w, int src_h, int sstride,
               uint8_t* dst, int dst_w, int nrows, int ncols_vec,
               const int* xbase, const float* xw, const int* ybase,
               const float* yw);

// Bilinear interleaved UV (half-height plane, U at even / V at odd
// columns): processes output pairs j in [0, npairs_vec) — multiple of 8;
// caller guarantees 2*xbase[j] + 3 < src_w for those lanes.
void BilinearUV(const uint8_t* src, int src_w, int src_h2, int sstride,
                uint8_t* dst, int dst_w, int nrows2, int npairs_vec,
                const int* xbase, const float* xw, const int* ybase,
                const float* yw);

// AREA-downscale plane: per lane the same fmaf(acc)/plain-add(div)
// accumulation over the y-outer x-inner tap walk as the scalar
// AreaDownPlane, then (int)(acc/div). Caller passes:
//   colbase[j]   = x_base[j]*x_stride + col_off (tap 0 column),
//   wx_col       = TRANSPOSED per-column weights [x_taps][ncols_stride]
//                  (wx_col[tj*ncols_stride + j] = pattern(j % period)[tj]),
//   wy_rows/y_period/y_taps = the periodic row-weight pattern,
// and guarantees colbase[j] + (x_taps-1)*x_stride + 3 < plane_w for
// every lane in [0, ncols_vec) (so no tap needs the right-edge clamp
// and the 4-byte gather window stays inside the row). ncols_vec is a
// multiple of 8. out_stride/out_off place interleaved UV outputs.
void AreaDown(const uint8_t* src, int plane_w, int plane_h, int sstride,
              const int* ybase, const float* wy_rows, int y_period,
              int y_taps, const int* colbase, const float* wx_col,
              int ncols_stride, int x_taps, int x_stride, uint8_t* dst,
              int dst_w, int nrows, int ncols_vec, int out_stride,
              int out_off);

// Bicubic plane: 4 f64 lanes execute the scalar BicubicPlane's exact
// sequence — per row tap a plain mul/add chain over the 4 column taps,
// std::round (emulated exactly as trunc + step on |frac| >= 0.5, which
// is exact because x - trunc(x) is representable) and [0,255] clamp per
// intermediate row, then the vertical mul/add chain with its own
// round/clamp. Caller passes per-row taps (rowtaps[4*i..4*i+3]), the
// per-column spline coefficients cx0..cx3 / per-row cy0..cy3, and column
// taps ct0..ct3, guaranteeing ct{k}[j] + 3 < src_w for every lane in
// [0, ncols_vec) (multiple of 4). out_stride/out_off place interleaved
// UV outputs.
void BicubicPlane(const uint8_t* src, int src_w, int sstride,
                  const int* rowtaps,
                  const double* cy0, const double* cy1, const double* cy2,
                  const double* cy3, const double* cx0, const double* cx1,
                  const double* cx2, const double* cx3, const int* ct0,
                  const int* ct1, const int* ct2, const int* ct3,
                  uint8_t* dst, int dst_w, int nrows, int ncols_vec,
                  int out_stride, int out_off);

// NV12 -> RGB/BGR rows (the native color conversion of the C++ twin,
// vpp_convert.cpp RgbPlane): 8 lanes execute the scalar Nv12Rgb op
// sequence exactly (max/sub/mul Y transform, mul+add chains with the
// +0.5 bias — no FMA, matching -ffp-contract=off — truncate, clamp;
// float outputs divide by 255 like scalar Norm255). Processes columns
// [0, ncols_vec) of every row (multiple of 8; the loads are contiguous,
// so ncols_vec = w & ~7 is always safe); caller runs the scalar tail.
// `out` is uint8 or float32 per `as_float`, planar [3,H,W] or merged
// [H,W,3] per `planar`.
void Nv12RgbRows(const uint8_t* y, const uint8_t* uv, int w, int h,
                 bool swap_rb, bool planar, bool as_float, float rv,
                 float bu, float gv, float gu, float y_coef, float y_off,
                 void* out, int ncols_vec);

// NV12 -> HSV (merged [H,W,3] float32, the only HSV layout): per lane
// the scalar HsvPlane sequence — Nv12Rgb, /255, min/max, S = 1-min/max,
// the four hue branches resolved by masks with the SELECTED numerator
// divided once by delta (bit-identical to the scalar per-branch
// division), /360 scale. Same ncols_vec contract as Nv12RgbRows.
void Nv12HsvRows(const uint8_t* y, const uint8_t* uv, int w, int h,
                 float rv, float bu, float gv, float gu, float y_coef,
                 float y_off, float* out, int ncols_vec);

// 420 -> 422 vertical chroma filter, one ODD output row (even rows are
// copies): dst[c] = clamp255((9*(p1[c]+p2[c]) - (p3[c]+p4[c]) + 8) >> 4)
// for c in [0, w_vec) — multiple of 16; caller runs the scalar tail.
// epi16 arithmetic matches the scalar int path exactly (range fits) and
// packus_epi16 IS Clamp255.
void ChromaVerticalRow(const uint8_t* p1, const uint8_t* p2,
                       const uint8_t* p3, const uint8_t* p4, uint8_t* dst,
                       int w_vec);

// Splits interleaved UV pairs: u[j] = src[2j], v[j] = src[2j+1] for
// j in [0, npairs_vec) — multiple of 16.
void DeinterleavePairs(const uint8_t* src, uint8_t* u, uint8_t* v,
                       int npairs_vec);

// YUV444 horizontal chroma filter over a deinterleaved 4:2:2 stream S
// (vpp_convert.cpp Yuv444Plane restructured): for j in [j0, j1)
//   out[2j]   = S[j]                       (even output pixel: direct)
//   out[2j+1] = wrap8(truncdiv16(9*(S[j]+S[j+1]) - (S[j-1]+S[j+2]) + 8))
// Caller guarantees S[j-1..j+2] are valid loads (interior window) and
// j1-j0 is a multiple of 16. Trunc-toward-zero division and the mod-256
// store match the scalar quirks bit-for-bit.
void Yuv444StreamU8(const uint8_t* S, uint8_t* out, int j0, int j1);

// Float flavor (j1-j0 multiple of 8): norm=1 clamps the numerator to
// [0,4080], scales by the exact 1/16, then divides by 255.0f like the
// scalar Norm255; norm=0 scales by 1/16 and clamps to [0,255].
void Yuv444StreamF32(const uint8_t* S, float* out, int j0, int j1,
                     int norm);

// dst[i] = (float)src[i] / 255.0f (the scalar Norm255 division) for
// i in [0, n_vec) — multiple of 8.
void BytesToNorm255(const uint8_t* src, float* dst, int n_vec);

// Interleaves planar chroma rows: dst[2j] = u[j], dst[2j+1] = v[j] for
// j in [0, npairs_vec) — multiple of 16. The inverse of
// DeinterleavePairs; pure byte moves (decoder ring NV12 store).
void InterleavePairs(const uint8_t* u, const uint8_t* v, uint8_t* dst,
                     int npairs_vec);

}  // namespace simd
}  // namespace ts

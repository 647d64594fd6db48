// AVX2+FMA implementation of the bilinear resize inner loops.
// Compiled with -mavx2 -mfma (see Makefile); every other translation
// unit stays on the portable baseline and reaches this code only through
// the runtime Available() check.
//
// See vpp_host_simd.h for the exactness contract: per lane this is the
// same mul/mul/mul/fma/fma/fma chain as the scalar Blend4, and vcvttps
// truncates toward zero exactly like the scalar (int) cast, so the two
// paths are bit-identical (asserted by tests/test_host_resize.py's
// TS_HOST_SIMD=0 cross-check).
#include "vpp_host_simd.h"

#include <cstdlib>
#include <cstring>
#include <utility>

#if defined(__x86_64__) || defined(_M_X64)
#include <immintrin.h>
#define TS_SIMD_X86 1
#endif

namespace ts {
namespace simd {

bool Available() {
#ifdef TS_SIMD_X86
  static const bool ok = [] {
    const char* env = std::getenv("TS_HOST_SIMD");
    if (env && env[0] == '0') return false;
    return __builtin_cpu_supports("avx2") && __builtin_cpu_supports("fma");
  }();
  return ok;
#else
  return false;
#endif
}

#ifdef TS_SIMD_X86

namespace {

// The scalar path computes, per pixel (Blend4 in vpp_host.cpp):
//   t3 = (b*wx)*omy;  s = fma(a*omx, omy, t3);
//   s  = fma(c*wy, omx, s);  s = fma(d, wx*wy, s);  out = (int)s
// with omx = 1-wx, omy = 1-wy. Identical sequence below, 8 lanes wide.
inline __m256i Blend4Vec(__m256 a, __m256 b, __m256 c, __m256 d, __m256 wx,
                         __m256 wy, __m256 omy) {
  const __m256 one = _mm256_set1_ps(1.0f);
  __m256 omx = _mm256_sub_ps(one, wx);
  __m256 t3 = _mm256_mul_ps(_mm256_mul_ps(b, wx), omy);
  __m256 s = _mm256_fmadd_ps(_mm256_mul_ps(a, omx), omy, t3);
  s = _mm256_fmadd_ps(_mm256_mul_ps(c, wy), omx, s);
  s = _mm256_fmadd_ps(d, _mm256_mul_ps(wx, wy), s);
  return _mm256_cvttps_epi32(s);  // truncation toward zero, like (int)
}

const __m256i kByteMask = _mm256_set1_epi32(0xFF);

inline __m256 ByteAt(__m256i quad, int shift) {
  return _mm256_cvtepi32_ps(_mm256_and_si256(
      shift ? _mm256_srli_epi32(quad, shift) : quad, kByteMask));
}

// Pack 8 int32 lanes (each already in [0, 255]) to 8 bytes and store.
inline void Store8(uint8_t* out, __m256i v32) {
  __m256i p16 = _mm256_packus_epi32(v32, v32);
  __m256i p8 = _mm256_packus_epi16(p16, p16);
  uint32_t lo = static_cast<uint32_t>(_mm256_extract_epi32(p8, 0));
  uint32_t hi = static_cast<uint32_t>(_mm256_extract_epi32(p8, 4));
  std::memcpy(out, &lo, 4);
  std::memcpy(out + 4, &hi, 4);
}

}  // namespace

void BilinearY(const uint8_t* src, int src_w, int src_h, int sstride,
               uint8_t* dst,
               int dst_w, int nrows, int ncols_vec, const int* xbase,
               const float* xw, const int* ybase, const float* yw) {
  for (int i = 0; i < nrows; i++) {
    int ra = ybase[i];
    int rc = (ra + 1 >= src_h) ? ra : ra + 1;
    const uint8_t* row_a = src + static_cast<size_t>(ra) * sstride;
    const uint8_t* row_c = src + static_cast<size_t>(rc) * sstride;
    uint8_t* out = dst + static_cast<size_t>(i) * dst_w;
    __m256 wy = _mm256_set1_ps(yw[i]);
    __m256 omy = _mm256_sub_ps(_mm256_set1_ps(1.0f), wy);
    for (int j = 0; j < ncols_vec; j += 8) {
      __m256i idx = _mm256_loadu_si256(
          reinterpret_cast<const __m256i*>(xbase + j));
      // One 32-bit gather per row yields taps (base, base+1) as the low
      // two bytes; caller guarantees base[j] + 3 < src_w so the window
      // never crosses the plane row (and base+1 never collapses).
      __m256i qa = _mm256_i32gather_epi32(
          reinterpret_cast<const int*>(row_a), idx, 1);
      __m256i qc = _mm256_i32gather_epi32(
          reinterpret_cast<const int*>(row_c), idx, 1);
      __m256 wx = _mm256_loadu_ps(xw + j);
      __m256i v = Blend4Vec(ByteAt(qa, 0), ByteAt(qa, 8), ByteAt(qc, 0),
                            ByteAt(qc, 8), wx, wy, omy);
      Store8(out + j, v);
    }
  }
}

void BilinearUV(const uint8_t* src, int src_w, int src_h2, int sstride,
                uint8_t* dst,
                int dst_w, int nrows2, int npairs_vec, const int* xbase,
                const float* xw, const int* ybase, const float* yw) {
  for (int i = 0; i < nrows2; i++) {
    int ra = ybase[i];
    int rc = (ra + 1 >= src_h2) ? ra : ra + 1;
    const uint8_t* row_a = src + static_cast<size_t>(ra) * sstride;
    const uint8_t* row_c = src + static_cast<size_t>(rc) * sstride;
    uint8_t* out = dst + static_cast<size_t>(i) * dst_w;
    __m256 wy = _mm256_set1_ps(yw[i]);
    __m256 omy = _mm256_sub_ps(_mm256_set1_ps(1.0f), wy);
    for (int j = 0; j < npairs_vec; j += 8) {
      __m256i base = _mm256_loadu_si256(
          reinterpret_cast<const __m256i*>(xbase + j));
      __m256i idx = _mm256_slli_epi32(base, 1);  // ua = 2*base
      // Bytes of the gathered word at ua: [Ua, Va, Ub, Vb] — all four
      // horizontal taps for both chroma channels in one gather per row
      // (caller guarantees 2*base + 3 < src_w, so the +2 taps never
      // collapse and the load stays inside the row).
      __m256i qa = _mm256_i32gather_epi32(
          reinterpret_cast<const int*>(row_a), idx, 1);
      __m256i qc = _mm256_i32gather_epi32(
          reinterpret_cast<const int*>(row_c), idx, 1);
      __m256 wx = _mm256_loadu_ps(xw + j);
      __m256i u = Blend4Vec(ByteAt(qa, 0), ByteAt(qa, 16), ByteAt(qc, 0),
                            ByteAt(qc, 16), wx, wy, omy);
      __m256i v = Blend4Vec(ByteAt(qa, 8), ByteAt(qa, 24), ByteAt(qc, 8),
                            ByteAt(qc, 24), wx, wy, omy);
      // Interleave to [U0,V0,U1,V1,...]: each 32-bit lane becomes the
      // 16-bit little-endian pair U | V<<8, then narrow.
      __m256i pair = _mm256_or_si256(u, _mm256_slli_epi32(v, 8));
      __m256i p16 = _mm256_packus_epi32(pair, pair);
      _mm_storel_epi64(reinterpret_cast<__m128i*>(out + 2 * j),
                       _mm256_castsi256_si128(p16));
      _mm_storel_epi64(reinterpret_cast<__m128i*>(out + 2 * j + 8),
                       _mm256_extracti128_si256(p16, 1));
    }
  }
}

void AreaDown(const uint8_t* src, int plane_w, int plane_h, int sstride,
              const int* ybase, const float* wy_rows, int y_period,
              int y_taps, const int* colbase, const float* wx_col,
              int ncols_stride, int x_taps, int x_stride, uint8_t* dst,
              int dst_w, int nrows, int ncols_vec, int out_stride,
              int out_off) {
  for (int i = 0; i < nrows; i++) {
    const float* wy = wy_rows + static_cast<size_t>(i % y_period) * y_taps;
    uint8_t* out = dst + static_cast<size_t>(i) * dst_w;
    for (int j = 0; j < ncols_vec; j += 8) {
      __m256i col0 = _mm256_loadu_si256(
          reinterpret_cast<const __m256i*>(colbase + j));
      __m256 acc = _mm256_setzero_ps();
      __m256 div = _mm256_setzero_ps();
      for (int ti = 0; ti < y_taps; ti++) {
        int row = ybase[i] + ti;
        if (row > plane_h - 1) row = plane_h - 1;
        const uint8_t* srow = src + static_cast<size_t>(row) * sstride;
        __m256 wyv = _mm256_set1_ps(wy[ti]);
        for (int tj = 0; tj < x_taps; tj++) {
          __m256i idx = _mm256_add_epi32(col0,
                                         _mm256_set1_epi32(tj * x_stride));
          __m256i quad = _mm256_i32gather_epi32(
              reinterpret_cast<const int*>(srow), idx, 1);
          __m256 data = ByteAt(quad, 0);
          // wx_col is transposed [x_taps][ncols]: per-lane weights for
          // this tap are contiguous.
          __m256 wxv = _mm256_loadu_ps(
              wx_col + static_cast<size_t>(tj) * ncols_stride + j);
          __m256 w2d = _mm256_mul_ps(wyv, wxv);
          div = _mm256_add_ps(div, w2d);
          acc = _mm256_fmadd_ps(data, w2d, acc);
        }
      }
      __m256i v32 = _mm256_cvttps_epi32(_mm256_div_ps(acc, div));
      if (out_stride == 1) {
        Store8(out + j + out_off, v32);
      } else {
        alignas(32) int vals[8];
        _mm256_store_si256(reinterpret_cast<__m256i*>(vals), v32);
        for (int k = 0; k < 8; k++)
          out[(j + k) * out_stride + out_off] =
              static_cast<uint8_t>(vals[k]);
      }
    }
  }
}

namespace {

// Exact std::round (half away from zero): x - trunc(x) is always
// representable, so the |frac| >= 0.5 test and the +-1 step reproduce
// the scalar result bit-for-bit (no double-rounding through x + 0.5).
inline __m256d RoundHalfAway(__m256d x) {
  const __m256d signbit = _mm256_set1_pd(-0.0);
  const __m256d half = _mm256_set1_pd(0.5);
  const __m256d one = _mm256_set1_pd(1.0);
  __m256d t = _mm256_round_pd(x, _MM_FROUND_TO_ZERO | _MM_FROUND_NO_EXC);
  __m256d frac = _mm256_sub_pd(x, t);
  __m256d absfrac = _mm256_andnot_pd(signbit, frac);
  __m256d step = _mm256_and_pd(_mm256_cmp_pd(absfrac, half, _CMP_GE_OQ),
                               _mm256_or_pd(_mm256_and_pd(x, signbit), one));
  return _mm256_add_pd(t, step);
}

inline __m256d Clamp255(__m256d x) {
  return _mm256_min_pd(_mm256_max_pd(x, _mm256_setzero_pd()),
                       _mm256_set1_pd(255.0));
}

// Gather 4 bytes (one per lane) at per-lane columns and widen to f64.
inline __m256d GatherBytePd(const uint8_t* row, __m128i idx) {
  __m128i quad = _mm_i32gather_epi32(reinterpret_cast<const int*>(row), idx,
                                     1);
  return _mm256_cvtepi32_pd(_mm_and_si128(quad, _mm_set1_epi32(0xFF)));
}

}  // namespace

void BicubicPlane(const uint8_t* src, int src_w, int sstride,
                  const int* rowtaps,
                  const double* cy0, const double* cy1, const double* cy2,
                  const double* cy3, const double* cx0, const double* cx1,
                  const double* cx2, const double* cx3, const int* ct0,
                  const int* ct1, const int* ct2, const int* ct3,
                  uint8_t* dst, int dst_w, int nrows, int ncols_vec,
                  int out_stride, int out_off) {
  for (int i = 0; i < nrows; i++) {
    const int* rt = rowtaps + 4 * i;
    __m256d vy0 = _mm256_set1_pd(cy0[i]), vy1 = _mm256_set1_pd(cy1[i]);
    __m256d vy2 = _mm256_set1_pd(cy2[i]), vy3 = _mm256_set1_pd(cy3[i]);
    uint8_t* out = dst + static_cast<size_t>(i) * dst_w;
    for (int j = 0; j < ncols_vec; j += 4) {
      __m128i i0 = _mm_loadu_si128(reinterpret_cast<const __m128i*>(ct0 + j));
      __m128i i1 = _mm_loadu_si128(reinterpret_cast<const __m128i*>(ct1 + j));
      __m128i i2 = _mm_loadu_si128(reinterpret_cast<const __m128i*>(ct2 + j));
      __m128i i3 = _mm_loadu_si128(reinterpret_cast<const __m128i*>(ct3 + j));
      __m256d x0 = _mm256_loadu_pd(cx0 + j), x1 = _mm256_loadu_pd(cx1 + j);
      __m256d x2 = _mm256_loadu_pd(cx2 + j), x3 = _mm256_loadu_pd(cx3 + j);
      __m256d rows[4];
      for (int rk = 0; rk < 4; rk++) {
        const uint8_t* srow = src + static_cast<size_t>(rt[rk]) * sstride;
        // Same left-associated mul/add chain as the scalar path — no
        // FMA contraction (matches -ffp-contract=off semantics).
        __m256d acc = _mm256_mul_pd(x0, GatherBytePd(srow, i0));
        acc = _mm256_add_pd(acc, _mm256_mul_pd(x1, GatherBytePd(srow, i1)));
        acc = _mm256_add_pd(acc, _mm256_mul_pd(x2, GatherBytePd(srow, i2)));
        acc = _mm256_add_pd(acc, _mm256_mul_pd(x3, GatherBytePd(srow, i3)));
        rows[rk] = Clamp255(RoundHalfAway(acc));
      }
      __m256d acc = _mm256_mul_pd(vy0, rows[0]);
      acc = _mm256_add_pd(acc, _mm256_mul_pd(vy1, rows[1]));
      acc = _mm256_add_pd(acc, _mm256_mul_pd(vy2, rows[2]));
      acc = _mm256_add_pd(acc, _mm256_mul_pd(vy3, rows[3]));
      __m128i v32 = _mm256_cvttpd_epi32(Clamp255(RoundHalfAway(acc)));
      alignas(16) int vals[4];
      _mm_store_si128(reinterpret_cast<__m128i*>(vals), v32);
      for (int k = 0; k < 4; k++)
        out[(j + k) * out_stride + out_off] = static_cast<uint8_t>(vals[k]);
    }
  }
}

namespace {

// Shared front half of the RGB/HSV row kernels: 8 pixels' clamped
// integer R,G,B lanes from the NV12 bytes at column j.
inline void Nv12RgbLanes(const uint8_t* yrow, const uint8_t* uvrow, int j,
                         __m256 vrv, __m256 vbu, __m256 vgv, __m256 vgu,
                         __m256 vyc, __m256 vyo, __m256i* r, __m256i* g,
                         __m256i* b) {
  const __m256 half = _mm256_set1_ps(0.5f);
  const __m256 v128 = _mm256_set1_ps(128.0f);
  const __m256i zero = _mm256_setzero_si256();
  const __m256i v255i = _mm256_set1_epi32(255);
  const __m256i u_idx = _mm256_setr_epi32(0, 0, 2, 2, 4, 4, 6, 6);
  const __m256i v_idx = _mm256_setr_epi32(1, 1, 3, 3, 5, 5, 7, 7);
  __m256i y8 = _mm256_cvtepu8_epi32(
      _mm_loadl_epi64(reinterpret_cast<const __m128i*>(yrow + j)));
  __m256i uv8 = _mm256_cvtepu8_epi32(
      _mm_loadl_epi64(reinterpret_cast<const __m128i*>(uvrow + j)));
  __m256 yf = _mm256_mul_ps(
      _mm256_max_ps(_mm256_setzero_ps(),
                    _mm256_sub_ps(_mm256_cvtepi32_ps(y8), vyo)),
      vyc);
  __m256 uvf = _mm256_cvtepi32_ps(uv8);
  __m256 ui = _mm256_sub_ps(_mm256_permutevar8x32_ps(uvf, u_idx), v128);
  __m256 vi = _mm256_sub_ps(_mm256_permutevar8x32_ps(uvf, v_idx), v128);
  __m256i ri = _mm256_cvttps_epi32(
      _mm256_add_ps(yf, _mm256_add_ps(_mm256_mul_ps(vrv, vi), half)));
  __m256i bi = _mm256_cvttps_epi32(
      _mm256_add_ps(yf, _mm256_add_ps(_mm256_mul_ps(vbu, ui), half)));
  __m256i gi = _mm256_cvttps_epi32(_mm256_add_ps(
      yf, _mm256_add_ps(
              _mm256_add_ps(_mm256_mul_ps(vgv, vi), _mm256_mul_ps(vgu, ui)),
              half)));
  *r = _mm256_min_epi32(_mm256_max_epi32(ri, zero), v255i);
  *g = _mm256_min_epi32(_mm256_max_epi32(gi, zero), v255i);
  *b = _mm256_min_epi32(_mm256_max_epi32(bi, zero), v255i);
}

}  // namespace

void Nv12RgbRows(const uint8_t* y, const uint8_t* uv, int w, int h,
                 bool swap_rb, bool planar, bool as_float, float rv,
                 float bu, float gv, float gu, float y_coef, float y_off,
                 void* out, int ncols_vec) {
  const __m256 vrv = _mm256_set1_ps(rv), vbu = _mm256_set1_ps(bu);
  const __m256 vgv = _mm256_set1_ps(gv), vgu = _mm256_set1_ps(gu);
  const __m256 vyc = _mm256_set1_ps(y_coef), vyo = _mm256_set1_ps(y_off);
  const __m256 inv255 = _mm256_set1_ps(255.0f);
  const size_t plane = static_cast<size_t>(w) * h;

  for (int i = 0; i < h; i++) {
    const uint8_t* yrow = y + static_cast<size_t>(i) * w;
    const uint8_t* uvrow = uv + static_cast<size_t>(i / 2) * w;
    for (int j = 0; j < ncols_vec; j += 8) {
      __m256i r, g, b;
      Nv12RgbLanes(yrow, uvrow, j, vrv, vbu, vgv, vgu, vyc, vyo, &r, &g,
                   &b);
      if (swap_rb) std::swap(r, b);
      size_t px = static_cast<size_t>(i) * w + j;
      if (as_float) {
        __m256 rf = _mm256_div_ps(_mm256_cvtepi32_ps(r), inv255);
        __m256 gf = _mm256_div_ps(_mm256_cvtepi32_ps(g), inv255);
        __m256 bf = _mm256_div_ps(_mm256_cvtepi32_ps(b), inv255);
        float* o = static_cast<float*>(out);
        if (planar) {
          _mm256_storeu_ps(o + px, rf);
          _mm256_storeu_ps(o + plane + px, gf);
          _mm256_storeu_ps(o + 2 * plane + px, bf);
        } else {
          alignas(32) float rr[8], gg[8], bb[8];
          _mm256_store_ps(rr, rf);
          _mm256_store_ps(gg, gf);
          _mm256_store_ps(bb, bf);
          for (int k = 0; k < 8; k++) {
            o[3 * (px + k)] = rr[k];
            o[3 * (px + k) + 1] = gg[k];
            o[3 * (px + k) + 2] = bb[k];
          }
        }
      } else {
        uint8_t* o = static_cast<uint8_t*>(out);
        if (planar) {
          Store8(o + px, r);
          Store8(o + plane + px, g);
          Store8(o + 2 * plane + px, b);
        } else {
          // One packed RGB0 word per pixel, written as overlapping
          // 4-byte stores at 3-byte stride (each stray high byte is
          // overwritten by the next pixel). The final lane writes 3
          // bytes so the last pixel of the last row never touches
          // memory past the buffer.
          __m256i px32 = _mm256_or_si256(
              r, _mm256_or_si256(_mm256_slli_epi32(g, 8),
                                 _mm256_slli_epi32(b, 16)));
          alignas(32) int vals[8];
          _mm256_store_si256(reinterpret_cast<__m256i*>(vals), px32);
          uint8_t* o3 = o + 3 * px;
          for (int k = 0; k < 7; k++) std::memcpy(o3 + 3 * k, &vals[k], 4);
          std::memcpy(o3 + 21, &vals[7], 3);
        }
      }
    }
  }
}

void Nv12HsvRows(const uint8_t* y, const uint8_t* uv, int w, int h,
                 float rv, float bu, float gv, float gu, float y_coef,
                 float y_off, float* out, int ncols_vec) {
  const __m256 vrv = _mm256_set1_ps(rv), vbu = _mm256_set1_ps(bu);
  const __m256 vgv = _mm256_set1_ps(gv), vgu = _mm256_set1_ps(gu);
  const __m256 vyc = _mm256_set1_ps(y_coef), vyo = _mm256_set1_ps(y_off);
  const __m256 v255 = _mm256_set1_ps(255.0f);
  const __m256 one = _mm256_set1_ps(1.0f);
  const __m256 zero = _mm256_setzero_ps();
  const __m256 sixty = _mm256_set1_ps(60.0f);
  const __m256 v120 = _mm256_set1_ps(120.0f);
  const __m256 v240 = _mm256_set1_ps(240.0f);
  const __m256 v360 = _mm256_set1_ps(360.0f);

  for (int i = 0; i < h; i++) {
    const uint8_t* yrow = y + static_cast<size_t>(i) * w;
    const uint8_t* uvrow = uv + static_cast<size_t>(i / 2) * w;
    for (int j = 0; j < ncols_vec; j += 8) {
      __m256i ri, gi, bi;
      Nv12RgbLanes(yrow, uvrow, j, vrv, vbu, vgv, vgu, vyc, vyo, &ri, &gi,
                   &bi);
      __m256 r = _mm256_div_ps(_mm256_cvtepi32_ps(ri), v255);
      __m256 g = _mm256_div_ps(_mm256_cvtepi32_ps(gi), v255);
      __m256 b = _mm256_div_ps(_mm256_cvtepi32_ps(bi), v255);
      __m256 min_v = _mm256_min_ps(_mm256_min_ps(r, g), b);
      __m256 max_v = _mm256_max_ps(_mm256_max_ps(r, g), b);
      // S = max != 0 ? 1 - min/max : 0  (per-lane division like scalar).
      __m256 m_nz = _mm256_cmp_ps(max_v, zero, _CMP_NEQ_OQ);
      __m256 s = _mm256_and_ps(
          m_nz, _mm256_sub_ps(one, _mm256_div_ps(min_v, max_v)));
      // Hue: select the scalar branch's numerator and offset per lane,
      // then perform the SINGLE division the selected branch would —
      // identical operands => identical rounding.
      __m256 delta = _mm256_sub_ps(max_v, min_v);
      __m256 m_rmax = _mm256_cmp_ps(r, max_v, _CMP_EQ_OQ);
      __m256 m_gmax = _mm256_andnot_ps(
          m_rmax, _mm256_cmp_ps(g, max_v, _CMP_EQ_OQ));
      __m256 m_gge = _mm256_cmp_ps(g, b, _CMP_GE_OQ);
      __m256 num = _mm256_blendv_ps(
          _mm256_mul_ps(sixty, _mm256_sub_ps(r, g)),        // else: r-g
          _mm256_mul_ps(sixty, _mm256_sub_ps(b, r)), m_gmax);  // g max
      num = _mm256_blendv_ps(
          num, _mm256_mul_ps(sixty, _mm256_sub_ps(g, b)), m_rmax);
      __m256 off = _mm256_blendv_ps(v240, v120, m_gmax);
      off = _mm256_blendv_ps(
          off, _mm256_andnot_ps(m_gge, v360), m_rmax);  // r max: 0 or +360
      __m256 hh = _mm256_add_ps(_mm256_div_ps(num, delta), off);
      // Scalar guard `if (hh < 0) hh += 360` (vestigial after the
      // offsets, but kept operation-for-operation).
      hh = _mm256_add_ps(
          hh, _mm256_and_ps(_mm256_cmp_ps(hh, zero, _CMP_LT_OQ), v360));
      hh = _mm256_div_ps(hh, v360);
      // max == min: hue is exactly 0 (delta was 0; the division above
      // produced inf/nan in those lanes — masked off here).
      __m256 m_flat = _mm256_cmp_ps(max_v, min_v, _CMP_NEQ_OQ);
      hh = _mm256_and_ps(hh, m_flat);
      alignas(32) float hs[8], ss[8], vv[8];
      _mm256_store_ps(hs, hh);
      _mm256_store_ps(ss, s);
      _mm256_store_ps(vv, max_v);
      float* px = out + (static_cast<size_t>(i) * w + j) * 3;
      for (int k = 0; k < 8; k++) {
        px[3 * k] = hs[k];
        px[3 * k + 1] = ss[k];
        px[3 * k + 2] = vv[k];
      }
    }
  }
}


// --------------------------------------------------- conversion kernels

// packus_epi16 of a 256-bit epi16 vector to 16 ordered bytes (the pack
// interleaves 128-bit lanes; the permute restores order).
static inline __m128i Pack16U8(__m256i v) {
  __m256i p = _mm256_packus_epi16(v, v);
  p = _mm256_permute4x64_epi64(p, 0xD8);
  return _mm256_castsi256_si128(p);
}

static inline __m256i Widen16(const uint8_t* p) {
  return _mm256_cvtepu8_epi16(_mm_loadu_si128(
      reinterpret_cast<const __m128i*>(p)));
}

void ChromaVerticalRow(const uint8_t* p1, const uint8_t* p2,
                       const uint8_t* p3, const uint8_t* p4, uint8_t* dst,
                       int w_vec) {
  const __m256i nine = _mm256_set1_epi16(9);
  const __m256i eight = _mm256_set1_epi16(8);
  for (int c = 0; c + 16 <= w_vec; c += 16) {
    __m256i a = Widen16(p1 + c), b = Widen16(p2 + c);
    __m256i cc = Widen16(p3 + c), d = Widen16(p4 + c);
    __m256i num = _mm256_add_epi16(
        _mm256_sub_epi16(_mm256_mullo_epi16(nine, _mm256_add_epi16(a, b)),
                         _mm256_add_epi16(cc, d)),
        eight);
    __m256i v = _mm256_srai_epi16(num, 4);  // arithmetic >> like scalar
    _mm_storeu_si128(reinterpret_cast<__m128i*>(dst + c), Pack16U8(v));
  }
}

void DeinterleavePairs(const uint8_t* src, uint8_t* u, uint8_t* v,
                       int npairs_vec) {
  const __m256i mask = _mm256_setr_epi8(
      0, 2, 4, 6, 8, 10, 12, 14, 1, 3, 5, 7, 9, 11, 13, 15,
      0, 2, 4, 6, 8, 10, 12, 14, 1, 3, 5, 7, 9, 11, 13, 15);
  const __m256i perm = _mm256_setr_epi32(0, 1, 4, 5, 2, 3, 6, 7);
  for (int j = 0; j + 16 <= npairs_vec; j += 16) {
    __m256i x = _mm256_loadu_si256(
        reinterpret_cast<const __m256i*>(src + 2 * j));
    __m256i sh = _mm256_shuffle_epi8(x, mask);   // per lane: evens|odds
    __m256i g = _mm256_permutevar8x32_epi32(sh, perm);
    _mm_storeu_si128(reinterpret_cast<__m128i*>(u + j),
                     _mm256_castsi256_si128(g));
    _mm_storeu_si128(reinterpret_cast<__m128i*>(v + j),
                     _mm256_extracti128_si256(g, 1));
  }
}

// 9*(S[j]+S[j+1]) - (S[j-1]+S[j+2]) + 8 as epi16 (range [-502, 4598]).
static inline __m256i Yuv444Num(const uint8_t* S, int j) {
  const __m256i nine = _mm256_set1_epi16(9);
  const __m256i eight = _mm256_set1_epi16(8);
  __m256i a = Widen16(S + j), b = Widen16(S + j + 1);
  __m256i c = Widen16(S + j - 1), d = Widen16(S + j + 2);
  return _mm256_add_epi16(
      _mm256_sub_epi16(_mm256_mullo_epi16(nine, _mm256_add_epi16(a, b)),
                       _mm256_add_epi16(c, d)),
      eight);
}

void Yuv444StreamU8(const uint8_t* S, uint8_t* out, int j0, int j1) {
  const __m256i fifteen = _mm256_set1_epi16(15);
  const __m256i bytemask = _mm256_set1_epi16(0xFF);
  for (int j = j0; j + 16 <= j1; j += 16) {
    __m256i num = Yuv444Num(S, j);
    // C trunc-toward-zero /16: add (num>>15)&15 before the arithmetic
    // shift, then the uint8 store wraps mod 256 (scalar quirk).
    __m256i adj = _mm256_and_si256(_mm256_srai_epi16(num, 15), fifteen);
    __m256i q = _mm256_srai_epi16(_mm256_add_epi16(num, adj), 4);
    __m128i filt = Pack16U8(_mm256_and_si256(q, bytemask));
    __m128i direct = _mm_loadu_si128(reinterpret_cast<const __m128i*>(S + j));
    __m128i lo = _mm_unpacklo_epi8(direct, filt);
    __m128i hi = _mm_unpackhi_epi8(direct, filt);
    _mm_storeu_si128(reinterpret_cast<__m128i*>(out + 2 * j), lo);
    _mm_storeu_si128(reinterpret_cast<__m128i*>(out + 2 * j + 16), hi);
  }
}

// Interleaves two 8-float vectors D, F as (D0,F0,D1,F1,...) into out.
static inline void StoreInterleavedPs(float* out, __m256 D, __m256 F) {
  __m256 lo = _mm256_unpacklo_ps(D, F);
  __m256 hi = _mm256_unpackhi_ps(D, F);
  _mm256_storeu_ps(out, _mm256_permute2f128_ps(lo, hi, 0x20));
  _mm256_storeu_ps(out + 8, _mm256_permute2f128_ps(lo, hi, 0x31));
}

// 8-byte tap loads (the 8-lane float path must not overread the stream
// tail like a 16-byte load would).
static inline __m256i Widen8to32(const uint8_t* p) {
  return _mm256_cvtepu8_epi32(
      _mm_loadl_epi64(reinterpret_cast<const __m128i*>(p)));
}

void Yuv444StreamF32(const uint8_t* S, float* out, int j0, int j1,
                     int norm) {
  const __m256 v255 = _mm256_set1_ps(255.0f);
  const __m256 sixteenth = _mm256_set1_ps(1.0f / 16.0f);  // exact scale
  const __m256i c4080 = _mm256_set1_epi32(4080);
  const __m256i zero = _mm256_setzero_si256();
  const __m256i nine32 = _mm256_set1_epi32(9);
  const __m256i eight32 = _mm256_set1_epi32(8);
  for (int j = j0; j + 8 <= j1; j += 8) {
    __m256i a = Widen8to32(S + j), b = Widen8to32(S + j + 1);
    __m256i c2 = Widen8to32(S + j - 1), d = Widen8to32(S + j + 2);
    __m256i num = _mm256_add_epi32(
        _mm256_sub_epi32(
            _mm256_mullo_epi32(nine32, _mm256_add_epi32(a, b)),
            _mm256_add_epi32(c2, d)),
        eight32);
    __m256i direct8 = a;
    __m256 direct = _mm256_cvtepi32_ps(direct8);
    __m256 filt;
    if (norm) {
      __m256i c = _mm256_min_epi32(_mm256_max_epi32(num, zero), c4080);
      __m256 val = _mm256_mul_ps(_mm256_cvtepi32_ps(c), sixteenth);
      val = _mm256_min_ps(val, v255);
      filt = _mm256_div_ps(val, v255);       // scalar Norm255 division
      direct = _mm256_div_ps(direct, v255);
    } else {
      __m256 val = _mm256_mul_ps(_mm256_cvtepi32_ps(num), sixteenth);
      filt = _mm256_min_ps(_mm256_max_ps(val, _mm256_setzero_ps()), v255);
    }
    StoreInterleavedPs(out + 2 * j, direct, filt);
  }
}

void InterleavePairs(const uint8_t* u, const uint8_t* v, uint8_t* dst,
                     int npairs_vec) {
  for (int j = 0; j + 16 <= npairs_vec; j += 16) {
    __m128i a = _mm_loadu_si128(reinterpret_cast<const __m128i*>(u + j));
    __m128i b = _mm_loadu_si128(reinterpret_cast<const __m128i*>(v + j));
    _mm_storeu_si128(reinterpret_cast<__m128i*>(dst + 2 * j),
                     _mm_unpacklo_epi8(a, b));
    _mm_storeu_si128(reinterpret_cast<__m128i*>(dst + 2 * j + 16),
                     _mm_unpackhi_epi8(a, b));
  }
}

void BytesToNorm255(const uint8_t* src, float* dst, int n_vec) {
  const __m256 v255 = _mm256_set1_ps(255.0f);
  for (int i = 0; i + 8 <= n_vec; i += 8) {
    __m256i b = _mm256_cvtepu8_epi32(
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(src + i)));
    _mm256_storeu_ps(dst + i, _mm256_div_ps(_mm256_cvtepi32_ps(b), v255));
  }
}

#else  // !TS_SIMD_X86 — never reached (Available() is false)

void BilinearY(const uint8_t*, int, int, int, uint8_t*, int, int, int,
               const int*, const float*, const int*, const float*) {}
void BilinearUV(const uint8_t*, int, int, int, uint8_t*, int, int, int,
                const int*, const float*, const int*, const float*) {}
void AreaDown(const uint8_t*, int, int, int, const int*, const float*, int,
              int, const int*, const float*, int, int, int, uint8_t*, int,
              int, int, int, int) {}
void BicubicPlane(const uint8_t*, int, int, const int*, const double*,
                  const double*, const double*, const double*, const double*,
                  const double*, const double*, const double*, const int*,
                  const int*, const int*, const int*, uint8_t*, int, int,
                  int, int, int) {}
void Nv12RgbRows(const uint8_t*, const uint8_t*, int, int, bool, bool, bool,
                 float, float, float, float, float, float, void*, int) {}
void Nv12HsvRows(const uint8_t*, const uint8_t*, int, int, float, float,
                 float, float, float, float, float*, int) {}
void ChromaVerticalRow(const uint8_t*, const uint8_t*, const uint8_t*,
                       const uint8_t*, uint8_t*, int) {}
void DeinterleavePairs(const uint8_t*, uint8_t*, uint8_t*, int) {}
void Yuv444StreamU8(const uint8_t*, uint8_t*, int, int) {}
void Yuv444StreamF32(const uint8_t*, float*, int, int, int) {}
void BytesToNorm255(const uint8_t*, float*, int) {}
void InterleavePairs(const uint8_t*, const uint8_t*, uint8_t*, int) {}

#endif

}  // namespace simd
}  // namespace ts

#include "vpp_convert.h"

#include "vpp_host_simd.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace ts {
namespace {

// BT.601 full-swing constants, exact float32 values the reference uses
// (src/ColorConversion.cu:23-35; mirrored from ops/color.py).
const float kYCoef = 1.163999557f;
const float kRV = 1.5959997177f;
const float kBU = 2.017999649f;
const float kGV = -0.812999725f;
const float kGU = -0.390999794f;

// BT.709 limited-range constants (TPU extension; Kr=0.2126, Kb=0.0722,
// scaled by 255/224 like the BT.601 set — must match ops/color.py's
// _STANDARD_COEFS[1] bit-for-bit, hence the same double-math-then-f32
// construction).
const float kRV709 = static_cast<float>(2 * (1 - 0.2126) * 255 / 224);
const float kBU709 = static_cast<float>(2 * (1 - 0.0722) * 255 / 224);
const float kGV709 =
    static_cast<float>(-(2 * (1 - 0.2126) * 0.2126 / 0.7152) * 255 / 224);
const float kGU709 =
    static_cast<float>(-(2 * (1 - 0.0722) * 0.0722 / 0.7152) * 255 / 224);

// Full-range (PC/JPEG swing) variants (TPU extension; mirrored from
// ops/color.py _STANDARD_COEFS[2..3]): Y maps 0..255 directly and the
// chroma coefficients drop the 255/224 excursion scale.
const float kRV601F = static_cast<float>(2 * (1 - 0.299));
const float kBU601F = static_cast<float>(2 * (1 - 0.114));
const float kGV601F = static_cast<float>(-(2 * (1 - 0.299) * 0.299 / 0.587));
const float kGU601F = static_cast<float>(-(2 * (1 - 0.114) * 0.114 / 0.587));
const float kRV709F = static_cast<float>(2 * (1 - 0.2126));
const float kBU709F = static_cast<float>(2 * (1 - 0.0722));
const float kGV709F =
    static_cast<float>(-(2 * (1 - 0.2126) * 0.2126 / 0.7152));
const float kGU709F =
    static_cast<float>(-(2 * (1 - 0.0722) * 0.0722 / 0.7152));

struct YuvCoefs {
  float rv, bu, gv, gu;
  float y_coef, y_off;
};

inline YuvCoefs CoefsFor(int standard) {
  switch (standard) {
    case 1: return {kRV709, kBU709, kGV709, kGU709, kYCoef, 16.0f};
    case 2: return {kRV601F, kBU601F, kGV601F, kGU601F, 1.0f, 0.0f};
    case 3: return {kRV709F, kBU709F, kGV709F, kGU709F, 1.0f, 0.0f};
    default: return {kRV, kBU, kGV, kGU, kYCoef, 16.0f};
  }
}

inline int Clamp255(int v) { return v < 0 ? 0 : (v > 255 ? 255 : v); }

// Exact x/255 for integer-valued x: a true IEEE single division is
// correctly rounded, identical to the device path's /255 LUT
// (ops/color.py _DIV255; the reference CUDA `/= 255` is the same op).
inline float Norm255(int x) {
  return static_cast<float>(x) / 255.0f;
}

// Per-pixel NV12 -> clamped integer R,G,B (src/ColorConversion.cu:6-39).
// Operation order matches ops/color.py nv12_to_rgb_channels exactly; the
// translation unit is compiled -ffp-contract=off so no FMA re-association
// can change the rounding.
inline void Nv12Rgb(uint8_t yv, uint8_t uu, uint8_t vv, const YuvCoefs& c,
                    int* r, int* g, int* b) {
  // Full-range standards: y_off=0 / y_coef=1 make this the identity on
  // uint8 input — one expression serves both swings (ops/color.py twin).
  float yf = std::max(0.0f, static_cast<float>(yv) - c.y_off) * c.y_coef;
  float vi = static_cast<float>(static_cast<int>(vv) - 128);
  float ui = static_cast<float>(static_cast<int>(uu) - 128);
  *r = Clamp255(static_cast<int>(yf + (c.rv * vi + 0.5f)));
  *b = Clamp255(static_cast<int>(yf + (c.bu * ui + 0.5f)));
  *g = Clamp255(static_cast<int>(yf + (c.gv * vi + c.gu * ui + 0.5f)));
}

// NV12 -> RGB24/BGR24, planar [3,H,W] or merged [H,W,3]
// (src/ColorConversion.cu:41-93).
template <typename T>
void RgbPlane(const uint8_t* y, const uint8_t* uv, int w, int h, bool swap_rb,
              bool planar, int standard, T* out) {
  const YuvCoefs coefs = CoefsFor(standard);
  const size_t plane = static_cast<size_t>(w) * h;
  int vec = 0;
  if (simd::Available()) {
    // 8-lane twin of the per-pixel loop below (vpp_host_avx2.cpp);
    // contiguous loads make every full 8-column group safe.
    vec = w & ~7;
    simd::Nv12RgbRows(y, uv, w, h, swap_rb, planar,
                      std::is_same<T, float>::value, coefs.rv, coefs.bu,
                      coefs.gv, coefs.gu, coefs.y_coef, coefs.y_off, out,
                      vec);
  }
  for (int i = 0; i < h; i++) {
    const uint8_t* yrow = y + static_cast<size_t>(i) * w;
    const uint8_t* uvrow = uv + static_cast<size_t>(i / 2) * w;
    for (int j = vec; j < w; j++) {
      int uvcol = j & ~1;  // even-aligned UV column (ColorConversion.cu:16-21)
      int r, g, b;
      Nv12Rgb(yrow[j], uvrow[uvcol], uvrow[uvcol + 1], coefs, &r, &g, &b);
      if (swap_rb) std::swap(r, b);
      size_t px = static_cast<size_t>(i) * w + j;
      T rv, gv, bv;
      if (std::is_same<T, float>::value) {
        rv = static_cast<T>(Norm255(r));
        gv = static_cast<T>(Norm255(g));
        bv = static_cast<T>(Norm255(b));
      } else {
        rv = static_cast<T>(r);
        gv = static_cast<T>(g);
        bv = static_cast<T>(b);
      }
      if (planar) {
        out[px] = rv;
        out[plane + px] = gv;
        out[2 * plane + px] = bv;
      } else {
        out[3 * px] = rv;
        out[3 * px + 1] = gv;
        out[3 * px + 2] = bv;
      }
    }
  }
}

template <typename T>
void Y800Plane(const uint8_t* y, int w, int h, T* out) {
  const size_t n = static_cast<size_t>(w) * h;
  for (size_t i = 0; i < n; i++) {
    if (std::is_same<T, float>::value)
      out[i] = static_cast<T>(Norm255(y[i]));
    else
      out[i] = static_cast<T>(y[i]);
  }
}

// 420 -> 422 vertical chroma interpolation: odd UV rows get the 4-tap
// filter (9*(p1+p2) - (p3+p4) + 8) >> 4, even rows copy through
// (src/ColorConversion.cu:107-127; ops/color.py _uyvy_chroma_vertical).
std::vector<uint8_t> ChromaVertical(const uint8_t* uv, int w, int h2) {
  std::vector<uint8_t> out(static_cast<size_t>(w) * h2);
  for (int r = 0; r < h2; r++) {
    const uint8_t* p1 = uv + static_cast<size_t>(r) * w;
    uint8_t* dst = out.data() + static_cast<size_t>(r) * w;
    if (r % 2 == 0) {
      std::memcpy(dst, p1, w);
      continue;
    }
    const uint8_t* p2 = uv + static_cast<size_t>(std::min(r + 1, h2 - 1)) * w;
    const uint8_t* p3 = uv + static_cast<size_t>(std::max(r - 1, 0)) * w;
    const uint8_t* p4 = uv + static_cast<size_t>(std::min(r + 2, h2 - 1)) * w;
    int c0 = 0;
    if (simd::Available()) {
      c0 = w & ~15;  // epi16 filter + packus clamp, bit-equal to scalar
      simd::ChromaVerticalRow(p1, p2, p3, p4, dst, c0);
    }
    for (int c = c0; c < w; c++) {
      int v = (9 * (static_cast<int>(p1[c]) + p2[c]) -
               (static_cast<int>(p3[c]) + p4[c]) + 8) >> 4;
      dst[c] = static_cast<uint8_t>(Clamp255(v));
    }
  }
  return out;
}

// NV12 -> UYVY 4:2:2 bytes, per luma row: U0 Y0 V0 Y1 | U1 Y2 V1 Y3 ...
// (src/ColorConversion.cu:176-209; ops/color.py nv12_to_uyvy).
std::vector<uint8_t> UyvyBytes(const uint8_t* y, const uint8_t* uv, int w,
                               int h) {
  std::vector<uint8_t> uv422 = ChromaVertical(uv, w, h / 2);
  std::vector<uint8_t> out(static_cast<size_t>(w) * h * 2);
  for (int i = 0; i < h; i++) {
    const uint8_t* yrow = y + static_cast<size_t>(i) * w;
    const uint8_t* uvrow = uv422.data() + static_cast<size_t>(i / 2) * w;
    uint8_t* dst = out.data() + static_cast<size_t>(i) * w * 2;
    for (int j = 0; j < w / 2; j++) {
      dst[4 * j] = uvrow[2 * j];
      dst[4 * j + 1] = yrow[2 * j];
      dst[4 * j + 2] = uvrow[2 * j + 1];
      dst[4 * j + 3] = yrow[2 * j + 1];
    }
  }
  return out;
}

template <typename T>
void UyvyPlane(const uint8_t* y, const uint8_t* uv, int w, int h, T* out) {
  std::vector<uint8_t> bytes = UyvyBytes(y, uv, w, h);
  if (!std::is_same<T, float>::value) {
    std::memcpy(out, bytes.data(), bytes.size());
    return;
  }
  float* f = reinterpret_cast<float*>(out);
  size_t i0 = 0;
  if (simd::Available()) {
    i0 = bytes.size() & ~size_t{7};
    simd::BytesToNorm255(bytes.data(), f, static_cast<int>(i0));
  }
  for (size_t i = i0; i < bytes.size(); i++)
    f[i] = Norm255(bytes[i]);
}

// UYVY -> planar YUV444 with the reference's horizontal chroma filter
// (9*(l+r) - (ll+rr) + 8) / 16 and its boundary/tail-tap quirks
// (src/ColorConversion.cu:129-173; ops/color.py uyvy_to_yuv444):
//  * taps index the FLAT UYVY buffer, crossing row boundaries like CUDA;
//  * the very last odd pixel's p2 tap reads past the payload into what in
//    CUDA was the zero-initialized tail of an over-allocated buffer — the
//    committed oracles encode a 0 tap there, reproduced via an explicit
//    zero-padded copy;
//  * uchar mode: C truncating division by 16, then mod-256 wrap on the
//    uint8 store (before the no-op clamp — quirk preserved);
//  * float mode: clamp num to [0, 4080], exact /16, then /255.
// Restructured SIMD twin of Yuv444Plane: the flat-UYVY taps
// deinterleave into per-component streams S (S[j] = bytes[2j+shift]),
// where the odd-pixel filter becomes 9*(S[j]+S[j+1]) - (S[j-1]+S[j+2])
// + 8 over a contiguous stream and the Y plane is the y input verbatim
// (bytes[2idx+1] == y[idx]). Head pixel (p3 -> p1 clamp) and the last
// two odd pixels (p2 zero-tail tap / p4 -> p2 collapse) stay scalar;
// tests pin byte equality with the scalar path across the matrix.
template <typename T>
void Yuv444PlaneFast(const uint8_t* y, const uint8_t* uv, int w, int h,
                     bool normalization, T* out) {
  std::vector<uint8_t> uv422 = ChromaVertical(uv, w, h / 2);
  const long long n = static_cast<long long>(w) * h;
  const long long ns = n / 2;
  const int half = w / 2;
  std::vector<uint8_t> su(ns), sv(ns);
  for (int i = 0; i < h; i++) {
    const uint8_t* src = uv422.data() + static_cast<size_t>(i / 2) * w;
    uint8_t* urow = su.data() + static_cast<size_t>(i) * half;
    uint8_t* vrow = sv.data() + static_cast<size_t>(i) * half;
    int vec = half & ~15;
    simd::DeinterleavePairs(src, urow, vrow, vec);
    for (int j = vec; j < half; j++) {
      urow[j] = src[2 * j];
      vrow[j] = src[2 * j + 1];
    }
  }
  // Y plane: identity copy (or the Norm255 division).
  if (std::is_same<T, float>::value) {
    float* f = reinterpret_cast<float*>(out);
    if (normalization) {
      long long vec = n & ~7LL;
      simd::BytesToNorm255(y, f, static_cast<int>(vec));
      for (long long i = vec; i < n; i++) f[i] = Norm255(y[i]);
    } else {
      for (long long i = 0; i < n; i++) f[i] = static_cast<float>(y[i]);
    }
  } else {
    std::memcpy(out, y, static_cast<size_t>(n));
  }
  for (int comp = 0; comp < 2; comp++) {
    const uint8_t* S = comp == 0 ? su.data() : sv.data();
    T* plane = out + n * (1 + comp);
    // Interior vector region: j in [1, 1+cnt) needs S[j-1..j+2] valid
    // and must stop before the two tail-quirk pixels.
    long long cnt = ns >= 4 ? ns - 3 : 0;
    if (std::is_same<T, float>::value) {
      cnt &= ~7LL;
      simd::Yuv444StreamF32(S, reinterpret_cast<float*>(plane), 1,
                            static_cast<int>(1 + cnt),
                            normalization ? 1 : 0);
    } else {
      cnt &= ~15LL;
      simd::Yuv444StreamU8(S, reinterpret_cast<uint8_t*>(plane), 1,
                           static_cast<int>(1 + cnt));
    }
    // Scalar edges (j = 0, and the vector remainder through the tail),
    // with the original boundary rules expressed in stream indices.
    auto edge = [&](long long j) {
      int direct = S[j];
      int t1 = S[j];                                  // p1 (never clamps)
      int t2 = j + 1 <= ns - 1 ? S[j + 1] : 0;        // zero tail tap
      int t3 = j == 0 ? t1 : S[j - 1];                // p3 -> p1 at head
      int t4 = j + 2 <= ns - 1 ? S[j + 2] : t2;       // p4 -> p2 at tail
      int num = 9 * (t1 + t2) - (t3 + t4) + 8;
      if (std::is_same<T, float>::value) {
        float* fp = reinterpret_cast<float*>(plane);
        float dval, fval;
        if (normalization) {
          dval = Norm255(direct);
          int c = std::min(std::max(num, 0), 4080);
          fval = std::min(static_cast<float>(c) / 16.0f, 255.0f) / 255.0f;
        } else {
          dval = static_cast<float>(direct);
          float v = static_cast<float>(num) / 16.0f;
          fval = std::min(std::max(v, 0.0f), 255.0f);
        }
        fp[2 * j] = dval;
        fp[2 * j + 1] = fval;
      } else {
        uint8_t* up = reinterpret_cast<uint8_t*>(plane);
        up[2 * j] = static_cast<uint8_t>(direct);
        up[2 * j + 1] = static_cast<uint8_t>(num / 16);  // trunc + wrap
      }
    };
    edge(0);
    for (long long j = 1 + cnt; j < ns; j++) edge(j);
  }
}

template <typename T>
void Yuv444Plane(const uint8_t* y, const uint8_t* uv, int w, int h,
                 bool normalization, T* out) {
  // Even dims only: the stream restructuring assumes w/2 whole pairs
  // per row; odd widths fall back to the scalar flat-tap path whose
  // row-straddling quirks the oracles encode.
  if (simd::Available() && w >= 2 && w % 2 == 0 && h % 2 == 0) {
    Yuv444PlaneFast(y, uv, w, h, normalization, out);
    return;
  }
  std::vector<uint8_t> bytes = UyvyBytes(y, uv, w, h);
  const long long n = static_cast<long long>(w) * h;
  const long long last = 2 * n - 1;
  // Taps past the payload read 0 — the reference's over-allocated
  // zero-initialized intermediate buffer (only p2/p4 can exceed `last`).
  auto tap = [&](long long i) -> int {
    return i <= last ? static_cast<int>(bytes[i]) : 0;
  };
  T* y_plane = out;
  T* u_plane = out + n;
  T* v_plane = out + 2 * n;
  for (long long idx = 0; idx < n; idx++) {
    long long src_index = idx * 2 + 1;
    int yv = bytes[src_index];
    if (std::is_same<T, float>::value)
      y_plane[idx] = static_cast<T>(normalization
                                        ? Norm255(yv)
                                        : static_cast<float>(yv));
    else
      y_plane[idx] = static_cast<T>(yv);
    bool even = (idx % 2 == 0);
    for (int comp = 0; comp < 2; comp++) {
      int shift = comp * 2;
      T* plane = comp == 0 ? u_plane : v_plane;
      long long di = std::min(std::max(src_index - 1 + shift, 0LL), last);
      int direct = bytes[di];
      if (even) {
        if (std::is_same<T, float>::value)
          plane[idx] = static_cast<T>(normalization
                                          ? Norm255(direct)
                                          : static_cast<float>(direct));
        else
          plane[idx] = static_cast<T>(direct);
        continue;
      }
      long long p1 = std::min(std::max(src_index - 3 + shift, 0LL), last);
      long long p2 = src_index + 1 + shift;  // may exceed last: zero tap
      long long p3 = src_index - 7 + shift;
      if (p3 < 0) p3 = p1;
      long long p4 = src_index + 5 + shift;
      if (p4 > last) p4 = p2;
      int num = 9 * (tap(p1) + tap(p2)) - (tap(p3) + tap(p4)) + 8;
      if (std::is_same<T, float>::value) {
        if (normalization) {
          int c = std::min(std::max(num, 0), 4080);
          float val = std::min(static_cast<float>(c) / 16.0f, 255.0f);
          plane[idx] = static_cast<T>(val / 255.0f);
        } else {
          float val = static_cast<float>(num) / 16.0f;
          val = std::min(std::max(val, 0.0f), 255.0f);
          plane[idx] = static_cast<T>(val);
        }
      } else {
        int val = num / 16;  // C trunc-toward-zero division
        plane[idx] = static_cast<T>(
            static_cast<uint8_t>(val));  // mod-256 wrap, quirk preserved
      }
    }
  }
}

template <typename T>
void Nv12MergePlane(const uint8_t* y, const uint8_t* uv, int w, int h,
                    T* out) {
  const size_t yn = static_cast<size_t>(w) * h;
  const size_t uvn = yn / 2;
  for (size_t i = 0; i < yn; i++) {
    if (std::is_same<T, float>::value)
      out[i] = static_cast<T>(Norm255(y[i]));
    else
      out[i] = static_cast<T>(y[i]);
  }
  for (size_t i = 0; i < uvn; i++) {
    if (std::is_same<T, float>::value)
      out[yn + i] = static_cast<T>(Norm255(uv[i]));
    else
      out[yn + i] = static_cast<T>(uv[i]);
  }
}

// Merged normalized RGB f32 -> merged HSV f32: H scaled to [0,1] from
// degrees/360, S = 1 - min/max, V = max (src/ColorConversion.cu:235-278;
// ops/color.py rgb_to_hsv incl. the max==min early-return quirk).
void HsvPlane(const uint8_t* y, const uint8_t* uv, int w, int h, int standard,
              float* out) {
  const YuvCoefs coefs = CoefsFor(standard);
  int vec = 0;
  if (simd::Available()) {
    vec = w & ~7;
    simd::Nv12HsvRows(y, uv, w, h, coefs.rv, coefs.bu, coefs.gv, coefs.gu,
                      coefs.y_coef, coefs.y_off, out, vec);
  }
  for (int i = 0; i < h; i++) {
    const uint8_t* yrow = y + static_cast<size_t>(i) * w;
    const uint8_t* uvrow = uv + static_cast<size_t>(i / 2) * w;
    for (int j = vec; j < w; j++) {
      int uvcol = j & ~1;
      int ri, gi, bi;
      Nv12Rgb(yrow[j], uvrow[uvcol], uvrow[uvcol + 1], coefs, &ri, &gi, &bi);
      float r = Norm255(ri), g = Norm255(gi), b = Norm255(bi);
      float min_v = std::min(std::min(r, g), b);
      float max_v = std::max(std::max(r, g), b);
      float* px = out + (static_cast<size_t>(i) * w + j) * 3;
      float v = max_v;
      float s = max_v != 0.0f ? 1.0f - min_v / max_v : 0.0f;
      float hh = 0.0f;
      if (max_v != min_v) {
        float delta = max_v - min_v;
        if (r == max_v && g >= b)
          hh = 60.0f * (g - b) / delta;
        else if (r == max_v && g < b)
          hh = 60.0f * (g - b) / delta + 360.0f;
        else if (g == max_v)
          hh = 60.0f * (b - r) / delta + 120.0f;
        else
          hh = 60.0f * (r - g) / delta + 240.0f;
        if (hh < 0.0f) hh += 360.0f;
        hh = hh / 360.0f;
      }
      px[0] = hh;
      px[1] = s;
      px[2] = v;
    }
  }
}

}  // namespace

size_t ConvertedElements(int w, int h, int fourcc) {
  size_t n = static_cast<size_t>(w) * h;
  switch (fourcc) {
    case FCC_Y800:
      return n;
    case FCC_NV12:
      return n * 3 / 2;
    case FCC_UYVY:
      return n * 2;
    default:  // RGB24/BGR24/YUV444/HSV
      return n * 3;
  }
}

bool ConvertedIsFloat(int fourcc, bool normalization) {
  return normalization || fourcc == FCC_HSV;
}

int ConvertNV12Host(const uint8_t* y, const uint8_t* uv, int w, int h,
                    int fourcc, int planes, bool normalization, int standard,
                    void* out) {
  const bool as_float = ConvertedIsFloat(fourcc, normalization);
  switch (fourcc) {
    case FCC_RGB24:
    case FCC_BGR24: {
      bool swap = fourcc == FCC_BGR24;
      bool planar = planes == PLANES_PLANAR;
      if (as_float)
        RgbPlane(y, uv, w, h, swap, planar, standard,
                 static_cast<float*>(out));
      else
        RgbPlane(y, uv, w, h, swap, planar, standard,
                 static_cast<uint8_t*>(out));
      return 0;
    }
    case FCC_Y800:
      if (as_float)
        Y800Plane(y, w, h, static_cast<float*>(out));
      else
        Y800Plane(y, w, h, static_cast<uint8_t*>(out));
      return 0;
    case FCC_UYVY:
      if (as_float)
        UyvyPlane(y, uv, w, h, static_cast<float*>(out));
      else
        UyvyPlane(y, uv, w, h, static_cast<uint8_t*>(out));
      return 0;
    case FCC_YUV444:
      if (as_float)
        Yuv444Plane(y, uv, w, h, normalization, static_cast<float*>(out));
      else
        Yuv444Plane(y, uv, w, h, normalization, static_cast<uint8_t*>(out));
      return 0;
    case FCC_NV12:
      if (as_float)
        Nv12MergePlane(y, uv, w, h, static_cast<float*>(out));
      else
        Nv12MergePlane(y, uv, w, h, static_cast<uint8_t*>(out));
      return 0;
    case FCC_HSV:
      HsvPlane(y, uv, w, h, standard, static_cast<float*>(out));
      return 0;
    default:
      return -1;  // unknown FourCC: nothing was written
  }
}

void VppOutputSize(int src_w, int src_h, const HostVppParams& p, int* out_w,
                   int* out_h) {
  int w = src_w, h = src_h;
  int cw = p.crop_right - p.crop_left;
  int ch = p.crop_bottom - p.crop_top;
  if (0 < cw && cw < src_w && 0 < ch && ch < src_h) {
    w = cw;
    h = ch;
  }
  if (p.dst_width && p.dst_height) {
    w = p.dst_width;
    h = p.dst_height;
  }
  *out_w = w;
  *out_h = h;
}

int VppConvertHost(const uint8_t* y, const uint8_t* uv, int src_w, int src_h,
                   const HostVppParams& p, void* out) {
  int cw = p.crop_right - p.crop_left;
  int ch = p.crop_bottom - p.crop_top;
  bool do_crop = 0 < cw && cw < src_w && 0 < ch && ch < src_h;
  if (do_crop && (p.crop_left < 0 || p.crop_top < 0 ||
                  p.crop_right > src_w || p.crop_bottom > src_h))
    return -1;  // box outside the frame: the copies below would overread
  if (do_crop && (p.crop_left % 2 || p.crop_top % 2 || cw % 2 || ch % 2))
    return -1;  // NV12 demands even alignment: odd left swaps the U/V
                // interleave, odd top misaligns chroma by a row, and odd
                // extents break the pair loops of the converters below
  int cur_w = do_crop ? cw : src_w;
  int cur_h = do_crop ? ch : src_h;
  bool do_resize = p.dst_width && p.dst_height &&
                   (p.dst_width != cur_w || p.dst_height != cur_h);
  if (do_resize && (p.dst_width % 2 || p.dst_height % 2)) return -1;

  std::vector<uint8_t> crop_y, crop_uv, rs_y, rs_uv;
  const uint8_t* cy = y;
  const uint8_t* cuv = uv;
  if (do_crop) {
    // Two plane slices, like the device crop (ops/crop.py; reference
    // kernel src/Crop.cu:4-48).
    crop_y.resize(static_cast<size_t>(cw) * ch);
    crop_uv.resize(static_cast<size_t>(cw) * (ch / 2));
    for (int i = 0; i < ch; i++)
      std::memcpy(crop_y.data() + static_cast<size_t>(i) * cw,
                  y + static_cast<size_t>(p.crop_top + i) * src_w +
                      p.crop_left,
                  cw);
    for (int i = 0; i < ch / 2; i++)
      std::memcpy(crop_uv.data() + static_cast<size_t>(i) * cw,
                  uv + static_cast<size_t>(p.crop_top / 2 + i) * src_w +
                      p.crop_left,
                  cw);
    cy = crop_y.data();
    cuv = crop_uv.data();
  }
  if (do_resize) {
    rs_y.resize(static_cast<size_t>(p.dst_width) * p.dst_height);
    rs_uv.resize(static_cast<size_t>(p.dst_width) * (p.dst_height / 2));
    ResizeNV12Host(cy, cuv, cur_w, cur_h, rs_y.data(), rs_uv.data(),
                   p.dst_width, p.dst_height, p.resize_algo);
    cy = rs_y.data();
    cuv = rs_uv.data();
    cur_w = p.dst_width;
    cur_h = p.dst_height;
  }
  // HSV forces normalization (VideoProcessor.h:39-52) — ConvertedIsFloat
  // already answers float for it; pass normalization through unchanged.
  return ConvertNV12Host(cy, cuv, cur_w, cur_h, p.fourcc, p.planes,
                         p.normalization, p.standard, out);
}

}  // namespace ts

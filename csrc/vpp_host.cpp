#include "vpp_host.h"

#include "vpp_host_simd.h"

#include <algorithm>
#include <cmath>
#include <limits>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <tuple>
#include <vector>

namespace ts {
namespace {

// Per-axis tap positions and fractional weights for one (src, dst) pair.
// Math mirrors the device path (ops/resize.py `_bilinear_axis` /
// `_nearest_axis`; reference: src/Resize.cu:249-250, 276-302): all
// arithmetic in float32, floor-based base, border clamps zero the weight.
// The center-aligned coordinate uses a single-rounding fmaf, matching
// nvcc's contraction of `(j + 0.5f) * ratio - 0.5f` (verified against the
// reference's bilinear CRC oracles; see ops/resize.py `_coord_fma`).
struct AxisTables {
  std::vector<int> nearest;           // (int)(ratio * j)
  std::vector<int> base;              // bilinear floor base, clamped
  std::vector<float> w;               // bilinear fractional weight
};

AxisTables BuildAxis(int dst_n, int src_n) {
  AxisTables t;
  float ratio = static_cast<float>(src_n) / static_cast<float>(dst_n);
  t.nearest.resize(dst_n);
  t.base.resize(dst_n);
  t.w.resize(dst_n);
  for (int j = 0; j < dst_n; j++) {
    t.nearest[j] = static_cast<int>(ratio * static_cast<float>(j));
    float f = std::fmaf(static_cast<float>(j) + 0.5f, ratio, -0.5f);
    int base = static_cast<int>(std::floor(f));
    float w = f - static_cast<float>(base);
    if (base < 0) {
      base = 0;
      w = 0.0f;
    }
    if (base > src_n - 1) {
      base = src_n - 1;
      w = 0.0f;
    }
    t.base[j] = base;
    t.w[j] = w;
  }
  return t;
}

// Bicubic axis: Catmull-Rom-style spline coefficients computed in double
// from the f32 center-aligned coordinate, exactly like the reference
// (src/Resize.cu:45-50, 321-347; mirrored from ops/resize.py).
struct BicubicAxis {
  std::vector<int> base;    // clamped floor of the f32 coordinate
  std::vector<double> c[4];
};

BicubicAxis BuildBicubicAxis(int dst_n, int src_n) {
  BicubicAxis t;
  t.base.resize(dst_n);
  for (int k = 0; k < 4; k++) t.c[k].resize(dst_n);
  const double a = -0.75;
  float r = static_cast<float>(src_n) / static_cast<float>(dst_n);
  for (int j = 0; j < dst_n; j++) {
    // Single-rounding f32 coordinate, like nvcc's contraction (see
    // BuildAxis), then widened to double for the spline weights.
    float f32 = std::fmaf(static_cast<float>(j) + 0.5f, r, -0.5f);
    double f = static_cast<double>(f32);
    int base = static_cast<int>(std::floor(f));
    double w = f - static_cast<double>(base);
    if (base < 0) {
      base = 0;
      w = 0.0;
    }
    if (base > src_n - 1) {
      base = src_n - 1;
      w = 0.0;
    }
    t.base[j] = base;
    double w2 = w * w, w3 = w2 * w;
    t.c[0][j] = a * w - 2 * a * w2 + a * w3;
    t.c[1][j] = 1 - (a + 3) * w2 + (a + 2) * w3;
    t.c[2][j] = -a * w + (2 * a + 3) * w2 - (a + 2) * w3;
    t.c[3][j] = a * w2 - a * w3;
  }
  return t;
}

// Tap positions (-diffTop, 0, +diff, +2diff) with the reference's
// collapse rules (src/Resize.cu:29-43; ops/resize.py `_bicubic_taps`):
// +taps collapse when either crosses `bound`, the -tap collapses at 0.
inline void BicubicTaps(int pos, int diff, int bound, int out[4]) {
  int d = diff;
  if (pos + diff >= bound || pos + 2 * diff >= bound) d = 0;
  int d_top = (pos - diff < 0) ? 0 : diff;
  out[0] = pos - d_top;
  out[1] = pos;
  out[2] = pos + d;
  out[3] = pos + 2 * d;
}

// AREA downscale pattern rows (reference host code incl. its f32
// arithmetic and epsilon loop bound, src/Resize.cu:359-386; mirrored
// from ops/resize.py `generate_resize_pattern`).
struct AreaPattern {
  int taps = 0;     // ceil(scale)
  int period = 0;   // number of distinct weight rows
  std::vector<float> rows;  // period x taps
};

AreaPattern BuildAreaPattern(float scale) {
  AreaPattern p;
  p.taps = static_cast<int>(std::ceil(static_cast<double>(scale)));
  const float eps = std::numeric_limits<float>::epsilon();
  float rest = 0.0f;
  int current = 0;
  while (true) {
    float prod = static_cast<float>(current) * scale;
    if (!(prod == 0.0f || (prod - static_cast<float>(static_cast<int>(prod))) > eps))
      break;
    float dyn = scale;
    std::vector<float> row;
    if (rest != 0.0f) {
      row.push_back(rest);
      dyn = dyn - rest;
    }
    while (dyn - 1.0f > 0.0f) {
      row.push_back(1.0f);
      dyn = dyn - 1.0f;
    }
    if (dyn > eps) {
      row.push_back(dyn);
      rest = 1.0f - dyn;
    }
    row.resize(p.taps, 0.0f);  // pad with zeros / truncate the dead tail
    p.rows.insert(p.rows.end(), row.begin(), row.end());
    current++;
    if (current > 8192) break;  // safety bound, like the device twin
  }
  p.period = current;
  return p;
}

struct ResizePlan {
  AxisTables x, y;      // full-res axes (Y plane)
  AxisTables x_uv, y_uv;  // half-res axes = first dst/2 entries (UV plane)
};

const ResizePlan& GetPlan(int sw, int sh, int dw, int dh) {
  static std::mutex mu;
  static std::map<std::tuple<int, int, int, int>,
                  std::unique_ptr<ResizePlan>> cache;
  std::lock_guard<std::mutex> lk(mu);
  auto key = std::make_tuple(sw, sh, dw, dh);
  auto it = cache.find(key);
  if (it == cache.end()) {
    auto plan = std::make_unique<ResizePlan>();
    plan->x = BuildAxis(dw, sw);
    plan->y = BuildAxis(dh, sh);
    // UV axes reuse the first dst/2 full-res entries, exactly like the
    // device tables (ops/resize.py `_bilinear_uv`; src/Resize.cu:307-310).
    plan->x_uv = plan->x;
    plan->x_uv.nearest.resize(dw / 2);
    plan->x_uv.base.resize(dw / 2);
    plan->x_uv.w.resize(dw / 2);
    plan->y_uv = plan->y;
    plan->y_uv.nearest.resize(dh / 2);
    plan->y_uv.base.resize(dh / 2);
    plan->y_uv.w.resize(dh / 2);
    it = cache.emplace(key, std::move(plan)).first;
  }
  return *it->second;
}

// 4-tap blend of the reference's expression
// (int)(a(1-wx)(1-wy) + b wx (1-wy) + c wy (1-wx) + d (wx wy))
// (src/Resize.cu:5-25) in nvcc's FMA-contracted rounding order: the
// first add fuses the LEFT operand's last multiply, subsequent adds fuse
// the right operand's. This exact order reproduces the reference's
// bilinear CRC oracles bit-for-bit at every committed size, including
// the upscale cases the strictly-rounded order misses (and XLA:CPU's
// own contraction of ops/resize.py `_bilinear_plane` matches it too).
inline uint8_t Blend4(float a, float b, float c, float d, float wx, float wy) {
  float omx = 1.0f - wx, omy = 1.0f - wy;
  float s = std::fmaf(a * omx, omy, (b * wx) * omy);
  s = std::fmaf(c * wy, omx, s);
  s = std::fmaf(d, wx * wy, s);
  return static_cast<uint8_t>(static_cast<int>(s));
}

void BilinearY(const uint8_t* src, int sw, int sh, int sstride,
               uint8_t* dst, int dw, int dh, const AxisTables& ax,
               const AxisTables& ay) {
  int vec = 0;
  if (simd::Available()) {
    // SIMD lanes gather a 4-byte window at base[j]; hand the columns
    // whose window would cross the row end (and the +1-tap border
    // collapse with them) to the scalar tail below. base[] is
    // nondecreasing, so scanning back from the edge finds the cutoff.
    vec = dw;
    while (vec > 0 && ax.base[vec - 1] + 3 >= sw) vec--;
    vec &= ~7;
    simd::BilinearY(src, sw, sh, sstride, dst, dw, dh, vec,
                    ax.base.data(), ax.w.data(), ay.base.data(),
                    ay.w.data());
  }
  for (int i = 0; i < dh; i++) {
    int ra = ay.base[i];
    int rc = (ra + 1 >= sh) ? ra : ra + 1;  // +y tap collapses at border
    float wy = ay.w[i];
    const uint8_t* row_a = src + static_cast<size_t>(ra) * sstride;
    const uint8_t* row_c = src + static_cast<size_t>(rc) * sstride;
    uint8_t* out = dst + static_cast<size_t>(i) * dw;
    for (int j = vec; j < dw; j++) {
      int ca = ax.base[j];
      int cb = (ca + 1 >= sw) ? ca : ca + 1;
      out[j] = Blend4(row_a[ca], row_a[cb], row_c[ca], row_c[cb],
                      ax.w[j], wy);
    }
  }
}

// Interleaved UV: U at even columns (x -> 2x, step 2), V at odd
// (x -> 2x+1), half height (src/Resize.cu:235-238, 307-310).
void BilinearUV(const uint8_t* src, int sw, int sh2, int sstride,
                uint8_t* dst, int dw, int dh2, const AxisTables& ax,
                const AxisTables& ay) {
  int vec = 0;
  if (simd::Available()) {
    // Lane j gathers the 4 bytes at 2*base[j] ([Ua,Va,Ub,Vb]); columns
    // whose window crosses the row end go to the scalar tail.
    vec = dw / 2;
    while (vec > 0 && 2 * ax.base[vec - 1] + 3 >= sw) vec--;
    vec &= ~7;
    simd::BilinearUV(src, sw, sh2, sstride, dst, dw, dh2, vec,
                     ax.base.data(), ax.w.data(), ay.base.data(),
                     ay.w.data());
  }
  for (int i = 0; i < dh2; i++) {
    int ra = ay.base[i];
    int rc = (ra + 1 >= sh2) ? ra : ra + 1;
    float wy = ay.w[i];
    const uint8_t* row_a = src + static_cast<size_t>(ra) * sstride;
    const uint8_t* row_c = src + static_cast<size_t>(rc) * sstride;
    uint8_t* out = dst + static_cast<size_t>(i) * dw;
    for (int j = vec; j < dw / 2; j++) {
      float wx = ax.w[j];
      int ua = 2 * ax.base[j];
      int ub = (ua + 2 >= sw) ? ua : ua + 2;
      int va = ua + 1;
      int vb = (va + 2 >= sw) ? va : va + 2;
      out[2 * j] = Blend4(row_a[ua], row_a[ub], row_c[ua], row_c[ub], wx, wy);
      out[2 * j + 1] =
          Blend4(row_a[va], row_a[vb], row_c[va], row_c[vb], wx, wy);
    }
  }
}

// Generic bicubic plane: two-pass spline — horizontal blend at each of 4
// row taps, rounded and clamped per intermediate row, then the vertical
// blend (src/Resize.cu:47-88; ops/resize.py `_bicubic_plane`, f32
// accumulation of f64-derived coefficients).
// Precomputed per-plane column taps (depend only on the output column).
struct ColTaps {
  std::vector<int> t[4];
};

ColTaps BuildColTaps(const BicubicAxis& ax, int ncols, int col_scale,
                     int col_off, int col_diff, int col_bound) {
  ColTaps ct;
  for (int k = 0; k < 4; k++) ct.t[k].resize(ncols);
  for (int j = 0; j < ncols; j++) {
    int tmp[4];
    BicubicTaps(ax.base[j] * col_scale + col_off, col_diff, col_bound, tmp);
    for (int k = 0; k < 4; k++) ct.t[k][j] = tmp[k];
  }
  return ct;
}

// Double-precision spline blend with round()/clamp per intermediate row,
// exactly like the reference (src/Resize.cu:47-91). Double has enough
// headroom over 8-bit data that nvcc's f64 contraction choices never
// flip round(); this path reproduces every committed bicubic CRC oracle
// (including the 480x360 case where the reference's own Windows/Linux
// builds disagree — both platform CRCs come from coordinate-level
// effects, and the fmaf coordinate above matches the Linux one).
void BicubicPlane(const uint8_t* src, int src_w, int sstride,
                  const BicubicAxis& ay,
                  int row_bound, const BicubicAxis& ax, int ncols,
                  const ColTaps& col_taps, uint8_t* dst, int dst_w,
                  int nrows, int out_stride, int out_off, int j_start = 0) {
  for (int i = 0; i < nrows; i++) {
    int rt[4];
    BicubicTaps(ay.base[i], 1, row_bound, rt);
    double cy[4];
    for (int k = 0; k < 4; k++) cy[k] = ay.c[k][i];
    for (int j = j_start; j < ncols; j++) {
      int ct[4];
      for (int k = 0; k < 4; k++) ct[k] = col_taps.t[k][j];
      double cx[4];
      for (int k = 0; k < 4; k++) cx[k] = ax.c[k][j];
      int rows[4];
      for (int rk = 0; rk < 4; rk++) {
        const uint8_t* row = src + static_cast<size_t>(rt[rk]) * sstride;
        double acc = cx[0] * row[ct[0]] + cx[1] * row[ct[1]] +
                     cx[2] * row[ct[2]] + cx[3] * row[ct[3]];
        int b = static_cast<int>(std::round(acc));
        rows[rk] = std::min(std::max(b, 0), 255);
      }
      double acc = cy[0] * rows[0] + cy[1] * rows[1] + cy[2] * rows[2] +
                   cy[3] * rows[3];
      int v = static_cast<int>(std::round(acc));
      v = std::min(std::max(v, 0), 255);
      dst[static_cast<size_t>(i) * dst_w + j * out_stride + out_off] =
          static_cast<uint8_t>(v);
    }
  }
}

// AREA downscale plane: coverage-weighted box sum in the reference's tap
// order (y outer, x inner; src/Resize.cu:160-212), weights from the
// periodic pattern rows; `(int)(acc/div)` store (ops/resize.py
// `_area_down_plane`).
void AreaDownPlane(const uint8_t* src, int plane_w, int plane_h,
                   int sstride,
                   const std::vector<int>& y_base, const AreaPattern& py,
                   const std::vector<int>& x_base, const AreaPattern& px,
                   uint8_t* dst, int dst_w, int nrows, int ncols, int stride,
                   int col_off, int out_stride, int out_off, int j_start = 0) {
  for (int i = 0; i < nrows; i++) {
    const float* wy = &py.rows[static_cast<size_t>(i % py.period) * py.taps];
    for (int j = j_start; j < ncols; j++) {
      const float* wx = &px.rows[static_cast<size_t>(j % px.period) * px.taps];
      // nvcc contracts `colorSum += data * weight` (src/Resize.cu:172-173)
      // into a single-rounding FMA per tap; `divide += weight` stays a
      // plain add. This order reproduces the reference's AREA CRC
      // oracles bit-for-bit at fractional ratios where the strictly
      // rounded form deviates.
      float acc = 0.0f, div = 0.0f;
      for (int ti = 0; ti < py.taps; ti++) {
        int row = std::min(y_base[i] + ti, plane_h - 1);
        const uint8_t* srow = src + static_cast<size_t>(row) * sstride;
        for (int tj = 0; tj < px.taps; tj++) {
          int col = std::min(x_base[j] * stride + col_off + tj * stride,
                             plane_w - 1);
          float w2d = wy[ti] * wx[tj];
          div = div + w2d;
          acc = std::fmaf(static_cast<float>(srow[col]), w2d, acc);
        }
      }
      dst[static_cast<size_t>(i) * dst_w + j * out_stride + out_off] =
          static_cast<uint8_t>(static_cast<int>(acc / div));
    }
  }
}

// AREA upscale per-axis base/weight (src/Resize.cu:220-232; ops/resize.py
// `_area_axis_up`): x = floor(ratio*j); w = frac((j+1) - (x+1)/ratio),
// clamped at 0. Plugs into the bilinear blend.
AxisTables BuildAreaUpAxis(int dst_n, int src_n) {
  AxisTables t;
  float ratio = static_cast<float>(src_n) / static_cast<float>(dst_n);
  t.base.resize(dst_n);
  t.w.resize(dst_n);
  t.nearest.resize(dst_n);
  for (int j = 0; j < dst_n; j++) {
    float base = std::floor(ratio * static_cast<float>(j));
    float w = (static_cast<float>(j) + 1.0f) - (base + 1.0f) / ratio;
    w = (w <= 0.0f) ? 0.0f : w - std::floor(w);
    t.base[j] = static_cast<int>(base);
    t.w[j] = w;
    t.nearest[j] = static_cast<int>(ratio * static_cast<float>(j));
  }
  return t;
}

// Cached per-(src,dst) bicubic tables: axis coefficients + column taps
// for all three plane configs (Y full-res; U even / V odd interleaved).
struct BicubicPlan {
  BicubicAxis ax, ay;
  ColTaps y_ct, u_ct, v_ct;
  // SIMD column cutoffs: leading columns whose widest tap keeps the
  // 4-byte gather window inside the row (multiple of 4).
  int vec_y = 0, vec_u = 0, vec_v = 0;
  // Precomputed per-row taps for the SIMD path (4*dh / 4*(dh/2) ints) —
  // fully determined by the plan key, so built once here.
  std::vector<int> rt_y, rt_uv;
};

int BicubicVecCutoff(const ColTaps& ct, int ncols, int src_w) {
  int vec = 0;
  while (vec < ncols && ct.t[0][vec] + 3 < src_w && ct.t[1][vec] + 3 < src_w &&
         ct.t[2][vec] + 3 < src_w && ct.t[3][vec] + 3 < src_w)
    vec++;
  return vec & ~3;
}

const BicubicPlan& GetBicubicPlan(int sw, int sh, int dw, int dh) {
  static std::mutex mu;
  static std::map<std::tuple<int, int, int, int>,
                  std::unique_ptr<BicubicPlan>> cache;
  std::lock_guard<std::mutex> lk(mu);
  auto key = std::make_tuple(sw, sh, dw, dh);
  auto it = cache.find(key);
  if (it == cache.end()) {
    auto plan = std::make_unique<BicubicPlan>();
    plan->ax = BuildBicubicAxis(dw, sw);
    plan->ay = BuildBicubicAxis(dh, sh);
    plan->y_ct = BuildColTaps(plan->ax, dw, 1, 0, 1, sw);
    plan->u_ct = BuildColTaps(plan->ax, dw / 2, 2, 0, 2, sw);
    plan->v_ct = BuildColTaps(plan->ax, dw / 2, 2, 1, 2, sw);
    plan->vec_y = BicubicVecCutoff(plan->y_ct, dw, sw);
    plan->vec_u = BicubicVecCutoff(plan->u_ct, dw / 2, sw);
    plan->vec_v = BicubicVecCutoff(plan->v_ct, dw / 2, sw);
    plan->rt_y.resize(4 * static_cast<size_t>(dh));
    for (int i = 0; i < dh; i++)
      BicubicTaps(plan->ay.base[i], 1, sh, &plan->rt_y[4 * static_cast<size_t>(i)]);
    plan->rt_uv.resize(4 * static_cast<size_t>(dh / 2));
    for (int i = 0; i < dh / 2; i++)
      BicubicTaps(plan->ay.base[i], 1, sh / 2,
                  &plan->rt_uv[4 * static_cast<size_t>(i)]);
    it = cache.emplace(key, std::move(plan)).first;
  }
  return *it->second;
}

void ResizeBicubic(const uint8_t* y, const uint8_t* uv, int sw, int sh,
                   int y_stride, int uv_stride, uint8_t* out_y,
                   uint8_t* out_uv, int dw, int dh) {
  const BicubicPlan& p = GetBicubicPlan(sw, sh, dw, dh);
  int vy = 0, vu = 0, vv = 0;
  if (simd::Available()) {
    vy = p.vec_y;
    vu = p.vec_u;
    vv = p.vec_v;
    const std::vector<int>& rt_y = p.rt_y;
    const std::vector<int>& rt_uv = p.rt_uv;
    simd::BicubicPlane(y, sw, y_stride, rt_y.data(), p.ay.c[0].data(), p.ay.c[1].data(),
                       p.ay.c[2].data(), p.ay.c[3].data(), p.ax.c[0].data(),
                       p.ax.c[1].data(), p.ax.c[2].data(), p.ax.c[3].data(),
                       p.y_ct.t[0].data(), p.y_ct.t[1].data(),
                       p.y_ct.t[2].data(), p.y_ct.t[3].data(), out_y, dw, dh,
                       vy, 1, 0);
    simd::BicubicPlane(uv, sw, uv_stride, rt_uv.data(), p.ay.c[0].data(),
                       p.ay.c[1].data(), p.ay.c[2].data(), p.ay.c[3].data(),
                       p.ax.c[0].data(), p.ax.c[1].data(), p.ax.c[2].data(),
                       p.ax.c[3].data(), p.u_ct.t[0].data(),
                       p.u_ct.t[1].data(), p.u_ct.t[2].data(),
                       p.u_ct.t[3].data(), out_uv, dw, dh / 2, vu, 2, 0);
    simd::BicubicPlane(uv, sw, uv_stride, rt_uv.data(), p.ay.c[0].data(),
                       p.ay.c[1].data(), p.ay.c[2].data(), p.ay.c[3].data(),
                       p.ax.c[0].data(), p.ax.c[1].data(), p.ax.c[2].data(),
                       p.ax.c[3].data(), p.v_ct.t[0].data(),
                       p.v_ct.t[1].data(), p.v_ct.t[2].data(),
                       p.v_ct.t[3].data(), out_uv, dw, dh / 2, vv, 2, 1);
  }
  BicubicPlane(y, sw, y_stride, p.ay, sh, p.ax, dw, p.y_ct, out_y, dw, dh,
               1, 0, vy);
  // UV: rows bounded by the half-height plane; U at even columns
  // (x -> 2x, stride-2 taps), V at odd (ops/resize.py resize_bicubic).
  BicubicPlane(uv, sw, uv_stride, p.ay, sh / 2, p.ax, dw / 2, p.u_ct,
               out_uv, dw, dh / 2, 2, 0, vu);
  BicubicPlane(uv, sw, uv_stride, p.ay, sh / 2, p.ax, dw / 2, p.v_ct,
               out_uv, dw, dh / 2, 2, 1, vv);
}

// Cached per-(src,dst) AREA tables (patterns + bases for downscale, or
// coverage-weight bilinear axes for upscale).
struct AreaPlan {
  bool down = false;
  AreaPattern px, py;
  std::vector<int> xb, yb;
  AxisTables up_x, up_y, up_x_uv, up_y_uv;
  // SIMD support tables (downscale only): transposed expanded column
  // weights [taps][dw] and tap-0 columns for the interleaved U/V planes.
  std::vector<float> wxT;
  std::vector<int> cb_u, cb_v;
};

const AreaPlan& GetAreaPlan(int sw, int sh, int dw, int dh) {
  static std::mutex mu;
  static std::map<std::tuple<int, int, int, int>,
                  std::unique_ptr<AreaPlan>> cache;
  std::lock_guard<std::mutex> lk(mu);
  auto key = std::make_tuple(sw, sh, dw, dh);
  auto it = cache.find(key);
  if (it == cache.end()) {
    auto plan = std::make_unique<AreaPlan>();
    float x_ratio = static_cast<float>(sw) / static_cast<float>(dw);
    float y_ratio = static_cast<float>(sh) / static_cast<float>(dh);
    plan->down = x_ratio > 1.0f && y_ratio > 1.0f;
    if (plan->down) {
      plan->px = BuildAreaPattern(x_ratio);
      plan->py = BuildAreaPattern(y_ratio);
      plan->xb.resize(dw);
      for (int j = 0; j < dw; j++)
        plan->xb[j] = static_cast<int>(x_ratio * static_cast<float>(j));
      plan->yb.resize(dh);
      for (int i = 0; i < dh; i++)
        plan->yb[i] = static_cast<int>(y_ratio * static_cast<float>(i));
      plan->wxT.resize(static_cast<size_t>(plan->px.taps) * dw);
      for (int tj = 0; tj < plan->px.taps; tj++)
        for (int j = 0; j < dw; j++)
          plan->wxT[static_cast<size_t>(tj) * dw + j] =
              plan->px.rows[static_cast<size_t>(j % plan->px.period) *
                                plan->px.taps + tj];
      plan->cb_u.resize(dw / 2);
      plan->cb_v.resize(dw / 2);
      for (int j = 0; j < dw / 2; j++) {
        plan->cb_u[j] = 2 * plan->xb[j];
        plan->cb_v[j] = 2 * plan->xb[j] + 1;
      }
    } else {
      plan->up_x = BuildAreaUpAxis(dw, sw);
      plan->up_y = BuildAreaUpAxis(dh, sh);
      plan->up_x_uv = plan->up_x;
      plan->up_x_uv.base.resize(dw / 2);
      plan->up_x_uv.w.resize(dw / 2);
      plan->up_y_uv = plan->up_y;
      plan->up_y_uv.base.resize(dh / 2);
      plan->up_y_uv.w.resize(dh / 2);
    }
    it = cache.emplace(key, std::move(plan)).first;
  }
  return *it->second;
}

void ResizeArea(const uint8_t* y, const uint8_t* uv, int sw, int sh,
                int y_stride, int uv_stride, uint8_t* out_y,
                uint8_t* out_uv, int dw, int dh) {
  const AreaPlan& p = GetAreaPlan(sw, sh, dw, dh);
  if (p.down) {
    int vy = 0, vu = 0, vv = 0;
    if (simd::Available()) {
      // Vector lanes skip the right-edge tap clamp and gather 4-byte
      // windows, so they stop where the widest tap window would touch
      // the row end; the scalar tail (j_start below) finishes the rest.
      int reach = (p.px.taps - 1);
      vy = dw;
      while (vy > 0 && p.xb[vy - 1] + reach + 3 >= sw) vy--;
      vy &= ~7;
      vu = dw / 2;
      while (vu > 0 && p.cb_u[vu - 1] + 2 * reach + 3 >= sw) vu--;
      vu &= ~7;
      vv = dw / 2;
      while (vv > 0 && p.cb_v[vv - 1] + 2 * reach + 3 >= sw) vv--;
      vv &= ~7;
      simd::AreaDown(y, sw, sh, y_stride, p.yb.data(), p.py.rows.data(), p.py.period,
                     p.py.taps, p.xb.data(), p.wxT.data(), dw, p.px.taps, 1,
                     out_y, dw, dh, vy, 1, 0);
      simd::AreaDown(uv, sw, sh / 2, uv_stride, p.yb.data(),
                     p.py.rows.data(), p.py.period, p.py.taps,
                     p.cb_u.data(), p.wxT.data(), dw, p.px.taps, 2, out_uv,
                     dw, dh / 2, vu, 2, 0);
      simd::AreaDown(uv, sw, sh / 2, uv_stride, p.yb.data(),
                     p.py.rows.data(), p.py.period, p.py.taps,
                     p.cb_v.data(), p.wxT.data(), dw, p.px.taps, 2, out_uv,
                     dw, dh / 2, vv, 2, 1);
    }
    AreaDownPlane(y, sw, sh, y_stride, p.yb, p.py, p.xb, p.px, out_y, dw,
                  dh, dw, 1, 0, 1, 0, vy);
    AreaDownPlane(uv, sw, sh / 2, uv_stride, p.yb, p.py, p.xb, p.px,
                  out_uv, dw, dh / 2, dw / 2, 2, 0, 2, 0, vu);
    AreaDownPlane(uv, sw, sh / 2, uv_stride, p.yb, p.py, p.xb, p.px,
                  out_uv, dw, dh / 2, dw / 2, 2, 1, 2, 1, vv);
    return;
  }
  // Upscale: bilinear blend with coverage-derived weights.
  BilinearY(y, sw, sh, y_stride, out_y, dw, dh, p.up_x, p.up_y);
  BilinearUV(uv, sw, sh / 2, uv_stride, out_uv, dw, dh / 2, p.up_x_uv,
             p.up_y_uv);
}

void NearestY(const uint8_t* src, int sstride, uint8_t* dst, int dw, int dh,
              const AxisTables& ax, const AxisTables& ay) {
  for (int i = 0; i < dh; i++) {
    const uint8_t* row = src + static_cast<size_t>(ay.nearest[i]) * sstride;
    uint8_t* out = dst + static_cast<size_t>(i) * dw;
    for (int j = 0; j < dw; j++) out[j] = row[ax.nearest[j]];
  }
}

void NearestUV(const uint8_t* src, int sstride, uint8_t* dst, int dw,
               int dh2, const AxisTables& ax, const AxisTables& ay) {
  for (int i = 0; i < dh2; i++) {
    const uint8_t* row = src + static_cast<size_t>(ay.nearest[i]) * sstride;
    uint8_t* out = dst + static_cast<size_t>(i) * dw;
    for (int j = 0; j < dw / 2; j++) {
      out[2 * j] = row[2 * ax.nearest[j]];
      out[2 * j + 1] = row[2 * ax.nearest[j] + 1];
    }
  }
}

}  // namespace

void ResizeNV12HostStrided(const uint8_t* y, int y_stride, const uint8_t* uv,
                           int uv_stride, int sw, int sh, uint8_t* out_y,
                           uint8_t* out_uv, int dw, int dh,
                           HostResizeAlgo algo) {
  if (sw == dw && sh == dh) {
    for (int i = 0; i < sh; i++)
      std::memcpy(out_y + static_cast<size_t>(i) * sw,
                  y + static_cast<size_t>(i) * y_stride, sw);
    for (int i = 0; i < sh / 2; i++)
      std::memcpy(out_uv + static_cast<size_t>(i) * sw,
                  uv + static_cast<size_t>(i) * uv_stride, sw);
    return;
  }
  if (algo == HOST_RESIZE_BICUBIC) {
    ResizeBicubic(y, uv, sw, sh, y_stride, uv_stride, out_y, out_uv, dw, dh);
    return;
  }
  if (algo == HOST_RESIZE_AREA) {
    ResizeArea(y, uv, sw, sh, y_stride, uv_stride, out_y, out_uv, dw, dh);
    return;
  }
  const ResizePlan& plan = GetPlan(sw, sh, dw, dh);
  if (algo == HOST_RESIZE_BILINEAR) {
    BilinearY(y, sw, sh, y_stride, out_y, dw, dh, plan.x, plan.y);
    BilinearUV(uv, sw, sh / 2, uv_stride, out_uv, dw, dh / 2, plan.x_uv,
               plan.y_uv);
  } else {
    NearestY(y, y_stride, out_y, dw, dh, plan.x, plan.y);
    NearestUV(uv, uv_stride, out_uv, dw, dh / 2, plan.x_uv, plan.y_uv);
  }
}

void ResizeNV12Host(const uint8_t* y, const uint8_t* uv, int sw, int sh,
                    uint8_t* out_y, uint8_t* out_uv, int dw, int dh,
                    HostResizeAlgo algo) {
  ResizeNV12HostStrided(y, sw, uv, sw, sw, sh, out_y, out_uv, dw, dh, algo);
}

}  // namespace ts

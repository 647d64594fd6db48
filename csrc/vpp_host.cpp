#include "vpp_host.h"

#include <cmath>
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
    float f = (static_cast<float>(j) + 0.5f) * ratio - 0.5f;
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

// 4-tap blend in the reference's exact f32 expression order
// (src/Resize.cu:5-25 via ops/resize.py `_bilinear_plane`):
// (int)(a(1-wx)(1-wy) + b wx (1-wy) + c wy (1-wx) + d (wx wy)).
inline uint8_t Blend4(float a, float b, float c, float d, float wx, float wy) {
  float v = a * (1.0f - wx) * (1.0f - wy) + b * wx * (1.0f - wy) +
            c * wy * (1.0f - wx) + d * (wx * wy);
  return static_cast<uint8_t>(static_cast<int>(v));
}

void BilinearY(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
               int dh, const AxisTables& ax, const AxisTables& ay) {
  for (int i = 0; i < dh; i++) {
    int ra = ay.base[i];
    int rc = (ra + 1 >= sh) ? ra : ra + 1;  // +y tap collapses at border
    float wy = ay.w[i];
    const uint8_t* row_a = src + static_cast<size_t>(ra) * sw;
    const uint8_t* row_c = src + static_cast<size_t>(rc) * sw;
    uint8_t* out = dst + static_cast<size_t>(i) * dw;
    for (int j = 0; j < dw; j++) {
      int ca = ax.base[j];
      int cb = (ca + 1 >= sw) ? ca : ca + 1;
      out[j] = Blend4(row_a[ca], row_a[cb], row_c[ca], row_c[cb],
                      ax.w[j], wy);
    }
  }
}

// Interleaved UV: U at even columns (x -> 2x, step 2), V at odd
// (x -> 2x+1), half height (src/Resize.cu:235-238, 307-310).
void BilinearUV(const uint8_t* src, int sw, int sh2, uint8_t* dst, int dw,
                int dh2, const AxisTables& ax, const AxisTables& ay) {
  for (int i = 0; i < dh2; i++) {
    int ra = ay.base[i];
    int rc = (ra + 1 >= sh2) ? ra : ra + 1;
    float wy = ay.w[i];
    const uint8_t* row_a = src + static_cast<size_t>(ra) * sw;
    const uint8_t* row_c = src + static_cast<size_t>(rc) * sw;
    uint8_t* out = dst + static_cast<size_t>(i) * dw;
    for (int j = 0; j < dw / 2; j++) {
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

void NearestY(const uint8_t* src, int sw, uint8_t* dst, int dw, int dh,
              const AxisTables& ax, const AxisTables& ay) {
  for (int i = 0; i < dh; i++) {
    const uint8_t* row = src + static_cast<size_t>(ay.nearest[i]) * sw;
    uint8_t* out = dst + static_cast<size_t>(i) * dw;
    for (int j = 0; j < dw; j++) out[j] = row[ax.nearest[j]];
  }
}

void NearestUV(const uint8_t* src, int sw, uint8_t* dst, int dw, int dh2,
               const AxisTables& ax, const AxisTables& ay) {
  for (int i = 0; i < dh2; i++) {
    const uint8_t* row = src + static_cast<size_t>(ay.nearest[i]) * sw;
    uint8_t* out = dst + static_cast<size_t>(i) * dw;
    for (int j = 0; j < dw / 2; j++) {
      out[2 * j] = row[2 * ax.nearest[j]];
      out[2 * j + 1] = row[2 * ax.nearest[j] + 1];
    }
  }
}

}  // namespace

void ResizeNV12Host(const uint8_t* y, const uint8_t* uv, int sw, int sh,
                    uint8_t* out_y, uint8_t* out_uv, int dw, int dh,
                    HostResizeAlgo algo) {
  if (sw == dw && sh == dh) {
    std::memcpy(out_y, y, static_cast<size_t>(sw) * sh);
    std::memcpy(out_uv, uv, static_cast<size_t>(sw) * (sh / 2));
    return;
  }
  const ResizePlan& plan = GetPlan(sw, sh, dw, dh);
  if (algo == HOST_RESIZE_BILINEAR) {
    BilinearY(y, sw, sh, out_y, dw, dh, plan.x, plan.y);
    BilinearUV(uv, sw, sh / 2, out_uv, dw, dh / 2, plan.x_uv, plan.y_uv);
  } else {
    NearestY(y, sw, out_y, dw, dh, plan.x, plan.y);
    NearestUV(uv, sw, out_uv, dw, dh / 2, plan.x_uv, plan.y_uv);
  }
}

}  // namespace ts

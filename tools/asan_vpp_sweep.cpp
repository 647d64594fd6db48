// ASan/UBSan sweep of the native host VPP: every resize algorithm,
// color conversion, planes layout, normalization mode, and color
// standard across a grid of awkward geometries (tiny, odd-ish, prime,
// extreme aspect ratios) — the SIMD tails, tap-window cutoffs, and
// two-pass chains must stay in bounds everywhere. Build via `make fuzz`
// (same sanitizer flags); runs in a few seconds.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "../csrc/vpp_convert.h"
#include "../csrc/vpp_host.h"

namespace {

uint64_t g_state = 0x243F6A8885A308D3ull;
uint64_t next_rand() {
  g_state ^= g_state << 13;
  g_state ^= g_state >> 7;
  g_state ^= g_state << 17;
  return g_state;
}

}  // namespace

int main() {
  // Even dimensions only (NV12 domain contract, enforced upstream).
  const int sizes[][2] = {{2, 2},     {6, 4},    {8, 8},     {10, 6},
                          {34, 18},   {126, 62}, {130, 66},  {222, 130},
                          {640, 4},   {4, 640},  {1920, 2},  {2, 1080},
                          {322, 242}, {638, 358}};
  const int n_sizes = sizeof(sizes) / sizeof(sizes[0]);
  long runs = 0;
  for (int si = 0; si < n_sizes; si++) {
    int sw = sizes[si][0], sh = sizes[si][1];
    std::vector<uint8_t> y(static_cast<size_t>(sw) * sh);
    std::vector<uint8_t> uv(static_cast<size_t>(sw) * (sh / 2));
    for (auto& b : y) b = static_cast<uint8_t>(next_rand());
    for (auto& b : uv) b = static_cast<uint8_t>(next_rand());
    for (int di = 0; di < n_sizes; di++) {
      int dw = sizes[di][0], dh = sizes[di][1];
      std::vector<uint8_t> out_y(static_cast<size_t>(dw) * dh);
      std::vector<uint8_t> out_uv(static_cast<size_t>(dw) * (dh / 2));
      for (int algo = 0; algo < 4; algo++) {
        ts::ResizeNV12Host(y.data(), uv.data(), sw, sh, out_y.data(),
                           out_uv.data(), dw, dh,
                           static_cast<ts::HostResizeAlgo>(algo));
        runs++;
      }
    }
    // Full conversion chain: all FourCCs x planes x normalization x
    // standards, each in three geometric modes — native size, cropped
    // (random even-aligned box), and crop+resize — so the crop offset
    // math and the resized-intermediate hand-off are swept too.
    for (int fourcc = 0; fourcc < 7; fourcc++) {
      for (int planes = 0; planes < 2; planes++) {
        for (int norm = 0; norm < 2; norm++) {
          for (int std_ = 0; std_ < 4; std_++) {
            for (int mode = 0; mode < 3; mode++) {
              ts::HostVppParams p;
              p.fourcc = fourcc;
              p.planes = planes;
              p.normalization = norm != 0;
              p.standard = std_;
              if (mode >= 1 && sw >= 8 && sh >= 8) {
                // Even-aligned crop box strictly inside the frame.
                p.crop_left = static_cast<int>(next_rand() % (sw / 4)) & ~1;
                p.crop_top = static_cast<int>(next_rand() % (sh / 4)) & ~1;
                p.crop_right =
                    sw - (static_cast<int>(next_rand() % (sw / 4)) & ~1);
                p.crop_bottom =
                    sh - (static_cast<int>(next_rand() % (sh / 4)) & ~1);
              }
              if (mode == 2) {
                p.dst_width = sizes[next_rand() % n_sizes][0];
                p.dst_height = sizes[next_rand() % n_sizes][1];
                p.resize_algo =
                    static_cast<ts::HostResizeAlgo>(next_rand() % 4);
              }
              int out_w = 0, out_h = 0;
              ts::VppOutputSize(sw, sh, p, &out_w, &out_h);
              size_t elems = ts::ConvertedElements(out_w, out_h, p.fourcc);
              if (ts::ConvertedIsFloat(p.fourcc, p.normalization)) {
                std::vector<float> out(elems);
                if (ts::VppConvertHost(y.data(), uv.data(), sw, sh, p,
                                       out.data()) == 0)
                  runs++;
              } else {
                std::vector<uint8_t> out(elems);
                if (ts::VppConvertHost(y.data(), uv.data(), sw, sh, p,
                                       out.data()) == 0)
                  runs++;
              }
            }
          }
        }
      }
    }
  }
  std::printf("vpp sweep: %ld clean runs\n", runs);
  return 0;
}

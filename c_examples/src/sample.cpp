// C++ consumer of the native ingest runtime — the counterpart of the
// reference's C++-only sample (reference: c_examples/src/Sample.cpp).
//
// The reference's C++ consumer drove the whole CUDA VPP from C++; here the
// VPP lives on the TPU behind JAX, so the C++ surface ends at the NV12
// handoff: this sample starts a pipeline, reads frames as tightly-packed
// NV12, optionally applies the native host resize, and appends the raw
// planes to a dump file (playable with ffplay -f rawvideo -pix_fmt nv12).
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "../../csrc/pipeline.h"
#include "../../csrc/ts_common.h"
#include "../../csrc/vpp_host.h"

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: %s <input.(h264|mp4|rtmp://...)> [frames=10] "
                 "[dump=out.nv12] [dst_w dst_h]\n",
                 argv[0]);
    return 1;
  }
  const std::string input = argv[1];
  const int frames = argc > 2 ? std::atoi(argv[2]) : 10;
  const std::string dump_name = argc > 3 ? argv[3] : "";
  const int dst_w = argc > 5 ? std::atoi(argv[4]) : 0;
  const int dst_h = argc > 5 ? std::atoi(argv[5]) : 0;

  ts::PipelineParams params;
  params.input = input;
  params.framerate_mode = ts::FR_FAST;
  params.buffer_size = 10;

  ts::Pipeline pipeline;
  pipeline.enableLogs(-ts::LOG_MEDIUM);  // negative level -> console
  if (pipeline.Init(params) != ts::TS_OK) {
    std::fprintf(stderr, "failed to open %s\n", input.c_str());
    return 1;
  }
  pipeline.Start();

  const int w = pipeline.width(), h = pipeline.height();
  std::printf("stream: %dx%d @ %d/%d fps\n", w, h, pipeline.fpsNum(),
              pipeline.fpsDen());
  std::vector<uint8_t> y(static_cast<size_t>(w) * h);
  std::vector<uint8_t> uv(static_cast<size_t>(w) * (h / 2));
  const int ow = dst_w ? dst_w : w, oh = dst_h ? dst_h : h;
  std::vector<uint8_t> ry(static_cast<size_t>(ow) * oh);
  std::vector<uint8_t> ruv(static_cast<size_t>(ow) * (oh / 2));

  FILE* dump = dump_name.empty() ? nullptr : std::fopen(dump_name.c_str(), "wb");
  for (int i = 0; i < frames; i++) {
    int index = pipeline.GetFrame("sample", 0, y.data(), uv.data());
    if (index == ts::TS_FINISHED) {
      std::printf("decoding finished after %d frames\n", i);
      break;
    }
    if (index < 0) {
      std::fprintf(stderr, "read error %d\n", index);
      break;
    }
    ts::ResizeNV12Host(y.data(), uv.data(), w, h, ry.data(), ruv.data(), ow,
                       oh, ts::HOST_RESIZE_BILINEAR);
    std::printf("frame %d\n", index);
    if (dump) {
      std::fwrite(ry.data(), 1, ry.size(), dump);
      std::fwrite(ruv.data(), 1, ruv.size(), dump);
    }
  }
  if (dump) std::fclose(dump);
  pipeline.Stop();
  return 0;
}

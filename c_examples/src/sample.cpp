// C++ consumer of the native runtime — the counterpart of the reference's
// C++-only sample (reference: c_examples/src/Sample.cpp), using the
// ts::TensorStream twin class: initPipeline, startProcessing on its
// producer thread, then getFrame<T> runs the full host VPP chain
// (crop -> NV12-domain resize -> color conversion -> normalization), the
// same stages the reference's sample drove through CUDA kernels. The host
// VPP is validated against the same CRC/raster oracles as the TPU path
// (tests/test_native_convert.py), so the bytes dumped here match both.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <stdexcept>
#include <string>

#include "../../csrc/tensor_stream.h"

static ts::ConvFourCC parseFourCC(const std::string& s) {
  if (s == "Y800") return ts::FCC_Y800;
  if (s == "BGR24") return ts::FCC_BGR24;
  if (s == "NV12") return ts::FCC_NV12;
  if (s == "UYVY") return ts::FCC_UYVY;
  if (s == "YUV444") return ts::FCC_YUV444;
  if (s == "HSV") return ts::FCC_HSV;
  return ts::FCC_RGB24;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: %s <input.(h264|mp4|rtmp://...)> [frames=10] "
                 "[dump-name (writes <name>.yuv)] [fourcc=RGB24] "
                 "[dst_w dst_h]\n",
                 argv[0]);
    return 1;
  }
  const std::string input = argv[1];
  const int frames = argc > 2 ? std::atoi(argv[2]) : 10;
  const std::string dump_name = argc > 3 ? argv[3] : "";
  const ts::ConvFourCC fourcc = parseFourCC(argc > 4 ? argv[4] : "RGB24");
  const int dst_w = argc > 6 ? std::atoi(argv[5]) : 0;
  const int dst_h = argc > 6 ? std::atoi(argv[6]) : 0;

  ts::TensorStream reader;
  reader.enableLogs(-ts::LOG_MEDIUM);  // negative level -> console
  // BLOCKING: the producer lock-steps with this consumer from frame 1,
  // so the dump is deterministic regardless of host load (FAST lets a
  // fast producer run ahead before the first read registers).
  if (reader.initPipeline(input, /*max_consumers=*/5, /*buffer_size=*/10,
                          ts::FR_BLOCKING) != ts::TS_OK) {
    std::fprintf(stderr, "failed to open %s\n", input.c_str());
    return 1;
  }
  int w = 0, h = 0, fps_num = 0, fps_den = 1;
  reader.getInitializedParams(&w, &h, &fps_num, &fps_den);
  std::printf("stream: %dx%d @ %d/%d fps\n", w, h, fps_num, fps_den);
  reader.startProcessing();

  ts::FrameParameters params;
  params.resize.width = dst_w;
  params.resize.height = dst_h;
  params.resize.type = ts::HOST_RESIZE_BILINEAR;
  params.color.dstFourCC = fourcc;
  params.color.planesPos = ts::PLANES_MERGED;

  // HSV is float-only (normalization forced); everything else here is u8.
  const bool as_float = ts::ConvertedIsFloat(fourcc, false);
  for (int i = 0; i < frames; i++) {
    try {
      if (as_float) {
        auto [data, index] = reader.getFrame<float>("sample", 0, params);
        std::printf("frame %d (%zu floats)\n", index, data.size());
        if (!dump_name.empty()) reader.dumpFrame(data, dump_name);
      } else {
        auto [data, index] = reader.getFrame<uint8_t>("sample", 0, params);
        std::printf("frame %d (%zu bytes)\n", index, data.size());
        if (!dump_name.empty()) reader.dumpFrame(data, dump_name);
      }
    } catch (const std::runtime_error& e) {
      std::printf("%s after %d frames\n", e.what(), i);
      break;
    }
  }
  reader.endProcessing();
  return 0;
}

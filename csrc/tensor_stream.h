// C++ consumer twin of the Python API — the counterpart of the
// reference's C++-only TensorStream class (reference:
// include/Wrappers/WrapperC.h:16-100, src/Wrappers/WrapperC.cpp).
//
// Where the reference's getFrame<T> returned CUDA device pointers from its
// VPP kernels, this class returns host buffers from the native host VPP
// (csrc/vpp_convert.cpp — validated against the same CRC/raster oracles as
// the device path). The pipeline/pacing/consumer semantics are the shared
// ts::Pipeline. Header-only.
#pragma once

#include <cstdio>
#include <stdexcept>
#include <string>
#include <type_traits>
#include <vector>

#include "pipeline.h"
#include "vpp_convert.h"

namespace ts {

// Per-read parameter struct mirroring the reference's FrameParameters
// (include/VideoProcessor.h:39-105): zero width/height = native size,
// zero crop box = off, HSV forces normalization.
struct CropOptions {
  int left = 0, top = 0, right = 0, bottom = 0;
};

struct ResizeOptions {
  int width = 0, height = 0;
  HostResizeAlgo type = HOST_RESIZE_NEAREST;
};

struct ColorOptions {
  ConvFourCC dstFourCC = FCC_RGB24;
  ConvPlanes planesPos = PLANES_MERGED;
  bool normalization = false;
  // TPU extension: 0 = BT601 (the reference's exact constants),
  // 1 = BT709 for HD-mastered content.
  int standard = 0;
};

struct FrameParameters {
  ResizeOptions resize;
  ColorOptions color;
  CropOptions crop;
};

class TensorStream {
 public:
  int initPipeline(const std::string& url, int max_consumers = 5,
                   int buffer_size = 10, int framerate_mode = FR_NATIVE) {
    PipelineParams params;
    params.input = url;
    params.max_consumers = max_consumers;
    params.buffer_size = buffer_size;
    params.framerate_mode = framerate_mode;
    return pipeline_.Init(params);
  }

  // (width, height, fps_num, fps_den) — reference getInitializedParams
  // (WrapperC.cpp:93-101).
  void getInitializedParams(int* width, int* height, int* fps_num,
                            int* fps_den) {
    if (width) *width = pipeline_.width();
    if (height) *height = pipeline_.height();
    if (fps_num) *fps_num = pipeline_.fpsNum();
    if (fps_den) *fps_den = pipeline_.fpsDen();
  }

  int startProcessing() { return pipeline_.Start(); }
  // CloseLevel kept for surface parity (reference: Common.h:39-43);
  // HARD vs SOFT only differed in whether the log-file handler closed,
  // and here the Logger owns its file for the object's lifetime, so
  // both levels behave like the reference's SOFT.
  void endProcessing(int /*close_level*/ = 1) { pipeline_.Stop(); }
  void enableLogs(int level) { pipeline_.enableLogs(level); }
  void skipAnalyzeStage() { pipeline_.skipAnalyze(); }
  // Process-global read timeout in ms, exactly like the reference's
  // timeoutFrame global (WrapperC.cpp:107-113, src/Common.cpp:4).
  void setTimeout(int timeout_ms) { g_timeout_ms.store(timeout_ms); }
  int getTimeout() const { return g_timeout_ms.load(); }
  // Per-frame real-time delay in ms (reference: WrapperC.cpp:387-389).
  int getDelay() const { return pipeline_.realTimeDelayMs(); }

  // Reads the (latest + index) frame for `consumer` and runs the full
  // host VPP chain. T is uint8_t or float and must agree with
  // ConvertedIsFloat(fourcc, normalization) — mismatches throw, where the
  // reference's template silently reinterpreted. Returns the converted
  // buffer and the absolute frame index; throws std::runtime_error
  // ("Decoding finished") after EOF/stop like the reference
  // (Decoder.cpp:113-114).
  template <typename T>
  std::pair<std::vector<T>, int> getFrame(const std::string& consumer,
                                          int index,
                                          const FrameParameters& params) {
    static_assert(std::is_same<T, uint8_t>::value ||
                      std::is_same<T, float>::value,
                  "getFrame<T>: T must be uint8_t or float");
    const bool want_float =
        ConvertedIsFloat(params.color.dstFourCC, params.color.normalization);
    if (want_float != std::is_same<T, float>::value)
      throw std::runtime_error("getFrame<T>: T does not match the output "
                               "element type for these FrameParameters");
    HostVppParams p = toHostParams(params);
    if (p.standard < 0) p.standard = pipeline_.detectedStandard();  // AUTO
    // Size staging/output for this consumer's acknowledged geometry; on
    // a mid-stream resolution switch, acknowledge once and retry (the
    // C++ twin renegotiates internally — callers just observe the new
    // output dimensions).
    for (int attempt = 0; attempt < 4; attempt++) {
      int src_w = 0, src_h = 0;
      pipeline_.consumerDims(consumer, &src_w, &src_h);
      int out_w = 0, out_h = 0;
      VppOutputSize(src_w, src_h, p, &out_w, &out_h);
      std::vector<T> out(ConvertedElements(out_w, out_h, p.fourcc));
      std::vector<uint8_t> y(static_cast<size_t>(src_w) * src_h);
      std::vector<uint8_t> uv(y.size() / 2);
      int idx = pipeline_.GetFrame(consumer, index, y.data(), uv.data());
      if (idx == TS_RENEGOTIATE) {
        pipeline_.ackRenegotiate(consumer, nullptr, nullptr);
        continue;
      }
      if (idx == TS_FINISHED) throw std::runtime_error("Decoding finished");
      if (idx < 0) throw std::runtime_error("getFrame failed");
      if (VppConvertHost(y.data(), uv.data(), src_w, src_h, p, out.data()) !=
          0)
        throw std::runtime_error("invalid FrameParameters");
      return {std::move(out), idx};
    }
    throw std::runtime_error("geometry renegotiation did not settle");
  }

  // Appends the raw converted buffer to <name>.yuv, like the reference's
  // dumpFrame (WrapperC.cpp:371-385).
  template <typename T>
  void dumpFrame(const std::vector<T>& data, const std::string& name) {
    std::string fname = name + ".yuv";
    FILE* f = std::fopen(fname.c_str(), "ab");
    if (!f) throw std::runtime_error("cannot open " + fname);
    std::fwrite(data.data(), sizeof(T), data.size(), f);
    std::fclose(f);
  }

  Pipeline& pipeline() { return pipeline_; }

 private:
  static HostVppParams toHostParams(const FrameParameters& params) {
    HostVppParams p;
    p.crop_left = params.crop.left;
    p.crop_top = params.crop.top;
    p.crop_right = params.crop.right;
    p.crop_bottom = params.crop.bottom;
    p.dst_width = params.resize.width;
    p.dst_height = params.resize.height;
    p.resize_algo = params.resize.type;
    p.fourcc = params.color.dstFourCC;
    p.planes = params.color.planesPos;
    p.normalization = params.color.normalization;
    p.standard = params.color.standard;
    return p;
  }

  Pipeline pipeline_;
};

}  // namespace ts

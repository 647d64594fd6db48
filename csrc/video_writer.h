// Programmatic video writer: RGB24/NV12 frames -> encoded container
// (mp4/mkv/flv inferred from the path, libx264 by default).
//
// The reference styled-video path piped raw RGB into an external ffmpeg
// process (python_examples/fast_neural_style/ffmpeg_video_writer.py:5-69,
// h264_nvenc); the TPU-native runtime encodes in-process through
// libavcodec instead — no subprocess, no GPU encoder dependency, and the
// same libav stack the ingest side already links.
#pragma once

#include <string>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libswscale/swscale.h>
}

#include "ts_common.h"

namespace ts {

struct WriterParams {
  std::string path;
  int width = 0, height = 0;
  int fps_num = 30, fps_den = 1;
  std::string codec = "libx264";  // encoder name
  int bitrate = 2'000'000;        // bits/s (reference default 2000k)
  int gop = 60;                   // keyframe interval (frames)
};

class VideoWriter {
 public:
  ~VideoWriter() { Close(); }

  int Init(const WriterParams& params);
  // Writes one tightly-packed RGB24 frame (h x w x 3).
  int WriteRGB(const uint8_t* rgb);
  // Writes one tightly-packed NV12 frame.
  int WriteNV12(const uint8_t* y, const uint8_t* uv);
  // Flushes the encoder and finalizes the container. Idempotent.
  int Close();
  int64_t framesWritten() const { return n_in_; }

 private:
  int encodeFrame(AVFrame* frame);

  WriterParams params_;
  AVFormatContext* fmt_ = nullptr;
  AVCodecContext* ctx_ = nullptr;
  AVStream* stream_ = nullptr;
  AVFrame* frame_ = nullptr;
  AVPacket* pkt_ = nullptr;
  SwsContext* sws_ = nullptr;
  int64_t n_in_ = 0;
  bool open_ = false;
  bool header_ = false;
};

}  // namespace ts

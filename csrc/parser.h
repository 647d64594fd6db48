// Demuxer: network/file ingest -> one-deep video packet handoff.
//
// Behavior-compatible re-design of the reference's Parser
// (reference: src/Parser.cpp:311-465, include/Parser.h:70-175): FFmpeg
// avformat open with rtsp-over-tcp, optional demuxer-buffer drop
// (NATIVE_LOW_DELAY), interrupt-callback read timeout against the
// process-global g_timeout_ms, h264_mp4toannexb BSF for the analyzer, and
// optional bitstream dump.
#pragma once

#include <chrono>
#include <memory>
#include <string>
#include <utility>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavcodec/bsf.h>
#include <libavformat/avformat.h>
}

#include "analyzer.h"
#include "av1_analyzer.h"
#include "hevc_analyzer.h"
#include "ts_common.h"
#include "vp9_analyzer.h"

namespace ts {

struct ParserParams {
  std::string input;
  bool keep_buffer = true;
  bool enable_dumps = false;
  bool loop = false;  // seek back to the start on EOF (bench/replay mode)
  // Extra avformat open options (key, value) — e.g. rtsp_flags=listen
  // for listen-mode ingest, listen_timeout, probesize. Applied on top
  // of the defaults (which they may override). The reference hardcoded
  // its one option (rtsp_transport=tcp, src/Parser.cpp:317-328).
  std::vector<std::pair<std::string, std::string>> format_opts;
};

class Parser {
 public:
  ~Parser() { Close(); }

  int Init(const ParserParams& params, std::shared_ptr<Logger> logger);
  // Reads the next *video* packet from the container (skips other
  // streams). Returns TS_OK, AVERROR(EAGAIN), TS_TIMEOUT or TS_EOF.
  int Read();
  // Hands the buffered packet to the caller (one-deep, taken-flag).
  int Get(AVPacket* output);
  // Runs the annexb BSF over `pkt` (H.264/HEVC) and the codec's health
  // analyzer (H.264, HEVC, VP9 or AV1). Returns an AnalyzeErrors bitmask
  // or TS_REPEAT.
  int Analyze(const AVPacket* pkt);
  void Close();
  // Close + re-Init with the stored parameters (live-source reconnect).
  int Reopen();

  int width() const;
  int height() const;
  int videoIndex() const { return video_index_; }
  AVStream* stream() const { return video_stream_; }
  const AVCodecParameters* codecpar() const;
  AVRational frameRate() const;
  AVRational guessedFrameRate() const;
  AVRational timeBase() const;
  int64_t framesRead() const { return frames_read_; }
  // Container seek to `ts` (stream time_base ticks), landing on the
  // nearest keyframe at or before it. Raw elementary streams have no
  // index; callers fall back to decode-and-discard when this fails.
  int Seek(int64_t ts);
  // First packet timestamp of the video stream (0 when unknown).
  int64_t startTime() const;
  // True when the demuxer runs with its internal buffering enabled
  // (NATIVE_LOW_DELAY clears it via AVFMT_FLAG_NOBUFFER).
  bool keepsBuffer() const {
    return fmt_ ? !(fmt_->flags & AVFMT_FLAG_NOBUFFER) : params_.keep_buffer;
  }
  // Optional liveness flag consulted by the interrupt callback: when it
  // reads false, any blocking avformat call aborts. Lets the pipeline's
  // Stop() interrupt a reconnect-time avformat_open_input.
  void setKeepRunningFlag(const std::atomic<bool>* flag) {
    keep_running_ = flag;
  }

 private:
  static int interruptCallback(void* opaque);

  ParserParams params_;
  std::shared_ptr<Logger> logger_;
  AVFormatContext* fmt_ = nullptr;
  AVFormatContext* dump_ctx_ = nullptr;
  AVBSFContext* bsf_ = nullptr;
  AVPacket* last_ = nullptr;
  bool last_taken_ = true;
  AVPacket* annexb_ = nullptr;
  int video_index_ = -1;
  AVStream* video_stream_ = nullptr;
  H264Analyzer analyzer_;
  HEVCAnalyzer hevc_analyzer_;
  VP9Analyzer vp9_analyzer_;
  AV1Analyzer av1_analyzer_;
  bool is_h264_ = false;
  bool is_hevc_ = false;
  bool is_vp9_ = false;
  bool is_av1_ = false;
  int64_t frames_read_ = 0;
  bool closed_ = true;
  bool dump_header_written_ = false;
  // Cached stream geometry: written during Init, NOT cleared by Close,
  // so the lock-free width()/height() accessors stay valid while a
  // reconnect tears down and rebuilds the AVFormatContext.
  std::atomic<int> width_{0}, height_{0};
  const std::atomic<bool>* keep_running_ = nullptr;
  std::chrono::steady_clock::time_point last_packet_time_;
};

}  // namespace ts

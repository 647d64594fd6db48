// GOP/segment-parallel decode for seekable sources (TPU extension).
//
// The reference's only decode-scaling axis was NVDEC hardware; the
// software-decode twin here scales with host cores instead: the file is
// keyframe-split into closed-GOP segments (IDR-delimited for H.264/HEVC,
// keyframe-delimited for VP9/AV1 — reference keyframe semantics:
// src/Parser.cpp:146-293 analyzer, src/Decoder.cpp:97-131 ring), N
// workers decode disjoint segment chunks with independent demuxer+codec
// instances, and the results stitch bit-exactly into the serial frame
// order through a bounded ordered deposit window (same back-pressure
// contract as the serial ring's cursor path, csrc/decoder.cpp).
//
// Correctness rests on the split points: an IDR clears the DPB, so a
// segment decoded from a cold codec yields the same pixels as the serial
// decode of those frames; the scan refuses to split at non-IDR
// "keyframes" (H.264 NAL 5 / HEVC NAL 19-20 checked via the annexb BSF),
// falling back to longer segments.
#pragma once

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libswscale/swscale.h>
}

#include "ts_common.h"
#include "vpp_host.h"

namespace ts {

struct SegmentedParams {
  std::string input;
  int workers = 2;
  int window = 64;        // ordered deposit window (frames)
  bool loop = false;
  int decode_threads = 1; // per worker; parallelism comes from workers
  bool fast_decode = false;
  int chunk_frames = 48;  // merge adjacent segments up to ~this many
                          // frames per task (amortizes seek + flush)
  // Optional per-slot host resize (the FrameLoader(host_resize=True)
  // configuration): 0 = deposit native NV12.
  int dst_width = 0, dst_height = 0;
  int resize_algo = HOST_RESIZE_BILINEAR;
};

// One decode task: a run of whole segments starting at a keyframe.
struct SegmentChunk {
  int64_t byte_pos = -1;   // pkt->pos of the first (key) packet
  int64_t pts = AV_NOPTS_VALUE;
  int64_t first_frame = 0; // 0-based global index of its first frame
  int n_frames = 0;        // video packets (== decoded frames) in chunk
};

class SegmentedReader {
 public:
  ~SegmentedReader();

  // Scan pass: demux the whole file once (no decode), build the chunk
  // table. Returns TS_OK, TS_UNSUPPORTED (not seekable / not starting
  // on a keyframe / fewer than 1 chunk), or a libav error.
  int Init(const SegmentedParams& params, std::shared_ptr<Logger> logger);
  int Start();
  // Blocking ordered read of up to `count` consecutive frames from the
  // global cursor (1-based indices like the serial pipeline). Returns
  // frames copied (0 at end-of-stream), TS_RENEGOTIATE when a native-
  // geometry deposit mismatched the init geometry (resolution-switch
  // file without resize), or TS_ERROR.
  int GetBatch(int count, uint8_t* out_y, uint8_t* out_uv, int* first_index);
  void Stop();

  int width() const { return width_; }
  int height() const { return height_; }
  // Geometry of the frames GetBatch copies (resize target when set).
  int outWidth() const { return params_.dst_width ? params_.dst_width : width_; }
  int outHeight() const {
    return params_.dst_height ? params_.dst_height : height_;
  }
  int64_t totalFrames() const { return total_frames_; }
  int chunks() const { return static_cast<int>(chunks_.size()); }
  int64_t framesDeposited() const { return deposited_.load(); }
  // Position the cursor so the first GetBatch returns `frame` (1-based).
  // Workers skip chunks entirely below it. Call before Start().
  void SeekFrame(int64_t frame);

 private:
  struct DepSlot {
    int64_t frame = -1;  // 0-based global index, -1 = empty
    std::vector<uint8_t> y, uv;
  };

  int scan();
  void worker(int id);
  // Per-worker reusable pack scratch (resized per geometry, not per
  // frame — the host-resize deposit path is the throughput path).
  struct Scratch {
    SwsContext* sws = nullptr;
    std::vector<uint8_t> y, uv;
  };

  int decodeChunk(AVFormatContext* fmt, AVCodecContext* ctx, int video_index,
                  Scratch& scratch, const SegmentChunk& chunk, int64_t base);
  int deposit(int64_t frame, const AVFrame* f, Scratch& scratch);

  SegmentedParams params_;
  std::shared_ptr<Logger> logger_;
  std::vector<SegmentChunk> chunks_;
  int64_t total_frames_ = 0;
  int width_ = 0, height_ = 0;
  AVCodecID codec_id_ = AV_CODEC_ID_NONE;
  AVCodecParameters* codecpar_ = nullptr;  // owned copy for worker opens
  AVRational seek_time_base_{1, 1};
  bool byte_seek_ = false;  // raw elementary stream: seek by pkt->pos

  std::vector<DepSlot> window_;
  std::mutex mu_;
  std::condition_variable cons_cv_, prod_cv_;
  int64_t cursor_ = 0;  // 0-based next frame to hand out
  std::atomic<int64_t> next_task_{0};
  std::atomic<int64_t> deposited_{0};
  int done_workers_ = 0;
  int error_ = 0;
  // Lowest frame index at which the ordered stream breaks (renegotiate
  // or a decode hole): frames below it still drain; depositors above it
  // abort so the shutdown cannot deadlock on a frozen cursor.
  int64_t error_frame_ = INT64_MAX;

  void fail(int code, int64_t at_frame);
  bool stopped_ = false;
  bool started_ = false;
  std::vector<std::thread> threads_;
};

}  // namespace ts

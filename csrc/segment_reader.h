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
//
// All frame indices are DISPLAY order. For IDR entries decode order and
// display order agree at the boundary, so first_frame is also the entry
// packet's decode index. For HEVC open-GOP (CRA/BLA) entries the leading
// pictures (RASL/RADL) FOLLOW the entry packet in decode order but
// display BEFORE it: first_frame = dec_idx + (count of leading AUs), a
// cold decoder started here drops the RASL itself (libavcodec
// NoRaslOutputFlag semantics after flush) and the chunk discards the
// lead_skip RADL outputs, and the PREVIOUS chunk feeds feed_packets
// past its own decode span — through this entry packet and its leading
// AUs — to produce the leading frames that display inside ITS range.
struct SegmentChunk {
  int64_t byte_pos = -1;   // pkt->pos of the first (key) packet
  int64_t pts = AV_NOPTS_VALUE;
  int64_t first_frame = 0; // 0-based global DISPLAY index of first frame
  int n_frames = 0;        // display frames in [first, next.first)
  int64_t dec_idx = 0;     // decode-order packet index of entry packet
  int64_t feed_packets = 0;  // packets a chunk decoder must feed
  int lead_total = 0;      // leading AUs (RASL+RADL) after a CRA entry
  int lead_skip = 0;       // cold-start outputs to discard (the RADL)
  bool cra = false;        // open-GOP entry (CRA/BLA), not IDR
};

// ----- shared seekable-source decode infrastructure (segment + clip
// readers; both decode disjoint keyframe-delimited ranges with
// independent demux+codec instances and deposit packed NV12).

// Scan result: the keyframe table of a seekable file.
struct StreamScan {
  std::vector<SegmentChunk> segments;  // one per keyframe-delimited run
  int64_t total_frames = 0;
  int width = 0, height = 0;
  AVCodecID codec_id = AV_CODEC_ID_NONE;
  AVCodecParameters* codecpar = nullptr;  // owned
  AVRational seek_time_base{1, 1};
  bool byte_seek = false;  // raw elementary stream: seek by pkt->pos
  StreamScan() = default;
  StreamScan(const StreamScan&) = delete;
  StreamScan& operator=(const StreamScan&) = delete;
  ~StreamScan();
};

// Demux the whole file once (no decode) and build the keyframe table.
// Returns TS_OK, TS_UNSUPPORTED (not seekable / no video frames), or a
// libav error. Split points: H.264 IDR; HEVC IDR plus open-GOP CRA/BLA
// entries with leading-picture accounting (see SegmentChunk); VP9/AV1
// keyframes. Cold-decoder bit-exactness holds at every entry (see
// FirstVclNal / the scan loop in segment_reader.cpp).
int ScanStream(const std::string& input, const std::shared_ptr<Logger>& logger,
               StreamScan* out);

// Per-worker reusable pack/resize scratch (resized per geometry, not per
// frame — the host-resize deposit path is the throughput path).
struct SegScratch {
  SwsContext* sws = nullptr;
  std::vector<uint8_t> y, uv;
  ~SegScratch();
};

// An independent demux+decode instance over the scanned file.
struct WorkerDecoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  int video_index = -1;
  WorkerDecoder() = default;
  WorkerDecoder(const WorkerDecoder&) = delete;
  WorkerDecoder& operator=(const WorkerDecoder&) = delete;
  ~WorkerDecoder();
};
int OpenWorkerDecoder(const std::string& input, AVCodecID codec_id,
                      const AVCodecParameters* par, int decode_threads,
                      bool fast_decode, WorkerDecoder* out);

// Resize (or pack, when the frame already matches) a decoded frame into
// tightly-packed dst_w x dst_h NV12 — the shared per-frame deposit of
// the host_resize paths. Resizes straight from the decoder planes where
// the layout allows (zero-pack; same trick as the serial ring's resized
// drain, csrc/decoder.cpp).
int ResizeDepositNV12(const AVFrame* f, uint8_t* y, uint8_t* uv, int dst_w,
                      int dst_h, HostResizeAlgo algo, SegScratch& scratch);

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
  int decodeChunk(AVFormatContext* fmt, AVCodecContext* ctx, int video_index,
                  SegScratch& scratch, const SegmentChunk& chunk,
                  int64_t base);
  int deposit(int64_t frame, const AVFrame* f, SegScratch& scratch);

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

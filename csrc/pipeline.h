// Pipeline orchestrator: producer thread + multi-consumer frame fan-out.
//
// Behavior-compatible re-design of the reference's TensorStream
// orchestrator (reference: src/Wrappers/WrapperPython.cpp:9-263 and
// src/Wrappers/WrapperC.cpp:14-241) minus everything CUDA/ATen:
//  * producer loop: Read -> Get -> (Analyze unless skipped) -> Decode,
//    EAGAIN continues, with the same five FrameRateMode pacing behaviors;
//  * consumer GetFrame: spin on TS_REPEAT, copy NV12 out of the ring;
//    the VPP + tensor creation happen on the JAX side (Python), so this
//    class ends at the NV12 handoff;
//  * BLOCKING mode: strict lockstep with every registered consumer;
//  * shutdown: Stop() wakes everyone, joins the producer, closes all.
//
// Differences by design (documented in docs/PARITY.md): the producer
// thread lives here (std::thread) instead of a Python thread holding a
// released GIL; the ATen tensor-GC loop is gone (JAX owns device buffers);
// analyzer error masks are accumulated and queryable instead of
// log-only.
#pragma once

#include <atomic>
#include <condition_variable>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>

#include "decoder.h"
#include "parser.h"
#include "ts_common.h"

namespace ts {

struct PipelineParams {
  std::string input;
  int max_consumers = 5;
  int buffer_size = 10;
  int framerate_mode = FR_NATIVE;
  bool enable_dumps = false;
  int decode_threads = 0;
  bool loop = false;
  bool fast_decode = false;  // see DecoderParams::fast_decode
  // Elastic recovery for live sources (beyond the reference, whose only
  // retry was Python-side initialize(repeat_number), SURVEY §5.3): when
  // the source dies mid-stream (EOF/timeout/read error), the producer
  // re-opens the URL with backoff instead of finishing; consumers keep
  // blocking and frame numbering continues. Decode errors on packets of
  // a live connection (e.g. joining mid-GOP after a reconnect) are
  // skipped rather than fatal. For local files prefer `loop` (replay
  // without re-probing).
  bool reconnect = false;
  int reconnect_delay_ms = 500;   // backoff between attempts
  int reconnect_attempts = 20;    // per outage; <0 = retry forever
};

class Pipeline {
 public:
  ~Pipeline();

  int Init(const PipelineParams& params);
  // Stores an extra avformat open option (key=value). Options persist
  // for the handle's lifetime: every (re-)Init — including reconnect
  // re-opens — applies them, and a later value for the same key wins
  // (av_dict_set overwrite semantics).
  void QueueFormatOption(const std::string& key, const std::string& value) {
    queued_format_opts_.emplace_back(key, value);
  }

  // Spawns the producer thread running the processing loop.
  int Start();

  // Positions the pipeline so the next delivered frame is number
  // `skip + 1` (1-based), i.e. `skip` frames are skipped. Call between
  // Init and Start. Container formats seek to the nearest prior
  // keyframe and decode-discard forward by presentation timestamp; raw
  // elementary streams (no index) decode-discard from the start by
  // frame count — exact in both cases for constant-frame-rate input.
  // Returns TS_OK, TS_EOF when the stream is shorter than `skip`, or
  // an error.
  int SeekToFrame(int64_t skip);

  // Manual mode (testing): runs one producer iteration synchronously.
  // Returns TS_OK when a frame reached the ring, TS_REPEAT when the
  // decoder needs more input, TS_EOF after end-of-stream drain.
  int Step();

  // Copies the NV12 planes of the (latest + index) frame for `consumer`.
  // Returns the absolute frame counter (>=1), or TS_FINISHED / TS_ERROR.
  // Spins internally while the decoder reports TS_REPEAT, exactly like the
  // reference's getFrame (WrapperPython.cpp:299-307).
  int GetFrame(const std::string& consumer, int index, uint8_t* out_y,
               uint8_t* out_uv);

  // Single decoder GetFrame attempt: may return TS_REPEAT instead of
  // spinning. Test/manual-mode companion of Step().
  int TryGetFrame(const std::string& consumer, int index, uint8_t* out_y,
                  uint8_t* out_uv);

  // Bulk no-drop read into contiguous [count, H, W] batch buffers (see
  // Decoder::GetFramesBulk). Returns frames copied; 0 => stream drained.
  int GetFrameBatch(const std::string& consumer, int count, uint8_t* out_y,
                    uint8_t* out_uv, int* first_index);

  // Pre-registers a bulk (cursor) consumer so its no-drop window starts
  // at the CURRENT frame — call before Start() to guarantee delivery
  // from frame 1 (a cursor created lazily by the first GetFrameBatch
  // starts at the oldest frame still in the ring instead).
  void RegisterCursor(const std::string& consumer);

  // Bulk no-drop read with host-side NV12 resize before the copy-out
  // (Decoder::GetFramesBulkResized) — the transfer-byte reducer for
  // link-bound hosts.
  int GetFrameBatchResized(const std::string& consumer, int count, int dst_w,
                           int dst_h, int algo, uint8_t* out_y,
                           uint8_t* out_uv, int* first_index);

  void Stop();

  // Live dimensions: the decoder's current geometry (which a mid-stream
  // resolution switch updates) once decoding is initialized, the
  // parser's probe before that.
  int width() const {
    return decoder_ && decoder_->width() ? decoder_->width()
                                         : (parser_ ? parser_->width() : 0);
  }
  int height() const {
    return decoder_ && decoder_->height() ? decoder_->height()
                                          : (parser_ ? parser_->height() : 0);
  }
  // Colorimetry detected from decoded frames (ColorStandard value;
  // 0 = BT.601 limited until a tagged frame decodes).
  int detectedStandard() const {
    return decoder_ ? decoder_->detectedStandard() : 0;
  }
  // Geometry renegotiation passthroughs (see Decoder::AckRenegotiate).
  int ackRenegotiate(const std::string& consumer, int* w, int* h) {
    return decoder_ ? decoder_->AckRenegotiate(consumer, w, h) : TS_ERROR;
  }
  void consumerDims(const std::string& consumer, int* w, int* h) {
    if (decoder_) {
      decoder_->ConsumerDims(consumer, w, h);
    } else {
      if (w) *w = width();
      if (h) *h = height();
    }
  }
  int fpsNum() const { return fps_num_; }
  int fpsDen() const { return fps_den_; }
  int realTimeDelayMs() const { return real_time_delay_ms_; }
  int frameIndex() const { return decoder_ ? decoder_->frameIndex() : 0; }
  int analyzeErrorMask() const { return analyze_errors_.load(); }
  // Successful live-source reconnects since Start() (observability for
  // the elastic-recovery path).
  int reconnectCount() const { return reconnects_.load(); }
  // Total milliseconds the producer loop spent in pacing sleeps —
  // lets tests assert NATIVE/NATIVE_SIMPLE pacing on the pipeline's own
  // accounting instead of flaky wall-clock reads.
  int64_t sleptMs() const { return slept_ms_.load(std::memory_order_relaxed); }
  // Cumulative producer/Step phase times: {read, analyze, decode} ns
  // plus the iteration count (see stat_*_ members).
  int64_t statNs(int which) const {
    switch (which) {
      case 0: return stat_read_ns_.load(std::memory_order_relaxed);
      case 1: return stat_analyze_ns_.load(std::memory_order_relaxed);
      case 2: return stat_decode_ns_.load(std::memory_order_relaxed);
      case 3: return stat_iters_.load(std::memory_order_relaxed);
    }
    return 0;
  }
  // False iff NATIVE_LOW_DELAY dropped the demuxer buffer
  // (reference: WrapperC.cpp:44-47, Parser.cpp:320-321).
  bool keepsBuffer() const { return parser_ ? parser_->keepsBuffer() : true; }
  bool running() const { return should_work_.load(); }
  // True when the next decoded frame can be stored without blocking on
  // cursor back-pressure (StreamPool workers skip full streams).
  bool hasRingHeadroom() { return decoder_ ? decoder_->hasRingHeadroom() : false; }

  void skipAnalyze() { skip_analyze_ = true; }
  void enableLogs(int level) { logger_->initialize(level); }
  void enableTrace() { logger_->enableTrace(); }
  Logger* logger() { return logger_.get(); }

 private:
  void registerCursorAndWake(const std::string& consumer);
  // Re-opens the dead source with bounded backoff (params_.reconnect_*).
  // Returns TS_OK when parser+decoder are live again, TS_ERROR when the
  // attempts are exhausted or Stop() was requested.
  int tryReconnect();
  // `framerate_mode` is passed by value (not read from framerate_mode_)
  // so Step() can run an unpaced iteration without mutating state that
  // GetFrame/Stop read concurrently.
  int loopIteration(std::pair<int64_t, bool>& start_dts,
                    std::pair<std::chrono::steady_clock::time_point, bool>& start_time,
                    int framerate_mode);
  void processingLoop();
  bool checkGetComplete();

  PipelineParams params_;
  std::vector<std::pair<std::string, std::string>> queued_format_opts_;
  std::mutex iter_sync_;  // serializes loopIteration (producer vs Step)
  std::shared_ptr<Logger> logger_ = std::make_shared<Logger>();
  std::unique_ptr<Parser> parser_;
  std::unique_ptr<Decoder> decoder_;
  AVPacket* parsed_ = nullptr;

  int framerate_mode_ = FR_NATIVE;
  int fps_num_ = 0, fps_den_ = 1;
  int real_time_delay_ms_ = 0;
  double index_to_dts_ = 0.0;
  double dts_to_ms_ = 0.0;
  // Atomic: skipAnalyze() may be called while the producer loop runs.
  std::atomic<bool> skip_analyze_{false};
  std::atomic<int> analyze_errors_{0};
  std::atomic<int> reconnects_{0};
  std::atomic<int64_t> slept_ms_{0};
  // Per-phase wall time accumulators (ns) + iteration count for the
  // producer/Step hot loop — cheap observability for attributing where
  // a slow pipeline spends its time (read = demux, analyze = bitstream
  // walk, decode = codec + ring store).
  std::atomic<int64_t> stat_read_ns_{0};
  std::atomic<int64_t> stat_analyze_ns_{0};
  std::atomic<int64_t> stat_decode_ns_{0};
  std::atomic<int64_t> stat_iters_{0};

  std::atomic<bool> should_work_{false};
  std::thread producer_;
  std::mutex close_sync_;

  // BLOCKING-mode lockstep state (reference: WrapperPython.cpp:115-130).
  std::mutex blocking_sync_;
  std::condition_variable blocking_cv_;
  std::map<std::string, bool> blocking_statuses_;

  std::mutex consumers_mu_;
  std::map<std::string, bool> consumers_;

  // Atomic: written by Stop() under close_sync_, read by consumer entry
  // points without it.
  std::atomic<bool> initialized_{false};
};

}  // namespace ts

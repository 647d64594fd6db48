#include "pipeline.h"

#include <chrono>

extern "C" {
#include <libavutil/log.h>
}

namespace ts {

namespace {
// Silence FFmpeg chatter below error level, like the reference's
// logCallback (WrapperPython.cpp:4-7).
void quietLogOnce() {
  static bool done = false;
  if (!done) {
    av_log_set_level(AV_LOG_ERROR);
    done = true;
  }
}
}  // namespace

Pipeline::~Pipeline() { Stop(); }

int Pipeline::Init(const PipelineParams& params) {
  quietLogOnce();
  params_ = params;
  should_work_ = true;
  skip_analyze_ = false;
  analyze_errors_ = 0;
  framerate_mode_ = params.framerate_mode;
  bool keep_buffer = true;
  if (framerate_mode_ == FR_NATIVE_LOW_DELAY) {
    keep_buffer = false;
    framerate_mode_ = FR_NATIVE;
  }

  Span span(logger_.get(), "Pipeline::Init");
  parser_ = std::make_unique<Parser>();
  // Lets Stop() abort any blocking avformat call (including a
  // reconnect-time re-open) through the interrupt callback.
  parser_->setKeepRunningFlag(&should_work_);
  ParserParams pp{params.input, keep_buffer, params.enable_dumps, params.loop,
                  queued_format_opts_};
  int sts = parser_->Init(pp, logger_);
  if (sts != TS_OK) return sts == TS_OK ? TS_OK : TS_ERROR;

  decoder_ = std::make_unique<Decoder>();
  DecoderParams dp{params.buffer_size, params.enable_dumps,
                   params.decode_threads, params.fast_decode};
  sts = decoder_->Init(dp, *parser_, logger_);
  if (sts != TS_OK) return TS_ERROR;

  parsed_ = av_packet_alloc();

  AVRational fr = parser_->frameRate();
  if (!fr.num || !fr.den) {
    logger_->log("Frame rate in bitstream hasn't been found, using guessed value", LOG_LOW);
    fr = parser_->guessedFrameRate();
  }
  if (!fr.num || !fr.den) return TS_ERROR;
  if (fr.num / fr.den > kFrameRateConstraint) return TS_ERROR;
  fps_num_ = fr.num;
  fps_den_ = fr.den;
  real_time_delay_ms_ = static_cast<int>(static_cast<float>(fps_den_) /
                                         static_cast<float>(fps_num_) * 1000);

  AVRational tb = parser_->timeBase();
  AVRational rfr = parser_->guessedFrameRate();
  if (rfr.num && tb.num) {
    // frame index -> DTS ticks (reference: WrapperC.cpp:82-88).
    index_to_dts_ = static_cast<double>(rfr.den) * tb.den /
                    (static_cast<int64_t>(rfr.num) * tb.num);
  }
  if (tb.den) dts_to_ms_ = static_cast<double>(tb.num) / tb.den * 1000.0;
  initialized_ = true;
  return TS_OK;
}

int Pipeline::loopIteration(
    std::pair<int64_t, bool>& start_dts,
    std::pair<std::chrono::steady_clock::time_point, bool>& start_time,
    int framerate_mode) {
  auto wait_time = std::chrono::steady_clock::now();
  stat_iters_.fetch_add(1, std::memory_order_relaxed);
  int sts = parser_->Read();
  auto t_read = std::chrono::steady_clock::now();
  stat_read_ns_.fetch_add(
      std::chrono::duration_cast<std::chrono::nanoseconds>(t_read - wait_time)
          .count(),
      std::memory_order_relaxed);
  if (sts == AVERROR(EAGAIN)) return TS_REPEAT;
  if (sts == TS_EOF) {
    if (decoder_->Drain() > 0) return TS_EOF;  // drained frames still reach consumers
    return TS_EOF;
  }
  if (sts == TS_TIMEOUT) return TS_TIMEOUT;
  if (sts != TS_OK) return TS_ERROR;
  parser_->Get(parsed_);

  int64_t frame_dts = parsed_->dts;
  if (frame_dts == AV_NOPTS_VALUE && framerate_mode == FR_NATIVE) {
    frame_dts = static_cast<int64_t>(decoder_->frameIndex() * index_to_dts_);
  }

  if (!skip_analyze_) {
    auto t0 = std::chrono::steady_clock::now();
    int mask = parser_->Analyze(parsed_);
    stat_analyze_ns_.fetch_add(
        std::chrono::duration_cast<std::chrono::nanoseconds>(
            std::chrono::steady_clock::now() - t0)
            .count(),
        std::memory_order_relaxed);
    if (mask > 0) analyze_errors_.fetch_or(mask);
  }

  auto t_dec = std::chrono::steady_clock::now();
  sts = decoder_->Decode(parsed_);
  stat_decode_ns_.fetch_add(
      std::chrono::duration_cast<std::chrono::nanoseconds>(
          std::chrono::steady_clock::now() - t_dec)
          .count(),
      std::memory_order_relaxed);
  if (sts == AVERROR(EAGAIN)) return TS_REPEAT;
  if (sts == AVERROR_EOF) return TS_EOF;
  if (sts != TS_OK) return TS_DECODE_ERROR;

  // Pacing (reference: WrapperPython.cpp:186-216).
  int sleep_ms = 0;
  if (framerate_mode == FR_NATIVE_SIMPLE) {
    auto elapsed = std::chrono::duration_cast<std::chrono::milliseconds>(
                       std::chrono::steady_clock::now() - wait_time)
                       .count();
    sleep_ms = real_time_delay_ms_ - static_cast<int>(elapsed);
  } else if (framerate_mode == FR_NATIVE) {
    if (!start_dts.second) {
      start_dts = {frame_dts, true};
    }
    int64_t rel_ms = static_cast<int64_t>((frame_dts - start_dts.first) * dts_to_ms_);
    if (!start_time.second) {
      start_time = {std::chrono::steady_clock::now(), true};
    }
    int64_t now = std::chrono::duration_cast<std::chrono::milliseconds>(
                      std::chrono::steady_clock::now() - start_time.first)
                      .count();
    if (rel_ms > now) sleep_ms = static_cast<int>(rel_ms - now);
  }
  if (sleep_ms > 0) {
    std::this_thread::sleep_for(std::chrono::milliseconds(sleep_ms));
    slept_ms_.fetch_add(sleep_ms, std::memory_order_relaxed);
  }

  if (framerate_mode == FR_BLOCKING) {
    // Cursor (bulk) consumers pace the producer through ring
    // back-pressure instead of the per-frame handshake, so they bypass
    // this wait — but only when NO per-frame blocking consumer is
    // registered; with both kinds present the per-frame handshake still
    // holds (cursor consumers simply don't count toward it).
    std::unique_lock<std::mutex> lk(blocking_sync_);
    blocking_cv_.wait(lk, [&] {
      return checkGetComplete() || !should_work_ ||
             (blocking_statuses_.empty() && decoder_ &&
              decoder_->hasCursorConsumers());
    });
  }
  return TS_OK;
}

bool Pipeline::checkGetComplete() {
  size_t ready = 0;
  for (auto& kv : blocking_statuses_)
    if (kv.second) ready++;
  if (ready != 0 && ready == blocking_statuses_.size()) {
    for (auto& kv : blocking_statuses_) kv.second = false;
    return true;
  }
  return false;
}

void Pipeline::processingLoop() {
  setThreadName("ts-producer");
  std::unique_lock<std::mutex> lk(close_sync_);
  std::pair<int64_t, bool> start_dts{0, false};
  std::pair<std::chrono::steady_clock::time_point, bool> start_time{
      std::chrono::steady_clock::now(), false};
  // Bounds the reconnect-mode undecodable-packet skip: a transient
  // mid-GOP join recovers within one GOP, but a PERMANENT decode
  // failure (e.g. a live source switching resolution, which storeFrame
  // rejects) must not become an infinite full-speed skip loop that
  // never releases the consumers.
  constexpr int kMaxConsecutiveSkips = 1000;
  int consecutive_skips = 0;
  while (should_work_) {
    Span span(logger_.get(), "Pipeline::processingLoop");
    int sts;
    {
      std::lock_guard<std::mutex> iter_lk(iter_sync_);
      sts = loopIteration(start_dts, start_time, framerate_mode_);
    }
    if (sts == TS_REPEAT) continue;
    if (sts == TS_OK) {
      consecutive_skips = 0;
      continue;
    }
    if (params_.reconnect && should_work_) {
      if (sts == TS_DECODE_ERROR && ++consecutive_skips < kMaxConsecutiveSkips) {
        // A live packet that would not decode (e.g. joined mid-GOP
        // after a reconnect, waiting for the next keyframe): skip it.
        logger_->log("Undecodable packet skipped (reconnect mode)", LOG_LOW);
        continue;
      }
      if (sts == TS_DECODE_ERROR) {
        logger_->log("Decode failing persistently; giving up", LOG_LOW);
        break;
      }
      // EOF / timeout / read error: the source died — re-open it and
      // keep the consumers blocked (frame numbering continues).
      if (tryReconnect() == TS_OK) {
        consecutive_skips = 0;
        start_dts = {0, false};
        start_time = {std::chrono::steady_clock::now(), false};
        continue;
      }
    }
    break;  // EOF / timeout / error -> finish
  }
  logger_->log("Processing was interrupted or stream has ended", LOG_LOW);
  if (decoder_) decoder_->notifyConsumers();
  logger_->log("All consumers were notified about processing end", LOG_LOW);
}

int Pipeline::tryReconnect() {
  logger_->log("Source lost; reconnecting to " + params_.input, LOG_LOW);
  for (int attempt = 0;
       params_.reconnect_attempts < 0 || attempt < params_.reconnect_attempts;
       attempt++) {
    if (!should_work_) return TS_ERROR;
    {
      std::lock_guard<std::mutex> iter_lk(iter_sync_);
      int sts = parser_->Reopen();
      if (sts == TS_OK) sts = decoder_->Reopen(*parser_);
      if (sts == TS_OK) {
        reconnects_.fetch_add(1);
        logger_->log("Reconnected after " + std::to_string(attempt + 1) +
                         " attempt(s)",
                     LOG_LOW);
        return TS_OK;
      }
    }
    // Interruptible backoff, only when another attempt will follow:
    // Stop() must never wait out a full delay, and a decided outcome
    // must not keep consumers blocked for one more period.
    bool last_attempt = params_.reconnect_attempts >= 0 &&
                        attempt + 1 >= params_.reconnect_attempts;
    int remaining = last_attempt ? 0 : params_.reconnect_delay_ms;
    while (remaining > 0 && should_work_) {
      int slice = remaining < 50 ? remaining : 50;
      std::this_thread::sleep_for(std::chrono::milliseconds(slice));
      remaining -= slice;
    }
  }
  logger_->log("Reconnect attempts exhausted", LOG_LOW);
  return TS_ERROR;
}

int Pipeline::Start() {
  if (!initialized_) return TS_ERROR;
  producer_ = std::thread([this] { processingLoop(); });
  return TS_OK;
}

int Pipeline::SeekToFrame(int64_t skip) {
  if (!initialized_ || producer_.joinable()) return TS_ERROR;
  if (skip <= 0) return TS_OK;
  std::lock_guard<std::mutex> lk(iter_sync_);
  int64_t target_pts = -1;
  int64_t remaining = skip;
  if (index_to_dts_ > 0) {
    int64_t ts = parser_->startTime() +
                 static_cast<int64_t>(llround(skip * index_to_dts_));
    if (parser_->Seek(ts) == TS_OK) target_pts = ts;
    // Seek failure (raw elementary stream without an index) leaves the
    // demuxer at the start: fall back to counting `skip` frames.
  }
  decoder_->PrepareSeek(skip);
  while (true) {
    int sts = parser_->Read();
    if (sts == AVERROR(EAGAIN)) continue;
    if (sts == TS_EOF) return TS_EOF;
    if (sts == TS_TIMEOUT) return TS_TIMEOUT;
    if (sts != TS_OK) return TS_ERROR;
    parser_->Get(parsed_);
    sts = decoder_->DecodeSkip(parsed_, target_pts, &remaining);
    if (sts < 0) return TS_ERROR;
    if (sts > 0) return TS_OK;  // the target frame reached the ring
  }
}

int Pipeline::Step() {
  if (!initialized_) return TS_ERROR;
  std::pair<int64_t, bool> dts{0, false};
  std::pair<std::chrono::steady_clock::time_point, bool> t{
      std::chrono::steady_clock::now(), false};
  // Manual stepping never paces or blocks. The effective mode is passed
  // by value: temporarily rewriting the shared framerate_mode_ field
  // would race with GetFrame/Stop reading it from other threads. The
  // iteration itself is serialized against a started producer loop —
  // parser/decoder internals (parsed_ packet, codec ctx, sws) are not
  // reentrant (TSAN: tools/stress_tsan.cpp stepper thread).
  int sts;
  {
    std::lock_guard<std::mutex> iter_lk(iter_sync_);
    if (!initialized_) return TS_ERROR;  // Stop() won the lock first
    sts = loopIteration(dts, t, FR_FAST);
  }
  if (sts == TS_EOF && decoder_) decoder_->notifyConsumers();
  if (sts == TS_DECODE_ERROR) sts = TS_ERROR;  // internal code stays internal
  return sts;
}

int Pipeline::GetFrame(const std::string& consumer, int index, uint8_t* out_y,
                       uint8_t* out_uv) {
  if (!initialized_ || !decoder_) return TS_ERROR;
  {
    std::lock_guard<std::mutex> lk(consumers_mu_);
    auto it = consumers_.find(consumer);
    if (it == consumers_.end()) {
      if (static_cast<int>(consumers_.size()) >= params_.max_consumers) {
        logger_->log("Max consumers exceeded for: " + consumer, LOG_LOW);
        return TS_ERROR;
      }
      consumers_[consumer] = true;
    }
  }
  if (framerate_mode_ == FR_BLOCKING) {
    std::lock_guard<std::mutex> lk(blocking_sync_);
    blocking_statuses_.emplace(consumer, false);
  }
  Span span(logger_.get(), "Pipeline::GetFrame");
  // Not a hot spin despite the shape (the reference's version,
  // WrapperPython.cpp:301-306, is the same): each TS_REPEAT consumes the
  // consumer's wake flag, so the next Decoder::GetFrame call parks on
  // the consumer CV until a fresh frame arrives — at most one
  // non-blocking retry per decoded frame.
  int frame_index = TS_REPEAT;
  while (frame_index == TS_REPEAT) {
    frame_index = decoder_->GetFrame(index, consumer, out_y, out_uv);
  }
  if (framerate_mode_ == FR_BLOCKING && frame_index > 0) {
    {
      std::lock_guard<std::mutex> lk(blocking_sync_);
      blocking_statuses_[consumer] = true;
    }
    blocking_cv_.notify_all();
  }
  return frame_index;
}

int Pipeline::TryGetFrame(const std::string& consumer, int index, uint8_t* out_y,
                          uint8_t* out_uv) {
  if (!initialized_ || !decoder_) return TS_ERROR;
  return decoder_->GetFrame(index, consumer, out_y, out_uv);
}

// Registers `consumer`'s cursor and wakes a producer parked in the
// BLOCKING wait. The empty lock/unlock of blocking_sync_ orders the
// cursor registration before the notify: without it the producer could
// evaluate its predicate (no cursors yet), lose the wakeup fired between
// predicate and sleep, and park forever.
void Pipeline::registerCursorAndWake(const std::string& consumer) {
  decoder_->registerCursor(consumer);
  { std::lock_guard<std::mutex> lk(blocking_sync_); }
  blocking_cv_.notify_all();
}

int Pipeline::GetFrameBatch(const std::string& consumer, int count,
                            uint8_t* out_y, uint8_t* out_uv, int* first_index) {
  if (!initialized_ || !decoder_) return TS_ERROR;
  registerCursorAndWake(consumer);
  return decoder_->GetFramesBulk(consumer, count, out_y, out_uv, first_index);
}

void Pipeline::RegisterCursor(const std::string& consumer) {
  if (decoder_) decoder_->registerCursor(consumer);
}

int Pipeline::GetFrameBatchResized(const std::string& consumer, int count,
                                   int dst_w, int dst_h, int algo,
                                   uint8_t* out_y, uint8_t* out_uv,
                                   int* first_index) {
  if (!initialized_ || !decoder_) return TS_ERROR;
  registerCursorAndWake(consumer);
  return decoder_->GetFramesBulkResized(consumer, count, dst_w, dst_h, algo,
                                        out_y, out_uv, first_index);
}

void Pipeline::Stop() {
  should_work_ = false;
  if (framerate_mode_ == FR_BLOCKING) {
    {
      std::lock_guard<std::mutex> lk(blocking_sync_);
      for (auto& kv : blocking_statuses_) kv.second = true;
    }
    blocking_cv_.notify_all();
  }
  if (decoder_) decoder_->notifyConsumers();
  if (producer_.joinable()) producer_.join();
  {
    // iter_sync_ keeps a concurrent Step() (manual iteration) from
    // touching the parser/decoder while they are torn down; close_sync_
    // orders teardown against a producer loop still unwinding.
    std::scoped_lock lk(iter_sync_, close_sync_);
    if (parser_) parser_->Close();
    if (decoder_) decoder_->Close();
    if (parsed_) av_packet_free(&parsed_);
    initialized_ = false;
  }
}

}  // namespace ts

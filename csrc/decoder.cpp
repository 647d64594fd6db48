#include "decoder.h"

#include <thread>

#include "nv12_pack.h"

namespace ts {

int Decoder::Init(const DecoderParams& params, const Parser& parser,
                  std::shared_ptr<Logger> logger) {
  Span span(logger.get(), "Decoder::Init");
  params_ = params;
  logger_ = std::move(logger);
  const AVCodecParameters* par = parser.codecpar();
  if (!par) return TS_ERROR;
  const AVCodec* codec = avcodec_find_decoder(par->codec_id);
  if (!codec) return TS_UNSUPPORTED;
  ctx_ = avcodec_alloc_context3(codec);
  if (!ctx_) return TS_ERROR;
  int sts = avcodec_parameters_to_context(ctx_, par);
  if (sts < 0) return sts;
  int threads = params_.threads;
  if (threads <= 0) {
    threads = static_cast<int>(std::thread::hardware_concurrency());
    if (threads <= 0) threads = 1;
    if (threads > 16) threads = 16;
  }
  ctx_->thread_count = threads;
  ctx_->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  if (params_.fast_decode) {
    // Opt-in throughput mode for data-loading jobs where pixel-exact
    // decode does not matter: skipping the in-loop deblocking filter
    // buys ~23% decode throughput at 1080p (measured on the bench
    // host) at the cost of slightly out-of-spec reconstruction.
    ctx_->skip_loop_filter = AVDISCARD_ALL;
    ctx_->flags2 |= AV_CODEC_FLAG2_FAST;
  }
  sts = avcodec_open2(ctx_, codec, nullptr);
  if (sts < 0) return sts;

  width_ = par->width;
  height_ = par->height;
  gen_dims_[0] = {width_, height_};
  ring_.resize(params_.buffer_deep > 0 ? params_.buffer_deep : 1);
  decoded_ = av_frame_alloc();
  nv12_ = av_frame_alloc();
  if (params_.enable_dumps) dump_file_ = fopen("NV12.yuv", "wb+");
  closed_ = false;
  return TS_OK;
}

int Decoder::Reopen(const Parser& parser) {
  const AVCodecParameters* par = parser.codecpar();
  if (!par) return TS_ERROR;
  // A reconnected source with different dimensions is a geometry switch
  // like any other: the first stored frame bumps the generation and
  // consumers renegotiate (storeFrame detects the change itself).
  const AVCodec* codec = avcodec_find_decoder(par->codec_id);
  if (!codec) return TS_UNSUPPORTED;
  AVCodecContext* fresh = avcodec_alloc_context3(codec);
  if (!fresh) return TS_ERROR;
  int sts = avcodec_parameters_to_context(fresh, par);
  if (sts < 0) {
    avcodec_free_context(&fresh);
    return sts;
  }
  if (ctx_) {
    fresh->thread_count = ctx_->thread_count;
    fresh->thread_type = ctx_->thread_type;
    fresh->skip_loop_filter = ctx_->skip_loop_filter;
    fresh->flags2 = ctx_->flags2;
  }
  sts = avcodec_open2(fresh, codec, nullptr);
  if (sts < 0) {
    avcodec_free_context(&fresh);
    return sts;
  }
  // Swap under the ring lock: consumers and ring state are untouched, so
  // frame numbering continues where the dead connection stopped.
  std::lock_guard<std::mutex> lk(sync_);
  if (ctx_) avcodec_free_context(&ctx_);
  ctx_ = fresh;
  if (sws_) {
    sws_freeContext(sws_);
    sws_ = nullptr;
  }
  return TS_OK;
}

// Converts `frame` to tightly-packed NV12 and stores it into the next ring
// slot; wakes every consumer (reference: src/Decoder.cpp:149-162).
int Decoder::storeFrame(AVFrame* frame) {
  int w = frame->width, h = frame->height;
  size_t y_size = static_cast<size_t>(w) * h;
  size_t uv_size = static_cast<size_t>(w) * (h / 2);

  // Colorimetry from the frame's VUI metadata, folded to the matrices
  // the VPP implements (enums.py ColorStandard): BT.709 matrix -> bit 0,
  // full range -> bit 1; everything else (incl. unspecified) keeps the
  // reference's BT.601-limited default.
  int std_bits = 0;
  if (frame->colorspace == AVCOL_SPC_BT709) std_bits |= 1;
  if (frame->color_range == AVCOL_RANGE_JPEG) std_bits |= 2;
  detected_standard_ = std_bits;

  std::unique_lock<std::mutex> lk(sync_);
  if (w != width_ || h != height_) {
    // Mid-stream resolution change (e.g. an H.264 SPS switch in an
    // adaptive source): adopt the new geometry under a new generation.
    // Consumers with init-sized buffers get TS_RENEGOTIATE until they
    // acknowledge (the reference corrupts their heap here instead —
    // src/Decoder.cpp:149 adopts silently while callers keep old
    // buffers); the per-slot-resized bulk path rides through.
    if (logger_)
      logger_->log("Mid-stream resolution change " + std::to_string(width_) +
                       "x" + std::to_string(height_) + " -> " +
                       std::to_string(w) + "x" + std::to_string(h) +
                       "; consumers must renegotiate",
                   LOG_LOW);
    width_ = w;
    height_ = h;
    generation_++;
    gen_dims_[generation_] = {w, h};
  }
  if (!cursors_.empty()) {
    // Bounded-queue back-pressure: never overwrite a ring slot a cursor
    // consumer has not read yet (frame current_frame_ - deep lives in the
    // slot this store will reuse).
    producer_cv_.wait(lk, [&] {
      if (is_finished_) return true;
      int64_t min_cursor = INT64_MAX;
      for (auto& kv : cursors_) min_cursor = std::min(min_cursor, kv.second);
      return min_cursor > current_frame_ - static_cast<int64_t>(ring_.size());
    });
    if (is_finished_) return TS_FINISHED;
  }
  Slot& slot = ring_[current_frame_ % ring_.size()];
  slot.w = w;
  slot.h = h;
  slot.gen = generation_;
  if (!slot.av) slot.av = av_frame_alloc();
  av_frame_unref(slot.av);
  if (frame->format == AV_PIX_FMT_YUV420P ||
      frame->format == AV_PIX_FMT_YUVJ420P ||
      frame->format == AV_PIX_FMT_NV12) {
    // Lazy pack: hold a buffer reference; consumers pack on first use
    // (ensurePackedLocked) or read the planes strided without packing.
    int rs = av_frame_ref(slot.av, frame);
    if (rs < 0) return rs;  // ENOMEM: do not publish a dataless slot
    slot.packed = false;
  } else {
    // Exotic formats go through swscale once, here (csrc/nv12_pack.h —
    // one definition with the segment-parallel deposit).
    if (slot.y.size() != y_size) slot.y.resize(y_size);
    if (slot.uv.size() != uv_size) slot.uv.resize(uv_size);
    int pk = PackFrameNV12(frame, slot.y.data(), slot.uv.data(), &sws_);
    if (pk != TS_OK) return pk;
    slot.packed = true;
  }
  slot.valid = true;
  current_frame_++;
  for (auto& kv : consumer_status_) kv.second = true;
  lk.unlock();
  consumer_cv_.notify_all();

  if (dump_file_) {
    int pk;
    {
      std::lock_guard<std::mutex> relk(sync_);
      pk = ensurePackedLocked(slot);
    }
    if (pk == TS_OK) {  // a failed pack must not fwrite stale bytes
      fwrite(slot.y.data(), 1, y_size, dump_file_);
      fwrite(slot.uv.data(), 1, uv_size, dump_file_);
      fflush(dump_file_);
    }
  }
  return TS_OK;
}

int Decoder::ensurePackedLocked(Slot& slot) {
  if (slot.packed) return TS_OK;
  if (!slot.av || !slot.av->data[0]) return TS_ERROR;
  const size_t y_size = static_cast<size_t>(slot.w) * slot.h;
  const size_t uv_size = static_cast<size_t>(slot.w) * (slot.h / 2);
  if (slot.y.size() != y_size) slot.y.resize(y_size);
  if (slot.uv.size() != uv_size) slot.uv.resize(uv_size);
  int pk = PackFrameNV12(slot.av, slot.y.data(), slot.uv.data(), &sws_);
  if (pk != TS_OK) return pk;
  slot.packed = true;
  return TS_OK;
}

// Drains every frame the codec has ready into the ring. Returns the
// number of frames stored, or a negative error from storeFrame.
int Decoder::drainReady() {
  int stored = 0;
  while (true) {
    int sts = avcodec_receive_frame(ctx_, decoded_);
    if (sts == AVERROR(EAGAIN) || sts == AVERROR_EOF) break;
    if (sts < 0) return sts;
    sts = storeFrame(decoded_);
    av_frame_unref(decoded_);
    if (sts < 0) return sts;
    stored++;
  }
  return stored;
}

void Decoder::PrepareSeek(int64_t skip) {
  if (ctx_) avcodec_flush_buffers(ctx_);
  std::lock_guard<std::mutex> lk(sync_);
  current_frame_ = static_cast<int>(skip);
  for (auto& s : ring_) s.valid = false;
}

int Decoder::DecodeSkip(AVPacket* pkt, int64_t target_pts,
                        int64_t* remaining) {
  int sts = avcodec_send_packet(ctx_, pkt);
  bool resend = (sts == AVERROR(EAGAIN));
  if (!resend) av_packet_unref(pkt);
  if (sts < 0 && !resend) return sts;
  int stored = 0;
  while (true) {
    int r = avcodec_receive_frame(ctx_, decoded_);
    if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) {
      if (resend) {
        sts = avcodec_send_packet(ctx_, pkt);
        av_packet_unref(pkt);
        resend = false;
        if (sts < 0) return sts;
        continue;
      }
      break;
    }
    if (r < 0) return r;
    bool keep;
    if (stored > 0) {
      keep = true;  // past the target: everything is live stream data
    } else if (target_pts >= 0) {
      int64_t pts = decoded_->best_effort_timestamp;
      if (pts == AV_NOPTS_VALUE) pts = decoded_->pts;
      keep = (pts == AV_NOPTS_VALUE) ? (*remaining <= 0) : (pts >= target_pts);
    } else {
      keep = (*remaining <= 0);
    }
    if (!keep) {
      if (*remaining > 0) (*remaining)--;
      av_frame_unref(decoded_);
      continue;
    }
    r = storeFrame(decoded_);
    av_frame_unref(decoded_);
    if (r < 0) return r;
    stored++;
  }
  return stored;
}

int Decoder::Decode(AVPacket* pkt) {
  Span span(logger_ ? logger_.get() : nullptr, "Decoder::Decode");
  int sts = avcodec_send_packet(ctx_, pkt);
  if (sts == AVERROR(EAGAIN)) {
    // The codec's output queue is full: drain it, then resend the SAME
    // packet — unreffing here would silently drop a compressed frame
    // (the pipeline maps EAGAIN to "read the next packet").
    int drained = drainReady();
    if (drained < 0) {
      av_packet_unref(pkt);
      return drained;
    }
    sts = avcodec_send_packet(ctx_, pkt);
  }
  av_packet_unref(pkt);
  if (sts < 0) return sts;
  // Drain ALL ready frames, not just one: multi-frame packets (VP9/AV1
  // superframes) and frame-threaded decode can surface several at once.
  int stored = drainReady();
  if (stored < 0) return stored;
  return stored > 0 ? TS_OK : AVERROR(EAGAIN);
}

int Decoder::Drain() {
  if (!ctx_) return 0;
  avcodec_send_packet(ctx_, nullptr);
  int drained = 0;
  while (true) {
    int sts = avcodec_receive_frame(ctx_, decoded_);
    if (sts < 0) break;
    storeFrame(decoded_);
    av_frame_unref(decoded_);
    drained++;
  }
  return drained;
}

int Decoder::GetFrame(int index, const std::string& consumer, uint8_t* out_y,
                      uint8_t* out_uv) {
  Span span(logger_ ? logger_.get() : nullptr, "Decoder::GetFrame");
  std::unique_lock<std::mutex> lk(sync_);
  auto it = consumer_status_.find(consumer);
  if (it == consumer_status_.end()) {
    // First call from this consumer: if frames exist already, return the
    // latest immediately instead of waiting for a fresh one.
    consumer_status_[consumer] = current_frame_ > 0;
    it = consumer_status_.find(consumer);
  }
  if (!is_finished_) {
    consumer_cv_.wait(lk, [&] { return it->second || is_finished_; });
  }
  if (is_finished_) return TS_FINISHED;

  it->second = false;
  if (index > 0) {
    if (logger_)
      logger_->log("WARNING: Frame number is greater than zero: " + std::to_string(index),
                   LOG_LOW);
    index = 0;
  }
  // Reference quirk preserved: the look-back is applied to the ring
  // position *after* the modulo, so early in the stream negative indexes
  // fall off the front and repeat (src/Decoder.cpp:122-124).
  int aligned = (current_frame_ - 1) % static_cast<int>(ring_.size()) + index;
  if (aligned < 0 || !ring_[aligned].valid) return TS_REPEAT;
  const Slot& slot = ring_[aligned];
  auto acked = acked_gen_.find(consumer);
  if (slot.gen != (acked == acked_gen_.end() ? 0 : acked->second)) {
    // Geometry switch: the caller's buffers are sized for a different
    // generation. Re-arm the wake flag so the retry after
    // AckRenegotiate does not wait for yet another frame.
    it->second = true;
    return TS_RENEGOTIATE;
  }
  {
    // Multi-consumer latest-frame reads share the slot: pack once under
    // the lock, then copy.
    int pk = ensurePackedLocked(const_cast<Slot&>(slot));
    if (pk != TS_OK) return pk;
  }
  std::memcpy(out_y, slot.y.data(), static_cast<size_t>(slot.w) * slot.h);
  std::memcpy(out_uv, slot.uv.data(),
              static_cast<size_t>(slot.w) * (slot.h / 2));
  return current_frame_;
}

int Decoder::AckRenegotiate(const std::string& consumer, int* w, int* h) {
  std::lock_guard<std::mutex> lk(sync_);
  auto it = cursors_.find(consumer);
  if (it != cursors_.end()) {
    // Cursor consumers adopt the geometry AT the cursor, so drains
    // resume exactly at the switch boundary even when several switches
    // are queued in the ring.
    const Slot& slot = ring_[it->second % ring_.size()];
    if (slot.valid && it->second < current_frame_) {
      acked_gen_[consumer] = slot.gen;
      if (w) *w = slot.w;
      if (h) *h = slot.h;
      return TS_OK;
    }
  }
  // Per-frame consumers adopt the LATEST STORED slot's generation, not
  // generation_: storeFrame bumps the counter before its back-pressure
  // wait, so between the bump and the store the newest readable frame is
  // still the previous generation — acking ahead of it would strand the
  // reader in a renegotiate loop until the switch frame lands.
  if (current_frame_ > 0) {
    const Slot& latest = ring_[(current_frame_ - 1) % ring_.size()];
    if (latest.valid) {
      acked_gen_[consumer] = latest.gen;
      if (w) *w = latest.w;
      if (h) *h = latest.h;
      return TS_OK;
    }
  }
  acked_gen_[consumer] = generation_;
  if (w) *w = width_;
  if (h) *h = height_;
  return TS_OK;
}

void Decoder::ConsumerDims(const std::string& consumer, int* w, int* h) {
  std::lock_guard<std::mutex> lk(sync_);
  auto it = acked_gen_.find(consumer);
  int gen = it == acked_gen_.end() ? 0 : it->second;
  auto dims = gen_dims_.find(gen);
  if (dims == gen_dims_.end()) {
    if (w) *w = width_;
    if (h) *h = height_;
    return;
  }
  if (w) *w = dims->second.first;
  if (h) *h = dims->second.second;
}

void Decoder::registerCursor(const std::string& consumer) {
  std::lock_guard<std::mutex> lk(sync_);
  if (cursors_.find(consumer) == cursors_.end()) {
    int64_t oldest = std::max<int64_t>(0, current_frame_ -
                                              static_cast<int64_t>(ring_.size()) + 1);
    cursors_.emplace(consumer, oldest);
  }
}

bool Decoder::hasCursorConsumers() {
  std::lock_guard<std::mutex> lk(sync_);
  return !cursors_.empty();
}

bool Decoder::hasRingHeadroom() {
  std::lock_guard<std::mutex> lk(sync_);
  if (is_finished_ || cursors_.empty()) return true;
  int64_t min_cursor = INT64_MAX;
  for (auto& kv : cursors_) min_cursor = std::min(min_cursor, kv.second);
  return min_cursor > current_frame_ - static_cast<int64_t>(ring_.size());
}

int Decoder::bulkDrain(const std::string& consumer, int count,
                       int* first_index, bool uniform, const FrameSink& sink) {

  // Blocks Close() for the duration of the drain; notifyConsumers (which
  // Stop() issues first) sets is_finished_ without needing this guard,
  // so a parked drain wakes, exits the loop, and releases us.
  std::shared_lock<std::shared_mutex> close_guard(close_guard_);
  if (closed_) return 0;
  std::unique_lock<std::mutex> lk(sync_);
  auto it = cursors_.find(consumer);
  if (it == cursors_.end()) {
    // A new cursor consumer starts at the oldest frame still in the ring.
    int64_t oldest = std::max<int64_t>(0, current_frame_ -
                                              static_cast<int64_t>(ring_.size()) + 1);
    it = cursors_.emplace(consumer, oldest).first;
  }
  int copied = 0;
  if (first_index) *first_index = static_cast<int>(it->second) + 1;
  while (copied < count) {
    consumer_cv_.wait(lk, [&] {
      return it->second < current_frame_ || is_finished_;
    });
    if (it->second >= current_frame_) break;  // finished and drained
    const Slot& slot = ring_[it->second % ring_.size()];
    if (slot.valid) {
      auto acked = acked_gen_.find(consumer);
      int acked_gen = acked == acked_gen_.end() ? 0 : acked->second;
      if (slot.gen != acked_gen) {
        if (uniform) {
          // A batch must keep one geometry: end it at the generation
          // boundary; an empty batch means the consumer must
          // renegotiate before any frame can be delivered. The cursor
          // stays at the boundary either way.
          if (copied == 0) return TS_RENEGOTIATE;
          break;
        }
        // Per-slot-adaptive sink (resized drain): adopt silently.
        acked_gen_[consumer] = slot.gen;
      }
      // Safe to read the slot unlocked: the producer's back-pressure
      // wait (storeFrame) cannot overwrite slot `cursor % size` until
      // this cursor advances past it, and the cursor only advances
      // below, after the sink ran.
      lk.unlock();
      sink(slot, copied);
      lk.lock();
      copied++;
    } else if (first_index) {
      *first_index = static_cast<int>(it->second) + 2;
    }
    it->second++;
    producer_cv_.notify_all();
  }
  return copied;
}

int Decoder::GetFramesBulk(const std::string& consumer, int count,
                           uint8_t* out_y, uint8_t* out_uv, int* first_index) {
  // Frame strides come from the slots themselves: bulkDrain's uniform
  // mode guarantees every slot of one batch shares the consumer's
  // acknowledged geometry (which can differ from the CURRENT width_/
  // height_ while a cursor drains frames stored before a switch).
  // The sink packs STRAIGHT into the caller's batch buffer from the
  // decoder planes (one write instead of pack-into-slot + memcpy);
  // exotic formats were packed eagerly at store and copy from the slot.
  return bulkDrain(
      consumer, count, first_index, /*uniform=*/true,
      [&](const Slot& slot, int copied) {
        const size_t ys = static_cast<size_t>(slot.w) * slot.h;
        const size_t uvs = static_cast<size_t>(slot.w) * (slot.h / 2);
        uint8_t* oy = out_y + static_cast<size_t>(copied) * ys;
        uint8_t* ouv = out_uv + static_cast<size_t>(copied) * uvs;
        const AVFrame* f = slot.av;
        if (f && f->data[0] &&
            (f->format == AV_PIX_FMT_YUV420P ||
             f->format == AV_PIX_FMT_YUVJ420P ||
             f->format == AV_PIX_FMT_NV12)) {
          SwsContext* unused = nullptr;
          PackFrameNV12(f, oy, ouv, &unused);  // 4:2:0 paths never use sws
        } else {
          std::memcpy(oy, slot.y.data(), ys);
          std::memcpy(ouv, slot.uv.data(), uvs);
        }
      });
}

int Decoder::GetFramesBulkResized(const std::string& consumer, int count,
                                  int dst_w, int dst_h, int algo,
                                  uint8_t* out_y, uint8_t* out_uv,
                                  int* first_index) {
  size_t y_size = static_cast<size_t>(dst_w) * dst_h;
  size_t uv_size = static_cast<size_t>(dst_w) * (dst_h / 2);
  // Per-slot source geometry: the fixed output size makes mid-stream
  // resolution switches invisible to this consumer (each slot is
  // resized from its own dimensions), so bulkDrain runs non-uniform.
  // The hot path resizes STRAIGHT from the decoder AVFrame (strided Y;
  // NV12 frames also pass chroma through, 4:2:0 planar interleaves UV
  // into a reusable scratch) — the ring never packs for this consumer.
  std::vector<uint8_t> uv_scratch;
  return bulkDrain(
      consumer, count, first_index, /*uniform=*/false,
      [&](const Slot& slot, int copied) {
        uint8_t* oy = out_y + static_cast<size_t>(copied) * y_size;
        uint8_t* ouv = out_uv + static_cast<size_t>(copied) * uv_size;
        // The AVFrame stays valid whether or not another consumer has
        // also packed this slot (reading slot.packed here would race);
        // empty data[0] means the exotic-format store packed eagerly.
        const AVFrame* f = slot.av;
        if (f && f->data[0] && f->format == AV_PIX_FMT_NV12) {
          ResizeNV12HostStrided(f->data[0], f->linesize[0], f->data[1],
                                f->linesize[1], slot.w, slot.h, oy, ouv,
                                dst_w, dst_h,
                                static_cast<HostResizeAlgo>(algo));
          return;
        }
        if (f && f->data[0] && (f->format == AV_PIX_FMT_YUV420P ||
                                f->format == AV_PIX_FMT_YUVJ420P)) {
          const size_t need = static_cast<size_t>(slot.w) * (slot.h / 2);
          if (uv_scratch.size() < need) uv_scratch.resize(need);
          InterleaveChromaRows(f->data[1], f->linesize[1], f->data[2],
                               f->linesize[2], slot.w, slot.h / 2,
                               uv_scratch.data());
          ResizeNV12HostStrided(f->data[0], f->linesize[0],
                                uv_scratch.data(), slot.w, slot.w, slot.h,
                                oy, ouv, dst_w, dst_h,
                                static_cast<HostResizeAlgo>(algo));
          return;
        }
        ResizeNV12Host(slot.y.data(), slot.uv.data(), slot.w, slot.h, oy,
                       ouv, dst_w, dst_h,
                       static_cast<HostResizeAlgo>(algo));
      });
}

void Decoder::notifyConsumers() {
  {
    std::lock_guard<std::mutex> lk(sync_);
    for (auto& kv : consumer_status_) kv.second = true;
    is_finished_ = true;
  }
  consumer_cv_.notify_all();
  producer_cv_.notify_all();
}

void Decoder::Close() {
  std::unique_lock<std::shared_mutex> close_guard(close_guard_);
  std::lock_guard<std::mutex> lk(sync_);
  if (closed_) return;
  if (ctx_) avcodec_free_context(&ctx_);
  if (sws_) {
    sws_freeContext(sws_);
    sws_ = nullptr;
  }
  if (decoded_) av_frame_free(&decoded_);
  if (nv12_) av_frame_free(&nv12_);
  if (dump_file_) {
    fclose(dump_file_);
    dump_file_ = nullptr;
  }
  for (auto& slot : ring_)
    if (slot.av) av_frame_free(&slot.av);
  ring_.clear();
  closed_ = true;
}

}  // namespace ts

#include "segment_reader.h"

extern "C" {
#include <libavcodec/bsf.h>
}

#include <cstring>

#include "nv12_pack.h"
#include "vpp_host_simd.h"

namespace ts {

namespace {

// NAL type of the first VCL NAL in an (annexb) access unit, or -1 when
// none. H.264: slice types 1..5 (nal_unit_type & 0x1F); HEVC: VCL types
// 0..31 (IRAP 16..21: BLA 16-18, IDR 19/20, CRA 21; leading pictures
// RADL 6/7, RASL 8/9).
int FirstVclNal(const uint8_t* data, int size, AVCodecID codec) {
  for (int i = 0; i + 3 < size;) {
    if (data[i] == 0 && data[i + 1] == 0) {
      int off = 0;
      if (data[i + 2] == 1)
        off = 3;
      else if (i + 4 < size && data[i + 2] == 0 && data[i + 3] == 1)
        off = 4;
      if (off) {
        int hdr = i + off;
        if (hdr >= size) return -1;
        if (codec == AV_CODEC_ID_H264) {
          int t = data[hdr] & 0x1F;
          if (t >= 1 && t <= 5) return t;
        } else {
          int t = (data[hdr] >> 1) & 0x3F;
          if (t <= 31) return t;
        }
        i = hdr + 1;
        continue;
      }
    }
    i++;
  }
  return -1;
}

// Entry-point split points where a cold decoder reproduces the serial
// decode bit-for-bit: H.264 IDR (clears the DPB; recovery-point SEI
// open GOP is NOT accepted — frames after it may reference across), and
// HEVC IRAP (IDR, or CRA/BLA — nothing at-or-after an IRAP in display
// order references across it except its own RASL pictures, which a
// cold-started libavcodec drops itself).
bool IsIdrVcl(int t, AVCodecID codec) {
  return codec == AV_CODEC_ID_H264 ? t == 5 : (t == 19 || t == 20);
}
bool IsCraVcl(int t, AVCodecID codec) {
  return codec == AV_CODEC_ID_HEVC && ((t >= 16 && t <= 18) || t == 21);
}
bool IsLeadingVcl(int t, AVCodecID codec) {
  return codec == AV_CODEC_ID_HEVC && t >= 6 && t <= 9;  // RADL/RASL
}
bool IsRadlVcl(int t, AVCodecID codec) {
  return codec == AV_CODEC_ID_HEVC && (t == 6 || t == 7);
}

int64_t PacketTime(const AVPacket* pkt) {
  return pkt->pts != AV_NOPTS_VALUE ? pkt->pts : pkt->dts;
}

}  // namespace

StreamScan::~StreamScan() {
  if (codecpar) avcodec_parameters_free(&codecpar);
}

SegScratch::~SegScratch() {
  if (sws) sws_freeContext(sws);
}

WorkerDecoder::~WorkerDecoder() {
  if (ctx) avcodec_free_context(&ctx);
  if (fmt) avformat_close_input(&fmt);
}

SegmentedReader::~SegmentedReader() {
  Stop();
  if (codecpar_) avcodec_parameters_free(&codecpar_);
}

int SegmentedReader::Init(const SegmentedParams& params,
                          std::shared_ptr<Logger> logger) {
  params_ = params;
  if (params_.workers < 1) params_.workers = 1;
  if (params_.window < 2) params_.window = 2;
  if (params_.chunk_frames < 1) params_.chunk_frames = 1;
  logger_ = std::move(logger);
  if (params_.dst_width % 2 || params_.dst_height % 2) return TS_ERROR;
  int sts = scan();
  if (sts < 0) return sts;
  window_.resize(params_.window);
  size_t ys = static_cast<size_t>(outWidth()) * outHeight();
  for (auto& slot : window_) {
    slot.y.resize(ys);
    slot.uv.resize(ys / 2);
  }
  return TS_OK;
}

int ScanStream(const std::string& input, const std::shared_ptr<Logger>& logger,
               StreamScan* out) {
  AVFormatContext* fmt = nullptr;
  int sts = avformat_open_input(&fmt, input.c_str(), nullptr, nullptr);
  if (sts < 0) return sts;
  sts = avformat_find_stream_info(fmt, nullptr);
  if (sts < 0) {
    avformat_close_input(&fmt);
    return sts;
  }
  int vi = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (vi < 0 || !fmt->pb || fmt->pb->seekable != AVIO_SEEKABLE_NORMAL) {
    avformat_close_input(&fmt);
    return TS_UNSUPPORTED;  // live/non-seekable: use the serial pipeline
  }
  AVStream* vs = fmt->streams[vi];
  out->codecpar = avcodec_parameters_alloc();
  if (!out->codecpar) {
    avformat_close_input(&fmt);
    return TS_ERROR;
  }
  avcodec_parameters_copy(out->codecpar, vs->codecpar);
  out->codec_id = vs->codecpar->codec_id;
  out->width = vs->codecpar->width;
  out->height = vs->codecpar->height;
  out->seek_time_base = vs->time_base;
  out->byte_seek = fmt->iformat && (fmt->iformat->flags & AVFMT_GENERIC_INDEX);

  // IDR checks run on annexb bytes; containers carry AVCC, so route
  // H.264/HEVC packets through the same BSF the analyzer uses
  // (csrc/parser.cpp Analyze; reference src/Parser.cpp:337-345).
  AVBSFContext* bsf = nullptr;
  if (out->codec_id == AV_CODEC_ID_H264 || out->codec_id == AV_CODEC_ID_HEVC) {
    const AVBitStreamFilter* filter = av_bsf_get_by_name(
        out->codec_id == AV_CODEC_ID_H264 ? "h264_mp4toannexb"
                                          : "hevc_mp4toannexb");
    if (filter && av_bsf_alloc(filter, &bsf) >= 0) {
      avcodec_parameters_copy(bsf->par_in, vs->codecpar);
      bsf->time_base_in = vs->time_base;
      if (av_bsf_init(bsf) < 0) av_bsf_free(&bsf);
    }
  }

  AVPacket* pkt = av_packet_alloc();
  AVPacket* filtered = av_packet_alloc();
  int64_t n = 0;
  bool lead_window = false;  // inside the last CRA entry's leading run
  const AVCodecID cid = out->codec_id;
  while ((sts = av_read_frame(fmt, pkt)) >= 0) {
    if (pkt->stream_index != vi) {
      av_packet_unref(pkt);
      continue;
    }
    // Probe the first VCL NAL type only where it can matter: keyframe-
    // flagged packets (potential entry) and every packet while a CRA's
    // leading-picture window is open (~1 extra probe per CRA).
    int vcl = -1;
    if (bsf && ((pkt->flags & AV_PKT_FLAG_KEY) || lead_window)) {
      AVPacket* probe = av_packet_clone(pkt);
      if (probe && av_bsf_send_packet(bsf, probe) >= 0) {
        bool first = true;
        while (av_bsf_receive_packet(bsf, filtered) >= 0) {
          if (first)
            vcl = FirstVclNal(filtered->data, filtered->size, cid);
          first = false;
          av_packet_unref(filtered);
        }
      }
      if (probe) av_packet_free(&probe);
    }
    bool split = false, cra = false;
    if (pkt->flags & AV_PKT_FLAG_KEY) {
      if (bsf) {
        cra = IsCraVcl(vcl, cid);
        split = cra || IsIdrVcl(vcl, cid);
      } else {
        split = true;  // VP9/AV1 keyframes reset the reference set
      }
    }
    if (lead_window && !split) {
      if (IsLeadingVcl(vcl, cid)) {
        auto& e = out->segments.back();
        e.lead_total++;
        if (IsRadlVcl(vcl, cid)) e.lead_skip++;  // RADL output, RASL dropped
      } else {
        lead_window = false;  // first trailing picture closes the run
      }
    }
    // The first packet always opens chunk 0: a cold decoder there IS the
    // serial decode, IDR or not (so chunk 0 never needs CRA accounting —
    // the serial pipeline drops/keeps its leading pictures identically).
    if (n == 0 || split) {
      SegmentChunk c;
      c.byte_pos = pkt->pos;
      c.pts = PacketTime(pkt);
      c.dec_idx = n;
      c.cra = n != 0 && cra;
      out->segments.push_back(c);
      lead_window = c.cra;
    }
    n++;
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  av_packet_free(&filtered);
  if (bsf) av_bsf_free(&bsf);
  avformat_close_input(&fmt);
  if (sts != AVERROR_EOF && sts < 0) return sts;
  if (n == 0) return TS_UNSUPPORTED;
  // Display-index fix-up (see SegmentChunk): a CRA entry's display index
  // exceeds its decode index by its leading-run length; the previous
  // chunk's display range grows by the same amount and its decoder must
  // feed through the next entry packet + leading run to produce those
  // frames (the next entry's own frame is fed too — the chunk discards
  // that one extra output).
  auto& segs = out->segments;
  for (size_t k = 0; k < segs.size(); k++) {
    segs[k].first_frame = segs[k].dec_idx + segs[k].lead_total;
    const bool has_next = k + 1 < segs.size();
    const int64_t next_disp =
        has_next ? segs[k + 1].dec_idx + segs[k + 1].lead_total : n;
    const int64_t next_feed =
        has_next ? segs[k + 1].dec_idx +
                       (segs[k + 1].cra ? segs[k + 1].lead_total + 1 : 0)
                 : n;
    segs[k].n_frames = static_cast<int>(next_disp - segs[k].first_frame);
    segs[k].feed_packets = next_feed - segs[k].dec_idx;
  }
  out->total_frames = n;
  return TS_OK;
}

int OpenWorkerDecoder(const std::string& input, AVCodecID codec_id,
                      const AVCodecParameters* par, int decode_threads,
                      bool fast_decode, WorkerDecoder* out) {
  int rc = avformat_open_input(&out->fmt, input.c_str(), nullptr, nullptr);
  if (rc >= 0) rc = avformat_find_stream_info(out->fmt, nullptr);
  if (rc >= 0) {
    out->video_index =
        av_find_best_stream(out->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (out->video_index < 0) rc = TS_ERROR;
  }
  if (rc >= 0) {
    const AVCodec* codec = avcodec_find_decoder(codec_id);
    out->ctx = codec ? avcodec_alloc_context3(codec) : nullptr;
    rc = out->ctx ? avcodec_parameters_to_context(out->ctx, par) : TS_ERROR;
    if (rc >= 0) {
      out->ctx->thread_count = decode_threads > 0 ? decode_threads : 1;
      out->ctx->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
      if (fast_decode) {
        out->ctx->skip_loop_filter = AVDISCARD_ALL;
        out->ctx->flags2 |= AV_CODEC_FLAG2_FAST;
      }
      rc = avcodec_open2(out->ctx, codec, nullptr);
    }
  }
  return rc < 0 ? rc : TS_OK;
}

int ResizeDepositNV12(const AVFrame* f, uint8_t* y, uint8_t* uv, int dst_w,
                      int dst_h, HostResizeAlgo algo, SegScratch& scratch) {
  if (f->width == dst_w && f->height == dst_h)
    return PackFrameNV12(f, y, uv, &scratch.sws);
  if (f->format == AV_PIX_FMT_NV12) {
    // Resize straight from the decoder planes (same zero-pack trick
    // as the serial ring's resized drain, csrc/decoder.cpp).
    ResizeNV12HostStrided(f->data[0], f->linesize[0], f->data[1],
                          f->linesize[1], f->width, f->height, y, uv, dst_w,
                          dst_h, algo);
    return TS_OK;
  }
  if (f->format == AV_PIX_FMT_YUV420P || f->format == AV_PIX_FMT_YUVJ420P) {
    // 4:2:0 planar: interleave UV into the worker scratch (the Y
    // plane never copies), then resize strided.
    const int w = f->width, h = f->height;
    const size_t need = static_cast<size_t>(w) * (h / 2);
    if (scratch.uv.size() < need) scratch.uv.resize(need);
    InterleaveChromaRows(f->data[1], f->linesize[1], f->data[2],
                         f->linesize[2], w, h / 2, scratch.uv.data());
    ResizeNV12HostStrided(f->data[0], f->linesize[0], scratch.uv.data(), w, w,
                          h, y, uv, dst_w, dst_h, algo);
    return TS_OK;
  }
  // Exotic formats: pack via swscale, then resize.
  const size_t ysz = static_cast<size_t>(f->width) * f->height;
  if (scratch.y.size() < ysz) scratch.y.resize(ysz);
  if (scratch.uv.size() < ysz / 2) scratch.uv.resize(ysz / 2);
  int rc = PackFrameNV12(f, scratch.y.data(), scratch.uv.data(), &scratch.sws);
  if (rc == TS_OK)
    ResizeNV12Host(scratch.y.data(), scratch.uv.data(), f->width, f->height,
                   y, uv, dst_w, dst_h, algo);
  return rc;
}

int SegmentedReader::scan() {
  StreamScan scan;
  int sts = ScanStream(params_.input, logger_, &scan);
  if (sts != TS_OK) return sts;
  codecpar_ = scan.codecpar;
  scan.codecpar = nullptr;  // ownership moves to the reader
  codec_id_ = scan.codec_id;
  width_ = scan.width;
  height_ = scan.height;
  seek_time_base_ = scan.seek_time_base;
  byte_seek_ = scan.byte_seek;
  total_frames_ = scan.total_frames;

  // Merge adjacent segments into ~chunk_frames tasks: one seek + one
  // flush per chunk instead of per GOP. A merged chunk keeps the first
  // segment's entry (seek target, cold-start skip) and feeds through to
  // the last merged segment's feed boundary.
  for (const auto& seg : scan.segments) {
    if (!chunks_.empty() &&
        chunks_.back().n_frames + seg.n_frames <= params_.chunk_frames) {
      auto& c = chunks_.back();
      c.n_frames += seg.n_frames;
      c.feed_packets = (seg.dec_idx - c.dec_idx) + seg.feed_packets;
    } else {
      chunks_.push_back(seg);
    }
  }
  if (logger_)
    logger_->log("SegmentedReader: " + std::to_string(total_frames_) +
                     " frames, " + std::to_string(scan.segments.size()) +
                     " segments, " + std::to_string(chunks_.size()) +
                     " chunks",
                 LOG_MEDIUM);
  return TS_OK;
}

void SegmentedReader::SeekFrame(int64_t frame) {
  std::lock_guard<std::mutex> lk(mu_);
  if (frame > 1) cursor_ = frame - 1;
}

int SegmentedReader::Start() {
  if (started_ || chunks_.empty()) return TS_ERROR;
  started_ = true;
  for (int i = 0; i < params_.workers; i++)
    threads_.emplace_back([this, i] { worker(i); });
  return TS_OK;
}

void SegmentedReader::worker(int id) {
  char name[16];
  std::snprintf(name, sizeof(name), "ts-seg-w%d", id);
  setThreadName(name);
  WorkerDecoder dec;
  SegScratch scratch;
  int rc = OpenWorkerDecoder(params_.input, codec_id_, codecpar_,
                             params_.decode_threads, params_.fast_decode,
                             &dec);
  if (rc < 0) {
    if (logger_)
      logger_->log("SegmentedReader worker open failed: " + std::to_string(rc),
                   LOG_LOW);
    fail(TS_ERROR, -1);  // unknown ownership: stop handing out frames
  } else {
    int64_t n_chunks = static_cast<int64_t>(chunks_.size());
    while (true) {
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (stopped_ || error_) break;
      }
      int64_t t = next_task_.fetch_add(1);
      if (!params_.loop && t >= n_chunks) break;
      const SegmentChunk& c = chunks_[t % n_chunks];
      int64_t epoch = t / n_chunks;
      int64_t base = epoch * total_frames_ + c.first_frame;
      {
        // Resume skip: chunks entirely before the cursor need no decode.
        std::lock_guard<std::mutex> lk(mu_);
        if (base + c.n_frames <= cursor_) continue;
      }
      rc = decodeChunk(dec.fmt, dec.ctx, dec.video_index, scratch, c, base);
      if (rc == TS_FINISHED) break;  // stopped mid-deposit
      if (rc < 0) {
        fail(rc, base);  // no-op when decodeChunk already set a watermark
        break;
      }
    }
  }
  {
    std::lock_guard<std::mutex> lk(mu_);
    done_workers_++;
  }
  cons_cv_.notify_all();
}

int SegmentedReader::decodeChunk(AVFormatContext* fmt, AVCodecContext* ctx,
                                 int vi, SegScratch& scratch,
                                 const SegmentChunk& chunk, int64_t base) {
  int sts;
  if (byte_seek_)
    sts = av_seek_frame(fmt, vi, chunk.byte_pos, AVSEEK_FLAG_BYTE);
  else
    sts = av_seek_frame(fmt, vi, chunk.pts, AVSEEK_FLAG_BACKWARD);
  if (sts < 0) return sts;
  avcodec_flush_buffers(ctx);
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  if (!pkt || !frame) {
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
    return TS_ERROR;
  }
  int64_t fed = 0;
  int64_t out_idx = 0;          // deposits made (display offset in chunk)
  int skip = chunk.lead_skip;   // cold-start RADL outputs to discard
  int rc = TS_OK;
  // Container seeks land at-or-before the target keyframe; skip demuxed
  // packets until the chunk's own first packet. Byte seeks land exactly.
  bool seen_first = byte_seek_;

  auto drain_ready = [&]() -> int {
    while (true) {
      int r = avcodec_receive_frame(ctx, frame);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return TS_OK;
      if (r < 0) return r;
      if (skip > 0) {
        skip--;  // this entry's RADL: display before the chunk
      } else if (out_idx >= chunk.n_frames) {
        // the next entry's own frame (fed to decode its leading run)
      } else {
        r = deposit(base + out_idx, frame, scratch);
        out_idx++;
      }
      av_frame_unref(frame);
      if (r < 0) return r;
    }
  };

  while (fed < chunk.feed_packets && rc == TS_OK) {
    sts = av_read_frame(fmt, pkt);
    if (sts == AVERROR_EOF) break;
    if (sts < 0) {
      rc = sts;
      break;
    }
    if (pkt->stream_index != vi) {
      av_packet_unref(pkt);
      continue;
    }
    if (!seen_first) {
      if (PacketTime(pkt) != chunk.pts) {
        av_packet_unref(pkt);
        continue;
      }
      seen_first = true;
    }
    fed++;
    sts = avcodec_send_packet(ctx, pkt);
    if (sts == AVERROR(EAGAIN)) {
      rc = drain_ready();
      if (rc == TS_OK) sts = avcodec_send_packet(ctx, pkt);
    }
    av_packet_unref(pkt);
    if (rc == TS_OK && sts < 0 && sts != AVERROR(EAGAIN)) rc = sts;
    if (rc == TS_OK) rc = drain_ready();
  }
  if (rc == TS_OK) {
    avcodec_send_packet(ctx, nullptr);  // flush delayed frames
    while (true) {
      sts = avcodec_receive_frame(ctx, frame);
      if (sts < 0) break;
      if (skip > 0) {
        skip--;
      } else if (out_idx >= chunk.n_frames) {
        // next entry's frame, see drain_ready
      } else {
        rc = deposit(base + out_idx, frame, scratch);
        out_idx++;
      }
      av_frame_unref(frame);
      if (rc < 0) break;
    }
  }
  av_packet_free(&pkt);
  av_frame_free(&frame);
  if (rc < 0) return rc;
  if (out_idx != chunk.n_frames) {
    if (logger_)
      logger_->log("SegmentedReader: chunk at frame " +
                       std::to_string(chunk.first_frame) + " produced " +
                       std::to_string(out_idx) + "/" +
                       std::to_string(chunk.n_frames) + " frames",
                   LOG_LOW);
    fail(TS_ERROR, base + out_idx);
    return TS_ERROR;  // a hole would stall the ordered window forever
  }
  return TS_OK;
}

void SegmentedReader::fail(int code, int64_t at_frame) {
  {
    std::lock_guard<std::mutex> lk(mu_);
    if (!error_) error_ = code;
    if (at_frame < error_frame_) error_frame_ = at_frame;
  }
  cons_cv_.notify_all();
  prod_cv_.notify_all();
}

int SegmentedReader::deposit(int64_t frame_idx, const AVFrame* f,
                             SegScratch& scratch) {
  {
    std::unique_lock<std::mutex> lk(mu_);
    prod_cv_.wait(lk, [&] {
      return stopped_ || frame_idx > error_frame_ ||
             frame_idx < cursor_ + static_cast<int64_t>(window_.size());
    });
    if (stopped_) return TS_FINISHED;
    // The stream is broken below this frame (renegotiate / decode
    // hole): the cursor will never reach it, so depositing would park
    // this worker forever.
    if (frame_idx > error_frame_) return TS_FINISHED;
    if (frame_idx < cursor_) return TS_OK;  // resume skip inside a chunk
  }
  DepSlot& slot = window_[frame_idx % window_.size()];
  // Exclusive writer: back-pressure bounds live frames to one window, so
  // no other worker maps to this slot; the consumer ignores it until
  // `frame` is published below.
  int rc;
  if (params_.dst_width) {
    rc = ResizeDepositNV12(f, slot.y.data(), slot.uv.data(),
                           params_.dst_width, params_.dst_height,
                           static_cast<HostResizeAlgo>(params_.resize_algo),
                           scratch);
  } else if (f->width != width_ || f->height != height_) {
    // Fixed-geometry deposits cannot express a mid-file resolution
    // switch; surface the same signal as the serial bulk path. Frames
    // before the switch still drain (error_frame_ watermark).
    fail(TS_RENEGOTIATE, frame_idx);
    return TS_RENEGOTIATE;
  } else {
    rc = PackFrameNV12(f, slot.y.data(), slot.uv.data(), &scratch.sws);
  }
  if (rc < 0) return rc;
  {
    std::lock_guard<std::mutex> lk(mu_);
    slot.frame = frame_idx;
    deposited_.fetch_add(1);
  }
  cons_cv_.notify_all();
  return TS_OK;
}

int SegmentedReader::GetBatch(int count, uint8_t* out_y, uint8_t* out_uv,
                              int* first_index) {
  size_t ys = static_cast<size_t>(outWidth()) * outHeight();
  size_t uvs = ys / 2;
  int copied = 0;
  std::unique_lock<std::mutex> lk(mu_);
  if (first_index) *first_index = static_cast<int>(cursor_ + 1);
  while (copied < count) {
    DepSlot& slot = window_[cursor_ % window_.size()];
    if (slot.frame != cursor_) {
      if (stopped_) return copied;
      bool all_done =
          started_ && done_workers_ == static_cast<int>(threads_.size());
      // Drain continuously up to the break point before surfacing the
      // error (a late consumer still gets every pre-switch frame).
      if (error_ && (cursor_ >= error_frame_ || all_done))
        return copied > 0 ? copied : error_;
      if (all_done) return copied;  // clean end of stream
      cons_cv_.wait(lk);
      continue;
    }
    std::memcpy(out_y + static_cast<size_t>(copied) * ys, slot.y.data(), ys);
    std::memcpy(out_uv + static_cast<size_t>(copied) * uvs, slot.uv.data(),
                uvs);
    slot.frame = -1;
    cursor_++;
    copied++;
    prod_cv_.notify_all();
  }
  return copied;
}

void SegmentedReader::Stop() {
  {
    std::lock_guard<std::mutex> lk(mu_);
    stopped_ = true;
  }
  prod_cv_.notify_all();
  cons_cv_.notify_all();
  for (auto& t : threads_) t.join();
  threads_.clear();
}

}  // namespace ts

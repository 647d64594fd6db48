#include "clip_reader.h"

#include <algorithm>
#include <cstring>
#include <thread>
#include <vector>

#include "nv12_pack.h"

namespace ts {

ClipReader::~ClipReader() {
  if (codecpar_) avcodec_parameters_free(&codecpar_);
}

int ClipReader::Init(const ClipReaderParams& params,
                     std::shared_ptr<Logger> logger) {
  params_ = params;
  if (params_.workers < 1) params_.workers = 1;
  logger_ = std::move(logger);
  if (params_.dst_width % 2 || params_.dst_height % 2) return TS_ERROR;
  StreamScan scan;
  int sts = ScanStream(params_.input, logger_, &scan);
  if (sts != TS_OK) return sts;
  segments_ = std::move(scan.segments);
  codecpar_ = scan.codecpar;
  scan.codecpar = nullptr;  // ownership moves to the reader
  codec_id_ = scan.codec_id;
  width_ = scan.width;
  height_ = scan.height;
  byte_seek_ = scan.byte_seek;
  total_frames_ = scan.total_frames;
  if (logger_)
    logger_->log("ClipReader: " + std::to_string(total_frames_) + " frames, " +
                     std::to_string(segments_.size()) + " entry points",
                 LOG_MEDIUM);
  return TS_OK;
}

int ClipReader::depositFrame(Worker& w, const AVFrame* f, uint8_t* y,
                             uint8_t* uv) {
  if (params_.dst_width)
    return ResizeDepositNV12(f, y, uv, params_.dst_width, params_.dst_height,
                             static_cast<HostResizeAlgo>(params_.resize_algo),
                             w.scratch);
  // Fixed-geometry deposits cannot express a mid-file resolution switch;
  // surface the same signal as the serial bulk path.
  if (f->width != width_ || f->height != height_) return TS_RENEGOTIATE;
  return PackFrameNV12(f, y, uv, &w.scratch.sws);
}

int ClipReader::decodeClip(Worker& w, int64_t start, int clip_len, int stride,
                           uint8_t* out_y, uint8_t* out_uv) {
  const int64_t last = start + static_cast<int64_t>(clip_len - 1) * stride;
  // Entry point: greatest keyframe segment with first_frame <= start.
  auto it = std::upper_bound(
      segments_.begin(), segments_.end(), start,
      [](int64_t v, const SegmentChunk& s) { return v < s.first_frame; });
  const SegmentChunk& seg = *(it - 1);  // segments_[0].first_frame == 0

  AVFormatContext* fmt = w.dec.fmt;
  AVCodecContext* ctx = w.dec.ctx;
  const int vi = w.dec.video_index;
  // Ride forward without a seek when the decoder already sits in
  // [entry keyframe, start] — never more warm-up than a fresh seek, and
  // sorted samplers decode each frame exactly once.
  const bool cont = w.next_frame >= 0 && w.next_frame <= start &&
                    w.next_frame >= seg.first_frame;
  int64_t pos;          // global index of the next decoded output frame
  bool seen_first;      // container seeks land at-or-before the keyframe
  if (cont) {
    pos = w.next_frame;
    seen_first = true;
  } else {
    int sts = byte_seek_
                  ? av_seek_frame(fmt, vi, seg.byte_pos, AVSEEK_FLAG_BYTE)
                  : av_seek_frame(fmt, vi, seg.pts, AVSEEK_FLAG_BACKWARD);
    if (sts < 0) return sts;
    avcodec_flush_buffers(ctx);
    pos = seg.first_frame;
    seen_first = byte_seek_;
  }
  w.next_frame = -1;  // invalidated until this clip completes cleanly

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  if (!pkt || !frame) {
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
    return TS_ERROR;
  }
  const size_t ys = static_cast<size_t>(outWidth()) * outHeight();
  int rc = TS_OK;
  // Cold start at a CRA entry: the decoder drops the RASL itself but
  // outputs the RADL leading pictures, which display BEFORE the entry —
  // discard them without advancing pos. A riding decoder is mid-stream
  // and sees every leading picture in display order (no discard).
  int skip = cont ? 0 : seg.lead_skip;

  auto take = [&](const AVFrame* f) -> int {
    frames_decoded_.fetch_add(1, std::memory_order_relaxed);
    if (skip > 0) {
      skip--;
      return TS_OK;
    }
    if (pos >= start && pos <= last && (pos - start) % stride == 0) {
      const size_t slot = static_cast<size_t>((pos - start) / stride);
      int r = depositFrame(w, f, out_y + slot * ys, out_uv + slot * (ys / 2));
      if (r < 0) return r;
    }
    pos++;
    return TS_OK;
  };
  auto drain_ready = [&]() -> int {
    while (pos <= last) {
      int r = avcodec_receive_frame(ctx, frame);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return TS_OK;
      if (r < 0) return r;
      r = take(frame);
      av_frame_unref(frame);
      if (r < 0) return r;
    }
    return TS_OK;
  };

  bool eof = false;
  while (pos <= last && rc == TS_OK) {
    int sts = av_read_frame(fmt, pkt);
    if (sts == AVERROR_EOF) {
      eof = true;
      break;
    }
    if (sts < 0) {
      rc = sts;
      break;
    }
    if (pkt->stream_index != vi) {
      av_packet_unref(pkt);
      continue;
    }
    if (!seen_first) {
      const int64_t t = pkt->pts != AV_NOPTS_VALUE ? pkt->pts : pkt->dts;
      if (t != seg.pts) {
        av_packet_unref(pkt);
        continue;
      }
      seen_first = true;
    }
    sts = avcodec_send_packet(ctx, pkt);
    if (sts == AVERROR(EAGAIN)) {
      rc = drain_ready();
      if (rc == TS_OK) sts = avcodec_send_packet(ctx, pkt);
    }
    av_packet_unref(pkt);
    if (rc == TS_OK && sts < 0 && sts != AVERROR(EAGAIN)) rc = sts;
    if (rc == TS_OK) rc = drain_ready();
  }
  if (rc == TS_OK && eof && pos <= last) {
    // Tail clip: the last frames are still delayed in the codec.
    avcodec_send_packet(ctx, nullptr);
    while (pos <= last) {
      int sts = avcodec_receive_frame(ctx, frame);
      if (sts < 0) break;
      rc = take(frame);
      av_frame_unref(frame);
      if (rc < 0) break;
    }
    avcodec_flush_buffers(ctx);  // codec saw EOF; reset for the next seek
  }
  av_packet_free(&pkt);
  av_frame_free(&frame);
  if (rc < 0) return rc;
  if (pos <= last) {
    if (logger_)
      logger_->log("ClipReader: clip at " + std::to_string(start) +
                       " ended early at frame " + std::to_string(pos),
                   LOG_LOW);
    return TS_ERROR;  // scan promised these frames; a hole is corruption
  }
  if (!eof) w.next_frame = pos;  // decoder is live mid-stream; reusable
  return TS_OK;
}

int ClipReader::GetClipBatch(const int64_t* starts, int n_clips, int clip_len,
                             int stride, uint8_t* out_y, uint8_t* out_uv) {
  if (n_clips < 1 || clip_len < 1 || stride < 1 || !starts) return TS_ERROR;
  for (int i = 0; i < n_clips; i++) {
    const int64_t lastf =
        starts[i] + static_cast<int64_t>(clip_len - 1) * stride;
    if (starts[i] < 0 || lastf >= total_frames_) return TS_ERROR;
  }
  // Decode in ASCENDING start order (outputs still land in the caller's
  // slot order): nearby clips assign to the same pass direction, so a
  // worker whose decoder sits just behind the next task rides forward
  // instead of seek+warm-up. Duplicate starts (e.g. a partial batch
  // padded by repeating a clip) decode once and memcpy after.
  std::vector<int> order(n_clips);
  for (int i = 0; i < n_clips; i++) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return starts[a] < starts[b]; });
  std::vector<int> tasks;       // slots to decode (first of each run)
  std::vector<int> dup_of(n_clips, -1);  // slot -> canonical slot
  tasks.reserve(n_clips);
  for (int k = 0; k < n_clips; k++) {
    if (k > 0 && starts[order[k]] == starts[order[k - 1]])
      dup_of[order[k]] = dup_of[order[k - 1]] >= 0 ? dup_of[order[k - 1]]
                                                   : order[k - 1];
    else
      tasks.push_back(order[k]);
  }
  const int n_tasks = static_cast<int>(tasks.size());
  // Group consecutive tasks into RIDE CHAINS — runs where each next
  // clip is reachable by decoding forward from the previous clip's end
  // (its entry keyframe is at-or-before the rider's position, exactly
  // decodeClip's no-seek condition). One chain = one unit of work, so
  // with multiple workers the clips of a GOP stay on ONE decoder and
  // each chain's frames decode exactly once; without grouping the
  // dynamic task counter splits a GOP's clips across workers, each
  // paying keyframe warm-up for frames a sibling already decoded.
  std::vector<int> chain_begin;  // indices into `tasks`; ends implicit
  chain_begin.reserve(n_tasks);
  for (int t = 0; t < n_tasks; t++) {
    if (t == 0) {
      chain_begin.push_back(0);
      continue;
    }
    const int64_t prev_end =
        starts[tasks[t - 1]] + static_cast<int64_t>(clip_len - 1) * stride + 1;
    const int64_t s = starts[tasks[t]];
    auto it = std::upper_bound(
        segments_.begin(), segments_.end(), s,
        [](int64_t v, const SegmentChunk& c) { return v < c.first_frame; });
    const int64_t entry = (it - 1)->first_frame;
    if (!(prev_end <= s && prev_end >= entry)) chain_begin.push_back(t);
  }
  const int n_chains = static_cast<int>(chain_begin.size());
  const int nw = std::min(params_.workers, n_chains);
  while (static_cast<int>(pool_.size()) < nw)
    pool_.emplace_back(new Worker());
  std::atomic<int> next{0};
  std::atomic<int> error{0};
  const size_t clip_y = static_cast<size_t>(outWidth()) * outHeight() *
                        static_cast<size_t>(clip_len);
  auto run = [&](int wi) {
    Worker& w = *pool_[wi];
    if (!w.open) {
      if (OpenWorkerDecoder(params_.input, codec_id_, codecpar_,
                            params_.decode_threads, params_.fast_decode,
                            &w.dec) != TS_OK) {
        int expected = 0;
        error.compare_exchange_strong(expected, TS_ERROR);
        return;
      }
      w.open = true;
    }
    while (!error.load(std::memory_order_relaxed)) {
      const int c = next.fetch_add(1);
      if (c >= n_chains) break;
      const int end = c + 1 < n_chains ? chain_begin[c + 1] : n_tasks;
      for (int t = chain_begin[c]; t < end; t++) {
        const int i = tasks[t];
        int rc = decodeClip(w, starts[i], clip_len, stride,
                            out_y + static_cast<size_t>(i) * clip_y,
                            out_uv + static_cast<size_t>(i) * (clip_y / 2));
        if (rc != TS_OK) {
          w.next_frame = -1;
          int expected = 0;
          error.compare_exchange_strong(expected, rc ? rc : TS_ERROR);
          break;
        }
      }
      if (error.load(std::memory_order_relaxed)) break;
    }
  };
  if (nw == 1) {
    run(0);
  } else {
    std::vector<std::thread> threads;
    for (int i = 0; i < nw; i++)
      threads.emplace_back([&run, i] {
        char name[16];
        std::snprintf(name, sizeof(name), "ts-clip-w%d", i);
        setThreadName(name);
        run(i);
      });
    for (auto& t : threads) t.join();
  }
  const int rc = error.load();
  if (rc == TS_OK) {
    for (int i = 0; i < n_clips; i++) {
      if (dup_of[i] < 0) continue;
      const int src = dup_of[i];
      std::memcpy(out_y + static_cast<size_t>(i) * clip_y,
                  out_y + static_cast<size_t>(src) * clip_y, clip_y);
      std::memcpy(out_uv + static_cast<size_t>(i) * (clip_y / 2),
                  out_uv + static_cast<size_t>(src) * (clip_y / 2),
                  clip_y / 2);
    }
  }
  return rc;
}

}  // namespace ts

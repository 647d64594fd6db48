#include "parser.h"

#include <pthread.h>

namespace ts {

std::atomic<int> g_timeout_ms{-1};

void setThreadName(const char* name) {
  // Linux truncates at 15 chars + NUL; ignore errors (purely cosmetic).
  pthread_setname_np(pthread_self(), name);
}

int Parser::interruptCallback(void* opaque) {
  auto* self = static_cast<Parser*>(opaque);
  // Abort any blocking avformat call (open/probe/read) when the owning
  // pipeline is shutting down — without this, Stop() during a reconnect
  // whose server accepts but never sends data would hang in
  // avformat_open_input forever (no read timeout is set by default).
  const std::atomic<bool>* alive = self->keep_running_;
  if (alive && !alive->load(std::memory_order_relaxed)) return 1;
  int timeout = g_timeout_ms.load(std::memory_order_relaxed);
  if (timeout < 0) return 0;
  auto elapsed = std::chrono::duration_cast<std::chrono::milliseconds>(
                     std::chrono::steady_clock::now() - self->last_packet_time_)
                     .count();
  return elapsed > timeout ? 1 : 0;
}

int Parser::Init(const ParserParams& params, std::shared_ptr<Logger> logger) {
  Span span(logger.get(), "Parser::Init");
  params_ = params;
  logger_ = std::move(logger);

  AVDictionary* opts = nullptr;
  av_dict_set(&opts, "rtsp_transport", "tcp", 0);
  for (const auto& kv : params_.format_opts)
    av_dict_set(&opts, kv.first.c_str(), kv.second.c_str(), 0);
  fmt_ = avformat_alloc_context();
  if (!fmt_) return TS_ERROR;
  // From here on there are resources to free: mark open so a failed
  // partial Init can still be torn down by Close() (otherwise a
  // reconnect retry loop would leak one AVFormatContext + socket per
  // failed attempt).
  closed_ = false;
  if (!params_.keep_buffer) fmt_->flags |= AVFMT_FLAG_NOBUFFER;
  last_packet_time_ = std::chrono::steady_clock::now();
  fmt_->interrupt_callback.callback = &Parser::interruptCallback;
  fmt_->interrupt_callback.opaque = this;

  int sts = avformat_open_input(&fmt_, params_.input.c_str(), nullptr, &opts);
  // avformat leaves unrecognized options in the dict: surface them (a
  // typo'd format_options key would otherwise fail silently — e.g.
  // "rtsp_flag" opening in client mode instead of listening).
  if (logger_) {
    const AVDictionaryEntry* left = nullptr;
    while ((left = av_dict_get(opts, "", left, AV_DICT_IGNORE_SUFFIX)))
      logger_->log(std::string("Parser: option not consumed by demuxer: ") +
                       left->key,
                   LOG_LOW);
  }
  av_dict_free(&opts);
  if (sts < 0) {
    if (logger_) logger_->log("Parser: cannot open input " + params_.input, LOG_LOW);
    return sts;
  }
  sts = avformat_find_stream_info(fmt_, nullptr);
  if (sts < 0) return sts;
  const AVCodec* codec = nullptr;
  video_index_ = av_find_best_stream(fmt_, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (video_index_ < 0) return TS_ERROR;
  video_stream_ = fmt_->streams[video_index_];
  width_ = video_stream_->codecpar->width;
  height_ = video_stream_->codecpar->height;
  is_h264_ = video_stream_->codecpar->codec_id == AV_CODEC_ID_H264;
  is_hevc_ = video_stream_->codecpar->codec_id == AV_CODEC_ID_HEVC;
  is_vp9_ = video_stream_->codecpar->codec_id == AV_CODEC_ID_VP9;
  is_av1_ = video_stream_->codecpar->codec_id == AV_CODEC_ID_AV1;

  if (params_.enable_dumps) {
    const char* dump_name = "bitstream.h264";
    sts = avformat_alloc_output_context2(&dump_ctx_, nullptr, nullptr, dump_name);
    if (sts < 0) return sts;
    AVStream* out = avformat_new_stream(dump_ctx_, nullptr);
    if (!out) return TS_ERROR;
    avcodec_parameters_copy(out->codecpar, video_stream_->codecpar);
    if (!(dump_ctx_->oformat->flags & AVFMT_NOFILE)) {
      sts = avio_open(&dump_ctx_->pb, dump_name, AVIO_FLAG_WRITE);
      if (sts < 0) return sts;
    }
    sts = avformat_write_header(dump_ctx_, nullptr);
    if (sts < 0) return sts;
    dump_header_written_ = true;
  }

  if (is_h264_ || is_hevc_) {
    const AVBitStreamFilter* filter = av_bsf_get_by_name(
        is_h264_ ? "h264_mp4toannexb" : "hevc_mp4toannexb");
    if (filter) {
      sts = av_bsf_alloc(filter, &bsf_);
      if (sts < 0) return sts;
      avcodec_parameters_copy(bsf_->par_in, video_stream_->codecpar);
      bsf_->time_base_in = video_stream_->time_base;
      sts = av_bsf_init(bsf_);
      if (sts < 0) return sts;
    }
  }
  annexb_ = av_packet_alloc();
  last_ = av_packet_alloc();
  last_taken_ = true;
  return TS_OK;
}

int Parser::Seek(int64_t ts) {
  if (!fmt_) return TS_ERROR;
  // Raw elementary streams (h264/hevc annexb, ivf-less) only carry a
  // generic on-the-fly index: av_seek_frame "succeeds" but lands blind
  // before any packets were read. Report unsupported so the caller
  // falls back to exact decode-and-discard from the start.
  if (fmt_->iformat && (fmt_->iformat->flags & AVFMT_GENERIC_INDEX))
    return TS_UNSUPPORTED;
  int sts = av_seek_frame(fmt_, video_index_, ts, AVSEEK_FLAG_BACKWARD);
  if (sts < 0) return sts;
  last_taken_ = true;
  return TS_OK;
}

int64_t Parser::startTime() const {
  if (video_stream_ && video_stream_->start_time != AV_NOPTS_VALUE)
    return video_stream_->start_time;
  return 0;
}

int Parser::Read() {
  Span span(logger_ ? logger_.get() : nullptr, "Parser::Read");
  while (true) {
    int sts = av_read_frame(fmt_, last_);
    last_packet_time_ = std::chrono::steady_clock::now();
    if (sts == AVERROR_EOF && params_.loop) {
      if (av_seek_frame(fmt_, video_index_, 0,
                        AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_BYTE) < 0 &&
          av_seek_frame(fmt_, video_index_, 0, AVSEEK_FLAG_BACKWARD) < 0)
        return TS_EOF;
      continue;
    }
    if (sts == AVERROR_EOF) return TS_EOF;
    if (sts == AVERROR_EXIT) return TS_TIMEOUT;
    if (sts < 0) return sts;
    if (last_->stream_index != video_index_) {
      av_packet_unref(last_);
      continue;
    }
    frames_read_++;
    last_taken_ = false;
    if (dump_ctx_) {
      last_->stream_index = 0;
      av_write_frame(dump_ctx_, last_);
      last_->stream_index = video_index_;
    }
    return TS_OK;
  }
}

int Parser::Get(AVPacket* output) {
  if (!last_taken_ && last_->stream_index == video_index_) {
    av_packet_ref(output, last_);
    av_packet_unref(last_);
    last_taken_ = true;
  }
  return TS_OK;
}

int Parser::Analyze(const AVPacket* pkt) {
  Span span(logger_ ? logger_.get() : nullptr, "Parser::Analyze");
  const uint8_t* data = pkt->data;
  int size = pkt->size;
  if (bsf_) {
    AVPacket* clone = av_packet_clone(pkt);
    int sts = av_bsf_send_packet(bsf_, clone);
    av_packet_free(&clone);
    if (sts < 0) return sts;
    sts = av_bsf_receive_packet(bsf_, annexb_);
    if (sts < 0) return sts;
    if (annexb_->data) {
      data = annexb_->data;
      size = annexb_->size;
    }
  }
  if (!data) return TS_OK;
  int result;
  if (is_h264_)
    result = analyzer_.analyze(data, size);
  else if (is_hevc_)
    result = hevc_analyzer_.analyze(data, size);
  else if (is_vp9_)
    result = vp9_analyzer_.analyze(data, size);
  else if (is_av1_)
    result = av1_analyzer_.analyze(data, size);
  else
    return TS_OK;
  if (bsf_) av_packet_unref(annexb_);
  if (result > 0 && logger_) {
    logger_->log("[PARSING] bitstream issue detected, mask=" + std::to_string(result),
                 LOG_LOW);
  }
  return result;
}

// Served from the init-time cache, not the live AVStream: the C-ABI
// accessors are lock-free and a reconnect replaces the stream objects on
// the producer thread.
int Parser::width() const { return width_.load(std::memory_order_relaxed); }
int Parser::height() const { return height_.load(std::memory_order_relaxed); }
const AVCodecParameters* Parser::codecpar() const {
  return video_stream_ ? video_stream_->codecpar : nullptr;
}
AVRational Parser::frameRate() const {
  return video_stream_ ? video_stream_->avg_frame_rate : AVRational{0, 1};
}
AVRational Parser::guessedFrameRate() const {
  return video_stream_ ? video_stream_->r_frame_rate : AVRational{0, 1};
}
AVRational Parser::timeBase() const {
  return video_stream_ ? video_stream_->time_base : AVRational{1, 1000};
}

void Parser::Close() {
  if (closed_) return;
  if (bsf_) av_bsf_free(&bsf_);
  if (dump_ctx_) {
    if (dump_header_written_) av_write_trailer(dump_ctx_);
    if (!(dump_ctx_->oformat->flags & AVFMT_NOFILE) && dump_ctx_->pb)
      avio_closep(&dump_ctx_->pb);
    avformat_free_context(dump_ctx_);
    dump_ctx_ = nullptr;
    dump_header_written_ = false;
  }
  if (fmt_) avformat_close_input(&fmt_);
  // video_stream_ pointed into fmt_, which is gone now — null it so the
  // width()/height()/codecpar() accessors cannot read freed memory.
  video_stream_ = nullptr;
  video_index_ = -1;
  if (last_) av_packet_free(&last_);
  if (annexb_) av_packet_free(&annexb_);
  closed_ = true;
}

int Parser::Reopen() {
  // Tears the demuxer down and re-runs Init with the stored parameters —
  // the elastic-recovery hook for live sources whose connection died
  // (the reference declared Parser::Reset but never implemented it,
  // include/Parser.h:104). Dump taps are not re-opened (enable_dumps
  // would truncate the first connection's bitstream.h264).
  ParserParams params = params_;
  params.enable_dumps = false;
  auto logger = logger_;
  Close();
  // The restarted source's frame_num/POC/order_hint spaces restart too:
  // clear the continuity watermarks so the reconnect itself does not
  // surface as spurious FRAME_NUM/B_POC drop codes in analyze_errors.
  analyzer_.reset();
  hevc_analyzer_.reset();
  vp9_analyzer_.reset();
  av1_analyzer_.reset();
  return Init(params, logger);
}

}  // namespace ts

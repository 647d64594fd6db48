#include "video_writer.h"

#include <cstring>

namespace ts {

int VideoWriter::Init(const WriterParams& params) {
  params_ = params;
  if (params_.width <= 0 || params_.height <= 0 || params_.width % 2 ||
      params_.height % 2)
    return TS_ERROR;  // encoders want even 4:2:0 geometry
  int sts = avformat_alloc_output_context2(&fmt_, nullptr, nullptr,
                                           params_.path.c_str());
  if (sts < 0 || !fmt_) return sts < 0 ? sts : TS_ERROR;
  const AVCodec* codec = avcodec_find_encoder_by_name(params_.codec.c_str());
  if (!codec) return TS_UNSUPPORTED;
  stream_ = avformat_new_stream(fmt_, nullptr);
  ctx_ = avcodec_alloc_context3(codec);
  if (!stream_ || !ctx_) return TS_ERROR;
  ctx_->width = params_.width;
  ctx_->height = params_.height;
  ctx_->time_base = {params_.fps_den, params_.fps_num};
  ctx_->framerate = {params_.fps_num, params_.fps_den};
  ctx_->pix_fmt = AV_PIX_FMT_YUV420P;
  ctx_->bit_rate = params_.bitrate;
  ctx_->gop_size = params_.gop;
  if (fmt_->oformat->flags & AVFMT_GLOBALHEADER)
    ctx_->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  sts = avcodec_open2(ctx_, codec, nullptr);
  if (sts < 0) return sts;
  sts = avcodec_parameters_from_context(stream_->codecpar, ctx_);
  if (sts < 0) return sts;
  stream_->time_base = ctx_->time_base;
  if (!(fmt_->oformat->flags & AVFMT_NOFILE)) {
    sts = avio_open(&fmt_->pb, params_.path.c_str(), AVIO_FLAG_WRITE);
    if (sts < 0) return sts;
  }
  sts = avformat_write_header(fmt_, nullptr);
  if (sts < 0) return sts;
  header_ = true;
  frame_ = av_frame_alloc();
  pkt_ = av_packet_alloc();
  if (!frame_ || !pkt_) return TS_ERROR;
  frame_->format = AV_PIX_FMT_YUV420P;
  frame_->width = params_.width;
  frame_->height = params_.height;
  sts = av_frame_get_buffer(frame_, 0);
  if (sts < 0) return sts;
  open_ = true;
  return TS_OK;
}

int VideoWriter::encodeFrame(AVFrame* frame) {
  int sts = avcodec_send_frame(ctx_, frame);
  if (sts < 0) return sts;
  while (true) {
    sts = avcodec_receive_packet(ctx_, pkt_);
    if (sts == AVERROR(EAGAIN) || sts == AVERROR_EOF) return TS_OK;
    if (sts < 0) return sts;
    av_packet_rescale_ts(pkt_, ctx_->time_base, stream_->time_base);
    if (pkt_->duration <= 0) {
      // One 1/fps tick: without a sample duration the mov muxer's edit
      // list trims the final frame from the edited range and decoders
      // drop it.
      pkt_->duration = av_rescale_q(1, ctx_->time_base, stream_->time_base);
    }
    pkt_->stream_index = stream_->index;
    sts = av_interleaved_write_frame(fmt_, pkt_);
    if (sts < 0) return sts;
  }
}

int VideoWriter::WriteRGB(const uint8_t* rgb) {
  if (!open_) return TS_ERROR;
  int sts = av_frame_make_writable(frame_);
  if (sts < 0) return sts;
  sws_ = sws_getCachedContext(sws_, params_.width, params_.height,
                              AV_PIX_FMT_RGB24, params_.width,
                              params_.height, AV_PIX_FMT_YUV420P,
                              SWS_POINT, nullptr, nullptr, nullptr);
  if (!sws_) return TS_ERROR;
  const uint8_t* src[1] = {rgb};
  int src_ls[1] = {3 * params_.width};
  sws_scale(sws_, src, src_ls, 0, params_.height, frame_->data,
            frame_->linesize);
  frame_->pts = n_in_++;
  return encodeFrame(frame_);
}

int VideoWriter::WriteNV12(const uint8_t* y, const uint8_t* uv) {
  if (!open_) return TS_ERROR;
  int sts = av_frame_make_writable(frame_);
  if (sts < 0) return sts;
  const int w = params_.width, h = params_.height;
  for (int i = 0; i < h; i++)
    std::memcpy(frame_->data[0] + static_cast<size_t>(i) * frame_->linesize[0],
                y + static_cast<size_t>(i) * w, w);
  // De-interleave UV into the planar encoder frame.
  for (int i = 0; i < h / 2; i++) {
    const uint8_t* src = uv + static_cast<size_t>(i) * w;
    uint8_t* du =
        frame_->data[1] + static_cast<size_t>(i) * frame_->linesize[1];
    uint8_t* dv =
        frame_->data[2] + static_cast<size_t>(i) * frame_->linesize[2];
    for (int j = 0; j < w / 2; j++) {
      du[j] = src[2 * j];
      dv[j] = src[2 * j + 1];
    }
  }
  frame_->pts = n_in_++;
  return encodeFrame(frame_);
}

int VideoWriter::Close() {
  int sts = TS_OK;
  if (open_) {
    open_ = false;
    sts = encodeFrame(nullptr);  // drain the encoder
  }
  if (header_) {
    header_ = false;
    av_write_trailer(fmt_);
  }
  if (sws_) {
    sws_freeContext(sws_);
    sws_ = nullptr;
  }
  if (pkt_) av_packet_free(&pkt_);
  if (frame_) av_frame_free(&frame_);
  if (ctx_) avcodec_free_context(&ctx_);
  if (fmt_) {
    if (!(fmt_->oformat->flags & AVFMT_NOFILE) && fmt_->pb)
      avio_closep(&fmt_->pb);
    avformat_free_context(fmt_);
    fmt_ = nullptr;
  }
  stream_ = nullptr;
  return sts;
}

}  // namespace ts

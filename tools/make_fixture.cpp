// Regenerates the reference's missing 720x480 250-frame H.264 fixture
// (reference: .MISSING_LARGE_BLOBS declares tests/resources/
// bbb_720x480_RGB24_250.h264 absent; the FrameRate tests need a 250-frame
// 25 fps stream). Encodes synthetic moving-gradient frames with libx264
// into a raw Annex-B elementary stream.
//
//   g++ -O2 -std=c++20 make_fixture.cpp -lavcodec -lavutil -o make_fixture
//   ./make_fixture out.h264 [frames=250] [w=720] [h=480] [fps=25] [codec=libx264] [pix_fmt=yuv420p]
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
}

static void fill_frame(AVFrame* f, int index) {
  const int w = f->width, h = f->height;
  // 10-bit planar formats store little-endian uint16 samples; 8-bit
  // values are shifted up by 2 so both depths paint the same picture.
  const bool ten_bit = f->format == AV_PIX_FMT_YUV420P10;
  // Smooth moving diagonal gradient + a drifting bright square: cheap to
  // encode, exercises inter prediction, deterministic.
  for (int y = 0; y < h; y++) {
    uint8_t* row = f->data[0] + static_cast<size_t>(y) * f->linesize[0];
    for (int x = 0; x < w; x++) {
      int v8 = (x + y + 2 * index) & 0xFF;
      if (ten_bit)
        reinterpret_cast<uint16_t*>(row)[x] = static_cast<uint16_t>(v8 << 2);
      else
        row[x] = static_cast<uint8_t>(v8);
    }
  }
  for (int y = 0; y < h / 2; y++) {
    uint8_t* u = f->data[1] + static_cast<size_t>(y) * f->linesize[1];
    uint8_t* v = f->data[2] + static_cast<size_t>(y) * f->linesize[2];
    for (int x = 0; x < w / 2; x++) {
      int u8v = static_cast<int>(128 + 40 * std::sin(0.05 * (x + index)));
      int v8v = static_cast<int>(128 + 40 * std::cos(0.04 * (y + index)));
      if (ten_bit) {
        reinterpret_cast<uint16_t*>(u)[x] = static_cast<uint16_t>(u8v << 2);
        reinterpret_cast<uint16_t*>(v)[x] = static_cast<uint16_t>(v8v << 2);
      } else {
        u[x] = static_cast<uint8_t>(u8v);
        v[x] = static_cast<uint8_t>(v8v);
      }
    }
  }
  const int sq = 64, sx = (8 * index) % (w - sq), sy = (3 * index) % (h - sq);
  for (int y = sy; y < sy + sq; y++) {
    uint8_t* row = f->data[0] + static_cast<size_t>(y) * f->linesize[0];
    if (ten_bit)
      for (int x = sx; x < sx + sq; x++)
        reinterpret_cast<uint16_t*>(row)[x] = 235 << 2;
    else
      std::memset(row + sx, 235, sq);
  }
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s out.bin [frames] [w] [h] [fps] [codec=libx264] [pix_fmt=yuv420p]\n", argv[0]);
    return 1;
  }
  const char* out_path = argv[1];
  const int frames = argc > 2 ? std::atoi(argv[2]) : 250;
  const int w = argc > 3 ? std::atoi(argv[3]) : 720;
  const int h = argc > 4 ? std::atoi(argv[4]) : 480;
  const int fps = argc > 5 ? std::atoi(argv[5]) : 25;

  const char* codec_name = argc > 6 ? argv[6] : "libx264";
  const char* pix_fmt_name = argc > 7 ? argv[7] : "yuv420p";
  // Optional VUI colorimetry tag: "bt709", "full", or "bt709full" —
  // written into the bitstream's VUI by the encoder so decoders (and the
  // ColorStandard.AUTO detection) can recover it.
  const char* color_tag = argc > 8 ? argv[8] : "";
  const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) {
    std::fprintf(stderr, "encoder %s not available\n", codec_name);
    return 1;
  }
  const bool is_x26x = std::strstr(codec_name, "x26") != nullptr;
  // VP9/AV1 elementary streams are not self-framing; wrap them in IVF
  // (32-byte header + 12-byte frame headers), which avformat demuxes.
  const bool ivf = std::strstr(out_path, ".ivf") != nullptr;
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  ctx->width = w;
  ctx->height = h;
  ctx->time_base = {1, fps};
  ctx->framerate = {fps, 1};
  ctx->pix_fmt = av_get_pix_fmt(pix_fmt_name);
  if (ctx->pix_fmt == AV_PIX_FMT_NONE) {
    std::fprintf(stderr, "unknown pix_fmt %s\n", pix_fmt_name);
    return 1;
  }
  ctx->gop_size = 25;
  if (std::strstr(color_tag, "709")) {
    ctx->colorspace = AVCOL_SPC_BT709;
    ctx->color_primaries = AVCOL_PRI_BT709;
    ctx->color_trc = AVCOL_TRC_BT709;
  }
  if (std::strstr(color_tag, "full")) ctx->color_range = AVCOL_RANGE_JPEG;
  if (is_x26x) {
    ctx->max_b_frames = 2;  // exercises the analyzer's POC/reorder checks
    av_opt_set(ctx->priv_data, "preset", "veryfast", 0);
    av_opt_set(ctx->priv_data, "crf", "23", 0);
    // Optional raw x264-params/x265-params string (argv[9]), e.g.
    // "open-gop=1:bframes=3:b-adapt=0:keyint=24:min-keyint=24" to force
    // CRA entries with RASL leading pictures (open-GOP random access).
    if (argc > 9 && argv[9][0]) {
      av_opt_set(ctx->priv_data,
                 std::strstr(codec_name, "x265") ? "x265-params"
                                                 : "x264-params",
                 argv[9], 0);
    }
  } else {
    av_opt_set(ctx->priv_data, "deadline", "realtime", 0);  // vp9
    av_opt_set(ctx->priv_data, "cpu-used", "8", 0);         // vp9/av1
    av_opt_set(ctx->priv_data, "usage", "realtime", 0);     // av1
  }
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    std::fprintf(stderr, "encoder open failed\n");
    return 1;
  }

  FILE* out = std::fopen(out_path, "wb");
  int written = 0;
  if (ivf) {
    uint8_t hdr[32] = {'D', 'K', 'I', 'F', 0, 0, 32, 0};
    const char* fourcc = std::strstr(codec_name, "vp9") ? "VP90" : "AV01";
    std::memcpy(hdr + 8, fourcc, 4);
    auto le16 = [&](int off, uint32_t v) {
      hdr[off] = v & 0xFF;
      hdr[off + 1] = (v >> 8) & 0xFF;
    };
    auto le32 = [&](int off, uint32_t v) {
      le16(off, v & 0xFFFF);
      le16(off + 2, v >> 16);
    };
    le16(12, w);
    le16(14, h);
    le32(16, fps);  // timebase denominator
    le32(20, 1);    // timebase numerator
    le32(24, frames);
    std::fwrite(hdr, 1, 32, out);
  }
  AVFrame* frame = av_frame_alloc();
  frame->format = ctx->pix_fmt;
  frame->width = w;
  frame->height = h;
  av_frame_get_buffer(frame, 0);
  AVPacket* pkt = av_packet_alloc();

  auto drain = [&](AVFrame* f) {
    avcodec_send_frame(ctx, f);
    while (avcodec_receive_packet(ctx, pkt) == 0) {
      if (ivf) {
        uint8_t fh[12] = {0};
        uint32_t sz = static_cast<uint32_t>(pkt->size);
        uint64_t pts = static_cast<uint64_t>(pkt->pts);
        for (int b = 0; b < 4; b++) fh[b] = (sz >> (8 * b)) & 0xFF;
        for (int b = 0; b < 8; b++) fh[4 + b] = (pts >> (8 * b)) & 0xFF;
        std::fwrite(fh, 1, 12, out);
      }
      std::fwrite(pkt->data, 1, pkt->size, out);
      written++;
      av_packet_unref(pkt);
    }
  };
  for (int i = 0; i < frames; i++) {
    av_frame_make_writable(frame);
    fill_frame(frame, i);
    frame->pts = i;
    drain(frame);
  }
  drain(nullptr);  // flush

  if (ivf) {
    // Patch the real packet count into the header (encoders may emit a
    // different number than requested frames).
    std::fseek(out, 24, SEEK_SET);
    uint8_t cnt[4];
    for (int b = 0; b < 4; b++)
      cnt[b] = (static_cast<uint32_t>(written) >> (8 * b)) & 0xFF;
    std::fwrite(cnt, 1, 4, out);
  }
  std::fclose(out);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  avcodec_free_context(&ctx);
  std::printf("wrote %d frames %dx%d@%d to %s\n", frames, w, h, fps, out_path);
  return 0;
}

// Loopback live-source for tests: serves a local video file as a live
// rtmp:// or rtsp:// stream using libavformat's native protocol
// implementations (no external ffmpeg binary needed). The reference's
// default ingest is an rtmp:// URL (python_examples/simple.py:24); this
// tool lets the suite exercise those demuxer handshakes end-to-end
// against 127.0.0.1 with zero egress.
//
//   rtmp_serve <input> <rtmp://127.0.0.1:PORT/app/stream> [fps] [loops]
//   rtmp_serve <input> <rtsp://127.0.0.1:PORT/stream>     [fps] [loops]
//
// rtmp:// LISTENS (server mode) until a pull client connects and
// remuxes into FLV; rtsp:// PUSHES (ANNOUNCE+RECORD over TCP) to a
// listen-mode receiver — our Parser with rtsp_flags=listen — at `fps`
// pacing (live-source cadence).
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>

extern "C" {
#include <libavformat/avformat.h>
#include <libavutil/time.h>
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <input> <rtmp-url> [fps] [loops]\n",
                 argv[0]);
    return 2;
  }
  const char* in_path = argv[1];
  const char* url = argv[2];
  const double fps = argc > 3 ? std::atof(argv[3]) : 25.0;
  const int loops = argc > 4 ? std::atoi(argv[4]) : 1;

  AVFormatContext* in = nullptr;
  if (avformat_open_input(&in, in_path, nullptr, nullptr) < 0 ||
      avformat_find_stream_info(in, nullptr) < 0) {
    std::fprintf(stderr, "cannot open input %s\n", in_path);
    return 2;
  }
  int vi = av_find_best_stream(in, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (vi < 0) return 2;

  const bool rtsp = std::strncmp(url, "rtsp://", 7) == 0;
  AVFormatContext* out = nullptr;
  if (avformat_alloc_output_context2(&out, nullptr, rtsp ? "rtsp" : "flv",
                                     url) < 0)
    return 3;
  AVStream* os = avformat_new_stream(out, nullptr);
  if (!os || avcodec_parameters_copy(os->codecpar,
                                     in->streams[vi]->codecpar) < 0)
    return 3;
  AVDictionary* opts = nullptr;
  int sts;
  if (rtsp) {
    // Push client: the RECEIVER listens (Parser rtsp_flags=listen) and
    // may come up a moment after us — retry the ANNOUNCE for ~10 s.
    sts = -1;
    for (int attempt = 0; attempt < 50 && sts < 0; attempt++) {
      AVDictionary* try_opts = nullptr;
      av_dict_set(&try_opts, "rtsp_transport", "tcp", 0);
      sts = avformat_write_header(out, &try_opts);
      av_dict_free(&try_opts);
      if (sts < 0)
        std::this_thread::sleep_for(std::chrono::milliseconds(200));
    }
  } else {
    av_dict_set(&opts, "listen", "1", 0);
    av_dict_set(&opts, "timeout", "30", 0);  // accept window, seconds
    sts = avio_open2(&out->pb, url, AVIO_FLAG_WRITE, nullptr, &opts);
    if (sts < 0) {
      char buf[128];
      av_strerror(sts, buf, sizeof(buf));
      std::fprintf(stderr, "rtmp listen failed: %s\n", buf);
      av_dict_free(&opts);
      return 4;  // distinct code: environment lacks rtmp listen support
    }
    // A mux failure after a successful accept is a real bug, not a
    // missing capability — keep it on the loud exit code.
    sts = avformat_write_header(out, nullptr);
  }
  av_dict_free(&opts);
  if (sts < 0) {
    char buf[128];
    av_strerror(sts, buf, sizeof(buf));
    std::fprintf(stderr, "%s setup failed: %s\n",
                 rtsp ? "rtsp push" : "rtmp mux", buf);
    return rtsp ? 4 : 3;  // rtsp push failure = capability (no listener
                          // distinction is possible client-side)
  }
  std::fprintf(stderr, "client connected; streaming\n");

  AVPacket* pkt = av_packet_alloc();
  int64_t n = 0;
  const AVRational frame_tb{1, static_cast<int>(fps * 1000)};
  for (int loop = 0; loop < loops; loop++) {
    if (loop > 0 &&
        av_seek_frame(in, vi, 0, AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_BYTE) < 0 &&
        av_seek_frame(in, vi, 0, AVSEEK_FLAG_BACKWARD) < 0)
      break;
    while (av_read_frame(in, pkt) >= 0) {
      if (pkt->stream_index != vi) {
        av_packet_unref(pkt);
        continue;
      }
      pkt->stream_index = 0;
      // Synthesized monotonic timestamps at the serve cadence
      // (elementary-stream inputs carry none); cts=0 keeps FLV happy.
      pkt->pts = pkt->dts = av_rescale_q(n * 1000, frame_tb, os->time_base);
      pkt->duration = 0;
      pkt->pos = -1;
      if (av_interleaved_write_frame(out, pkt) < 0) {
        std::fprintf(stderr, "client went away\n");
        goto done;
      }
      n++;
      std::this_thread::sleep_for(
          std::chrono::microseconds(static_cast<long>(1e6 / fps)));
    }
  }
done:
  av_packet_free(&pkt);
  av_write_trailer(out);
  if (out->pb) avio_closep(&out->pb);
  avformat_free_context(out);
  avformat_close_input(&in);
  std::fprintf(stderr, "served %lld packets\n", static_cast<long long>(n));
  return 0;
}

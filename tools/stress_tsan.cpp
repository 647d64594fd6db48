// ThreadSanitizer stress harness for the native runtime.
//
// The reference had no sanitizer coverage (SURVEY §5.2: thread-safety by
// hand + threaded gtests). This drives every concurrent surface at once
// under TSAN: the producer loop, latest-frame consumers, bulk cursor
// consumers (with host resize), pacing handshakes, and shutdown storms
// (Stop racing in-flight reads — the historical UAF window).
//
//   make tsan && ./tools/stress_tsan <video> [rounds=3]
#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <thread>
#include <vector>

#include "../csrc/pipeline.h"
#include "../csrc/segment_reader.h"
#include "../csrc/stream_pool.h"
#include "../csrc/ts_common.h"
#include "../csrc/vpp_convert.h"

using ts::Pipeline;
using ts::PipelineParams;

static void run_round(const std::string& input, int round) {
  PipelineParams params;
  params.input = input;
  params.framerate_mode = (round % 2) ? ts::FR_BLOCKING : ts::FR_FAST;
  params.buffer_size = 8;
  params.loop = true;

  Pipeline p;
  if (p.Init(params) != ts::TS_OK) {
    std::fprintf(stderr, "init failed\n");
    std::exit(1);
  }
  p.Start();
  const int w = p.width(), h = p.height();
  std::atomic<bool> stop{false};
  std::atomic<int> reads{0};

  auto latest_consumer = [&](std::string name) {
    std::vector<uint8_t> y(static_cast<size_t>(w) * h);
    std::vector<uint8_t> uv(static_cast<size_t>(w) * (h / 2));
    while (!stop.load()) {
      int sts = p.GetFrame(name, 0, y.data(), uv.data());
      if (sts == ts::TS_FINISHED || sts == ts::TS_ERROR) break;
      reads.fetch_add(1);
    }
  };
  auto bulk_consumer = [&](std::string name, bool resized) {
    const int B = 4, ow = resized ? 128 : w, oh = resized ? 96 : h;
    std::vector<uint8_t> y(static_cast<size_t>(B) * ow * oh);
    std::vector<uint8_t> uv(static_cast<size_t>(B) * ow * (oh / 2));
    int first = 0;
    while (!stop.load()) {
      int got = resized
                    ? p.GetFrameBatchResized(name, B, ow, oh, 1, y.data(),
                                             uv.data(), &first)
                    : p.GetFrameBatch(name, B, y.data(), uv.data(), &first);
      if (got <= 0) break;
      reads.fetch_add(got);
    }
  };

  // Manual stepping racing the started producer and live consumers:
  // Step() must not mutate any state GetFrame/loopIteration read (it
  // takes its unpaced mode by value, csrc/pipeline.cpp).
  auto stepper = [&] {
    while (!stop.load()) {
      if (p.Step() < 0) break;
      std::this_thread::sleep_for(std::chrono::milliseconds(7));
    }
  };

  // The C++-twin consumer path: GetFrame + full host VPP chain
  // (csrc/vpp_convert.cpp) — exercises the conversion plan caches
  // (resize plan maps behind mutexes) under concurrency.
  auto converted_consumer = [&](std::string name) {
    ts::HostVppParams vp;
    vp.dst_width = 128;
    vp.dst_height = 96;
    vp.resize_algo = ts::HOST_RESIZE_BILINEAR;
    vp.fourcc = ts::FCC_RGB24;
    vp.planes = ts::PLANES_MERGED;
    std::vector<uint8_t> y(static_cast<size_t>(w) * h);
    std::vector<uint8_t> uv(static_cast<size_t>(w) * (h / 2));
    std::vector<uint8_t> out(ts::ConvertedElements(128, 96, ts::FCC_RGB24));
    while (!stop.load()) {
      int sts = p.GetFrame(name, 0, y.data(), uv.data());
      if (sts == ts::TS_FINISHED || sts == ts::TS_ERROR) break;
      if (ts::VppConvertHost(y.data(), uv.data(), w, h, vp, out.data()) != 0)
        break;
      reads.fetch_add(1);
    }
  };

  std::vector<std::thread> threads;
  threads.emplace_back(latest_consumer, "a");
  threads.emplace_back(latest_consumer, "b");
  threads.emplace_back(bulk_consumer, "bulk1", false);
  threads.emplace_back(bulk_consumer, "bulk2", true);
  threads.emplace_back(converted_consumer, "conv");
  threads.emplace_back(stepper);

  // Let everyone race for a while, then slam the door mid-read.
  std::this_thread::sleep_for(std::chrono::milliseconds(1500));
  p.Stop();
  stop.store(true);
  for (auto& t : threads) t.join();
  std::printf("round %d (%s): %d reads, clean shutdown\n", round,
              (round % 2) ? "BLOCKING" : "FAST", reads.load());
}

// StreamPool under stress: 3 pooled streams, 2 workers, one bulk
// consumer per stream, stop mid-drain.
void run_pool_round(const std::string& video, int round) {
  ts::StreamPool pool(2);
  ts::PipelineParams params;
  params.input = video;
  params.buffer_size = 12;
  params.framerate_mode = ts::FR_FAST;
  params.loop = true;
  int idx[3];
  for (int i = 0; i < 3; i++) {
    idx[i] = pool.AddStream(params);
    if (idx[i] < 0) {
      std::fprintf(stderr, "pool add failed\n");
      std::exit(1);
    }
    pool.stream(idx[i])->RegisterCursor("c");
  }
  pool.Start();
  std::atomic<int> reads{0};
  std::vector<std::thread> threads;
  for (int i = 0; i < 3; i++) {
    ts::Pipeline* p = pool.stream(idx[i]);
    threads.emplace_back([p, &reads] {
      const int w = p->width(), h = p->height(), B = 4;
      std::vector<uint8_t> y(static_cast<size_t>(B) * w * h);
      std::vector<uint8_t> uv(static_cast<size_t>(B) * w * (h / 2));
      int first = 0;
      while (true) {
        int got = p->GetFrameBatch("c", B, y.data(), uv.data(), &first);
        if (got <= 0) break;
        reads.fetch_add(got);
      }
    });
  }
  std::this_thread::sleep_for(std::chrono::milliseconds(1200));
  pool.Stop();
  for (auto& t : threads) t.join();
  std::printf("pool round %d: %d reads, clean shutdown\n", round,
              reads.load());
}

// Geometry-renegotiation churn: loop-replaying the two-resolution
// switch fixture flips the generation every half file (320x240 <->
// 480x360), so renegotiating consumers race the producer's generation
// bumps and each other's acks continuously.
void run_renegotiate_round(const std::string& video, int round) {
  PipelineParams params;
  params.input = video;
  params.buffer_size = 8;
  params.framerate_mode = ts::FR_FAST;
  params.loop = true;

  Pipeline p;
  if (p.Init(params) != ts::TS_OK) {
    std::fprintf(stderr, "renegotiate fixture init failed\n");
    std::exit(1);
  }
  p.Start();
  std::atomic<bool> stop{false};
  std::atomic<int> reads{0}, renegs{0};

  auto latest_consumer = [&](std::string name) {
    int w = 0, h = 0;
    p.consumerDims(name, &w, &h);
    std::vector<uint8_t> y(static_cast<size_t>(w) * h);
    std::vector<uint8_t> uv(y.size() / 2);
    while (!stop.load()) {
      int sts = p.GetFrame(name, 0, y.data(), uv.data());
      if (sts == ts::TS_RENEGOTIATE) {
        p.ackRenegotiate(name, &w, &h);
        y.assign(static_cast<size_t>(w) * h, 0);
        uv.assign(y.size() / 2, 0);
        renegs.fetch_add(1);
        continue;
      }
      if (sts == ts::TS_FINISHED || sts == ts::TS_ERROR) break;
      reads.fetch_add(1);
    }
  };
  auto bulk_consumer = [&](std::string name) {
    const int B = 4;
    int w = 0, h = 0, first = 0;
    p.consumerDims(name, &w, &h);
    std::vector<uint8_t> y(static_cast<size_t>(B) * w * h);
    std::vector<uint8_t> uv(y.size() / 2);
    while (!stop.load()) {
      int got = p.GetFrameBatch(name, B, y.data(), uv.data(), &first);
      if (got == ts::TS_RENEGOTIATE) {
        p.ackRenegotiate(name, &w, &h);
        y.assign(static_cast<size_t>(B) * w * h, 0);
        uv.assign(y.size() / 2, 0);
        renegs.fetch_add(1);
        continue;
      }
      if (got <= 0) break;
      reads.fetch_add(got);
    }
  };
  auto resized_consumer = [&](std::string name) {
    // Fixed-output path: rides generation flips with no handshake.
    const int B = 4, ow = 128, oh = 96;
    std::vector<uint8_t> y(static_cast<size_t>(B) * ow * oh);
    std::vector<uint8_t> uv(y.size() / 2);
    int first = 0;
    while (!stop.load()) {
      int got =
          p.GetFrameBatchResized(name, B, ow, oh, 1, y.data(), uv.data(),
                                 &first);
      if (got <= 0) break;
      reads.fetch_add(got);
    }
  };

  std::vector<std::thread> threads;
  threads.emplace_back(latest_consumer, "a");
  threads.emplace_back(latest_consumer, "b");
  threads.emplace_back(bulk_consumer, "bulk");
  threads.emplace_back(resized_consumer, "resized");
  std::this_thread::sleep_for(std::chrono::milliseconds(1500));
  p.Stop();
  stop.store(true);
  for (auto& t : threads) t.join();
  std::printf("renegotiate round %d: %d reads, %d renegotiations, clean\n",
              round, reads.load(), renegs.load());
}

// Segment-parallel reader under stress: 3 decode workers racing the
// ordered deposit window with a tiny window (maximum back-pressure
// contention), loop mode, and a mid-drain Stop each round. Odd rounds
// add per-slot resize; the switch fixture (when given) races the
// error_frame_ watermark path against parked depositors.
void run_segmented_round(const std::string& video, int round,
                         bool expect_reneg) {
  ts::SegmentedParams params;
  params.input = video;
  params.workers = 3;
  params.window = 6;
  params.loop = !expect_reneg;
  params.chunk_frames = 16;
  if (round % 2) {
    params.dst_width = 128;
    params.dst_height = 96;
  }
  ts::SegmentedReader r;
  if (r.Init(params, std::make_shared<ts::Logger>()) != ts::TS_OK) {
    std::fprintf(stderr, "segmented init failed\n");
    std::exit(1);
  }
  r.Start();
  std::atomic<int> reads{0};
  std::thread consumer([&] {
    const int w = r.outWidth(), h = r.outHeight(), B = 5;
    std::vector<uint8_t> y(static_cast<size_t>(B) * w * h);
    std::vector<uint8_t> uv(static_cast<size_t>(B) * w * (h / 2));
    int first = 0;
    while (true) {
      int got = r.GetBatch(B, y.data(), uv.data(), &first);
      if (got <= 0) break;
      reads.fetch_add(got);
    }
  });
  std::this_thread::sleep_for(std::chrono::milliseconds(900));
  r.Stop();  // slam the door against parked depositors + the consumer
  consumer.join();
  std::printf("segmented round %d (%s): %d reads, clean shutdown\n", round,
              (round % 2) ? "resized" : "native", reads.load());
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <video> [rounds] [switch_fixture]\n",
                 argv[0]);
    return 1;
  }
  const int rounds = argc > 2 ? std::atoi(argv[2]) : 3;
  for (int i = 0; i < rounds; i++) run_round(argv[1], i);
  for (int i = 0; i < 2; i++) run_pool_round(argv[1], i);
  if (argc > 3)
    for (int i = 0; i < 2; i++) run_renegotiate_round(argv[3], i);
  for (int i = 0; i < 2; i++) run_segmented_round(argv[1], i, false);
  if (argc > 3)
    for (int i = 0; i < 2; i++) run_segmented_round(argv[3], i, true);
  std::printf("OK\n");
  return 0;
}

// StreamPool: many ingest pipelines sharing a fixed worker-thread pool.
//
// The reference's scale-out model was one producer thread per stream
// (one TensorStream instance per GPU, different_streams.py); that costs
// a thread (plus codec threads) per stream and collapses under
// many-stream serving. StreamPool drives N stream pipelines with M
// workers: each worker round-robins over streams, running one unpaced
// producer iteration (Pipeline::Step) on any stream whose ring has
// back-pressure headroom. Consumers use the same bulk cursor reads as a
// standalone Pipeline — per-stream frame order and bytes are identical
// to the single-pipeline path (asserted in tests/test_stream_pool.py).
#pragma once

#include <atomic>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "pipeline.h"

namespace ts {

class StreamPool {
 public:
  explicit StreamPool(int workers) : workers_requested_(workers) {}
  ~StreamPool() { Stop(); }

  // Add a stream before Start(). Returns the stream index or <0 on error.
  int AddStream(const PipelineParams& params);

  // Launches the worker threads (decode starts flowing).
  int Start();

  Pipeline* stream(int idx) {
    if (idx < 0 || idx >= static_cast<int>(streams_.size())) return nullptr;
    return streams_[idx]->pipeline.get();
  }
  int streamCount() const { return static_cast<int>(streams_.size()); }

  void Stop();

 private:
  struct Stream {
    std::unique_ptr<Pipeline> pipeline;
    std::mutex step_mu;          // one worker per stream at a time
    std::atomic<bool> done{false};
  };

  void workerLoop(int worker_id);

  int workers_requested_;
  std::vector<std::unique_ptr<Stream>> streams_;
  std::vector<std::thread> workers_;
  std::atomic<bool> running_{false};
};

}  // namespace ts

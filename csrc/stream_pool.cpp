#include "stream_pool.h"

#include <chrono>

namespace ts {

int StreamPool::AddStream(const PipelineParams& params) {
  if (running_) return TS_ERROR;
  auto s = std::make_unique<Stream>();
  s->pipeline = std::make_unique<Pipeline>();
  // Pool streams decode unpaced (Step) and share the worker pool, so
  // each codec runs single-threaded — parallelism comes from streams.
  PipelineParams p = params;
  if (p.decode_threads <= 0) p.decode_threads = 1;
  int sts = s->pipeline->Init(p);
  if (sts != TS_OK) return sts;
  streams_.push_back(std::move(s));
  return static_cast<int>(streams_.size()) - 1;
}

int StreamPool::Start() {
  if (running_ || streams_.empty()) return TS_ERROR;
  running_ = true;
  int n = workers_requested_;
  if (n <= 0) {
    n = static_cast<int>(std::thread::hardware_concurrency());
    if (n <= 0) n = 1;
  }
  if (n > static_cast<int>(streams_.size()))
    n = static_cast<int>(streams_.size());
  for (int i = 0; i < n; i++)
    workers_.emplace_back([this, i] { workerLoop(i); });
  return TS_OK;
}

void StreamPool::workerLoop(int worker_id) {
  char name[16];
  std::snprintf(name, sizeof(name), "ts-pool-w%d", worker_id);
  setThreadName(name);
  const size_t count = streams_.size();
  size_t cursor = static_cast<size_t>(worker_id);  // stagger start points
  while (running_) {
    bool progressed = false;
    bool all_done = true;
    for (size_t k = 0; k < count && running_; k++) {
      Stream& s = *streams_[(cursor + k) % count];
      if (s.done) continue;
      all_done = false;
      // Skip streams a peer is already driving or whose ring is full
      // (a blocked Step would idle this worker behind one slow
      // consumer).
      if (!s.pipeline->hasRingHeadroom()) continue;
      std::unique_lock<std::mutex> lk(s.step_mu, std::try_to_lock);
      if (!lk.owns_lock()) continue;
      // Re-check under the lock: a peer may have filled the ring
      // between the unlocked check and now.
      if (!s.pipeline->hasRingHeadroom()) continue;
      int sts = s.pipeline->Step();
      if (sts == TS_EOF || sts == TS_TIMEOUT || sts == TS_ERROR ||
          sts == TS_FINISHED) {
        s.done = true;  // Step already notified the stream's consumers
      }
      progressed = true;
    }
    cursor++;
    if (all_done) break;
    if (!progressed) {
      // Every live stream is back-pressured: yield until consumers
      // drain. 200us keeps worst-case added latency far below a frame.
      std::this_thread::sleep_for(std::chrono::microseconds(200));
    }
  }
}

void StreamPool::Stop() {
  running_ = false;
  for (auto& s : streams_)
    if (s->pipeline) s->pipeline->Stop();  // wakes blocked consumers
  for (auto& t : workers_)
    if (t.joinable()) t.join();
  workers_.clear();
}

}  // namespace ts

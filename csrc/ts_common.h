// tensor-stream-tpu native ingest library: shared infrastructure.
//
// TPU-native re-design of the reference's infra layer
// (reference: include/Common.h:19-237). Status codes, log levels and the
// logger's console/file sign convention are behavior-compatible; CUDA
// specifics (SET_CUDA_DEVICE, NVTX) are replaced with a host span tracer
// that can emit chrome://tracing JSON, the TPU-side tracing lives in
// Python (jax.profiler / jax.named_scope).
#pragma once

#include <atomic>
#include <chrono>
#include <cstdarg>
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace ts {

// Error codes visible through the C ABI. The first four mirror the
// reference's `Internal` enum (include/Common.h:19-24); the rest are
// TPU-rebuild specific refinements of conditions the reference signalled
// via exceptions.
enum Status {
  TS_OK = 0,
  TS_REPEAT = -1,       // need to repeat the last request
  TS_UNSUPPORTED = -2,  // requested functionality is unsupported
  TS_ERROR = -3,        // unknown error
  TS_EOF = -4,          // end of stream reached
  TS_FINISHED = -5,     // decoding finished; readers must stop
  TS_TIMEOUT = -6,      // read timed out (reference: interrupt callback abort)
  TS_DECODE_ERROR = -7, // packet reached the decoder but failed to decode
                        // (internal: lets the reconnect path distinguish a
                        // bad packet from a dead source; mapped to
                        // TS_ERROR at the API surface)
  TS_RENEGOTIATE = -8,  // the stream's geometry changed mid-stream (e.g.
                        // an H.264 SPS switch in an adaptive source); the
                        // consumer must re-query width/height, resize its
                        // buffers, and acknowledge via ack_renegotiate
                        // before reads proceed. (The reference corrupts
                        // the consumer heap here — src/Decoder.cpp:149
                        // adopts the new dims while callers keep
                        // init-sized buffers; we renegotiate instead.)
};

// Log levels (reference: include/Common.h:29-34). The sign convention of
// the *configured* level selects the sink: positive -> file, negative ->
// console (reference: src/Common.cpp:6-11).
enum LogsLevel {
  LOG_NONE = 0,
  LOG_LOW = 1,
  LOG_MEDIUM = 2,
  LOG_HIGH = 3,
};

// Frame pacing modes (reference: include/Common.h:47-53).
enum FrameRateMode {
  FR_NATIVE = 0,
  FR_NATIVE_SIMPLE = 1,
  FR_NATIVE_LOW_DELAY = 2,
  FR_FAST = 3,
  FR_BLOCKING = 4,
};

constexpr int kFrameRateConstraint = 240;  // max supported input fps

// Names the calling thread for /proc/<pid>/task and profilers. Native
// threads otherwise inherit the process name ("python"), which makes
// per-thread CPU attribution on a shared host impossible.
void setThreadName(const char* name);

// Process-global read timeout in ms, shared by all instances exactly like
// the reference's `timeoutFrame` (src/Common.cpp:4). <0 disables.
extern std::atomic<int> g_timeout_ms;

class Logger {
 public:
  void initialize(int level, const std::string& file_name = "logs.txt") {
    std::lock_guard<std::mutex> lk(mu_);
    level_ = level;
    if (level_ > 0 && !file_.is_open()) {
      file_.open(file_name, std::ios::out | std::ios::app);
    }
  }

  int level() const { return level_; }
  bool enabled(int needed) const {
    int l = level_ < 0 ? -level_ : level_;
    int n = needed < 0 ? -needed : needed;
    return level_ != 0 && l >= n;
  }

  void log(const std::string& msg, int needed) {
    if (!enabled(needed)) return;
    std::lock_guard<std::mutex> lk(mu_);
    std::ostringstream os;
    os << "TID: " << std::this_thread::get_id() << " " << msg << "\n";
    if (level_ < 0) {
      std::fputs(os.str().c_str(), stdout);
      std::fflush(stdout);
    } else if (file_.is_open()) {
      file_ << os.str() << std::flush;
    }
  }

  // Host-side tracing: when enabled, spans are appended as
  // chrome://tracing "complete" events to <trace_path>.
  void enableTrace(const std::string& path = "trace_host.json") {
    std::lock_guard<std::mutex> lk(mu_);
    trace_path_ = path;
    trace_enabled_ = true;
  }
  bool traceEnabled() const { return trace_enabled_; }

  void traceSpan(const char* name, int64_t start_us, int64_t dur_us) {
    if (!trace_enabled_) return;
    std::lock_guard<std::mutex> lk(mu_);
    std::ofstream f(trace_path_, std::ios::app);
    std::ostringstream tid;
    tid << std::this_thread::get_id();
    f << "{\"name\":\"" << name << "\",\"ph\":\"X\",\"ts\":" << start_us
      << ",\"dur\":" << dur_us << ",\"pid\":1,\"tid\":\"" << tid.str()
      << "\"},\n";
  }

 private:
  std::mutex mu_;
  int level_ = LOG_NONE;
  std::ofstream file_;
  bool trace_enabled_ = false;
  std::string trace_path_;
};

// RAII span: logs block timing at HIGH level and emits a trace event when
// host tracing is on (replaces the reference's NVTX PUSH_RANGE +
// START/END_LOG_BLOCK macro pair, include/Common.h:100-205).
class Span {
 public:
  Span(Logger* logger, const char* name) : logger_(logger), name_(name) {
    if (logger_ && (logger_->enabled(LOG_HIGH) || logger_->traceEnabled())) {
      active_ = true;
      start_ = std::chrono::steady_clock::now();
      if (logger_->enabled(LOG_HIGH)) logger_->log(std::string(name_) + " +", LOG_HIGH);
    }
  }
  ~Span() {
    if (!active_) return;
    auto end = std::chrono::steady_clock::now();
    auto us = std::chrono::duration_cast<std::chrono::microseconds>(end - start_).count();
    if (logger_->enabled(LOG_HIGH)) {
      logger_->log(std::string(name_) + " -\ntime: " + std::to_string(us / 1000) + " ms", LOG_HIGH);
    }
    auto start_us = std::chrono::duration_cast<std::chrono::microseconds>(
                        start_.time_since_epoch()).count();
    logger_->traceSpan(name_, start_us, us);
  }

 private:
  Logger* logger_;
  const char* name_;
  bool active_ = false;
  std::chrono::steady_clock::time_point start_;
};

}  // namespace ts

// Software decoder -> host NV12 ring buffer.
//
// TPU-native re-design of the reference's Decoder (reference:
// src/Decoder.cpp:12-188). There is no NVDEC on a TPU VM, so decode runs
// on host CPUs via libavcodec with frame/slice threading; decoded frames
// are converted to tightly-packed NV12 (Y plane h*w + interleaved UV plane
// (h/2)*w) in a fixed ring of host buffers that consumers copy from.
//
// The GetFrame consumer contract is behavior-compatible with the
// reference (src/Decoder.cpp:97-131): per-consumer "new frame" flags under
// one mutex + condvar; first call returns immediately if anything was
// decoded; index in [-buffer, 0] with the reference's non-modular
// alignedIndex quirk; TS_REPEAT on empty/negative slots; TS_FINISHED once
// the producer is done. Unlike the reference (which aliased NVDEC DPB
// surfaces), GetFrame *copies* the NV12 planes out under the lock — a
// consumer can never observe a ring slot being overwritten mid-read,
// which is a hard requirement once frames feed XLA's async dispatch.
#pragma once

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <functional>
#include <map>
#include <memory>
#include <mutex>
#include <shared_mutex>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libswscale/swscale.h>
}

#include "parser.h"
#include "ts_common.h"
#include "vpp_host.h"

namespace ts {

struct DecoderParams {
  int buffer_deep = 10;
  bool enable_dumps = false;
  int threads = 0;  // 0 = auto (hardware concurrency)
  bool fast_decode = false;  // skip loop filter: faster, not bit-exact
};

class Decoder {
 public:
  ~Decoder() { Close(); }

  int Init(const DecoderParams& params, const Parser& parser,
           std::shared_ptr<Logger> logger);

  // Live-source reconnect: recreates the codec context from the
  // (re-opened) parser while preserving the ring, the absolute frame
  // counter, and every consumer's cursor/wake state — consumers keep
  // reading across the break with continuous frame numbering. A source
  // whose dimensions changed triggers the normal geometry-renegotiation
  // path on its first stored frame.
  int Reopen(const Parser& parser);

  // Sends one packet and stores any resulting frame into the ring.
  // Returns TS_OK when a frame was produced, AVERROR(EAGAIN) when the
  // decoder needs more input, TS_EOF at end of stream, <0 on error.
  int Decode(AVPacket* pkt);

  // Flushes the decoder at end of stream, draining frames into the ring.
  // Returns the number of frames drained.
  int Drain();

  // Seek support: flushes codec state and presets the absolute frame
  // counter so the next stored frame is numbered `skip + 1`.
  void PrepareSeek(int64_t skip);
  // Feeds one packet while skipping: frames with pts < target_pts (or
  // while *remaining > 0 in counting mode, target_pts < 0) are
  // discarded; the first kept frame is stored into the ring. Returns 1
  // once a frame was stored, 0 to keep feeding, <0 on error.
  int DecodeSkip(AVPacket* pkt, int64_t target_pts, int64_t* remaining);

  // Blocks until a frame this consumer has not seen is available, then
  // copies NV12 planes of ring slot (latest + index) into out_y / out_uv
  // (sized w*h and w*(h/2)). Returns the absolute frame counter (1-based),
  // TS_REPEAT when the requested slot is not available, or TS_FINISHED.
  int GetFrame(int index, const std::string& consumer, uint8_t* out_y,
               uint8_t* out_uv);

  // Bulk cursor-mode read (TPU throughput path): copies up to `count`
  // *consecutive* frames starting at this consumer's cursor into the
  // contiguous batch buffers (frame-major). Unlike GetFrame's
  // latest-frame contract, cursor consumers see every frame: the
  // producer back-pressures instead of overwriting unread ring slots,
  // and the ring drains even after end-of-stream. Returns the number of
  // frames copied (0 => finished), sets *first_index to the absolute
  // index (1-based) of the first copied frame.
  int GetFramesBulk(const std::string& consumer, int count, uint8_t* out_y,
                    uint8_t* out_uv, int* first_index);

  // Bulk cursor-mode read with host-side NV12-domain resize (vpp_host.h)
  // applied per frame before the copy-out — shrinks the bytes shipped to
  // the device when the host->HBM link is the bottleneck. Same cursor /
  // back-pressure semantics as GetFramesBulk; out buffers are sized
  // count*dst_w*dst_h and count*dst_w*dst_h/2.
  int GetFramesBulkResized(const std::string& consumer, int count, int dst_w,
                           int dst_h, int algo, uint8_t* out_y,
                           uint8_t* out_uv, int* first_index);

  // Registers a cursor consumer (idempotent); used by the pipeline so
  // the producer's BLOCKING wait can account for bulk consumers before
  // their first blocking read.
  void registerCursor(const std::string& consumer);
  bool hasCursorConsumers();
  // True when storeFrame would not block on cursor back-pressure.
  bool hasRingHeadroom();

  // Wakes all consumers and makes subsequent GetFrame return TS_FINISHED.
  void notifyConsumers();

  int frameIndex() const { return current_frame_; }
  int width() const { return width_; }
  int height() const { return height_; }
  // Detected colorimetry as a ColorStandard value (enums.py): bit 0 =
  // BT.709 matrix, bit 1 = full range — from the decoded frames' VUI
  // metadata (unspecified defaults to BT.601 limited, the reference's
  // hardcoded behavior).
  int detectedStandard() const { return detected_standard_; }
  bool finished() const { return is_finished_; }

  void Close();

  // Geometry renegotiation: a mid-stream resolution change (H.264 SPS
  // switch in an adaptive source) bumps the generation; per-frame reads
  // and uniform bulk reads return TS_RENEGOTIATE until the consumer
  // acknowledges the new geometry. Acknowledgement adopts the geometry
  // at the consumer's cursor (cursor consumers resume exactly at the
  // switch boundary, even across multiple switches) or the latest
  // geometry (per-frame consumers), and returns it in *w / *h so the
  // caller can resize its buffers before retrying. The resized bulk
  // path (GetFramesBulkResized) adapts per slot and never renegotiates.
  int AckRenegotiate(const std::string& consumer, int* w, int* h);

  // Dimensions of the geometry this consumer last acknowledged (the
  // size its buffers must have for GetFrame/GetFramesBulk to copy into
  // them) — NOT necessarily the current width()/height() while older
  // generations still drain.
  void ConsumerDims(const std::string& consumer, int* w, int* h);

 private:
  struct Slot {
    std::vector<uint8_t> y, uv;  // packed NV12, filled lazily (see av)
    // Lazy-pack ring: 4:2:0 decoder output is stored as a refcounted
    // AVFrame (one av_frame_ref, zero pixel copies in the producer);
    // consumers that need tightly-packed NV12 pack once on first use
    // (`packed`), while the host-resized bulk drain reads the planes
    // strided and never packs at all — removing ~3 MB/frame of memory
    // writes from the 1-core decode wall.
    AVFrame* av = nullptr;
    bool packed = false;
    // Per-slot geometry + generation: slots written before a mid-stream
    // resolution switch keep their own dimensions.
    int w = 0, h = 0, gen = 0;
    bool valid = false;
  };

  // Packs slot.av into slot.y/slot.uv once (idempotent). Must run with
  // sync_ held: concurrent cursor drains may share a slot, and only the
  // lock serializes the first pack.
  int ensurePackedLocked(Slot& slot);

  // Shared cursor-drain loop: waits for / walks consecutive frames and
  // hands each valid slot to `sink(slot, copied)` with the ring lock
  // RELEASED (the producer back-pressure guarantees the slot cannot be
  // overwritten until this consumer's cursor advances past it).
  using FrameSink = std::function<void(const Slot&, int)>;
  // `uniform`: batch layout requires one geometry — stop at a
  // generation boundary (TS_RENEGOTIATE when nothing was copied yet,
  // partial batch otherwise). Non-uniform sinks handle per-slot
  // geometry and auto-acknowledge switches.
  int bulkDrain(const std::string& consumer, int count, int* first_index,
                bool uniform, const FrameSink& sink);

  int storeFrame(AVFrame* frame);
  int drainReady();

  DecoderParams params_;
  std::shared_ptr<Logger> logger_;
  AVCodecContext* ctx_ = nullptr;
  SwsContext* sws_ = nullptr;
  AVFrame* decoded_ = nullptr;
  AVFrame* nv12_ = nullptr;
  // Atomic: written by the producer on (rare) mid-stream dimension
  // changes, read by consumers sizing their copies without the ring lock.
  std::atomic<int> width_{0}, height_{0};
  std::atomic<int> detected_standard_{0};

  std::vector<Slot> ring_;
  int current_frame_ = 0;  // absolute count of frames stored
  int generation_ = 0;     // bumped per mid-stream geometry change
  // Dimensions of every generation seen (tiny: one entry per switch).
  std::map<int, std::pair<int, int>> gen_dims_;
  // Last generation each consumer acknowledged (absent => 0, the init
  // geometry).
  std::map<std::string, int> acked_gen_;
  std::map<std::string, bool> consumer_status_;
  // Cursor-mode consumers: name -> next absolute frame (0-based) to read.
  std::map<std::string, int64_t> cursors_;
  bool is_finished_ = false;
  std::mutex sync_;
  std::condition_variable consumer_cv_;
  std::condition_variable producer_cv_;  // back-pressure for cursor mode
  // Guards ring storage lifetime against Close(): bulk drains read slot
  // data with sync_ released (see bulkDrain), so Close must wait for
  // them. Shared = reader in flight, unique = Close. Acquisition order
  // is always close_guard_ -> sync_.
  std::shared_mutex close_guard_;

  FILE* dump_file_ = nullptr;
  bool closed_ = true;
};

}  // namespace ts

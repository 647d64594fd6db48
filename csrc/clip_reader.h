// Random-access clip sampling over seekable sources (TPU extension).
//
// Video-model training wants shuffled fixed-length clips ([B, T, ...]
// batches), not a serial stream. The reference has no counterpart (its
// Parser cannot even Reset — src/Parser.cpp Reset is unimplemented);
// this is the software twin of NVIDIA-DALI-style VideoReader sampling
// built on the same keyframe-scan infrastructure as the GOP/segment-
// parallel reader (segment_reader.h): ScanStream builds the entry table
// (H.264 IDR; HEVC IDR + open-GOP CRA/BLA with leading-picture
// accounting; VP9/AV1 keyframes) once, then each requested clip seeks
// to the nearest cold-decoder-safe entry point at-or-before its first
// frame, warm-up decodes to the start, and collects every stride-th
// frame. Decoded bytes are BIT-IDENTICAL to the serial decode of the
// same frame indices (entries refresh the DPB; a cold decoder at a CRA
// drops the RASL itself and the reader discards the RADL outputs).
//
// N workers each own an independent demux+codec instance and pull clip
// tasks from a shared counter in ASCENDING start order (outputs land in
// the caller's slot order; duplicate starts decode once and memcpy); a
// worker whose decoder already sits at-or-before a clip's start (and
// at-or-after its entry keyframe) rides forward without a seek — so
// sequential samplers, and nearby clips within a shuffled batch, decode
// each frame at most once.
#pragma once

#include <atomic>
#include <cstdint>
#include <memory>
#include <string>
#include <vector>

#include "segment_reader.h"
#include "ts_common.h"
#include "vpp_host.h"

namespace ts {

struct ClipReaderParams {
  std::string input;
  int workers = 2;
  int decode_threads = 1;  // per worker; parallelism comes from workers
  bool fast_decode = false;
  // Optional per-frame host resize: 0 = deposit native NV12.
  int dst_width = 0, dst_height = 0;
  int resize_algo = HOST_RESIZE_BILINEAR;
};

class ClipReader {
 public:
  ~ClipReader();

  // Scan pass (no decode): builds the keyframe entry table. Returns
  // TS_OK, TS_UNSUPPORTED (not seekable / no frames), or a libav error.
  int Init(const ClipReaderParams& params, std::shared_ptr<Logger> logger);

  // Decode n_clips clips of clip_len frames each, frame j of clip i
  // being global frame starts[i] + j*stride (0-based). Layout:
  //   out_y  [n_clips][clip_len][outH * outW]
  //   out_uv [n_clips][clip_len][outH/2 * outW]
  // Blocking; clips decode in parallel on min(workers, n_clips)
  // decoder instances. Returns TS_OK, TS_ERROR (bad request / decode
  // hole), TS_RENEGOTIATE (mid-file resolution switch without resize),
  // or a libav error. Not reentrant — one batch at a time.
  int GetClipBatch(const int64_t* starts, int n_clips, int clip_len,
                   int stride, uint8_t* out_y, uint8_t* out_uv);

  // Close the per-worker demux+codec instances but keep the (cheap)
  // keyframe scan: a many-file dataset LRU-caps open decoder pools
  // without paying a rescan on reuse. The next GetClipBatch reopens
  // workers lazily. Not reentrant with GetClipBatch.
  void ReleaseDecoders() { pool_.clear(); }

  int width() const { return width_; }
  int height() const { return height_; }
  int outWidth() const { return params_.dst_width ? params_.dst_width : width_; }
  int outHeight() const {
    return params_.dst_height ? params_.dst_height : height_;
  }
  int64_t totalFrames() const { return total_frames_; }
  // Number of cold-decoder entry points (worst-case warm-up per clip is
  // the gap between consecutive ones).
  int segments() const { return static_cast<int>(segments_.size()); }
  // First display frame of entry point i (ascending) — exported so
  // samplers can group a shuffled epoch by segment (permute segments,
  // then clips within a segment): batches then decode each GOP ~once
  // instead of paying keyframe warm-up per random clip.
  int64_t segmentFirstFrame(int i) const { return segments_[i].first_frame; }
  // Total frames decoded across all clips so far (warm-up included) —
  // the sampling-efficiency observable: decoded/returned ratio.
  int64_t framesDecoded() const { return frames_decoded_.load(); }

 private:
  struct Worker {
    WorkerDecoder dec;
    SegScratch scratch;
    bool open = false;
    // Global index of the next frame this worker's decoder would output,
    // -1 = unknown (must seek). Enables seek-free forward continuation.
    int64_t next_frame = -1;
  };

  int decodeClip(Worker& w, int64_t start, int clip_len, int stride,
                 uint8_t* out_y, uint8_t* out_uv);
  int depositFrame(Worker& w, const AVFrame* f, uint8_t* y, uint8_t* uv);

  ClipReaderParams params_;
  std::shared_ptr<Logger> logger_;
  std::vector<SegmentChunk> segments_;  // raw keyframe table (unmerged)
  int64_t total_frames_ = 0;
  int width_ = 0, height_ = 0;
  AVCodecID codec_id_ = AV_CODEC_ID_NONE;
  AVCodecParameters* codecpar_ = nullptr;  // owned
  bool byte_seek_ = false;
  std::vector<std::unique_ptr<Worker>> pool_;
  std::atomic<int64_t> frames_decoded_{0};
};

}  // namespace ts

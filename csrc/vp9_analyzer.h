// VP9 stream-health analyzer — extends the reference's stream-health
// story (src/Parser.cpp:146-293, H.264-only) to VP9 ingest, which the
// reference does not support at all (docs/ROADMAP.md item 6).
//
// VP9 carries no frame counter or picture-order count, so the H.264/HEVC
// continuity checks do not port. What the uncompressed frame header does
// expose, and what this analyzer checks:
//   * frame_marker (2 bits, must be 2) — a wrong marker means the packet
//     boundary is corrupt: reported as ANALYZE_GAPS_FRAME_NUM (the
//     stream-integrity signal).
//   * superframe index integrity (tail marker byte, repeated leading
//     byte, frame sizes summing within the packet) — same signal.
//   * a stream that begins with an inter frame (its keyframe was lost or
//     cut off) — reported once as ANALYZE_FRAME_NUM, mirroring the
//     H.264 analyzer's missing-IDR signal.
#pragma once

#include <cstdint>

#include "analyzer.h"  // AnalyzeErrors bitmask values
#include "bitreader.h"
#include "ts_common.h"

namespace ts {

class VP9Analyzer {
 public:
  // `data` is one VP9 packet as stored in IVF/WebM (possibly a
  // superframe). Returns an AnalyzeErrors bitmask.
  int analyze(const uint8_t* data, int size) {
    if (size <= 0) return ANALYZE_NONE;
    // Superframe: the last byte is a marker 110xxxxx encoding the frame
    // count and size-field width; the index block starts with the same
    // byte (VP9 spec, Annex B).
    uint8_t last = data[size - 1];
    if ((last & 0xe0) == 0xc0) {
      int nframes = (last & 0x7) + 1;
      int len_sz = ((last >> 3) & 0x3) + 1;
      int idx_sz = 2 + nframes * len_sz;
      // Only a superframe when BOTH marker bytes match (spec Annex B /
      // libvpx vp9_parse_superframe_index); a normal frame whose last
      // compressed byte happens to look like a marker falls through.
      if (size < idx_sz || data[size - idx_sz] != last)
        return analyzeFrame(data, size);
      const uint8_t* lens = data + size - idx_sz + 1;
      int64_t off = 0;
      int errors = ANALYZE_NONE;
      for (int f = 0; f < nframes; f++) {
        int64_t sz = 0;
        for (int b = 0; b < len_sz; b++)
          sz |= static_cast<int64_t>(lens[f * len_sz + b]) << (8 * b);
        if (off + sz > size - idx_sz) return errors | ANALYZE_GAPS_FRAME_NUM;
        errors |= analyzeFrame(data + off, static_cast<int>(sz));
        off += sz;
      }
      return errors;
    }
    return analyzeFrame(data, size);
  }

  void reset() { started_ = false; }

 private:
  int analyzeFrame(const uint8_t* data, int size) {
    if (size < 1) return ANALYZE_GAPS_FRAME_NUM;
    BitReader r(data, size);
    if (r.readBits(2) != 2) return ANALYZE_GAPS_FRAME_NUM;  // frame_marker
    uint32_t profile_low = r.readBits(1);
    uint32_t profile_high = r.readBits(1);
    if (profile_low && profile_high) r.skipBits(1);  // reserved_zero
    if (r.readBits(1)) return ANALYZE_NONE;  // show_existing_frame
    uint32_t frame_type = r.readBits(1);     // 0 = KEY_FRAME
    if (frame_type == 0) {
      started_ = true;
      return ANALYZE_NONE;
    }
    if (!started_) {
      // First frame of the stream is inter-coded: the keyframe it
      // predicts from was lost upstream.
      started_ = true;
      return ANALYZE_FRAME_NUM;
    }
    return ANALYZE_NONE;
  }

  bool started_ = false;
};

}  // namespace ts

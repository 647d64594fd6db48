// HEVC stream-health analyzer: detects dropped frames from picture-
// order-count continuity. Completes the reference's stream-health story
// (src/Parser.cpp:146-293, H.264-only) for H.265 ingest — a capability
// the reference does not have (docs/ROADMAP.md item 6).
//
// HEVC has no frame_num, so the H.264 analyzer's decode-order counter
// check does not port. Instead each slice carries
// slice_pic_order_cnt_lsb (presentation order); decode order is a
// permutation of it within the codec's reorder window. A dropped frame
// is therefore a HOLE in the unwrapped POC sequence that never fills
// while newer pictures keep arriving: the analyzer tracks seen POCs,
// advances a contiguity watermark, and reports ANALYZE_FRAME_NUM when
// the stream runs more than a reorder-window ahead of an unfilled hole.
#pragma once

#include <cstdint>
#include <set>
#include <vector>

#include <algorithm>

#include "analyzer.h"  // AnalyzeErrors bitmask values
#include "bitreader.h"
#include "ts_common.h"

namespace ts {

class HEVCAnalyzer {
 public:
  // `data` is one Annex-B access unit (post hevc_mp4toannexb for
  // containers). Returns an AnalyzeErrors bitmask (analyzer.h), or
  // TS_REPEAT when the packet carries no slice.
  int analyze(const uint8_t* data, int size) {
    int pos = 0;
    while (true) {
      int nal_start = findStartCode(data, size, pos);
      if (nal_start < 0) return TS_REPEAT;
      int nal_end = findStartCode(data, size, nal_start);
      if (nal_end < 0) nal_end = size;
      else nal_end -= 3;  // exclude the next start code (3-byte form)
      pos = nal_end;
      if (nal_end - nal_start < 3) continue;
      uint32_t nal_type = (data[nal_start] >> 1) & 0x3F;
      if (nal_type != 33 && nal_type != 34 && nal_type > 21) continue;
      // Unescape emulation-prevention bytes (00 00 03 -> 00 00): HEVC's
      // profile_tier_level is zero-dense, so escapes land in the exact
      // bits we parse. Only header-range bytes are needed.
      std::vector<uint8_t> rbsp;
      int limit = std::min(nal_end, nal_start + 256);
      rbsp.reserve(limit - nal_start);
      for (int i = nal_start + 2; i < limit; i++) {  // skip 2-byte header
        if (i + 2 < limit && data[i] == 0 && data[i + 1] == 0 &&
            data[i + 2] == 3) {
          rbsp.push_back(0);
          rbsp.push_back(0);
          i += 2;
          continue;
        }
        rbsp.push_back(data[i]);
      }
      BitReader r(rbsp.data(), static_cast<int>(rbsp.size()));
      if (nal_type == 33) {
        parseSPS(r);
      } else if (nal_type == 34) {
        parsePPS(r);
      } else {
        return parseSlice(r, nal_type);
      }
    }
  }

  void reset() {
    sps_ = SPSState();
    pps_ = PPSState();
    seen_.clear();
    watermark_ = 0;
    prev_poc_ = -1;
    poc_msb_ = 0;
    started_ = false;
  }

 private:
  // Returns the byte index just past the next 00 00 01 start code at or
  // after `from`, or -1.
  static int findStartCode(const uint8_t* data, int size, int from) {
    for (int i = from; i + 2 < size; i++) {
      if (data[i] == 0 && data[i + 1] == 0 && data[i + 2] == 1)
        return i + 3;
    }
    return -1;
  }

  struct SPSState {
    int log2_max_poc_lsb = 8;  // log2_max_pic_order_cnt_lsb_minus4 + 4
    int separate_colour_plane_flag = 0;
  };
  struct PPSState {
    int output_flag_present_flag = 0;
    int num_extra_slice_header_bits = 0;
  };

  // profile_tier_level(1, max_sub_layers_minus1) — fixed-size skips.
  void skipPTL(BitReader& r, uint32_t max_sub) {
    r.skipBits(88);  // general profile space/tier/idc/compat/flags
    r.skipBits(8);   // general_level_idc
    bool profile_present[8] = {};
    bool level_present[8] = {};
    for (uint32_t i = 0; i < max_sub; i++) {
      profile_present[i] = r.readBits(1);
      level_present[i] = r.readBits(1);
    }
    if (max_sub > 0)
      for (uint32_t i = max_sub; i < 8; i++) r.skipBits(2);
    for (uint32_t i = 0; i < max_sub; i++) {
      if (profile_present[i]) r.skipBits(88);
      if (level_present[i]) r.skipBits(8);
    }
  }

  void parseSPS(BitReader& r) {
    r.skipBits(4);  // sps_video_parameter_set_id
    uint32_t max_sub = r.readBits(3);
    r.skipBits(1);  // sps_temporal_id_nesting_flag
    skipPTL(r, max_sub);
    r.skipGolomb();  // sps_seq_parameter_set_id
    uint32_t chroma = r.readGolomb();
    sps_.separate_colour_plane_flag =
        (chroma == 3) ? static_cast<int>(r.readBits(1)) : 0;
    r.skipGolomb();  // pic_width_in_luma_samples
    r.skipGolomb();  // pic_height_in_luma_samples
    if (r.readBits(1)) {  // conformance_window_flag
      r.skipGolomb();
      r.skipGolomb();
      r.skipGolomb();
      r.skipGolomb();
    }
    r.skipGolomb();  // bit_depth_luma_minus8
    r.skipGolomb();  // bit_depth_chroma_minus8
    sps_.log2_max_poc_lsb = static_cast<int>(r.readGolomb()) + 4;
    if (sps_.log2_max_poc_lsb < 4 || sps_.log2_max_poc_lsb > 16)
      sps_.log2_max_poc_lsb = 8;  // corrupt SPS: keep a sane default
  }

  void parsePPS(BitReader& r) {
    r.skipGolomb();  // pps_pic_parameter_set_id
    r.skipGolomb();  // pps_seq_parameter_set_id
    r.skipBits(1);   // dependent_slice_segments_enabled_flag
    pps_.output_flag_present_flag = static_cast<int>(r.readBits(1));
    pps_.num_extra_slice_header_bits = static_cast<int>(r.readBits(3));
  }

  int parseSlice(BitReader& r, uint32_t nal_type) {
    const bool irap = nal_type >= 16 && nal_type <= 23;
    const bool idr = nal_type == 19 || nal_type == 20;
    uint32_t first_slice = r.readBits(1);
    if (!first_slice) return ANALYZE_NONE;  // only frame starts analyzed
    if (irap) r.skipBits(1);  // no_output_of_prior_pics_flag
    r.skipGolomb();           // slice_pic_parameter_set_id
    for (int i = 0; i < pps_.num_extra_slice_header_bits; i++) r.skipBits(1);
    r.skipGolomb();  // slice_type
    if (pps_.output_flag_present_flag) r.skipBits(1);
    if (sps_.separate_colour_plane_flag) r.skipBits(2);

    if (idr) {
      // IDR carries no POC lsb and resets POC to 0: any unfilled hole
      // before it is a drop.
      int errors = unfilledHoles() ? ANALYZE_FRAME_NUM : ANALYZE_NONE;
      seen_.clear();
      watermark_ = 1;  // POC 0 is this IDR
      prev_poc_ = 0;
      poc_msb_ = 0;
      started_ = true;
      return errors;
    }
    int lsb = static_cast<int>(r.readBits(sps_.log2_max_poc_lsb));
    if (!started_) {
      // Stream begins without an IDR (e.g. the first random-access
      // point was cut off) — mirror the reference's missing-IDR signal.
      started_ = true;
      prev_poc_ = lsb;
      watermark_ = lsb + 1;
      return ANALYZE_FRAME_NUM;
    }
    // Unwrap the lsb exactly like the spec's PicOrderCntVal derivation.
    int max = 1 << sps_.log2_max_poc_lsb;
    int prev_lsb = prev_poc_ & (max - 1);
    if (lsb < prev_lsb && prev_lsb - lsb > max / 2) poc_msb_ += max;
    else if (lsb > prev_lsb && lsb - prev_lsb > max / 2) poc_msb_ -= max;
    int poc = poc_msb_ + lsb;
    prev_poc_ = poc;

    int errors = ANALYZE_NONE;
    if (poc < watermark_) {
      // Below the contiguity watermark: a repeated/late picture — the
      // analogue of the H.264 analyzer's B_POC ordering error.
      errors |= ANALYZE_B_POC;
    } else {
      seen_.insert(poc);
      while (seen_.count(watermark_)) seen_.erase(watermark_++);
      // The decoder's reorder window is bounded; if the stream runs a
      // full window past an unfilled hole, that picture is gone.
      if (!seen_.empty() && poc - watermark_ >= kReorderWindow) {
        errors |= ANALYZE_FRAME_NUM;
        // Resync past the hole so one drop is reported once.
        watermark_ = *seen_.begin();
        while (seen_.count(watermark_)) seen_.erase(watermark_++);
      }
    }
    return errors;
  }

  bool unfilledHoles() const { return !seen_.empty(); }

  static constexpr int kReorderWindow = 16;

  SPSState sps_;
  PPSState pps_;
  std::set<int> seen_;
  int watermark_ = 0;
  int prev_poc_ = -1;
  int poc_msb_ = 0;
  bool started_ = false;
};

}  // namespace ts

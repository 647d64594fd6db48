// H.264 stream-health analyzer: detects frame drops and B-frame reorder
// problems from frame_num / pic_order_cnt_lsb continuity.
//
// Behavior-compatible re-design of the reference's Parser::Analyze
// (reference: src/Parser.cpp:146-293) with two deliberate fixes, both
// documented in docs/PARITY.md:
//   * SPS / continuity state is per-instance (the reference kept it in
//     function-static variables shared across all streams in the process —
//     a latent multi-stream bug).
//   * The input is already Annex-B (the caller runs the h264_mp4toannexb
//     BSF), identical to the reference.
#pragma once

#include <algorithm>
#include <cstdint>

#include "bitreader.h"
#include "ts_common.h"

namespace ts {

// Error bitmask values; mirrors the reference's AnalyzeErrors enum
// (include/Parser.h:89-94). Note the reference declares these as a plain
// enum, so GAPS_FRAME_NUM == 3 collides with B_POC|FRAME_NUM — quirk
// preserved for parity.
enum AnalyzeErrors {
  ANALYZE_NONE = 0,
  ANALYZE_B_POC = 1,
  ANALYZE_FRAME_NUM = 2,
  ANALYZE_GAPS_FRAME_NUM = 3,
};

class H264Analyzer {
 public:
  // Walks NALs in an Annex-B access unit until the first slice; parses SPS
  // when seen. Returns an AnalyzeErrors bitmask (>= 0), or TS_REPEAT when
  // no slice NAL is present in the packet.
  int analyze(const uint8_t* data, int size) {
    enum { NAL_SLICE = 1, NAL_IDR = 5, NAL_SPS = 7 };
    int errors = ANALYZE_NONE;
    BitReader r(data, size);
    uint32_t nal_type = 0;
    while (nal_type != NAL_IDR && nal_type != NAL_SLICE) {
      nal_type = r.findNALType();
      if (nal_type == 0) return TS_REPEAT;
      if (nal_type == NAL_SPS) errors |= parseSPS(r);
    }
    // Slice header: first_mb_in_slice, slice_type, pps_id, frame_num,
    // then POC lsb; only the first slice of a frame is analyzed.
    uint32_t first_mb_in_slice = r.readGolomb();
    if (first_mb_in_slice) return TS_OK;
    (void)r.readGolomb();  // slice_type
    r.skipGolomb();        // pic_parameter_set_id
    if (sps_.separate_colour_plane_flag == 1) r.skipBits(2);
    int frame_num = static_cast<int>(r.readBits(sps_.log2_max_frame_num_minus4 + 4));
    if (!sps_.frame_mbs_only_flag) {
      uint32_t field_pic_flag = r.readBits(1);
      if (field_pic_flag) r.skipBits(1);  // bottom_field_flag
    }
    bool idr = (nal_type == NAL_IDR);
    if (idr) r.skipGolomb();  // idr_pic_id
    // frame_num restarts at 0 on IDR and wraps at its max value.
    int max_frame_num = (1 << (sps_.log2_max_frame_num_minus4 + 4)) - 1;
    if (idr || frame_num_value_ == max_frame_num) frame_num_value_ = -1;
    int pic_order_cnt_lsb = 0;
    if (sps_.pic_order_cnt_type == 0) {
      pic_order_cnt_lsb =
          static_cast<int>(r.readBits(sps_.log2_max_pic_order_cnt_lsb_minus4 + 4));
    }
    int max_poc = (1 << (sps_.log2_max_pic_order_cnt_lsb_minus4 + 4)) - 1;
    if (poc_ == max_poc) poc_ = 0;
    if (sps_.gaps_in_frame_num_value_allowed_flag == 0) {
      if (frame_num == frame_num_value_) {
        // Same frame_num twice: must be a B-frame pair with increasing POC.
        if (pic_order_cnt_lsb <= poc_) errors |= ANALYZE_B_POC;
      } else if (frame_num != frame_num_value_ + 1) {
        errors |= ANALYZE_FRAME_NUM;  // discontinuity: dropped frame(s)
      }
    }
    frame_num_value_ = frame_num;
    poc_ = pic_order_cnt_lsb;
    return errors;
  }

  void reset() {
    frame_num_value_ = -1;
    poc_ = 0;
    sps_ = SPSState();
  }

 private:
  struct SPSState {
    int separate_colour_plane_flag = 0;
    int log2_max_frame_num_minus4 = 0;
    int pic_order_cnt_type = 0;
    int frame_mbs_only_flag = 0;
    int log2_max_pic_order_cnt_lsb_minus4 = 0;
    int gaps_in_frame_num_value_allowed_flag = 0;
  };

  // Parses the SPS fields Analyze needs (reference: src/Parser.cpp:188-236).
  int parseSPS(BitReader& r) {
    int errors = ANALYZE_NONE;
    uint32_t profile_idc = r.readBits(8);
    r.skipBits(8);       // constraint flags + reserved
    (void)r.readBits(8); // level_idc
    (void)r.readGolomb(); // seq_parameter_set_id
    uint32_t chroma_format_idc = 1;
    switch (profile_idc) {
      case 100: case 110: case 122: case 244: case 44:
      case 83: case 86: case 118: case 128: case 138:
      case 139: case 134: case 135: {
        chroma_format_idc = r.readGolomb();
        if (chroma_format_idc == 3)
          sps_.separate_colour_plane_flag = static_cast<int>(r.readBits(1));
        r.skipGolomb();  // bit_depth_luma_minus8
        r.skipGolomb();  // bit_depth_chroma_minus8
        r.skipBits(1);   // qpprime_y_zero_transform_bypass_flag
        uint32_t scaling = r.readBits(1);
        if (scaling) {
          int lists = (chroma_format_idc != 3) ? 8 : 12;
          // NOTE(parity): the reference skips 1 bit per list and never
          // walks present scaling lists (src/Parser.cpp:205-208); kept
          // as-is so byte positions match its behavior on the fixtures.
          for (int i = 0; i < lists; i++) r.skipBits(1);
        }
        break;
      }
      default:
        break;  // baseline/main: nothing extra before log2_max_frame_num
    }
    // Spec bound is 12 for both log2 fields (H.264 7.4.2.1.1); a corrupt
    // SPS must not drive the (1 << (log2+4)) wrap math into UB or
    // readBits into absurd lengths.
    sps_.log2_max_frame_num_minus4 =
        static_cast<int>(std::min<uint32_t>(r.readGolomb(), 12));
    sps_.pic_order_cnt_type = static_cast<int>(r.readGolomb());
    if (sps_.pic_order_cnt_type == 0) {
      sps_.log2_max_pic_order_cnt_lsb_minus4 =
          static_cast<int>(std::min<uint32_t>(r.readGolomb(), 12));
    } else if (sps_.pic_order_cnt_type == 1) {
      r.skipBits(1);   // delta_pic_order_always_zero_flag
      r.skipGolomb();  // offset_for_non_ref_pic
      r.skipGolomb();  // offset_for_top_to_bottom_field
      uint32_t n = r.readGolomb();
      for (uint32_t i = 0; i < n; i++) r.skipGolomb();
    }
    r.skipGolomb();  // max_num_ref_frames
    sps_.gaps_in_frame_num_value_allowed_flag = static_cast<int>(r.readBits(1));
    if (sps_.gaps_in_frame_num_value_allowed_flag) errors |= ANALYZE_GAPS_FRAME_NUM;
    r.skipGolomb();  // pic_width_in_mbs_minus1
    r.skipGolomb();  // pic_height_in_map_units_minus1
    sps_.frame_mbs_only_flag = static_cast<int>(r.readBits(1));
    return errors;
  }

  SPSState sps_;
  int frame_num_value_ = -1;
  int poc_ = 0;
};

}  // namespace ts

// AV1 stream-health analyzer: detects dropped/repeated frames from
// order_hint continuity — extends the reference's stream-health story
// (src/Parser.cpp:146-293, H.264-only) to AV1 ingest, which the
// reference does not support at all (docs/ROADMAP.md item 6).
//
// AV1 has no frame_num or POC; what its frame headers expose is
// order_hint, a modular presentation-order counter (when the sequence
// header enables it — libaom/SVT streams do by default). Decode order is
// a permutation of order_hint within a bounded reorder window (hidden
// ALTREF frames carry future hints, later displayed via
// show_existing_frame), so the same hole-watermark algorithm as the HEVC
// analyzer applies: a dropped frame is a hole in the unwrapped hint
// sequence that never fills while the stream runs a window ahead.
//
// Signals (same AnalyzeErrors mask as the H.264/HEVC analyzers):
//   * ANALYZE_FRAME_NUM  — unfilled order_hint hole (dropped frame), or
//     a stream that begins without a keyframe (missing-IDR analogue);
//   * ANALYZE_B_POC      — order_hint below the contiguity watermark
//     (repeated / late picture);
//   * ANALYZE_GAPS_FRAME_NUM — OBU-level corruption (forbidden bit set,
//     OBU size overrunning the packet).
//
// OBU parsing follows the low-overhead bitstream format used by IVF/
// WebM/MP4 (obu_has_size_field=1, leb128 sizes); the sequence-header
// fields are parsed exactly as far as needed to reach order_hint in the
// frame header (AV1 spec 5.5, 5.9.2).
#pragma once

#include <cstdint>
#include <set>

#include "analyzer.h"  // AnalyzeErrors bitmask values
#include "bitreader.h"
#include "ts_common.h"

namespace ts {

class AV1Analyzer {
 public:
  // `data` is one temporal unit as stored by the container. Returns an
  // AnalyzeErrors bitmask, or TS_REPEAT when no frame OBU is present
  // (e.g. a bare temporal delimiter), mirroring the H.264 analyzer's
  // no-slice result.
  int analyze(const uint8_t* data, int size) {
    enum {
      OBU_SEQUENCE_HEADER = 1,
      OBU_FRAME_HEADER = 3,
      OBU_FRAME = 6,
      OBU_REDUNDANT_FRAME_HEADER = 7,
    };
    int pos = 0;
    int errors = ANALYZE_NONE;
    bool saw_frame = false;
    while (pos < size) {
      uint8_t b = data[pos];
      if (b & 0x80) return errors | ANALYZE_GAPS_FRAME_NUM;  // forbidden bit
      int obu_type = (b >> 3) & 0xF;
      bool has_ext = (b >> 2) & 1;
      bool has_size = (b >> 1) & 1;
      pos++;
      if (has_ext) pos++;  // temporal/spatial id byte
      int64_t obu_size;
      if (has_size) {
        bool ok = false;
        obu_size = readLeb128(data, size, &pos, &ok);
        if (!ok) return errors | ANALYZE_GAPS_FRAME_NUM;
      } else {
        obu_size = size - pos;
      }
      if (pos + obu_size > size) return errors | ANALYZE_GAPS_FRAME_NUM;
      BitReader r(data + pos, static_cast<int>(obu_size));
      if (obu_type == OBU_SEQUENCE_HEADER) {
        parseSequenceHeader(r);
      } else if (obu_type == OBU_FRAME_HEADER || obu_type == OBU_FRAME) {
        errors |= parseFrameHeader(r);
        saw_frame = true;
      }
      // OBU_REDUNDANT_FRAME_HEADER repeats bits already analyzed; tile
      // groups, metadata, padding carry no health information.
      pos += static_cast<int>(obu_size);
    }
    return saw_frame ? errors : TS_REPEAT;
  }

  void reset() {
    seq_ = SeqState();
    seen_.clear();
    watermark_ = 0;
    prev_hint_ = -1;
    hint_msb_ = 0;
    started_ = false;
  }

 private:
  struct SeqState {
    bool valid = false;
    bool reduced_still_picture = false;
    bool decoder_model_info_present = false;
    bool equal_picture_interval = true;
    int frame_presentation_time_length = 0;
    bool frame_id_numbers_present = false;
    int id_len = 0;
    int force_screen_content_tools = 2;  // SELECT_*
    int force_integer_mv = 2;
    bool enable_order_hint = false;
    int order_hint_bits = 0;
  };

  static int64_t readLeb128(const uint8_t* data, int size, int* pos,
                            bool* ok) {
    int64_t value = 0;
    for (int i = 0; i < 8; i++) {
      if (*pos >= size) {
        *ok = false;
        return 0;
      }
      uint8_t byte = data[(*pos)++];
      value |= static_cast<int64_t>(byte & 0x7f) << (7 * i);
      if (!(byte & 0x80)) {
        *ok = true;
        return value;
      }
    }
    *ok = false;  // leb128 longer than 8 bytes: corrupt
    return 0;
  }

  // AV1 spec 5.5.1-5.5.4 — parses exactly as far as the fields the frame
  // header later branches on.
  void parseSequenceHeader(BitReader& r) {
    SeqState s;
    r.skipBits(3);  // seq_profile
    r.skipBits(1);  // still_picture
    s.reduced_still_picture = r.readBits(1);
    if (s.reduced_still_picture) {
      r.skipBits(5);  // seq_level_idx[0]
      // No timing/model/operating points; order hints disabled.
    } else {
      bool timing_info_present = r.readBits(1);
      if (timing_info_present) {
        r.skipBits(32);  // num_units_in_display_tick
        r.skipBits(32);  // time_scale
        s.equal_picture_interval = r.readBits(1);
        if (s.equal_picture_interval) readUvlc(r);  // num_ticks_per_picture
        s.decoder_model_info_present = r.readBits(1);
      }
      int buffer_delay_length = 0;
      if (s.decoder_model_info_present) {
        buffer_delay_length = static_cast<int>(r.readBits(5)) + 1;
        r.skipBits(32);  // num_units_in_decoding_tick
        r.skipBits(5);   // buffer_removal_time_length_minus_1
        s.frame_presentation_time_length =
            static_cast<int>(r.readBits(5)) + 1;
      }
      bool initial_display_delay_present = r.readBits(1);
      uint32_t op_cnt = r.readBits(5) + 1;
      for (uint32_t i = 0; i < op_cnt; i++) {
        r.skipBits(12);  // operating_point_idc
        uint32_t seq_level_idx = r.readBits(5);
        if (seq_level_idx > 7) r.skipBits(1);  // seq_tier
        if (s.decoder_model_info_present) {
          if (r.readBits(1)) {  // decoder_model_present_for_this_op
            r.skipBits(buffer_delay_length);  // decoder_buffer_delay
            r.skipBits(buffer_delay_length);  // encoder_buffer_delay
            r.skipBits(1);                    // low_delay_mode_flag
          }
        }
        if (initial_display_delay_present) {
          if (r.readBits(1)) r.skipBits(4);  // initial_display_delay
        }
      }
    }
    uint32_t frame_width_bits = r.readBits(4) + 1;
    uint32_t frame_height_bits = r.readBits(4) + 1;
    r.skipBits(static_cast<int>(frame_width_bits));   // max_frame_width
    r.skipBits(static_cast<int>(frame_height_bits));  // max_frame_height
    if (!s.reduced_still_picture) {
      s.frame_id_numbers_present = r.readBits(1);
      if (s.frame_id_numbers_present) {
        uint32_t delta_len = r.readBits(4) + 2;
        uint32_t additional = r.readBits(3) + 1;
        s.id_len = static_cast<int>(additional + delta_len);
      }
    }
    r.skipBits(3);  // use_128x128_superblock, enable_filter_intra,
                    // enable_intra_edge_filter
    if (!s.reduced_still_picture) {
      r.skipBits(4);  // interintra/masked compound, warped motion,
                      // dual filter
      s.enable_order_hint = r.readBits(1);
      if (s.enable_order_hint) r.skipBits(2);  // jnt_comp, ref_frame_mvs
      if (r.readBits(1))  // seq_choose_screen_content_tools
        s.force_screen_content_tools = 2;
      else
        s.force_screen_content_tools = static_cast<int>(r.readBits(1));
      if (s.force_screen_content_tools > 0) {
        if (r.readBits(1))  // seq_choose_integer_mv
          s.force_integer_mv = 2;
        else
          s.force_integer_mv = static_cast<int>(r.readBits(1));
      } else {
        s.force_integer_mv = 2;
      }
      if (s.enable_order_hint)
        s.order_hint_bits = static_cast<int>(r.readBits(3)) + 1;
    }
    s.valid = true;
    seq_ = s;
  }

  // uvlc(): like Exp-Golomb but the suffix follows a plain leading-zero
  // count (AV1 spec 4.10.3).
  static uint32_t readUvlc(BitReader& r) {
    int zeros = 0;
    while (!r.eof() && r.readBits(1) == 0) zeros++;
    if (zeros >= 32) return 0xFFFFFFFF;
    return r.readBits(zeros) + (zeros ? ((1u << zeros) - 1) : 0);
  }

  // AV1 spec 5.9.2 uncompressed_header(), parsed up to order_hint.
  int parseFrameHeader(BitReader& r) {
    enum { KEY_FRAME = 0, INTER_FRAME = 1, INTRA_ONLY = 2, SWITCH_FRAME = 3 };
    if (!seq_.valid) {
      // A frame OBU before any sequence header: the stream was cut
      // mid-GOP (keyframe TUs carry the sequence header) — the
      // missing-IDR analogue. Without the header the remaining fields
      // cannot be parsed, so continuity tracking starts at the next
      // keyframe.
      if (!started_) {
        started_ = true;
        return ANALYZE_FRAME_NUM;
      }
      return ANALYZE_NONE;
    }
    if (seq_.reduced_still_picture) {
      started_ = true;
      return ANALYZE_NONE;  // always a shown keyframe
    }
    if (r.readBits(1)) {  // show_existing_frame
      return ANALYZE_NONE;  // re-display of a decoded frame: no new data
    }
    uint32_t frame_type = r.readBits(2);
    bool frame_is_intra = frame_type == KEY_FRAME || frame_type == INTRA_ONLY;
    (void)frame_is_intra;
    uint32_t show_frame = r.readBits(1);
    if (show_frame && seq_.decoder_model_info_present &&
        !seq_.equal_picture_interval)
      r.skipBits(seq_.frame_presentation_time_length);
    if (!show_frame) r.skipBits(1);  // showable_frame
    if (!(frame_type == SWITCH_FRAME ||
          (frame_type == KEY_FRAME && show_frame)))
      r.skipBits(1);  // error_resilient_mode
    r.skipBits(1);    // disable_cdf_update
    int allow_screen_content_tools = seq_.force_screen_content_tools;
    if (allow_screen_content_tools == 2)
      allow_screen_content_tools = static_cast<int>(r.readBits(1));
    if (allow_screen_content_tools > 0 && seq_.force_integer_mv == 2)
      r.skipBits(1);  // force_integer_mv
    if (seq_.frame_id_numbers_present) r.skipBits(seq_.id_len);
    if (frame_type != SWITCH_FRAME) r.skipBits(1);  // frame_size_override
    if (!seq_.enable_order_hint) {
      // No continuity counter in this stream; only the missing-keyframe
      // check applies.
      if (!started_) {
        started_ = true;
        return frame_type == KEY_FRAME ? ANALYZE_NONE : ANALYZE_FRAME_NUM;
      }
      return ANALYZE_NONE;
    }
    int hint =
        static_cast<int>(r.readBits(seq_.order_hint_bits));

    if (frame_type == KEY_FRAME) {
      // A keyframe restarts the order-hint space: any unfilled hole
      // before it is a drop.
      int errors = seen_.empty() ? ANALYZE_NONE : ANALYZE_FRAME_NUM;
      seen_.clear();
      watermark_ = hint + 1;
      prev_hint_ = hint;
      hint_msb_ = 0;
      started_ = true;
      return errors;
    }
    if (!started_) {
      started_ = true;
      prev_hint_ = hint;
      watermark_ = hint + 1;
      return ANALYZE_FRAME_NUM;  // stream begins without a keyframe
    }
    // Unwrap the modular hint exactly like the HEVC POC lsb.
    int max = 1 << seq_.order_hint_bits;
    int prev_lsb = prev_hint_ & (max - 1);
    if (hint < prev_lsb && prev_lsb - hint > max / 2) hint_msb_ += max;
    else if (hint > prev_lsb && hint - prev_lsb > max / 2) hint_msb_ -= max;
    int unwrapped = hint_msb_ + hint;
    prev_hint_ = unwrapped;

    int errors = ANALYZE_NONE;
    if (unwrapped < watermark_) {
      errors |= ANALYZE_B_POC;  // repeated / late picture
    } else {
      seen_.insert(unwrapped);
      while (seen_.count(watermark_)) seen_.erase(watermark_++);
      if (!seen_.empty() && unwrapped - watermark_ >= kReorderWindow) {
        errors |= ANALYZE_FRAME_NUM;
        // Resync past the hole so one drop is reported once.
        watermark_ = *seen_.begin();
        while (seen_.count(watermark_)) seen_.erase(watermark_++);
      }
    }
    return errors;
  }

  // ALTREF distance is bounded by the reference-frame scheme; libaom's
  // maximum GF interval is 32.
  static constexpr int kReorderWindow = 32;

  SeqState seq_;
  std::set<int> seen_;
  int watermark_ = 0;
  int prev_hint_ = -1;
  int hint_msb_ = 0;
  bool started_ = false;
};

}  // namespace ts

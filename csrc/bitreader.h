// Word-wise H.264 bitstream reader.
//
// Re-design of the reference's BitReader (reference: src/Parser.cpp:6-144),
// which materialised every read as a std::vector<bool> — the known CPU
// hotspot of its Analyze stage. This version keeps a single bit cursor and
// reads MSB-first directly from the byte buffer; observable semantics
// (byte index / bit shift accounting, Exp-Golomb value mapping, the
// byte-aligned Annex-B start-code scan, and the quirky SkipBits boundary
// check) are behavior-compatible with the reference and covered by the
// ported ParserTests (tests/src/ParserTests.cpp:131-215).
#pragma once

#include <cstdint>

namespace ts {

class BitReader {
 public:
  BitReader() : data_(nullptr), size_(0) {}
  BitReader(const uint8_t* data, int size) : data_(data), size_(size) {}

  int byteIndex() const { return static_cast<int>(bit_pos_ >> 3); }
  int shiftInBits() const { return static_cast<int>(bit_pos_ & 7); }
  bool eof() const { return byteIndex() >= size_; }

  // Reads `n` bits MSB-first; returns 0 on out-of-bounds (the reference
  // read out of bounds; we clamp deterministically and latch eof).
  uint32_t readBits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; i++) {
      int64_t byte = bit_pos_ >> 3;
      if (byte >= size_) {
        // Out of bounds: zero-fill the remainder. Shifts >= 32 are UB,
        // and a corrupt length can request arbitrarily many bits — the
        // value is all-zero-filled then anyway.
        bit_pos_ += n - i;
        int rem = n - i;
        return rem >= 32 ? 0 : (v << rem);
      }
      int shift = 7 - static_cast<int>(bit_pos_ & 7);
      v = (v << 1) | ((data_[byte] >> shift) & 1);
      bit_pos_++;
    }
    return v;
  }

  // Reference quirk preserved: fails when the skip would land on or past
  // the last byte boundary computed as byteIndex + (shift+n)/8 >= size
  // (src/Parser.cpp:60-67).
  bool skipBits(int n) {
    int bytes = (shiftInBits() + n) / 8;
    if (byteIndex() + bytes >= size_) return false;
    bit_pos_ += n;
    return true;
  }

  // ue(v): counts leading zero bits, then reads that many suffix bits;
  // value = 2^len - 1 + suffix (src/Parser.cpp:93-135).
  uint32_t readGolomb() {
    int zeros = 0;
    while (!eof() && readBits(1) == 0) zeros++;
    if (zeros >= 31) return 0;
    uint32_t suffix = readBits(zeros);
    return (1u << zeros) - 1 + suffix;
  }

  // se(v) with the reference's integer-division mapping:
  // k -> (k odd ? +1 : -1) * (k / 2)   (src/Parser.cpp:109-112).
  int32_t readSignedGolomb() {
    uint32_t k = readGolomb();
    int32_t half = static_cast<int32_t>(k / 2);
    return (k % 2 == 1) ? half : -half;
  }

  bool skipGolomb() {
    int zeros = 0;
    while (!eof() && readBits(1) == 0) zeros++;
    return skipBits(zeros);
  }

  // Scans byte-aligned for an Annex-B start code (>=2 zero bytes then
  // 0x01). Leaves the cursor right after the 0x01 byte
  // (src/Parser.cpp:30-48).
  bool findNAL() {
    if (shiftInBits() != 0) bit_pos_ = (bit_pos_ & ~7LL) + 8;
    int64_t i = byteIndex();
    while (i < size_) {
      if (data_[i] == 0) {
        int zeros = 1;
        int64_t j = i + 1;
        while (j < size_ && data_[j] == 0) { zeros++; j++; }
        if (j < size_ && zeros >= 2 && data_[j] == 1) {
          bit_pos_ = (j + 1) << 3;
          return true;
        }
        i = j + 1;  // non-zero, non-one byte after zeros: keep scanning
      } else {
        i++;
      }
    }
    bit_pos_ = static_cast<int64_t>(size_) << 3;
    return false;
  }

  // Finds the next NAL and returns its nal_unit_type (5 bits after the
  // 1-bit forbidden_zero + 2-bit nal_ref_idc); 0 when no NAL is found
  // (src/Parser.cpp:50-58).
  uint32_t findNALType() {
    if (!findNAL()) return 0;
    skipBitsUnchecked(3);
    return readBits(5);
  }


 private:
  void skipBitsUnchecked(int n) { bit_pos_ += n; }

  const uint8_t* data_;
  int size_;
  int64_t bit_pos_ = 0;
};

}  // namespace ts

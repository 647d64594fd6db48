// Deterministic mutation fuzzer for the bitstream-health analyzers —
// the parsers that walk UNTRUSTED compressed bytes (H.264 SPS/slice
// headers, HEVC NALs, VP9 superframe indexes, AV1 OBUs) before any
// decode happens. Build with ASan+UBSan (`make fuzz`): every mutation
// must return a bitmask (or TS_REPEAT) without out-of-bounds reads,
// overflow UB, or hangs.
//
//   ./fuzz_analyzers <seed_file> [iterations=20000]
//
// Strategy per iteration (xorshift-seeded, reproducible): take a random
// window of the seed bitstream, apply one of {bit flips, byte
// overwrites, truncation, zero-fill, start-code/OBU-header splices},
// and feed it to all four analyzers plus the raw BitReader walk.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "../csrc/analyzer.h"
#include "../csrc/av1_analyzer.h"
#include "../csrc/bitreader.h"
#include "../csrc/hevc_analyzer.h"
#include "../csrc/vp9_analyzer.h"

namespace {

uint64_t g_state = 0x9E3779B97F4A7C15ull;

uint64_t next_rand() {
  g_state ^= g_state << 13;
  g_state ^= g_state >> 7;
  g_state ^= g_state << 17;
  return g_state;
}

std::vector<uint8_t> read_file(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    std::exit(1);
  }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    std::fclose(f);
    std::fprintf(stderr, "empty or unreadable seed %s\n", path);
    std::exit(1);
  }
  std::vector<uint8_t> buf(static_cast<size_t>(n));
  if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    std::fclose(f);
    std::fprintf(stderr, "short read on %s\n", path);
    std::exit(1);
  }
  std::fclose(f);
  return buf;
}

void mutate(std::vector<uint8_t>& buf) {
  if (buf.empty()) return;
  switch (next_rand() % 6) {
    case 0:  // bit flips
      for (int k = 0; k < 8; k++)
        buf[next_rand() % buf.size()] ^= 1u << (next_rand() % 8);
      break;
    case 1:  // byte overwrites
      for (int k = 0; k < 16; k++)
        buf[next_rand() % buf.size()] = static_cast<uint8_t>(next_rand());
      break;
    case 2:  // truncate
      buf.resize(1 + next_rand() % buf.size());
      break;
    case 3: {  // zero-fill a run
      size_t at = next_rand() % buf.size();
      size_t len = 1 + next_rand() % 64;
      for (size_t i = at; i < buf.size() && i < at + len; i++) buf[i] = 0;
      break;
    }
    case 4: {  // splice a fake Annex-B start code + NAL/OBU header
      size_t at = next_rand() % buf.size();
      const uint8_t sc[5] = {0, 0, 0, 1, static_cast<uint8_t>(next_rand())};
      for (size_t i = 0; i < 5 && at + i < buf.size(); i++)
        buf[at + i] = sc[i];
      break;
    }
    default: {  // duplicate a window onto another position
      size_t src = next_rand() % buf.size();
      size_t dst = next_rand() % buf.size();
      size_t len = 1 + next_rand() % 32;
      for (size_t i = 0; i + src < buf.size() && i + dst < buf.size() &&
                         i < len;
           i++)
        buf[dst + i] = buf[src + i];
      break;
    }
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <seed_file> [iterations]\n", argv[0]);
    return 1;
  }
  const std::vector<uint8_t> seed = read_file(argv[1]);
  const long iters = argc > 2 ? std::atol(argv[2]) : 20000;

  long masks = 0;
  for (long i = 0; i < iters; i++) {
    // Window of the seed, then one mutation pass.
    size_t lo = next_rand() % seed.size();
    size_t len = 1 + next_rand() % (seed.size() - lo);
    if (len > 65536) len = 65536;  // keep iterations fast
    std::vector<uint8_t> pkt(seed.begin() + lo, seed.begin() + lo + len);
    mutate(pkt);

    // Fresh analyzers per packet: state machines must also survive
    // arbitrary FIRST packets. Every 8th iteration reuses persistent
    // ones so cross-packet state transitions get fuzzed too.
    static ts::H264Analyzer h264_p;
    static ts::HEVCAnalyzer hevc_p;
    static ts::VP9Analyzer vp9_p;
    static ts::AV1Analyzer av1_p;
    ts::H264Analyzer h264;
    ts::HEVCAnalyzer hevc;
    ts::VP9Analyzer vp9;
    ts::AV1Analyzer av1;
    const uint8_t* d = pkt.data();
    int n = static_cast<int>(pkt.size());
    bool persist = (i % 8) == 0;
    masks += (persist ? h264_p : h264).analyze(d, n);
    masks += (persist ? hevc_p : hevc).analyze(d, n);
    masks += (persist ? vp9_p : vp9).analyze(d, n);
    masks += (persist ? av1_p : av1).analyze(d, n);

    // Raw BitReader walk: NAL scan + unbounded golomb/bit reads must
    // stop cleanly at the buffer end.
    ts::BitReader r(d, n);
    while (r.findNAL()) {
      (void)r.readBits(8);
      for (int k = 0; k < 4; k++) (void)r.readGolomb();
    }
  }
  std::printf("fuzzed %ld packets, mask accumulator %ld — clean\n", iters,
              masks);
  return 0;
}

// C ABI exposed to Python via ctypes.
//
// The reference bound its C++ orchestrator to Python with pybind11 + ATen
// from_blob (src/Wrappers/WrapperPython.cpp:458-524); here the boundary is
// a plain C ABI: Python owns NumPy-backed NV12 buffers, the library fills
// them, and the JAX VPP turns them into device arrays. ctypes releases the
// GIL for every call, which gives the same concurrency behavior as the
// reference's py::gil_scoped_release on start/get/dump.
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#if defined(__GLIBC__)
#include <malloc.h>
#endif

#include "bitreader.h"
#include "analyzer.h"
#include "parser.h"
#include "clip_reader.h"
#include "pipeline.h"
#include "segment_reader.h"
#include "video_writer.h"
#include "stream_pool.h"
#include "vpp_convert.h"
#include "vpp_host_simd.h"

using ts::BitReader;
using ts::HEVCAnalyzer;
using ts::StreamPool;
using ts::H264Analyzer;
using ts::Parser;
using ts::Pipeline;

#if defined(__GLIBC__)
// Keep frame-sized allocations on the reusable heap. Decoded 1080p NV12
// frame buffers (~3 MB) sit above glibc's default mmap threshold, so by
// default EVERY decoded frame mmap()s a fresh buffer and munmap()s it on
// release: ~800 kernel page faults per frame, forever. Fault cost on
// shared/virtualized hosts is erratic (zone-lock and hypervisor
// interference) — measured here as intermittent 50x decode slowdowns
// (aggregate pool throughput 580 -> 20 fps) with 87% of the core in
// system time. Raising the thresholds makes frame buffers heap-recycled:
// the faults disappear after warm-up and decode becomes immune to that
// weather. 64 MB covers NV12 frames up to 8K; trim keeps a freed working
// set resident instead of returning it per tick. Process-wide by nature
// (glibc has no per-arena knob) — TS_NO_MALLOC_TUNE=1 opts out.
__attribute__((constructor)) static void ts_malloc_tune() {
  const char* off = std::getenv("TS_NO_MALLOC_TUNE");
  if (off && off[0] == '1') return;
  mallopt(M_MMAP_THRESHOLD, 64 << 20);
  mallopt(M_TRIM_THRESHOLD, 32 << 20);
  // One arena: every decoder/pool/loader thread shares the same free
  // lists, so a re-created pipeline re-uses the previous one's frame
  // pages instead of first-touching a fresh per-thread heap (~190 MB of
  // faults per pool spin-up otherwise). Allocation rate after warm-up
  // is ~1 alloc+free per decoded frame per stream — thousands/s, far
  // below any arena-lock contention regime.
  mallopt(M_ARENA_MAX, 1);
}
#endif

extern "C" {

// ---------------------------------------------------------------- pipeline

void* ts_pipeline_create() { return new Pipeline(); }

int ts_pipeline_init(void* p, const char* url, int max_consumers, int buffer_size,
                     int framerate_mode, int enable_dumps, int decode_threads) {
  ts::PipelineParams params;
  params.input = url ? url : "";
  params.max_consumers = max_consumers;
  params.buffer_size = buffer_size;
  params.framerate_mode = framerate_mode;
  params.enable_dumps = enable_dumps != 0;
  params.decode_threads = decode_threads;
  return static_cast<Pipeline*>(p)->Init(params);
}

// Like ts_pipeline_init with an extra replay flag: loop=1 seeks back to
// the stream start on EOF (benchmark / infinite-replay mode).
int ts_pipeline_init_ex(void* p, const char* url, int max_consumers,
                        int buffer_size, int framerate_mode, int enable_dumps,
                        int decode_threads, int loop, int fast_decode) {
  ts::PipelineParams params;
  params.input = url ? url : "";
  params.max_consumers = max_consumers;
  params.buffer_size = buffer_size;
  params.framerate_mode = framerate_mode;
  params.enable_dumps = enable_dumps != 0;
  params.decode_threads = decode_threads;
  params.loop = loop != 0;
  params.fast_decode = fast_decode != 0;
  return static_cast<Pipeline*>(p)->Init(params);
}

// Full-parameter init: adds live-source reconnect (elastic recovery)
// on top of ts_pipeline_init_ex. reconnect_attempts < 0 retries forever.
int ts_pipeline_init_ex2(void* p, const char* url, int max_consumers,
                         int buffer_size, int framerate_mode, int enable_dumps,
                         int decode_threads, int loop, int fast_decode,
                         int reconnect, int reconnect_delay_ms,
                         int reconnect_attempts) {
  ts::PipelineParams params;
  params.input = url ? url : "";
  params.max_consumers = max_consumers;
  params.buffer_size = buffer_size;
  params.framerate_mode = framerate_mode;
  params.enable_dumps = enable_dumps != 0;
  params.decode_threads = decode_threads;
  params.loop = loop != 0;
  params.fast_decode = fast_decode != 0;
  params.reconnect = reconnect != 0;
  // >= 0 so an explicit zero delay (retry immediately) is representable;
  // negative keeps the default.
  if (reconnect_delay_ms >= 0) params.reconnect_delay_ms = reconnect_delay_ms;
  params.reconnect_attempts = reconnect_attempts;
  return static_cast<Pipeline*>(p)->Init(params);
}

// Queues an extra avformat open option (key=value) to apply at the next
// init — e.g. rtsp_flags=listen for listen-mode ingest, listen_timeout,
// probesize. Call before ts_pipeline_init*.
void ts_pipeline_set_format_option(void* p, const char* key,
                                   const char* value) {
  static_cast<Pipeline*>(p)->QueueFormatOption(key ? key : "",
                                               value ? value : "");
}

int ts_pipeline_seek_frame(void* p, long long skip) {
  return static_cast<Pipeline*>(p)->SeekToFrame(skip);
}
int ts_pipeline_start(void* p) { return static_cast<Pipeline*>(p)->Start(); }
int ts_pipeline_step(void* p) { return static_cast<Pipeline*>(p)->Step(); }

int ts_pipeline_get(void* p, const char* consumer, int index, uint8_t* out_y,
                    uint8_t* out_uv) {
  return static_cast<Pipeline*>(p)->GetFrame(consumer ? consumer : "default", index,
                                             out_y, out_uv);
}

int ts_pipeline_try_get(void* p, const char* consumer, int index, uint8_t* out_y,
                        uint8_t* out_uv) {
  return static_cast<Pipeline*>(p)->TryGetFrame(consumer ? consumer : "default",
                                                index, out_y, out_uv);
}

// Reads `count` consecutive latest-frame GetFrame results (with the
// ring look-back `index`) into packed per-frame planes, looping in C so
// a paced consumer never pays Python/GIL latency between wakes — the
// native equivalent of the reference's C++ getCycle consumers
// (reference: tests/src/WrapperTests.cpp:24-44). Returns the number of
// frames read before the stream finished; `indices` (optional) receives
// each frame's absolute index.
int ts_pipeline_get_series(void* p, const char* consumer, int index,
                           int count, uint8_t* out_y, uint8_t* out_uv,
                           int* indices) {
  auto* pipe = static_cast<Pipeline*>(p);
  // Strides follow the consumer's ACKNOWLEDGED geometry (what GetFrame
  // will actually copy) — after a mid-stream switch the live probe may
  // already differ; a mismatched read returns TS_RENEGOTIATE instead of
  // copying, ending the series early.
  int w = 0, h = 0;
  pipe->consumerDims(consumer ? consumer : "default", &w, &h);
  size_t y_size = static_cast<size_t>(w) * h;
  size_t uv_size = y_size / 2;
  for (int i = 0; i < count; i++) {
    int idx = pipe->GetFrame(consumer ? consumer : "default", index,
                             out_y + i * y_size, out_uv + i * uv_size);
    if (idx < 0) {
      // Frames copied so far; but when NOTHING was copied, surface the
      // stop reason itself — a fresh consumer after a geometry switch
      // must see TS_RENEGOTIATE (ack-and-retry via
      // ts_pipeline_ack_renegotiate, then call again), not a permanent
      // empty series indistinguishable from end-of-stream.
      return i > 0 ? i : idx;
    }
    if (indices) indices[i] = idx;
  }
  return count;
}

int ts_pipeline_get_batch(void* p, const char* consumer, int count,
                          uint8_t* out_y, uint8_t* out_uv, int* first_index) {
  return static_cast<Pipeline*>(p)->GetFrameBatch(
      consumer ? consumer : "default", count, out_y, out_uv, first_index);
}

void ts_pipeline_register_cursor(void* p, const char* consumer) {
  static_cast<Pipeline*>(p)->RegisterCursor(consumer ? consumer : "default");
}

int ts_pipeline_get_batch_resized(void* p, const char* consumer, int count,
                                  int dst_w, int dst_h, int algo,
                                  uint8_t* out_y, uint8_t* out_uv,
                                  int* first_index) {
  return static_cast<Pipeline*>(p)->GetFrameBatchResized(
      consumer ? consumer : "default", count, dst_w, dst_h, algo, out_y,
      out_uv, first_index);
}

// ----------------------------------------------------------- stream pool

void* ts_pool_create(int workers) { return new StreamPool(workers); }

int ts_pool_add_stream(void* p, const char* url, int buffer_size, int loop,
                       int fast_decode) {
  ts::PipelineParams params;
  params.input = url ? url : "";
  params.buffer_size = buffer_size;
  params.framerate_mode = 3;  // FR_FAST: pool streams decode unpaced
  params.loop = loop != 0;
  params.fast_decode = fast_decode != 0;
  return static_cast<StreamPool*>(p)->AddStream(params);
}

int ts_pool_start(void* p) { return static_cast<StreamPool*>(p)->Start(); }

// Per-stream accessors delegate to the underlying pipeline; consumer
// calls (get_batch / register_cursor / get) use the same contracts as
// the standalone pipeline API.
void* ts_pool_stream(void* p, int idx) {
  return static_cast<StreamPool*>(p)->stream(idx);
}

void ts_pool_stop(void* p) { static_cast<StreamPool*>(p)->Stop(); }
void ts_pool_destroy(void* p) { delete static_cast<StreamPool*>(p); }

// Standalone host resize (testing hook): tightly-packed NV12 in/out.
void ts_resize_nv12_host(const uint8_t* y, const uint8_t* uv, int sw, int sh,
                         uint8_t* out_y, uint8_t* out_uv, int dw, int dh,
                         int algo) {
  ts::ResizeNV12Host(y, uv, sw, sh, out_y, out_uv, dw, dh,
                     static_cast<ts::HostResizeAlgo>(algo));
}

// Whether the AVX2+FMA bilinear inner loops are active in this process
// (CPU support AND the TS_HOST_SIMD env toggle; see vpp_host_simd.h).
int ts_host_simd_available(void) { return ts::simd::Available() ? 1 : 0; }

// ------------------------------------------------- host VPP (C++ twin)

// Full host VPP chain on a packed NV12 frame: crop -> resize -> convert ->
// normalize (csrc/vpp_convert.cpp; the native counterpart of
// ops/vpp.py's device program). `out` receives u8 bytes or f32 floats per
// ts_vpp_is_float; size it with ts_vpp_output_elements on the output
// dimensions from ts_vpp_output_size.
int ts_vpp_convert_host(const uint8_t* y, const uint8_t* uv, int src_w,
                        int src_h, int crop_left, int crop_top, int crop_right,
                        int crop_bottom, int dst_w, int dst_h, int resize_algo,
                        int fourcc, int planes, int normalization,
                        int standard, void* out) {
  ts::HostVppParams p;
  p.crop_left = crop_left;
  p.crop_top = crop_top;
  p.crop_right = crop_right;
  p.crop_bottom = crop_bottom;
  p.dst_width = dst_w;
  p.dst_height = dst_h;
  p.resize_algo = static_cast<ts::HostResizeAlgo>(resize_algo);
  p.fourcc = fourcc;
  p.planes = planes;
  p.normalization = normalization != 0;
  p.standard = standard;
  return ts::VppConvertHost(y, uv, src_w, src_h, p, out);
}

long long ts_vpp_output_elements(int w, int h, int fourcc) {
  return static_cast<long long>(ts::ConvertedElements(w, h, fourcc));
}

int ts_vpp_is_float(int fourcc, int normalization) {
  return ts::ConvertedIsFloat(fourcc, normalization != 0) ? 1 : 0;
}

void ts_vpp_output_size(int src_w, int src_h, int crop_left, int crop_top,
                        int crop_right, int crop_bottom, int dst_w, int dst_h,
                        int* out_w, int* out_h) {
  ts::HostVppParams p;
  p.crop_left = crop_left;
  p.crop_top = crop_top;
  p.crop_right = crop_right;
  p.crop_bottom = crop_bottom;
  p.dst_width = dst_w;
  p.dst_height = dst_h;
  ts::VppOutputSize(src_w, src_h, p, out_w, out_h);
}

// getFrame + full host VPP in one call — the C ABI face of the C++
// consumer twin (reference: WrapperC.h getFrame<T>). Returns the absolute
// frame index, TS_FINISHED, or TS_ERROR (also on invalid VPP params).
int ts_pipeline_get_converted(void* p, const char* consumer, int index,
                              int crop_left, int crop_top, int crop_right,
                              int crop_bottom, int dst_w, int dst_h,
                              int resize_algo, int fourcc, int planes,
                              int normalization, int standard, void* out) {
  auto* pipe = static_cast<Pipeline*>(p);
  // Size the NV12 staging for the geometry this consumer has
  // acknowledged — after a mid-stream resolution switch that can differ
  // from the pipeline's current width()/height() until the consumer
  // acks (GetFrame returns TS_RENEGOTIATE rather than copying a
  // mismatched generation).
  int w = 0, h = 0;
  pipe->consumerDims(consumer ? consumer : "default", &w, &h);
  if (standard < 0) standard = pipe->detectedStandard();  // AUTO
  std::vector<uint8_t> y(static_cast<size_t>(w) * h);
  std::vector<uint8_t> uv(static_cast<size_t>(w) * (h / 2));
  int idx = pipe->GetFrame(consumer ? consumer : "default", index, y.data(),
                           uv.data());
  if (idx < 0) return idx;
  int sts = ts_vpp_convert_host(y.data(), uv.data(), w, h, crop_left,
                                crop_top, crop_right, crop_bottom, dst_w,
                                dst_h, resize_algo, fourcc, planes,
                                normalization, standard, out);
  if (sts != 0) return ts::TS_ERROR;
  return idx;
}

void ts_pipeline_stop(void* p) { static_cast<Pipeline*>(p)->Stop(); }
void ts_pipeline_destroy(void* p) { delete static_cast<Pipeline*>(p); }

int ts_pipeline_width(void* p) { return static_cast<Pipeline*>(p)->width(); }
int ts_pipeline_height(void* p) { return static_cast<Pipeline*>(p)->height(); }

// Geometry renegotiation: when a read returns TS_RENEGOTIATE (-8), the
// consumer calls this to adopt the new geometry; *w / *h receive the
// dimensions its buffers must be resized to before retrying. Cursor
// consumers adopt the geometry at their cursor (exactly at the switch
// boundary); per-frame consumers adopt the latest.
int ts_pipeline_ack_renegotiate(void* p, const char* consumer, int* w,
                                int* h) {
  return static_cast<Pipeline*>(p)->ackRenegotiate(
      consumer ? consumer : "default", w, h);
}

// The geometry this consumer last acknowledged (its required buffer
// size) — may differ from ts_pipeline_width/height while pre-switch
// frames still drain.
void ts_pipeline_consumer_dims(void* p, const char* consumer, int* w,
                               int* h) {
  static_cast<Pipeline*>(p)->consumerDims(consumer ? consumer : "default", w,
                                          h);
}

// Colorimetry detected from the decoded frames' VUI metadata, as a
// ColorStandard value (0 BT601, 1 BT709, +2 full-range). Valid once a
// frame has decoded; unspecified streams report 0 (the reference's
// hardcoded behavior).
int ts_pipeline_detected_standard(void* p) {
  return static_cast<Pipeline*>(p)->detectedStandard();
}
int ts_pipeline_fps_num(void* p) { return static_cast<Pipeline*>(p)->fpsNum(); }
int ts_pipeline_fps_den(void* p) { return static_cast<Pipeline*>(p)->fpsDen(); }
int ts_pipeline_delay_ms(void* p) { return static_cast<Pipeline*>(p)->realTimeDelayMs(); }
int ts_pipeline_frame_index(void* p) { return static_cast<Pipeline*>(p)->frameIndex(); }
int ts_pipeline_analyze_errors(void* p) {
  return static_cast<Pipeline*>(p)->analyzeErrorMask();
}
int ts_pipeline_reconnect_count(void* p) {
  return static_cast<Pipeline*>(p)->reconnectCount();
}
int ts_pipeline_slept_ms(void* p) {
  return static_cast<int>(static_cast<Pipeline*>(p)->sleptMs());
}
// Cumulative producer/Step phase wall time: which = 0 read (demux),
// 1 analyze, 2 decode (+ring store), 3 iteration count (not ns).
long long ts_pipeline_stat_ns(void* p, int which) {
  return static_cast<Pipeline*>(p)->statNs(which);
}
int ts_pipeline_keeps_buffer(void* p) {
  return static_cast<Pipeline*>(p)->keepsBuffer() ? 1 : 0;
}
void ts_pipeline_skip_analyze(void* p) { static_cast<Pipeline*>(p)->skipAnalyze(); }
void ts_pipeline_enable_logs(void* p, int level) {
  static_cast<Pipeline*>(p)->enableLogs(level);
}
void ts_pipeline_enable_trace(void* p) { static_cast<Pipeline*>(p)->enableTrace(); }

// Process-global read timeout, like the reference's timeoutFrame global
// (src/Common.cpp:4).
void ts_set_timeout_ms(int ms) { ts::g_timeout_ms.store(ms); }
int ts_get_timeout_ms() { return ts::g_timeout_ms.load(); }

// -------------------------------------------------- bitreader (test hooks)

struct BitReaderHandle {
  std::string data;
  BitReader reader;
};

void* ts_bitreader_create(const uint8_t* data, int size) {
  auto* h = new BitReaderHandle();
  h->data.assign(reinterpret_cast<const char*>(data), size);
  h->reader = BitReader(reinterpret_cast<const uint8_t*>(h->data.data()), size);
  return h;
}
void ts_bitreader_destroy(void* r) { delete static_cast<BitReaderHandle*>(r); }
unsigned ts_bitreader_read_bits(void* r, int n) {
  return static_cast<BitReaderHandle*>(r)->reader.readBits(n);
}
int ts_bitreader_skip_bits(void* r, int n) {
  return static_cast<BitReaderHandle*>(r)->reader.skipBits(n) ? 1 : 0;
}
unsigned ts_bitreader_read_golomb(void* r) {
  return static_cast<BitReaderHandle*>(r)->reader.readGolomb();
}
int ts_bitreader_read_sgolomb(void* r) {
  return static_cast<BitReaderHandle*>(r)->reader.readSignedGolomb();
}
int ts_bitreader_skip_golomb(void* r) {
  return static_cast<BitReaderHandle*>(r)->reader.skipGolomb() ? 1 : 0;
}
unsigned ts_bitreader_find_nal_type(void* r) {
  return static_cast<BitReaderHandle*>(r)->reader.findNALType();
}
int ts_bitreader_byte_index(void* r) {
  return static_cast<BitReaderHandle*>(r)->reader.byteIndex();
}
int ts_bitreader_shift_in_bits(void* r) {
  return static_cast<BitReaderHandle*>(r)->reader.shiftInBits();
}

// --------------------------------------------------- analyzer (test hooks)

void* ts_hevc_analyzer_create() { return new HEVCAnalyzer(); }
void ts_hevc_analyzer_destroy(void* a) { delete static_cast<HEVCAnalyzer*>(a); }
int ts_hevc_analyzer_analyze(void* a, const uint8_t* data, int size) {
  return static_cast<HEVCAnalyzer*>(a)->analyze(data, size);
}

void* ts_analyzer_create() { return new H264Analyzer(); }
void ts_analyzer_destroy(void* a) { delete static_cast<H264Analyzer*>(a); }
int ts_analyzer_analyze(void* a, const uint8_t* data, int size) {
  return static_cast<H264Analyzer*>(a)->analyze(data, size);
}

void* ts_vp9_analyzer_create() { return new ts::VP9Analyzer(); }
void ts_vp9_analyzer_destroy(void* a) { delete static_cast<ts::VP9Analyzer*>(a); }
int ts_vp9_analyzer_analyze(void* a, const uint8_t* data, int size) {
  return static_cast<ts::VP9Analyzer*>(a)->analyze(data, size);
}

void* ts_av1_analyzer_create() { return new ts::AV1Analyzer(); }
void ts_av1_analyzer_destroy(void* a) { delete static_cast<ts::AV1Analyzer*>(a); }
int ts_av1_analyzer_analyze(void* a, const uint8_t* data, int size) {
  return static_cast<ts::AV1Analyzer*>(a)->analyze(data, size);
}

// ----------------------------------------------------- parser (test hooks)

struct ParserHandle {
  Parser parser;
  AVPacket* pkt = nullptr;
};

void* ts_parser_create() { return new ParserHandle(); }
void ts_parser_destroy(void* p) {
  auto* h = static_cast<ParserHandle*>(p);
  if (h->pkt) av_packet_free(&h->pkt);
  delete h;
}
int ts_parser_init(void* p, const char* url, int keep_buffer, int enable_dumps) {
  auto* h = static_cast<ParserHandle*>(p);
  ts::ParserParams params{url ? url : "", keep_buffer != 0, enable_dumps != 0};
  auto logger = std::make_shared<ts::Logger>();
  int sts = h->parser.Init(params, logger);
  if (sts == ts::TS_OK) h->pkt = av_packet_alloc();
  return sts == ts::TS_OK ? ts::TS_OK : ts::TS_ERROR;
}

// --------------------------------------- GOP/segment-parallel reader
//
// Scales software decode of seekable files across host cores by
// keyframe-splitting (see segment_reader.h). Bulk-cursor surface only;
// live/paced consumers use the serial pipeline.

// Returns a handle, or NULL when the source is unsupported (not
// seekable / no frames) or the scan failed.
void* ts_segmented_create(const char* url, int workers, int window, int loop,
                          int dst_w, int dst_h, int algo, int decode_threads,
                          int fast_decode, int chunk_frames) {
  auto* r = new ts::SegmentedReader();
  ts::SegmentedParams params;
  params.input = url ? url : "";
  params.workers = workers;
  if (window > 0) params.window = window;
  params.loop = loop != 0;
  params.dst_width = dst_w;
  params.dst_height = dst_h;
  params.resize_algo = algo;
  if (decode_threads > 0) params.decode_threads = decode_threads;
  params.fast_decode = fast_decode != 0;
  if (chunk_frames > 0) params.chunk_frames = chunk_frames;
  if (r->Init(params, std::make_shared<ts::Logger>()) != ts::TS_OK) {
    delete r;
    return nullptr;
  }
  return r;
}

int ts_segmented_start(void* p) {
  return static_cast<ts::SegmentedReader*>(p)->Start();
}

int ts_segmented_get_batch(void* p, int count, uint8_t* out_y,
                           uint8_t* out_uv, int* first_index) {
  return static_cast<ts::SegmentedReader*>(p)->GetBatch(count, out_y, out_uv,
                                                        first_index);
}

int ts_segmented_width(void* p) {
  return static_cast<ts::SegmentedReader*>(p)->width();
}
int ts_segmented_height(void* p) {
  return static_cast<ts::SegmentedReader*>(p)->height();
}
int ts_segmented_out_width(void* p) {
  return static_cast<ts::SegmentedReader*>(p)->outWidth();
}
int ts_segmented_out_height(void* p) {
  return static_cast<ts::SegmentedReader*>(p)->outHeight();
}
long long ts_segmented_total_frames(void* p) {
  return static_cast<ts::SegmentedReader*>(p)->totalFrames();
}
int ts_segmented_chunks(void* p) {
  return static_cast<ts::SegmentedReader*>(p)->chunks();
}
long long ts_segmented_frames_deposited(void* p) {
  return static_cast<ts::SegmentedReader*>(p)->framesDeposited();
}
void ts_segmented_seek_frame(void* p, long long frame) {
  static_cast<ts::SegmentedReader*>(p)->SeekFrame(frame);
}
void ts_segmented_stop(void* p) {
  static_cast<ts::SegmentedReader*>(p)->Stop();
}
void ts_segmented_destroy(void* p) {
  delete static_cast<ts::SegmentedReader*>(p);
}

// --------------------------------------------- random-access clip reader
//
// Shuffled fixed-length clip sampling for video-model training
// (csrc/clip_reader.h): seeks to IDR entry points, warm-up decodes, and
// returns bit-exact [n_clips, clip_len] NV12 stacks. No reference
// counterpart (its Parser::Reset is unimplemented).

// Returns a handle, or NULL when the source is unsupported (not
// seekable / no frames) or the scan failed.
void* ts_clip_create(const char* url, int workers, int dst_w, int dst_h,
                     int algo, int decode_threads, int fast_decode) {
  auto* r = new ts::ClipReader();
  ts::ClipReaderParams params;
  params.input = url ? url : "";
  params.workers = workers;
  params.dst_width = dst_w;
  params.dst_height = dst_h;
  params.resize_algo = algo;
  if (decode_threads > 0) params.decode_threads = decode_threads;
  params.fast_decode = fast_decode != 0;
  if (r->Init(params, std::make_shared<ts::Logger>()) != ts::TS_OK) {
    delete r;
    return nullptr;
  }
  return r;
}

int ts_clip_get_batch(void* p, const long long* starts, int n_clips,
                      int clip_len, int stride, uint8_t* out_y,
                      uint8_t* out_uv) {
  static_assert(sizeof(long long) == sizeof(int64_t), "ABI");
  return static_cast<ts::ClipReader*>(p)->GetClipBatch(
      reinterpret_cast<const int64_t*>(starts), n_clips, clip_len, stride,
      out_y, out_uv);
}

int ts_clip_width(void* p) { return static_cast<ts::ClipReader*>(p)->width(); }
int ts_clip_height(void* p) {
  return static_cast<ts::ClipReader*>(p)->height();
}
int ts_clip_out_width(void* p) {
  return static_cast<ts::ClipReader*>(p)->outWidth();
}
int ts_clip_out_height(void* p) {
  return static_cast<ts::ClipReader*>(p)->outHeight();
}
long long ts_clip_total_frames(void* p) {
  return static_cast<ts::ClipReader*>(p)->totalFrames();
}
int ts_clip_segments(void* p) {
  return static_cast<ts::ClipReader*>(p)->segments();
}
// First display frame of each entry point, ascending; writes
// min(cap, segments) values and returns segments. Samplers use this to
// group a shuffled epoch by segment (decode each GOP ~once per epoch).
int ts_clip_segment_table(void* p, long long* out, int cap) {
  auto* r = static_cast<ts::ClipReader*>(p);
  const int n = r->segments();
  for (int i = 0; i < n && i < cap; i++) out[i] = r->segmentFirstFrame(i);
  return n;
}
long long ts_clip_frames_decoded(void* p) {
  return static_cast<ts::ClipReader*>(p)->framesDecoded();
}
// Close the per-worker decoder instances, keep the keyframe scan; a
// many-file dataset caps its open-decoder footprint with this between
// batches (the next ts_clip_get_batch reopens lazily). Not reentrant
// with ts_clip_get_batch.
void ts_clip_release_decoders(void* p) {
  static_cast<ts::ClipReader*>(p)->ReleaseDecoders();
}
void ts_clip_destroy(void* p) { delete static_cast<ts::ClipReader*>(p); }

// ------------------------------------------------------- video writer
//
// In-process libavcodec encoder (csrc/video_writer.h) — the programmatic
// counterpart of the reference's ffmpeg-subprocess writer.

void* ts_writer_create(const char* path, int w, int h, int fps_num,
                       int fps_den, const char* codec, int bitrate) {
  auto* wr = new ts::VideoWriter();
  ts::WriterParams params;
  params.path = path ? path : "";
  params.width = w;
  params.height = h;
  if (fps_num > 0) params.fps_num = fps_num;
  if (fps_den > 0) params.fps_den = fps_den;
  if (codec && codec[0]) params.codec = codec;
  if (bitrate > 0) params.bitrate = bitrate;
  if (wr->Init(params) != ts::TS_OK) {
    delete wr;
    return nullptr;
  }
  return wr;
}

int ts_writer_write_rgb(void* p, const uint8_t* rgb) {
  return static_cast<ts::VideoWriter*>(p)->WriteRGB(rgb);
}

int ts_writer_write_nv12(void* p, const uint8_t* y, const uint8_t* uv) {
  return static_cast<ts::VideoWriter*>(p)->WriteNV12(y, uv);
}

long long ts_writer_frames(void* p) {
  return static_cast<ts::VideoWriter*>(p)->framesWritten();
}

int ts_writer_close(void* p) {
  return static_cast<ts::VideoWriter*>(p)->Close();
}

void ts_writer_destroy(void* p) { delete static_cast<ts::VideoWriter*>(p); }

int ts_parser_width(void* p) { return static_cast<ParserHandle*>(p)->parser.width(); }
int ts_parser_height(void* p) { return static_cast<ParserHandle*>(p)->parser.height(); }
int ts_parser_fps_num(void* p) {
  auto* h = static_cast<ParserHandle*>(p);
  AVRational fr = h->parser.frameRate();
  if (!fr.num) fr = h->parser.guessedFrameRate();
  return fr.num;
}
int ts_parser_fps_den(void* p) {
  auto* h = static_cast<ParserHandle*>(p);
  AVRational fr = h->parser.frameRate();
  if (!fr.num) fr = h->parser.guessedFrameRate();
  return fr.den;
}
// Reads the next video packet; copies up to `cap` bytes into buf. Returns
// the packet size, TS_EOF, TS_TIMEOUT or a negative error.
int ts_parser_next_packet(void* p, uint8_t* buf, int cap, long long* dts,
                          long long* pts) {
  auto* h = static_cast<ParserHandle*>(p);
  int sts = h->parser.Read();
  if (sts != ts::TS_OK) return sts;
  av_packet_unref(h->pkt);
  h->parser.Get(h->pkt);
  if (dts) *dts = h->pkt->dts;
  if (pts) *pts = h->pkt->pts;
  if (buf && cap > 0) {
    int n = h->pkt->size < cap ? h->pkt->size : cap;
    std::memcpy(buf, h->pkt->data, n);
  }
  return h->pkt->size;
}
// Analyzes the packet fetched by the last ts_parser_next_packet call.
int ts_parser_analyze_last(void* p) {
  auto* h = static_cast<ParserHandle*>(p);
  if (!h->pkt || !h->pkt->data) return ts::TS_ERROR;
  return h->parser.Analyze(h->pkt);
}

}  // extern "C"

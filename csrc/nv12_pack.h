// Shared decoded-frame -> tightly-packed NV12 pack (one definition for
// the serial ring store and the segment-parallel deposit, whose whole
// contract is bit-equality with each other): YUV420P fast path with the
// SIMD chroma interleave, NV12 row copies, SWS_POINT fallback for
// everything else (reference pipeline contract: NV12-domain VPP,
// src/Decoder.cpp:149-162).
#pragma once

#include <cstdint>
#include <cstring>

extern "C" {
#include <libavutil/frame.h>
#include <libswscale/swscale.h>
}

#include "ts_common.h"
#include "vpp_host_simd.h"

namespace ts {

// Interleaves planar U/V rows (own line sizes) into packed NV12 chroma
// (dst pitch = w): the one definition of the SIMD-trim + scalar-tail
// walk used by the ring pack, the zero-copy resized drains, and the
// segment-parallel deposit.
inline void InterleaveChromaRows(const uint8_t* u, int u_linesize,
                                 const uint8_t* v, int v_linesize, int w,
                                 int h2, uint8_t* dst) {
  const int vec = simd::Available() ? (w / 2) & ~15 : 0;
  for (int i = 0; i < h2; i++) {
    uint8_t* d = dst + static_cast<size_t>(i) * w;
    const uint8_t* ur = u + static_cast<size_t>(i) * u_linesize;
    const uint8_t* vr = v + static_cast<size_t>(i) * v_linesize;
    simd::InterleavePairs(ur, vr, d, vec);
    for (int j = vec; j < w / 2; j++) {
      d[2 * j] = ur[j];
      d[2 * j + 1] = vr[j];
    }
  }
}

inline int PackFrameNV12(const AVFrame* frame, uint8_t* dy, uint8_t* duv,
                         SwsContext** sws) {
  const int w = frame->width, h = frame->height;
  if (frame->format == AV_PIX_FMT_YUV420P ||
      frame->format == AV_PIX_FMT_YUVJ420P) {
    const uint8_t* sy = frame->data[0];
    for (int i = 0; i < h; i++)
      std::memcpy(dy + static_cast<size_t>(i) * w,
                  sy + static_cast<size_t>(i) * frame->linesize[0], w);
    // SIMD chroma interleave (pure byte moves): ~20% of the 1080p
    // decode-store budget in the scalar loop.
    InterleaveChromaRows(frame->data[1], frame->linesize[1], frame->data[2],
                         frame->linesize[2], w, h / 2, duv);
  } else if (frame->format == AV_PIX_FMT_NV12) {
    for (int i = 0; i < h; i++)
      std::memcpy(dy + static_cast<size_t>(i) * w,
                  frame->data[0] + static_cast<size_t>(i) * frame->linesize[0],
                  w);
    for (int i = 0; i < h / 2; i++)
      std::memcpy(duv + static_cast<size_t>(i) * w,
                  frame->data[1] + static_cast<size_t>(i) * frame->linesize[1],
                  w);
  } else {
    // Non-4:2:0 sources (e.g. YUV444): swscale to NV12 so the whole VPP
    // stays in the NV12 domain, like the reference's pipeline contract.
    *sws = sws_getCachedContext(*sws, w, h,
                                static_cast<AVPixelFormat>(frame->format), w,
                                h, AV_PIX_FMT_NV12, SWS_POINT, nullptr,
                                nullptr, nullptr);
    if (!*sws) return TS_ERROR;
    uint8_t* dst_data[2] = {dy, duv};
    int dst_linesize[2] = {w, w};
    sws_scale(*sws, frame->data, frame->linesize, 0, h, dst_data,
              dst_linesize);
  }
  return TS_OK;
}

}  // namespace ts

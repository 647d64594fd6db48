// Host-side NV12-domain resize (nearest / bilinear), bit-exact to the
// device path (tensor_stream_tpu/ops/resize.py, itself validated against
// the reference CUDA kernels' CRC/raster oracles; reference:
// src/Resize.cu:242-312).
//
// Why it exists: on hosts where the link to the accelerator is the
// bottleneck, resizing before the transfer shrinks a 1080p NV12 frame
// (3.1 MB) to the target size (e.g. 75 KB at 224x224) — the VPP's
// convert/normalize stages still run on the TPU. Exposed through
// ts_pipeline_get_batch_resized (capi.cpp).
#pragma once

#include <cstdint>

namespace ts {

enum HostResizeAlgo {
  HOST_RESIZE_NEAREST = 0,
  HOST_RESIZE_BILINEAR = 1,
  HOST_RESIZE_BICUBIC = 2,
  HOST_RESIZE_AREA = 3,
};

// Resizes a tightly-packed NV12 frame (y: sh x sw, uv: sh/2 x sw
// interleaved) into out_y (dh x dw) / out_uv (dh/2 x dw). Axis tables are
// cached per (sw, sh, dw, dh).
void ResizeNV12Host(const uint8_t* y, const uint8_t* uv, int sw, int sh,
                    uint8_t* out_y, uint8_t* out_uv, int dw, int dh,
                    HostResizeAlgo algo);

// Strided-source variant: the same math over planes whose rows live at
// y_stride / uv_stride byte pitch (e.g. resizing straight out of a
// decoder AVFrame or an interleave scratch) — bit-identical to the
// tight path.
void ResizeNV12HostStrided(const uint8_t* y, int y_stride, const uint8_t* uv,
                           int uv_stride, int sw, int sh, uint8_t* out_y,
                           uint8_t* out_uv, int dw, int dh,
                           HostResizeAlgo algo);

}  // namespace ts

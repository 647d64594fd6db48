// Host-side NV12 color conversion — the native twin of the device VPP
// conversion stage (tensor_stream_tpu/ops/color.py; reference CUDA
// kernels: src/ColorConversion.cu:6-278).
//
// Why it exists: the reference's C++-only consumer (WrapperC.h getFrame<T>,
// c_examples/src/Sample.cpp) received fully-converted RGB24 buffers without
// touching Python. This module gives the C++ surface the same reach: a
// pure-C++ crop -> NV12-domain resize -> color conversion -> normalization
// chain producing the exact bytes/floats the device path produces (both are
// validated against the same reference CRC/raster oracles).
//
// The math reproduces the reference kernels operation-for-operation: exact
// BT.601 full-swing constants, the +0.5 rounding bias and truncating int
// casts, the 422/444 chroma filters with their integer-division, mod-256
// wrap and zero-tail-tap quirks, and true IEEE /255 normalization
// (correctly rounded, like the device LUT). Compiled -ffp-contract=off so
// gcc cannot re-contract the spelled-out rounding order.
#pragma once

#include <cstddef>
#include <cstdint>

#include "vpp_host.h"

namespace ts {

// FourCC / plane-layout codes, numerically identical to the Python enums
// (tensor_stream_tpu/enums.py; reference: tensor_stream/tensor_stream.py).
enum ConvFourCC {
  FCC_Y800 = 0,
  FCC_RGB24 = 1,
  FCC_BGR24 = 2,
  FCC_NV12 = 3,
  FCC_UYVY = 4,
  FCC_YUV444 = 5,
  FCC_HSV = 6,
};

enum ConvPlanes {
  PLANES_PLANAR = 0,
  PLANES_MERGED = 1,
};

// Number of output elements (u8 bytes or f32 floats) for a w x h frame:
// w*h*channels, channels per the reference's channelsByFourCC
// (src/VideoProcessor.cpp:4-26).
size_t ConvertedElements(int w, int h, int fourcc);

// True when the output elements are float32 (normalization requested, or
// HSV which is always normalized float — VideoProcessor.h:39-52).
bool ConvertedIsFloat(int fourcc, bool normalization);

// Converts one tightly-packed NV12 frame (y: h x w, uv: h/2 x w
// interleaved) into `out`, which must hold ConvertedElements(w, h, fourcc)
// elements of u8 or f32 per ConvertedIsFloat. Layouts follow the tensor
// contract (WrapperPython.cpp:318-341): RGB/BGR planar [3,H,W] or merged
// [H,W,3]; YUV444 planar bytes; UYVY row-interleaved U0 Y0 V0 Y1; NV12
// Y then UV; HSV merged [H,W,3] f32. `standard` selects the YUV->RGB
// matrix (0 = the reference's BT.601 constants, 1 = BT.709; only
// RGB/BGR/HSV apply it). Returns 0, or -1 on an unknown FourCC
// (nothing written).
int ConvertNV12Host(const uint8_t* y, const uint8_t* uv, int w, int h,
                    int fourcc, int planes, bool normalization, int standard,
                    void* out);

// Full host VPP chain: crop -> resize -> convert, with the reference's
// defaulting rules (VideoProcessor.cpp:106-135): a crop box is applied
// when 0 < width/height < source; the resize target defaults to the crop
// (or native) size; HSV forces normalization. `out` must hold
// ConvertedElements(out_w, out_h, fourcc) elements where (out_w, out_h)
// follows the same defaulting (VppOutputSize). Returns 0, or -1 on
// invalid parameters: an odd resize target (the NV12 UV interleave
// cannot express odd widths, see ops/vpp.py VPPConfig), a crop box
// outside the frame, or an unknown FourCC — nothing is written then.
struct HostVppParams {
  int crop_left = 0, crop_top = 0, crop_right = 0, crop_bottom = 0;
  int dst_width = 0, dst_height = 0;  // 0 = native / crop size
  HostResizeAlgo resize_algo = HOST_RESIZE_NEAREST;
  int fourcc = FCC_RGB24;
  int planes = PLANES_MERGED;
  bool normalization = false;
  int standard = 0;  // 0 = BT601 (reference-exact), 1 = BT709
};

void VppOutputSize(int src_w, int src_h, const HostVppParams& p, int* out_w,
                   int* out_h);

int VppConvertHost(const uint8_t* y, const uint8_t* uv, int src_w, int src_h,
                   const HostVppParams& p, void* out);

}  // namespace ts

"""Native host VPP (csrc/vpp_convert.cpp) against the reference oracles.

The C++ consumer twin (csrc/tensor_stream.h getFrame<T>) converts on the
host; this suite pins that path to the SAME committed CRC32 / golden-raster
oracles the device path passes (reference: tests/src/VPPTests.cpp:100-512,
PythonTests.cpp:141-244), so both implementations are interchangeable
bit-for-bit. The native chain (host resize + host convert) is expected
bit-exact on every case, as is the jitted device path since round 3
(integer-exact blends, ops/exactf32.py; docs/PARITY.md).
"""
import ctypes
import os

import numpy as np
import pytest

from conftest import RESOURCES
from tensor_stream_tpu.enums import FourCC, Planes, ResizeType
from tensor_stream_tpu.utils.crc import av_crc32

from test_resize_crc import CASES as RESIZE_CASES
from test_vpp import CRC_CASES, CROP_CASES, RASTER_CASES

HOST_ALGO = {ResizeType.NEAREST: 0, ResizeType.BILINEAR: 1,
             ResizeType.BICUBIC: 2, ResizeType.AREA: 3}


def native_vpp(native, y, uv, w, h, fourcc, planes=Planes.MERGED,
               normalization=False, crop=(0, 0, 0, 0), width=0, height=0,
               resize_type=ResizeType.NEAREST, standard=0):
    """Runs the full native chain via the C ABI and returns a NumPy array."""
    ow, oh = ctypes.c_int(), ctypes.c_int()
    native.ts_vpp_output_size(w, h, *crop, width, height,
                              ctypes.byref(ow), ctypes.byref(oh))
    n = native.ts_vpp_output_elements(ow.value, oh.value, fourcc.value)
    is_float = native.ts_vpp_is_float(fourcc.value, int(normalization))
    out = np.empty(int(n), np.float32 if is_float else np.uint8)
    rc = native.ts_vpp_convert_host(
        y.ctypes.data, uv.ctypes.data, w, h, *crop, width, height,
        HOST_ALGO[resize_type], fourcc.value, planes.value,
        int(normalization), standard, out.ctypes.data)
    assert rc == 0
    return out


@pytest.mark.parametrize("name,kwargs,expected",
                         CRC_CASES, ids=[c[0] for c in CRC_CASES])
def test_native_fourcc_crc(native, bbb_frame0, name, kwargs, expected):
    """Native-size conversions: same CRCs as the device path
    (reference: VPPTests.cpp:134-222)."""
    y, uv, w, h = bbb_frame0
    out = native_vpp(native, y, uv, w, h, **kwargs)
    assert av_crc32(out) == expected


@pytest.mark.parametrize("name,kwargs,expected",
                         CROP_CASES, ids=[c[0] for c in CROP_CASES])
def test_native_crop_crc(native, bbb_frame0, name, kwargs, expected):
    """Crop (+ nearest resize) chains (reference: VPPTests.cpp:225-298)."""
    y, uv, w, h = bbb_frame0
    out = native_vpp(native, y, uv, w, h, FourCC.NV12, planes=Planes.PLANAR,
                     **kwargs)
    assert av_crc32(out) == expected


@pytest.mark.parametrize("name,kwargs,accepted,_dev",
                         RESIZE_CASES, ids=[c[0] for c in RESIZE_CASES])
def test_native_resize_convert_crc(native, bbb_frame0, name, kwargs,
                                   accepted, _dev):
    """Resize + convert, all four algorithms: the native chain must be
    bit-exact on EVERY committed oracle — including the cases where the
    device blend needed the integer-exact emulation (reference:
    PythonTests.cpp:192-244, VPPTests.cpp:186-229)."""
    y, uv, w, h = bbb_frame0
    out = native_vpp(native, y, uv, w, h, **kwargs)
    assert av_crc32(out) in accepted


@pytest.mark.parametrize("fourcc,fname",
                         RASTER_CASES, ids=[c[1].split("_")[0] for c in RASTER_CASES])
def test_native_normalized_float_golden_raster(native, bbb_frame0, fourcc,
                                               fname):
    """Normalized float32 outputs vs the committed CUDA golden rasters
    (reference: VPPTests.cpp:301-512). Byte-exact except HSV, whose H
    channel divides by a runtime value (BASELINE budget 1e-6)."""
    path = os.path.join(RESOURCES, "test_references", fname)
    if not os.path.exists(path):
        pytest.skip("golden raster not available")
    y, uv, w, h = bbb_frame0
    out = native_vpp(native, y, uv, w, h, fourcc, planes=Planes.MERGED,
                     normalization=True, width=320, height=240)
    golden = np.fromfile(path, np.float32)
    assert out.size == golden.size
    if fourcc == FourCC.HSV:
        assert np.abs(out - golden).max() <= 1e-6
    else:
        assert np.array_equal(out.view(np.uint32), golden.view(np.uint32)), \
            f"max diff {np.abs(out - golden).max()}"


def test_pipeline_get_converted_end_to_end(native):
    """ts_pipeline_get_converted = GetFrame + host VPP in one call (the C
    ABI face of the C++ twin's getFrame<T>): frame 1 of bbb converted to
    merged RGB24 must hit the reference CRC (VPPTests.cpp:138)."""
    bbb = os.path.join(RESOURCES, "bbb_1080x608_420_10.h264")
    if not os.path.exists(bbb):
        pytest.skip("bbb fixture not available")
    p = native.ts_pipeline_create()
    assert native.ts_pipeline_init(p, bbb.encode(), 5, 10, 3, 0, 0) == 0
    w, h = native.ts_pipeline_width(p), native.ts_pipeline_height(p)
    for _ in range(10):
        native.ts_pipeline_step(p)
        if native.ts_pipeline_frame_index(p) > 0:
            break
    out = np.empty(h * w * 3, np.uint8)
    idx = native.ts_pipeline_get_converted(
        p, b"cpp", 0, 0, 0, 0, 0, 0, 0, 0,
        FourCC.RGB24.value, Planes.MERGED.value, 0, 0, out.ctypes.data)
    native.ts_pipeline_stop(p)
    native.ts_pipeline_destroy(p)
    assert idx == 1
    assert av_crc32(out) == 2225932432


def test_native_matches_device_uint8_matrix(native, bbb_frame0):
    """Cross-check: native and device outputs identical on configs not
    covered by a committed oracle. Resize is pinned to NEAREST so this
    isolates the conversion stage — blended resizes are compared through
    their own CRC suite (bit-exact on every backend since round 3)."""
    from tensor_stream_tpu.ops.vpp import VPPConfig, vpp_numpy
    y, uv, w, h = bbb_frame0
    cases = [
        dict(fourcc=FourCC.UYVY, width=480, height=360),
        dict(fourcc=FourCC.YUV444, width=480, height=360),
        dict(fourcc=FourCC.BGR24, planes=Planes.PLANAR, width=540,
             height=304),
        dict(fourcc=FourCC.HSV, width=480, height=360),
    ]
    for kw in cases:
        nat = native_vpp(native, y, uv, w, h, **kw)
        dev = np.asarray(vpp_numpy(
            VPPConfig(src_width=w, src_height=h, **kw), y, uv)).reshape(-1)
        if kw["fourcc"] == FourCC.HSV:
            assert np.abs(nat - dev).max() <= 1e-6, str(kw)
        else:
            np.testing.assert_array_equal(nat, dev, err_msg=str(kw))


def test_native_invalid_params_rejected(native, bbb_frame0):
    """Out-of-frame crop boxes, odd resize targets and unknown FourCCs
    return -1 and write nothing (the device path validates these in
    VPPConfig; the native path must not overread instead)."""
    y, uv, w, h = bbb_frame0
    out = np.empty(16, np.uint8)
    # Crop box extending past the bottom of the frame.
    rc = native.ts_vpp_convert_host(
        y.ctypes.data, uv.ctypes.data, w, h,
        0, h // 2, 300, h + h // 2 - 2, 0, 0, 0,
        FourCC.NV12.value, 0, 0, 0, out.ctypes.data)
    assert rc == -1
    # Odd resize target (NV12 UV interleave cannot express it).
    rc = native.ts_vpp_convert_host(
        y.ctypes.data, uv.ctypes.data, w, h,
        0, 0, 0, 0, 223, 224, 0,
        FourCC.RGB24.value, 0, 0, 0, out.ctypes.data)
    assert rc == -1
    # Unknown FourCC.
    rc = native.ts_vpp_convert_host(
        y.ctypes.data, uv.ctypes.data, w, h,
        0, 0, 0, 0, 0, 0, 0, 99, 0, 0, 0, out.ctypes.data)
    assert rc == -1
    # Odd-aligned crop boxes: odd left swaps the NV12 U/V interleave,
    # odd top misaligns chroma by a row, odd extents break the even-pair
    # assumptions of the UYVY/YUV444 converters — all rejected.
    for box in ((1, 0, 301, 200),    # odd left
                (0, 1, 300, 201),    # odd top
                (0, 0, 301, 200),    # odd width
                (0, 0, 300, 201)):   # odd height
        rc = native.ts_vpp_convert_host(
            y.ctypes.data, uv.ctypes.data, w, h,
            *box, 0, 0, 0, FourCC.NV12.value, 0, 0, 0, out.ctypes.data)
        assert rc == -1, box


def test_simd_rgb_convert_bit_identical_to_scalar(native):
    """The AVX2 NV12->RGB rows (csrc/vpp_host_avx2.cpp Nv12RgbRows) must
    equal the scalar Nv12Rgb loop bit-for-bit across fourcc x planes x
    normalization x all four color standards, including odd widths that
    force the scalar tail. Scalar results come from a TS_HOST_SIMD=0
    subprocess (the toggle is latched at first use)."""
    import hashlib
    import os
    import subprocess
    import sys

    if not native.ts_host_simd_available():
        pytest.skip("AVX2+FMA not available on this CPU")

    code = r'''
import sys; sys.path.insert(0, %r)
import hashlib
import numpy as np
from tensor_stream_tpu import _native
from tensor_stream_tpu.enums import FourCC, Planes
lib = _native.load()
rng = np.random.default_rng(3)
h = hashlib.sha256()
for (w, hh) in [(1920, 1080), (320, 240), (102, 62), (6, 4)]:
    y = np.ascontiguousarray(rng.integers(0, 255, (hh, w), np.uint8))
    uv = np.ascontiguousarray(rng.integers(0, 255, (hh // 2, w), np.uint8))
    for fourcc in (FourCC.RGB24, FourCC.BGR24):
        for planes in (Planes.PLANAR, Planes.MERGED):
            for norm in (0, 1):
                for std in (0, 1, 2, 3):
                    out = np.zeros(w * hh * 3,
                                   np.float32 if norm else np.uint8)
                    sts = lib.ts_vpp_convert_host(
                        y.ctypes.data, uv.ctypes.data, w, hh, 0, 0, 0, 0,
                        0, 0, 0, fourcc.value, planes.value, norm, std,
                        out.ctypes.data)
                    assert sts == 0, sts
                    h.update(out.tobytes())
    # HSV (float merged only): the vectorized hue-branch selection must
    # match the scalar branch-by-branch math bit-for-bit, including
    # flat-gray (delta == 0) and black (max == 0) lanes.
    y[:2] = 0
    uv[:1] = 128
    for std in (0, 1, 2, 3):
        out = np.zeros(w * hh * 3, np.float32)
        sts = lib.ts_vpp_convert_host(
            y.ctypes.data, uv.ctypes.data, w, hh, 0, 0, 0, 0, 0, 0, 0,
            FourCC.HSV.value, Planes.MERGED.value, 1, std, out.ctypes.data)
        assert sts == 0, sts
        h.update(out.tobytes())
print(h.hexdigest())
'''
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def digest(simd_on):
        env = dict(os.environ)
        env["TS_HOST_SIMD"] = "1" if simd_on else "0"
        r = subprocess.run([sys.executable, "-c", code % repo], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout.strip()

    assert digest(True) == digest(False)


def test_simd_uyvy_yuv444_bit_identical_to_scalar(native):
    """The restructured SIMD UYVY/YUV444 conversions (ChromaVerticalRow,
    DeinterleavePairs, Yuv444Stream*, BytesToNorm255 — vpp_host_avx2.cpp)
    must equal the scalar flat-tap implementation bit-for-bit across
    sizes (incl. widths forcing scalar tails and tiny frames where the
    head/tail quirk pixels dominate), both output types, both
    normalizations."""
    import hashlib
    import os
    import subprocess
    import sys

    if not native.ts_host_simd_available():
        pytest.skip("AVX2+FMA not available on this CPU")

    code = r'''
import sys; sys.path.insert(0, %r)
import hashlib
import numpy as np
from tensor_stream_tpu import _native
from tensor_stream_tpu.enums import FourCC, Planes
lib = _native.load()
rng = np.random.default_rng(7)
h = hashlib.sha256()
for (w, hh) in [(1920, 1080), (720, 480), (322, 242), (34, 18), (6, 4)]:
    y = np.ascontiguousarray(rng.integers(0, 256, (hh, w), np.uint8))
    uv = np.ascontiguousarray(rng.integers(0, 256, (hh // 2, w), np.uint8))
    for fourcc in (FourCC.UYVY, FourCC.YUV444):
        for norm in (0, 1):
            n = lib.ts_vpp_output_elements(w, hh, fourcc.value)
            isf = lib.ts_vpp_is_float(fourcc.value, norm)
            out = np.zeros(int(n), np.float32 if isf else np.uint8)
            sts = lib.ts_vpp_convert_host(
                y.ctypes.data, uv.ctypes.data, w, hh, 0, 0, 0, 0,
                0, 0, 0, fourcc.value, Planes.PLANAR.value, norm, 0,
                out.ctypes.data)
            assert sts == 0, sts
            h.update(out.tobytes())
print(h.hexdigest())
'''
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def digest(simd_on):
        env = dict(os.environ)
        env["TS_HOST_SIMD"] = "1" if simd_on else "0"
        r = subprocess.run([sys.executable, "-c", code % repo], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout.strip()

    assert digest(True) == digest(False)

"""Decoder ring-buffer contract tests, ported from the reference gtest
suite (reference: tests/src/DecoderTests.cpp). Software decode replaces
NVDEC; H.264 decoding is bit-exact, so the committed CRC oracles hold."""
import numpy as np
import pytest

from conftest import BBB, resource
from tensor_stream_tpu._native import TS_EOF, TS_FINISHED, TS_REPEAT
from tensor_stream_tpu.utils.crc import av_crc32

FRAME0_Y_CRC = 3265466497
FRAME0_UV_CRC = 2183362287


def make_pipeline(native, buffer_size):
    p = native.ts_pipeline_create()
    assert native.ts_pipeline_init(p, resource("bbb_1080x608_420_10.h264").encode(),
                                   5, buffer_size, 3, 0, 0) == 0
    w, h = native.ts_pipeline_width(p), native.ts_pipeline_height(p)
    return p, w, h


def buffers(w, h):
    return np.zeros((h, w), np.uint8), np.zeros((h // 2, w), np.uint8)


def step_frame(native, p):
    """Steps the producer until exactly one more frame lands in the ring."""
    before = native.ts_pipeline_frame_index(p)
    for _ in range(50):
        sts = native.ts_pipeline_step(p)
        if native.ts_pipeline_frame_index(p) > before:
            return sts
        if sts == TS_EOF:
            return sts
    raise AssertionError("no frame produced")


def test_frame0_crc(native, bbb_frame0):
    """Decoded frame 0 must match the reference decoder bit-exactly
    (reference: DecoderTests.cpp:61-65)."""
    y, uv, w, h = bbb_frame0
    assert av_crc32(y) == FRAME0_Y_CRC
    assert av_crc32(uv) == FRAME0_UV_CRC


def test_index_out_of_buffer(native):
    """index=-1 with one frame decoded -> REPEAT; after the second decode
    the aligned slot is 0 -> frame 0 (reference: DecoderTests.cpp:42-66)."""
    p, w, h = make_pipeline(native, buffer_size=2)
    y, uv = buffers(w, h)
    step_frame(native, p)
    assert native.ts_pipeline_try_get(p, b"visualize", -1, y.ctypes.data,
                                      uv.ctypes.data) == TS_REPEAT
    step_frame(native, p)
    sts = native.ts_pipeline_try_get(p, b"visualize", -1, y.ctypes.data,
                                     uv.ctypes.data)
    assert sts == 2  # absolute frame counter
    assert av_crc32(y) == FRAME0_Y_CRC
    assert av_crc32(uv) == FRAME0_UV_CRC
    native.ts_pipeline_stop(p)
    native.ts_pipeline_destroy(p)


def test_positive_index_clamped(native):
    """index>0 is clamped to 0 with a warning
    (reference: DecoderTests.cpp:70-96)."""
    p, w, h = make_pipeline(native, buffer_size=1)
    y, uv = buffers(w, h)
    step_frame(native, p)
    sts = native.ts_pipeline_try_get(p, b"visualize", 1, y.ctypes.data,
                                     uv.ctypes.data)
    assert sts == 1
    assert av_crc32(y) == FRAME0_Y_CRC
    assert av_crc32(uv) == FRAME0_UV_CRC
    native.ts_pipeline_stop(p)
    native.ts_pipeline_destroy(p)


def test_two_consumers_same_frame(native):
    """Two consumers must observe bit-identical frames
    (reference: DecoderTests.cpp:225-279)."""
    p, w, h = make_pipeline(native, buffer_size=4)
    ya, uva = buffers(w, h)
    yb, uvb = buffers(w, h)
    step_frame(native, p)
    assert native.ts_pipeline_try_get(p, b"visualize", 0, ya.ctypes.data,
                                      uva.ctypes.data) == 1
    assert native.ts_pipeline_try_get(p, b"processing", 0, yb.ctypes.data,
                                      uvb.ctypes.data) == 1
    assert av_crc32(ya) == av_crc32(yb)
    assert av_crc32(uva) == av_crc32(uvb)
    native.ts_pipeline_stop(p)
    native.ts_pipeline_destroy(p)


def test_large_buffer_whole_stream(native):
    """Unlike NVDEC (ring bounded by DPB surfaces,
    DecoderTests.cpp:183-223), host ring slots are plain memory: a buffer
    deeper than the stream works and retains every frame."""
    p, w, h = make_pipeline(native, buffer_size=12)
    y, uv = buffers(w, h)
    for _ in range(100):
        if native.ts_pipeline_frame_index(p) == 10:
            break
        sts = native.ts_pipeline_step(p)
        assert sts != TS_EOF  # all 10 frames decode before EOF
    assert native.ts_pipeline_frame_index(p) == 10
    # look back to the oldest frame: latest(10) at slot 9, index -9 -> slot 0
    sts = native.ts_pipeline_try_get(p, b"c", -9, y.ctypes.data, uv.ctypes.data)
    assert sts == 10
    assert av_crc32(y) == FRAME0_Y_CRC
    native.ts_pipeline_stop(p)
    native.ts_pipeline_destroy(p)


def test_finished_after_eof(native):
    p, w, h = make_pipeline(native, buffer_size=4)
    y, uv = buffers(w, h)
    while native.ts_pipeline_step(p) != TS_EOF:
        pass
    # consumer that consumed the last flag gets TS_FINISHED afterwards
    assert native.ts_pipeline_try_get(p, b"c", 0, y.ctypes.data,
                                      uv.ctypes.data) == TS_FINISHED
    native.ts_pipeline_stop(p)
    native.ts_pipeline_destroy(p)


def test_yuv444_stream_decodes(native):
    """4:4:4 streams have no NVDEC path in the reference (SW fallback,
    DecoderTests.cpp:120-148); here everything is SW and 4:4:4 is
    converted to NV12 for the VPP."""
    p = native.ts_pipeline_create()
    assert native.ts_pipeline_init(
        p, resource("parser_444/bbb_1080x608_10.h264").encode(), 5, 4, 3, 0, 0) == 0
    w, h = native.ts_pipeline_width(p), native.ts_pipeline_height(p)
    assert (w, h) == (1080, 608)
    y, uv = buffers(w, h)
    step_frame(native, p)
    assert native.ts_pipeline_try_get(p, b"c", 0, y.ctypes.data,
                                      uv.ctypes.data) == 1
    assert y.any() and uv.any()
    native.ts_pipeline_stop(p)
    native.ts_pipeline_destroy(p)


def test_midstream_resolution_change_renegotiates(native, tmp_path):
    """A mid-stream resolution switch (new SPS) must never write
    new-geometry bytes into a consumer's init-sized buffers (the
    reference's latent heap corruption, src/Decoder.cpp:149). Since
    round 2 the switch is adopted under a new generation: reads return
    TS_RENEGOTIATE until this consumer acknowledges, then proceed at the
    new size (full semantics: tests/test_renegotiate.py)."""
    import ctypes
    a = resource("bbb_1080x608_420_10.h264")
    b = resource("bbb_720x480_RGB24_250.h264")
    mixed = tmp_path / "switch.h264"
    with open(mixed, "wb") as f:
        f.write(open(a, "rb").read())
        f.write(open(b, "rb").read())
    p = native.ts_pipeline_create()
    assert native.ts_pipeline_init(p, str(mixed).encode(), 5, 4, 3, 0, 0) == 0
    w, h = native.ts_pipeline_width(p), native.ts_pipeline_height(p)
    assert (w, h) == (1080, 608)
    y, uv = buffers(w, h)
    # Drive the stream manually past the switch point.
    for _ in range(40):
        sts = native.ts_pipeline_step(p)
        assert sts not in (-2, -3), sts  # no EOF/error this early
    frames = native.ts_pipeline_frame_index(p)
    assert frames >= 12  # decoding continued across the switch
    # The probe follows the live geometry...
    assert (native.ts_pipeline_width(p),
            native.ts_pipeline_height(p)) == (720, 480)
    # ...but this consumer still holds 1080x608 buffers, so the read
    # renegotiates instead of copying.
    assert native.ts_pipeline_get(p, b"c", 0, y.ctypes.data,
                                  uv.ctypes.data) == -8  # TS_RENEGOTIATE
    cw = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    assert native.ts_pipeline_ack_renegotiate(p, b"c", ctypes.byref(cw),
                                              ctypes.byref(ch)) == 0
    assert (cw.value, ch.value) == (720, 480)
    y2, uv2 = buffers(cw.value, ch.value)
    assert native.ts_pipeline_get(p, b"c", 0, y2.ctypes.data,
                                  uv2.ctypes.data) == frames
    native.ts_pipeline_stop(p)
    native.ts_pipeline_destroy(p)

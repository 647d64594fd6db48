"""Mid-stream resolution renegotiation (adaptive sources).

The fixture concatenates two libx264 Annex-B segments (12 frames at
320x240, then 12 at 480x360 — tools/make_fixture.cpp), which decodes as
one H.264 stream with an SPS switch. The reference silently adopts the
new geometry while consumers keep init-sized buffers (src/Decoder.cpp:149
+ WrapperC.cpp getFrame — a heap corruption); here the decoder bumps a
generation, fixed-geometry reads return TS_RENEGOTIATE until the
consumer acknowledges (ts_pipeline_ack_renegotiate), and the per-slot
host-resized bulk path rides through switches without any handshake.
"""
import ctypes
import os

import numpy as np
import pytest

from tensor_stream_tpu import (FourCC, FrameLoader, FrameRate, Planes,
                               ResizeType, TensorStreamConverter, _native)

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "switch_320x240_480x360_24.h264")


def test_read_rides_resolution_switch():
    """read() renegotiates internally: the caller just observes the
    output shape change at the switch frame, with no frame lost."""
    r = TensorStreamConverter(FIXTURE, framerate_mode=FrameRate.BLOCKING,
                              buffer_size=8)
    r.initialize(repeat_number=3)
    assert r.frame_size == (320, 240)
    r.start()
    shapes, indices = [], []
    while True:
        try:
            t, i = r.read(pixel_format=FourCC.RGB24, return_index=True)
        except RuntimeError:
            break
        shapes.append(tuple(t.shape))
        indices.append(i)
    r.stop()
    # BLOCKING registers the consumer on its FIRST read (reference
    # semantics), so the producer may run a few frames ahead before the
    # lockstep engages; and the reordered tail that only surfaces in the
    # EOF drain is not consumer-blocked (the reference loses it outright
    # — cursor APIs are the no-drop path). In between, every frame
    # arrives exactly once and in order.
    assert indices[0] <= 4
    assert indices == list(range(indices[0], indices[-1] + 1))
    assert indices[-1] >= 20
    for shape, idx in zip(shapes, indices):
        assert shape == ((240, 320, 3) if idx <= 12 else (360, 480, 3)), idx
    # The switch itself was crossed cleanly.
    assert sum(i > 12 for i in indices) >= 8
    # The live probe now reports the new geometry.
    assert r.frame_size == (480, 360)


def test_bulk_batch_renegotiates_at_generation_boundary():
    """Uniform bulk reads stop at the switch, signal TS_RENEGOTIATE on
    the empty read, and resume at the boundary after acknowledgement
    with the dimensions AT the cursor."""
    lib = _native.load()
    p = lib.ts_pipeline_create()
    assert lib.ts_pipeline_init_ex(p, FIXTURE.encode(), 5, 32, 3, 0, 0, 0,
                                   0) == 0
    lib.ts_pipeline_register_cursor(p, b"c")
    lib.ts_pipeline_start(p)
    first = ctypes.c_int(0)
    y = ctypes.create_string_buffer(24 * 480 * 360)
    uv = ctypes.create_string_buffer(24 * 480 * 180)
    got = lib.ts_pipeline_get_batch(p, b"c", 24, y, uv, ctypes.byref(first))
    assert got == 12  # batch cut short at the generation boundary
    assert first.value == 1
    got = lib.ts_pipeline_get_batch(p, b"c", 24, y, uv, ctypes.byref(first))
    assert got == _native.TS_RENEGOTIATE
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    # Before the ack, the consumer's acknowledged geometry is still the
    # init one even though the pipeline probe already moved on.
    lib.ts_pipeline_consumer_dims(p, b"c", ctypes.byref(w), ctypes.byref(h))
    assert (w.value, h.value) == (320, 240)
    assert lib.ts_pipeline_ack_renegotiate(p, b"c", ctypes.byref(w),
                                           ctypes.byref(h)) == 0
    assert (w.value, h.value) == (480, 360)
    got = lib.ts_pipeline_get_batch(p, b"c", 24, y, uv, ctypes.byref(first))
    assert got == 12
    assert first.value == 13
    got = lib.ts_pipeline_get_batch(p, b"c", 24, y, uv, ctypes.byref(first))
    assert got == 0  # drained
    # The switch segment starts with a fresh SPS+IDR, so the H.264
    # stream-health analyzer must not flag it as frame loss.
    assert lib.ts_pipeline_analyze_errors(p) == 0
    lib.ts_pipeline_stop(p)
    lib.ts_pipeline_destroy(p)


def test_host_resized_batch_rides_switch_in_one_batch():
    """The host-resized bulk path resizes each ring slot from its own
    geometry to the fixed output, so one batch spans the switch."""
    import jax
    r = TensorStreamConverter(FIXTURE, framerate_mode=FrameRate.FAST,
                              buffer_size=32)
    r.initialize(repeat_number=3)
    r.start()
    t, idx = r.read_batch(24, name="c", host_resize=True, width=160,
                          height=128, resize_type=ResizeType.BILINEAR,
                          pixel_format=FourCC.RGB24,
                          planes_pos=Planes.PLANAR, return_index=True)
    out = np.asarray(jax.block_until_ready(t))
    r.stop()
    assert out.shape == (24, 3, 128, 160)
    assert idx == list(range(1, 25))
    # Both segments carry the same moving-square test pattern; every
    # frame must have real content (the square paints near-white pixels).
    assert (out.reshape(24, -1).max(axis=1) > 200).all()


def test_device_path_read_batch_renegotiates():
    """The device-path read_batch (full frames to HBM) adopts the new
    geometry between batches: shapes change at the boundary."""
    import jax
    r = TensorStreamConverter(FIXTURE, framerate_mode=FrameRate.FAST,
                              buffer_size=32)
    r.initialize(repeat_number=3)
    r.start()
    a, idx_a = r.read_batch(24, name="c", pixel_format=FourCC.RGB24,
                            return_index=True)
    b, idx_b = r.read_batch(24, name="c", pixel_format=FourCC.RGB24,
                            return_index=True)
    a = np.asarray(jax.block_until_ready(a))
    b = np.asarray(jax.block_until_ready(b))
    r.stop()
    assert a.shape == (12, 240, 320, 3)
    assert b.shape == (12, 360, 480, 3)
    assert idx_a == list(range(1, 13))
    assert idx_b == list(range(13, 25))


def test_frame_loader_full_frame_raises_helpful_error():
    """FrameLoader without host_resize cannot change batch geometry
    mid-iteration; it must fail with guidance, not mis-sized data."""
    loader = FrameLoader(FIXTURE, batch=8, prefetch=1,
                         pixel_format=FourCC.RGB24, buffer_size=32)
    batches = 0
    with pytest.raises(RuntimeError, match="host_resize"):
        for _ in range(10):
            next(loader)
            batches += 1
    # The error is latched: iterating again after catching it fails fast
    # with the same guidance instead of blocking on the drained queue.
    with pytest.raises(RuntimeError, match="host_resize"):
        next(loader)
    loader.close()
    assert batches >= 1  # the pre-switch frames were delivered first


def test_frame_loader_host_resize_rides_switch():
    import jax
    loader = FrameLoader(FIXTURE, batch=8, prefetch=1, host_resize=True,
                         width=160, height=128,
                         resize_type=ResizeType.BILINEAR,
                         pixel_format=FourCC.RGB24,
                         planes_pos=Planes.PLANAR, buffer_size=32)
    total = 0
    for t, idx in loader:
        assert tuple(t.shape)[1:] == (3, 128, 160)
        total += np.asarray(jax.block_until_ready(t)).shape[0]
    loader.close()
    assert total == 24


def test_hevc_resolution_switch_renegotiates():
    """Geometry renegotiation is codec-agnostic: an HEVC stream spliced
    to a new resolution (fresh VPS/SPS/PPS + IDR) takes the same
    generation/ack path as H.264, and the HEVC stream-health analyzer
    stays clean across the splice."""
    lib = _native.load()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "switch_hevc_320x240_480x360_20.h265")
    p = lib.ts_pipeline_create()
    assert lib.ts_pipeline_init_ex(p, path.encode(), 5, 32, 3, 0, 0, 0,
                                   0) == 0
    lib.ts_pipeline_register_cursor(p, b"c")
    lib.ts_pipeline_start(p)
    first = ctypes.c_int(0)
    y = ctypes.create_string_buffer(20 * 480 * 360)
    uv = ctypes.create_string_buffer(20 * 480 * 180)
    assert lib.ts_pipeline_get_batch(p, b"c", 20, y, uv,
                                     ctypes.byref(first)) == 10
    assert first.value == 1
    assert lib.ts_pipeline_get_batch(p, b"c", 20, y, uv,
                                     ctypes.byref(first)) == \
        _native.TS_RENEGOTIATE
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    lib.ts_pipeline_ack_renegotiate(p, b"c", ctypes.byref(w), ctypes.byref(h))
    assert (w.value, h.value) == (480, 360)
    assert lib.ts_pipeline_get_batch(p, b"c", 20, y, uv,
                                     ctypes.byref(first)) == 10
    assert first.value == 11
    assert lib.ts_pipeline_analyze_errors(p) == 0
    lib.ts_pipeline_stop(p)
    lib.ts_pipeline_destroy(p)


def test_series_reader_sees_renegotiate_signal():
    """A C-ABI series reader whose acknowledged geometry predates a
    switch gets TS_RENEGOTIATE (not a permanent empty series) when zero
    frames could be copied, and resumes after the ack handshake."""
    lib = _native.load()
    p = lib.ts_pipeline_create()
    # NATIVE pacing: the producer holds the fixture's frame cadence, so
    # the stream is still live (latest frame = post-switch generation)
    # when the late series reader arrives.
    assert lib.ts_pipeline_init_ex(p, FIXTURE.encode(), 5, 32, 0, 0, 0, 0,
                                   0) == 0
    lib.ts_pipeline_start(p)
    import time
    deadline = time.monotonic() + 30
    while (lib.ts_pipeline_frame_index(p) <= 12
           and time.monotonic() < deadline):
        time.sleep(0.02)
    assert lib.ts_pipeline_frame_index(p) > 12
    ys = np.empty((4, 360, 480), np.uint8)
    uvs = np.empty((4, 180, 480), np.uint8)
    got = lib.ts_pipeline_get_series(p, b"late", 0, 4, ys.ctypes.data,
                                     uvs.ctypes.data, None)
    assert got == _native.TS_RENEGOTIATE
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    assert lib.ts_pipeline_ack_renegotiate(p, b"late", ctypes.byref(w),
                                           ctypes.byref(h)) == 0
    assert (w.value, h.value) == (480, 360)
    got = lib.ts_pipeline_get_series(p, b"late", 0, 1, ys.ctypes.data,
                                     uvs.ctypes.data, None)
    assert got == 1
    lib.ts_pipeline_stop(p)
    lib.ts_pipeline_destroy(p)

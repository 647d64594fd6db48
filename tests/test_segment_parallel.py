"""GOP/segment-parallel decode (csrc/segment_reader.cpp).

The serial pipeline's decode throughput stops at libavcodec
frame-threading; the segmented reader keyframe-splits a seekable file
and decodes disjoint chunks on N independent demuxer+decoder instances,
stitching deposits into serial frame order through a bounded ordered
window. The contract proven here: output is BIT-IDENTICAL to the serial
cursor path (frames and order) for every worker count, codec, and
container — parallelism must be invisible (serial ring semantics:
csrc/decoder.cpp:293-333; reference ring: src/Decoder.cpp:97-131).
"""
import ctypes
import os

import numpy as np
import pytest

from conftest import RESOURCES
from tensor_stream_tpu import _native

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
GOP10 = os.path.join(FIXDIR, "bbb_720x480_RGB24_250.h264")  # 10 IDR GOPs
SWITCH = os.path.join(FIXDIR, "switch_320x240_480x360_24.h264")


def serial_frames(path, n, resized=None):
    """Reference bytes: the serial pipeline's no-drop bulk cursor."""
    lib = _native.load()
    p = lib.ts_pipeline_create()
    assert lib.ts_pipeline_init_ex(p, path.encode(), 5, 32, 3, 0, 1, 0,
                                   0) == 0
    lib.ts_pipeline_register_cursor(p, b"c")
    lib.ts_pipeline_start(p)
    if resized:
        w, h = resized[0], resized[1]
    else:
        w, h = lib.ts_pipeline_width(p), lib.ts_pipeline_height(p)
    ys = np.empty((n, h, w), np.uint8)
    uvs = np.empty((n, h // 2, w), np.uint8)
    first = ctypes.c_int(0)
    got = 0
    while got < n:
        if resized:
            g = lib.ts_pipeline_get_batch_resized(
                p, b"c", n - got, w, h, resized[2],
                ys.ctypes.data + got * h * w,
                uvs.ctypes.data + got * (h // 2) * w, ctypes.byref(first))
        else:
            g = lib.ts_pipeline_get_batch(
                p, b"c", n - got, ys.ctypes.data + got * h * w,
                uvs.ctypes.data + got * (h // 2) * w, ctypes.byref(first))
        if g <= 0:
            break
        got += g
    lib.ts_pipeline_stop(p)
    lib.ts_pipeline_destroy(p)
    return got, ys, uvs


def segmented_frames(path, n, workers, loop=False, resize=None, window=64,
                     chunk=48, start_frame=0, batch=None):
    lib = _native.load()
    dw, dh, algo = resize if resize else (0, 0, 1)
    s = lib.ts_segmented_create(path.encode(), workers, window, int(loop),
                                dw, dh, algo, 1, 0, chunk)
    assert s, f"ts_segmented_create failed for {path}"
    if start_frame:
        lib.ts_segmented_seek_frame(s, start_frame)
    assert lib.ts_segmented_start(s) == 0
    w = lib.ts_segmented_out_width(s)
    h = lib.ts_segmented_out_height(s)
    ys = np.empty((n, h, w), np.uint8)
    uvs = np.empty((n, h // 2, w), np.uint8)
    first = ctypes.c_int(0)
    got, stop_code, f0 = 0, 0, None
    while got < n:
        g = lib.ts_segmented_get_batch(
            s, min(n - got, batch or n),
            ys.ctypes.data + got * h * w,
            uvs.ctypes.data + got * (h // 2) * w, ctypes.byref(first))
        if g <= 0:
            stop_code = g
            break
        if f0 is None:
            f0 = first.value
        got += g
    nchunks = lib.ts_segmented_chunks(s)
    total = lib.ts_segmented_total_frames(s)
    lib.ts_segmented_stop(s)
    lib.ts_segmented_destroy(s)
    return {"got": got, "y": ys, "uv": uvs, "stop": stop_code, "first": f0,
            "chunks": nchunks, "total": total}


@pytest.mark.parametrize("workers", [1, 2, 3])
def test_bit_exact_vs_serial(workers):
    """Every worker count produces the serial decode's exact bytes in
    the exact order (10-GOP H.264 elementary stream, byte-pos seeks)."""
    n = 250
    gs, sy, suv = serial_frames(GOP10, n)
    assert gs == n
    r = segmented_frames(GOP10, n, workers)
    assert r["got"] == n and r["first"] == 1
    assert r["chunks"] >= 5  # really split, not a serial fallback
    assert np.array_equal(sy, r["y"]) and np.array_equal(suv, r["uv"])


def test_container_pts_seek_path():
    """mp4 input exercises the container seek branch (pts +
    AVSEEK_FLAG_BACKWARD, then skip to the chunk's own keyframe)."""
    path = os.path.join(RESOURCES, "bunny.mp4")
    n = 241
    gs, sy, suv = serial_frames(path, n)
    r = segmented_frames(path, n, 2, chunk=30)
    assert r["got"] == gs == n and r["chunks"] == 2
    assert np.array_equal(sy, r["y"]) and np.array_equal(suv, r["uv"])


@pytest.mark.parametrize("name,frames", [
    ("synthetic_640x360_120.h265", 120),
    ("synthetic_640x360_90_vp9.ivf", 90),
    ("synthetic_320x240_60_av1.ivf", 60),
])
def test_bit_exact_other_codecs(name, frames):
    """Codec-agnostic: HEVC (IDR and open-GOP CRA entries via BSF NAL
    classification), VP9 and AV1 (keyframes reset the reference set,
    trusted directly)."""
    path = os.path.join(FIXDIR, name)
    gs, sy, suv = serial_frames(path, frames)
    assert gs == frames
    r = segmented_frames(path, frames, 3, chunk=25)
    assert r["got"] == frames
    assert np.array_equal(sy, r["y"]) and np.array_equal(suv, r["uv"])


def test_bit_exact_hevc_open_gop_rasl():
    """Open-GOP HEVC (CRA entries with RASL leading pictures — display
    before their CRA, decode after it): chunks REALLY split at CRAs,
    the previous chunk feeds through the next CRA + leading run to
    produce the leading frames inside its display range, a cold-started
    chunk relies on libavcodec dropping the RASL, and the stitched
    output is bit-identical to the serial decode."""
    path = os.path.join(FIXDIR, "synthetic_640x360_96_opengop.h265")
    gs, sy, suv = serial_frames(path, 96)
    assert gs == 96
    r = segmented_frames(path, 96, 3, chunk=24)
    assert r["got"] == 96
    assert r["chunks"] == 4  # IDR@0 + CRA@24/48/72: real splits
    assert np.array_equal(sy, r["y"]) and np.array_equal(suv, r["uv"])


def test_loop_repeats_exactly():
    """loop=True replays the file: epoch 2's 250 frames are byte-equal
    to epoch 1's, with continuously increasing indices from 1."""
    r = segmented_frames(GOP10, 500, 2, loop=True)
    assert r["got"] == 500 and r["first"] == 1
    assert np.array_equal(r["y"][:250], r["y"][250:])
    assert np.array_equal(r["uv"][:250], r["uv"][250:])


def test_resized_deposits_match_serial_resized():
    """Per-slot host resize inside the workers (parallel resize) equals
    the serial bulk-resized drain bit-for-bit."""
    n = 250
    gs, sy, suv = serial_frames(GOP10, n, resized=(224, 224, 1))
    r = segmented_frames(GOP10, n, 3, resize=(224, 224, 1))
    assert r["got"] == gs == n
    assert np.array_equal(sy, r["y"]) and np.array_equal(suv, r["uv"])


def test_seek_frame_resume():
    """SeekFrame(101): chunks wholly below the cursor are never decoded,
    the partial chunk decode-and-discards, frames 101.. are exact."""
    gs, sy, suv = serial_frames(GOP10, 250)
    r = segmented_frames(GOP10, 150, 2, start_frame=101)
    assert r["got"] == 150 and r["first"] == 101
    assert np.array_equal(r["y"][:150], sy[100:250])
    assert np.array_equal(r["uv"][:150], suv[100:250])


@pytest.mark.parametrize("window", [64, 4, 2])
def test_switch_native_drains_then_renegotiates(window):
    """Fixed-geometry deposits on a resolution-switch file: every
    pre-switch frame drains (even with a tiny window — the error_frame_
    watermark keeps depositors below the break alive), then
    TS_RENEGOTIATE surfaces."""
    r = segmented_frames(SWITCH, 24, 2, window=window, chunk=12)
    assert r["got"] == 12
    assert r["stop"] == _native.TS_RENEGOTIATE


def test_switch_resized_rides_through():
    """Per-slot resize rides resolution switches without a handshake,
    like the serial bulk-resized path."""
    r = segmented_frames(SWITCH, 24, 2, resize=(160, 128, 1), chunk=12)
    assert r["got"] == 24


def test_non_seekable_source_rejected():
    lib = _native.load()
    s = lib.ts_segmented_create(b"tcp://127.0.0.1:1/nothing", 2, 64, 0,
                                0, 0, 1, 1, 0, 48)
    assert not s


def test_frame_loader_segment_parallel_matches_serial():
    """FrameLoader(segment_parallel=N) yields the serial loader's exact
    device tensors and indices, and resumes from checkpoints."""
    import jax

    from tensor_stream_tpu import FourCC, FrameLoader, Planes, ResizeType

    def run(**kw):
        loader = FrameLoader(GOP10, batch=32, prefetch=2, host_resize=True,
                             width=224, height=224,
                             resize_type=ResizeType.BILINEAR,
                             pixel_format=FourCC.RGB24,
                             planes_pos=Planes.PLANAR,
                             normalization=True, **kw)
        outs, idxs = [], []
        for t, i in loader:
            outs.append(np.asarray(jax.block_until_ready(t)))
            idxs.extend(i)
        loader.close()
        return np.concatenate(outs), idxs

    a, ia = run()
    b, ib = run(segment_parallel=3)
    assert ia == ib and len(ia) == 250
    assert np.array_equal(a, b)
    c, ic = run(segment_parallel=2, start_frame=101)
    assert ic[0] == 101 and len(ic) == 150
    assert np.array_equal(c, a[100:])


def test_frame_loader_segment_parallel_live_source_raises():
    from tensor_stream_tpu import FrameLoader
    with pytest.raises(RuntimeError, match="seekable"):
        FrameLoader("tcp://127.0.0.1:1/nothing", segment_parallel=2)


def test_frame_loader_segment_parallel_augment_matches_serial():
    """augment= composes with segment_parallel: keys derive from the
    absolute frame index and stitching is bit-exact, so the parallel
    loader's augmented bytes equal the serial loader's."""
    import jax

    from tensor_stream_tpu import (AugmentConfig, FourCC, FrameLoader,
                                   Planes, ResizeType)

    aug = AugmentConfig(width=64, height=64, scale=(0.4, 1.0), hflip=0.5,
                        brightness=0.3, contrast=0.3)

    def first_batches(**kw):
        loader = FrameLoader(GOP10, batch=16, prefetch=2, host_resize=True,
                             width=96, height=96,
                             resize_type=ResizeType.BILINEAR,
                             pixel_format=FourCC.RGB24,
                             planes_pos=Planes.PLANAR,
                             normalization=True, augment=aug, **kw)
        outs, idxs = [], []
        for t, i in loader:
            outs.append(np.asarray(jax.block_until_ready(t)))
            idxs.extend(i)
            if len(idxs) >= 48:
                break
        loader.close()
        return np.concatenate(outs), idxs

    a, ia = first_batches()
    b, ib = first_batches(segment_parallel=3)
    assert ia == ib
    assert np.array_equal(a, b)

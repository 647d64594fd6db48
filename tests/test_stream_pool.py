"""StreamPool (shared worker pool, many streams) vs standalone pipelines.

docs/ROADMAP.md item 4: N streams driven by M pool workers instead of a
producer thread per stream. Per-stream ordering and bytes must be
IDENTICAL to a standalone pipeline — the pool only changes who runs the
decode loop.
"""
import ctypes

import numpy as np
import pytest

from conftest import resource

from tensor_stream_tpu import _native
from tensor_stream_tpu.utils.crc import av_crc32


def drain_stream(lib, handle, n, w, h):
    """Bulk-reads n frames; returns (indices, y bytes)."""
    ys = np.empty((n, h, w), np.uint8)
    uvs = np.empty((n, h // 2, w), np.uint8)
    got_total, idxs = 0, []
    first = ctypes.c_int(0)
    while got_total < n:
        want = n - got_total
        got = lib.ts_pipeline_get_batch(
            handle, b"pool", want,
            ys.ctypes.data + got_total * h * w,
            uvs.ctypes.data + got_total * (h // 2) * w, ctypes.byref(first))
        if got <= 0:
            break
        idxs.extend(range(first.value, first.value + got))
        got_total += got
    return idxs, ys[:got_total], uvs[:got_total]


def single_pipeline_frames(lib, path, n):
    p = lib.ts_pipeline_create()
    assert lib.ts_pipeline_init_ex(p, path.encode(), 5, 32, 3, 0, 1, 0, 0) == 0
    w, h = lib.ts_pipeline_width(p), lib.ts_pipeline_height(p)
    lib.ts_pipeline_register_cursor(p, b"pool")
    lib.ts_pipeline_start(p)
    out = drain_stream(lib, p, n, w, h)
    lib.ts_pipeline_stop(p)
    lib.ts_pipeline_destroy(p)
    return out, (w, h)


@pytest.fixture(scope="module")
def lib():
    return _native.load()


def test_pool_streams_match_standalone_pipelines(lib):
    """Two pooled streams deliver the same indices and bytes as two
    standalone pipelines, with a single shared worker."""
    paths = [resource("bbb_720x480_RGB24_250.h264"),
             resource("billiard_1920x1080_420_100.h264")]
    n = 12
    pool = lib.ts_pool_create(1)  # ONE worker drives both streams
    handles = []
    for path in paths:
        idx = lib.ts_pool_add_stream(pool, path.encode(), 32, 0, 0)
        assert idx >= 0
        h = lib.ts_pool_stream(pool, idx)
        lib.ts_pipeline_register_cursor(h, b"pool")
        handles.append(h)
    assert lib.ts_pool_start(pool) == 0
    got = []
    for h in handles:
        w, hh = lib.ts_pipeline_width(h), lib.ts_pipeline_height(h)
        got.append(drain_stream(lib, h, n, w, hh))
    lib.ts_pool_stop(pool)
    lib.ts_pool_destroy(pool)

    for path, (idxs, ys, uvs) in zip(paths, got):
        (ref_idxs, ref_ys, ref_uvs), _ = single_pipeline_frames(lib, path, n)
        assert idxs == list(range(1, n + 1))
        assert idxs == ref_idxs
        np.testing.assert_array_equal(ys, ref_ys)
        np.testing.assert_array_equal(uvs, ref_uvs)


def test_pool_eof_and_clean_shutdown(lib):
    """Non-loop pooled streams end cleanly: consumers get the full file,
    further reads report finished, Stop() does not hang."""
    path = resource("bbb_1080x608_420_10.h264")
    pool = lib.ts_pool_create(2)
    idx = lib.ts_pool_add_stream(pool, path.encode(), 16, 0, 0)
    h = lib.ts_pool_stream(pool, idx)
    lib.ts_pipeline_register_cursor(h, b"pool")
    assert lib.ts_pool_start(pool) == 0
    w, hh = lib.ts_pipeline_width(h), lib.ts_pipeline_height(h)
    idxs, ys, _ = drain_stream(lib, h, 64, w, hh)
    assert idxs == list(range(1, 11))  # the whole 10-frame file, in order
    lib.ts_pool_stop(pool)
    lib.ts_pool_destroy(pool)


def test_pooled_stream_loader_stacks_streams():
    """PooledStreamLoader: one device dispatch over all streams' frames,
    with per-stream indices and bytes matching FrameLoader runs."""
    import jax

    from tensor_stream_tpu import (FourCC, FrameLoader, Planes,
                                   PooledStreamLoader, ResizeType)

    paths = [resource("bbb_720x480_RGB24_250.h264"),
             resource("billiard_1920x1080_420_100.h264")]
    kw = dict(pixel_format=FourCC.Y800, planes_pos=Planes.PLANAR,
              width=96, height=64, resize_type=ResizeType.BILINEAR)
    loader = PooledStreamLoader(paths, per_stream=4, workers=2,
                                host_resize=True, **kw)
    batch1, idx1 = next(loader)
    batch2, idx2 = next(loader)
    got = [np.asarray(batch1), np.asarray(batch2)]
    loader.close()
    assert got[0].shape == (8, 1, 64, 96)
    assert idx1 == {0: [1, 2, 3, 4], 1: [1, 2, 3, 4]}
    assert idx2 == {0: [5, 6, 7, 8], 1: [5, 6, 7, 8]}

    for k, path in enumerate(paths):
        single = FrameLoader(path, batch=8, host_resize=True, **kw)
        tensors, idx = next(single)
        ref = np.asarray(tensors)
        single.close()
        assert idx == list(range(1, 9))
        np.testing.assert_array_equal(
            np.concatenate([got[0][k * 4:(k + 1) * 4],
                            got[1][k * 4:(k + 1) * 4]]), ref)

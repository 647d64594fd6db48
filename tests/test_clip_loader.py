"""Random-access clip sampling (csrc/clip_reader.cpp + data.ClipLoader).

The contract proven here: a clip of frames [s, s+stride, ...] decoded by
seeking to the nearest IDR entry point is BIT-IDENTICAL to the serial
decode of those frame indices (entry-point semantics: IsIdrAccessUnit in
csrc/segment_reader.cpp; serial ring contract: csrc/decoder.cpp:293-333,
reference ring: src/Decoder.cpp:97-131). The reference itself has no
random access at all — its Parser::Reset is unimplemented — so every
assertion here is against OUR serial path, which is itself CRC-pinned to
the reference decoder elsewhere (tests/test_decoder.py).
"""
import ctypes
import os

import numpy as np
import pytest

from conftest import RESOURCES
from tensor_stream_tpu import _native
from test_segment_parallel import serial_frames

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
GOP10 = os.path.join(FIXDIR, "bbb_720x480_RGB24_250.h264")  # IDR every 25
SWITCH = os.path.join(FIXDIR, "switch_320x240_480x360_24.h264")


def clip_batch(path, starts, clip_len, stride=1, workers=2, resize=None,
               handle_out=None):
    lib = _native.load()
    dw, dh, algo = resize if resize else (0, 0, 1)
    p = lib.ts_clip_create(path.encode(), workers, dw, dh, algo, 1, 0)
    assert p, f"ts_clip_create failed for {path}"
    w, h = lib.ts_clip_out_width(p), lib.ts_clip_out_height(p)
    n = len(starts)
    ys = np.empty((n, clip_len, h, w), np.uint8)
    uvs = np.empty((n, clip_len, h // 2, w), np.uint8)
    arr = (ctypes.c_longlong * n)(*starts)
    rc = lib.ts_clip_get_batch(p, arr, n, clip_len, stride,
                               ys.ctypes.data, uvs.ctypes.data)
    decoded = lib.ts_clip_frames_decoded(p)
    segs = lib.ts_clip_segments(p)
    total = lib.ts_clip_total_frames(p)
    if handle_out is not None:
        handle_out.append((lib, p))
    else:
        lib.ts_clip_destroy(p)
    return {"rc": rc, "y": ys, "uv": uvs, "decoded": decoded,
            "segments": segs, "total": total, "w": w, "h": h}


def assert_clips_match_serial(r, sy, suv, starts, clip_len, stride):
    assert r["rc"] == 0
    for i, s in enumerate(starts):
        for j in range(clip_len):
            f = s + j * stride
            assert np.array_equal(r["y"][i, j], sy[f]), (i, j, f)
            assert np.array_equal(r["uv"][i, j], suv[f]), (i, j, f)


@pytest.mark.parametrize("workers", [1, 3])
def test_bit_exact_vs_serial(workers):
    """Clips starting at keyframes, mid-GOP, and at the file tail all
    reproduce the serial bytes; worker count is invisible."""
    gs, sy, suv = serial_frames(GOP10, 250)
    assert gs == 250
    starts = [0, 7, 30, 119, 233, 30, 0, 248]
    r = clip_batch(GOP10, starts, 2, workers=workers)
    assert r["segments"] == 10 and r["total"] == 250
    assert_clips_match_serial(r, sy, suv, starts, 2, 1)


def test_temporal_stride():
    """frame_stride > 1: frame j of the clip is global s + j*stride, and
    warm-up frames between targets are decoded but not returned."""
    gs, sy, suv = serial_frames(GOP10, 250)
    starts = [3, 100, 240]
    r = clip_batch(GOP10, starts, 4, stride=3)
    assert_clips_match_serial(r, sy, suv, starts, 4, 3)


def test_container_pts_seek_path():
    """mp4 exercises the container seek branch (pts + BACKWARD flag,
    then skip to the entry keyframe's own packet)."""
    path = os.path.join(RESOURCES, "bunny.mp4")
    gs, sy, suv = serial_frames(path, 241)
    starts = [0, 50, 130, 238]
    r = clip_batch(path, starts, 3)
    assert_clips_match_serial(r, sy, suv, starts, 3, 1)


def test_sequential_clips_ride_without_seek():
    """Sorted non-overlapping clips decode each frame at most once: the
    worker rides forward from its previous position instead of
    re-seeking and re-warming every GOP."""
    gs, sy, suv = serial_frames(GOP10, 250)
    starts = list(range(0, 248, 8))
    r = clip_batch(GOP10, starts, 8, workers=1)
    assert_clips_match_serial(r, sy, suv, starts, 8, 1)
    assert r["decoded"] == 248  # strictly sequential: zero re-decode


def test_batch_sorts_and_dedups_decode_work():
    """A shuffled batch decodes in ascending start order (riding between
    nearby clips instead of re-warming) and duplicate starts decode
    once: total decode work equals the sorted-unique batch's, while
    outputs land in the caller's slot order."""
    gs, sy, suv = serial_frames(GOP10, 250)
    shuffled = [233, 0, 30, 0, 119, 7, 233, 30]
    r = clip_batch(GOP10, shuffled, 2, workers=1)
    assert_clips_match_serial(r, sy, suv, shuffled, 2, 1)
    sorted_unique = sorted(set(shuffled))
    r2 = clip_batch(GOP10, sorted_unique, 2, workers=1)
    assert r["decoded"] == r2["decoded"]


def test_warmup_cost_is_bounded_by_gop():
    """A mid-GOP clip decodes at most one GOP of warm-up (entry points
    every 25 frames in this fixture)."""
    r = clip_batch(GOP10, [120], 2, workers=1)
    assert r["rc"] == 0
    assert r["decoded"] <= 25 + 2


def test_resized_clips_match_serial_resized():
    """Per-frame host resize inside the workers equals the serial
    bulk-resized drain bit-for-bit."""
    gs, sy, suv = serial_frames(GOP10, 250, resized=(224, 224, 1))
    starts = [5, 60, 200]
    r = clip_batch(GOP10, starts, 4, resize=(224, 224, 1))
    assert_clips_match_serial(r, sy, suv, starts, 4, 1)


@pytest.mark.parametrize("name,frames,segs", [
    ("synthetic_640x360_120.h265", 120, 5),
    ("synthetic_640x360_90_vp9.ivf", 90, 4),
])
def test_other_codecs(name, frames, segs):
    """HEVC (IDR + open-GOP CRA entry points) and VP9 (every keyframe
    is an entry point)."""
    path = os.path.join(FIXDIR, name)
    gs, sy, suv = serial_frames(path, frames)
    starts = [0, frames // 3, frames - 5]
    r = clip_batch(path, starts, 3)
    assert r["segments"] == segs
    assert_clips_match_serial(r, sy, suv, starts, 3, 1)


def test_hevc_open_gop_rasl_clips():
    """Open-GOP HEVC with RASL leading pictures: a cold seek to a CRA
    drops the RASL (libavcodec NoRaslOutputFlag) without disturbing the
    display indexing; clips spanning a CRA boundary mid-decode see the
    RASL normally; warm-up is bounded by the CRA spacing (24), proving
    the CRAs really are entry points."""
    path = os.path.join(FIXDIR, "synthetic_640x360_96_opengop.h265")
    gs, sy, suv = serial_frames(path, 96)
    assert gs == 96
    # Clip starts: at a CRA (48), just after (49), in the RASL window
    # right before a CRA (70: frames 70-73 include RASL 69-71? leading
    # display 45-47/69-71), spanning a boundary (46), and the tail.
    starts = [48, 49, 70, 46, 92, 0]
    r = clip_batch(path, starts, 4, workers=2)
    assert r["segments"] == 4
    assert_clips_match_serial(r, sy, suv, starts, 4, 1)
    # Entry spacing is 24 frames: a single mid-GOP clip near the end
    # must NOT warm up from frame 0.
    r = clip_batch(path, [90], 2, workers=1)
    assert r["rc"] == 0 and r["decoded"] <= 24 + 2
    assert np.array_equal(r["y"][0, 0], sy[90])


def test_out_of_range_rejected():
    lib = _native.load()
    p = lib.ts_clip_create(GOP10.encode(), 1, 0, 0, 1, 1, 0)
    assert p
    y = np.empty(720 * 480 * 2, np.uint8)
    uv = np.empty(720 * 480, np.uint8)
    bad = (ctypes.c_longlong * 1)(249)  # 249 + 1 stride overruns 250
    assert lib.ts_clip_get_batch(p, bad, 1, 2, 1, y.ctypes.data,
                                 uv.ctypes.data) == _native.TS_ERROR
    neg = (ctypes.c_longlong * 1)(-1)
    assert lib.ts_clip_get_batch(p, neg, 1, 1, 1, y.ctypes.data,
                                 uv.ctypes.data) == _native.TS_ERROR
    assert lib.ts_clip_get_batch(p, bad, 1, 1, 0, y.ctypes.data,
                                 uv.ctypes.data) == _native.TS_ERROR
    lib.ts_clip_destroy(p)


def test_switch_native_geometry_renegotiates():
    """Fixed-geometry clips spanning a mid-file resolution switch
    surface TS_RENEGOTIATE; with host resize they ride through."""
    r = clip_batch(SWITCH, [8], 8, workers=1)
    assert r["rc"] == _native.TS_RENEGOTIATE
    r = clip_batch(SWITCH, [8], 8, workers=1, resize=(160, 128, 1))
    assert r["rc"] == 0


def test_live_source_rejected():
    lib = _native.load()
    assert not lib.ts_clip_create(b"tcp://127.0.0.1:1/nothing", 1, 0, 0, 1,
                                  1, 0)


# --------------------------------------------------------- Python loader


def test_clip_loader_shapes_and_determinism():
    """ClipLoader yields [batch, clip_len, C, H, W] device tensors whose
    frames equal the serial pipeline's converted output, shuffled
    deterministically by (seed, epoch)."""
    import jax

    from tensor_stream_tpu import ClipLoader, FourCC, FrameLoader, Planes

    kw = dict(clip_len=4, batch=5, host_resize=True, width=224, height=224,
              pixel_format=FourCC.RGB24, planes_pos=Planes.PLANAR,
              normalization=True, seed=7)

    # Serial oracle through the SAME VPP: FrameLoader over all frames.
    ser = FrameLoader(GOP10, batch=25, host_resize=True, width=224,
                      height=224, pixel_format=FourCC.RGB24,
                      planes_pos=Planes.PLANAR, normalization=True)
    frames = np.concatenate(
        [np.asarray(jax.block_until_ready(t)) for t, _ in ser])
    ser.close()
    assert frames.shape == (250, 3, 224, 224)

    with ClipLoader(GOP10, workers=2, **kw) as loader:
        assert len(loader) == 12  # 62 starts (step 4), batch 5, drop tail
        seen = []
        for clips, starts in loader:
            clips = np.asarray(jax.block_until_ready(clips))
            assert clips.shape == (5, 4, 3, 224, 224)
            assert clips.dtype == np.float32
            for c, s in zip(clips, starts):
                assert np.array_equal(c, frames[s:s + 4])
            seen.extend(int(s) for s in starts)
        assert len(seen) == 60 and len(set(seen)) == 60
        # Epoch 2 continues iteration with a DIFFERENT shuffle of the
        # same starts.
        clips2, starts2 = next(loader)
        # state() reflects the handed-out batch (loader.epoch is the
        # fill thread's look-ahead position and may already be further).
        assert loader.state()["epoch"] == 1

    with ClipLoader(GOP10, workers=2, **kw) as again:
        seen2 = []
        for _, starts in again:
            seen2.extend(int(s) for s in starts)
    assert seen2 == seen  # same seed => same epoch-0 order


def test_clip_loader_unshuffled_partial_tail():
    """shuffle=False + drop_partial=False covers every start in order;
    the final partial batch is sliced, not padded."""
    import jax

    from tensor_stream_tpu import ClipLoader

    with ClipLoader(GOP10, clip_len=8, batch=4, frame_stride=2,
                    clip_step=16, shuffle=False, drop_partial=False,
                    workers=1) as loader:
        starts_all, shapes = [], []
        for clips, starts in loader:
            starts_all.extend(int(s) for s in starts)
            shapes.append(tuple(clips.shape))
        span = 7 * 2 + 1
        expect = list(range(0, 250 - span + 1, 16))
        assert starts_all == expect
        assert shapes[-1][0] == len(expect) % 4
        assert all(s[0] == 4 for s in shapes[:-1])


def test_clip_loader_resume_state():
    """state() round-trips: a new loader with (epoch, start_clip) sees
    exactly the remaining clips of the epoch."""
    from tensor_stream_tpu import ClipLoader

    kw = dict(clip_len=4, batch=5, shuffle=True, seed=3, workers=1,
              prefetch=1)
    first, rest = [], []
    with ClipLoader(GOP10, **kw) as loader:
        for k, (_, starts) in enumerate(loader):
            if k < 3:
                first.extend(int(s) for s in starts)
                if k == 2:
                    st = loader.state()
            else:
                rest.extend(int(s) for s in starts)
    assert st["epoch"] == 0
    with ClipLoader(GOP10, epoch=st["epoch"], start_clip=st["start_clip"],
                    **kw) as resumed:
        rest2 = []
        for _, starts in resumed:
            rest2.extend(int(s) for s in starts)
    assert rest2 == rest


def test_segment_shuffle_epoch_order():
    """shuffle='segment': every start appears exactly once per epoch,
    starts of one GOP stay adjacent (segments permuted, clips shuffled
    within), the order is deterministic per (seed, epoch) and differs
    across epochs."""
    from tensor_stream_tpu import ClipLoader

    with ClipLoader(GOP10, clip_len=4, batch=5, shuffle="segment",
                    seed=11, workers=1, prefetch=1) as loader:
        order = loader._epoch_order(0)
        assert sorted(order) == sorted(loader.starts)
        # Segment-contiguity: mapping each start to its GOP (entry
        # points every 25 frames in this fixture), the sequence of GOP
        # ids is a run-length grouping — each GOP appears in exactly
        # one contiguous run.
        gops = [int(s) // 25 for s in order]
        runs = [g for i, g in enumerate(gops) if i == 0 or g != gops[i - 1]]
        assert len(runs) == len(set(runs)) == 10
        assert runs != sorted(runs)  # segments really are permuted
        # Within a segment, clips stay in stream order (ascending): a
        # run split across batch boundaries still rides forward.
        for g in runs:
            within = [int(s) for s, gg in zip(order, gops) if gg == g]
            assert within == sorted(within) and len(within) >= 2
        assert np.array_equal(order, loader._epoch_order(0))
        assert not np.array_equal(order, loader._epoch_order(1))
        assert sorted(loader._epoch_order(1)) == sorted(loader.starts)


def test_segment_shuffle_bit_exact_and_fewer_decodes():
    """A segment-shuffled epoch returns bit-identical clips to the
    serial decode while decoding measurably fewer warm-up frames than a
    uniform shuffle of the same starts (each GOP decodes ~once)."""
    import jax

    from tensor_stream_tpu import ClipLoader

    gs, sy, suv = serial_frames(GOP10, 250)
    decoded = {}
    for mode in ("segment", True):
        seen = []
        with ClipLoader(GOP10, clip_len=4, batch=5, shuffle=mode, seed=2,
                        workers=2, prefetch=1) as loader:
            for clips, starts in loader:
                jax.block_until_ready(clips)
                seen.extend(int(s) for s in starts)
            decoded[mode] = loader.frames_decoded
        assert len(seen) == len(set(seen)) == 60
    assert decoded["segment"] < decoded[True]
    # Raw-byte bit-exactness of a segment-grouped batch through the
    # native reader (multi-worker, ride-chain path).
    with ClipLoader(GOP10, clip_len=4, batch=5, shuffle="segment",
                    seed=2, workers=1, prefetch=1) as loader:
        starts = [int(s) for s in loader._epoch_order(0)[:8]]
    r = clip_batch(GOP10, starts, 4, workers=3)
    assert_clips_match_serial(r, sy, suv, starts, 4, 1)


def test_ride_chain_grouping_workers_invariant():
    """Chained scheduling: a segment-grouped batch decodes the SAME
    total frame count with 1 or 3 workers — multi-worker runs no longer
    split one GOP's clips across decoders (each would re-warm from the
    keyframe)."""
    starts = [0, 4, 8, 12, 50, 54, 58, 62, 100, 104, 108, 112]
    r1 = clip_batch(GOP10, starts, 4, workers=1)
    r3 = clip_batch(GOP10, starts, 4, workers=3)
    assert r1["rc"] == 0 and r3["rc"] == 0
    assert r1["decoded"] == r3["decoded"]
    assert np.array_equal(r1["y"], r3["y"])
    assert np.array_equal(r1["uv"], r3["uv"])


def test_clip_dataset_segment_shuffle_groups_by_file_and_gop():
    """ClipDataset(shuffle='segment'): the shuffled unit is (file,
    segment) — one epoch still visits every clip of every file exactly
    once, with each GOP's clips adjacent."""
    from tensor_stream_tpu import ClipDataset

    with ClipDataset([GOP10, GOP10], clip_len=4, batch=6,
                     shuffle="segment", seed=5, workers=1,
                     prefetch=1) as ds:
        order = ds._epoch_order(0)
        assert sorted(order) == list(range(len(ds.starts)))
        keys = ds._segment_keys()[order]
        runs = [k for i, k in enumerate(keys)
                if i == 0 or k != keys[i - 1]]
        assert len(runs) == len(set(runs)) == 20  # 10 GOPs x 2 files


def test_shuffle_arg_validated():
    from tensor_stream_tpu import ClipLoader
    with pytest.raises(ValueError, match="shuffle"):
        ClipLoader(GOP10, clip_len=4, shuffle="gop")


def test_clip_loader_rejects_oversized_span():
    from tensor_stream_tpu import ClipLoader
    with pytest.raises(ValueError, match="span"):
        ClipLoader(GOP10, clip_len=300, workers=1)


def test_clip_release_decoders_reopens_lazily():
    """ts_clip_release_decoders closes the worker codec contexts but
    keeps the keyframe scan; the next batch reopens lazily and decodes
    the same bytes (the ClipDataset LRU contract)."""
    lib = _native.load()
    p = lib.ts_clip_create(GOP10.encode(), 2, 0, 0, 1, 1, 0)
    assert p
    starts = (ctypes.c_longlong * 2)(30, 119)
    y = np.empty((2, 2, 480, 720), np.uint8)
    uv = np.empty((2, 2, 240, 720), np.uint8)
    assert lib.ts_clip_get_batch(p, starts, 2, 2, 1, y.ctypes.data,
                                 uv.ctypes.data) == 0
    lib.ts_clip_release_decoders(p)
    y2 = np.empty_like(y)
    uv2 = np.empty_like(uv)
    assert lib.ts_clip_get_batch(p, starts, 2, 2, 1, y2.ctypes.data,
                                 uv2.ctypes.data) == 0
    assert np.array_equal(y, y2) and np.array_equal(uv, uv2)
    lib.ts_clip_destroy(p)


def test_clip_dataset_global_shuffle_bit_exact():
    """ClipDataset over two files (different codecs, same grid rules):
    one epoch visits every (file, start) in the corpus exactly once, and
    each yielded clip is bit-identical to the single-file ClipLoader's
    output for the same label — through LRU decoder churn (max_open=1
    forces a release/reopen every time a batch straddles files) and a
    padded partial tail."""
    import jax

    from tensor_stream_tpu import ClipDataset, ClipLoader, FourCC, Planes

    files = [os.path.join(FIXDIR, "synthetic_640x360_120.h265"),
             os.path.join(FIXDIR, "synthetic_640x360_90_vp9.ivf")]
    kw = dict(clip_len=4, host_resize=True, width=160, height=128,
              pixel_format=FourCC.RGB24, planes_pos=Planes.PLANAR,
              normalization=True, seed=11)

    oracle = {}
    for fi, path in enumerate(files):
        with ClipLoader(path, batch=2, shuffle=False, drop_partial=False,
                        workers=1, **kw) as l:
            for clips, starts in l:
                clips = np.asarray(jax.block_until_ready(clips))
                for c, s in zip(clips, starts):
                    oracle[(fi, int(s))] = c

    with ClipDataset(files, batch=5, workers=1, drop_partial=False,
                     max_open=1, **kw) as ds:
        assert ds.files == files
        assert len(ds) == -(-len(oracle) // 5)
        seen = []
        for clips, labels in ds:
            clips = np.asarray(jax.block_until_ready(clips))
            assert clips.shape[1:] == (4, 3, 128, 160)
            assert len(labels) == clips.shape[0]
            for c, lab in zip(clips, labels):
                assert np.array_equal(c, oracle[lab]), lab
            seen.extend(labels)
        assert sorted(seen) == sorted(oracle)  # exactly-once cover
        assert ds.frames_decoded >= len(oracle) * 4


def test_clip_dataset_geometry_mismatch_rejected():
    """Mixed native geometries need host_resize (one device VPP program
    serves the whole corpus)."""
    from tensor_stream_tpu import ClipDataset
    small = os.path.join(FIXDIR, "synthetic_320x240_30_bt709full.h264")
    with pytest.raises(ValueError, match="host_resize"):
        ClipDataset([GOP10, small], clip_len=2, workers=1)


def test_clip_dataset_state_resume():
    """state() round-trips across files: a fresh dataset resumed at
    (epoch, start_clip) yields exactly the remaining labels."""
    from tensor_stream_tpu import ClipDataset

    files = [os.path.join(FIXDIR, "synthetic_640x360_120.h265"),
             os.path.join(FIXDIR, "synthetic_640x360_90_vp9.ivf")]
    kw = dict(clip_len=4, batch=6, shuffle=True, seed=5, workers=1,
              prefetch=1)
    first, rest = [], []
    with ClipDataset(files, **kw) as ds:
        for k, (_, labels) in enumerate(ds):
            if k < 2:
                first.extend(labels)
                if k == 1:
                    st = ds.state()
            else:
                rest.extend(labels)
    assert st["epoch"] == 0 and st["stream_urls"] == files
    with ClipDataset(files, epoch=st["epoch"], start_clip=st["start_clip"],
                     **kw) as resumed:
        rest2 = []
        for _, labels in resumed:
            rest2.extend(labels)
    assert rest2 == rest
    assert not set(first) & set(rest)


def test_clip_loader_rejects_zero_batch_epochs():
    """batch > clip starts with drop_partial=True would yield zero
    batches every epoch (silent empty training loop) — rejected at
    construction; drop_partial=False keeps the single partial batch."""
    from tensor_stream_tpu import ClipLoader
    with pytest.raises(ValueError, match="drop_partial"):
        ClipLoader(GOP10, clip_len=4, batch=100, workers=1)
    with ClipLoader(GOP10, clip_len=4, batch=100, workers=1,
                    drop_partial=False, shuffle=False) as loader:
        clips, starts = next(loader)
        assert clips.shape[0] == 62  # all starts, one partial batch

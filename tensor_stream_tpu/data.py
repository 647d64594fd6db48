"""FrameLoader — a prefetching iterator from video stream to device batches.

The reference stopped at per-frame `read()`; training/serving pipelines on
TPU want an input iterator that keeps the accelerator fed: decode runs in
the native producer thread, the drain + (optional) host resize runs in a
loader thread (both GIL-free), and the main thread only dispatches — so
host decode, host->HBM transfer, and device compute overlap, double-
buffered like flax's prefetch_to_device idiom.

    loader = FrameLoader("video.mp4", batch=16, width=224, height=224,
                         resize_type=ResizeType.BILINEAR,
                         pixel_format=FourCC.RGB24,
                         planes_pos=Planes.PLANAR, normalization=True,
                         host_resize=True, loop=True)
    for tensors, indices in loader:        # [16, 3, 224, 224] f32 on TPU
        train_step(params, tensors)

Each yielded batch is an independent jax.Array — safe to hold across
iterations (no buffer aliasing; staging buffers rotate host-side).
"""
import collections
import ctypes
import queue
import threading
import time
import warnings

import numpy as np

from . import _native
from .enums import ColorStandard, FourCC, FrameRate, Planes, ResizeType
from .tensor_stream import (FrameParameters, TensorStreamConverter,
                            host_resize_algo)
from .ops.vpp import build_vpp_batched_flat, build_vpp_clip_augment

# Queue sentinel: the drain hit a mid-stream resolution switch on the
# fixed-geometry (full-frame) path.
_RENEGOTIATED = object()


def _wait_detected_standard(lib, handle, index_baseline, deadline):
    """Waits (until `deadline`, monotonic) for the frame counter to move
    past `index_baseline`, then returns the stream's detected
    ColorStandard value — or None if no frame decoded in time (the
    detection would just be the default, not a measurement)."""
    while time.monotonic() < deadline:
        if lib.ts_pipeline_frame_index(handle) > index_baseline:
            return lib.ts_pipeline_detected_standard(handle)
        time.sleep(0.02)
    return None


class FrameLoader:
    """Iterates device-resident batches over a stream (TPU extension)."""

    def __init__(self,
                 stream_url,
                 batch=16,
                 prefetch=2,
                 host_resize=False,
                 loop=False,
                 buffer_size=None,
                 decode_threads=0,
                 device_index=0,
                 drop_partial=False,
                 start_frame=1,
                 fast_decode=False,
                 segment_parallel=0,
                 augment=None,
                 aug_seed=None,
                 **frame_kwargs):
        self.batch = int(batch)
        self.prefetch = max(1, int(prefetch))
        self.host_resize = bool(host_resize)
        self.drop_partial = bool(drop_partial)
        self.device_index = device_index
        self.stream_url = stream_url
        # Per-frame training augmentation (ops/augment.py), fused into
        # the batched VPP program. Keys derive from
        # fold_in(fold_in(key(aug_seed), 0), absolute frame index): a
        # loader resumed via start_frame replays identical augmented
        # bytes for the identical frames.
        self.augment = augment
        self.aug_seed = 0 if aug_seed is None else int(aug_seed)
        self.params = FrameParameters(**frame_kwargs)
        if augment is not None:
            # Mirror build_vpp_clip_augment's checks BEFORE any native
            # reader exists, so a bad config can't leak a started
            # pipeline/thread out of a failed __init__.
            if self.params.pixel_format not in (FourCC.RGB24,
                                                FourCC.BGR24):
                raise ValueError(
                    "augment requires an RGB24/BGR24 pixel format (got "
                    f"{self.params.pixel_format}) — the transforms are "
                    "defined on RGB model inputs")
            if augment.mean and not (self.params.normalization
                                     or self.params.dtype):
                raise ValueError(
                    "mean/std normalization needs a float tensor; pass "
                    "normalization=True or dtype='bfloat16'/'float32'")
        if self.host_resize:
            self._algo = host_resize_algo(self.params)
        self.reader = None
        self._segmented = None
        if int(segment_parallel) > 0:
            # GOP/segment-parallel decode (csrc/segment_reader.h): N
            # decoder instances over keyframe-split chunks of a seekable
            # file, stitched bit-exactly into serial frame order. Decode
            # throughput scales with host cores instead of stopping at
            # libavcodec frame-threading.
            self._init_segmented(int(segment_parallel), buffer_size, loop,
                                 decode_threads, fast_decode, start_frame)
            self._start_common()
            return
        self.reader = TensorStreamConverter(
            stream_url, framerate_mode=FrameRate.FAST,
            buffer_size=buffer_size or 4 * self.batch,
            decode_threads=decode_threads, loop=loop,
            fast_decode=fast_decode)
        self.reader.initialize(repeat_number=3)
        # Checkpoint/resume: position the stream so iteration starts at
        # `start_frame` (1-based) — resume a run with
        # FrameLoader(..., start_frame=ckpt["next_index"]).
        if int(start_frame) > 1:
            self.reader.seek_frame(int(start_frame) - 1)
        self._next_index = int(start_frame)
        # Register the cursor BEFORE the producer starts so the no-drop
        # window opens at the first frame (otherwise a fast producer may
        # already have evicted the head of a short file from the ring).
        self.reader._lib.ts_pipeline_register_cursor(self.reader._handle,
                                                     b"loader")
        # Baseline BEFORE start: seek_frame pre-sets the absolute frame
        # counter, so "a frame has decoded" means the counter moved past
        # this value, not past zero.
        index_baseline = self.reader._lib.ts_pipeline_frame_index(
            self.reader._handle)
        self.reader.start()
        if self.params.color_standard is ColorStandard.AUTO:
            # VUI colorimetry comes from decoded frames; the VPP program
            # is built once here, so wait (bounded) for the first frame
            # before resolving.
            detected = _wait_detected_standard(
                self.reader._lib, self.reader._handle, index_baseline,
                time.monotonic() + 10.0)
            if detected is None:
                self.close()
                raise RuntimeError(
                    "color_standard=AUTO: no frame decoded within 10s to "
                    "detect colorimetry from; pass an explicit standard")
            self.params.color_standard = ColorStandard(detected)
        w, h = self.reader.frame_size
        if self.host_resize:
            self._w, self._h = self.params.width, self.params.height
            cfg_params = FrameParameters(
                pixel_format=self.params.pixel_format,
                planes_pos=self.params.planes_pos,
                normalization=self.params.normalization,
                color_standard=self.params.color_standard,
                dtype=self.params.dtype)
            self._cfg = cfg_params.to_config(self._w, self._h)
        else:
            self._w, self._h = w, h
            self._cfg = self.params.to_config(w, h)
        self._start_common()

    def _start_common(self):
        if self.augment is not None:
            # Frames are length-1 clips of the fused VPP+augment
            # program: one key per frame, [batch, 1, ...] out.
            self._vpp = build_vpp_clip_augment(
                self._cfg, self.augment, self.batch, 1, self.aug_seed,
                self.device_index)
        else:
            self._vpp = build_vpp_batched_flat(self._cfg, self.batch,
                                               self.device_index)
        # Rotating staging pool: one buffer per in-flight batch plus one
        # being filled, so the drain thread never writes a buffer the
        # main thread is still shipping.
        n_bufs = self.prefetch + 2
        size = self.batch * self._w * self._h * 3 // 2
        self._pool = queue.Queue()
        for _ in range(n_bufs):
            self._pool.put(np.empty(size, np.uint8))
        self._filled = queue.Queue(maxsize=self.prefetch)
        self._pending = collections.deque()  # (buf, tensors) awaiting compute
        self._device = None  # resolved lazily on the first batch
        self._stop = threading.Event()
        target = self._drain_segmented if self._segmented else self._drain
        self._thread = threading.Thread(target=target, daemon=True)
        self._thread.start()

    def _init_segmented(self, workers, buffer_size, loop, decode_threads,
                        fast_decode, start_frame):
        if self.params.color_standard is ColorStandard.AUTO:
            raise ValueError(
                "segment_parallel does not support color_standard=AUTO "
                "(workers decode chunks out of order; pass the stream's "
                "standard explicitly)")
        lib = _native.load()
        dst_w = self.params.width if self.host_resize else 0
        dst_h = self.params.height if self.host_resize else 0
        algo = self._algo if self.host_resize else 0
        handle = lib.ts_segmented_create(
            str(self.stream_url).encode(), workers,
            buffer_size or 4 * self.batch, int(bool(loop)), dst_w, dst_h,
            algo, decode_threads or 1, int(bool(fast_decode)), 0)
        if not handle:
            raise RuntimeError(
                f"segment_parallel: cannot keyframe-split {self.stream_url} "
                "(not a seekable file, or no decodable frames); use the "
                "serial loader for live sources")
        self._segmented = handle
        self._seg_lib = lib
        if int(start_frame) > 1:
            lib.ts_segmented_seek_frame(handle, int(start_frame))
        self._next_index = int(start_frame)
        w = lib.ts_segmented_out_width(handle)
        h = lib.ts_segmented_out_height(handle)
        self._w, self._h = w, h
        if self.host_resize:
            cfg_params = FrameParameters(
                pixel_format=self.params.pixel_format,
                planes_pos=self.params.planes_pos,
                normalization=self.params.normalization,
                color_standard=self.params.color_standard,
                dtype=self.params.dtype)
            self._cfg = cfg_params.to_config(w, h)
        else:
            self._cfg = self.params.to_config(w, h)
        if lib.ts_segmented_start(handle) != 0:
            raise RuntimeError("segment_parallel: start failed")

    def _drain_segmented(self):
        lib = self._seg_lib
        handle = self._segmented
        y_size = self.batch * self._w * self._h
        first = ctypes.c_int(0)
        while not self._stop.is_set():
            buf = self._pool.get()
            if buf is None or self._stop.is_set():
                break
            got = lib.ts_segmented_get_batch(
                handle, self.batch, buf.ctypes.data,
                buf.ctypes.data + y_size, ctypes.byref(first))
            if got == _native.TS_RENEGOTIATE:
                self._filled.put(_RENEGOTIATED)
                break
            if got <= 0:
                self._filled.put(None)  # end-of-stream sentinel
                break
            self._filled.put((buf, got, first.value))

    # ------------------------------------------------------------- internal

    def _drain(self):
        lib = self.reader._lib
        handle = self.reader._handle
        y_size = self.batch * self._w * self._h
        first = ctypes.c_int(0)
        while not self._stop.is_set():
            buf = self._pool.get()
            if buf is None or self._stop.is_set():
                break
            if self.host_resize:
                got = lib.ts_pipeline_get_batch_resized(
                    handle, b"loader", self.batch, self._w, self._h,
                    self._algo, buf.ctypes.data, buf.ctypes.data + y_size,
                    ctypes.byref(first))
            else:
                got = lib.ts_pipeline_get_batch(
                    handle, b"loader", self.batch, buf.ctypes.data,
                    buf.ctypes.data + y_size, ctypes.byref(first))
            if got == _native.TS_RENEGOTIATE:
                # Mid-stream resolution switch: the full-frame drain's
                # staging pool and VPP program are sized for the init
                # geometry. host_resize=True rides through switches
                # (per-slot native resize to a fixed output); surface a
                # clear error instead of mis-sized batches here.
                self._filled.put(_RENEGOTIATED)
                break
            if got <= 0:
                self._filled.put(None)  # end-of-stream sentinel
                break
            self._filled.put((buf, got, first.value))

    # ------------------------------------------------------------ iteration

    def __iter__(self):
        return self

    def _next_async(self):
        """Dispatches the next batch WITHOUT waiting on the device.

        Returns (tensors, indices, buf); the caller MUST hand (buf,
        tensors) to self._recycle() once it no longer needs the batch to
        start earlier than `tensors` — recycling blocks on the VPP
        output before the staging buffer goes back to the pool, because
        jax.device_put may alias the numpy buffer outright on the CPU
        backend (blocking on the transfer alone does not protect the
        bytes; see tensor_stream.py staging rotation)."""
        import jax
        while True:
            item = self._filled.get()
            if item is None:
                # Latch: the drain pushed a single sentinel and exited;
                # re-put it so repeated next() raises StopIteration again
                # rather than blocking on the empty queue.
                self._filled.put(item)
                raise StopIteration
            if item is _RENEGOTIATED:
                # Latch the terminal state: the drain thread has exited,
                # so re-put the sentinel — a caller that catches this and
                # iterates again fails fast instead of blocking forever
                # on an empty queue.
                self._filled.put(item)
                raise RuntimeError(
                    "stream resolution changed mid-stream; use "
                    "FrameLoader(host_resize=True, width=..., height=...) "
                    "to ride through switches, or restart the loader for "
                    "the new geometry")
            buf, got, first = item
            if got < self.batch and self.drop_partial:
                self._pool.put(buf)
                continue
            if self._device is None:
                self._device = jax.devices()[self.device_index]
            flat = jax.device_put(buf, self._device)
            if self.augment is not None:
                # Key each frame by its absolute stream index (epoch
                # slot fixed at 0): deterministic across runs, resume-
                # exact under start_frame, and fresh per pass when
                # loop=True (the pipeline index keeps counting).
                ids = np.empty((self.batch, 2), np.int32)
                ids[:, 0] = 0
                ids[:, 1] = np.arange(first, first + self.batch)
                tensors = self._vpp(flat, ids)[:, 0]  # [batch, ...]
            else:
                tensors = self._vpp(flat)  # async dispatch
            if got < self.batch:
                tensors = tensors[:got]
            return tensors, list(range(first, first + got)), buf

    def _recycle(self, buf, tensors):
        import jax
        jax.block_until_ready(tensors)
        self._pool.put(buf)

    def checkpoint(self):
        """Resumable position: pass ``start_frame=ckpt["next_index"]`` to
        a new FrameLoader over the same stream to continue exactly where
        this one stopped (next batch starts at that frame index)."""
        return {"stream_url": self.stream_url,
                "next_index": self._next_index}

    def __next__(self):
        tensors, indices, buf = self._next_async()
        self._next_index = indices[-1] + 1
        # Keep the pipeline async: this batch's buffer is held in a
        # pending queue and recycled only once an OLDER batch's compute
        # has finished (back-pressure after `prefetch` batches).
        self._pending.append((buf, tensors))
        if len(self._pending) > self.prefetch:
            self._recycle(*self._pending.popleft())
        return tensors, indices

    def close(self):
        if self.reader is None and self._segmented is None:
            return  # already closed (both paths)
        self._stop.set()
        while self._pending:
            buf, _ = self._pending.popleft()
            self._pool.put(buf)
        try:
            self._pool.put_nowait(None)  # unblock a drain waiting for a buffer
        except queue.Full:
            pass
        # Stop (but do not yet destroy) the native pipeline: wakes a drain
        # parked inside the native call, which then exits. Only after the
        # drain thread is joined is it safe to destroy the handle.
        if self._segmented is not None:
            self._seg_lib.ts_segmented_stop(self._segmented)
            self._drain_unblock()
            self._thread.join(timeout=10)
            self._seg_lib.ts_segmented_destroy(self._segmented)
            self._segmented = None
            return
        if self.reader._handle is not None:
            self.reader._lib.ts_pipeline_stop(self.reader._handle)
        self._drain_unblock()
        self._thread.join(timeout=10)
        self.reader.stop()
        self.reader = None

    def _drain_unblock(self):
        # The drain may be blocked on the bounded _filled queue; pop one
        # item so its put() completes and it can observe _stop.
        try:
            self._filled.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    @property
    def fps(self):
        if self._segmented is not None:
            raise AttributeError("segment_parallel loaders free-run; the "
                                 "source fps is not tracked")
        return self.reader.fps

    @property
    def frame_size(self):
        if self._segmented is not None:
            return (self._seg_lib.ts_segmented_width(self._segmented),
                    self._seg_lib.ts_segmented_height(self._segmented))
        return self.reader.frame_size


class _ClipLoaderBase:
    """Shared scaffolding for the clip-sampling loaders: native
    ClipReader setup, deterministic (seed + epoch) shuffle order,
    fill-thread lifecycle, terminal-error latching, and shutdown.
    Subclasses define the staging-buffer shape (via the factory passed
    to ``_start_fill``), the fill body (``_fill``) and the device
    handoff (``__next__``)."""

    def _init_clip_params(self, clip_len, frame_stride, shuffle, seed,
                          prefetch, host_resize, frame_kwargs):
        """Validate + store the sampling scalars shared by every clip
        loader; returns the (dst_w, dst_h, algo) triple for the native
        creates (zeros = deposit native geometry)."""
        self._lib = _native.load()
        self.params = FrameParameters(**frame_kwargs)
        if self.params.color_standard is ColorStandard.AUTO:
            raise ValueError(
                f"{type(self).__name__} does not support "
                "color_standard=AUTO (clips decode out of order; pass "
                "the stream's standard explicitly)")
        self.clip_len = int(clip_len)
        self.frame_stride = max(1, int(frame_stride))
        # shuffle: False = sequential epochs; True/"uniform" = full
        # permutation; "segment" = permute keyframe segments, clips in
        # stream order within each — same determinism/resume contract,
        # but batches decode each GOP ~once instead of paying keyframe
        # warm-up per random clip (~1.5x decode throughput on typical
        # GOP-25 streams; see `frames_decoded`). The trade is shuffling
        # at GOP granularity (one GOP's clips stay adjacent, in order),
        # the standard chunk-shuffle used by video input pipelines.
        if shuffle not in (True, False, 0, 1, "uniform", "segment"):
            raise ValueError(
                f"shuffle must be True/False/'uniform'/'segment': "
                f"{shuffle!r}")
        self.shuffle_mode = ("segment" if shuffle == "segment"
                             else "uniform" if shuffle else None)
        self.shuffle = self.shuffle_mode is not None
        self._seg_keys = None  # lazy per-start segment ids (segment mode)
        self.seed = int(seed)
        self.prefetch = max(1, int(prefetch))
        if host_resize:
            return (self.params.width, self.params.height,
                    host_resize_algo(self.params))
        return 0, 0, 0

    def _create_reader(self, stream_url, workers, dst_w, dst_h, algo,
                       decode_threads, fast_decode):
        """Open + scan ONE source (keyframe table, no decode); returns
        (handle, out_w, out_h, total_frames)."""
        handle = self._lib.ts_clip_create(
            str(stream_url).encode(), int(workers), dst_w, dst_h, algo,
            decode_threads or 1, int(bool(fast_decode)))
        if not handle:
            raise RuntimeError(
                f"{type(self).__name__}: cannot scan {stream_url} (not "
                "a seekable file, or no decodable frames)")
        return (handle,
                self._lib.ts_clip_out_width(handle),
                self._lib.ts_clip_out_height(handle),
                self._lib.ts_clip_total_frames(handle))

    def _starts_grid(self, total_frames, clip_step, label):
        """Clip-start grid for one source (also stores self.clip_step,
        identical for every source of a dataset)."""
        span = (self.clip_len - 1) * self.frame_stride + 1
        if span > total_frames:
            raise ValueError(
                f"clip span {span} exceeds {label} {total_frames} frames")
        self.clip_step = int(clip_step) if clip_step else span
        return np.arange(0, total_frames - span + 1, self.clip_step,
                         dtype=np.int64)

    def _init_augment(self, augment, aug_seed):
        """Store the (optional) AugmentConfig + its key seed. Must run
        after _init_clip_params (needs self.seed) and before any VPP
        program is built."""
        self.augment = augment
        self.aug_seed = self.seed if aug_seed is None else int(aug_seed)

    def _build_vpp(self, cfg, clips, device_index):
        """VPP program for `clips` clips: the plain flat-batch program,
        or the fused VPP+augment program when augment is set."""
        if self.augment is not None:
            return build_vpp_clip_augment(cfg, self.augment, clips,
                                          self.clip_len, self.aug_seed,
                                          device_index)
        return build_vpp_batched_flat(cfg, clips * self.clip_len,
                                      device_index)

    def _aug_ids(self, epoch, idents, capacity):
        """int32 [capacity, 2] of (epoch, clip identity) for the augment
        program's key derivation; short batches pad by repeating the
        LAST identity — matching the decode pad (_decode_ids_into), so
        pad rows carry the key of the clip whose pixels they hold (the
        rows are sliced off after conversion either way)."""
        ids = np.asarray(idents, np.int64)
        out = np.empty((capacity, 2), np.int32)
        out[:, 0] = epoch
        out[:len(ids), 1] = ids
        out[len(ids):, 1] = ids[-1]
        return out

    def _vpp_config(self, host_resize):
        """VPP config for the readers' output geometry (self._w/_h).
        With host resize the native side already produced the target
        size, so the device program must not resize again."""
        if host_resize:
            cfg_params = FrameParameters(
                pixel_format=self.params.pixel_format,
                planes_pos=self.params.planes_pos,
                normalization=self.params.normalization,
                color_standard=self.params.color_standard,
                dtype=self.params.dtype)
            return cfg_params.to_config(self._w, self._h)
        return self.params.to_config(self._w, self._h)

    def _check_batch_fits(self):
        if self.drop_partial and self.batch > len(self.starts):
            raise ValueError(
                f"batch {self.batch} exceeds the {len(self.starts)} "
                "clip starts per epoch — with drop_partial=True every "
                "epoch would yield zero batches; lower batch/clip_step "
                "or pass drop_partial=False")

    def _init_clip_source(self, stream_url, clip_len, frame_stride,
                          clip_step, shuffle, seed, workers, host_resize,
                          decode_threads, fast_decode, prefetch,
                          frame_kwargs):
        """Open + scan the native ClipReader, compute the clip-start
        grid, and return the VPP config for the reader's output
        geometry. On any failure after the native create, the handle is
        destroyed before the exception propagates."""
        dst = self._init_clip_params(clip_len, frame_stride, shuffle, seed,
                                     prefetch, host_resize, frame_kwargs)
        self.stream_url = stream_url
        self._handle, self._w, self._h, self.total_frames = \
            self._create_reader(stream_url, workers, *dst, decode_threads,
                                fast_decode)
        try:
            self.starts = self._starts_grid(self.total_frames, clip_step,
                                            label="the stream's")
            return self._vpp_config(host_resize)
        except Exception:
            self._destroy_handle()
            raise

    def _start_fill(self, epoch, start_clip, make_staging):
        self._closed = False
        self.epoch = int(epoch)
        self._cursor = int(start_clip)  # clip index within the epoch order
        self._order = self._epoch_order(self.epoch)
        # (epoch, next clip index) as of the last batch HANDED OUT —
        # what state() reports (the fill thread runs ahead by prefetch).
        self._consumed = (self.epoch, self._cursor)
        self._pool = queue.Queue()
        for _ in range(self.prefetch + 2):
            self._pool.put(make_staging())
        self._filled = queue.Queue(maxsize=self.prefetch)
        self._pending = collections.deque()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _destroy_handle(self):
        if self._handle is not None:
            self._lib.ts_clip_destroy(self._handle)
            self._handle = None

    # ------------------------------------------------------------- sampling

    def _segment_table(self, handle):
        """First display frame of every cold-decoder entry point of one
        native reader, ascending int64."""
        n = self._lib.ts_clip_segments(handle)
        buf = np.empty(max(n, 1), np.int64)
        self._lib.ts_clip_segment_table(
            handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            n)
        return buf[:n]

    def _segment_keys(self):
        """Segment-group id of each element of self.starts (single-
        source loaders; ClipDataset overrides with (file, segment)
        groups)."""
        if self._seg_keys is None:
            firsts = self._segment_table(self._handle)
            self._seg_keys = np.searchsorted(firsts, self.starts,
                                             side="right") - 1
        return self._seg_keys

    def _epoch_order(self, epoch):
        if self.shuffle_mode is None:
            return self.starts
        rng = np.random.default_rng(self.seed + epoch)
        if self.shuffle_mode == "uniform":
            return rng.permutation(self.starts)
        # "segment": permute the segments; clips stay in stream order
        # WITHIN each segment — the shuffled unit is the GOP, and
        # ascending within-GOP order means a segment run split across
        # batch boundaries still rides forward (a shuffled-within order
        # back-seeks and re-warms at every such split: measured 0.79 vs
        # 0.83 sampling efficiency on the GOP-25 bench fixture).
        keys = self._segment_keys()
        uniq, inv = np.unique(keys, return_inverse=True)
        rank = rng.permutation(len(uniq))[inv]
        return self.starts[np.argsort(rank, kind="stable")]

    def _epoch_done(self):
        """Fill-thread epoch boundary: when the cursor cannot produce
        another batch, advance to the next (reshuffled) epoch, emit the
        StopIteration sentinel, and return True."""
        if self._cursor >= len(self._order) or \
           (self.drop_partial and
                self._cursor + self.batch > len(self._order)):
            self.epoch += 1
            self._cursor = 0
            self._order = self._epoch_order(self.epoch)
            self._filled.put(None)  # epoch boundary sentinel
            return True
        return False

    def __len__(self):
        """Batches per epoch."""
        n = len(self.starts)
        return n // self.batch if self.drop_partial else -(-n // self.batch)

    # ------------------------------------------------------------ iteration

    def __iter__(self):
        return self

    def _check_latched(self, item):
        """Raise for the terminal/latched queue items (epoch-boundary
        sentinel, renegotiate, decode error); pass batches through."""
        if item is None:
            raise StopIteration  # epoch boundary; fill thread continues
        if item is _RENEGOTIATED:
            self._filled.put(item)  # latch terminal state
            raise RuntimeError(
                "stream resolution changed mid-stream; use "
                f"{type(self).__name__}(host_resize=True, width=..., "
                "height=...) to ride through switches")
        if isinstance(item, Exception):
            self._filled.put(item)
            raise item

    def state(self):
        """Resumable position: pass epoch=.. start_clip=.. to a new
        loader over the same stream (same seed) to continue. The
        position reflects batches HANDED OUT, not prefetched ones."""
        epoch, cursor = self._consumed
        return {"stream_url": self.stream_url, "epoch": epoch,
                "start_clip": cursor, "seed": self.seed}

    @property
    def frames_decoded(self):
        """Total frames decoded natively (IDR warm-up included) — the
        sampling-efficiency observable vs frames returned."""
        return self._lib.ts_clip_frames_decoded(self._handle)

    def _to_device_batch(self, buf, got, aug_ids=None):
        """Single-device handoff: device_put + batched VPP (+ fused
        augmentation) + [batch, clip_len, ...] reshape + partial-tail
        slice + staging-buffer rotation. Returns the (async) device
        tensor."""
        import jax
        if self._device is None:
            self._device = jax.devices()[self.device_index]
        flat = jax.device_put(buf, self._device)
        if self.augment is not None:
            tensors = self._vpp(flat, aug_ids)  # [batch, clip_len, ...]
        else:
            tensors = self._vpp(flat)  # [batch*clip_len, ...] async
            tensors = tensors.reshape((self.batch, self.clip_len)
                                      + tensors.shape[1:])
        if got < self.batch:
            tensors = tensors[:got]
        self._pending.append((buf, tensors))
        if len(self._pending) > self.prefetch:
            oldest_buf, oldest_t = self._pending.popleft()
            jax.block_until_ready(oldest_t)
            self._pool.put(oldest_buf)
        return tensors

    def _init_device_mesh(self, per_device, devices, cfg):
        """dp-mesh plumbing shared by the sharded clip loaders: device
        list, per-device VPP programs, 1D 'dp' mesh + sharding, global
        batch size (tails always drop — shards must be equal-sized)."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        if devices is None:
            devices = jax.devices()
        self.devices = list(devices)
        self.per_device = int(per_device)
        self.batch = self.per_device * len(self.devices)
        self.drop_partial = True  # shards must be equal-sized
        if self.batch > len(self.starts):
            raise ValueError(
                f"global batch {self.batch} (= {len(self.devices)} "
                f"devices x {self.per_device} clips) exceeds the "
                f"{len(self.starts)} clip starts per epoch — every "
                "epoch would yield zero batches; lower "
                "per_device/clip_step or use fewer devices")
        all_devices = jax.devices()
        self._vpps = [
            self._build_vpp(cfg, self.per_device, all_devices.index(d))
            for d in self.devices]
        self.mesh = Mesh(np.asarray(self.devices), ("dp",))
        self._sharding = NamedSharding(self.mesh, PartitionSpec("dp"))

    def _to_sharded_batch(self, bufs, aug_ids=None):
        """Sharded handoff: per-device host->HBM transfers dispatched
        before any compute (so the copies overlap), per-device VPP
        (+ fused augmentation), then one global dp-sharded
        [batch, clip_len, ...] array with zero additional copies.
        Rotates the staging-buffer set."""
        import jax
        parts = []
        for k, (buf, dev, vpp) in enumerate(zip(bufs, self.devices,
                                                self._vpps)):
            flat = jax.device_put(buf, dev)
            if self.augment is not None:
                t = vpp(flat, aug_ids[k * self.per_device:
                                      (k + 1) * self.per_device])
            else:
                t = vpp(flat)
                t = t.reshape((self.per_device, self.clip_len)
                              + t.shape[1:])
            parts.append(t)
        global_shape = (self.batch,) + parts[0].shape[1:]
        clips = jax.make_array_from_single_device_arrays(
            global_shape, self._sharding, parts)
        self._pending.append((bufs, clips))
        if len(self._pending) > self.prefetch:
            old_bufs, old_clips = self._pending.popleft()
            jax.block_until_ready(old_clips)
            self._pool.put(old_bufs)
        return clips

    def close(self):
        if getattr(self, "_closed", True):
            return  # never started, already closed, or handle leaked
        self._closed = True
        self._stop.set()
        while self._pending:
            buf, _ = self._pending.popleft()
            self._pool.put(buf)
        try:
            self._pool.put_nowait(None)  # unblock a fill waiting for a buffer
        except queue.Full:
            pass
        try:
            self._filled.get_nowait()  # unblock a fill on the bounded queue
        except queue.Empty:
            pass
        self._thread.join(timeout=10)
        if self._thread.is_alive():
            # A large native batch decode can legitimately outlast the
            # first join on a loaded host; destroying the reader under
            # the live call would be a use-after-free. Wait it out, and
            # as a last resort leak the handle rather than crash.
            self._thread.join(timeout=120)
            if self._thread.is_alive():
                warnings.warn(
                    f"{type(self).__name__}.close(): fill thread still "
                    "inside a native call; leaking the ClipReader handle")
                return
        self._destroy_handle()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class ClipLoader(_ClipLoaderBase):
    """Shuffled fixed-length clip batches for video-model training.

    Frame iterators (FrameLoader) feed image models; video models
    (action recognition, video diffusion, VLM frame stacks) train on
    randomly-sampled fixed-length clips. The reference cannot express
    this at all (its Parser::Reset is unimplemented, so streams only
    play forward); here the native ClipReader (csrc/clip_reader.h)
    seeks each requested clip to its nearest IDR entry point, warm-up
    decodes, and returns bytes bit-identical to the serial decode of
    the same frame indices — the DALI-VideoReader capability, built on
    the same keyframe scan as segment-parallel decode.

        loader = ClipLoader("video.mp4", clip_len=8, batch=4,
                            host_resize=True, width=224, height=224,
                            pixel_format=FourCC.RGB24,
                            planes_pos=Planes.PLANAR, normalization=True,
                            shuffle=True, seed=0, workers=2)
        for clips, starts in loader:   # [4, 8, 3, 224, 224] f32 on TPU
            train_step(params, clips)

    One iteration pass = one epoch over every clip start (`clip_step`
    apart; default non-overlapping). ``shuffle="segment"`` keeps each
    GOP's clips adjacent within the epoch (segments permuted, stream
    order within) so batches decode each GOP ~once — ~1.5x the decode
    throughput of the full permutation on typical GOP-25 streams; use
    it for training unless clip-level i.i.d. order matters. Each epoch
    reshuffles with ``seed + epoch``, so runs are deterministic and
    resumable:
    ``ClipLoader(..., epoch=e, start_clip=k)`` continues where
    ``state()`` left off. Decode overlaps device compute through a fill
    thread + rotating staging buffers (GIL-free native batch call).
    """

    def __init__(self, stream_url, clip_len, batch=4, frame_stride=1,
                 clip_step=None, shuffle=True, seed=0, workers=2,
                 host_resize=False, decode_threads=0, fast_decode=False,
                 device_index=0, drop_partial=True, prefetch=2,
                 epoch=0, start_clip=0, augment=None, aug_seed=None,
                 **frame_kwargs):
        self.batch = int(batch)
        self.device_index = device_index
        self.drop_partial = bool(drop_partial)
        self._cfg = self._init_clip_source(
            stream_url, clip_len, frame_stride, clip_step, shuffle, seed,
            workers, host_resize, decode_threads, fast_decode, prefetch,
            frame_kwargs)
        try:
            self._init_augment(augment, aug_seed)
            self._check_batch_fits()
            self._vpp = self._build_vpp(self._cfg, self.batch,
                                        device_index)
            self._device = None
            size = self.batch * self.clip_len * self._w * self._h * 3 // 2
            self._start_fill(epoch, start_clip,
                             lambda: np.empty(size, np.uint8))
        except Exception:
            self._destroy_handle()
            raise

    # ------------------------------------------------------------- internal

    def _fill(self):
        y_size = self.batch * self.clip_len * self._w * self._h
        while not self._stop.is_set():
            if self._epoch_done():
                continue
            batch_starts = self._order[self._cursor:self._cursor + self.batch]
            self._cursor += len(batch_starts)
            meta = (self.epoch, self._cursor)
            got = len(batch_starts)
            # The native call and VPP program are fixed-size; pad a
            # trailing partial batch by repeating its last start, then
            # slice the pad off after conversion.
            padded = batch_starts if got == self.batch else np.concatenate(
                [batch_starts,
                 np.full(self.batch - got, batch_starts[-1], np.int64)])
            buf = self._pool.get()
            if buf is None or self._stop.is_set():
                break
            carr = padded.ctypes.data_as(
                ctypes.POINTER(ctypes.c_longlong))
            rc = self._lib.ts_clip_get_batch(
                self._handle, carr, self.batch, self.clip_len,
                self.frame_stride, buf.ctypes.data,
                buf.ctypes.data + y_size)
            if rc == _native.TS_RENEGOTIATE:
                self._filled.put(_RENEGOTIATED)
                break
            if rc != 0:
                self._filled.put(RuntimeError(
                    f"clip decode failed (code {rc})"))
                break
            self._filled.put((buf, got, batch_starts, meta))

    # ------------------------------------------------------------ iteration

    def __next__(self):
        """Returns (clips, starts): clips is a device tensor shaped
        [batch, clip_len, ...frame dims...], starts the 0-based first-
        frame index of each clip. Raises StopIteration at each epoch
        boundary; iterating again continues into the next (reshuffled)
        epoch."""
        item = self._filled.get()
        self._check_latched(item)
        buf, got, starts, self._consumed = item
        aug_ids = None if self.augment is None else \
            self._aug_ids(self._consumed[0], starts, self.batch)
        return self._to_device_batch(buf, got, aug_ids), list(starts)


class ClipDataset(_ClipLoaderBase):
    """Globally-shuffled clip batches across MANY video files.

    Real video training samples each batch from a whole corpus, not one
    file. ClipDataset scans every source once (keyframe tables only, no
    decode), concatenates the per-file clip-start grids into ONE global
    index, and shuffles that with ``seed + epoch`` — every clip in the
    corpus is visited exactly once per epoch regardless of which file
    it lives in (the DALI VideoReader ``file_list`` behavior; the
    reference cannot seek even one file — its src/Parser.cpp Reset is
    unimplemented).

    Decoder instances open lazily per file, and at most ``max_open``
    files keep decoder pools alive (LRU-released between batches; the
    cheap keyframe scans persist for the whole corpus) — a corpus of
    thousands of files does not hold thousands of open codec contexts.

        ds = ClipDataset(["a.mp4", "b.mp4"], clip_len=8, batch=4,
                         host_resize=True, width=224, height=224,
                         pixel_format=FourCC.RGB24,
                         planes_pos=Planes.PLANAR, normalization=True)
        for clips, labels in ds:     # clips [4, 8, 3, 224, 224] on TPU
            ...                      # labels [(file_idx, start), ...]

    Each batch keeps the global shuffle's membership but is regrouped
    file-contiguous internally (one native batch call per touched file,
    decoding straight into the shared staging buffer); ``labels`` gives
    every clip's (file index, first frame) in yielded order, for
    per-file supervision. Without ``host_resize`` all files must share
    one decoded geometry; with it, mixed resolutions are fine. Epoch
    semantics match ClipLoader: StopIteration per epoch, deterministic
    reshuffle, ``state()``/(epoch, start_clip) resume."""

    def __init__(self, stream_urls, clip_len, batch=4, frame_stride=1,
                 clip_step=None, shuffle=True, seed=0, workers=2,
                 host_resize=False, decode_threads=0, fast_decode=False,
                 device_index=0, drop_partial=True, prefetch=2,
                 epoch=0, start_clip=0, max_open=4, augment=None,
                 aug_seed=None, **frame_kwargs):
        self.batch = int(batch)
        self.device_index = device_index
        self.drop_partial = bool(drop_partial)
        cfg = self._init_corpus(stream_urls, clip_len, frame_stride,
                                clip_step, shuffle, seed, workers,
                                host_resize, decode_threads, fast_decode,
                                prefetch, max_open, frame_kwargs)
        try:
            self._init_augment(augment, aug_seed)
            self._check_batch_fits()
            self._vpp = self._build_vpp(cfg, self.batch, device_index)
            self._device = None
            size = self.batch * self.clip_len * self._w * self._h * 3 // 2
            self._start_fill(epoch, start_clip,
                             lambda: np.empty(size, np.uint8))
        except Exception:
            self._destroy_handle()
            raise

    def _init_corpus(self, stream_urls, clip_len, frame_stride, clip_step,
                     shuffle, seed, workers, host_resize, decode_threads,
                     fast_decode, prefetch, max_open, frame_kwargs):
        """Scan every source (keyframe tables only) and build the global
        clip index; returns the VPP config. Destroys any handles already
        created before re-raising a mid-scan failure."""
        self.stream_urls = [str(u) for u in stream_urls]
        if not self.stream_urls:
            raise ValueError(f"{type(self).__name__} needs >=1 source")
        self.max_open = max(1, int(max_open))
        dst = self._init_clip_params(clip_len, frame_stride, shuffle, seed,
                                     prefetch, host_resize, frame_kwargs)
        self._handles = []
        try:
            file_of, start_of = [], []
            self._w = self._h = 0
            for fi, url in enumerate(self.stream_urls):
                handle, w, h, total = self._create_reader(
                    url, workers, *dst, decode_threads, fast_decode)
                self._handles.append(handle)
                if fi == 0:
                    self._w, self._h = w, h
                elif (w, h) != (self._w, self._h):
                    raise ValueError(
                        f"{url} decodes to {w}x{h} but "
                        f"{self.stream_urls[0]} to {self._w}x{self._h}; "
                        "pass host_resize=True with width/height to mix "
                        "resolutions")
                starts = self._starts_grid(total, clip_step, label=f"{url}'s")
                file_of.append(np.full(len(starts), fi, np.int64))
                start_of.append(starts)
            self._file_of = np.concatenate(file_of)
            self._start_of = np.concatenate(start_of)
            # The shuffled unit is the GLOBAL clip id (row into the
            # file_of/start_of tables).
            self.starts = np.arange(len(self._file_of), dtype=np.int64)
            self._lru = collections.OrderedDict()  # file idx (open pools)
            return self._vpp_config(host_resize)
        except Exception:
            self._destroy_handle()
            raise

    @property
    def files(self):
        """Sources in label order: labels' file index points here."""
        return list(self.stream_urls)

    @property
    def frames_decoded(self):
        """Total frames decoded across all files (warm-up included)."""
        return sum(self._lib.ts_clip_frames_decoded(h)
                   for h in self._handles)

    def _segment_keys(self):
        """shuffle='segment' group ids for the GLOBAL clip index: the
        unit is (file, segment), so a segment epoch also visits files in
        a permuted order while keeping each GOP's clips adjacent."""
        if self._seg_keys is None:
            keys, base = [], 0
            for fi, h in enumerate(self._handles):
                firsts = self._segment_table(h)
                local = self._start_of[self._file_of == fi]
                keys.append(base + np.searchsorted(firsts, local,
                                                   side="right") - 1)
                base += len(firsts)
            self._seg_keys = np.concatenate(keys)
        return self._seg_keys

    def state(self):
        epoch, cursor = self._consumed
        return {"stream_urls": self.files, "epoch": epoch,
                "start_clip": cursor, "seed": self.seed}

    def _destroy_handle(self):
        for h in self._handles:
            self._lib.ts_clip_destroy(h)
        self._handles = []

    # ------------------------------------------------------------- internal

    def _touch(self, fi):
        """LRU bookkeeping after a native call on file `fi`: release the
        decoder pools (keyframe scans stay) of the least recently used
        files beyond max_open. Fill-thread only."""
        self._lru[fi] = True
        self._lru.move_to_end(fi)
        while len(self._lru) > self.max_open:
            old, _ = self._lru.popitem(last=False)
            self._lib.ts_clip_release_decoders(self._handles[old])

    def _decode_ids_into(self, ids, buf, capacity):
        """Decode the clips named by global ids into `buf` (laid out for
        `capacity` clips). Regroups file-contiguous (stable: the
        shuffle's within-file order survives) so each touched file gets
        ONE native call; a short `ids` is padded by repeating the LAST
        regrouped clip, extending the final file group so the tail
        slices off clean after conversion. Returns (regrouped unpadded
        ids, rc, failed file idx)."""
        got = len(ids)
        ids = ids[np.argsort(self._file_of[ids], kind="stable")]
        padded = ids if got == capacity else np.concatenate(
            [ids, np.repeat(ids[-1:], capacity - got)])
        y_frame = self._w * self._h
        uv_frame = (self._h // 2) * self._w
        y_size = capacity * self.clip_len * y_frame
        files = self._file_of[padded]
        pos = 0
        for fi in np.unique(files):
            sub = np.ascontiguousarray(self._start_of[padded[files == fi]])
            carr = sub.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))
            rc = self._lib.ts_clip_get_batch(
                self._handles[fi], carr, len(sub), self.clip_len,
                self.frame_stride,
                buf.ctypes.data + pos * self.clip_len * y_frame,
                buf.ctypes.data + y_size + pos * self.clip_len * uv_frame)
            self._touch(int(fi))
            if rc != 0:
                return ids, rc, int(fi)
            pos += len(sub)
        return ids, 0, -1

    def _put_decode_error(self, rc, fi):
        self._filled.put(
            _RENEGOTIATED if rc == _native.TS_RENEGOTIATE
            else RuntimeError(f"clip decode failed (code {rc}, file "
                              f"{self.stream_urls[fi]})"))

    def _fill(self):
        while not self._stop.is_set():
            if self._epoch_done():
                continue
            ids = self._order[self._cursor:self._cursor + self.batch]
            self._cursor += len(ids)
            meta = (self.epoch, self._cursor)
            got = len(ids)
            buf = self._pool.get()
            if buf is None or self._stop.is_set():
                break
            ids, rc, fi = self._decode_ids_into(ids, buf, self.batch)
            if rc != 0:
                self._put_decode_error(rc, fi)
                break
            self._filled.put((buf, got, ids, meta))

    # ------------------------------------------------------------ iteration

    def __next__(self):
        """Returns (clips, labels): clips is a [batch, clip_len, ...]
        device tensor, labels the (file index, first frame) pair of each
        clip in the same order. Raises StopIteration at each epoch
        boundary; iterating again continues into the next epoch."""
        item = self._filled.get()
        self._check_latched(item)
        buf, got, ids, self._consumed = item
        labels = [(int(self._file_of[i]), int(self._start_of[i]))
                  for i in ids]
        aug_ids = None if self.augment is None else \
            self._aug_ids(self._consumed[0], ids, self.batch)
        return self._to_device_batch(buf, got, aug_ids), labels


class ShardedClipLoader(_ClipLoaderBase):
    """Clip batches from ONE file, sharded over N chips (dp training).

    The multi-chip face of ClipLoader: one native ClipReader samples a
    single shuffled epoch order (so no clip is duplicated across chips),
    each device's per_device-clip sub-batch decodes into its OWN staging
    buffer and transfers straight to that chip (host->HBM fan-out, no
    funnel through chip 0), and iteration stitches the per-device
    [per_device, T, ...] tensors into one global array sharded over a 1D
    'dp' mesh with jax.make_array_from_single_device_arrays — zero
    additional copies. Feed it to any pjit/shard_map train step.

        loader = ShardedClipLoader("video.mp4", clip_len=8, per_device=2,
                                   host_resize=True, width=224, height=224,
                                   pixel_format=FourCC.RGB24,
                                   planes_pos=Planes.PLANAR,
                                   normalization=True)
        for clips, starts in loader:   # [n_devices*2, 8, ...] dp-sharded
            train_step(params, clips)

    Same epoch semantics as ClipLoader (StopIteration per epoch,
    deterministic ``seed + epoch`` shuffle, ``state()`` resume); the
    global batch is n_devices * per_device and epoch tails that cannot
    fill every shard are dropped (shards must be equal-sized)."""

    def __init__(self, stream_url, clip_len, per_device=2, devices=None,
                 frame_stride=1, clip_step=None, shuffle=True, seed=0,
                 workers=2, host_resize=False, decode_threads=0,
                 fast_decode=False, prefetch=2, epoch=0, start_clip=0,
                 augment=None, aug_seed=None, **frame_kwargs):
        cfg = self._init_clip_source(
            stream_url, clip_len, frame_stride, clip_step, shuffle, seed,
            workers, host_resize, decode_threads, fast_decode, prefetch,
            frame_kwargs)
        try:
            self._init_augment(augment, aug_seed)
            self._init_device_mesh(per_device, devices, cfg)
            size = (self.per_device * self.clip_len
                    * self._w * self._h * 3 // 2)
            self._start_fill(
                epoch, start_clip,
                lambda: [np.empty(size, np.uint8) for _ in self.devices])
        except Exception:
            self._destroy_handle()
            raise

    def _fill(self):
        y_size = self.per_device * self.clip_len * self._w * self._h
        while not self._stop.is_set():
            if self._epoch_done():
                continue
            batch_starts = self._order[self._cursor:self._cursor + self.batch]
            self._cursor += self.batch
            meta = (self.epoch, self._cursor)
            bufs = self._pool.get()
            if bufs is None or self._stop.is_set():
                break
            failed = None
            for k, buf in enumerate(bufs):
                sub = np.ascontiguousarray(
                    batch_starts[k * self.per_device:
                                 (k + 1) * self.per_device])
                carr = sub.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))
                rc = self._lib.ts_clip_get_batch(
                    self._handle, carr, self.per_device, self.clip_len,
                    self.frame_stride, buf.ctypes.data,
                    buf.ctypes.data + y_size)
                if rc != 0:
                    failed = rc
                    break
            if failed is not None:
                self._filled.put(
                    _RENEGOTIATED if failed == _native.TS_RENEGOTIATE
                    else RuntimeError(f"clip decode failed (code {failed})"))
                break
            self._filled.put((bufs, batch_starts, meta))

    def __next__(self):
        item = self._filled.get()
        self._check_latched(item)
        bufs, starts, self._consumed = item
        aug_ids = None if self.augment is None else \
            self._aug_ids(self._consumed[0], starts, self.batch)
        return self._to_sharded_batch(bufs, aug_ids), list(starts)


class ShardedClipDataset(ClipDataset):
    """Globally-shuffled clips from MANY files, sharded over N chips.

    The full video-training input pipeline: ClipDataset's corpus-wide
    epoch (one ``seed + epoch`` shuffle across every clip of every
    file, lazy per-file decoder pools LRU-capped at ``max_open``)
    combined with ShardedClipLoader's dp fan-out (each device's
    per_device-clip shard decodes into its own staging buffer,
    transfers straight to that chip, and the batch arrives as ONE
    global dp-sharded [n_devices*per_device, T, ...] array for any
    pjit/shard_map train step).

        ds = ShardedClipDataset(glob.glob("corpus/*.mp4"), clip_len=8,
                                per_device=2, host_resize=True,
                                width=224, height=224,
                                pixel_format=FourCC.RGB24,
                                planes_pos=Planes.PLANAR,
                                normalization=True)
        for clips, labels in ds:    # dp-sharded; labels (file_idx, s)
            train_step(params, clips)

    No clip is duplicated across chips within an epoch; epoch tails
    that cannot fill every shard are dropped (shards must be
    equal-sized). Labels follow each device's file-contiguous
    regrouping, concatenated in device order."""

    def __init__(self, stream_urls, clip_len, per_device=2, devices=None,
                 frame_stride=1, clip_step=None, shuffle=True, seed=0,
                 workers=2, host_resize=False, decode_threads=0,
                 fast_decode=False, prefetch=2, epoch=0, start_clip=0,
                 max_open=4, augment=None, aug_seed=None, **frame_kwargs):
        cfg = self._init_corpus(stream_urls, clip_len, frame_stride,
                                clip_step, shuffle, seed, workers,
                                host_resize, decode_threads, fast_decode,
                                prefetch, max_open, frame_kwargs)
        try:
            self._init_augment(augment, aug_seed)
            self._init_device_mesh(per_device, devices, cfg)
            size = (self.per_device * self.clip_len
                    * self._w * self._h * 3 // 2)
            self._start_fill(
                epoch, start_clip,
                lambda: [np.empty(size, np.uint8) for _ in self.devices])
        except Exception:
            self._destroy_handle()
            raise

    def _fill(self):
        while not self._stop.is_set():
            if self._epoch_done():
                continue
            ids = self._order[self._cursor:self._cursor + self.batch]
            self._cursor += self.batch
            meta = (self.epoch, self._cursor)
            bufs = self._pool.get()
            if bufs is None or self._stop.is_set():
                break
            shard_ids, failed = [], None
            for k, buf in enumerate(bufs):
                sub = ids[k * self.per_device:(k + 1) * self.per_device]
                rids, rc, fi = self._decode_ids_into(sub, buf,
                                                     self.per_device)
                if rc != 0:
                    failed = (rc, fi)
                    break
                shard_ids.append(rids)
            if failed is not None:
                self._put_decode_error(*failed)
                break
            self._filled.put((bufs, np.concatenate(shard_ids), meta))

    def __next__(self):
        """Returns (clips, labels): clips one global dp-sharded
        [batch, clip_len, ...] array, labels the (file index, first
        frame) of each clip in the same order."""
        item = self._filled.get()
        self._check_latched(item)
        bufs, ids, self._consumed = item
        labels = [(int(self._file_of[i]), int(self._start_of[i]))
                  for i in ids]
        aug_ids = None if self.augment is None else \
            self._aug_ids(self._consumed[0], ids, self.batch)
        return self._to_sharded_batch(bufs, aug_ids), labels


class ShardedStreamLoader:
    """N streams -> ONE jax.Array sharded over N chips (dp serving).

    Each stream gets its own chip: its FrameLoader transfers straight to
    that device (host->HBM transfers fan out, nothing funnels through
    chip 0), and iteration stitches the per-device batches into a single
    GLOBAL array sharded over a 1D 'dp' mesh with
    jax.make_array_from_single_device_arrays — zero additional copies.
    Feed it to any pjit/shard_map program; XLA keeps each stream's frames
    on its own chip.

        mesh-per-stream serving on 4 chips:
        loader = ShardedStreamLoader([u1, u2, u3, u4], per_stream=8,
                                     width=224, height=224, ...)
        for batch, indices in loader:   # [32, ...] sharded over 'dp'
            logits = pjit_model(batch)

    Requires len(stream_urls) <= len(jax.devices()). Iteration ends when
    any stream is exhausted (loop=True never ends). The final partial
    batch is dropped (global shards must be equal-sized).
    """

    def __init__(self, stream_urls, per_stream=8, devices=None, **kwargs):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        if devices is None:
            devices = jax.devices()[:len(stream_urls)]
        if len(devices) < len(stream_urls):
            raise ValueError(f"{len(stream_urls)} streams need as many "
                             f"devices, have {len(devices)}")
        kwargs.setdefault("drop_partial", True)
        self.devices = list(devices)
        # Decorrelate per-frame augmentation across streams (see
        # MultiStreamLoader): same frame index on two streams must not
        # share a key.
        base_seed = kwargs.pop("aug_seed", None) or 0
        self.loaders = [
            FrameLoader(url, batch=per_stream, aug_seed=base_seed + k,
                        device_index=jax.devices().index(dev), **kwargs)
            for k, (url, dev) in enumerate(zip(stream_urls, self.devices))]
        self.mesh = Mesh(np.asarray(self.devices), ("dp",))
        self._sharding = NamedSharding(self.mesh, PartitionSpec("dp"))
        self.per_stream = per_stream
        self._last_round = []

    def __iter__(self):
        return self

    def __next__(self):
        import jax
        parts, indices, pending = [], {}, []
        # Dispatch every stream's transfer first so the per-device
        # host->HBM copies overlap; buffers from the PREVIOUS round are
        # recycled once their compute finished (one round of overlap).
        try:
            for k, loader in enumerate(self.loaders):
                tensors, idx, buf = loader._next_async()
                parts.append(tensors)
                indices[k] = idx
                pending.append((loader, buf, tensors))
        except StopIteration:
            # A drained stream must not leak the buffers already
            # dispatched for earlier streams this round.
            for loader, buf, tensors in pending:
                loader._recycle(buf, tensors)
            self._flush_pending()
            raise
        self._flush_pending()
        self._last_round = pending
        if any(p.shape[0] != self.per_stream for p in parts):
            raise StopIteration  # uneven tail; shards must match
        shard_shape = parts[0].shape
        global_shape = (len(parts) * shard_shape[0],) + shard_shape[1:]
        batch = jax.make_array_from_single_device_arrays(
            global_shape, self._sharding, parts)
        return batch, indices

    def _flush_pending(self):
        for loader, buf, tensors in self._last_round:
            loader._recycle(buf, tensors)
        self._last_round = []

    def close(self):
        self._flush_pending()
        for loader in self.loaders:
            loader.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class MultiStreamLoader:
    """Batches frames from SEVERAL streams into one device dispatch.

    The reference's scale-out story was one instance per GPU
    (different_streams.py); the TPU-idiomatic version is the transpose:
    many streams share one chip by stacking into the batch dimension,
    where the MXU/VPU want their work. Each stream runs its own native
    producer + drain; iteration yields
    ``(tensors [n_streams*per_stream, ...], indices {url_index: [...]})``,
    stacked on device (no extra host copies).

        loader = MultiStreamLoader(["cam1.mp4", "cam2.mp4"], per_stream=8,
                                   width=224, height=224, host_resize=True,
                                   pixel_format=FourCC.RGB24,
                                   planes_pos=Planes.PLANAR,
                                   normalization=True, loop=True)
        for batch, indices in loader:   # [16, 3, 224, 224]
            logits = model(batch)

    Iteration ends when ANY stream is exhausted (loop=True never ends).
    """

    def __init__(self, stream_urls, per_stream=8, **loader_kwargs):
        # Per-frame augmentation (augment=...) rides through to the
        # FrameLoaders; offset each stream's aug_seed so streams at the
        # same frame index draw independent transforms.
        base_seed = loader_kwargs.pop("aug_seed", None) or 0
        self.loaders = [FrameLoader(url, batch=per_stream,
                                    aug_seed=base_seed + k, **loader_kwargs)
                        for k, url in enumerate(stream_urls)]

    def __iter__(self):
        return self

    def __next__(self):
        import jax.numpy as jnp
        parts, indices = [], {}
        for k, loader in enumerate(self.loaders):
            tensors, idx = next(loader)  # StopIteration propagates
            parts.append(tensors)
            indices[k] = idx
        return jnp.concatenate(parts, axis=0), indices

    def close(self):
        for loader in self.loaders:
            loader.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class PooledStreamLoader:
    """Many streams, one shared native worker pool, ONE device dispatch.

    MultiStreamLoader spawns a producer thread (plus codec threads) per
    stream — fine for a handful, wasteful for many-stream serving. Here
    N streams share M pool workers (csrc/stream_pool.cpp): each worker
    round-robins unpaced decode iterations over streams with ring
    headroom, so thread count is bounded by cores, not streams. All
    streams drain into ONE flat staging buffer and convert in a single
    batched VPP dispatch of n_streams * per_stream frames.

        loader = PooledStreamLoader(urls, per_stream=4, workers=8,
                                    host_resize=True, width=224,
                                    height=224, pixel_format=FourCC.RGB24,
                                    planes_pos=Planes.PLANAR,
                                    normalization=True, loop=True)
        for batch, indices in loader:   # [len(urls)*4, 3, 224, 224]
            serve(batch)

    All streams must share one geometry unless host_resize unifies them.
    Iteration ends when any stream is exhausted (loop=True never ends).
    """

    def __init__(self, stream_urls, per_stream=8, workers=0,
                 host_resize=False, loop=False, buffer_size=None,
                 device_index=0, fast_decode=False, post_fn=None,
                 prefetch=2, **frame_kwargs):
        """`post_fn` (traceable, [global_batch, ...] in / any pytree
        out) fuses into the single batched VPP dispatch — the converted
        frames never round-trip: one tick, one device program
        (serving's pipeline="fused" rides this).

        `prefetch` bounds how many ticks a background drain thread runs
        ahead of the consumer: the fill (blocking per-stream batch gets
        + native host resize into staging) overlaps the consumer's
        device_put + dispatch of earlier ticks, exactly like
        FrameLoader's drain — without it every tick serializes
        decode-wait, resize, transfer and dispatch on one thread."""
        from . import _native
        self._lib = _native.load()
        self.params = FrameParameters(**frame_kwargs)
        self.per_stream = int(per_stream)
        self.host_resize = bool(host_resize)
        self.device_index = device_index
        if self.host_resize:
            self._algo = host_resize_algo(self.params)
        self.pool = self._lib.ts_pool_create(int(workers))
        self.handles = []
        for url in stream_urls:
            idx = self._lib.ts_pool_add_stream(
                self.pool, str(url).encode(),
                int(buffer_size or 4 * self.per_stream),
                1 if loop else 0, 1 if fast_decode else 0)
            if idx < 0:
                self._lib.ts_pool_destroy(self.pool)
                raise RuntimeError(f"cannot open stream {url}")
            handle = self._lib.ts_pool_stream(self.pool, idx)
            # Same consumer contract as a standalone pipeline: cursor
            # registered pre-start so the no-drop window opens at frame 1.
            self._lib.ts_pipeline_register_cursor(handle, b"pool")
            self.handles.append(handle)
        dims = {(self._lib.ts_pipeline_width(h), self._lib.ts_pipeline_height(h))
                for h in self.handles}
        if self.host_resize:
            self._w, self._h = self.params.width, self.params.height
        else:
            if len(dims) != 1:
                self._lib.ts_pool_destroy(self.pool)
                raise ValueError(f"streams disagree on geometry {dims}; "
                                 "use host_resize to unify")
            (self._w, self._h), = dims
        self.n_streams = len(self.handles)
        self.global_batch = self.n_streams * self.per_stream
        size = self.global_batch * self._w * self._h * 3 // 2
        self.prefetch = max(1, int(prefetch))
        # Rotating staging pool + fill thread (started at the end of
        # __init__, once the VPP program exists): same lifecycle as
        # FrameLoader's — one buffer per in-flight tick plus one being
        # filled, recycle blocks on the tick's compute because
        # jax.device_put may alias the numpy bytes on the CPU backend.
        self._pool_bufs = queue.Queue()
        for _ in range(self.prefetch + 2):
            self._pool_bufs.put(np.empty(size, np.uint8))
        self._filled = queue.Queue(maxsize=self.prefetch)
        self._pending = collections.deque()  # (buf, tensors) in flight
        self._stop = threading.Event()
        self._thread = None
        if self._lib.ts_pool_start(self.pool) != 0:
            raise RuntimeError("StreamPool start failed")
        if self.params.color_standard is ColorStandard.AUTO:
            # VUI colorimetry comes from decoded frames; the one shared
            # VPP program needs every stream to agree on it. A stream
            # that never decoded within the deadline is a timeout, not a
            # BT.601 detection — report it as such instead of folding the
            # default into the agreement check.
            deadline = time.monotonic() + 10.0
            detected = set()
            for k, h in enumerate(self.handles):
                std = _wait_detected_standard(self._lib, h, 0, deadline)
                if std is None:
                    self.close()
                    raise RuntimeError(
                        f"color_standard=AUTO: stream {k} decoded no frame "
                        "in time to detect colorimetry from; pass an "
                        "explicit standard")
                detected.add(std)
            if len(detected) != 1:
                self.close()
                raise ValueError(
                    f"streams disagree on colorimetry {sorted(detected)}; "
                    "pass an explicit color_standard")
            self.params.color_standard = ColorStandard(detected.pop())
        if self.host_resize:
            cfg = FrameParameters(
                pixel_format=self.params.pixel_format,
                planes_pos=self.params.planes_pos,
                normalization=self.params.normalization,
                color_standard=self.params.color_standard,
                dtype=self.params.dtype
            ).to_config(self._w, self._h)
        else:
            cfg = self.params.to_config(self._w, self._h)
        self._vpp = build_vpp_batched_flat(cfg, self.global_batch,
                                           device_index, post_fn=post_fn)
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def _drain(self):
        """Fill thread: blocking per-stream batch gets (+ native host
        resize) into a staging buffer from the rotating pool, pushed to
        the bounded `_filled` queue. The ctypes calls release the GIL,
        so this overlaps the consumer's device_put/dispatch. Terminal
        states latch via sentinels: None = a stream drained (ticks must
        stay rectangular), _RENEGOTIATED = mid-stream geometry switch
        on the fixed-geometry path."""
        lib = self._lib
        y_frame = self._w * self._h
        y_total = self.global_batch * y_frame
        first = ctypes.c_int(0)
        while not self._stop.is_set():
            buf = self._pool_bufs.get()
            if buf is None or self._stop.is_set():
                break
            indices = {}
            sentinel = False
            for k, handle in enumerate(self.handles):
                y_off = k * self.per_stream * y_frame
                uv_off = y_total + k * self.per_stream * y_frame // 2
                if self.host_resize:
                    got = lib.ts_pipeline_get_batch_resized(
                        handle, b"pool", self.per_stream, self._w, self._h,
                        self._algo, buf.ctypes.data + y_off,
                        buf.ctypes.data + uv_off, ctypes.byref(first))
                else:
                    got = lib.ts_pipeline_get_batch(
                        handle, b"pool", self.per_stream,
                        buf.ctypes.data + y_off,
                        buf.ctypes.data + uv_off, ctypes.byref(first))
                if got == _native.TS_RENEGOTIATE:
                    self._filled.put(_RENEGOTIATED)
                    return
                if got < self.per_stream:
                    self._filled.put(None)  # a stream drained
                    sentinel = True
                    break
                indices[k] = list(range(first.value, first.value + got))
            if sentinel:
                break
            self._filled.put((buf, indices))

    def __iter__(self):
        return self

    def __next__(self):
        import jax
        if self.pool is None:
            raise StopIteration
        item = self._filled.get()
        if item is None:
            self._filled.put(item)  # latch: repeated next() keeps raising
            raise StopIteration
        if item is _RENEGOTIATED:
            self._filled.put(item)  # latch
            raise RuntimeError(
                "a stream changed resolution mid-stream; use "
                "PooledStreamLoader(host_resize=True) to ride through "
                "switches, or restart the pool for the new geometry")
        buf, indices = item
        device = jax.devices()[self.device_index]
        flat = jax.device_put(buf, device)
        tensors = self._vpp(flat)  # async dispatch
        self._pending.append((buf, tensors))
        if len(self._pending) > self.prefetch:
            old_buf, old_t = self._pending.popleft()
            jax.block_until_ready(old_t)  # staging reuse safety
            self._pool_bufs.put(old_buf)
        return tensors, indices

    def close(self):
        if self.pool is None:
            return
        self._stop.set()
        while self._pending:
            self._pool_bufs.put(self._pending.popleft()[0])
        try:  # unblock a drain waiting for a staging buffer
            self._pool_bufs.put_nowait(None)
        except queue.Full:
            pass
        # Stop (not yet destroy) the native pool: wakes a drain parked
        # inside a blocking get, which then observes _stop and exits.
        self._lib.ts_pool_stop(self.pool)
        try:  # unblock a drain parked on the bounded _filled queue
            self._filled.get_nowait()
        except queue.Empty:
            pass
        if self._thread is not None:
            self._thread.join(timeout=10)
        self._lib.ts_pool_destroy(self.pool)
        self.pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

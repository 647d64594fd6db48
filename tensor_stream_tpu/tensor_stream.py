"""TensorStreamConverter — the user-facing API.

Verbatim re-creation of the reference's Python surface
(reference: tensor_stream/tensor_stream.py:100-341): the same constructor
arguments, the same ``initialize/start/read/param_read/dump/stop/
enable_logs/enable_nvtx/skip_analyze/set_timeout`` methods, the same
``(tensor, index)`` return convention and tensor shape rules — except the
returned tensor is a device-resident ``jax.Array`` instead of a CUDA
``torch.Tensor``.

TPU-native internals: the native ingest runtime (demux + host software
decode + NV12 ring) runs its producer thread in C++; each ``read`` copies
the latest NV12 frame into a per-consumer host buffer and dispatches one
fused, cached XLA program (crop -> resize -> convert -> normalize) that
leaves the result in HBM. Per-consumer buffers replace the reference's
use_count-scavenging tensor GC (WrapperPython.cpp:168-185) — JAX owns the
device memory, so no manual lifetime tracking is needed.
"""
import logging
import threading

import jax
import numpy as np

from . import _native
from .enums import (ColorStandard, FourCC, FrameRate, LogsLevel, LogsType,
                    Planes, ResizeType, StatusLevel, channels_by_fourcc)
from .ops.vpp import VPPConfig, build_vpp, build_vpp_batched_flat


class FrameParameters:
    """Per-read frame parameters (reference: tensor_stream.py:101-149)."""

    def __init__(self,
                 width=0,
                 height=0,
                 crop_coords=(0, 0, 0, 0),
                 resize_type=ResizeType.NEAREST,
                 pixel_format=FourCC.RGB24,
                 planes_pos=Planes.MERGED,
                 normalization=None,
                 color_standard=ColorStandard.BT601,
                 dtype=""):
        self.width = width
        self.height = height
        self.crop_coords = tuple(crop_coords)
        self.resize_type = resize_type
        self.pixel_format = pixel_format
        self.planes_pos = planes_pos
        # None means "library decides": False everywhere except HSV, which
        # forces normalization (reference: VideoProcessor.h:39-52).
        self.normalization = normalization
        # TPU extension: YUV->RGB matrix; BT601 = reference-exact default.
        self.color_standard = color_standard
        # TPU extension: output dtype override ("bfloat16"/"float16"/
        # "float32"); "" keeps the uint8-or-float32 reference contract.
        self.dtype = dtype

    def to_config(self, src_width: int, src_height: int) -> VPPConfig:
        norm = self.normalization
        if norm is None:
            norm = self.pixel_format == FourCC.HSV
        return VPPConfig(src_width=src_width, src_height=src_height,
                         crop=self.crop_coords, width=self.width,
                         height=self.height, resize_type=self.resize_type,
                         fourcc=self.pixel_format, planes=self.planes_pos,
                         normalization=bool(norm),
                         standard=self.color_standard, dtype=self.dtype)

    def __repr__(self):
        return (f"FrameParameters(\n"
                f"    width={self.width},\n"
                f"    height={self.height},\n"
                f"    crop_coords={self.crop_coords},\n"
                f"    resize_type={self.resize_type},\n"
                f"    pixel_format={self.pixel_format},\n"
                f"    planes_pos={self.planes_pos},\n"
                f"    normalization={self.normalization},\n"
                f"    dtype={self.dtype!r}\n"
                ")")


def host_resize_algo(fp: FrameParameters) -> int:
    """Validates `fp` for the native host-resize path and returns the
    HostResizeAlgo value (csrc/vpp_host.h — values mirror ResizeType).
    The single source of truth for both read_batch(host_resize=True) and
    FrameLoader."""
    if not (fp.width and fp.height):
        raise ValueError("host_resize requires width and height")
    if any(fp.crop_coords):
        raise ValueError("host_resize does not support crop")
    rt = (fp.resize_type if isinstance(fp.resize_type, ResizeType)
          else ResizeType(fp.resize_type))
    return rt.value  # all four algorithms have native ports


class TensorStreamConverter:
    """Starts the decode pipeline and serves post-processed frames as
    device-resident jax.Arrays (reference: tensor_stream.py:153-339)."""

    def __init__(self,
                 stream_url,
                 max_consumers=5,
                 cuda_device=None,
                 buffer_size=5,
                 framerate_mode=FrameRate.NATIVE,
                 timeout=None,
                 decode_threads=0,
                 loop=False,
                 enable_dumps=False,
                 fast_decode=False,
                 reconnect=False,
                 reconnect_delay=0.5,
                 reconnect_attempts=20,
                 format_options=None):
        self.log = logging.getLogger(__name__)
        self.log.info("Create TensorStream")
        self._lib = _native.load()
        self._handle = None
        self.thread = None
        ## Frames per second probed from the bitstream (set by initialize()).
        self.fps = None
        ## (width, height) of input frames (set by initialize()).
        self.frame_size = None

        self.stream_url = stream_url
        self.max_consumers = max_consumers
        # `cuda_device` is kept for API compatibility; it selects the index
        # into jax.devices() (the reference selected the CUDA ordinal).
        self.device_index = int(cuda_device) if cuda_device is not None else 0
        self.buffer_size = buffer_size
        self.framerate_mode = framerate_mode
        self.decode_threads = decode_threads
        # TPU extension: replay the stream from the start on EOF.
        self.loop = loop
        # TPU extension: skip the H.264 in-loop deblocking filter for
        # ~23% more decode throughput — NOT bit-exact; for data-loading
        # jobs that trade fidelity for speed.
        self.fast_decode = fast_decode
        # TPU extension (elastic recovery): when a live source dies
        # mid-stream, the producer re-opens the URL with backoff instead
        # of finishing; readers keep blocking and frame numbering
        # continues. reconnect_delay is in seconds between attempts;
        # reconnect_attempts < 0 retries forever. For local files prefer
        # loop= (replay without re-probing).
        self.reconnect = reconnect
        self.reconnect_delay = reconnect_delay
        self.reconnect_attempts = reconnect_attempts
        # TPU extension: extra avformat open options (dict of key ->
        # value strings), e.g. {"rtsp_flags": "listen"} for listen-mode
        # RTSP ingest, "listen_timeout", "probesize". The reference
        # hardcoded its single option (rtsp_transport=tcp,
        # src/Parser.cpp:317-328); that default stays and can be
        # overridden here.
        self.format_options = dict(format_options or {})
        # Debug taps like the reference's enableDumps (WrapperC.h init
        # param): bitstream.h264 from the demuxer + NV12.yuv from the
        # decoder, written in the working directory.
        self.enable_dumps = enable_dumps
        self._buffers = {}  # consumer -> (y, uv) pinned host staging
        self._dumped_consumers = set()  # Processed_ taps written this run
        self._batch_staging = {}  # (consumer, batch) -> flat NV12 staging
        self._retired = []  # stopped handles awaiting safe destruction
        self._started = False
        self.set_timeout(timeout=timeout)
        self._pending_logs = None
        self._pending_trace = False
        self._skip_analyze = False

    # ------------------------------------------------------------ lifecycle

    def initialize(self, repeat_number=1):
        """Builds the native pipeline, retrying up to repeat_number times
        (reference: tensor_stream.py:187-206)."""
        self.log.info("Initialize TensorStream")
        self._reap_retired()
        # Fresh pipeline => fresh Processed_ taps (first write truncates).
        self._dumped_consumers = set()
        status = StatusLevel.REPEAT.value
        repeat = repeat_number
        while status != StatusLevel.OK.value and repeat > 0:
            self._handle = self._lib.ts_pipeline_create()
            for key, value in self.format_options.items():
                self._lib.ts_pipeline_set_format_option(
                    self._handle, str(key).encode(), str(value).encode())
            status_native = self._lib.ts_pipeline_init_ex2(
                self._handle, str(self.stream_url).encode(),
                int(self.max_consumers), int(self.buffer_size),
                int(self.framerate_mode.value
                    if isinstance(self.framerate_mode, FrameRate)
                    else self.framerate_mode),
                1 if self.enable_dumps else 0, int(self.decode_threads),
                1 if self.loop else 0, 1 if self.fast_decode else 0,
                1 if self.reconnect else 0,
                int(self.reconnect_delay * 1000),
                int(self.reconnect_attempts))
            status = (StatusLevel.OK.value if status_native == _native.TS_OK
                      else StatusLevel.ERROR.value)
            if status != StatusLevel.OK.value:
                self.stop()
                repeat -= 1

        if repeat == 0:
            raise RuntimeError("Can't initialize TensorStream")
        if self._pending_logs is not None:
            self._lib.ts_pipeline_enable_logs(self._handle, self._pending_logs)
        if self._pending_trace:
            self._lib.ts_pipeline_enable_trace(self._handle)
        if self._skip_analyze:
            self._lib.ts_pipeline_skip_analyze(self._handle)
        num = self._lib.ts_pipeline_fps_num(self._handle)
        den = self._lib.ts_pipeline_fps_den(self._handle)
        self.fps = num / den if den else None
        self.frame_size = (self._lib.ts_pipeline_width(self._handle),
                           self._lib.ts_pipeline_height(self._handle))

    def seek_frame(self, skip):
        """Positions the stream so the next delivered frame is number
        ``skip + 1`` (frame indexes stay globally consistent: a consumer
        reading after ``seek_frame(100)`` sees index 101). Call between
        initialize() and start(). TPU extension for checkpoint/resume of
        training jobs: container formats keyframe-seek then discard by
        timestamp; raw elementary streams decode-discard by count — both
        exact for constant-frame-rate input (docs/PARITY.md)."""
        if self._handle is None:
            raise RuntimeError("TensorStream is not initialized")
        if self._started:
            raise RuntimeError("seek_frame must be called before start()")
        sts = self._lib.ts_pipeline_seek_frame(self._handle, int(skip))
        if sts != _native.TS_OK:
            raise RuntimeError(f"seek_frame({skip}) failed: {sts}")

    def start(self):
        """Starts the producer (parse -> analyze -> decode) loop.

        The loop runs in a NATIVE thread inside the pipeline (the
        reference ran it on a Python thread holding a released GIL,
        tensor_stream.py:324-331). ``self.thread`` therefore stays None;
        it exists only so code written against the reference that checks
        the attribute keeps working."""
        if self._handle is None:
            raise RuntimeError("TensorStream is not initialized")
        self._lib.ts_pipeline_start(self._handle)
        self._started = True

    def stop(self):
        self.log.info("Stop TensorStream")
        if self._handle is not None:
            self._lib.ts_pipeline_stop(self._handle)
            # Defer destruction: another thread may still be unwinding a
            # native call on this handle (stop() makes those calls return
            # TS_FINISHED promptly, but freeing the object from under
            # them is a use-after-free — observed as a segfault when a
            # consumer thread raced stop()). Retired handles are
            # destroyed on the next initialize() or in __del__, when no
            # concurrent caller can still hold them.
            self._retired.append(self._handle)
            self._handle = None
        self._started = False
        if self.thread is not None:
            self.thread.join()
            self.thread = None
        self._buffers.clear()
        self._batch_staging.clear()

    # ---------------------------------------------------------------- config

    def enable_logs(self, level, log_type):
        """Positive level -> file logs.txt, negative -> console
        (reference: tensor_stream.py:211-216)."""
        if level == LogsLevel.NONE:
            return
        value = level.value if log_type == LogsType.FILE else -level.value
        self._pending_logs = value
        if self._handle is not None:
            self._lib.ts_pipeline_enable_logs(self._handle, value)

    def enable_nvtx(self):
        """Host tracing equivalent of the reference's NVTX switch: spans go
        to trace_host.json (chrome://tracing); device-side timelines come
        from jax.profiler."""
        self._pending_trace = True
        if self._handle is not None:
            self._lib.ts_pipeline_enable_trace(self._handle)

    def set_timeout(self, timeout):
        """Read timeout in seconds; None disables. Process-global, exactly
        like the reference's timeoutFrame (tensor_stream.py:224-229)."""
        if timeout is None:
            self._lib.ts_set_timeout_ms(-1)
        else:
            self._lib.ts_set_timeout_ms(int(timeout * 1000))

    def _reap_retired(self):
        for h in self._retired:
            self._lib.ts_pipeline_destroy(h)
        self._retired = []

    def __del__(self):
        try:
            if self._handle is not None:
                self._lib.ts_pipeline_stop(self._handle)
                self._lib.ts_pipeline_destroy(self._handle)
                self._handle = None
            self._reap_retired()
        except Exception:
            pass

    def skip_analyze(self):
        self._skip_analyze = True
        if self._handle is not None:
            self._lib.ts_pipeline_skip_analyze(self._handle)

    @property
    def stream_errors(self):
        """Accumulated bitstream-health bitmask from the analyzer
        (B_POC=1 | FRAME_NUM=2; reference logs these, we also expose them)."""
        if self._handle is None:
            return 0
        return self._lib.ts_pipeline_analyze_errors(self._handle)

    @property
    def reconnects(self):
        """Successful live-source reconnects since start() (see the
        reconnect= constructor option)."""
        if self._handle is None:
            return 0
        return self._lib.ts_pipeline_reconnect_count(self._handle)

    # ----------------------------------------------------------------- read

    # Staging rotation depth: reads can run this many frames ahead of the
    # device before the host blocks. Reusing a staging slot is only safe
    # after the COMPUTE that consumed it finished — jax.device_put may
    # alias the numpy buffer outright on the CPU backend (zero-copy), so
    # blocking on the transfer alone does not protect the bytes.
    _STAGING_DEPTH = 4

    def _resolve_standard(self, cfg):
        """Replaces ColorStandard.AUTO with the colorimetry detected from
        the stream's decoded frames (safe at every call site: a frame has
        always been read before the VPP config is built)."""
        if cfg.standard is not ColorStandard.AUTO:
            return cfg
        import dataclasses
        handle = self._handle
        detected = (self._lib.ts_pipeline_detected_standard(handle)
                    if handle is not None else 0)
        return dataclasses.replace(cfg, standard=ColorStandard(detected))

    def _consumer_buffers(self, name, dims=None):
        """Staging for `name`, sized for the geometry that consumer has
        acknowledged (per-consumer: after a mid-stream resolution switch
        consumers renegotiate independently, so one consumer's new
        geometry must not resize another's buffers)."""
        st = self._buffers.get(name)
        if dims is None:
            dims = st["dims"] if st is not None else self.frame_size
        w, h = dims
        if st is None or st["dims"] != (w, h):
            st = {"dims": (w, h),
                  "bufs": [(np.empty((h, w), np.uint8),
                            np.empty((h // 2, w), np.uint8))
                           for _ in range(self._STAGING_DEPTH)],
                  "inflight": [None] * self._STAGING_DEPTH,
                  "slot": 0}
            self._buffers[name] = st
        slot = st["slot"]
        prev = st["inflight"][slot]
        if prev is not None:
            import jax
            jax.block_until_ready(prev)
            st["inflight"][slot] = None
        return st["bufs"][slot]

    def _mark_inflight(self, name, tensor):
        """Records the tensor consuming the current staging slot and
        rotates to the next slot. Tolerates the state vanishing under a
        concurrent stop() (which clears the staging caches)."""
        st = self._buffers.get(name)
        if st is None:
            return
        st["inflight"][st["slot"]] = tensor
        st["slot"] = (st["slot"] + 1) % self._STAGING_DEPTH

    def _get_nv12(self, name, delay):
        # Snapshot the handle: a concurrent stop() nulls self._handle
        # between the check and the native call (the object behind a
        # captured handle stays alive — stop() only retires it, see
        # _reap_retired — and a stopped pipeline returns TS_FINISHED).
        handle = self._handle
        if handle is None or self.frame_size is None:
            raise RuntimeError("TensorStream is not initialized")
        if not self._started:
            raise RuntimeError("TensorStream is not started")
        import ctypes
        y, uv = self._consumer_buffers(name)
        for _ in range(4):
            index = self._lib.ts_pipeline_get(handle, name.encode(),
                                              int(delay), y.ctypes.data,
                                              uv.ctypes.data)
            if index != _native.TS_RENEGOTIATE:
                break
            # Mid-stream resolution switch (adaptive source): adopt the
            # new geometry and retry with right-sized buffers. Downstream
            # shapes follow the staging arrays, so the caller sees the
            # new size transparently.
            w = ctypes.c_int(0)
            h = ctypes.c_int(0)
            self._lib.ts_pipeline_ack_renegotiate(handle, name.encode(),
                                                  ctypes.byref(w),
                                                  ctypes.byref(h))
            self.frame_size = (self._lib.ts_pipeline_width(handle),
                               self._lib.ts_pipeline_height(handle))
            y, uv = self._consumer_buffers(name, (w.value, h.value))
        if index == _native.TS_FINISHED:
            raise RuntimeError("Decoding finished")
        if index < 0:
            raise RuntimeError(f"TensorStream error: {index}")
        return y, uv, index

    def read(self,
             name="default",
             width=0,
             height=0,
             resize_type=ResizeType.NEAREST,
             crop_coords=(0, 0, 0, 0),
             pixel_format=FourCC.RGB24,
             planes_pos=Planes.MERGED,
             normalization=None,
             delay=0,
             return_index=False,
             color_standard=ColorStandard.BT601,
             dtype=""):
        """Reads the next decoded frame as a jax.Array
        (reference: tensor_stream.py:248-273)."""
        frame_parameters = FrameParameters(
            width=width, height=height, crop_coords=crop_coords,
            resize_type=resize_type, pixel_format=pixel_format,
            planes_pos=planes_pos, normalization=normalization,
            color_standard=color_standard, dtype=dtype)
        return self.param_read(frame_parameters, name=name, delay=delay,
                               return_index=return_index)

    def param_read(self,
                   frame_parameters: FrameParameters,
                   name="default",
                   delay=0,
                   return_index=False):
        y, uv, index = self._get_nv12(name, delay)
        # Source dims from the staging arrays themselves: after a
        # mid-stream resolution switch they carry this consumer's
        # acknowledged geometry (self.frame_size may already be ahead).
        h, w = y.shape
        cfg = self._resolve_standard(frame_parameters.to_config(w, h))
        # Explicit device_put: the PJRT argument-donation path for numpy
        # args is several times slower than a direct H2D copy here.
        dy, duv = self._device_put(y, uv)
        tensor = build_vpp(cfg, self.device_index)(dy, duv)
        if self.enable_dumps:
            # Per-consumer processed-output tap, like the reference's VPP
            # debug dump (reference: VideoProcessor.cpp:152-163 appends
            # the converted buffer to Processed_<consumer>.yuv). The first
            # write after initialize() truncates, matching the C-side taps
            # (NV12.yuv/bitstream.h264) so a re-run never carries a stale
            # prefix from a previous pipeline in the same directory.
            mode = "ab" if name in self._dumped_consumers else "wb"
            self._dumped_consumers.add(name)
            with open(f"Processed_{name}.yuv", mode) as f:
                f.write(np.asarray(tensor).tobytes())
        # The dispatch stays fully asynchronous; _consumer_buffers blocks
        # on this tensor before the staging slot it used is overwritten
        # (_STAGING_DEPTH reads later).
        self._mark_inflight(name, tensor)
        if return_index:
            return tensor, index
        return tensor

    def _device_put(self, *arrays):
        import jax
        device = jax.devices()[self.device_index]
        return tuple(jax.device_put(a, device) for a in arrays)

    def read_batch(self,
                   batch,
                   name="default",
                   host_resize=False,
                   **kwargs):
        """TPU extension: reads `batch` *consecutive* frames (no-drop
        cursor semantics with producer back-pressure, unlike read()'s
        latest-frame contract) and converts them in ONE device dispatch,
        returning a leading-batch jax.Array (and the first frame's index).
        Amortizes host->HBM transfer and dispatch overhead — the main
        throughput lever on TPU. Raises "Decoding finished" once the
        stream is fully drained.

        host_resize=True applies the requested resize (all four algorithms) on
        the host (bit-exact native port of the device math, csrc/
        vpp_host.cpp) *before* the host->device transfer, shrinking the
        shipped bytes by the resize factor — the right trade when the
        device link, not the host CPU, is the bottleneck (a 1080p->224px
        pipeline ships 41x less). Convert/normalize still run on device."""
        import ctypes
        handle = self._handle  # snapshot vs concurrent stop(), see _get_nv12
        if handle is None or self.frame_size is None:
            raise RuntimeError("TensorStream is not initialized")
        if not self._started:
            raise RuntimeError("TensorStream is not started")
        return_index = kwargs.pop("return_index", False)
        frame_parameters = FrameParameters(**kwargs)
        if host_resize:
            return self._read_batch_host_resized(
                batch, name, frame_parameters, return_index)
        # Source dims for THIS consumer's cursor (equals frame_size until
        # a mid-stream resolution switch; then the acknowledged geometry
        # while pre-switch frames drain).
        cw = ctypes.c_int(0)
        ch = ctypes.c_int(0)
        self._lib.ts_pipeline_consumer_dims(handle, name.encode(),
                                            ctypes.byref(cw), ctypes.byref(ch))
        w, h = cw.value, ch.value
        # Persistent flat staging: all Y planes then all UV planes. The
        # native drain writes straight into it and it ships to HBM as ONE
        # transfer — allocation and per-plane transfer overhead dominate
        # the consumer side otherwise (measured 56 -> ~200 fps at 1080p).
        key = (name, int(batch))
        for _ in range(4):
            staging = self._batch_staging_slot(key, batch * h * w * 3 // 2)
            y_size = batch * h * w
            first = ctypes.c_int(0)
            got = self._lib.ts_pipeline_get_batch(
                handle, name.encode(), int(batch), staging.ctypes.data,
                staging.ctypes.data + y_size, ctypes.byref(first))
            if got != _native.TS_RENEGOTIATE:
                break
            # Geometry switch at the cursor: adopt it (batches keep one
            # geometry each; the boundary batch was already cut short).
            self._lib.ts_pipeline_ack_renegotiate(handle, name.encode(),
                                                  ctypes.byref(cw),
                                                  ctypes.byref(ch))
            w, h = cw.value, ch.value
        if got == _native.TS_RENEGOTIATE:
            raise RuntimeError(
                "stream geometry did not settle after renegotiation retries")
        if got <= 0:
            raise RuntimeError("Decoding finished")
        indices = list(range(first.value, first.value + got))
        cfg = self._resolve_standard(frame_parameters.to_config(w, h))
        (flat,) = self._device_put(staging)
        tensors = build_vpp_batched_flat(cfg, int(batch),
                                         self.device_index)(flat)
        self._batch_mark_inflight(key, tensors)
        if got < batch:
            # Partial final batch: the unfilled rows were converted from
            # stale buffer contents; slice them off on device (cheaper
            # than recompiling the VPP for a new batch shape).
            tensors = tensors[:got]
        if return_index:
            return tensors, indices
        return tensors

    def _read_batch_host_resized(self, batch, name, frame_parameters,
                                 return_index):
        import ctypes
        fp = frame_parameters
        dst_w, dst_h = fp.width, fp.height
        algo = host_resize_algo(fp)
        key = (name, int(batch), dst_w, dst_h)
        staging = self._batch_staging_slot(key, batch * dst_w * dst_h * 3 // 2)
        y_size = batch * dst_w * dst_h
        first = ctypes.c_int(0)
        handle = self._handle  # snapshot vs concurrent stop()
        if handle is None:
            raise RuntimeError("TensorStream is not initialized")
        got = self._lib.ts_pipeline_get_batch_resized(
            handle, name.encode(), int(batch), dst_w, dst_h, algo,
            staging.ctypes.data, staging.ctypes.data + y_size,
            ctypes.byref(first))
        if got <= 0:
            raise RuntimeError("Decoding finished")
        indices = list(range(first.value, first.value + got))
        # The frames arrive already at target size: the device VPP config
        # sees them as native-sized input with no resize stage.
        cfg = self._resolve_standard(FrameParameters(
            width=0, height=0, pixel_format=fp.pixel_format,
            planes_pos=fp.planes_pos,
            normalization=fp.normalization,
            color_standard=fp.color_standard,
            dtype=fp.dtype).to_config(dst_w, dst_h))
        (flat,) = self._device_put(staging)
        tensors = build_vpp_batched_flat(cfg, int(batch),
                                         self.device_index)(flat)
        self._batch_mark_inflight(key, tensors)
        if got < batch:
            tensors = tensors[:got]
        if return_index:
            return tensors, indices
        return tensors

    def _batch_staging_slot(self, key, size):
        """Double-buffered flat staging per (consumer, batch) key: the
        native drain may fill one buffer while the previous batch's VPP
        still reads the other (device_put can alias the numpy memory on
        the CPU backend, so a slot is reused only after the batch that
        consumed it finished computing)."""
        st = self._batch_staging.get(key)
        if st is None or st["bufs"][0].size != size:
            st = {"bufs": [np.empty(size, np.uint8) for _ in range(2)],
                  "inflight": [None, None], "slot": 0}
            self._batch_staging[key] = st
        slot = st["slot"]
        if st["inflight"][slot] is not None:
            import jax
            jax.block_until_ready(st["inflight"][slot])
            st["inflight"][slot] = None
        return st["bufs"][slot]

    def _batch_mark_inflight(self, key, tensors):
        st = self._batch_staging.get(key)  # may vanish under stop()
        if st is None:
            return
        st["inflight"][st["slot"]] = tensors
        st["slot"] = (st["slot"] + 1) % 2

    # ----------------------------------------------------------------- dump

    def dump(self,
             tensor,
             name="default",
             width=0,
             height=0,
             crop_coords=(0, 0, 0, 0),
             resize_type=ResizeType.NEAREST,
             pixel_format=FourCC.RGB24,
             planes_pos=Planes.MERGED,
             normalization=None):
        """Appends the raw tensor bytes to <name>.yuv, byte-identical to
        the reference's D2H dump (reference: WrapperPython.cpp:421-456 +
        VideoProcessor.cpp:28-72). Width/height are inferred from the
        tensor shape when not given."""
        arr = np.asarray(tensor)
        channels = channels_by_fourcc(pixel_format)
        if not width:
            width = arr.shape[1] if channels == 3 else arr.shape[2]
        if not height:
            height = (arr.shape[0] if channels == 3
                      else int(arr.shape[1] / channels))
        count = int(width * height * channels)
        with open(f"{name}.yuv", "ab") as f:
            f.write(arr.reshape(-1)[:count].tobytes())

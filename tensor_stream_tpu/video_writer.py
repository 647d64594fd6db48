"""In-process encoded video writer (the write side of the pipeline).

The reference's styled-video example piped raw RGB into an external
ffmpeg process with h264_nvenc
(reference: python_examples/fast_neural_style/ffmpeg_video_writer.py:5-69);
the TPU-native runtime encodes in-process through libavcodec
(csrc/video_writer.cpp) — no subprocess, no GPU encoder dependency:

    with VideoWriter("out.mp4", (640, 360), fps=30) as wr:
        for tensors, _ in loader:
            wr.write(styled(tensors))     # HxWx3 uint8 RGB frames

Container format follows the path extension (mp4/mkv/flv/...); codec
defaults to libx264.
"""
from fractions import Fraction

import numpy as np

from . import _native


class VideoWriter:
    def __init__(self, path, size, fps=30, codec="libx264",
                 bitrate=2_000_000):
        self._lib = _native.load()
        self._handle = None
        w, h = int(size[0]), int(size[1])
        self.size = (w, h)
        fr = Fraction(fps).limit_denominator(100000)
        handle = self._lib.ts_writer_create(
            str(path).encode(), w, h, fr.numerator, fr.denominator,
            codec.encode(), int(bitrate))
        if not handle:
            raise RuntimeError(
                f"cannot open video writer for {path} ({w}x{h}, {codec}); "
                "dimensions must be even and the container/codec supported")
        self._handle = handle

    def write(self, frame):
        """Encodes one RGB24 frame (H x W x 3, uint8; jax or numpy)."""
        arr = np.ascontiguousarray(np.asarray(frame), dtype=np.uint8)
        if arr.shape != (self.size[1], self.size[0], 3):
            raise ValueError(
                f"frame shape {arr.shape} != {(self.size[1], self.size[0], 3)}")
        rc = self._lib.ts_writer_write_rgb(self._handle, arr.ctypes.data)
        if rc != 0:
            raise RuntimeError(f"encode failed: {rc}")

    def write_nv12(self, y, uv):
        """Encodes one tightly-packed NV12 frame (no RGB round trip)."""
        w, h = self.size
        ya = np.ascontiguousarray(np.asarray(y), dtype=np.uint8)
        uva = np.ascontiguousarray(np.asarray(uv), dtype=np.uint8)
        if ya.size != w * h or uva.size != w * h // 2:
            raise ValueError(
                f"NV12 planes for {w}x{h} need {w*h}/{w*h//2} bytes, got "
                f"{ya.size}/{uva.size}")
        rc = self._lib.ts_writer_write_nv12(self._handle, ya.ctypes.data,
                                            uva.ctypes.data)
        if rc != 0:
            raise RuntimeError(f"encode failed: {rc}")

    @property
    def frames_written(self):
        return int(self._lib.ts_writer_frames(self._handle))

    def close(self):
        if self._handle is not None:
            self._lib.ts_writer_close(self._handle)
            self._lib.ts_writer_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        self.close()

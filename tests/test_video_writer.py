"""In-process video writer (csrc/video_writer.cpp + VideoWriter):
read -> process -> ENCODE closes the loop the reference ran through an
external ffmpeg subprocess (ffmpeg_video_writer.py:5-69). Round-trips
use our own ingest pipeline as the decoder oracle."""
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import RESOURCES
from tensor_stream_tpu import (FourCC, FrameRate, TensorStreamConverter,
                               VideoWriter)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _decode_all(path, rgb=True):
    """No-drop decode via the bulk cursor (latest-frame reads can lose
    the reordered EOF tail); returns RGB24 HxWx3 or NV12 flat frames."""
    import ctypes

    from tensor_stream_tpu import _native
    lib = _native.load()
    p = lib.ts_pipeline_create()
    assert lib.ts_pipeline_init_ex(p, path.encode(), 5, 32, 3, 0, 1, 0,
                                   0) == 0
    lib.ts_pipeline_register_cursor(p, b"t")
    lib.ts_pipeline_start(p)
    w, h = lib.ts_pipeline_width(p), lib.ts_pipeline_height(p)
    frames = []
    y = np.empty((h, w), np.uint8)
    uv = np.empty((h // 2, w), np.uint8)
    first = ctypes.c_int(0)
    while True:
        got = lib.ts_pipeline_get_batch(p, b"t", 1, y.ctypes.data,
                                        uv.ctypes.data, ctypes.byref(first))
        if got <= 0:
            break
        if rgb:
            out = np.empty(h * w * 3, np.uint8)
            assert lib.ts_vpp_convert_host(
                y.ctypes.data, uv.ctypes.data, w, h, 0, 0, 0, 0, 0, 0, 0,
                FourCC.RGB24.value, 1, 0, 0, out.ctypes.data) == 0  # merged
            frames.append(out.reshape(h, w, 3))
        else:
            frames.append((y.copy(), uv.copy()))
    lib.ts_pipeline_stop(p)
    lib.ts_pipeline_destroy(p)
    return frames


def test_rgb_roundtrip_mp4(tmp_path):
    """Synthetic RGB frames -> mp4 -> decode with our own pipeline:
    geometry, frame count, and content survive (lossy encode: gradients
    within a loose tolerance)."""
    path = str(tmp_path / "out.mp4")
    w, h, n = 320, 240, 20
    frames = []
    for k in range(n):
        col = np.linspace(0, 255, w, dtype=np.uint8)
        frame = np.zeros((h, w, 3), np.uint8)
        frame[..., 0] = col[None, :]
        frame[..., 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
        frame[..., 2] = (k * 12) % 256
        frames.append(frame)
    with VideoWriter(path, (w, h), fps=25) as wr:
        for f in frames:
            wr.write(f)
        assert wr.frames_written == n
    decoded = _decode_all(path)
    assert len(decoded) == n
    assert decoded[0].shape == (h, w, 3)
    for k in (0, n // 2, n - 1):
        err = np.abs(decoded[k].astype(int) - frames[k].astype(int)).mean()
        assert err < 12, f"frame {k}: mean abs err {err}"


def test_nv12_passthrough_roundtrip(tmp_path):
    """Decode a fixture, re-encode its NV12 frames directly (no RGB
    round trip), decode again: counts + geometry + near-identical Y."""
    src = os.path.join(RESOURCES, "bbb_1080x608_420_10.h264")
    if not os.path.exists(src):
        pytest.skip("bbb fixture not available")
    path = str(tmp_path / "re.mkv")
    originals = _decode_all(src, rgb=False)
    assert len(originals) == 10
    with VideoWriter(path, (1080, 608), fps=30) as wr:
        for y, uv in originals:
            wr.write_nv12(y, uv)
    redecoded = _decode_all(path, rgb=False)
    assert len(redecoded) == 10
    y0 = originals[0][0].astype(int)
    y1 = redecoded[0][0].astype(int)
    assert np.abs(y0 - y1).mean() < 4


def test_writer_rejects_bad_params(tmp_path):
    with pytest.raises(RuntimeError):
        VideoWriter(str(tmp_path / "x.mp4"), (321, 240))  # odd width
    with pytest.raises(RuntimeError):
        VideoWriter(str(tmp_path / "x.mp4"), (320, 240), codec="nope")
    wr = VideoWriter(str(tmp_path / "ok.mp4"), (320, 240))
    with pytest.raises(ValueError):
        wr.write(np.zeros((240, 100, 3), np.uint8))
    wr.close()


@pytest.mark.slow
def test_neural_style_end_to_end(tmp_path):
    """One command from fixture to playable styled clip: the example
    styles frames with random weights and writes a decodable mp4 of the
    requested geometry (reference scenario: fast_neural_style pipeline,
    read->infer->encode)."""
    src = os.path.join(RESOURCES, "bbb_1080x608_420_10.h264")
    if not os.path.exists(src):
        pytest.skip("bbb fixture not available")
    out = str(tmp_path / "styled.mp4")
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "python_examples", "fast_neural_style",
                      "neural_style.py"),
         "-i", src, "-o", out, "-w", "192", "-h", "160", "--fps", "25"],
        capture_output=True, text=True, timeout=540, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    decoded = _decode_all(out)
    assert len(decoded) == 10
    assert decoded[0].shape == (160, 192, 3)

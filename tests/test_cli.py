"""Spawned-CLI tests, mirroring the reference's PythonTests fixture
(reference: tests/src/PythonTests.cpp:41-99 runs python_examples/simple.py
with an argument matrix and CRC-checks the dumped raster).

The CLI dump must be byte-identical to the same conversion through the
library API — the strongest equivalence the reference's per-platform CRC
constants were standing in for.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import resource

from tensor_stream_tpu import (FourCC, FrameRate, Planes, ResizeType,
                               TensorStreamConverter)
from tensor_stream_tpu.utils.crc import av_crc32

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIMPLE = os.path.join(REPO, "python_examples", "simple.py")


def run_simple(tmp_path, *extra):
    out = tmp_path / "cli_dump"
    cmd = [sys.executable, SIMPLE, "-i", resource(FIXTURE), "-n", "4",
           "-o", str(out), "--framerate_mode", "BLOCKING", *extra]
    # Run the child on the SAME backend as this process: conftest's env
    # mutation (JAX_PLATFORMS=cpu) is inherited by subprocesses and would
    # otherwise put the child on true CPU while the parent sits on TPU —
    # different backends contract the float math differently, so their
    # u8 outputs legitimately differ by +-1 on truncation-boundary pixels
    # (docs/PARITY.md), which is not what this test is about.
    import jax
    env = dict(os.environ)
    if jax.default_backend() != "cpu":
        env.pop("JAX_PLATFORMS", None)
        stashed = env.pop("TS_STASHED_POOL_IPS", None)
        if stashed:
            env["PALLAS_AXON_POOL_IPS"] = stashed
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=560,
                          env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return np.fromfile(f"{out}.yuv", np.uint8)


FIXTURE = "bbb_720x480_RGB24_250.h264"


@pytest.mark.parametrize("args,pixels_per_frame", [
    (("-fc", "RGB24", "-w", "320", "-h", "240"), 320 * 240 * 3),
    (("-fc", "BGR24", "-w", "320", "-h", "240", "--planes", "PLANAR",
      "--resize_type", "BILINEAR"), 320 * 240 * 3),
    (("-fc", "Y800", "-w", "160", "-h", "120"), 160 * 120),
])
@pytest.mark.slow
def test_cli_dump_matches_library_path(tmp_path, args, pixels_per_frame):
    data = run_simple(tmp_path, *args)
    assert data.size == 4 * pixels_per_frame

    # Re-produce the same bytes through the library directly.
    reader = TensorStreamConverter(resource(FIXTURE),
                                   framerate_mode=FrameRate.BLOCKING)
    reader.initialize(repeat_number=3)
    reader.start()
    opt = {args[i].lstrip("-"): args[i + 1] for i in range(0, len(args), 2)}
    frames = []
    for _ in range(4):
        t = reader.read(name="default",
                        pixel_format=FourCC[opt["fc"]],
                        width=int(opt["w"]), height=int(opt["h"]),
                        resize_type=ResizeType[opt.get("resize_type",
                                                       "NEAREST")],
                        planes_pos=Planes[opt.get("planes", "MERGED")])
        frames.append(np.asarray(t).reshape(-1))
    reader.stop()
    lib_bytes = np.concatenate(frames)[:data.size]
    assert av_crc32(data) == av_crc32(lib_bytes)
    assert np.array_equal(data, lib_bytes)


@pytest.mark.parametrize("mode", ["NATIVE", "NATIVE_SIMPLE",
                                  "NATIVE_LOW_DELAY", "FAST", "BLOCKING"])
def test_cli_framerate_mode_smoke(tmp_path, mode):
    """Every FrameRateMode is accepted end-to-end through the CLI and
    produces a well-formed dump (reference: PythonTests.cpp:247-287; the
    byte-level CRC equivalence is pinned by the BLOCKING matrix above —
    unpaced modes drop frames nondeterministically on a 1-core host)."""
    out = tmp_path / f"mode_{mode}"
    cmd = [sys.executable, SIMPLE, "-i", resource(FIXTURE), "-n", "3",
           "-o", str(out), "-fc", "Y800", "-w", "96", "-h", "64",
           "--framerate_mode", mode]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stderr[-2000:]
    data = np.fromfile(f"{out}.yuv", np.uint8)
    if mode == "FAST":
        # Unpaced: the 250-frame file can drain before the consumer's
        # 3rd read on a slow host; whole frames only, at least one.
        assert data.size % (96 * 64) == 0 and data.size > 0
    else:
        assert data.size == 96 * 64 * 3


EXAMPLES = os.path.join(REPO, "python_examples")


def _run_example(script, *args, timeout=300):
    proc = subprocess.run([sys.executable, os.path.join(EXAMPLES, script),
                           *args], capture_output=True, text=True,
                          timeout=timeout)
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-2000:])
    return proc.stdout


@pytest.mark.slow
def test_example_many_consumers():
    """python_examples/many_consumers.py runs end-to-end (reference:
    python_examples/many_consumers.py — 2 readers, one stream)."""
    out = _run_example("many_consumers.py", "-i", resource(FIXTURE),
                       "-n", "3")
    assert "read 3 frames" in out


@pytest.mark.slow
def test_example_different_streams():
    """python_examples/different_streams.py: two independent instances."""
    out = _run_example("different_streams.py",
                       "-i1", resource(FIXTURE),
                       "-i2", resource("bbb_1080x608_420_10.h264"),
                       "-n", "3")
    assert out.strip()


@pytest.mark.slow
def test_example_multi_stream_inference():
    """python_examples/multi_stream_inference.py: batched multi-stream
    loader feeding a model."""
    out = _run_example("multi_stream_inference.py",
                       "-i", resource(FIXTURE),
                       resource("bbb_1080x608_420_10.h264"),
                       "-n", "2", "--per-stream", "2")
    assert out.strip()


@pytest.mark.slow
def test_example_train_sharded(tmp_path):
    """fast_neural_style/train_sharded.py: raw NV12 batches feeding the
    full SPMD training step (sharded VPP + TransformerNet + adam) over
    the mesh (virtual 8-device CPU mesh under the test env)."""
    ckpt = tmp_path / "style.msgpack"
    out = _run_example(os.path.join("fast_neural_style", "train_sharded.py"),
                       "-i", resource(FIXTURE), "--steps", "2",
                       "--batch", "8", "--size", "64",
                       "--checkpoint", str(ckpt), timeout=560)
    assert "training done" in out
    assert "mesh=" in out
    assert ckpt.exists() and ckpt.stat().st_size > 0


@pytest.mark.slow
def test_example_adaptive_source():
    """python_examples/adaptive_source.py (TPU extension): shape-following
    reads across the resolution switch, then fixed-geometry batches."""
    out = _run_example("adaptive_source.py", "-n", "24")
    assert "shape -> (240, 320, 3)" in out
    assert "shape -> (360, 480, 3)" in out
    out = _run_example("adaptive_source.py", "-n", "24", "--batch")
    assert "read 24 frames at fixed geometry" in out


@pytest.mark.slow
def test_example_video_classifier():
    """python_examples/video_classifier.py: ClipLoader [B,T,H,W,C]
    batches feeding the arrow-of-time 3D CNN train step (bf16 compute),
    epoch rollover included (6 steps > 5 batches/epoch here)."""
    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "bbb_720x480_RGB24_250.h264")
    out = _run_example("video_classifier.py", "-i", fix,
                       "--steps", "6", "--batch", "12", "--clip-len", "4",
                       "--size", "64", "--workers", "2", timeout=560)
    assert "training done: 6 steps" in out
    assert "loss" in out
    # Several -i files switch the input to a globally-shuffled
    # ClipDataset over the corpus (mixed resolutions via host resize).
    fix2 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "synthetic_640x360_120.h265")
    out = _run_example("video_classifier.py", "-i", fix, fix2,
                       "--steps", "2", "--batch", "8", "--clip-len", "4",
                       "--size", "64", "--workers", "2", "--augment",
                       timeout=560)
    assert "2 file(s)" in out and "training done: 2 steps" in out


@pytest.mark.slow
def test_example_offline_dataset(tmp_path):
    """python_examples/offline_dataset.py: segment-parallel decode ->
    batched TPU steps -> resume token -> encoded preview clip (the
    data-engineering composition of the round-3 surfaces)."""
    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "bbb_720x480_RGB24_250.h264")
    preview = tmp_path / "preview.mp4"
    out = _run_example("offline_dataset.py",
                       "-i", fix, "--workers", "2",
                       "--preview", str(preview),
                       "--preview-frames", "10", timeout=560)
    assert "processed 250 frames" in out
    assert "--resume-from 251" in out
    assert preview.exists() and preview.stat().st_size > 0

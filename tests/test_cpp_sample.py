"""Compiles and runs the C++ consumer sample against the native runtime
(the counterpart of the reference's c_examples build, WrapperTests-style
end-to-end: reference c_examples/src/Sample.cpp). Pins the C++ twin's
full chain — demux → decode → host VPP (bilinear resize + RGB24) → dump —
to the reference's committed CRC oracle for that exact conversion
(PythonTests.cpp:196: RGB24 bilinear 480x360 of bbb frame 1)."""
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from conftest import RESOURCES
from tensor_stream_tpu import _native
from tensor_stream_tpu.utils.crc import av_crc32

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def sample_binary(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    _native.load()  # ensures csrc/libtsingest.so is built and current
    out = tmp_path_factory.mktemp("cpp") / "sample"
    csrc = os.path.join(REPO, "csrc")
    cmd = ["g++", "-O2", "-std=c++20", "-pthread",
           os.path.join(REPO, "c_examples", "src", "sample.cpp"),
           "-L", csrc, "-ltsingest", f"-Wl,-rpath,{csrc}",
           "-lavformat", "-lavcodec", "-lavutil", "-lswscale",
           "-o", str(out)]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return str(out)


def test_cpp_sample_dump_hits_reference_crc(sample_binary, tmp_path):
    bbb = os.path.join(RESOURCES, "bbb_1080x608_420_10.h264")
    if not os.path.exists(bbb):
        pytest.skip("bbb fixture not available")
    proc = subprocess.run(
        [sample_binary, bbb, "3", str(tmp_path / "dump"), "RGB24",
         "480", "360"],
        capture_output=True, text=True, timeout=120, cwd=tmp_path)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "stream: 1080x608" in proc.stdout
    data = np.fromfile(str(tmp_path / "dump.yuv"), np.uint8)
    frame_bytes = 480 * 360 * 3
    assert data.size % frame_bytes == 0 and data.size > 0
    # Frame 1's conversion matches the reference CLI dump CRC
    # (reference: tests/src/PythonTests.cpp:196-205, bilinear 480x360).
    assert av_crc32(data[:frame_bytes]) == 1166179972


def test_cpp_sample_float_fourcc(sample_binary, tmp_path):
    """HSV (float-only output) must dispatch getFrame<float>."""
    bbb = os.path.join(RESOURCES, "bbb_1080x608_420_10.h264")
    if not os.path.exists(bbb):
        pytest.skip("bbb fixture not available")
    proc = subprocess.run(
        [sample_binary, bbb, "1", str(tmp_path / "hsv"), "HSV",
         "160", "96"],
        capture_output=True, text=True, timeout=120, cwd=tmp_path)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "floats" in proc.stdout
    hsv = np.fromfile(str(tmp_path / "hsv.yuv"), np.float32)
    assert hsv.size == 160 * 96 * 3
    assert 0.0 <= hsv.min() and hsv.max() <= 1.0

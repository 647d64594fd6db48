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


@pytest.mark.slow
def test_cmake_package_export(tmp_path):
    """Out-of-tree consumers: install the tsingest package to a prefix,
    then build a standalone C++ program against it with nothing but
    find_package(tsingest) (reference installed a hand-written
    find-module, cmake/TensorStreamConfig.cmake:1)."""
    if shutil.which("cmake") is None:
        pytest.skip("cmake not available")
    build = tmp_path / "build"
    prefix = tmp_path / "prefix"
    env = dict(os.environ, MAKEFLAGS="")
    run = lambda cmd, **kw: subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, env=env, **kw)
    p = run(["cmake", "-S", REPO, "-B", str(build),
             f"-DCMAKE_INSTALL_PREFIX={prefix}"])
    assert p.returncode == 0, p.stderr[-2000:]
    p = run(["cmake", "--build", str(build), "--target", "tsingest", "-j2"])
    assert p.returncode == 0, p.stderr[-2000:]
    p = run(["cmake", "--install", str(build)])
    assert p.returncode == 0, p.stderr[-2000:]
    assert (prefix / "lib" / "cmake" / "tsingest" /
            "tsingestConfig.cmake").exists()

    consumer = tmp_path / "consumer"
    consumer.mkdir()
    (consumer / "main.cpp").write_text(
        '#include "tensor_stream.h"\n'
        '#include <cstdio>\n'
        'int main(int argc, char** argv) {\n'
        '  ts::TensorStream reader;\n'
        '  if (reader.initPipeline(argv[1], 5, 10, ts::FR_FAST) != 0)\n'
        '    return 2;\n'
        '  int w = 0, h = 0, fn = 0, fd = 0;\n'
        '  reader.getInitializedParams(&w, &h, &fn, &fd);\n'
        '  std::printf("%dx%d\\n", w, h);\n'
        '  reader.endProcessing();\n'
        '  return 0;\n'
        '}\n')
    (consumer / "CMakeLists.txt").write_text(
        "cmake_minimum_required(VERSION 3.16)\n"
        "project(consumer CXX)\n"
        "set(CMAKE_CXX_STANDARD 20)\n"
        "find_package(tsingest REQUIRED)\n"
        "add_executable(consumer main.cpp)\n"
        "target_link_libraries(consumer tsingest::tsingest\n"
        "  avformat avcodec avutil swscale)\n")
    cbuild = tmp_path / "consumer_build"
    p = run(["cmake", "-S", str(consumer), "-B", str(cbuild),
             f"-DCMAKE_PREFIX_PATH={prefix}"])
    assert p.returncode == 0, p.stderr[-2000:]
    p = run(["cmake", "--build", str(cbuild)])
    assert p.returncode == 0, p.stderr[-2000:]
    bbb = os.path.join(RESOURCES, "bbb_1080x608_420_10.h264")
    p = run([str(cbuild / "consumer"), bbb])
    assert p.returncode == 0, p.stderr[-500:]
    assert "1080x608" in p.stdout

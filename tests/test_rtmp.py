"""RTMP live ingest over loopback — the reference's default input is an
rtmp:// URL (python_examples/simple.py:24-25) and its Parser wires
stream options for network sources (src/Parser.cpp:317-328). The suite
previously proved the avformat network stack only via raw TCP; this
exercises the actual RTMP demuxer handshake end-to-end against a local
listen-mode server (tools/rtmp_serve.cpp, libavformat-native — no
ffmpeg binary involved, zero egress)."""
import os
import shutil
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from conftest import RESOURCES
from tensor_stream_tpu import (FourCC, FrameRate, TensorStreamConverter,
                               _native)
from tensor_stream_tpu.utils.crc import av_crc32

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BBB = os.path.join(RESOURCES, "bbb_1080x608_420_10.h264")


@pytest.fixture(scope="module")
def rtmp_serve(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    out = str(tmp_path_factory.mktemp("rtmp") / "rtmp_serve")
    src = os.path.join(REPO, "tools", "rtmp_serve.cpp")
    proc = subprocess.run(
        ["g++", "-O2", "-std=c++20", src, "-lavformat", "-lavcodec",
         "-lavutil", "-o", out],
        capture_output=True, text=True, timeout=180)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return out


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_rtmp_loopback_ingest(rtmp_serve):
    """Probe + decode through the real RTMP demuxer: geometry, ordered
    live reads, first-frame bytes equal to the file decode's (H.264 is
    bit-exact), and a clean stream-health analyzer."""
    if not os.path.exists(BBB):
        pytest.skip("bbb fixture not available")
    url = f"rtmp://127.0.0.1:{_free_port()}/live/test"
    srv = subprocess.Popen([rtmp_serve, BBB, url, "25", "40"],
                           stderr=subprocess.PIPE, text=True)
    try:
        time.sleep(0.8)  # listen socket up
        if srv.poll() == 4:  # checked BEFORE connecting: init would fail
            pytest.skip("libavformat lacks rtmp listen support")
        reader = TensorStreamConverter(url, framerate_mode=FrameRate.FAST,
                                       timeout=20)
        reader.initialize(repeat_number=1)
        assert reader.frame_size == (1080, 608)
        reader.start()
        crcs, indices = [], []
        for _ in range(6):
            t, i = reader.read(pixel_format=FourCC.NV12, return_index=True)
            arr = np.asarray(t).reshape(-1)
            crcs.append(av_crc32(arr))
            indices.append(i)
        lib = reader._lib
        analyze = lib.ts_pipeline_analyze_errors(reader._handle)
        reader.stop()
        reader.set_timeout(None)
        assert indices == sorted(indices)  # live reads move forward
        assert analyze == 0  # no drop/reorder flags over RTMP
        # The served stream is the file's exact bitstream: every live
        # frame CRC appears in the file decode's frame set.
        file_reader = TensorStreamConverter(BBB,
                                            framerate_mode=FrameRate.BLOCKING)
        file_reader.initialize(repeat_number=3)
        file_reader.start()
        file_crcs = set()
        for _ in range(10):
            ft = file_reader.read(pixel_format=FourCC.NV12)
            file_crcs.add(av_crc32(np.asarray(ft).reshape(-1)))
        file_reader.stop()
        assert set(crcs) <= file_crcs
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=5)
        except subprocess.TimeoutExpired:
            srv.kill()


def test_rtmp_source_reports_timeout_when_no_server():
    """A dead rtmp endpoint fails initialization cleanly (init retry +
    error, not a hang) under the read-timeout interrupt."""
    url = f"rtmp://127.0.0.1:{_free_port()}/live/none"
    reader = TensorStreamConverter(url, framerate_mode=FrameRate.FAST,
                                   timeout=3)
    with pytest.raises(RuntimeError):
        reader.initialize(repeat_number=1)
    reader.set_timeout(None)


def test_rtsp_listen_mode_ingest(rtmp_serve):
    """RTSP at the protocol level: the reader LISTENS
    (format_options={'rtsp_flags': 'listen'} — the TPU extension that
    exposes avformat open options; the reference hardcoded
    rtsp_transport=tcp, src/Parser.cpp:317-328) and an avformat RTSP
    push client ANNOUNCEs+RECORDs to it over TCP. Exercises the RTSP
    demuxer handshake + RTP/TCP depacketization end-to-end with zero
    egress."""
    if not os.path.exists(BBB):
        pytest.skip("bbb fixture not available")
    url = f"rtsp://127.0.0.1:{_free_port()}/live.sdp"
    srv = subprocess.Popen([rtmp_serve, BBB, url, "25", "40"],
                           stderr=subprocess.PIPE, text=True)
    try:
        reader = TensorStreamConverter(
            url, framerate_mode=FrameRate.FAST, timeout=20,
            format_options={"rtsp_flags": "listen"})
        try:
            reader.initialize(repeat_number=1)  # blocks for the ANNOUNCE
        except RuntimeError:
            # Without push/listen support the pusher exits 4 and nothing
            # ever connects to the listener; initialize times out first.
            if srv.poll() == 4:
                pytest.skip("libavformat lacks rtsp push/listen support")
            raise
        assert reader.frame_size == (1080, 608)
        reader.start()
        crcs, indices = [], []
        for _ in range(5):
            t, i = reader.read(pixel_format=FourCC.NV12, return_index=True)
            crcs.append(av_crc32(np.asarray(t).reshape(-1)))
            indices.append(i)
        analyze = reader._lib.ts_pipeline_analyze_errors(reader._handle)
        reader.stop()
        reader.set_timeout(None)
        assert indices == sorted(indices)
        assert analyze == 0
        # RTP depacketization is lossless over TCP: the frames are the
        # file decode's exact bytes.
        file_reader = TensorStreamConverter(BBB,
                                            framerate_mode=FrameRate.BLOCKING)
        file_reader.initialize(repeat_number=3)
        file_reader.start()
        file_crcs = set()
        for _ in range(10):
            ft = file_reader.read(pixel_format=FourCC.NV12)
            file_crcs.add(av_crc32(np.asarray(ft).reshape(-1)))
        file_reader.stop()
        assert set(crcs) <= file_crcs
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=5)
        except subprocess.TimeoutExpired:
            srv.kill()

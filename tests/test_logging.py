"""Logger / tracing output behavior (csrc/ts_common.h): the sign
convention (positive level -> logs.txt file, negative -> console), level
gating (LOW frame events vs HIGH span timing), and the host trace tap
(enable_nvtx -> trace_host.json chrome://tracing events) — the direct
log-output coverage the reference implied through its Logger macros
(reference: include/Common.h:125-205, src/Common.cpp:6-11,
tensor_stream/tensor_stream.py:211-220).
"""
import json
import os

import pytest

from conftest import resource

from tensor_stream_tpu import (FourCC, FrameRate, LogsLevel, LogsType,
                               TensorStreamConverter)

FIXTURE = "bbb_720x480_RGB24_250.h264"


def drive(tmp_path, monkeypatch, configure, frames=3):
    """Runs a short BLOCKING-mode read loop with cwd in tmp_path so file
    outputs (logs.txt, trace_host.json) land there."""
    monkeypatch.chdir(tmp_path)
    reader = TensorStreamConverter(resource(FIXTURE),
                                   framerate_mode=FrameRate.BLOCKING)
    configure(reader)
    reader.initialize(repeat_number=3)
    reader.start()
    for _ in range(frames):
        reader.read(name="log", pixel_format=FourCC.Y800, width=96, height=64)
    reader.stop()


def test_file_logging_low_level(native, tmp_path, monkeypatch):
    """Positive level writes TID-prefixed lines to logs.txt
    (reference: Common.cpp:6-11 file branch)."""
    drive(tmp_path, monkeypatch,
          lambda r: r.enable_logs(LogsLevel.LOW, LogsType.FILE))
    log = tmp_path / "logs.txt"
    assert log.exists()
    text = log.read_text()
    assert "TID: " in text
    # LOW logs frame events but not HIGH span timing.
    assert "Processing was interrupted or stream has ended" in text
    assert "Pipeline::GetFrame" not in text


def test_console_logging_negative_level(native, tmp_path, monkeypatch,
                                        capfd):
    """Negative level (LogsType.CONSOLE) writes to stdout instead and
    creates no file (reference: Common.cpp:6-11 console branch,
    tensor_stream.py:211-216 negation)."""
    drive(tmp_path, monkeypatch,
          lambda r: r.enable_logs(LogsLevel.LOW, LogsType.CONSOLE))
    out, _err = capfd.readouterr()
    assert "TID: " in out
    assert "Processing was interrupted or stream has ended" in out
    assert not (tmp_path / "logs.txt").exists()


def test_high_level_adds_span_timing(native, tmp_path, monkeypatch):
    """HIGH adds nested block timing spans with millisecond durations
    (reference: START/END_LOG_BLOCK, Common.h:165-205)."""
    drive(tmp_path, monkeypatch,
          lambda r: r.enable_logs(LogsLevel.HIGH, LogsType.FILE))
    text = (tmp_path / "logs.txt").read_text()
    assert "Pipeline::GetFrame +" in text
    assert "Pipeline::GetFrame -" in text
    assert "time: " in text


def test_none_level_logs_nothing(native, tmp_path, monkeypatch):
    drive(tmp_path, monkeypatch,
          lambda r: r.enable_logs(LogsLevel.NONE, LogsType.FILE))
    assert not (tmp_path / "logs.txt").exists()


def test_enable_nvtx_writes_chrome_trace(native, tmp_path, monkeypatch):
    """enable_nvtx taps host spans into trace_host.json as
    chrome://tracing complete events — the host twin of the reference's
    NVTX ranges (reference: Common.h:82-105)."""
    drive(tmp_path, monkeypatch, lambda r: r.enable_nvtx())
    trace = tmp_path / "trace_host.json"
    assert trace.exists()
    # Events are appended as one JSON object per line with a trailing
    # comma; each must parse and carry the chrome-trace keys.
    events = [json.loads(line.rstrip(",\n"))
              for line in trace.read_text().splitlines() if line.strip()]
    assert events
    names = {e["name"] for e in events}
    assert "Pipeline::GetFrame" in names
    assert all({"ph", "ts", "dur", "tid"} <= set(e) for e in events)

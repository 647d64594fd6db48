"""HEVC stream-health analyzer (csrc/hevc_analyzer.h): POC-continuity
drop detection for H.265 ingest — extends the reference's H.264-only
Analyze stage (reference: src/Parser.cpp:146-293) to the newer codec.
"""
import ctypes

import numpy as np
import pytest

from conftest import resource

from tensor_stream_tpu import _native

B_POC, FRAME_NUM = 1, 2


def split_nals(data: bytes):
    """Yields (nal_type, bytes incl. start code) for an Annex-B buffer."""
    starts = []
    i = 0
    while True:
        j = data.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        begin = j - 1 if j > 0 and data[j - 1] == 0 else j
        starts.append((begin, j + 3))
        i = j + 3
    for k, (begin, payload) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else len(data)
        nal_type = (data[payload] >> 1) & 0x3F
        yield nal_type, data[begin:end]


def split_access_units(data: bytes):
    """Groups NALs into access units: a VCL NAL whose
    first_slice_segment_in_pic_flag is set starts a new AU."""
    aus, cur, cur_has_vcl = [], b"", False
    for nal_type, chunk in split_nals(data):
        is_vcl = nal_type <= 31
        first_slice = False
        if is_vcl:
            payload_off = chunk.find(b"\x00\x00\x01") + 3
            first_slice = bool(chunk[payload_off + 2] & 0x80)
        if is_vcl and first_slice and cur_has_vcl:
            aus.append(cur)
            cur, cur_has_vcl = b"", False
        cur += chunk
        cur_has_vcl = cur_has_vcl or is_vcl
    if cur:
        aus.append(cur)
    return aus


@pytest.fixture(scope="module")
def hevc_aus():
    data = open(resource("synthetic_640x360_120.h265"), "rb").read()
    aus = split_access_units(data)
    assert len(aus) == 120, len(aus)
    return aus


def run_analyzer(native, aus):
    a = native.ts_hevc_analyzer_create()
    masks = [native.ts_hevc_analyzer_analyze(a, au, len(au)) for au in aus]
    native.ts_hevc_analyzer_destroy(a)
    return masks


def test_clean_stream_reports_no_errors(native, hevc_aus):
    masks = run_analyzer(native, hevc_aus)
    assert all(m == 0 for m in masks), masks[:20]


def test_dropped_frame_detected(native, hevc_aus):
    """Removing one mid-GOP access unit leaves a permanent POC hole: the
    analyzer must flag ANALYZE_FRAME_NUM within the reorder window."""
    broken = hevc_aus[:40] + hevc_aus[41:]
    masks = run_analyzer(native, broken)
    assert any(m & FRAME_NUM for m in masks), masks[:60]
    # the clean prefix stays clean
    assert all(m == 0 for m in masks[:39])


def test_missing_leading_idr_detected(native, hevc_aus):
    """A stream starting mid-GOP (no IDR) mirrors the reference's
    missing-IDR signal (ANALYZE_FRAME_NUM on the first slice)."""
    masks = run_analyzer(native, hevc_aus[1:])
    assert masks[0] & FRAME_NUM, masks[:5]


def test_repeated_frame_reports_poc_error(native, hevc_aus):
    """Replaying an already-delivered access unit is a POC ordering
    violation (the B_POC analogue)."""
    broken = hevc_aus[:30] + [hevc_aus[20]] + hevc_aus[30:]
    masks = run_analyzer(native, broken)
    assert any(m & B_POC for m in masks[28:34]), masks[25:40]


def test_pipeline_surfaces_hevc_errors(native, tmp_path):
    """End-to-end: a corrupted HEVC stream raises the pipeline's
    stream_errors mask like the reference's broken_420 H.264 fixtures."""
    data = open(resource("synthetic_640x360_120.h265"), "rb").read()
    aus = split_access_units(data)
    broken = tmp_path / "broken.h265"
    broken.write_bytes(b"".join(aus[:40] + aus[41:]))
    p = native.ts_pipeline_create()
    assert native.ts_pipeline_init(p, str(broken).encode(), 5, 8, 3, 0, 0) == 0
    for _ in range(400):
        sts = native.ts_pipeline_step(p)
        if sts == -1:  # TS_REPEAT: decoder buffering
            continue
        if sts < 0:    # EOF / error
            break
    mask = native.ts_pipeline_analyze_errors(p)
    native.ts_pipeline_stop(p)
    native.ts_pipeline_destroy(p)
    assert mask & FRAME_NUM, mask

"""Demuxer tests, ported from the reference gtest suite
(reference: tests/src/ParserTests.cpp:4-126 and 218-269)."""
import time

import pytest

from conftest import resource
from tensor_stream_tpu._native import TS_EOF, TS_ERROR, TS_OK


def test_wrong_input_path(native):
    h = native.ts_parser_create()
    assert native.ts_parser_init(h, b"wrong_path", 1, 0) != TS_OK
    native.ts_parser_destroy(h)
    h = native.ts_parser_create()
    assert native.ts_parser_init(h, b"", 1, 0) != TS_OK
    native.ts_parser_destroy(h)


def test_correct_input_path(native, make_parser):
    p = make_parser(resource("bunny.mp4"))
    assert p.status == TS_OK
    assert native.ts_parser_width(p.h) == 1280
    assert native.ts_parser_height(p.h) == 720
    num, den = native.ts_parser_fps_num(p.h), native.ts_parser_fps_den(p.h)
    assert num // den == 24


def test_first_packet_parsing_time(make_parser):
    start = time.monotonic()
    p = make_parser(resource("bbb_1080x608_420_10.h264"))
    size, _, _, _ = p.next_packet()
    assert size > 0
    assert (time.monotonic() - start) * 1000 < 1000  # reference: < 1 s


def test_packet_bytes_match_golden_access_units(make_parser):
    """Packets must be byte-identical to the pre-extracted access units
    (reference: ParserTests.cpp:41-65)."""
    p = make_parser(resource("parser_444/bbb_1080x608_10.h264"))
    golden_first = open(resource("parser_444/bbb_1080x608_headers_IDR.h264"), "rb").read()
    size, data, _, _ = p.next_packet()
    assert size == len(golden_first)
    assert data == golden_first
    golden_second = open(resource("parser_444/bbb_1080x608_first_non-IDR.h264"), "rb").read()
    size, data, _, _ = p.next_packet()
    assert size == len(golden_second)
    assert data == golden_second


def test_dts_math(make_parser):
    """Raw Annex-B has no DTS; containers carry it. Coefficient math per
    reference (ParserTests.cpp:67-113)."""
    p = make_parser(resource("parser_444/bbb_1080x608_10.h264"))
    _, _, dts, _ = p.next_packet()
    assert dts == -(2**63)  # AV_NOPTS_VALUE
    p2 = make_parser(resource("bunny.mp4"))
    p2.next_packet()
    _, _, dts, _ = p2.next_packet()
    assert dts == 0
    _, _, dts, _ = p2.next_packet()
    assert dts == 512


def test_bitstream_end(make_parser):
    p = make_parser(resource("parser_444/bbb_1080x608_10.h264"))
    for _ in range(10):
        size, _, _, _ = p.next_packet()
        assert size > 0
    size, _, _, _ = p.next_packet()
    assert size == TS_EOF


# --------------------------------------------------------- broken streams

def test_analyze_without_idr(make_parser):
    """Stream starting on a non-IDR slice -> FRAME_NUM error (=2)."""
    p = make_parser(resource("broken_420/Without_IDR.h264"))
    p.next_packet()
    assert p.analyze_last() == 2


def test_analyze_without_first_non_idr(make_parser):
    """Dropped first non-IDR -> frame_num discontinuity (=2) on frame 2."""
    p = make_parser(resource("broken_420/Without_first_non-IDR.h264"))
    p.next_packet()
    assert p.analyze_last() == 0
    p.next_packet()
    assert p.analyze_last() == 2


def test_analyze_last_frame_repeat(make_parser):
    """Re-analyzing the same access unit -> same frame_num with same POC
    -> B_POC error (=1) (reference: ParserTests.cpp:254-269)."""
    p = make_parser(resource("bbb_1080x608_420_10.h264"))
    for _ in range(10):
        p.next_packet()
        assert p.analyze_last() == 0
    assert p.next_packet()[0] == TS_EOF  # packet buffer keeps last AU
    assert p.analyze_last() == 1

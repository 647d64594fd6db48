"""BitReader unit tests, ported from the reference's gtest suite
(reference: tests/src/ParserTests.cpp:131-215). Values and cursor
positions are asserted against the same parser_444 fixture bytes."""
import ctypes

import pytest

from conftest import resource


@pytest.fixture
def reader(native):
    data = open(resource("parser_444/bbb_1080x608_headers_IDR.h264"), "rb").read()
    h = native.ts_bitreader_create(data, len(data))
    yield lambda: None, h, native
    native.ts_bitreader_destroy(h)


def test_golomb_value_mapping(native):
    # golomb suffix bits {0,1,0,1} little-endian = raw 10, len 4 ->
    # 2^4 - 1 + 10 = 25; sgolomb(25) = +25/2 = 12 (integer division quirk,
    # ParserTests.cpp:140-143).
    data = bytes([0b00001101, 0b00000000])  # ue prefix 0000 1, suffix 1010
    h = native.ts_bitreader_create(data, len(data))
    assert native.ts_bitreader_read_golomb(h) == 25
    native.ts_bitreader_destroy(h)
    h = native.ts_bitreader_create(data, len(data))
    assert native.ts_bitreader_read_sgolomb(h) == 12
    native.ts_bitreader_destroy(h)


def test_read_bits(reader):
    _, h, lib = reader
    assert lib.ts_bitreader_byte_index(h) == 0
    assert lib.ts_bitreader_read_bits(h, 8) == 0
    assert lib.ts_bitreader_byte_index(h) == 1
    assert lib.ts_bitreader_read_bits(h, 8) == 0
    assert lib.ts_bitreader_read_bits(h, 8) == 0
    assert lib.ts_bitreader_read_bits(h, 8) == 1
    assert lib.ts_bitreader_shift_in_bits(h) == 0
    assert lib.ts_bitreader_byte_index(h) == 4
    # 0,1,1,0,0,1,1,1 (103) -> 011 (3) ; 00111 (7)
    assert lib.ts_bitreader_read_bits(h, 3) == 3
    assert lib.ts_bitreader_byte_index(h) == 4
    assert lib.ts_bitreader_shift_in_bits(h) == 3
    assert lib.ts_bitreader_read_bits(h, 5) == 7
    assert lib.ts_bitreader_byte_index(h) == 5
    assert lib.ts_bitreader_read_bits(h, 16) == 62464
    assert lib.ts_bitreader_read_golomb(h) == 14
    assert lib.ts_bitreader_shift_in_bits(h) == 7
    assert lib.ts_bitreader_byte_index(h) == 7
    assert lib.ts_bitreader_read_bits(h, 1) == 1


def test_skip_bits(reader):
    _, h, lib = reader
    assert lib.ts_bitreader_skip_bits(h, 32) == 1
    assert lib.ts_bitreader_byte_index(h) == 4
    assert lib.ts_bitreader_shift_in_bits(h) == 0
    assert lib.ts_bitreader_read_bits(h, 8) == 103
    assert lib.ts_bitreader_byte_index(h) == 5
    assert lib.ts_bitreader_skip_bits(h, 3) == 1
    assert lib.ts_bitreader_byte_index(h) == 5
    assert lib.ts_bitreader_shift_in_bits(h) == 3
    assert lib.ts_bitreader_read_bits(h, 13) == 5120
    assert lib.ts_bitreader_byte_index(h) == 7
    assert lib.ts_bitreader_shift_in_bits(h) == 0


def test_find_nal(reader):
    _, h, lib = reader
    # SPS(7) after the 4-byte start code; cursor one byte past the header.
    assert lib.ts_bitreader_find_nal_type(h) == 7
    assert lib.ts_bitreader_byte_index(h) == 5
    assert lib.ts_bitreader_shift_in_bits(h) == 0
    assert lib.ts_bitreader_find_nal_type(h) == 8  # PPS
    assert lib.ts_bitreader_find_nal_type(h) == 6  # SEI
    assert lib.ts_bitreader_find_nal_type(h) == 5  # IDR slice
    # single-frame bitstream: no more NALs
    assert lib.ts_bitreader_find_nal_type(h) == 0

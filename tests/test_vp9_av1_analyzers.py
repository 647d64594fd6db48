"""VP9/AV1 stream-health analyzers (csrc/vp9_analyzer.h,
csrc/av1_analyzer.h) — extends the reference's H.264-only Analyze stage
(reference: src/Parser.cpp:146-293) to the IVF codecs the decoder already
ingests (tests/test_codecs.py).

AV1 exposes order_hint (a modular presentation counter), so the HEVC
analyzer's hole-watermark drop detection applies; note the fixtures reset
order_hint at each keyframe (GOP = 25), so a mid-GOP drop is confirmed at
the next keyframe (unfilled hole at reset). VP9 has no counter at all:
its checks are structural (frame marker, superframe index, a stream that
starts without its keyframe).
"""
import struct

import pytest

from conftest import resource

B_POC, FRAME_NUM, GAPS = 1, 2, 3

VP9_FIXTURE = "synthetic_640x360_90_vp9.ivf"
AV1_FIXTURE = "synthetic_320x240_60_av1.ivf"


def ivf_packets(path):
    data = open(path, "rb").read()
    assert data[:4] == b"DKIF"
    pos, pkts = 32, []
    while pos + 12 <= len(data):
        size, _pts = struct.unpack("<IQ", data[pos:pos + 12])
        pkts.append(data[pos + 12:pos + 12 + size])
        pos += 12 + size
    return pkts


def write_ivf(path, template, pkts):
    """Re-wraps packets with the template's 32-byte IVF header."""
    header = bytearray(open(template, "rb").read(32))
    header[24:28] = struct.pack("<I", len(pkts))
    with open(path, "wb") as f:
        f.write(header)
        for i, p in enumerate(pkts):
            f.write(struct.pack("<IQ", len(p), i))
            f.write(p)


@pytest.fixture(scope="module")
def vp9_pkts():
    return ivf_packets(resource(VP9_FIXTURE))


@pytest.fixture(scope="module")
def av1_pkts():
    return ivf_packets(resource(AV1_FIXTURE))


def run_vp9(native, pkts):
    a = native.ts_vp9_analyzer_create()
    masks = [native.ts_vp9_analyzer_analyze(a, p, len(p)) for p in pkts]
    native.ts_vp9_analyzer_destroy(a)
    return masks


def run_av1(native, pkts):
    a = native.ts_av1_analyzer_create()
    masks = [native.ts_av1_analyzer_analyze(a, p, len(p)) for p in pkts]
    native.ts_av1_analyzer_destroy(a)
    return masks


# ----------------------------------------------------------------- VP9

def test_vp9_clean_stream_no_errors(native, vp9_pkts):
    assert len(vp9_pkts) == 90
    assert all(m == 0 for m in run_vp9(native, vp9_pkts))


def test_vp9_missing_keyframe_detected(native, vp9_pkts):
    """A stream starting on an inter frame lost its keyframe — the
    missing-IDR analogue, flagged once on the first frame."""
    masks = run_vp9(native, vp9_pkts[1:])
    assert masks[0] & FRAME_NUM
    assert all(m == 0 for m in masks[1:])


def test_vp9_corrupt_frame_marker_detected(native, vp9_pkts):
    """frame_marker != 2 means the packet boundary is corrupt."""
    bad = bytes([vp9_pkts[0][0] ^ 0xC0]) + vp9_pkts[0][1:]
    assert run_vp9(native, [bad])[0] == GAPS


def test_vp9_corrupt_superframe_index_detected(native, vp9_pkts):
    """A valid superframe wrapper (both marker bytes match) whose frame
    sizes overrun the payload is corrupt. (A lone marker-looking tail
    byte is NOT an error: per spec both bytes must match, else the
    packet is a normal frame — ~12.5% of frames legitimately end with a
    marker-shaped byte.)"""
    # marker 0xC8: 1 frame, 2-byte size field; size 0xFFFF >> payload.
    bad = vp9_pkts[1][:50] + bytes([0xC8, 0xFF, 0xFF, 0xC8])
    assert run_vp9(native, [vp9_pkts[0], bad])[1] & GAPS == GAPS


def test_vp9_marker_shaped_tail_byte_is_not_an_error(native, vp9_pkts):
    """A normal frame whose last compressed byte looks like a superframe
    marker but whose leading index byte does not match must be analyzed
    as a normal frame, not reported corrupt."""
    tail = vp9_pkts[1] + bytes([0xC1])  # lone marker-shaped byte
    masks = run_vp9(native, [vp9_pkts[0], tail])
    assert masks[1] == 0


# ----------------------------------------------------------------- AV1

def test_av1_clean_stream_no_errors(native, av1_pkts):
    assert len(av1_pkts) == 60
    assert all(m == 0 for m in run_av1(native, av1_pkts))


def test_av1_missing_keyframe_detected(native, av1_pkts):
    """Streams cut mid-GOP have no sequence header before the first
    frame OBU: flagged once, tracking resumes at the next keyframe."""
    masks = run_av1(native, av1_pkts[1:])
    assert masks[0] & FRAME_NUM
    assert all(m == 0 for m in masks[1:])


def test_av1_dropped_frame_detected_at_keyframe(native, av1_pkts):
    """A mid-GOP drop leaves an order_hint hole; the fixtures reset
    order_hint per GOP, so the unfilled hole is confirmed at the next
    keyframe."""
    masks = run_av1(native, av1_pkts[:20] + av1_pkts[21:])
    fired = [i for i, m in enumerate(masks) if m & FRAME_NUM]
    assert fired == [24]  # pkts[25] is the GOP-25 keyframe


def test_av1_same_gop_replay_reports_poc_error(native, av1_pkts):
    """Replaying an already-delivered frame puts its order_hint below
    the contiguity watermark — the B_POC analogue."""
    masks = run_av1(native, av1_pkts[:10] + [av1_pkts[5]] + av1_pkts[10:])
    assert masks[10] & B_POC
    assert all(m == 0 for i, m in enumerate(masks) if i != 10)


def test_av1_corrupt_obu_detected(native, av1_pkts):
    """A set forbidden bit in the OBU header is structural corruption."""
    bad = bytes([av1_pkts[0][0] | 0x80]) + av1_pkts[0][1:]
    assert run_av1(native, [bad])[0] == GAPS


# ------------------------------------------------- end-to-end pipeline

@pytest.mark.parametrize("fixture,codec", [(VP9_FIXTURE, "vp9"),
                                           (AV1_FIXTURE, "av1")])
def test_pipeline_clean_ivf_reports_no_errors(native, fixture, codec):
    p = native.ts_pipeline_create()
    assert native.ts_pipeline_init(p, resource(fixture).encode(),
                                   5, 8, 3, 0, 0) == 0
    for _ in range(400):
        sts = native.ts_pipeline_step(p)
        if sts == -1:
            continue
        if sts < 0:
            break
    mask = native.ts_pipeline_analyze_errors(p)
    native.ts_pipeline_stop(p)
    native.ts_pipeline_destroy(p)
    assert mask == 0


def test_pipeline_surfaces_av1_missing_keyframe(native, tmp_path, av1_pkts):
    """End-to-end: an AV1 stream cut mid-GOP (keyframe lost) raises the
    pipeline's stream_errors mask, like the reference's broken_420
    missing-IDR fixture does for H.264. (A mid-GOP drop is only
    confirmed at the next keyframe — see the unit test — but dav1d
    hard-fails on the broken reference chain first and the producer
    loop exits on decode error, reference-faithfully, so the keyframe
    case is the one observable end-to-end.)"""
    broken = tmp_path / "broken.ivf"
    write_ivf(str(broken), resource(AV1_FIXTURE), av1_pkts[1:])
    p = native.ts_pipeline_create()
    assert native.ts_pipeline_init(p, str(broken).encode(), 5, 8, 3, 0, 0) == 0
    for _ in range(400):
        sts = native.ts_pipeline_step(p)
        if sts == -1:
            continue
        if sts < 0:
            break
    mask = native.ts_pipeline_analyze_errors(p)
    native.ts_pipeline_stop(p)
    native.ts_pipeline_destroy(p)
    assert mask & FRAME_NUM

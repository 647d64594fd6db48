"""Python API tests, ported from the reference's unittest suite
(reference: tests/python_tests/CommonTests.py:8-191)."""
import os

import numpy as np
import pytest

from conftest import resource
from tensor_stream_tpu import (FourCC, FrameRate, Planes, ResizeType,
                               TensorStreamConverter)


@pytest.fixture
def billiard():
    return resource("billiard_1920x1080_420_100.h264")


def test_constructor_defaults(billiard):
    reader = TensorStreamConverter(billiard)
    assert reader.stream_url == billiard
    assert reader.max_consumers == 5
    assert reader.buffer_size == 5
    assert reader.fps is None
    assert reader.frame_size is None


def test_initialize_probes_stream(billiard):
    reader = TensorStreamConverter(billiard, framerate_mode=FrameRate.BLOCKING)
    reader.initialize()
    assert reader.frame_size == (1920, 1080)
    assert reader.fps == 25
    reader.stop()


def test_initialize_raises_on_bad_path():
    reader = TensorStreamConverter("does_not_exist.h264")
    with pytest.raises(RuntimeError):
        reader.initialize(repeat_number=2)


def test_read_before_initialize_raises(billiard):
    reader = TensorStreamConverter(billiard)
    with pytest.raises(RuntimeError):
        reader.read()


def test_read_after_stop_raises(billiard):
    reader = TensorStreamConverter(billiard, framerate_mode=FrameRate.BLOCKING)
    reader.initialize()
    reader.start()
    reader.read(name="c", width=96, height=64)
    reader.stop()
    with pytest.raises(RuntimeError):
        reader.read(name="c")


@pytest.mark.parametrize("fmt,planes,w,h,shape", [
    (FourCC.RGB24, Planes.MERGED, 320, 240, (240, 320, 3)),
    (FourCC.RGB24, Planes.PLANAR, 320, 240, (3, 240, 320)),
    (FourCC.BGR24, Planes.MERGED, 160, 96, (96, 160, 3)),
    (FourCC.Y800, Planes.MERGED, 320, 240, (1, 240, 320)),
    (FourCC.UYVY, Planes.MERGED, 320, 240, (1, 480, 320)),
    (FourCC.YUV444, Planes.MERGED, 320, 240, (240, 320, 3)),
    (FourCC.NV12, Planes.MERGED, 320, 240, (1, 360, 320)),
    (FourCC.HSV, Planes.MERGED, 320, 240, (240, 320, 3)),
])
def test_read_shapes(billiard, fmt, planes, w, h, shape):
    """Tensor shape contract (reference: WrapperPython.cpp:318-341)."""
    reader = TensorStreamConverter(billiard, framerate_mode=FrameRate.BLOCKING)
    reader.initialize()
    reader.start()
    tensor = reader.read(name="c", pixel_format=fmt, planes_pos=planes,
                         width=w, height=h)
    reader.stop()
    assert tuple(tensor.shape) == shape
    expected_dtype = np.float32 if fmt == FourCC.HSV else np.uint8
    assert tensor.dtype == expected_dtype


@pytest.mark.slow
def test_normalization_gives_float(billiard):
    reader = TensorStreamConverter(billiard, framerate_mode=FrameRate.BLOCKING)
    reader.initialize()
    reader.start()
    t = reader.read(name="c", width=96, height=64, normalization=True)
    assert t.dtype == np.float32
    assert float(t.max()) <= 1.0
    t2 = reader.read(name="c", width=96, height=64, normalization=False)
    assert t2.dtype == np.uint8
    reader.stop()


def test_return_index(billiard):
    reader = TensorStreamConverter(billiard, framerate_mode=FrameRate.BLOCKING)
    reader.initialize()
    reader.start()
    t, idx = reader.read(name="c", width=96, height=64, return_index=True)
    assert idx >= 1
    t2 = reader.read(name="c", width=96, height=64)
    assert not isinstance(t2, tuple)
    reader.stop()


def test_delay_within_buffer(billiard):
    """delay in [-buffer_size, 0] selects a look-back frame.

    Note the reference's aligned-index quirk (Decoder.cpp:122-124): the
    look-back applies to the post-modulo ring position, so the buffer must
    be deep enough that (current-1) % deep + delay >= 0 — with the
    BLOCKING producer in lockstep, an unsatisfiable delay REPEATs forever
    (same hazard as the reference). buffer 12 > frames read keeps it valid."""
    reader = TensorStreamConverter(billiard, buffer_size=12,
                                   framerate_mode=FrameRate.BLOCKING)
    reader.initialize()
    reader.start()
    for _ in range(5):
        reader.read(name="c", width=96, height=64)
    t, idx = reader.read(name="c", width=96, height=64, delay=-1,
                         return_index=True)
    # the returned index is the absolute frame counter, like the reference
    assert idx == 6
    reader.stop()


def test_dump_file_size(billiard, tmp_path):
    """Dump appends W*H*C*frames bytes (reference: CommonTests.py
    dump-size assertion)."""
    reader = TensorStreamConverter(billiard, framerate_mode=FrameRate.BLOCKING)
    reader.initialize()
    reader.start()
    out = tmp_path / "dumped"
    frames = 4
    for _ in range(frames):
        t = reader.read(name="c", pixel_format=FourCC.RGB24, width=320, height=240)
        reader.dump(t, str(out), width=320, height=240)
    reader.stop()
    assert os.path.getsize(f"{out}.yuv") == 320 * 240 * 3 * frames


def test_read_batch_extension(billiard):
    reader = TensorStreamConverter(billiard, framerate_mode=FrameRate.BLOCKING)
    reader.initialize()
    reader.start()
    batch, idxs = reader.read_batch(4, name="c", pixel_format=FourCC.RGB24,
                                    planes_pos=Planes.PLANAR, width=224,
                                    height=224, normalization=True,
                                    return_index=True)
    reader.stop()
    assert batch.shape == (4, 3, 224, 224)
    assert batch.dtype == np.float32
    assert idxs == [1, 2, 3, 4]


def test_enable_dumps_writes_debug_taps(tmp_path, monkeypatch):
    """enable_dumps mirrors the reference's init flag: the demuxer dumps
    bitstream.h264 and the decoder dumps NV12.yuv (reference:
    Parser.cpp:336-353, Decoder.cpp:61-79)."""
    import os
    from conftest import resource
    from tensor_stream_tpu import FourCC, FrameRate, TensorStreamConverter
    monkeypatch.chdir(tmp_path)
    reader = TensorStreamConverter(resource("bbb_1080x608_420_10.h264"),
                                   framerate_mode=FrameRate.BLOCKING,
                                   enable_dumps=True)
    reader.initialize(repeat_number=3)
    reader.start()
    t1 = np.asarray(reader.read(name="c", pixel_format=FourCC.Y800,
                                width=96, height=64))
    t2 = np.asarray(reader.read(name="c", pixel_format=FourCC.Y800,
                                width=96, height=64))
    reader.stop()
    assert os.path.getsize("bitstream.h264") > 0
    assert os.path.getsize("NV12.yuv") >= 1080 * 608 * 3 // 2
    # Per-consumer processed tap (reference: VideoProcessor.cpp:152-163):
    # the appended bytes are exactly the returned tensors' bytes.
    dumped = open("Processed_c.yuv", "rb").read()
    assert dumped == t1.tobytes() + t2.tobytes()
    # A fresh pipeline truncates the tap — no stale prefix from the
    # previous run survives in a reused working directory.
    reader.initialize(repeat_number=3)
    reader.start()
    t3 = np.asarray(reader.read(name="c", pixel_format=FourCC.Y800,
                                width=96, height=64))
    reader.stop()
    assert open("Processed_c.yuv", "rb").read() == t3.tobytes()


def test_seek_frame_positions_reads():
    """seek_frame(n) (TPU extension): the next read returns frame n+1
    with bytes identical to a non-seeked run's frame n+1."""
    path = resource("bbb_720x480_RGB24_250.h264")
    full = TensorStreamConverter(path, framerate_mode=FrameRate.BLOCKING)
    full.initialize(repeat_number=3)
    full.start()
    by_index = {}
    for _ in range(16):
        t, idx = full.read(name="c", pixel_format=FourCC.Y800,
                           width=96, height=64, return_index=True)
        by_index[idx] = np.asarray(t)
    full.stop()

    seeked = TensorStreamConverter(path, framerate_mode=FrameRate.BLOCKING)
    seeked.initialize(repeat_number=3)
    seeked.seek_frame(12)
    seeked.start()
    t, idx = seeked.read(name="c", pixel_format=FourCC.Y800,
                         width=96, height=64, return_index=True)
    seeked.stop()
    # The first read's fast path returns the latest decoded frame, which
    # is at or just past the seek point; indexing stays globally
    # consistent and the bytes match the non-seeked run's same frame.
    assert 13 <= idx <= 16, idx
    np.testing.assert_array_equal(np.asarray(t), by_index[idx])


def test_seek_frame_after_start_raises():
    path = resource("bbb_720x480_RGB24_250.h264")
    r = TensorStreamConverter(path, framerate_mode=FrameRate.BLOCKING)
    r.initialize(repeat_number=3)
    r.start()
    with pytest.raises(RuntimeError):
        r.seek_frame(5)
    r.stop()


def test_fast_decode_trades_exactness_for_speed():
    """fast_decode=True (TPU extension) must still decode a valid stream
    (shape/index contract intact); its bytes may differ from exact
    decode (loop filter skipped), so CRC parity paths must keep it off."""
    path = resource("bbb_720x480_RGB24_250.h264")
    r = TensorStreamConverter(path, framerate_mode=FrameRate.BLOCKING,
                              fast_decode=True)
    r.initialize(repeat_number=3)
    r.start()
    t, idx = r.read(name="c", pixel_format=FourCC.Y800, width=96,
                    height=64, return_index=True)
    r.stop()
    assert idx == 1
    a = np.asarray(t)
    assert a.shape == (1, 64, 96) and a.std() > 1


def test_to_torch_bridge(billiard):
    """utils.torch_interop.to_torch: read() output lands as a
    torch.Tensor with identical bytes (the reference's native return
    type; reference WrapperPython.cpp:315-343)."""
    torch = pytest.importorskip("torch")

    from tensor_stream_tpu import FourCC, FrameRate, TensorStreamConverter
    from tensor_stream_tpu.utils.torch_interop import to_torch
    reader = TensorStreamConverter(billiard,
                                   framerate_mode=FrameRate.BLOCKING)
    reader.initialize(repeat_number=3)
    reader.start()
    t = reader.read(name="c", pixel_format=FourCC.RGB24, width=160,
                    height=96)
    out = to_torch(t)
    reader.stop()
    assert isinstance(out, torch.Tensor)
    assert tuple(out.shape) == (96, 160, 3)
    assert out.dtype == torch.uint8
    assert np.array_equal(out.numpy(), np.asarray(t))

"""ColorStandard (BT.601 vs BT.709) — TPU extension.

The reference hardcodes BT.601 limited-range constants
(reference: src/ColorConversion.cu:23-35), which mis-render HD/BT.709
content. The extension adds a `color_standard` knob while the default
(BT601) stays pinned to every committed oracle (the whole CRC/raster
suite runs on the default path).
"""
import numpy as np
import pytest

from tensor_stream_tpu.enums import ColorStandard, FourCC, Planes
from tensor_stream_tpu.ops.vpp import VPPConfig, vpp_numpy


@pytest.fixture(scope="module")
def chroma_frame():
    """A synthetic frame with strong chroma so the matrices separate."""
    rng = np.random.default_rng(7)
    h, w = 64, 96
    y = rng.integers(16, 236, (h, w), np.uint8)
    uv = rng.integers(0, 256, (h // 2, w), np.uint8)
    return y, uv, w, h


def _reference_rgb(y, uv, rv, bu, gv, gu):
    """Independent float64 reimplementation of the conversion semantics
    (max(0, Y-16)*1.164 + coef*(C-128) + 0.5, truncate, clamp)."""
    u = np.repeat(np.repeat(uv[:, 0::2], 2, 0), 2, 1).astype(np.float64)
    v = np.repeat(np.repeat(uv[:, 1::2], 2, 0), 2, 1).astype(np.float64)
    yf = np.maximum(0.0, y.astype(np.float64) - 16.0) * np.float32(1.163999557)
    r = np.clip((yf + (rv * (v - 128) + 0.5)).astype(np.int64), 0, 255)
    b = np.clip((yf + (bu * (u - 128) + 0.5)).astype(np.int64), 0, 255)
    g = np.clip((yf + (gv * (v - 128) + gu * (u - 128) + 0.5)).astype(np.int64),
                0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_bt709_differs_from_bt601(chroma_frame):
    y, uv, w, h = chroma_frame
    out601 = vpp_numpy(VPPConfig(src_width=w, src_height=h,
                                 fourcc=FourCC.RGB24), y, uv)
    out709 = vpp_numpy(VPPConfig(src_width=w, src_height=h,
                                 fourcc=FourCC.RGB24,
                                 standard=ColorStandard.BT709), y, uv)
    assert not np.array_equal(out601, out709)
    # The red coefficient grows (1.596 -> 1.793): saturated chroma maps
    # to visibly different reds on a significant pixel fraction.
    assert (out601 != out709).mean() > 0.2


def test_bt709_matches_independent_reference(chroma_frame):
    """Device BT.709 output vs a float64 reimplementation: at most the
    truncation-boundary pixels may differ by one step (f32 vs f64
    product rounding), everything else exact."""
    y, uv, w, h = chroma_frame
    rv = np.float32(2 * (1 - 0.2126) * 255 / 224)
    bu = np.float32(2 * (1 - 0.0722) * 255 / 224)
    gv = np.float32(-(2 * (1 - 0.2126) * 0.2126 / 0.7152) * 255 / 224)
    gu = np.float32(-(2 * (1 - 0.0722) * 0.0722 / 0.7152) * 255 / 224)
    expected = _reference_rgb(y, uv, float(rv), float(bu), float(gv),
                              float(gu))
    out = np.asarray(vpp_numpy(VPPConfig(src_width=w, src_height=h,
                                         fourcc=FourCC.RGB24,
                                         standard=ColorStandard.BT709),
                               y, uv))
    diff = np.abs(out.astype(np.int32) - expected.astype(np.int32))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.01


def test_native_bt709_matches_device(native, chroma_frame):
    """The C++ host converter and the jitted device path agree bit-for-
    bit on BT.709 for every affected FourCC (same f32 constants, same
    operation order)."""
    from test_native_convert import native_vpp
    y, uv, w, h = chroma_frame
    for fourcc, planes in [(FourCC.RGB24, Planes.MERGED),
                           (FourCC.BGR24, Planes.PLANAR),
                           (FourCC.HSV, Planes.MERGED)]:
        dev = np.asarray(vpp_numpy(
            VPPConfig(src_width=w, src_height=h, fourcc=fourcc,
                      planes=planes, standard=ColorStandard.BT709),
            y, uv)).reshape(-1)
        nat = native_vpp(native, y, uv, w, h, fourcc, planes=planes,
                         standard=1)
        if fourcc == FourCC.HSV:
            assert np.abs(nat - dev).max() <= 1e-6
        else:
            np.testing.assert_array_equal(nat, dev, err_msg=str(fourcc))


def test_yuv_formats_ignore_standard(chroma_frame):
    """Y800/UYVY/YUV444/NV12 never apply the RGB matrix: identical
    bytes under either standard."""
    y, uv, w, h = chroma_frame
    for fourcc in (FourCC.Y800, FourCC.UYVY, FourCC.YUV444, FourCC.NV12):
        a = vpp_numpy(VPPConfig(src_width=w, src_height=h, fourcc=fourcc,
                                planes=Planes.PLANAR), y, uv)
        b = vpp_numpy(VPPConfig(src_width=w, src_height=h, fourcc=fourcc,
                                planes=Planes.PLANAR,
                                standard=ColorStandard.BT709), y, uv)
        np.testing.assert_array_equal(a, b, err_msg=str(fourcc))


def test_api_read_accepts_color_standard():
    """End-to-end: read(color_standard=BT709) returns different bytes
    than the default on real video."""
    from conftest import resource
    from tensor_stream_tpu import FrameRate, TensorStreamConverter
    reader = TensorStreamConverter(
        resource("bbb_720x480_RGB24_250.h264"),
        framerate_mode=FrameRate.BLOCKING)
    reader.initialize(repeat_number=3)
    reader.start()
    t601 = np.asarray(reader.read(name="c", pixel_format=FourCC.RGB24,
                                  width=160, height=96))
    t709 = np.asarray(reader.read(name="c", pixel_format=FourCC.RGB24,
                                  width=160, height=96,
                                  color_standard=ColorStandard.BT709))
    reader.stop()
    assert t601.shape == t709.shape
    assert not np.array_equal(t601, t709)


def _reference_rgb_full(y, uv, rv, bu, gv, gu):
    """Float64 reimplementation of the FULL-range semantics (Y passes
    through; no 255/224 scale on chroma)."""
    u = np.repeat(np.repeat(uv[:, 0::2], 2, 0), 2, 1).astype(np.float64)
    v = np.repeat(np.repeat(uv[:, 1::2], 2, 0), 2, 1).astype(np.float64)
    yf = y.astype(np.float64)
    r = np.clip((yf + (rv * (v - 128) + 0.5)).astype(np.int64), 0, 255)
    b = np.clip((yf + (bu * (u - 128) + 0.5)).astype(np.int64), 0, 255)
    g = np.clip((yf + (gv * (v - 128) + gu * (u - 128) + 0.5)).astype(np.int64),
                0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_full_range_gray_is_identity():
    """BT601_FULL/BT709_FULL: neutral-chroma pixels map Y straight
    through (the whole point of full swing), where the limited matrices
    stretch 16..235 to 0..255."""
    w, h = 32, 16
    y = np.tile(np.arange(0, 256, 8, np.uint8), (h, 1))
    uv = np.full((h // 2, w), 128, np.uint8)
    for std in (ColorStandard.BT601_FULL, ColorStandard.BT709_FULL):
        out = np.asarray(vpp_numpy(VPPConfig(src_width=w, src_height=h,
                                             fourcc=FourCC.RGB24,
                                             standard=std), y, uv))
        np.testing.assert_array_equal(out, np.repeat(y[..., None], 3, -1),
                                      err_msg=str(std))
    limited = np.asarray(vpp_numpy(VPPConfig(src_width=w, src_height=h,
                                             fourcc=FourCC.RGB24), y, uv))
    assert limited[0, 0, 0] == 0      # Y=16 -> black
    assert limited[0, -2, 0] == 255   # Y>=235 saturates


def test_full_range_matches_independent_reference(chroma_frame):
    y, uv, w, h = chroma_frame
    cases = {
        ColorStandard.BT601_FULL: (0.299, 0.114, 0.587),
        ColorStandard.BT709_FULL: (0.2126, 0.0722, 0.7152),
    }
    for std, (kr, kb, kg) in cases.items():
        rv = np.float32(2 * (1 - kr))
        bu = np.float32(2 * (1 - kb))
        gv = np.float32(-(2 * (1 - kr) * kr / kg))
        gu = np.float32(-(2 * (1 - kb) * kb / kg))
        expected = _reference_rgb_full(y, uv, float(rv), float(bu),
                                       float(gv), float(gu))
        out = np.asarray(vpp_numpy(VPPConfig(src_width=w, src_height=h,
                                             fourcc=FourCC.RGB24,
                                             standard=std), y, uv))
        diff = np.abs(out.astype(np.int32) - expected.astype(np.int32))
        assert diff.max() <= 1, std
        assert (diff != 0).mean() < 0.01, std


def test_native_full_range_matches_device(native, chroma_frame):
    """C++ host converter vs jitted device path, bit-for-bit, on both
    full-range standards."""
    from test_native_convert import native_vpp
    y, uv, w, h = chroma_frame
    for std in (ColorStandard.BT601_FULL, ColorStandard.BT709_FULL):
        for fourcc, planes in [(FourCC.RGB24, Planes.MERGED),
                               (FourCC.BGR24, Planes.PLANAR),
                               (FourCC.HSV, Planes.MERGED)]:
            dev = np.asarray(vpp_numpy(
                VPPConfig(src_width=w, src_height=h, fourcc=fourcc,
                          planes=planes, standard=std), y, uv)).reshape(-1)
            nat = native_vpp(native, y, uv, w, h, fourcc, planes=planes,
                             standard=std.value)
            if fourcc == FourCC.HSV:
                assert np.abs(nat - dev).max() <= 1e-6
            else:
                np.testing.assert_array_equal(
                    nat, dev, err_msg=f"{std} {fourcc}")


@pytest.mark.slow
def test_auto_standard_resolves_from_vui():
    """ColorStandard.AUTO reads the stream's VUI colorimetry: on a
    bt709+full-range-tagged fixture it matches the explicit BT709_FULL
    conversion; on an untagged stream it falls back to the reference's
    BT.601-limited behavior."""
    from conftest import resource
    from tensor_stream_tpu import FrameRate, TensorStreamConverter

    def grab(path, std):
        r = TensorStreamConverter(path, framerate_mode=FrameRate.BLOCKING,
                                  buffer_size=8)
        r.initialize(repeat_number=3)
        r.start()
        out = np.asarray(r.read(name="c", pixel_format=FourCC.RGB24,
                                width=64, height=48, color_standard=std))
        r.stop()
        return out

    tagged = resource("synthetic_320x240_30_bt709full.h264")
    assert np.array_equal(grab(tagged, ColorStandard.AUTO),
                          grab(tagged, ColorStandard.BT709_FULL))
    assert not np.array_equal(grab(tagged, ColorStandard.AUTO),
                              grab(tagged, ColorStandard.BT601))
    untagged = resource("bbb_720x480_RGB24_250.h264")
    assert np.array_equal(grab(untagged, ColorStandard.AUTO),
                          grab(untagged, ColorStandard.BT601))


@pytest.mark.slow
def test_auto_standard_in_frame_loader():
    """FrameLoader(color_standard=AUTO) waits for the first decoded
    frame, resolves the VUI colorimetry, and bakes it into its one
    compiled VPP program."""
    import jax
    from tensor_stream_tpu import FrameLoader
    from conftest import resource
    path = resource("synthetic_320x240_30_bt709full.h264")

    def batches(std):
        with FrameLoader(path, batch=10, width=64, height=48,
                         pixel_format=FourCC.RGB24,
                         color_standard=std) as loader:
            t, idx = next(loader)
            return np.asarray(jax.block_until_ready(t))

    assert np.array_equal(batches(ColorStandard.AUTO),
                          batches(ColorStandard.BT709_FULL))


def test_detected_standard_native_probe(native):
    """Cheap no-jit check of the VUI detection itself (the AUTO
    round-trips above are slow-marked): tagged fixture reports
    BT709|FULL, untagged reports the BT.601-limited default."""
    import ctypes
    import time
    from conftest import resource

    def detect(path):
        p = native.ts_pipeline_create()
        assert native.ts_pipeline_init_ex(p, path.encode(), 5, 8, 3, 0, 0,
                                          0, 0) == 0
        native.ts_pipeline_register_cursor(p, b"c")
        native.ts_pipeline_start(p)
        deadline = time.monotonic() + 10
        while (native.ts_pipeline_frame_index(p) < 1 and
               time.monotonic() < deadline):
            time.sleep(0.02)
        std = native.ts_pipeline_detected_standard(p)
        native.ts_pipeline_stop(p)
        native.ts_pipeline_destroy(p)
        return std

    assert detect(resource("synthetic_320x240_30_bt709full.h264")) == \
        ColorStandard.BT709_FULL.value
    assert detect(resource("bbb_1080x608_420_10.h264")) == \
        ColorStandard.BT601.value


@pytest.mark.slow
def test_auto_follows_mid_stream_colorimetry_change():
    """A splice that keeps geometry but changes VUI colorimetry
    (untagged BT.601-limited segment, then a bt709+full-range-tagged
    one): AUTO re-resolves per read, so frames before the splice match
    explicit BT601 and frames after match explicit BT709_FULL."""
    from tensor_stream_tpu import FrameRate, TensorStreamConverter
    from conftest import resource
    path = resource("switch_colorimetry_320x240_20.h264")

    def read_all(std):
        r = TensorStreamConverter(path, framerate_mode=FrameRate.BLOCKING,
                                  buffer_size=8)
        r.initialize(repeat_number=3)
        r.start()
        frames = {}
        while True:
            try:
                t, i = r.read(name="c", pixel_format=FourCC.RGB24,
                              width=64, height=48, color_standard=std,
                              return_index=True)
            except RuntimeError:
                break
            frames[i] = np.asarray(t)
        r.stop()
        return frames

    auto = read_all(ColorStandard.AUTO)
    b601 = read_all(ColorStandard.BT601)
    b709f = read_all(ColorStandard.BT709_FULL)
    # AUTO resolves from the LATEST decoded frame's VUI, so a frame read
    # while the producer is already decoding across the splice may pick
    # up its neighbor's colorimetry — keep a 2-frame slack band around
    # the boundary (frame 10|11) and assert the steady states.
    pre = [i for i in auto if i <= 8 and i in b601]
    post = [i for i in auto if i >= 13 and i in b709f]
    assert len(pre) >= 4 and len(post) >= 4
    for i in pre:
        np.testing.assert_array_equal(auto[i], b601[i], err_msg=str(i))
    for i in post:
        np.testing.assert_array_equal(auto[i], b709f[i], err_msg=str(i))
    # Every frame matches one of the two matrices (never a third thing).
    for i in auto:
        assert (i in b601 and np.array_equal(auto[i], b601[i])) or \
               (i in b709f and np.array_equal(auto[i], b709f[i])), i
    # And the two matrices genuinely differ on this content.
    assert any(not np.array_equal(b601[i], b709f[i])
               for i in post if i in b601)

"""Resize CRC oracles from the reference's test suite
(reference: tests/src/PythonTests.cpp:141-244, VPPTests.cpp:186-229).

Two paths are pinned:

- the native host resize (csrc/vpp_host.cpp, `host_resize=True` in the
  API) reproduces nvcc's FMA-contracted rounding order with explicit
  fmaf/fma and is bit-exact against EVERY committed CRC oracle;
- the jitted device resize (ops/resize.py) is bit-exact on EVERY
  backend for EVERY case: nvcc's f32 rounding order is emulated exactly
  via error-free transformations (correctly-rounded fmaf on values,
  Dekker/two-sum + round-to-odd), bicubic blends in double-single f32
  (the reference's f64 margins held with exact boundary tests), and the
  AREA division rounds a widened integer quotient (ops/exactf32.py).
  Every construction is contraction-immune, so byte equality with the
  host-exact output plus the committed CRCs is asserted on whichever
  backend runs the suite.
"""
import numpy as np
import pytest

from tensor_stream_tpu.enums import FourCC, Planes, ResizeType
from tensor_stream_tpu.ops.vpp import VPPConfig, vpp_numpy
from tensor_stream_tpu.utils.crc import av_crc32

R = ResizeType
HOST_ALGO = {R.NEAREST: 0, R.BILINEAR: 1, R.BICUBIC: 2, R.AREA: 3}

# (name, VPPConfig kwargs, accepted CRCs, device_exact)
# device_exact is now True for every case on every backend (the exact
# f32/f64 emulation in ops/exactf32.py retired the round-2 envelopes);
# the field stays for the parametrize shape.
# CRCs: PythonTests.cpp:192-244 (CLI dumps of frame 0 of
# bbb_1080x608_420_10.h264) and VPPTests.cpp:186-229; the bicubic
# 480x360 case carries the reference's own per-platform dual CRC
# (PythonTests.cpp:208).
CASES = [
    ("rgb24_nearest_480x360",
     dict(fourcc=FourCC.RGB24, width=480, height=360),
     (3234932936,), True),
    ("rgb24_nearest_1920x1080",
     dict(fourcc=FourCC.RGB24, width=1920, height=1080),
     (867059050,), True),
    ("rgb24_bilinear_480x360",
     dict(fourcc=FourCC.RGB24, width=480, height=360,
          resize_type=R.BILINEAR), (1166179972,), True),
    ("rgb24_bilinear_540x304",
     dict(fourcc=FourCC.RGB24, width=540, height=304,
          resize_type=R.BILINEAR), (2257004891,), True),
    ("rgb24_bilinear_1920x1080",
     dict(fourcc=FourCC.RGB24, width=1920, height=1080,
          resize_type=R.BILINEAR), (930427804,), True),
    ("rgb24_bicubic_480x360",
     dict(fourcc=FourCC.RGB24, width=480, height=360,
          resize_type=R.BICUBIC), (4261607874, 1267073424), True),
    ("rgb24_bicubic_540x304",
     dict(fourcc=FourCC.RGB24, width=540, height=304,
          resize_type=R.BICUBIC), (4169518778,), True),
    ("rgb24_bicubic_1920x1080",
     dict(fourcc=FourCC.RGB24, width=1920, height=1080,
          resize_type=R.BICUBIC), (2402019758,), True),
    ("rgb24_area_480x360",
     dict(fourcc=FourCC.RGB24, width=480, height=360,
          resize_type=R.AREA), (3175240744,), True),
    ("rgb24_area_540x304",
     dict(fourcc=FourCC.RGB24, width=540, height=304,
          resize_type=R.AREA), (2257004891,), True),
    ("rgb24_area_1920x1080",
     dict(fourcc=FourCC.RGB24, width=1920, height=1080,
          resize_type=R.AREA), (2026855,), True),
    ("bgr24_nearest_540x304",
     dict(fourcc=FourCC.BGR24, width=540, height=304),
     (201454032,), True),
    ("uyvy_nearest_720x480",
     dict(fourcc=FourCC.UYVY, planes=Planes.PLANAR, width=720, height=480),
     (1564587937,), True),
    ("yuv444_nearest_720x480",
     dict(fourcc=FourCC.YUV444, planes=Planes.PLANAR, width=720, height=480),
     (449974214,), True),
    ("nv12_nearest_720x480",
     dict(fourcc=FourCC.NV12, planes=Planes.PLANAR, width=720, height=480),
     (1200915282,), True),
    ("crop_area_up_left",
     dict(fourcc=FourCC.RGB24, crop=(0, 0, 320, 240), width=1920,
          height=1080, resize_type=R.AREA), (2884432201,), True),
    ("crop_area_up_center",
     dict(fourcc=FourCC.RGB24, crop=(320, 240, 720, 480), width=1920,
          height=1080, resize_type=R.AREA), (2674082046,), True),
    ("crop_area_up_right",
     dict(fourcc=FourCC.RGB24, crop=(720, 480, 1080, 608), width=1920,
          height=1080, resize_type=R.AREA), (4006833449,), True),
    ("crop_area_down_center",
     dict(fourcc=FourCC.RGB24, crop=(120, 60, 960, 540), width=320,
          height=240, resize_type=R.AREA), (1183295093,), True),
]

def _host_resize_nv12(native, y, uv, kwargs):
    """Crop (pixel copy) + native host resize for `kwargs`."""
    crop = kwargs.get("crop", (0, 0, 0, 0))
    if crop != (0, 0, 0, 0):
        left, top, right, bottom = crop
        y = np.ascontiguousarray(y[top:bottom, left:right])
        uv = np.ascontiguousarray(uv[top // 2: bottom // 2, left:right])
    sh, sw = y.shape
    dw, dh = kwargs["width"], kwargs["height"]
    oy = np.empty((dh, dw), np.uint8)
    ouv = np.empty((dh // 2, dw), np.uint8)
    native.ts_resize_nv12_host(y.ctypes.data, uv.ctypes.data, sw, sh,
                               oy.ctypes.data, ouv.ctypes.data, dw, dh,
                               HOST_ALGO[kwargs.get("resize_type", R.NEAREST)])
    return oy, ouv


@pytest.mark.parametrize("name,kwargs,want,_", CASES,
                         ids=[c[0] for c in CASES])
def test_host_resize_crc(bbb_frame0, native, name, kwargs, want, _):
    """host_resize path == reference CRC, bit-exact for ALL cases."""
    y, uv, w, h = bbb_frame0
    oy, ouv = _host_resize_nv12(native, y, uv, kwargs)
    cfg = VPPConfig(src_width=kwargs["width"], src_height=kwargs["height"],
                    fourcc=kwargs.get("fourcc", FourCC.RGB24),
                    planes=kwargs.get("planes", Planes.MERGED))
    out = vpp_numpy(cfg, oy, ouv)
    assert av_crc32(out) in want


@pytest.mark.parametrize("name,kwargs,want,device_exact", CASES,
                         ids=[c[0] for c in CASES])
def test_device_resize(bbb_frame0, native, name, kwargs, want, device_exact):
    """Jitted device resize: BIT-EXACT against the native host output
    (and through it the reference CRCs) on EVERY backend — XLA's f32
    contraction freedom is closed with error-free-transformation blends
    and exact integer division (ops/exactf32.py). The round-2 ±1
    envelopes (old docs/PARITY.md table) are retired.
    """
    import jax

    from tensor_stream_tpu.ops.crop import crop_nv12
    from tensor_stream_tpu.ops.resize import resize_nv12
    y, uv, w, h = bbb_frame0
    oy, ouv = _host_resize_nv12(native, y, uv, kwargs)
    dw, dh = kwargs["width"], kwargs["height"]
    crop = kwargs.get("crop", (0, 0, 0, 0))
    rt = kwargs.get("resize_type", R.NEAREST)

    def fn(a, b):
        cw, ch = w, h
        if crop != (0, 0, 0, 0):
            a, b = crop_nv12(a, b, *crop)
            cw, ch = crop[2] - crop[0], crop[3] - crop[1]
        return resize_nv12(a, b, cw, ch, dw, dh, rt)

    dy, duv = jax.jit(fn)(y, uv)
    dy, duv = np.asarray(dy), np.asarray(duv)
    assert np.array_equal(oy, dy), (
        f"{(oy != dy).sum()} Y pixels differ from the host-exact bytes")
    assert np.array_equal(ouv, duv), (
        f"{(ouv != duv).sum()} UV pixels differ from the host-exact bytes")

    cfg = VPPConfig(src_width=w, src_height=h, **kwargs)
    out = vpp_numpy(cfg, y, uv)
    assert out.shape == cfg.output_shape()
    assert av_crc32(out) in want


@pytest.mark.parametrize("algo", [R.NEAREST, R.BILINEAR, R.BICUBIC, R.AREA])
def test_device_resize_fuzz_matches_host(native, algo):
    """Random-frame fuzz: the integer device blends equal the native
    host resize byte-for-byte across awkward non-dyadic geometries (up,
    down, anisotropic). For bicubic this is the empirical seal on the
    2^-50 fixed-point quantization argument (ops/resize.py); for
    bilinear/AREA the softfloat emulation is exact by construction and
    this guards the implementation."""
    import jax

    from tensor_stream_tpu.ops.resize import resize_nv12

    rng = np.random.default_rng(1234 + algo.value)
    geometries = [((64, 48), (52, 36)), ((64, 48), (100, 76)),
                  ((100, 76), (64, 18)), ((56, 34), (146, 108))]
    for (sw, sh), (dw, dh) in geometries:
        fn = jax.jit(lambda a, b, _sw=sw, _sh=sh, _dw=dw, _dh=dh:
                     resize_nv12(a, b, _sw, _sh, _dw, _dh, algo))
        for _ in range(4):
            y = rng.integers(0, 256, (sh, sw), np.uint8)
            uv = rng.integers(0, 256, (sh // 2, sw), np.uint8)
            oy = np.empty((dh, dw), np.uint8)
            ouv = np.empty((dh // 2, dw), np.uint8)
            native.ts_resize_nv12_host(
                y.ctypes.data, uv.ctypes.data, sw, sh,
                oy.ctypes.data, ouv.ctypes.data, dw, dh, HOST_ALGO[algo])
            dy, duv = fn(y, uv)
            assert np.array_equal(oy, np.asarray(dy)), (sw, sh, dw, dh)
            assert np.array_equal(ouv, np.asarray(duv)), (sw, sh, dw, dh)

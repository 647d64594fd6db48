"""VPP bit-exactness tests against the reference's committed oracles
(reference: tests/src/VPPTests.cpp:100-512): CRC32 of uint8 outputs and
byte-exact float32 golden rasters for normalized outputs."""
import os

import numpy as np
import pytest

from conftest import RESOURCES
from tensor_stream_tpu.enums import FourCC, Planes, ResizeType
from tensor_stream_tpu.ops.vpp import VPPConfig, vpp_numpy
from tensor_stream_tpu.utils.crc import av_crc32

# (name, config kwargs, expected CRC) — reference: VPPTests.cpp:134-222.
CRC_CASES = [
    ("rgb24_merged", dict(fourcc=FourCC.RGB24, width=1080, height=608), 2225932432),
    ("rgb24_planar", dict(fourcc=FourCC.RGB24, planes=Planes.PLANAR,
                          width=1080, height=608), 3151499217),
    ("rgb24_down_nearest", dict(fourcc=FourCC.RGB24, width=540, height=304), 3545075074),
    ("rgb24_up_nearest", dict(fourcc=FourCC.RGB24, width=2160, height=1216), 97423732),
    ("bgr24_merged", dict(fourcc=FourCC.BGR24, width=1080, height=608), 2467105116),
    ("bgr24_planar", dict(fourcc=FourCC.BGR24, planes=Planes.PLANAR,
                          width=1080, height=608), 3969775694),
    ("y800", dict(fourcc=FourCC.Y800, width=1080, height=608), 3265466497),
    ("uyvy", dict(fourcc=FourCC.UYVY, width=1080, height=608), 1323730732),
    ("yuv444", dict(fourcc=FourCC.YUV444, width=1080, height=608), 1110927649),
    ("nv12", dict(fourcc=FourCC.NV12, width=1080, height=608), 2957341121),
]

# Crop boxes (reference: VPPTests.cpp:225-298).
CROP_CASES = [
    ("crop_left", dict(crop=(0, 0, 320, 240)), 3435719157),
    ("crop_center", dict(crop=(320, 240, 720, 480)), 1515981907),
    ("crop_center2", dict(crop=(400, 240, 720, 480)), 655388614),
    ("crop_right", dict(crop=(640, 360, 1080, 608)), 602193072),
    ("crop_up_left", dict(crop=(0, 0, 320, 240), width=720, height=480), 1764198598),
    ("crop_up_center", dict(crop=(160, 120, 480, 360), width=720, height=480), 1834204062),
    ("crop_up_right", dict(crop=(400, 240, 720, 480), width=720, height=480), 1750083777),
    ("crop_down_left", dict(crop=(0, 0, 720, 480), width=480, height=320), 3477030875),
    ("crop_down_right", dict(crop=(480, 340, 1080, 608), width=480, height=320), 2394953726),
]

RASTER_CASES = [
    (FourCC.RGB24, "RGB24Normalization_320x240.yuv"),
    (FourCC.BGR24, "BGR24Normalization_320x240.yuv"),
    (FourCC.Y800, "Y800Normalization_320x240.yuv"),
    (FourCC.UYVY, "UYVYNormalization_320x240.yuv"),
    (FourCC.YUV444, "YUV444Normalization_320x240.yuv"),
    (FourCC.NV12, "NV12Normalization_320x240.yuv"),
    (FourCC.HSV, "HSV_320x240.yuv"),
]


@pytest.mark.parametrize("name,kwargs,expected",
                         CRC_CASES, ids=[c[0] for c in CRC_CASES])
def test_fourcc_crc(bbb_frame0, name, kwargs, expected):
    y, uv, w, h = bbb_frame0
    cfg = VPPConfig(src_width=w, src_height=h, **kwargs)
    out = vpp_numpy(cfg, y, uv)
    assert out.dtype == np.uint8
    assert out.shape == cfg.output_shape()
    assert av_crc32(out) == expected


@pytest.mark.parametrize("name,kwargs,expected",
                         CROP_CASES, ids=[c[0] for c in CROP_CASES])
def test_crop_crc(bbb_frame0, name, kwargs, expected):
    y, uv, w, h = bbb_frame0
    cfg = VPPConfig(src_width=w, src_height=h, fourcc=FourCC.NV12,
                    planes=Planes.PLANAR, **kwargs)
    out = vpp_numpy(cfg, y, uv)
    assert av_crc32(out) == expected


def test_crop_pixel_correctness(bbb_frame0):
    """Cropped pixels equal the source window pixel-by-pixel
    (reference: checkCropCorrectness, VPPTests.cpp:46-99)."""
    y, uv, w, h = bbb_frame0
    left, top, right, bottom = 320, 240, 720, 480
    cfg = VPPConfig(src_width=w, src_height=h, fourcc=FourCC.NV12,
                    crop=(left, top, right, bottom))
    out = vpp_numpy(cfg, y, uv).reshape(-1)
    cw, chh = right - left, bottom - top
    crop_y = out[:cw * chh].reshape(chh, cw)
    crop_uv = out[cw * chh:].reshape(chh // 2, cw)
    np.testing.assert_array_equal(crop_y, y[top:bottom, left:right])
    np.testing.assert_array_equal(crop_uv, uv[top // 2: bottom // 2, left:right])


@pytest.mark.parametrize("fourcc,fname",
                         RASTER_CASES, ids=[c[1].split("_")[0] for c in RASTER_CASES])
def test_normalized_float_golden_raster(bbb_frame0, fourcc, fname):
    """Normalized float32 outputs vs the committed CUDA golden rasters:
    byte-exact, except HSV which is allowed the BASELINE 1e-6 budget (its
    H channel divides by a non-constant where TPU/XLA and CUDA may differ
    in the last ulp)."""
    path = os.path.join(RESOURCES, "test_references", fname)
    if not os.path.exists(path):
        pytest.skip("golden raster not available")
    y, uv, w, h = bbb_frame0
    cfg = VPPConfig(src_width=w, src_height=h, width=320, height=240,
                    fourcc=fourcc, planes=Planes.MERGED, normalization=True)
    out = np.asarray(vpp_numpy(cfg, y, uv), np.float32).reshape(-1)
    golden = np.fromfile(path, np.float32)
    assert out.size == golden.size
    if fourcc == FourCC.HSV:
        assert np.abs(out - golden).max() <= 1e-6
    else:
        assert np.array_equal(out.view(np.uint32), golden.view(np.uint32)), \
            f"max diff {np.abs(out - golden).max()}"


def test_hsv_forces_normalization(bbb_frame0):
    y, uv, w, h = bbb_frame0
    cfg = VPPConfig(src_width=w, src_height=h, fourcc=FourCC.HSV,
                    width=160, height=96, normalization=False)
    assert cfg.normalization is True
    out = vpp_numpy(cfg, y, uv)
    assert out.dtype == np.float32
    assert out[..., 0].min() >= 0 and out[..., 0].max() <= 1  # H in [0,1]
    assert out[..., 2].max() <= 1


def test_resize_skipped_when_same_size(bbb_frame0):
    """Resize to the native size must be the identity on NV12
    (reference: VideoProcessor.cpp:119-129 skips the kernel)."""
    y, uv, w, h = bbb_frame0
    direct = vpp_numpy(VPPConfig(src_width=w, src_height=h,
                                 fourcc=FourCC.NV12), y, uv)
    sized = vpp_numpy(VPPConfig(src_width=w, src_height=h, width=w, height=h,
                                fourcc=FourCC.NV12), y, uv)
    np.testing.assert_array_equal(direct, sized)


def test_batched_vpp_matches_single(bbb_frame0):
    """The TPU batch dispatch must agree with per-frame conversion."""
    from tensor_stream_tpu.ops.vpp import build_vpp_batched
    y, uv, w, h = bbb_frame0
    cfg = VPPConfig(src_width=w, src_height=h, width=224, height=224,
                    resize_type=ResizeType.BILINEAR, fourcc=FourCC.RGB24,
                    planes=Planes.PLANAR, normalization=True)
    single = vpp_numpy(cfg, y, uv)
    ys = np.stack([y, y])
    uvs = np.stack([uv, uv])
    batched = np.asarray(build_vpp_batched(cfg)(ys, uvs))
    assert batched.shape == (2,) + cfg.output_shape()
    np.testing.assert_array_equal(batched[0], single)
    np.testing.assert_array_equal(batched[1], single)


# ------------------------------------------------------------- dtype override

def test_output_dtype_bf16_is_cast_of_contract_output(bbb_frame0):
    """dtype="bfloat16" (TPU extension) must be EXACTLY the contract
    output (reference-exact u8/f32 math) followed by one RN-even cast —
    no change to the conversion arithmetic itself."""
    import jax.numpy as jnp
    y, uv, w, h = bbb_frame0
    for base_kwargs in (
            dict(fourcc=FourCC.RGB24, planes=Planes.PLANAR,
                 normalization=True, width=224, height=224,
                 resize_type=ResizeType.BILINEAR),   # normalized f32 path
            dict(fourcc=FourCC.RGB24, planes=Planes.MERGED),  # u8 path
    ):
        ref = vpp_numpy(VPPConfig(src_width=w, src_height=h,
                                  **base_kwargs), y, uv)
        for dt in ("bfloat16", "float16", "float32"):
            cfg = VPPConfig(src_width=w, src_height=h, dtype=dt,
                            **base_kwargs)
            assert cfg.output_dtype() == jnp.dtype(dt)
            out = vpp_numpy(cfg, y, uv)
            assert out.dtype == jnp.dtype(dt)
            assert out.shape == cfg.output_shape()
            np.testing.assert_array_equal(
                out, np.asarray(jnp.asarray(ref).astype(dt)))


def test_output_dtype_u8_values_exact_in_bf16(bbb_frame0):
    """0..255 are all exactly representable in bfloat16 (8 significand
    bits), so the unnormalized u8 -> bf16 cast is lossless."""
    y, uv, w, h = bbb_frame0
    u8 = vpp_numpy(VPPConfig(src_width=w, src_height=h,
                             fourcc=FourCC.Y800), y, uv)
    bf = vpp_numpy(VPPConfig(src_width=w, src_height=h,
                             fourcc=FourCC.Y800, dtype="bfloat16"), y, uv)
    np.testing.assert_array_equal(bf.astype(np.uint8), u8.reshape(bf.shape))


def test_output_dtype_rejects_unknown():
    with pytest.raises(ValueError, match="dtype"):
        VPPConfig(src_width=64, src_height=64, dtype="int8")

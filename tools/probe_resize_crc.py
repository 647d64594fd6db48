"""Probe the reference's resize CRC oracles against the jitted VPP.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/probe_resize_crc.py
      TS_TEST_TPU=1 python tools/probe_resize_crc.py   (real chip)

Reference CRCs: tests/src/PythonTests.cpp:141-244, VPPTests.cpp:186-229.
"""
import os
import sys

if not os.environ.get("TS_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tensor_stream_tpu import _native
from tensor_stream_tpu.enums import FourCC, Planes, ResizeType
from tensor_stream_tpu.ops.vpp import VPPConfig, vpp_numpy
from tensor_stream_tpu.utils.crc import av_crc32

BBB = "/root/reference/tests/resources/bbb_1080x608_420_10.h264"

R = ResizeType
CASES = [
    # name, kwargs, expected CRCs (any match passes)
    ("rgb24_nearest_480x360", dict(fourcc=FourCC.RGB24, width=480, height=360), (3234932936,)),
    ("rgb24_nearest_1920x1080", dict(fourcc=FourCC.RGB24, width=1920, height=1080), (867059050,)),
    ("rgb24_bilinear_480x360", dict(fourcc=FourCC.RGB24, width=480, height=360, resize_type=R.BILINEAR), (1166179972,)),
    ("rgb24_bilinear_540x304", dict(fourcc=FourCC.RGB24, width=540, height=304, resize_type=R.BILINEAR), (2257004891,)),
    ("rgb24_bilinear_1920x1080", dict(fourcc=FourCC.RGB24, width=1920, height=1080, resize_type=R.BILINEAR), (930427804,)),
    ("rgb24_bicubic_480x360", dict(fourcc=FourCC.RGB24, width=480, height=360, resize_type=R.BICUBIC), (4261607874, 1267073424)),
    ("rgb24_bicubic_540x304", dict(fourcc=FourCC.RGB24, width=540, height=304, resize_type=R.BICUBIC), (4169518778,)),
    ("rgb24_bicubic_1920x1080", dict(fourcc=FourCC.RGB24, width=1920, height=1080, resize_type=R.BICUBIC), (2402019758,)),
    ("rgb24_area_480x360", dict(fourcc=FourCC.RGB24, width=480, height=360, resize_type=R.AREA), (3175240744,)),
    ("rgb24_area_540x304", dict(fourcc=FourCC.RGB24, width=540, height=304, resize_type=R.AREA), (2257004891,)),
    ("rgb24_area_1920x1080", dict(fourcc=FourCC.RGB24, width=1920, height=1080, resize_type=R.AREA), (2026855,)),
    ("bgr24_nearest_540x304", dict(fourcc=FourCC.BGR24, width=540, height=304), (201454032,)),
    ("uyvy_nearest_720x480", dict(fourcc=FourCC.UYVY, planes=Planes.PLANAR, width=720, height=480), (1564587937,)),
    ("yuv444_nearest_720x480", dict(fourcc=FourCC.YUV444, planes=Planes.PLANAR, width=720, height=480), (449974214,)),
    ("nv12_nearest_720x480", dict(fourcc=FourCC.NV12, planes=Planes.PLANAR, width=720, height=480), (1200915282,)),
    ("crop_area_up_left", dict(fourcc=FourCC.RGB24, crop=(0, 0, 320, 240), width=1920, height=1080, resize_type=R.AREA), (2884432201,)),
    ("crop_area_up_center", dict(fourcc=FourCC.RGB24, crop=(320, 240, 720, 480), width=1920, height=1080, resize_type=R.AREA), (2674082046,)),
    ("crop_area_up_right", dict(fourcc=FourCC.RGB24, crop=(720, 480, 1080, 608), width=1920, height=1080, resize_type=R.AREA), (4006833449,)),
    ("crop_area_down_center", dict(fourcc=FourCC.RGB24, crop=(120, 60, 960, 540), width=320, height=240, resize_type=R.AREA), (1183295093,)),
]


def decode_frame0():
    native = _native.load()
    p = native.ts_pipeline_create()
    assert native.ts_pipeline_init(p, BBB.encode(), 5, 10, 3, 0, 0) == 0
    w, h = native.ts_pipeline_width(p), native.ts_pipeline_height(p)
    for _ in range(10):
        native.ts_pipeline_step(p)
        if native.ts_pipeline_frame_index(p) > 0:
            break
    y = np.zeros((h, w), np.uint8)
    uv = np.zeros((h // 2, w), np.uint8)
    assert native.ts_pipeline_get(p, b"probe", 0, y.ctypes.data, uv.ctypes.data) == 1
    native.ts_pipeline_stop(p)
    native.ts_pipeline_destroy(p)
    return y, uv, w, h


def main():
    import jax
    print("backend:", jax.default_backend())
    y, uv, w, h = decode_frame0()
    n_pass = 0
    for name, kwargs, expected in CASES:
        cfg = VPPConfig(src_width=w, src_height=h, **kwargs)
        out = vpp_numpy(cfg, y, uv)
        crc = av_crc32(out)
        ok = crc in expected
        n_pass += ok
        print(f"{'PASS' if ok else 'FAIL'} {name:28s} got={crc} want={expected}")
    print(f"{n_pass}/{len(CASES)} pass")


if __name__ == "__main__":
    main()

"""Diagnose the 4 failing resize CRCs: host strict-IEEE resize vs jitted
device resize — if the host-resized NV12 fed through the (bit-exact)
color conversion matches the reference CRC, the jitted delta is FMA
contraction; otherwise the resize algorithm itself deviates."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tensor_stream_tpu import _native
from tensor_stream_tpu.enums import FourCC, Planes, ResizeType
from tensor_stream_tpu.ops import color as color_ops
from tensor_stream_tpu.ops.crop import crop_nv12
from tensor_stream_tpu.ops.resize import resize_nv12
from tensor_stream_tpu.utils.crc import av_crc32
from tools.probe_resize_crc import decode_frame0

ALGO = {ResizeType.NEAREST: 0, ResizeType.BILINEAR: 1,
        ResizeType.BICUBIC: 2, ResizeType.AREA: 3}

FAILING = [
    ("bilinear_1920x1080", ResizeType.BILINEAR, 1920, 1080, (930427804,)),
    ("bicubic_480x360", ResizeType.BICUBIC, 480, 360, (4261607874, 1267073424)),
    ("bicubic_1920x1080", ResizeType.BICUBIC, 1920, 1080, (2402019758,)),
    ("area_480x360", ResizeType.AREA, 480, 360, (3175240744,)),
]


def host_resize(lib, y, uv, dw, dh, algo):
    sh, sw = y.shape
    oy = np.empty((dh, dw), np.uint8)
    ouv = np.empty((dh // 2, dw), np.uint8)
    lib.ts_resize_nv12_host(y.ctypes.data, uv.ctypes.data, sw, sh,
                            oy.ctypes.data, ouv.ctypes.data, dw, dh, algo)
    return oy, ouv


def main():
    lib = _native.load()
    y, uv, w, h = decode_frame0()
    for name, rt, dw, dh, want in FAILING:
        hy, huv = host_resize(lib, y, uv, dw, dh, ALGO[rt])
        dy, duv = resize_nv12(y, uv, w, h, dw, dh, rt)
        dy, duv = np.asarray(dy), np.asarray(duv)
        ydiff = np.abs(hy.astype(int) - dy.astype(int))
        uvdiff = np.abs(huv.astype(int) - duv.astype(int))
        rgb_host = np.asarray(color_ops.nv12_to_rgb(hy, huv, swap_rb=False,
                                                    planar=False,
                                                    normalization=False))
        crc_host = av_crc32(rgb_host)
        print(f"{name}: host_rgb_crc={crc_host} want={want} "
              f"host_ok={crc_host in want}")
        print(f"  jit vs host: Y diff pixels={int((ydiff > 0).sum())} "
              f"max={int(ydiff.max())}; UV diff={int((uvdiff > 0).sum())} "
              f"max={int(uvdiff.max())}")


if __name__ == "__main__":
    main()

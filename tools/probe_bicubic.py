"""Drive the C bicubic variant probe over the two unmatched CRC oracles
plus the already-matched 540x304 sanity case."""
import ctypes
import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tensor_stream_tpu.utils.crc import av_crc32
from tools.probe_fma import rgb_merged
from tools.probe_resize_crc import decode_frame0

HERE = os.path.dirname(os.path.abspath(__file__))
SO = os.path.join(HERE, "probe_bicubic.so")
subprocess.run(["g++", "-O2", "-ffp-contract=off", "-shared", "-fPIC",
                "-o", SO, os.path.join(HERE, "probe_bicubic.c"), "-lm"],
               check=True)
lib = ctypes.CDLL(SO)
lib.bicubic_resize.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int, ctypes.c_int,
                               ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int]
lib.bicubic_resize.restype = None

TARGETS = [
    (480, 360, (4261607874, 1267073424)),
    (540, 304, (4169518778,)),
    (1920, 1080, (2402019758,)),
]


def run(y, uv, dw, dh, flags):
    sh, sw = y.shape
    oy = np.empty((dh, dw), np.uint8)
    ouv = np.empty((dh // 2, dw), np.uint8)
    lib.bicubic_resize(y.ctypes.data, uv.ctypes.data, sw, sh,
                       oy.ctypes.data, ouv.ctypes.data, dw, dh, flags)
    return oy, ouv


def main():
    y, uv, w, h = decode_frame0()
    for flags in range(16):
        if (flags & 8) and not (flags & 1):
            continue
        line = [f"flags={flags:2d}"]
        hit = 0
        for dw, dh, want in TARGETS:
            crc = av_crc32(rgb_merged(*run(y, uv, dw, dh, flags), False))
            ok = crc in want
            hit += ok
            line.append(f"{dw}x{dh}={'OK' if ok else crc}")
        print(" ".join(line), "<== ALL MATCH" if hit == len(TARGETS) else "")


if __name__ == "__main__":
    main()

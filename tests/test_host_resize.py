"""Native host resize (csrc/vpp_host.cpp) vs the device resize path.

The JAX resize (ops/resize.py) is validated bit-exact against the
reference CUDA kernels' CRC/raster oracles (test_vpp.py /
test_resize_quality.py); matching it bit-for-bit chains the native port
to the same oracles.
"""
import numpy as np
import pytest

from conftest import resource

from tensor_stream_tpu import _native
from tensor_stream_tpu.enums import FourCC, FrameRate, Planes, ResizeType
from tensor_stream_tpu.ops.resize import resize_nv12


def _host_resize(lib, y, uv, dst_w, dst_h, algo):
    sh, sw = y.shape
    out_y = np.empty((dst_h, dst_w), np.uint8)
    out_uv = np.empty((dst_h // 2, dst_w), np.uint8)
    lib.ts_resize_nv12_host(y.ctypes.data, uv.ctypes.data, sw, sh,
                            out_y.ctypes.data, out_uv.ctypes.data,
                            dst_w, dst_h, algo)
    return out_y, out_uv


@pytest.mark.parametrize("algo,rt", [(0, ResizeType.NEAREST),
                                     (1, ResizeType.BILINEAR),
                                     (2, ResizeType.BICUBIC),
                                     (3, ResizeType.AREA)])
@pytest.mark.parametrize("src,dst", [((64, 48), (32, 24)),    # downscale
                                     ((64, 48), (128, 96)),   # upscale
                                     ((320, 240), (224, 224)),
                                     ((1920, 1080), (224, 224)),
                                     ((100, 62), (76, 42))])  # odd ratios
def test_host_resize_matches_device(native, algo, rt, src, dst):
    (sw, sh), (dw, dh) = src, dst
    rng = np.random.default_rng(sw * sh)
    y = rng.integers(0, 256, (sh, sw), np.uint8)
    uv = rng.integers(0, 256, (sh // 2, sw), np.uint8)
    got_y, got_uv = _host_resize(native, y, uv, dw, dh, algo)
    ref_y, ref_uv = resize_nv12(y, uv, sw, sh, dw, dh, rt)
    ref_y, ref_uv = np.asarray(ref_y), np.asarray(ref_uv)
    if rt == ResizeType.NEAREST:
        # Pure gathers: bit-identical on every backend.
        assert np.array_equal(got_y, ref_y)
        assert np.array_equal(got_uv, ref_uv)
    else:
        # The host twin follows nvcc's FMA-contracted rounding order
        # exactly (it is the CRC-pinned reference-exact path,
        # tests/test_resize_crc.py); the jitted device blend is at the
        # mercy of the backend's own f32 contraction, so agreement is
        # within one u8 step on truncation-boundary pixels
        # (docs/PARITY.md).
        assert np.abs(got_y.astype(int) - ref_y.astype(int)).max() <= 1
        assert np.abs(got_uv.astype(int) - ref_uv.astype(int)).max() <= 1
        assert (got_y == ref_y).mean() > 0.97


def test_read_batch_host_resize_matches_device_path(native):
    """End-to-end: host_resize=True matches the device-resize batch path
    on a real stream within one u8 step.

    Exact equality cannot be promised here: inside one fused XLA program
    the backend contracts mul+add into FMA / folds constant weight
    products, skipping f32 roundings of the written order; real video has
    flat regions whose blend lands exactly on truncation boundaries, so a
    skipped rounding flips the output by 1 (nvcc contracted the reference
    kernel the same way — see docs/PARITY.md). The host resize follows
    the strict IEEE order, so agreement is within +-1/255 with the vast
    majority of pixels exact (the raw-resize tests above ARE exact: on
    random data no blend lands on a boundary)."""
    import jax
    from tensor_stream_tpu import TensorStreamConverter

    path = resource("bbb_1080x608_420_10.h264")
    kwargs = dict(pixel_format=FourCC.RGB24, planes_pos=Planes.PLANAR,
                  width=224, height=224, resize_type=ResizeType.BILINEAR,
                  normalization=True)

    def grab(host_resize):
        r = TensorStreamConverter(path, framerate_mode=FrameRate.FAST,
                                  buffer_size=8)
        r.initialize(repeat_number=3)
        r.start()
        t, idx = r.read_batch(4, name="c", host_resize=host_resize,
                              return_index=True, **kwargs)
        out = np.asarray(jax.block_until_ready(t))
        r.stop()
        return out, idx

    dev, idx_dev = grab(False)
    host, idx_host = grab(True)
    assert idx_dev == idx_host
    assert dev.shape == host.shape == (4, 3, 224, 224)
    # A +-1 u8 step in the resized NV12 amplifies through the BT.601
    # matrix (R gain 1.164*dY + 1.596*dV) to at most ~3 RGB steps.
    assert np.abs(dev - host).max() <= 4.0 / 255 + 1e-7
    assert (dev == host).mean() > 0.9


def test_simd_resize_bit_identical_to_scalar(native):
    """The AVX2 resize inner loops (csrc/vpp_host_avx2.cpp: bilinear,
    bicubic, area) must be bit-for-bit equal to the scalar paths: per
    lane they execute the identical IEEE operation sequences (fmaf
    chains for bilinear/area, plain-mul/add f64 chains with an exact
    round-half-away emulation for bicubic), so this is an equality
    assertion, not a tolerance. Scalar results come from a subprocess
    with TS_HOST_SIMD=0 (the toggle is latched at first use). Shapes
    cover down/up-scale, odd ratios, and right-edge tails where the
    gather window forces the scalar fallback columns.
    """
    import hashlib
    import os
    import subprocess
    import sys

    if not native.ts_host_simd_available():
        pytest.skip("AVX2+FMA not available on this CPU")

    code = r'''
import sys; sys.path.insert(0, %r)
import ctypes, hashlib
import numpy as np
from tensor_stream_tpu import _native
lib = _native.load()
assert lib.ts_host_simd_available() == %d
rng = np.random.default_rng(7)
h = hashlib.sha256()
shapes = [(1920, 1080, 224, 224), (1920, 1080, 480, 360),
          (720, 480, 1920, 1080), (720, 480, 540, 304),
          (640, 360, 638, 358), (16, 16, 1024, 768),
          (1920, 1080, 8, 8), (102, 62, 100, 60), (100, 60, 102, 62)]
for sw, sh, dw, dh in shapes:
    y = np.ascontiguousarray(rng.integers(0, 255, (sh, sw), np.uint8))
    uv = np.ascontiguousarray(rng.integers(0, 255, (sh // 2, sw), np.uint8))
    oy = np.zeros((dh, dw), np.uint8)
    ouv = np.zeros((dh // 2, dw), np.uint8)
    for algo in (1, 2, 3):  # bilinear, bicubic, area (down + upscale)
        lib.ts_resize_nv12_host(y.ctypes.data, uv.ctypes.data, sw, sh,
                                oy.ctypes.data, ouv.ctypes.data, dw, dh, algo)
        h.update(oy.tobytes()); h.update(ouv.tobytes())
print(h.hexdigest())
'''
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def digest(simd_on):
        env = dict(os.environ)
        env["TS_HOST_SIMD"] = "1" if simd_on else "0"
        r = subprocess.run(
            [sys.executable, "-c", code % (repo, 1 if simd_on else 0)],
            env=env, capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout.strip()

    assert digest(True) == digest(False)

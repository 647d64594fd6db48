"""Reconstruct the reference CUDA bytes for the failing resize CRCs by
emulating nvcc's default FMA contraction (-fmad=true) in numpy.

Each f32 op is emulated exactly; fma32(a,b,c) emulates a single-rounding
f32 FMA via float64 (exact for these operand ranges). If a variant's CRC
matches the committed oracle, we have recovered the reference's exact
arithmetic order and can measure our product path's deviation against it.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tensor_stream_tpu.ops.resize import (_area_axis_down, _bilinear_axis,
                                          _bilinear_tables)
from tensor_stream_tpu.utils.crc import av_crc32
from tools.probe_resize_crc import decode_frame0

f32 = np.float32
f64 = np.float64


def fma32(a, b, c):
    return (np.asarray(a, f64) * np.asarray(b, f64) + np.asarray(c, f64)).astype(f32)


# ---------------------------------------------------------------- bilinear

def bilin_plane(img, row_a, row_c, col_a, col_b, wx, wy, fma):
    a = img[np.ix_(row_a, col_a)].astype(f32)
    b = img[np.ix_(row_a, col_b)].astype(f32)
    c = img[np.ix_(row_c, col_a)].astype(f32)
    d = img[np.ix_(row_c, col_b)].astype(f32)
    wx = wx[None, :].astype(f32)
    wy = wy[:, None].astype(f32)
    omx = f32(1) - wx
    omy = f32(1) - wy
    if not fma:
        v = a * omx * omy + b * wx * omy + c * wy * omx + d * (wx * wy)
    else:
        s = (a * omx) * omy
        s = fma32(b * wx, omy, s)
        s = fma32(c * wy, omx, s)
        s = fma32(d, wx * wy, s)
        v = s
    return v.astype(np.int32).astype(np.uint8)


def bilinear(y, uv, dw, dh, fma):
    sh, sw = y.shape
    xr = f32(sw) / f32(dw)
    yr = f32(sh) / f32(dh)
    xs, wx = _bilinear_axis(dw, xr, sw)
    ys, wy = _bilinear_axis(dh, yr, sh)
    ra, rc, ca, cb = _bilinear_tables(xs, wx, ys, wy, sw, sh)
    oy = bilin_plane(y, ra, rc, ca, cb, wx, wy, fma)
    h2 = sh // 2
    xs_u, wx_u = xs[: dw // 2], wx[: dw // 2]
    ys_u, wy_u = ys[: dh // 2], wy[: dh // 2]
    ra_u = ys_u
    rc_u = np.where(ys_u + 1 >= h2, ys_u, ys_u + 1)
    ua = 2 * xs_u
    ub = np.where(ua + 2 >= sw, ua, ua + 2)
    va = 2 * xs_u + 1
    vb = np.where(va + 2 >= sw, va, va + 2)
    u = bilin_plane(uv, ra_u, rc_u, ua, ub, wx_u, wy_u, fma)
    v = bilin_plane(uv, ra_u, rc_u, va, vb, wx_u, wy_u, fma)
    ouv = np.stack([u, v], axis=-1).reshape(dh // 2, dw)
    return oy, ouv


# -------------------------------------------------------------------- area

def area_down_plane(img, yb, xb, wy, wx, stride, off, fma):
    hi, wi = img.shape
    n_ty, n_tx = wy.shape[1], wx.shape[1]
    acc = np.zeros((len(yb), len(xb)), f32)
    div = np.zeros_like(acc)
    for ti in range(n_ty):
        rows = np.minimum(yb + ti, hi - 1)
        for tj in range(n_tx):
            cols = np.minimum(xb * stride + off + tj * stride, wi - 1)
            w2 = (wy[:, ti][:, None] * wx[:, tj][None, :]).astype(f32)
            p = img[np.ix_(rows, cols)].astype(f32)
            div = div + w2
            acc = fma32(p, w2, acc) if fma else acc + p * w2
    return (acc / div).astype(np.int32).astype(np.uint8)


def area_down(y, uv, dw, dh, fma):
    sh, sw = y.shape
    xr = f32(sw) / f32(dw)
    yr = f32(sh) / f32(dh)
    xb, wx = _area_axis_down(dw, xr)
    yb, wy = _area_axis_down(dh, yr)
    oy = area_down_plane(y, yb, xb, wy, wx, 1, 0, fma)
    xb_u, wx_u = xb[: dw // 2], wx[: dw // 2]
    yb_u, wy_u = yb[: dh // 2], wy[: dh // 2]
    u = area_down_plane(uv, yb_u, xb_u, wy_u, wx_u, 2, 0, fma)
    v = area_down_plane(uv, yb_u, xb_u, wy_u, wx_u, 2, 1, fma)
    ouv = np.stack([u, v], axis=-1).reshape(dh // 2, dw)
    return oy, ouv


# ------------------------------------------------------------------- color

RV = f32(1.5959997177)
BU = f32(2.017999649)
GV = f32(-0.812999725)
GU = f32(-0.390999794)
YC = f32(1.163999557)


def rgb_merged(y, uv, fma):
    u = np.repeat(np.repeat(uv[:, 0::2], 2, 0), 2, 1).astype(np.int32)
    v = np.repeat(np.repeat(uv[:, 1::2], 2, 0), 2, 1).astype(np.int32)
    yf = np.maximum(f32(0), y.astype(f32) - f32(16)) * YC
    vi = (v - 128).astype(f32)
    ui = (u - 128).astype(f32)
    if not fma:
        rv = RV * vi + f32(0.5)
        bv = BU * ui + f32(0.5)
        gv = GV * vi + GU * ui + f32(0.5)
    else:
        rv = fma32(RV, vi, f32(0.5))
        bv = fma32(BU, ui, f32(0.5))
        gv = fma32(GU, ui, GV * vi) + f32(0.5)
    r = np.clip((yf + rv).astype(np.int32), 0, 255)
    b = np.clip((yf + bv).astype(np.int32), 0, 255)
    g = np.clip((yf + gv).astype(np.int32), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def bilinear_axis_v(dst_n, ratio, src_n, coord_fma):
    j = np.arange(dst_n, dtype=f32)
    if coord_fma:
        fr = fma32(j + f32(0.5), ratio, f32(-0.5))
    else:
        fr = (j + f32(0.5)) * ratio - f32(0.5)
    base = np.floor(fr).astype(np.int64)
    w = (fr - base.astype(f32)).astype(f32)
    low = base < 0
    base[low] = 0
    w[low] = 0
    high = base > src_n - 1
    base[high] = src_n - 1
    w[high] = 0
    return base, w


def bilin_plane_v(img, row_a, row_c, col_a, col_b, wx, wy, mode):
    a = img[np.ix_(row_a, col_a)].astype(f32)
    b = img[np.ix_(row_a, col_b)].astype(f32)
    c = img[np.ix_(row_c, col_a)].astype(f32)
    d = img[np.ix_(row_c, col_b)].astype(f32)
    wx = wx[None, :].astype(f32)
    wy = wy[:, None].astype(f32)
    omx = f32(1) - wx
    omy = f32(1) - wy
    if mode == 0:    # strict
        v = a * omx * omy + b * wx * omy + c * wy * omx + d * (wx * wy)
    elif mode == 1:  # fuse right operand of every add
        s = (a * omx) * omy
        s = fma32(b * wx, omy, s)
        s = fma32(c * wy, omx, s)
        s = fma32(d, wx * wy, s)
        v = s
    else:            # fuse left operand of first add
        s = fma32(a * omx, omy, (b * wx) * omy)
        s = fma32(c * wy, omx, s)
        s = fma32(d, wx * wy, s)
        v = s
    return v.astype(np.int32).astype(np.uint8)


def bilinear_v(y, uv, dw, dh, coord_fma, mode):
    sh, sw = y.shape
    xr = f32(sw) / f32(dw)
    yr = f32(sh) / f32(dh)
    xs, wx = bilinear_axis_v(dw, xr, sw, coord_fma)
    ys, wy = bilinear_axis_v(dh, yr, sh, coord_fma)
    ra, rc, ca, cb = _bilinear_tables(xs, wx, ys, wy, sw, sh)
    oy = bilin_plane_v(y, ra, rc, ca, cb, wx, wy, mode)
    h2 = sh // 2
    xs_u, wx_u = xs[: dw // 2], wx[: dw // 2]
    ys_u, wy_u = ys[: dh // 2], wy[: dh // 2]
    rc_u = np.where(ys_u + 1 >= h2, ys_u, ys_u + 1)
    ua = 2 * xs_u
    ub = np.where(ua + 2 >= sw, ua, ua + 2)
    va = 2 * xs_u + 1
    vb = np.where(va + 2 >= sw, va, va + 2)
    u = bilin_plane_v(uv, ys_u, rc_u, ua, ub, wx_u, wy_u, mode)
    v = bilin_plane_v(uv, ys_u, rc_u, va, vb, wx_u, wy_u, mode)
    ouv = np.stack([u, v], axis=-1).reshape(dh // 2, dw)
    return oy, ouv


def main():
    y, uv, w, h = decode_frame0()
    print("== bilinear 1920x1080, want 930427804")
    for coord in (False, True):
        for mode in (0, 1, 2):
            ry, ruv = bilinear_v(y, uv, 1920, 1080, coord, mode)
            for cf in (False, True):
                crc = av_crc32(rgb_merged(ry, ruv, cf))
                print(f"  coord_fma={coord} blend_mode={mode} color_fma={cf}: {crc}"
                      f"{'  <== MATCH' if crc == 930427804 else ''}")
    print("== bilinear sanity: 480x360 want 1166179972, 540x304 want 2257004891")
    for coord in (False, True):
        for mode in (0, 1, 2):
            a = av_crc32(rgb_merged(*bilinear_v(y, uv, 480, 360, coord, mode), False))
            b = av_crc32(rgb_merged(*bilinear_v(y, uv, 540, 304, coord, mode), False))
            print(f"  coord_fma={coord} blend_mode={mode}: 480x360={a} "
                  f"{'OK' if a == 1166179972 else 'X'}  540x304={b} "
                  f"{'OK' if b == 2257004891 else 'X'}")
    print("== area 480x360, want 3175240744")
    for rf in (False, True):
        ry, ruv = area_down(y, uv, 480, 360, rf)
        for cf in (False, True):
            crc = av_crc32(rgb_merged(ry, ruv, cf))
            print(f"  area_fma={rf} color_fma={cf}: {crc}"
                  f"{'  <== MATCH' if crc == 3175240744 else ''}")


if __name__ == "__main__":
    main()

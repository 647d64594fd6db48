"""NV12-domain resize: NEAREST / BILINEAR / BICUBIC / AREA.

TPU re-design of the reference CUDA resize kernels
(reference: src/Resize.cu:160-473). Resize runs on NV12 (Y plane +
half-height interleaved UV), before color conversion, exactly like the
reference (README.md:146) — this ordering is what the CRC/PSNR oracles
encode.

Design: every per-pixel index and weight in the reference depends only on
the output row or the output column, so all index/weight tables are
precomputed on the host with NumPy at trace time (in the exact float32 /
float64 arithmetic the CUDA code used) and baked into the jitted program
as constants. The device side is then a handful of per-axis gathers
(`take`) plus vectorized f32 arithmetic in the reference's accumulation
order — XLA fuses it into one pass over the planes.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import ResizeType
from .exactf32 import (const_me, div_f32, f32_to_me, fma32v_many,
                       trunc_u8)

_EPS32 = np.float32(np.finfo(np.float32).eps)


# --------------------------------------------------------------- helpers

def _take2(img, rows, cols):
    """img[rows][:, cols] — separable gather."""
    return jnp.take(jnp.take(img, rows, axis=0), cols, axis=1)


def _trunc_u8(x):
    """C-style (int) cast of nonnegative f32 then uint8 store."""
    return x.astype(jnp.int32).astype(jnp.uint8)


# --------------------------------------------------------------- nearest

def _nearest_axis(dst_n: int, ratio: np.float32) -> np.ndarray:
    # x = (int)(xRatio * j): f32 product truncated (src/Resize.cu:249-250).
    j = np.arange(dst_n, dtype=np.float32)
    return (ratio * j).astype(np.int64)


def resize_nearest(y, uv, src_w, src_h, dst_w, dst_h):
    x_ratio = np.float32(src_w) / np.float32(dst_w)
    y_ratio = np.float32(src_h) / np.float32(dst_h)
    xs = _nearest_axis(dst_w, x_ratio)
    ys = _nearest_axis(dst_h, y_ratio)
    y_out = _take2(y, ys, xs)
    # UV: dst (i, 2j / 2j+1) <- src (y[i], 2x[j] / 2x[j]+1) over half dims
    # (src/Resize.cu:262-265).
    xs_uv = xs[: dst_w // 2]
    ys_uv = ys[: dst_h // 2]
    cols = np.empty(dst_w, dtype=np.int64)
    cols[0::2] = 2 * xs_uv
    cols[1::2] = 2 * xs_uv + 1
    uv_out = _take2(uv, ys_uv, cols)
    return y_out, uv_out


# -------------------------------------------------------------- bilinear

def _coord_fma(dst_n: int, ratio: np.float32) -> np.ndarray:
    """f32 center-aligned coordinate fmaf(j+0.5, ratio, -0.5).

    nvcc contracts the reference's `(j + 0.5f) * ratio - 0.5f`
    (src/Resize.cu:277-278, 322-323) into a single-rounding FMA; emulated
    exactly here via float64 (the product is exact in f64, so the one
    f32 cast is the one FMA rounding). Verified against the reference's
    bilinear CRC oracles: the strictly-rounded form flips floor/weight on
    boundary ratios (e.g. 608->1080) and misses them.
    """
    j = np.arange(dst_n, dtype=np.float32)
    f64 = (j + np.float32(0.5)).astype(np.float64) * np.float64(ratio) - 0.5
    return f64.astype(np.float32)


def _bilinear_axis(dst_n: int, ratio: np.float32, src_n: int):
    """Center-aligned source coordinate with the reference's border clamps
    (src/Resize.cu:276-302): x<0 -> (0, w=0); x>src-1 -> (src-1, w=0)."""
    f = _coord_fma(dst_n, ratio)
    base = np.floor(f).astype(np.int64)
    w = (f - base.astype(np.float32)).astype(np.float32)
    low = base < 0
    base[low] = 0
    w[low] = 0
    high = base > src_n - 1
    base[high] = src_n - 1
    w[high] = 0
    return base, w


def _bilinear_planes(specs):
    """4-tap blend of N independent planes in nvcc's FMA-contracted
    rounding order (src/Resize.cu:5-25; exact order reconstructed in
    csrc/vpp_host.cpp Blend4):
        s = fmaf(a*omx, omy, (b*wx)*omy)
        s = fmaf(c*wy, omx, s); s = fmaf(d, wx*wy, s)
    XLA exposes no FMA op and the TPU backend has no f64, so each fmaf
    is the error-free-transformation emulation (ops/exactf32.py, with
    optimization barriers pinning every semantically-required rounding
    against contraction) — bit-identical on every backend, reproducing
    the committed CRCs. The planes (Y, U, V) run their chains in
    LOCKSTEP through fma32v_many so each of the three fmaf steps costs
    one shared barrier instead of several per plane — on TPU every
    barrier is a fusion boundary (a kernel launch), and this grouping
    is most of the exact device path's speed.

    Each spec is (img, row_a, row_c, col_a, col_b, wx, wy); returns the
    list of uint8 output planes."""
    head = []
    for img, row_a, row_c, col_a, col_b, wx, wy in specs:
        a = _take2(img, row_a, col_a).astype(jnp.float32)
        b = _take2(img, row_a, col_b).astype(jnp.float32)
        c = _take2(img, row_c, col_a).astype(jnp.float32)
        d = _take2(img, row_c, col_b).astype(jnp.float32)
        wx = np.asarray(wx, np.float32)[None, :]
        wy = np.asarray(wy, np.float32)[:, None]
        omx = np.float32(1) - wx
        omy = np.float32(1) - wy
        # Value-based exact chain (ops/exactf32.py): lone f32 multiplies
        # ARE single roundings (contraction only fuses mul INTO add, and
        # the fma steps are the EFT emulation), so no wide integers are
        # needed.
        t1 = (b * jnp.asarray(wx)) * jnp.asarray(omy)
        head.append((a, c, d, wx, wy, omx, omy, t1))
    s = fma32v_many([(a * jnp.asarray(omx), omy, t1)
                     for a, c, d, wx, wy, omx, omy, t1 in head])
    s = fma32v_many([(c * jnp.asarray(wy), omx, si)
                     for (a, c, d, wx, wy, omx, omy, t1), si
                     in zip(head, s)])
    s = fma32v_many([(d, jnp.asarray(wx) * jnp.asarray(wy), si)
                     for (a, c, d, wx, wy, omx, omy, t1), si
                     in zip(head, s)])
    return [_trunc_u8(si) for si in s]


def _bilinear_tables(xs, ws_x, ys, ws_y, src_w, src_h):
    """Derives gather tables for Y and UV planes from the per-axis bases.

    Edge rules from calculateBillinearInterpolation (src/Resize.cu:5-14):
    the +xDiff column collapses when x+xDiff >= width, the +yDiff row
    reads row y again (linesize=0) when y+yDiff >= height.
    """
    col_a = xs
    col_b = np.where(xs + 1 >= src_w, xs, xs + 1)
    row_a = ys
    row_c = np.where(ys + 1 >= src_h, ys, ys + 1)
    return row_a, row_c, col_a, col_b


def _bilinear_uv_specs(uv, xs, ws_x, ys, ws_y, src_w, src_h, dst_w, dst_h):
    """U/V plane specs: x->2x (U) / 2x+1 (V), xDiff=2, height=src_h/2
    (src/Resize.cu:235-238, 307-310)."""
    h2 = src_h // 2
    xs_uv = xs[: dst_w // 2]
    wx_uv = ws_x[: dst_w // 2]
    ys_uv = ys[: dst_h // 2]
    wy_uv = ws_y[: dst_h // 2]
    row_a = ys_uv
    row_c = np.where(ys_uv + 1 >= h2, ys_uv, ys_uv + 1)
    u_a = 2 * xs_uv
    u_b = np.where(u_a + 2 >= src_w, u_a, u_a + 2)
    v_a = 2 * xs_uv + 1
    v_b = np.where(v_a + 2 >= src_w, v_a, v_a + 2)
    return [(uv, row_a, row_c, u_a, u_b, wx_uv, wy_uv),
            (uv, row_a, row_c, v_a, v_b, wx_uv, wy_uv)]


def _bilinear_yuv(y, uv, xs, wx, ys, wy, src_w, src_h, dst_w, dst_h):
    """Y + U + V through one lockstep blend (shared barriers)."""
    row_a, row_c, col_a, col_b = _bilinear_tables(xs, wx, ys, wy, src_w, src_h)
    specs = [(y, row_a, row_c, col_a, col_b, wx, wy)]
    specs += _bilinear_uv_specs(uv, xs, wx, ys, wy, src_w, src_h,
                                dst_w, dst_h)
    y_out, u_out, v_out = _bilinear_planes(specs)
    uv_out = jnp.stack([u_out, v_out], axis=-1).reshape(dst_h // 2, dst_w)
    return y_out, uv_out


def resize_bilinear(y, uv, src_w, src_h, dst_w, dst_h):
    x_ratio = np.float32(src_w) / np.float32(dst_w)
    y_ratio = np.float32(src_h) / np.float32(dst_h)
    xs, wx = _bilinear_axis(dst_w, x_ratio, src_w)
    ys, wy = _bilinear_axis(dst_h, y_ratio, src_h)
    return _bilinear_yuv(y, uv, xs, wx, ys, wy, src_w, src_h, dst_w, dst_h)


# --------------------------------------------------------------- bicubic

def _bicubic_axis(dst_n: int, ratio: np.float32, src_n: int):
    """f64 coordinate of the f32 expression (src/Resize.cu:321-347);
    the inner f32 expression is FMA-contracted like the bilinear one."""
    f = _coord_fma(dst_n, ratio).astype(np.float64)
    base = np.floor(f).astype(np.int64)
    w = f - base
    low = base < 0
    base[low] = 0
    w[low] = 0.0
    high = base > src_n - 1
    base[high] = src_n - 1
    w[high] = 0.0
    return base, w


def _bicubic_coefs(w: np.ndarray):
    """Catmull-Rom-style spline weights, a=-0.75, computed in float64
    exactly as the CUDA code (src/Resize.cu:45-50)."""
    a = -0.75
    w2, w3 = w ** 2, w ** 3
    c0 = a * w - 2 * a * w2 + a * w3
    c1 = 1 - (a + 3) * w2 + (a + 2) * w3
    c2 = -a * w + (2 * a + 3) * w2 - (a + 2) * w3
    c3 = a * w2 - a * w3
    return np.stack([c0, c1, c2, c3])  # (4, dst_n) float64


def _bicubic_taps(base: np.ndarray, diff: int, n: int):
    """Tap positions (-diffTop, 0, +diff, +2diff) with the reference's
    collapse rules (src/Resize.cu:29-43): +taps collapse when either
    base+diff or base+2*diff crosses the bound; the -tap collapses at 0."""
    d = np.full_like(base, diff)
    d[base + diff >= n] = 0
    d[base + 2 * diff >= n] = 0
    d_top = np.full_like(base, diff)
    d_top[base - diff < 0] = 0
    return np.stack([base - d_top, base, base + d, base + 2 * d])  # (4, dst_n)


_BICUBIC_SCALE = 50  # fixed-point fractional bits


def _bicubic_plane(img, row_taps, col_taps, cx, cy):
    """Two-pass spline: horizontal blend at each of 4 row taps (rounded
    and clamped to [0,255] per intermediate row, src/Resize.cu:47-80),
    then vertical blend (src/Resize.cu:82-88).

    The reference blends in f64 — contraction-insensitive at that
    precision (docs/PARITY.md) — but the TPU backend has no native f64,
    so the blend runs in 2^-50 fixed-point i64: coefficient quantization
    error <= 4*255*2^-51 ~ 2^-41 absolute, orders below the f64 result's
    distance to the floor(x+0.5) boundaries (dyadic weights quantize
    EXACTLY, which covers the boundary-dense flat/half-tone cases).
    Integer ops make the bytes identical on every backend; equality with
    the f64 host path is pinned by the CRC suite + random-frame fuzz
    (tests/test_resize_crc.py::test_bicubic_fixed_point_matches_host).
    Arithmetic >> is floor division, so floor(acc + 0.5) =
    (acc_q + 2^(S-1)) >> S holds for negative overshoot too."""
    S = _BICUBIC_SCALE
    cxq = np.round(cx * float(1 << S)).astype(np.int64)  # (4, W)
    cyq = np.round(cy * float(1 << S)).astype(np.int64)  # (4, H)
    with jax.enable_x64(True):
        half = jnp.int64(1) << (S - 1)
        rows_out = []
        for r in range(4):
            acc = None
            for k in range(4):
                p = _take2(img, row_taps[r], col_taps[k]).astype(jnp.int64)
                term = jnp.asarray(cxq[k])[None, :] * p
                acc = term if acc is None else acc + term
            b = jnp.clip((acc + half) >> S, 0, 255)
            rows_out.append(b)
        acc = None
        for r in range(4):
            term = jnp.asarray(cyq[r])[:, None] * rows_out[r]
            acc = term if acc is None else acc + term
        value = jnp.clip((acc + half) >> S, 0, 255)
        out = value.astype(jnp.uint8)
    return out


def resize_bicubic(y, uv, src_w, src_h, dst_w, dst_h):
    x_ratio = np.float32(src_w) / np.float32(dst_w)
    y_ratio = np.float32(src_h) / np.float32(dst_h)
    xs, wx = _bicubic_axis(dst_w, x_ratio, src_w)
    ys, wy = _bicubic_axis(dst_h, y_ratio, src_h)
    cx, cy = _bicubic_coefs(wx), _bicubic_coefs(wy)
    col_taps = _bicubic_taps(xs, 1, src_w)
    row_taps = _bicubic_taps(ys, 1, src_h)
    y_out = _bicubic_plane(y, row_taps, col_taps, cx, cy)

    h2 = src_h // 2
    xs_uv, ys_uv = xs[: dst_w // 2], ys[: dst_h // 2]
    cx_uv = cx[:, : dst_w // 2]
    cy_uv = cy[:, : dst_h // 2]
    row_taps_uv = _bicubic_taps(ys_uv, 1, h2)
    u_taps = _bicubic_taps(2 * xs_uv, 2, src_w)
    v_taps = _bicubic_taps(2 * xs_uv + 1, 2, src_w)
    u_out = _bicubic_plane(uv, row_taps_uv, u_taps, cx_uv, cy_uv)
    v_out = _bicubic_plane(uv, row_taps_uv, v_taps, cx_uv, cy_uv)
    uv_out = jnp.stack([u_out, v_out], axis=-1).reshape(dst_h // 2, dst_w)
    return y_out, uv_out


# ------------------------------------------------------------------ area

def generate_resize_pattern(scale: np.float32):
    """Fractional pixel-coverage rows of the OpenCV-INTER_AREA-style box
    filter, ported from the reference host code including its float32
    arithmetic and epsilon loop bound (src/Resize.cu:359-386)."""
    scale = np.float32(scale)
    pattern = []
    rest = np.float32(0)
    current = 0
    width = int(math.ceil(float(scale)))
    while True:
        prod = np.float32(current) * scale
        if not (prod == 0 or (prod - np.float32(int(prod))) > _EPS32):
            break
        dyn = scale
        row = []
        if rest:
            row.append(np.float32(rest))
            dyn = np.float32(dyn - rest)
        while dyn - 1 > 0:
            row.append(np.float32(1))
            dyn = np.float32(dyn - 1)
        if dyn > _EPS32:
            row.append(np.float32(dyn))
            rest = np.float32(1 - dyn)
        while len(row) < width:
            row.append(np.float32(0))
        # Rows can come out one entry longer than ceil(scale) (a leading
        # `rest` plus a trailing fraction); the reference's kernel only
        # ever reads the first ceil(scale) taps (src/Resize.cu:162-166),
        # so the tail weight is dead — truncate to match.
        pattern.append(row[:width])
        current += 1
        if current > 8192:  # safety bound; the reference could spin forever
            break
    return np.asarray(pattern, dtype=np.float32)  # (period, ceil(scale))


def _area_down_planes(specs):
    """Weighted box sum of N independent planes in the reference's exact
    f32 rounding order (src/Resize.cu:160-178, reconstructed in
    csrc/vpp_host.cpp:330-355): per tap `w2d = f32(wy*wx)`,
    `div += w2d` (plain f32 add), `acc = fmaf(p, w2d, acc)`; then
    `(int)(acc / div)` with a single f32 division. The divide chain is
    input-independent, so it is precomputed host-side in NumPy f32
    (same op order); the fmaf chain and the division are emulated
    exactly on device (ops/exactf32.py), making the AREA CRCs bit-exact
    on every backend. The Y/U/V tap chains run in LOCKSTEP through
    fma32v_many — one shared barrier per tap step instead of several
    per plane (each is a fusion boundary / kernel launch on TPU).

    Each spec is (img, y_base, x_base, wy, wx, stride, col_off); every
    spec must share the same tap-grid shape (wy.shape[1], wx.shape[1])
    — true for NV12: the UV plane halves both dims, so its ratios and
    pattern widths equal the Y plane's. Returns the uint8 planes."""
    n_ty, n_tx = specs[0][3].shape[1], specs[0][4].shape[1]
    pre = []
    for img, y_base, x_base, wy, wx, stride, col_off in specs:
        assert (wy.shape[1], wx.shape[1]) == (n_ty, n_tx)
        wy32 = np.asarray(wy, np.float32)
        wx32 = np.asarray(wx, np.float32)
        div_host = np.zeros((wy32.shape[0], wx32.shape[0]), np.float32)
        acc = jnp.zeros((wy32.shape[0], wx32.shape[0]), jnp.float32)
        pre.append([img, y_base, x_base, wy32, wx32, stride, col_off,
                    div_host, acc])
    for ti in range(n_ty):
        for tj in range(n_tx):
            triples = []
            for s in pre:
                img, y_base, x_base, wy32, wx32, stride, col_off = s[:7]
                h_img, w_img = img.shape
                rows = np.minimum(y_base + ti, h_img - 1)
                cols = np.minimum(x_base * stride + col_off + tj * stride,
                                  w_img - 1)
                w2d = wy32[:, ti][:, None] * wx32[:, tj][None, :]  # f32 mul
                s[7] = s[7] + w2d                                  # f32 add
                p = _take2(img, rows, cols).astype(jnp.float32)
                triples.append((p, w2d, s[8]))
            accs = fma32v_many(triples)  # exact fmaf chains, f32 values
            for s, acc in zip(pre, accs):
                s[8] = acc
    # Only the division is wide-integer (backend f32 division is not
    # guaranteed correctly rounded): one (m, e) extraction per pixel.
    outs = []
    with jax.enable_x64(True):
        for s in pre:
            mdiv, ediv = const_me(s[7])
            am, ae = f32_to_me(s[8])
            qm, qe = div_f32(am, ae, jnp.asarray(mdiv), jnp.asarray(ediv))
            outs.append(trunc_u8(qm, qe))
    return outs


def _area_axis_down(dst_n: int, ratio: np.float32):
    j = np.arange(dst_n, dtype=np.float32)
    base = (ratio * j).astype(np.float32)
    base = np.floor(base.astype(np.int32).astype(np.float32)).astype(np.int64)
    pattern = generate_resize_pattern(ratio)
    rows = pattern[np.arange(dst_n) % pattern.shape[0]]  # (dst_n, taps)
    return base, rows


def resize_area(y, uv, src_w, src_h, dst_w, dst_h):
    x_ratio = np.float32(src_w) / np.float32(dst_w)
    y_ratio = np.float32(src_h) / np.float32(dst_h)
    if x_ratio > 1 and y_ratio > 1:
        xb, wx = _area_axis_down(dst_w, x_ratio)
        yb, wy = _area_axis_down(dst_h, y_ratio)
        xb_uv, wx_uv = xb[: dst_w // 2], wx[: dst_w // 2]
        yb_uv, wy_uv = yb[: dst_h // 2], wy[: dst_h // 2]
        y_out, u, v = _area_down_planes([
            (y, yb, xb, wy, wx, 1, 0),
            (uv, yb_uv, xb_uv, wy_uv, wx_uv, 2, 0),
            (uv, yb_uv, xb_uv, wy_uv, wx_uv, 2, 1)])
        uv_out = jnp.stack([u, v], axis=-1).reshape(dst_h // 2, dst_w)
        return y_out, uv_out
    # Upscale: bilinear with coverage-derived weights (src/Resize.cu:214-240).
    xs, wx = _area_axis_up(dst_w, x_ratio)
    ys, wy = _area_axis_up(dst_h, y_ratio)
    return _bilinear_yuv(y, uv, xs, wx, ys, wy, src_w, src_h, dst_w, dst_h)


def _area_axis_up(dst_n: int, ratio: np.float32):
    """x = floor(ratio*j); w = frac((j+1) - (x+1)/ratio), clamped at 0
    (src/Resize.cu:220-232)."""
    j = np.arange(dst_n, dtype=np.float32)
    base = np.floor(ratio * j).astype(np.float32)
    w = (j + 1) - (base + 1) / ratio
    w = np.where(w <= 0, np.float32(0), w - np.floor(w)).astype(np.float32)
    return base.astype(np.int64), w


# ------------------------------------------------------------- dispatcher

def resize_nv12(y, uv, src_w, src_h, dst_w, dst_h, resize_type: ResizeType):
    if resize_type == ResizeType.NEAREST:
        return resize_nearest(y, uv, src_w, src_h, dst_w, dst_h)
    if resize_type == ResizeType.BILINEAR:
        return resize_bilinear(y, uv, src_w, src_h, dst_w, dst_h)
    if resize_type == ResizeType.BICUBIC:
        return resize_bicubic(y, uv, src_w, src_h, dst_w, dst_h)
    if resize_type == ResizeType.AREA:
        return resize_area(y, uv, src_w, src_h, dst_w, dst_h)
    raise ValueError(f"unsupported resize type {resize_type}")

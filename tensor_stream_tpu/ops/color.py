"""NV12 color conversions: RGB24/BGR24, Y800, UYVY, YUV444, NV12-merge, HSV.

TPU re-design of the reference CUDA conversion kernels
(reference: src/ColorConversion.cu:6-278). The math — BT.601 full-swing
constants, the +0.5 rounding bias, truncating int casts, per-channel /255
normalization, the 422/444 chroma interpolation filters including their
integer-division and wrap-around quirks — is reproduced operation by
operation in float32/int32 so the uint8 outputs are bit-exact against the
reference's CRC oracles and the float32 outputs match its committed golden
rasters.

All functions take tightly-packed planes: y [H, W] uint8 and
uv [H/2, W] uint8 (interleaved U,V), and are shape-polymorphic under jit.
"""
import jax.numpy as jnp
import numpy as np
from jax import lax

# BT.601 full-swing constants, exact float32 values the reference uses
# (src/ColorConversion.cu:23-35).
_Y_COEF = np.float32(1.163999557)
_RV = np.float32(1.5959997177)
_BU = np.float32(2.017999649)
_GV = np.float32(-0.812999725)
_GU = np.float32(-0.390999794)

# BT.709 limited-range constants (TPU extension; Kr=0.2126, Kb=0.0722,
# scaled by 255/224 like the reference's BT.601 set). Same Y excursion.
_RV709 = np.float32(2 * (1 - 0.2126) * 255 / 224)
_BU709 = np.float32(2 * (1 - 0.0722) * 255 / 224)
_GV709 = np.float32(-(2 * (1 - 0.2126) * 0.2126 / 0.7152) * 255 / 224)
_GU709 = np.float32(-(2 * (1 - 0.0722) * 0.0722 / 0.7152) * 255 / 224)

# Full-range (PC/JPEG swing) variants (TPU extension): Y maps 0..255
# directly (no -16 offset, unit gain) and the chroma coefficients drop
# the 255/224 excursion scale.
_RV601F = np.float32(2 * (1 - 0.299))
_BU601F = np.float32(2 * (1 - 0.114))
_GV601F = np.float32(-(2 * (1 - 0.299) * 0.299 / 0.587))
_GU601F = np.float32(-(2 * (1 - 0.114) * 0.114 / 0.587))
_RV709F = np.float32(2 * (1 - 0.2126))
_BU709F = np.float32(2 * (1 - 0.0722))
_GV709F = np.float32(-(2 * (1 - 0.2126) * 0.2126 / 0.7152))
_GU709F = np.float32(-(2 * (1 - 0.0722) * 0.0722 / 0.7152))

_ONE = np.float32(1.0)
_ZERO = np.float32(0.0)

# standard value (enums.ColorStandard) -> (Rv, Bu, Gv, Gu, Ycoef, Yoff)
_STANDARD_COEFS = {
    0: (_RV, _BU, _GV, _GU, _Y_COEF, np.float32(16)),  # BT601 (ref-exact)
    1: (_RV709, _BU709, _GV709, _GU709, _Y_COEF, np.float32(16)),
    2: (_RV601F, _BU601F, _GV601F, _GU601F, _ONE, _ZERO),  # BT601 full
    3: (_RV709F, _BU709F, _GV709F, _GU709F, _ONE, _ZERO),  # BT709 full
}

# Correctly-rounded i/255 table. XLA rewrites division by a constant into
# reciprocal multiplication (1-ulp off); the reference's CUDA `/= 255` is a
# true IEEE division, so integer-valued channels go through this LUT to stay
# byte-exact against the golden float rasters.
_DIV255 = np.arange(256, dtype=np.float32) / np.float32(255)
# clip(num/16, 0, 255)/255 for the integer-valued numerators of the YUV444
# horizontal chroma filter (float mode); num is clamped into [0, 4080].
_DIV16_255 = (np.minimum(np.arange(4081, dtype=np.float32) / np.float32(16),
                         np.float32(255))) / np.float32(255)


def _norm255_int(x):
    """Exact x/255 for integer-valued x in [0, 255]."""
    return jnp.take(jnp.asarray(_DIV255), x.astype(jnp.int32), mode="clip")


def _upsample_uv(uv):
    """Expands interleaved UV (H/2, W) to per-pixel U and V planes (H, W):
    UVRow = i/2, UVCol = even-aligned j (src/ColorConversion.cu:16-21)."""
    u = uv[:, 0::2]
    v = uv[:, 1::2]
    u = jnp.repeat(jnp.repeat(u, 2, axis=0), 2, axis=1)
    v = jnp.repeat(jnp.repeat(v, 2, axis=0), 2, axis=1)
    return u, v


def nv12_to_rgb_channels(y, uv, standard: int = 0):
    """Returns clamped integer (R, G, B) int32 planes
    (src/ColorConversion.cu:6-39). `standard` selects the YUV matrix
    (0 = the reference's BT.601 constants, 1 = BT.709)."""
    rv, bu, gv, gu, y_coef, y_off = _STANDARD_COEFS[standard]
    u, v = _upsample_uv(uv)
    # Full-range standards: y_off=0 / y_coef=1 make this the identity on
    # uint8 input (max(0, x-0)*1.0 is numerically exact), so one
    # expression serves both swings without changing the limited-range
    # rounding the oracles pin.
    yf = jnp.maximum(jnp.float32(0), y.astype(jnp.float32) - y_off) * y_coef
    vi = (v.astype(jnp.int32) - 128).astype(jnp.float32)
    ui = (u.astype(jnp.int32) - 128).astype(jnp.float32)
    r = (yf + (rv * vi + jnp.float32(0.5))).astype(jnp.int32)
    b = (yf + (bu * ui + jnp.float32(0.5))).astype(jnp.int32)
    g = (yf + (gv * vi + gu * ui + jnp.float32(0.5))).astype(jnp.int32)
    clip = lambda x: jnp.clip(x, 0, 255)
    return clip(r), clip(g), clip(b)


def nv12_to_rgb(y, uv, swap_rb: bool, planar: bool, normalization: bool,
                standard: int = 0):
    """NV12 -> RGB24/BGR24, planar [3,H,W] or merged [H,W,3]
    (src/ColorConversion.cu:41-93)."""
    r, g, b = nv12_to_rgb_channels(y, uv, standard)
    if swap_rb:
        r, b = b, r
    chans = [r, g, b]
    if normalization:
        chans = [_norm255_int(c) for c in chans]
    else:
        chans = [c.astype(jnp.uint8) for c in chans]
    axis = 0 if planar else -1
    return jnp.stack(chans, axis=axis)


def nv12_to_y800(y, normalization: bool):
    """(src/ColorConversion.cu:95-105); shape (1, H, W)."""
    out = _norm255_int(y) if normalization else y
    return out[None, :, :]


def _uyvy_chroma_vertical(uv):
    """Vertical 4-tap chroma interpolation applied on odd UV rows when
    going 420 -> 422 (src/ColorConversion.cu:107-127). Returns the
    (H/2, W) interleaved UV plane with odd rows filtered, uint8."""
    h2 = uv.shape[0]
    p = uv.astype(jnp.int32)
    rows = np.arange(h2)
    r2 = np.minimum(rows + 1, h2 - 1)
    r3 = np.maximum(rows - 1, 0)
    r4 = np.minimum(rows + 2, h2 - 1)
    filt = (9 * (p + jnp.take(p, r2, axis=0))
            - (jnp.take(p, r3, axis=0) + jnp.take(p, r4, axis=0)) + 8) >> 4
    filt = jnp.clip(filt, 0, 255)
    odd = jnp.asarray((rows % 2 != 0)[:, None])
    return jnp.where(odd, filt, p).astype(jnp.uint8)


def nv12_to_uyvy(y, uv, normalization: bool, as_float: bool = False):
    """NV12 -> UYVY 4:2:2 merged (src/ColorConversion.cu:176-209).

    Buffer layout per luma row: U0 Y0 V0 Y1 | U1 Y2 V1 Y3 | ...
    Returns (H, 2W); the API reshapes to the tensor contract (1, 2H, W).
    """
    h, w = y.shape
    uv422 = _uyvy_chroma_vertical(uv)
    uv_rows = jnp.repeat(uv422, 2, axis=0)  # UV row for luma row i is i/2
    u_e = uv_rows[:, 0::2]
    v_e = uv_rows[:, 1::2]
    y0 = y[:, 0::2]
    y1 = y[:, 1::2]
    out = jnp.stack([u_e, y0, v_e, y1], axis=-1).reshape(h, 2 * w)
    if normalization:
        return _norm255_int(out)
    if as_float:
        return out.astype(jnp.float32)
    return out


def _yuv444_taps(w: int, h: int, shift: int):
    """Flat-index taps of the horizontal chroma filter over the UYVY
    buffer, with the reference's boundary substitutions
    (src/ColorConversion.cu:129-143). Precomputed with NumPy: the filter
    indexes the flat buffer, crossing row boundaries exactly like CUDA.
    NOTE(parity): at the very last odd pixel the reference reads one
    element past the UYVY payload (p2 has no bound check; it lands in the
    zero-initialized tail of its over-allocated intermediate buffer, so
    the committed oracles encode a 0 tap there). We reproduce that by
    gathering from a zero-padded buffer; taps out of [0, 2wh+7] never
    occur."""
    idx = np.arange(w * h, dtype=np.int64)
    src_index = idx * 2 + 1
    last = w * h * 2 - 1
    p1 = np.clip(src_index - 3 + shift, 0, last)
    p2 = src_index + 1 + shift  # may exceed `last` by up to 3: zero-pad tap
    p3 = src_index - 7 + shift
    p3 = np.where(p3 < 0, p1, p3)
    p4 = src_index + 5 + shift
    p4 = np.where(p4 > last, p2, p4)
    return p1, p2, p3, p4


def uyvy_to_yuv444(uyvy, w: int, h: int, normalization: bool, float_mode: bool):
    """UYVY -> planar YUV444 (src/ColorConversion.cu:146-173).

    `float_mode` mirrors the CUDA template parameter T: float when the
    final output is normalized, uchar otherwise. The uchar path keeps the
    reference's int-division truncation and mod-256 wrap on assignment;
    the float path divides in f32 (exactly: /16 is a power of two and the
    /255 goes through a correctly-rounded LUT) and clamps without wrapping.

    Returns the planar buffer reshaped to (H, W, 3) — note the reference
    reinterprets the *planar* memory with an HWC shape
    (WrapperPython.cpp:328-330); byte layout is what the oracles check.
    """
    flat = uyvy.reshape(-1)
    idx = np.arange(w * h, dtype=np.int64)
    src_index = idx * 2 + 1
    even = jnp.asarray(idx % 2 == 0)
    flat_int = flat.astype(jnp.int32)
    y_direct = jnp.take(flat_int, src_index, mode="clip")

    # Zero-padded tail models the reference's over-allocated intermediate
    # buffer (reads past 2wh hit zeroed memory — see _yuv444_taps).
    flat_pad = jnp.concatenate([flat_int, jnp.zeros(8, jnp.int32)])

    def chroma(shift):
        direct = jnp.take(flat_int,
                          np.clip(src_index - 1 + shift, 0, 2 * w * h - 1),
                          mode="clip")
        p1, p2, p3, p4 = _yuv444_taps(w, h, shift)
        num = (9 * (jnp.take(flat_pad, p1, mode="clip")
                    + jnp.take(flat_pad, p2, mode="clip"))
               - (jnp.take(flat_pad, p3, mode="clip")
                  + jnp.take(flat_pad, p4, mode="clip")) + 8)
        if float_mode:
            if normalization:
                val = jnp.take(jnp.asarray(_DIV16_255), jnp.clip(num, 0, 4080))
                return jnp.where(even, _norm255_int(direct), val)
            val = jnp.clip(num.astype(jnp.float32) / jnp.float32(16), 0, 255)
            return jnp.where(even, direct.astype(jnp.float32), val)
        val = lax.div(num, jnp.int32(16))  # C trunc-toward-zero division
        # Assignment to uchar wraps mod 256 *before* the (no-op) clamp
        # (src/ColorConversion.cu:139-141) — quirk preserved.
        val = val.astype(jnp.uint8)
        return jnp.where(even, direct.astype(jnp.uint8), val)

    u_plane = chroma(0)
    v_plane = chroma(2)
    if normalization:
        y_plane = _norm255_int(y_direct)
    elif float_mode:
        y_plane = y_direct.astype(jnp.float32)
    else:
        y_plane = y_direct.astype(jnp.uint8)
    out = jnp.concatenate([y_plane, u_plane, v_plane]).reshape(h, w, 3)
    return out


def nv12_merge(y, uv, normalization: bool):
    """NV12 passthrough into one contiguous Y+UV buffer
    (src/ColorConversion.cu:211-233); shape (1, 1.5H, W)."""
    h, w = y.shape
    out = jnp.concatenate([y.reshape(-1), uv.reshape(-1)])
    if normalization:
        out = _norm255_int(out)
    return out.reshape(1, h * 3 // 2, w)


def rgb_to_hsv(rgb):
    """Merged normalized RGB float32 -> merged HSV float32, H scaled to
    [0,1] from degrees/360, S = 1 - min/max, V = max
    (src/ColorConversion.cu:235-278)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    min_v = jnp.minimum(jnp.minimum(r, g), b)
    max_v = jnp.maximum(jnp.maximum(r, g), b)
    delta = max_v - min_v
    v = max_v
    s = jnp.where(max_v != 0, 1 - min_v / max_v, jnp.float32(0))
    h = jnp.where(
        (r == max_v) & (g >= b), 60 * (g - b) / delta,
        jnp.where((r == max_v) & (g < b), 60 * (g - b) / delta + 360,
                  jnp.where(g == max_v, 60 * (b - r) / delta + 120,
                            60 * (r - g) / delta + 240)))
    h = jnp.where(h < 0, h + 360, h) / jnp.float32(360)
    # max == min: H = 0 and the early return skips the /360 (quirk kept).
    h = jnp.where(max_v == min_v, jnp.float32(0), h)
    return jnp.stack([h, s, v], axis=-1)


def nv12_to_hsv(y, uv, standard: int = 0):
    """HSV is always produced from normalized merged RGB float
    (src/ColorConversion.cu:360-372)."""
    rgb = nv12_to_rgb(y, uv, swap_rb=False, planar=False, normalization=True,
                      standard=standard)
    return rgb_to_hsv(rgb)

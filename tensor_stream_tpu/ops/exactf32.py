"""Backend-independent exact f32 arithmetic for the resize blends.

The reference's resize CRCs encode nvcc's FMA-contracted f32 rounding
order (docs/PARITY.md "Float-contraction freedom"). XLA offers no
explicit FMA op — float contraction is backend discretion — and the TPU
backend rewrites f64/s64 (no native wide floats, s64 becomes exact s32
pairs), so no float formulation can pin the reference bytes on every
backend. These helpers emulate each f32/f64 operation of the reference
chains exactly, in three layers:

* the VALUE-BASED fast path (fma32v, further below): correctly-rounded
  f32 fmaf on plain values via error-free transformations — every EFT
  multiply is exact by construction, so contraction cannot perturb it,
  and no wide integers are involved. This is what the bilinear and
  AREA accumulation chains use; lone f32 multiplies are themselves
  single roundings (contraction only fuses mul INTO add).
* DOUBLE-SINGLE (ds_*) f32-pair arithmetic (~2^-48 relative) — the
  bicubic blend's f64 stand-in, with an exact floor(x+0.5) boundary
  test.
* the (m, e) INTEGER softfloat below — a value is m * 2^e with m a
  24-bit significand — kept for the operations a backend cannot promise
  correctly rounded: division (f32 divide is reciprocal-approximated on
  TPU) rounds the 26-bit-widened i64 quotient with the remainder as
  sticky; the RN-even normalization rides the hardware i64->f32
  convert with a sticky fold. These run under `jax.enable_x64(True)`
  (scoped by the callers).

Each primitive is pinned against libm's hardware fmaf / numpy's IEEE
f32 ops (tests/test_exactf32.py) and the end-to-end bytes against the
reference CRCs on both backends (tests/test_resize_crc.py,
TPU_PARITY_r{N}.json). All values are nonnegative.
"""
import jax
import jax.numpy as jnp
import numpy as np

_MBITS = 24  # f32 significand width


def const_me(w):
    """Decomposes host f32 constants into exact (m, e) int arrays:
    w = m * 2^e, m in [2^23, 2^24) (m = e = 0 for zeros)."""
    w = np.asarray(w, np.float32).astype(np.float64)
    mant, exp = np.frexp(w)  # w = mant * 2^exp, mant in [0.5, 1)
    m = np.round(mant * (1 << _MBITS)).astype(np.int64)  # [2^23, 2^24]
    e = (exp - _MBITS).astype(np.int64)
    hi = m == (1 << _MBITS)  # mant rounded up to 1.0: renormalize
    m = np.where(hi, m >> 1, m)
    e = np.where(hi, e + 1, e)
    zero = w == 0
    return np.where(zero, 0, m), np.where(zero, 0, e)


def _rn24(s, e, sticky):
    """Rounds positive i64 significand `s` (value s*2^e, <= 62 bits,
    plus a sticky flag for bits already shifted out below) to a 24-bit
    normalized (m, e) under round-to-nearest-even.

    The rounding itself is the hardware's i64->f32 conversion, which IS
    RN-even to 24 bits (XLA convert semantics on every backend); the
    sticky bit folds in below the lsb first (s*2 + sticky), turning
    would-be ties into round-ups exactly when lower bits were lost.
    The (m, e) pair then falls out of the f32 bit pattern — no clz, no
    data-dependent shifts. Exactness is pinned by the CRC suites and
    the IEEE fuzz (tests/test_exactf32.py) on every backend."""
    s2 = (s << 1) | sticky.astype(jnp.int64)
    f = s2.astype(jnp.float32)  # RN-even to 24 bits, the one rounding
    bits = jax.lax.bitcast_convert_type(f, jnp.int32).astype(jnp.int64)
    m = (bits & 0x7FFFFF) | 0x800000
    ef = ((bits >> 23) & 0xFF) - 127  # f = mf * 2^(ef-23), s2 = f exactly
    zero = s == 0
    m = jnp.where(zero, 0, m)
    e = jnp.where(zero, 0, e + ef - _MBITS + 1 - 1)  # -1 undoes s<<1
    return m, e


def _rn24_noround(p, e):
    """Normalizes an exact product (<= 48 bits) with RN-even."""
    return _rn24(p, e, jnp.zeros_like(p, jnp.bool_))


def _sum_round(p, ep, ma, ea):
    """RN-even f32 of the exact value p*2^ep + ma*2^ea (p <= 48 bits
    unrounded product, ma a 24-bit significand) — i.e. fmaf's single
    rounding. Alignment shifts the higher-exponent operand left (exact,
    capped) and the other right with a sticky OR of the lost bits."""
    d = ep - ea
    # Operand order by exponent; the value-magnitude order is irrelevant
    # to correctness, only overflow headroom matters: v_hi <= 48 bits,
    # left shift cap 13 keeps v_hi<<13 + v_lo <= 2^62 — one headroom bit
    # for _rn24's sticky fold (s<<1).
    v_hi = jnp.where(d >= 0, p, ma)
    v_lo = jnp.where(d >= 0, ma, p)
    e_lo = jnp.minimum(ep, ea)
    ad = jnp.abs(d)
    lsh = jnp.minimum(ad, 13)
    rsh = jnp.minimum(ad - lsh, 63)  # beyond 63 the value is pure sticky
    lost = v_lo & ((jnp.int64(1) << rsh) - 1)  # rsh=63 masks all 48 bits
    sticky = lost != 0
    # sh >= 12 whenever sticky can be set (v_hi normalized >= 2^23,
    # lsh = 13 when rsh > 0), so the fold below the lsb is always below
    # the rounding point.
    s = (v_hi << lsh) + (v_lo >> rsh)
    e = e_lo + rsh
    m_out, e_out = _rn24(s, e, sticky)
    # Either side zero: the other passes through (already <= 48 bits,
    # normalized by _rn24; sticky stays relevant only for s).
    zero_p = p == 0
    zero_a = ma == 0
    mp, epn = _rn24_noround(p, ep)
    m_out = jnp.where(zero_p, ma, jnp.where(zero_a, mp, m_out))
    e_out = jnp.where(zero_p, ea, jnp.where(zero_a, epn, e_out))
    both = zero_p & zero_a
    return jnp.where(both, 0, m_out), jnp.where(both, 0, e_out)


def mul_u8(x, mw, ew):
    """(m, e) of RN_f32(x * w) for u8 `x` and constant w = mw*2^ew.
    The 32-bit product is exact; one rounding."""
    x64 = x.astype(jnp.int64)
    p = x64 * jnp.asarray(mw)
    m, e = _rn24_noround(p, jnp.asarray(ew) + jnp.zeros_like(p))
    zero = p == 0
    return jnp.where(zero, 0, m), jnp.where(zero, 0, e)


def mul_f32(m1, e1, m2, e2):
    """(m, e) of RN_f32 of a product of two f32 (m, e) pairs."""
    p = m1 * m2  # <= 48 bits, exact
    m, e = _rn24_noround(p, e1 + e2)
    zero = p == 0
    return jnp.where(zero, 0, m), jnp.where(zero, 0, e)


def fma_u8(x, mw, ew, ma, ea):
    """fmaf(x, w, acc) for u8 `x`, constant w, f32 acc (ma, ea):
    exact 32-bit product + single RN-even rounding of the sum."""
    x64 = x.astype(jnp.int64)
    p = x64 * jnp.asarray(mw)
    return _sum_round(p, jnp.asarray(ew) + jnp.zeros_like(p), ma, ea)


def fma_f32(mx, ex, mw, ew, ma, ea):
    """fmaf(x, w, acc) with f32 x (mx, ex): exact 48-bit product +
    single rounding of the sum."""
    p = mx * jnp.asarray(mw)
    return _sum_round(p, ex + jnp.asarray(ew), ma, ea)


def div_f32(ma, ea, mb, eb):
    """(m, e) of RN_f32(a / b) for f32 a and positive-constant b: the
    26-bit-widened integer quotient plus remainder-sticky rounding."""
    num = ma << 26
    mb = jnp.asarray(mb) + jnp.zeros_like(num)
    q = num // jnp.maximum(mb, 1)
    sticky = (num - q * mb) != 0
    m, e = _rn24(q, ea - jnp.asarray(eb) - 26, sticky)
    zero = ma == 0
    return jnp.where(zero, 0, m), jnp.where(zero, 0, e)


def trunc_u8(m, e):
    """(uint8)(int)(value) of a nonnegative f32 (m, e), value < 2^31."""
    left = jnp.clip(e, 0, 8)
    right = jnp.clip(-e, 0, 63)
    return ((m << left) >> right).astype(jnp.uint8)


# ------------------------------------------------- value-based fast path
#
# The (m, e) softfloat above needs i64 (emulated as i32 pairs on TPU).
# For the fmaf chains themselves there is a cheaper exact route working
# on plain f32 VALUES with error-free transformations: every multiply
# inside Veltkamp/Dekker two_prod is exact by construction, so XLA's
# contraction freedom cannot change any intermediate, and the one real
# rounding happens in the final add after a round-to-odd fix-up
# (Boldo-Melquiond: RN(sh + RO(e)) == RN(sh + e) when the odd-rounded
# term carries the sticky information). All ops are native 32-bit;
# denormal-range intermediates cannot occur for the resize weight tables
# (weights >= ~2^-30, pixels <= 255, so every EFT error term stays
# normal). Exactness is pinned against libm's hardware fmaf
# (tests/test_exactf32.py) and the resize CRC oracles on both backends.

_SPLIT = np.float32(4097.0)  # 2^(24-12) + 1: Veltkamp splitter for f32


def _two_sum(a, b):
    """Knuth two-sum: s = RN(a+b), err exact (s + err == a + b)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _two_prod(a, b):
    """Dekker two-product: p = RN(a*b), err exact (p + err == a*b).
    The split products are exact (12x12-bit halves), so any fms/fma
    contraction XLA applies changes nothing."""
    p = a * b
    ca = _SPLIT * a
    ah = ca - (ca - a)
    al = a - ah
    cb = _SPLIT * b
    bh = cb - (cb - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _round_to_odd(v, rho):
    """Round-to-odd of the exact value v + rho (|rho| < ulp(v)): keep v
    when exact or already odd, else nudge one ulp toward rho."""
    bits = jax.lax.bitcast_convert_type(v, jnp.int32)
    toward_pos = jnp.where(v >= 0, jnp.int32(1), jnp.int32(-1))
    step = jnp.where(rho > 0, toward_pos, -toward_pos)
    nudge = (rho != 0) & ((bits & 1) == 0)
    out = jax.lax.bitcast_convert_type(
        jnp.where(nudge, bits + step, bits), jnp.float32)
    return out


def fma32v(x, w, acc):
    """Correctly-rounded f32 fmaf(x, w, acc) on VALUES (f32 arrays /
    broadcastable host constants) — one rounding, no i64."""
    x = jnp.asarray(x).astype(jnp.float32)
    w = jnp.asarray(w).astype(jnp.float32)
    acc = jnp.asarray(acc).astype(jnp.float32)
    ph, pl = _two_prod(x, w)
    sh, sl = _two_sum(acc, ph)
    v, rho = _two_sum(sl, pl)
    return sh + _round_to_odd(v, rho)


def f32_to_me(v):
    """(m, e) pair of a nonnegative normal f32 value (0 -> (0, 0)),
    for handing a value-chain result to the integer division."""
    bits = jax.lax.bitcast_convert_type(v, jnp.int32).astype(jnp.int64)
    m = (bits & 0x7FFFFF) | 0x800000
    e = ((bits >> 23) & 0xFF) - 127 - (_MBITS - 1)
    zero = v == 0
    return jnp.where(zero, 0, m), jnp.where(zero, 0, e)


# --------------------------------------------- double-single arithmetic
#
# f32-pair (hi, lo) values with ~2^-48 relative accuracy — the bicubic
# blend's f64 stand-in on backends without native f64 (the reference
# blends in double; its result is contraction-insensitive at ~2^-40
# margins, docs/PARITY.md). All EFT-based: exact multiplies, one
# documented rounding per compression.

def ds_from_f64(x):
    """Host: split float64 constants into (hi, lo) f32 pairs."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _quick_two_sum(a, b):
    """|a| >= |b| assumed: s = RN(a+b), err exact."""
    s = a + b
    err = b - (s - a)
    return s, err


def ds_add(h1, l1, h2, l2):
    """Double-single addition (Dekker add2 shape)."""
    s, e = _two_sum(h1, h2)
    e = e + (l1 + l2)
    return _quick_two_sum(s, e)


def ds_mul_f32(h, l, x):
    """(h, l) * exact-f32 x (e.g. an integer-valued pixel)."""
    p, pe = _two_prod(h, x)
    pe = pe + l * x
    return _quick_two_sum(p, pe)


def ds_floor_half_up(h, l):
    """floor(value + 0.5) for a double-single (h, l) with h in
    [-1024, 1024]: h + 0.5 is exact there, the fractional part r is
    exact, and the boundary test r + l >= 1 (or < 0) runs through an
    exact two_sum comparison — no boundary can be misjudged by f32
    rounding."""
    t = h + jnp.float32(0.5)  # exact for |h| < 2^23
    f = jnp.floor(t)
    r = t - f                 # exact: Sterbenz
    s, e = _two_sum(r, l)
    over = (s > 1) | ((s == 1) & (e >= 0))
    under = (s < 0) | ((s == 0) & (e < 0))
    return (f + jnp.where(over, 1.0, jnp.where(under, -1.0, 0.0))
            ).astype(jnp.int32)

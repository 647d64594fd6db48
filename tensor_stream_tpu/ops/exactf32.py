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
  AREA accumulation chains use. Lone f32 multiplies are single
  roundings, and every rounding the algorithms depend on is fenced
  with jax.lax.optimization_barrier — mul-into-add contraction is a
  legal XLA rewrite, so the required roundings must be pinned
  structurally, not assumed. (Bicubic blends in 2^-50 fixed-point i64
  in ops/resize.py — a double-single f32 formulation was tried and
  REJECTED: measured worst error 2^-38.5 vs the f64 reference, above
  the ~2^-40 boundary margins, and its floor(x+0.5) boundary test was
  wrong at binade crossings where h+0.5 itself rounds.)
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


def _two_prod_after_barrier(a, b, p, ca, cb):
    """Dekker two-product tail: err exact (p + err == a*b), given the
    already-barriered p = RN(a*b) and Veltkamp splitter products
    ca = RN(_SPLIT*a), cb = RN(_SPLIT*b) (see fma32v_many: those three
    roundings ARE the algorithm and must be pinned against contraction;
    the half-products ah*bh etc. are exact by construction and stay
    fusable)."""
    ah = ca - (ca - a)
    al = a - ah
    bh = cb - (cb - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return err


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


def fma32v_many(triples):
    """Correctly-rounded f32 fmaf(x, w, acc) over a list of INDEPENDENT
    (x, w, acc) triples (f32 arrays / broadcastable host constants) —
    one rounding each, no i64.

    All triples share ONE jax.lax.optimization_barrier call: the
    semantically-required roundings of every chain sit at the same
    dependency level, so a single tuple barrier pins them all while
    cutting the fusion boundaries an optimization_barrier introduces
    from ~5 per fmaf to 1 per lockstep step. On TPU each boundary is a
    separate kernel launch; grouping the Y/U/V plane chains of the
    resize blends this way is what makes the exact device path cheap
    (docs/ROADMAP.md polish item 0). Barriered per triple:
      * x*w and the two Veltkamp splitter products (the two_prod
        roundings — x*y feeding an add/sub is exactly the shape
        mul-into-add contraction rewrites),
      * acc — the caller may feed a lone-multiply result whose rounding
        is part of the emulated chain, and
      * x itself — also often a lone-multiply result (e.g. a*omx in the
        bilinear blend); fencing it keeps its rounding from contracting
        into two_prod's internal subtractions."""
    pre = []
    for x, w, acc in triples:
        x = jnp.asarray(x).astype(jnp.float32)
        w = jnp.asarray(w).astype(jnp.float32)
        acc = jnp.asarray(acc).astype(jnp.float32)
        pre.append((x, w, acc, x * w, _SPLIT * x, _SPLIT * w))
    pinned = jax.lax.optimization_barrier(tuple(pre))
    outs = []
    for x, w, acc, p, ca, cb in pinned:
        pl = _two_prod_after_barrier(x, w, p, ca, cb)
        sh, sl = _two_sum(acc, p)
        v, rho = _two_sum(sl, pl)
        outs.append(sh + _round_to_odd(v, rho))
    return outs


def fma32v(x, w, acc):
    """Correctly-rounded f32 fmaf(x, w, acc) on VALUES (f32 arrays /
    broadcastable host constants) — one rounding, no i64."""
    return fma32v_many([(x, w, acc)])[0]


def f32_to_me(v):
    """(m, e) pair of a nonnegative normal f32 value (0 -> (0, 0)),
    for handing a value-chain result to the integer division."""
    bits = jax.lax.bitcast_convert_type(v, jnp.int32).astype(jnp.int64)
    m = (bits & 0x7FFFFF) | 0x800000
    e = ((bits >> 23) & 0xFF) - 127 - (_MBITS - 1)
    zero = v == 0
    return jnp.where(zero, 0, m), jnp.where(zero, 0, e)

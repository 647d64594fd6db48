"""ops/exactf32.py against IEEE-754 semantics (the math.fma / numpy f32
oracles): the integer softfloat helpers must reproduce single-rounding
f32 arithmetic bit-for-bit — they are what makes the device resize
backend-independent (tests/test_resize_crc.py pins the end-to-end
bytes; this pins each primitive against adversarial operand ranges,
including denormal-adjacent tiny weights, zeros, and tie patterns)."""
import ctypes
import ctypes.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor_stream_tpu.ops import exactf32 as X

# Hardware fmaf from libm: the exact single-rounding oracle (math.fma
# needs Python 3.13).
_libm = ctypes.CDLL(ctypes.util.find_library("m") or "libm.so.6")
_libm.fmaf.restype = ctypes.c_float
_libm.fmaf.argtypes = [ctypes.c_float, ctypes.c_float, ctypes.c_float]


def _fmaf(x, y, z):
    return np.float32(_libm.fmaf(float(x), float(y), float(z)))


def _to_f32(m, e):
    m = np.asarray(m)
    e = np.asarray(e)
    return np.where(m == 0, np.float32(0),
                    (m.astype(np.float64) * np.exp2(e.astype(np.float64)))
                    .astype(np.float32)).astype(np.float32)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(99)


def test_fma_u8_matches_ieee_fmaf(rng):
    N = 30000
    xs = rng.integers(0, 256, N).astype(np.uint8)
    scale = rng.choice(np.float32([1e-7, 1e-4, 1e-2, 0.5, 0.999, 1.0]), N)
    ws = (rng.random(N).astype(np.float32) * scale).astype(np.float32)
    ws[::13] = 0
    accs = (rng.random(N) * 300).astype(np.float32)
    accs[::17] = 0
    ref = np.array([_fmaf(xs[i], ws[i], accs[i]) for i in range(N)],
                   np.float32)
    mw, ew = X.const_me(ws)
    ma, ea = X.const_me(accs)
    with jax.enable_x64(True):
        m, e = jax.jit(X.fma_u8)(xs, jnp.asarray(mw), jnp.asarray(ew),
                                 jnp.asarray(ma), jnp.asarray(ea))
    got = _to_f32(m, e)
    bad = got != ref
    assert not bad.any(), (
        f"{bad.sum()} mismatches; first: x={xs[bad][0]} w={ws[bad][0]!r} "
        f"acc={accs[bad][0]!r} got={got[bad][0]!r} want={ref[bad][0]!r}")


def test_mul_and_fma_f32_match_ieee(rng):
    N = 30000
    a32 = (rng.random(N) * 300).astype(np.float32)
    b32 = (rng.random(N).astype(np.float32) *
           rng.choice(np.float32([1e-6, 1e-3, 1.0]), N)).astype(np.float32)
    accs = (rng.random(N) * 500).astype(np.float32)
    ref_mul = (a32 * b32).astype(np.float32)  # numpy f32 mul is IEEE RN
    ref_fma = np.array([_fmaf(a32[i], b32[i], accs[i]) for i in range(N)],
                       np.float32)
    m1, e1 = X.const_me(a32)
    m2, e2 = X.const_me(b32)
    ma, ea = X.const_me(accs)
    with jax.enable_x64(True):
        mm, me = jax.jit(X.mul_f32)(jnp.asarray(m1), jnp.asarray(e1),
                                    jnp.asarray(m2), jnp.asarray(e2))
        fm, fe = jax.jit(X.fma_f32)(jnp.asarray(m1), jnp.asarray(e1),
                                    jnp.asarray(m2), jnp.asarray(e2),
                                    jnp.asarray(ma), jnp.asarray(ea))
    assert np.array_equal(_to_f32(mm, me), ref_mul)
    got = _to_f32(fm, fe)
    bad = got != ref_fma
    assert not bad.any(), f"{bad.sum()} fma mismatches"


def test_div_matches_ieee(rng):
    N = 30000
    num = (rng.random(N) * 300 + 1e-4).astype(np.float32)
    den = (rng.random(N) * 5 + 1e-3).astype(np.float32)
    # Exact-ratio cases land on representable quotients and ties.
    num[:64] = (np.arange(64) + 1).astype(np.float32)
    den[:64] = np.float32(2.0)
    ref = (num / den).astype(np.float32)  # numpy f32 divide is IEEE RN
    mn, en = X.const_me(num)
    md, ed = X.const_me(den)
    with jax.enable_x64(True):
        m, e = jax.jit(X.div_f32)(jnp.asarray(mn), jnp.asarray(en),
                                  jnp.asarray(md), jnp.asarray(ed))
    assert np.array_equal(_to_f32(m, e), ref)


def test_trunc_u8(rng):
    vals = np.concatenate([
        (rng.random(2000) * 256).astype(np.float32),
        np.float32([0, 0.49, 0.51, 1.0, 254.999, 255.0, 255.49]),
    ]).astype(np.float32)
    m, e = X.const_me(vals)
    with jax.enable_x64(True):
        got = np.asarray(jax.jit(X.trunc_u8)(jnp.asarray(m),
                                             jnp.asarray(e)))
    ref = vals.astype(np.int32).astype(np.uint8)
    assert np.array_equal(got, ref)


def test_fma32v_matches_ieee_fmaf(rng):
    """The value-based EFT fma (no i64) against hardware fmaf, over the
    resize-realistic domain plus adversarial tiny weights and negative
    error-term patterns (weights near 1 make pl negative)."""
    N = 40000
    xs = rng.integers(0, 256, N).astype(np.float32)
    scale = rng.choice(np.float32([1e-7, 1e-4, 1e-2, 0.5, 0.999, 1.0]), N)
    ws = (rng.random(N).astype(np.float32) * scale).astype(np.float32)
    ws[::13] = 0
    accs = (rng.random(N) * 1000).astype(np.float32)
    accs[::17] = 0
    ref = np.array([_fmaf(xs[i], ws[i], accs[i]) for i in range(N)],
                   np.float32)
    got = np.asarray(jax.jit(X.fma32v)(xs, ws, accs))
    bad = got != ref
    assert not bad.any(), (
        f"{bad.sum()} mismatches; first: x={xs[bad][0]!r} w={ws[bad][0]!r} "
        f"acc={accs[bad][0]!r} got={got[bad][0]!r} want={ref[bad][0]!r}")


def test_f32_to_me_roundtrip(rng):
    vals = np.concatenate([
        (rng.random(5000) * 4000).astype(np.float32),
        np.float32([0, 1e-7, 1.0, 255.0, 0.5]),
    ]).astype(np.float32)
    with jax.enable_x64(True):
        m, e = jax.jit(X.f32_to_me)(jnp.asarray(vals))
    assert np.array_equal(_to_f32(m, e), vals)

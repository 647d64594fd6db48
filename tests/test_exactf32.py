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


def test_fma32v_exact_tie_patterns():
    """Deterministic round-to-nearest-EVEN ties: x*w lands exactly half
    an ulp away from acc's grid (x=1, w = odd*2^-25, acc=1 makes
    1 + odd*2^-25 a tie at ulp 2^-24), plus binade-crossing sums —
    the cases a broken sticky/odd-round path gets wrong first."""
    xs, ws, accs = [], [], []
    for k in range(1, 64, 2):  # odd multiples: exact ties
        xs.append(1.0)
        ws.append(np.float32(k * 2.0 ** -25))
        accs.append(1.0)
    # Binade crossings: acc just below a power of two, product pushes over.
    for e in (0, 1, 4, 7):
        acc = np.float32(2.0 ** e) - np.float32(2.0 ** (e - 24))
        xs.append(3.0)
        ws.append(np.float32(2.0 ** (e - 25)))
        accs.append(acc)
    xs = np.float32(xs); ws = np.float32(ws); accs = np.float32(accs)
    ref = np.array([_fmaf(xs[i], ws[i], accs[i]) for i in range(len(xs))],
                   np.float32)
    got = np.asarray(jax.jit(X.fma32v)(xs, ws, accs))
    assert np.array_equal(got, ref), (got[got != ref], ref[got != ref])

"""Pallas NV12->RGB kernel vs the XLA reference path.

The XLA path (ops/color.py) is itself validated bit-exact against the
CUDA oracles (tests/test_vpp.py), so agreement here chains the Pallas
kernel to the same oracles. On CPU the kernel runs in interpret mode;
set TS_TEST_TPU=1 to exercise the compiled Mosaic kernel (validated
bit-exact on a real v5e chip).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensor_stream_tpu.ops.color import _DIV255, nv12_to_rgb
from tensor_stream_tpu.ops.pallas_color import (_div255_exact,
                                                build_pallas_nv12_to_rgb)

INTERPRET = jax.default_backend() == "cpu"


def _rand_nv12(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 256, (h, w), np.uint8),
            rng.integers(0, 256, (h // 2, w), np.uint8))


def test_div255_series_matches_lut_bitwise():
    """The gather-free x/255 must equal the correctly-rounded f32 LUT for
    every uint8 value (see the derivation in pallas_color.py)."""
    x = jnp.arange(256, dtype=jnp.float32)
    got = np.asarray(jax.jit(_div255_exact)(x))
    assert np.array_equal(got.view(np.uint32), _DIV255.view(np.uint32))


@pytest.mark.parametrize("planar", [False, True])
@pytest.mark.parametrize("normalization", [False, True])
@pytest.mark.parametrize("swap_rb", [False, True])
def test_pallas_nv12_rgb_matches_xla(planar, normalization, swap_rb):
    h, w = 64, 256
    y, uv = _rand_nv12(h, w)
    fn = build_pallas_nv12_to_rgb(h, w, swap_rb, planar, normalization,
                                  block_rows=16, interpret=INTERPRET)
    got = np.asarray(fn(y, uv))
    ref = np.asarray(nv12_to_rgb(jnp.asarray(y), jnp.asarray(uv),
                                 swap_rb=swap_rb, planar=planar,
                                 normalization=normalization))
    assert got.shape == ref.shape and got.dtype == ref.dtype
    assert np.array_equal(got, ref)


def test_pallas_odd_block_split():
    """Heights that don't divide the default block size still work."""
    h, w = 36, 128  # 36 % 64 != 0 -> block split fallback
    y, uv = _rand_nv12(h, w, seed=3)
    fn = build_pallas_nv12_to_rgb(h, w, False, False, False,
                                  interpret=INTERPRET)
    got = np.asarray(fn(y, uv))
    ref = np.asarray(nv12_to_rgb(jnp.asarray(y), jnp.asarray(uv),
                                 swap_rb=False, planar=False,
                                 normalization=False))
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("h", [24, 1080])
def test_pallas_height_mod8_half_select(h):
    """Heights divisible by 8 but not 16 (exactly-1080-row streams!) use
    the uv_half_select 8-row-block mode. Bit-exact compiled; interpret
    mode executes as ordinary XLA-CPU ops whose fusion contraction can
    flip isolated truncation-boundary pixels by one step
    (docs/PARITY.md), so it gets a +-1/255 budget."""
    w = 256
    y, uv = _rand_nv12(h, w, seed=h)
    fn = build_pallas_nv12_to_rgb(h, w, False, True, True,
                                  interpret=INTERPRET)
    got = np.asarray(fn(y, uv))
    ref = np.asarray(nv12_to_rgb(jnp.asarray(y), jnp.asarray(uv),
                                 swap_rb=False, planar=True,
                                 normalization=True))
    if INTERPRET:
        assert np.abs(got - ref).max() <= 1.0 / 255 + 1e-7
        assert (got == ref).mean() > 0.999
    else:
        assert np.array_equal(got, ref)


@pytest.mark.skipif(not __import__("os").environ.get("TS_FULL_TESTS"),
                    reason="HD merged compile is slow; set TS_FULL_TESTS=1")
def test_pallas_merged_hd_correct():
    """Merged output at HD compiles (column-tiled blocks bound the
    3->128 lane-pad VMEM) — kept as capability; the product path stays
    on XLA for merged because the lane-padded stores are ~17x slower
    (docs/ROADMAP.md item 3).

    Comparison envelope: the G channel's `gv*vi + gu*ui + 0.5` mul+add
    chain carries 1-ulp contraction freedom between evaluators (XLA may
    fuse either multiply into the add; interpret-mode Pallas fuses
    neither), so truncation-boundary pixels of a RANDOM frame may sit
    one u8 step apart (~2e-6 of pixels at HD). The committed CRC
    oracles pin the product conversion paths exactly on both backends
    (tests/test_vpp.py, TPU_PARITY_r{N}.json); this asserts the
    capability kernel within that documented freedom."""
    h, w = 1080, 1920
    y, uv = _rand_nv12(h, w, seed=7)
    fn = build_pallas_nv12_to_rgb(h, w, False, False, False,
                                  interpret=INTERPRET)
    got = np.asarray(fn(y, uv))
    ref = np.asarray(nv12_to_rgb(jnp.asarray(y), jnp.asarray(uv),
                                 swap_rb=False, planar=False,
                                 normalization=False))
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    frac = (diff != 0).mean()
    assert frac < 1e-4, f"{frac:.2e} of pixels differ (expect ~2e-6)"


@pytest.mark.parametrize("standard", [1, 2, 3])
def test_pallas_color_standards_match_xla(standard):
    """The Mosaic kernel parameterizes the YUV matrix like ops/color.py
    (BT.709 / full-range variants): bit-identical to the XLA path for
    every standard (full-range folds the y_off/y_coef identity away at
    compile time)."""
    h, w = 64, 256
    y, uv = _rand_nv12(h, w, seed=11)
    fn = build_pallas_nv12_to_rgb(h, w, False, True, False,
                                  block_rows=16, interpret=INTERPRET,
                                  standard=standard)
    got = np.asarray(fn(y, uv))
    ref = np.asarray(nv12_to_rgb(jnp.asarray(y), jnp.asarray(uv),
                                 swap_rb=False, planar=True,
                                 normalization=False, standard=standard))
    assert np.array_equal(got, ref)

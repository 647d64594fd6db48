"""Batch-level MixUp/CutMix (ops/mix.py) — closed-form semantics.

Beyond parity: the timm/DALI mixup/cutmix capability for the train
step, companions to the per-clip ops/augment.py transforms.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor_stream_tpu.ops.mix import cutmix, mix_labels, mixup

KEY = jax.random.key(3)


def clips(b=6, t=3, h=12, w=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((b, t, h, w, c)).astype(np.float32)


def test_mixup_closed_form():
    x = clips()
    mixed, perm, lam = jax.jit(lambda k, v: mixup(k, v, 0.4))(KEY, x)
    lam = float(lam)
    assert 0.0 <= lam <= 1.0  # raw Beta(alpha, alpha) draw (the paper's)
    want = lam * x + (1.0 - lam) * x[::-1]
    np.testing.assert_allclose(np.asarray(mixed), want, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(perm), np.arange(5, -1, -1))


def test_mixup_deterministic_per_key():
    x = clips()
    a = mixup(KEY, x, 0.2)
    b = mixup(KEY, x, 0.2)
    c = mixup(jax.random.key(4), x, 0.2)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert float(a[2]) == float(b[2])
    assert float(a[2]) != float(c[2])


def test_cutmix_pixels_are_copies_and_lam_exact():
    """Every output pixel is either the original or its partner's, the
    cut region is one rectangle shared by all frames/channels, and lam
    equals the exact surviving-pixel fraction."""
    x = clips()
    mixed, perm, lam = jax.jit(
        lambda k, v: cutmix(k, v, 1.0, spatial_axes=(-3, -2)))(KEY, x)
    mixed = np.asarray(mixed)
    partner = x[::-1]
    from_orig = np.isclose(mixed, x)
    from_part = np.isclose(mixed, partner)
    assert np.all(from_orig | from_part)
    # One shared rect: the per-pixel provenance mask (where the values
    # differ at all) is identical across batch-pair, frames, channels.
    replaced = ~from_orig  # True only inside the rect (values differ)
    mask2d = replaced.any(axis=(0, 1, 4))
    ys, xs = np.nonzero(mask2d)
    if len(ys):  # the drawn rect may be empty after clipping
        assert np.array_equal(
            mask2d[ys.min():ys.max() + 1, xs.min():xs.max() + 1],
            np.ones((ys.max() - ys.min() + 1, xs.max() - xs.min() + 1),
                    bool))
        # lam == exact surviving fraction of the frame
        area = mask2d.mean()
        np.testing.assert_allclose(float(lam), 1.0 - area, atol=1e-6)
        # temporal/channel consistency: same mask everywhere it can be
        # observed (random values collide with ~0 probability)
        for t in range(x.shape[1]):
            assert np.array_equal(replaced[0, t].any(axis=-1), mask2d)


def test_cutmix_planar_axes():
    x = np.moveaxis(clips(), -1, 2)  # [B, T, C, H, W]
    mixed, _, lam = cutmix(KEY, x, 1.0, spatial_axes=(-2, -1))
    mixed_m = cutmix(KEY, np.moveaxis(x, 2, -1), 1.0,
                     spatial_axes=(-3, -2))[0]
    np.testing.assert_array_equal(np.moveaxis(np.asarray(mixed), 2, -1),
                                  np.asarray(mixed_m))


def test_mix_labels():
    y = jax.nn.one_hot(jnp.asarray([0, 1, 2]), 4)
    perm = jnp.asarray([2, 1, 0])
    out = np.asarray(mix_labels(y, perm, 0.75))
    want = 0.75 * np.asarray(y) + 0.25 * np.asarray(y)[[2, 1, 0]]
    np.testing.assert_allclose(out, want, atol=1e-7)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-6)


def test_mix_composes_with_loss_shapes():
    """The advertised recipe typechecks under jit: loader batch ->
    cutmix -> soft-target cross entropy."""
    x = clips(b=4)
    y = jax.nn.one_hot(jnp.asarray([0, 1, 0, 1]), 2)

    @jax.jit
    def step(key, x, y):
        mixed, perm, lam = cutmix(key, x, 1.0, spatial_axes=(-3, -2))
        target = mix_labels(y, perm, lam)
        logits = mixed.mean(axis=(1, 2, 3))[:, :2]  # stand-in model
        return -(target * jax.nn.log_softmax(logits)).sum(-1).mean()

    loss = step(KEY, x, y)
    assert np.isfinite(float(loss))

"""Gradient accumulation: exact equality with full-batch grads (same
mean-of-means math), aux handling, divisibility errors, memory-shape
law (scan body sees one microbatch)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tensor_stream_tpu.models.video_vit import VideoViT, init_vit
from tensor_stream_tpu.parallel.accum import accumulate_gradients

CLIP = (8, 4, 16, 16, 3)


def model_and_params():
    model = VideoViT(num_classes=2, depth=1, dim=16, num_heads=2,
                     patch=8, tubelet_t=2, compute_dtype=jnp.float32)
    return model, init_vit(jax.random.PRNGKey(0), model, CLIP)


@pytest.mark.parametrize("n_accum", [1, 2, 4, 8])
def test_matches_full_batch_grads(n_accum):
    """Mean-CE loss: mean over microbatch grads == full-batch grad, to
    reduction-order tolerance."""
    model, params = model_and_params()
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    labels = jnp.array([0, 1, 1, 0, 1, 0, 0, 1])

    def loss_fn(p, x, y):
        logits = model.apply(p, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    # Pin full matmul precision: the assertion compares two REDUCTION
    # ORDERS of the same math, and the TPU MXU's default f32 precision
    # (bf16 passes) adds ~1e-3 noise between them that has nothing to do
    # with the accumulation logic (same pattern as test_streaming.py).
    with jax.default_matmul_precision("highest"):
        (want_loss, _), want_g = jax.value_and_grad(
            lambda p: (loss_fn(p, clips, labels), 0.0), has_aux=True)(params)
        grad_fn = jax.jit(accumulate_gradients(loss_fn, n_accum))
        (loss, _), grads = grad_fn(params, clips, labels)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(want_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_aux_is_averaged():
    model, params = model_and_params()
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    labels = jnp.array([0, 1, 1, 0, 1, 0, 0, 1])

    def loss_fn(p, x, y):
        logits = model.apply(p, x)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()
        acc = (logits.argmax(-1) == y).mean()
        return loss, acc

    (_, acc4), _ = jax.jit(accumulate_gradients(loss_fn, 4))(
        params, clips, labels)
    _, acc_full = loss_fn(params, clips, labels)
    np.testing.assert_allclose(float(acc4), float(acc_full), rtol=1e-6)


def test_divisibility_error():
    def loss_fn(p, x):
        return (p["w"] * x).sum()

    grad_fn = accumulate_gradients(loss_fn, 3)
    with pytest.raises(ValueError, match="not divisible"):
        grad_fn({"w": jnp.ones(())}, jnp.ones((8, 2)))
    with pytest.raises(ValueError, match="n_accum"):
        accumulate_gradients(loss_fn, 0)


def test_trains_a_step():
    """Composes with an optimizer into a working training step."""
    model, params = model_and_params()
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    grad_fn = accumulate_gradients(
        lambda p, x, y: optax.softmax_cross_entropy_with_integer_labels(
            model.apply(p, x), y).mean(), 4)

    @jax.jit
    def step(params, opt, x, y):
        (loss, _), grads = grad_fn(params, x, y)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    clips = jax.random.uniform(jax.random.PRNGKey(2), CLIP)
    labels = jnp.array([0, 1, 1, 0, 1, 0, 0, 1])
    losses = []
    for _ in range(5):
        params, opt, loss = step(params, opt, clips, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

"""Streaming KV-cache inference: exact parity with the batch causal
forward, causality of the batch model, ring clamping, jit stability."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor_stream_tpu.models.streaming import init_stream_cache, stream_step
from tensor_stream_tpu.models.video_vit import VideoViT, init_vit

B, T, H, W = 2, 8, 32, 32
TUB = 2
STEPS = T // TUB


def causal_vit(**kw):
    kw.setdefault("num_classes", 3)
    kw.setdefault("depth", 2)
    kw.setdefault("dim", 32)
    kw.setdefault("num_heads", 2)
    kw.setdefault("patch", 8)
    kw.setdefault("tubelet_t", TUB)
    kw.setdefault("compute_dtype", jnp.float32)
    kw.setdefault("causal", True)
    return VideoViT(**kw)


def test_batch_causal_is_causal():
    """Changing FUTURE frames must not change past steps' logits."""
    model = causal_vit()
    params = init_vit(jax.random.PRNGKey(0), model, (B, T, H, W, 3))
    clips = jax.random.uniform(jax.random.PRNGKey(1), (B, T, H, W, 3))
    tampered = clips.at[:, T // 2:].set(0.12345)
    a = np.asarray(model.apply(params, clips))          # [B, T', C]
    b = np.asarray(model.apply(params, tampered))
    half = (T // 2) // TUB
    np.testing.assert_allclose(a[:, :half], b[:, :half],
                               rtol=1e-6, atol=1e-7)
    assert not np.allclose(a[:, half:], b[:, half:])


def test_stream_matches_batch_causal_f32():
    """Feeding the clip tubelet-by-tubelet reproduces the batch causal
    forward's per-step logits (f32: tight).

    Pinned to matmul precision "highest" so f32 is f32-accurate on the
    MXU too: batch and streaming are *different programs* (full-sequence
    attention vs cached incremental), so at DEFAULT precision each side
    carries its own ~1e-3 bf16-pass envelope on TPU and a tight
    comparison is meaningless. At "highest" the residual is pure f32
    reduction-order noise on every backend. (bf16 production numerics
    are covered by the companion test below.)"""
    with jax.default_matmul_precision("highest"):
        model = causal_vit()
        params = init_vit(jax.random.PRNGKey(0), model, (B, T, H, W, 3))
        clips = jax.random.uniform(jax.random.PRNGKey(1), (B, T, H, W, 3))
        want = np.asarray(jax.jit(model.apply)(params, clips))  # [B, T', C]

        cache = init_stream_cache(model, params, batch=B, max_steps=STEPS)
        step = jax.jit(partial(stream_step, model, params))
        for t in range(STEPS):
            frames = clips[:, t * TUB:(t + 1) * TUB]
            cache, logits = step(cache, frames)
            np.testing.assert_allclose(np.asarray(logits), want[:, t],
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=f"step {t}")
        assert int(cache["t"]) == STEPS


def test_stream_matches_batch_causal_bf16():
    """Production dtype: bf16 compute — per-step logits agree to bf16
    tolerance and argmax matches."""
    model = causal_vit(compute_dtype=jnp.bfloat16)
    params = init_vit(jax.random.PRNGKey(0), model, (B, T, H, W, 3))
    clips = jax.random.uniform(jax.random.PRNGKey(1), (B, T, H, W, 3))
    want = np.asarray(jax.jit(model.apply)(params, clips))

    cache = init_stream_cache(model, params, batch=B, max_steps=STEPS)
    step = jax.jit(partial(stream_step, model, params))
    for t in range(STEPS):
        cache, logits = step(cache, clips[:, t * TUB:(t + 1) * TUB])
        got = np.asarray(logits)
        np.testing.assert_allclose(got, want[:, t], rtol=0.05, atol=0.05,
                                   err_msg=f"step {t}")
        assert (got.argmax(-1) == want[:, t].argmax(-1)).all()


def test_stream_past_positional_extent_clamps():
    """A cache longer than the trained temporal extent keeps serving
    (positions clamp to the last embedding) — no crash, finite logits."""
    model = causal_vit()
    params = init_vit(jax.random.PRNGKey(0), model, (B, T, H, W, 3))
    cache = init_stream_cache(model, params, batch=B,
                              max_steps=STEPS + 3)
    step = jax.jit(partial(stream_step, model, params))
    rng = np.random.default_rng(0)
    for _ in range(STEPS + 3):
        frames = jnp.asarray(rng.uniform(0, 1, (B, TUB, H, W, 3)),
                             jnp.float32)
        cache, logits = step(cache, frames)
        assert np.isfinite(np.asarray(logits)).all()


def test_causal_model_trains():
    """The causal variant trains in batch mode (per-step CE) — the
    train-batch / serve-streaming pairing is end-to-end viable."""
    import optax
    model = causal_vit(compute_dtype=jnp.bfloat16)
    params = init_vit(jax.random.PRNGKey(0), model, (B, T, H, W, 3))
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    ramp = np.linspace(0, 1, T, dtype=np.float32)
    clips = jnp.asarray(
        np.random.default_rng(0).uniform(0, .25, (B, T, H, W, 3))
        + ramp[None, :, None, None, None], jnp.float32)
    labels = jnp.zeros((B, STEPS), jnp.int32)

    @jax.jit
    def train(params, opt):
        def loss_fn(p):
            logits = model.apply(p, clips)              # [B, T', C]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), new_opt, loss

    losses = []
    for _ in range(6):
        params, opt, loss = train(params, opt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ring_slides_over_recent_steps():
    """Past max_steps the cache is a ring: step t overwrites slot
    t % S. Block-0 temporal k/v depend only on the current frame, so
    they must match a large-cache run slot-for-slot after wrapping;
    logits stay finite as the window slides."""
    model = causal_vit()
    params = init_vit(jax.random.PRNGKey(0), model, (B, T, H, W, 3))
    S = 3
    n_steps = S + 2
    rng = np.random.default_rng(1)
    frames = [jnp.asarray(rng.uniform(0, 1, (B, TUB, H, W, 3)),
                          jnp.float32) for _ in range(n_steps)]

    step = jax.jit(partial(stream_step, model, params))
    ring = init_stream_cache(model, params, batch=B, max_steps=S)
    big = init_stream_cache(model, params, batch=B, max_steps=n_steps)
    for t in range(n_steps):
        ring, ring_logits = step(ring, frames[t])
        big, big_logits = step(big, frames[t])
        assert np.isfinite(np.asarray(ring_logits)).all()
        # Before the ring wraps the two runs are identical everywhere.
        if t < S:
            np.testing.assert_allclose(np.asarray(ring_logits),
                                       np.asarray(big_logits),
                                       rtol=2e-5, atol=2e-6)
        # Block-0 k for step t sits at slot t%S and equals the
        # large-cache entry for step t (history-independent at block 0).
        np.testing.assert_allclose(
            np.asarray(ring["blocks"][0]["k"][:, :, t % S]),
            np.asarray(big["blocks"][0]["k"][:, :, t]),
            rtol=1e-5, atol=1e-6, err_msg=f"step {t}")


def test_stream_gqa_shrinks_cache_and_matches_batch():
    """GQA (num_kv_heads < num_heads): the cache carries only the kv
    heads — here half the memory — and streaming still reproduces the
    batch causal forward exactly."""
    with jax.default_matmul_precision("highest"):
        model = causal_vit(num_heads=4, num_kv_heads=2)
        params = init_vit(jax.random.PRNGKey(0), model, (B, T, H, W, 3))
        # kv projections (and therefore the cache) carry 2 heads, q 4.
        blk = params["params"]["block0"]["attn_t"]
        assert blk["key"]["kernel"].shape[1] == 2
        assert blk["query"]["kernel"].shape[1] == 4
        clips = jax.random.uniform(jax.random.PRNGKey(1), (B, T, H, W, 3))
        want = np.asarray(jax.jit(model.apply)(params, clips))

        cache = init_stream_cache(model, params, batch=B, max_steps=STEPS)
        assert cache["blocks"][0]["k"].shape[-2] == 2   # kv heads only
        step = jax.jit(partial(stream_step, model, params))
        for t in range(STEPS):
            cache, logits = step(cache, clips[:, t * TUB:(t + 1) * TUB])
            np.testing.assert_allclose(np.asarray(logits), want[:, t],
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=f"step {t}")


def test_windowed_batch_matches_ring_beyond_wrap():
    """temporal_window=S is the exact batch twin of a max_steps=S ring
    cache: per-step logits agree at EVERY t — including past the wrap,
    where the plain causal batch model diverges from the ring."""
    S = 2
    assert S < STEPS
    with jax.default_matmul_precision("highest"):
        plain = causal_vit()
        windowed = causal_vit(temporal_window=S)
        params = init_vit(jax.random.PRNGKey(0), plain, (B, T, H, W, 3))
        clips = jax.random.uniform(jax.random.PRNGKey(1), (B, T, H, W, 3))
        want_w = np.asarray(jax.jit(windowed.apply)(params, clips))
        want_full = np.asarray(jax.jit(plain.apply)(params, clips))

        cache = init_stream_cache(plain, params, batch=B, max_steps=S)
        step = jax.jit(partial(stream_step, plain, params))
        diverged = False
        for t in range(STEPS):
            cache, logits = step(cache, clips[:, t * TUB:(t + 1) * TUB])
            got = np.asarray(logits)
            np.testing.assert_allclose(got, want_w[:, t],
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=f"step {t}")
            if t >= S and not np.allclose(got, want_full[:, t],
                                          rtol=1e-3, atol=1e-3):
                diverged = True
        # Sanity: the window genuinely bit — the full-attention batch
        # model does NOT track the ring after the wrap.
        assert diverged


def test_windowed_model_requires_causal():
    with pytest.raises(ValueError, match="temporal_window"):
        causal_vit(causal=False, temporal_window=2).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, T, H, W, 3), jnp.float32))

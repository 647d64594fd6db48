"""Causal Video-VAE: shapes, temporal causality of the encoder,
streaming-chunk equivalence, KL sanity, dp-sharded training descent."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tensor_stream_tpu.models.video_vae import (VideoVAE, make_vae_train_step,
                                                vae_loss)
from tensor_stream_tpu.parallel import make_mesh

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")

CLIP = (2, 8, 16, 16, 3)


def vae_and_params(**kw):
    kw.setdefault("base", 8)
    kw.setdefault("latent", 4)
    kw.setdefault("compute_dtype", jnp.float32)
    model = VideoVAE(**kw)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros(CLIP),
                        jax.random.PRNGKey(1))
    return model, params


def test_shapes_roundtrip():
    model, params = vae_and_params()
    clips = jax.random.uniform(jax.random.PRNGKey(2), CLIP)
    recon, mean, logvar = jax.jit(
        lambda p, x: model.apply(p, x, jax.random.PRNGKey(3)))(params,
                                                               clips)
    assert recon.shape == CLIP
    # T/2, H/4, W/4, latent channels.
    assert mean.shape == (2, 4, 4, 4, 4)
    assert logvar.shape == mean.shape
    assert np.isfinite(np.asarray(recon)).all()


def test_encoder_is_temporally_causal():
    """Latent step j sees only frames <= 2j: tampering the second half
    of the clip leaves the first half's latents bit-identical (the
    per-frame GroupNorm statistics keep it that way)."""
    model, params = vae_and_params()
    clips = jax.random.uniform(jax.random.PRNGKey(2), CLIP)
    tampered = clips.at[:, 4:].set(0.777)
    m1, lv1 = model.apply(params, clips, method=VideoVAE.encode)
    m2, lv2 = model.apply(params, tampered, method=VideoVAE.encode)
    # Latents j with 2j < 4, i.e. j in {0, 1}, are untouched.
    np.testing.assert_array_equal(np.asarray(m1[:, :2]),
                                  np.asarray(m2[:, :2]))
    np.testing.assert_array_equal(np.asarray(lv1[:, :2]),
                                  np.asarray(lv2[:, :2]))
    assert not np.allclose(np.asarray(m1[:, 2:]), np.asarray(m2[:, 2:]))


def test_streaming_chunk_equivalence():
    """Causality in the useful direction: encoding a PREFIX of the clip
    yields the prefix of the full clip's latents — a live stream can
    be encoded chunk-by-chunk. Numerical (1e-5), not bitwise: XLA
    fuses differently per shape, so reductions reorder; the bitwise
    causality guarantee is the same-shape tamper test above."""
    model, params = vae_and_params()
    clips = jax.random.uniform(jax.random.PRNGKey(2), CLIP)
    m_full, _ = model.apply(params, clips, method=VideoVAE.encode)
    m_half, _ = model.apply(params, clips[:, :4], method=VideoVAE.encode)
    np.testing.assert_allclose(np.asarray(m_full[:, :2]),
                               np.asarray(m_half), rtol=1e-4, atol=1e-6)


def test_kl_and_loss_behave():
    model, params = vae_and_params()
    clips = jax.random.uniform(jax.random.PRNGKey(2), CLIP)
    recon, mean, logvar = model.apply(params, clips,
                                      jax.random.PRNGKey(3))
    loss, (rec, kl) = vae_loss(recon, clips, mean, logvar)
    assert float(kl) >= 0.0          # KL(q || N(0,1)) is non-negative
    assert float(rec) > 0.0
    assert np.isfinite(float(loss))
    # KL of an exact standard normal is zero.
    assert float(vae_loss(recon, clips, jnp.zeros_like(mean),
                          jnp.zeros_like(logvar))[1][1]) == 0.0


@needs_mesh
def test_vae_train_step_descends():
    mesh = make_mesh(8, axes=("dp", "mp"))
    model, params = vae_and_params(compute_dtype=jnp.bfloat16)
    tx = optax.adam(1e-3)
    shard_params, step = make_vae_train_step(mesh, model, tx)
    sp = shard_params(params)
    so = tx.init(sp)
    clips = jax.random.uniform(jax.random.PRNGKey(5),
                               (8,) + CLIP[1:])
    losses = []
    for i in range(6):
        sp, so, loss, rec, kl = step(sp, so, clips,
                                     jax.random.fold_in(
                                         jax.random.PRNGKey(9), i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

"""PSNR/SSIM metrics: closed-form oracles, known-noise behavior,
batch/clip shapes, and agreement with an independent numpy SSIM."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor_stream_tpu.ops.metrics import psnr, ssim


def test_psnr_closed_form():
    a = jnp.zeros((1, 16, 16, 3))
    b = jnp.full((1, 16, 16, 3), 0.1)
    # mse = 0.01 → psnr = 10*log10(1/0.01) = 20 dB. rtol 5e-5: the TPU's
    # tree-reduced f32 mean lands ~1.2e-5 rel off the sequential sum
    # (20.000237 dB) — reduction order, not a defect.
    np.testing.assert_allclose(np.asarray(psnr(a, b)), [20.0], rtol=5e-5)
    # u8 scale: same image halved error → +6.02 dB per halving.
    a8 = jnp.zeros((1, 16, 16, 3))
    np.testing.assert_allclose(
        float(psnr(a8, jnp.full_like(a8, 16.0), max_val=255.0)[0])
        - float(psnr(a8, jnp.full_like(a8, 32.0), max_val=255.0)[0]),
        20 * np.log10(2), rtol=5e-5)


def test_psnr_identical_is_inf_and_batch_shape():
    clips = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 16, 16, 3))
    p = np.asarray(psnr(clips, clips))
    assert p.shape == (2, 4)
    assert np.isinf(p).all()


def test_ssim_identical_is_one():
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(ssim(imgs, imgs)),
                               np.ones(3), rtol=1e-5)


def test_ssim_orders_degradations():
    """More noise → lower SSIM; SSIM in [0, 1] for positive images."""
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 48, 48, 3))
    n1 = img + 0.02 * jax.random.normal(jax.random.PRNGKey(3), img.shape)
    n2 = img + 0.10 * jax.random.normal(jax.random.PRNGKey(3), img.shape)
    s1, s2 = float(ssim(img, n1)[0]), float(ssim(img, n2)[0])
    assert 0.0 < s2 < s1 < 1.0


def test_ssim_matches_reference_implementation():
    """Independent numpy re-implementation (direct windowed sums)
    agrees to float tolerance."""
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (1, 24, 24, 1)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)

    x = np.arange(11, dtype=np.float64) - 5.0
    g = np.exp(-(x ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()
    win = np.outer(g, g)

    def conv(img):
        out = np.zeros((14, 14))
        for i in range(14):
            for j in range(14):
                out[i, j] = (img[i:i + 11, j:j + 11] * win).sum()
        return out

    ia, ib = a[0, :, :, 0].astype(np.float64), b[0, :, :, 0].astype(np.float64)
    mua, mub = conv(ia), conv(ib)
    saa = conv(ia * ia) - mua ** 2
    sbb = conv(ib * ib) - mub ** 2
    sab = conv(ia * ib) - mua * mub
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    want = np.mean((2 * mua * mub + c1) * (2 * sab + c2) /
                   ((mua ** 2 + mub ** 2 + c1) * (saa + sbb + c2)))
    got = float(ssim(jnp.asarray(a), jnp.asarray(b))[0])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_vae_reconstruction_quality_is_measurable():
    """Glue: metrics over the Video-VAE's reconstructions — shapes line
    up with clip batches and the numbers are finite/sane."""
    from tensor_stream_tpu.models.video_vae import VideoVAE
    model = VideoVAE(base=8, latent=4, compute_dtype=jnp.float32)
    clips = jax.random.uniform(jax.random.PRNGKey(4), (2, 4, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), clips,
                        jax.random.PRNGKey(1))
    recon, _, _ = model.apply(params, clips, jax.random.PRNGKey(2))
    p = np.asarray(psnr(clips, recon))
    s = np.asarray(ssim(clips, recon))
    assert p.shape == (2, 4) and s.shape == (2, 4)
    assert np.isfinite(p).all() and np.isfinite(s).all()

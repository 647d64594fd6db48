"""Video quality metrics — PSNR and SSIM, jitted, batch/clip-shaped.

Evaluation counterparts of the write side: transcode/style/VAE
pipelines need quality numbers next to throughput numbers. Both
metrics follow the canonical definitions (SSIM per Wang et al. 2004
with the standard 11x11 Gaussian window, K1=0.01, K2=0.03) and accept
any leading batch/time axes over [..., H, W, C] images in ANY common
range (pass `max_val`: 255 for u8-scale, 1.0 for normalized).

Pure jittable functions; reductions in f32. SSIM's window convolution
is depthwise (feature_group_count) — one fused XLA op per moment.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_val", "axes"))
def psnr(a, b, max_val=1.0, axes=(-3, -2, -1)):
    """Peak signal-to-noise ratio in dB over `axes` (default: one
    value per leading batch/time element). Identical inputs → +inf."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean((a - b) ** 2, axis=axes)
    return 10.0 * (2 * jnp.log10(max_val) - jnp.log10(mse))


def _gaussian_window(size=11, sigma=1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def _depthwise(img, window):
    """Depthwise 2D convolution of [N, H, W, C] with [kh, kw]."""
    c = img.shape[-1]
    kern = jnp.tile(window[:, :, None, None], (1, 1, 1, c))
    # HIGHEST: quality metrics must be f32-accurate — at DEFAULT
    # precision the TPU runs this conv as bf16 MXU passes, and the
    # E[x²]−E[x]² variances downstream amplify the rounding (the 11x11
    # windows are tiny; speed is irrelevant here).
    return jax.lax.conv_general_dilated(
        img, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("max_val",))
def ssim(a, b, max_val=1.0):
    """Mean SSIM over [..., H, W, C]; one value per leading element.
    H, W must be >= 11 (the window)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    lead = a.shape[:-3]
    a = a.reshape((-1,) + a.shape[-3:])
    b = b.reshape((-1,) + b.shape[-3:])
    win = _gaussian_window()
    mu_a = _depthwise(a, win)
    mu_b = _depthwise(b, win)
    saa = _depthwise(a * a, win) - mu_a ** 2
    sbb = _depthwise(b * b, win) - mu_b ** 2
    sab = _depthwise(a * b, win) - mu_a * mu_b
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * sab + c2) /
         ((mu_a ** 2 + mu_b ** 2 + c1) * (saa + sbb + c2)))
    return s.mean(axis=(1, 2, 3)).reshape(lead)

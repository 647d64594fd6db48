"""TransformerNet — the fast-neural-style network, TPU-native.

Functional re-design of the reference example's torch model
(reference: python_examples/fast_neural_style/transfromer_net.py:4-99) in
flax/linen with NHWC layout (the TPU-friendly convention: channels last
feeds the MXU's 128-wide lanes; torch used NCHW):

  conv9x9(3->32) -> IN -> relu
  conv3x3 s2 (32->64) -> IN -> relu
  conv3x3 s2 (64->128) -> IN -> relu
  5 x residual[conv3x3 -> IN -> relu -> conv3x3 -> IN, +skip]
  upsample2x + conv3x3 (128->64) -> IN -> relu
  upsample2x + conv3x3 (64->32) -> IN -> relu
  conv9x9(32->3)

All convolutions use reflection padding and instance norm is affine,
matching the reference. Upsampling is nearest-neighbor before conv
(checkerboard-free, as in the reference).
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def reflect_pad(x, pad: int):
    """ReflectionPad2d equivalent on NHWC."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True): per-sample, per-channel over H,W."""
    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class ConvLayer(nn.Module):
    features: int
    kernel: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = reflect_pad(x, self.kernel // 2)
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride), padding="VALID")(x)


class ResidualBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvLayer(self.channels, 3)(x)
        y = InstanceNorm(self.channels)(y)
        y = nn.relu(y)
        y = ConvLayer(self.channels, 3)(y)
        y = InstanceNorm(self.channels)(y)
        return y + residual


class UpsampleConvLayer(nn.Module):
    features: int
    kernel: int
    upsample: int = 2

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * self.upsample, w * self.upsample, c),
                             method="nearest")
        x = reflect_pad(x, self.kernel // 2)
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       padding="VALID")(x)


class TransformerNet(nn.Module):
    """Input/output: NHWC float32 images in [0, 255] (like the torch
    reference, which feeds un-normalized 0-255 RGB)."""

    @nn.compact
    def __call__(self, x):
        y = nn.relu(InstanceNorm(32)(ConvLayer(32, 9)(x)))
        y = nn.relu(InstanceNorm(64)(ConvLayer(64, 3, stride=2)(y)))
        y = nn.relu(InstanceNorm(128)(ConvLayer(128, 3, stride=2)(y)))
        for _ in range(5):
            y = ResidualBlock(128)(y)
        y = nn.relu(InstanceNorm(64)(UpsampleConvLayer(64, 3)(y)))
        y = nn.relu(InstanceNorm(32)(UpsampleConvLayer(32, 3)(y)))
        return ConvLayer(3, 9)(y)


def init_params(rng, height: int = 256, width: int = 256, batch: int = 1):
    model = TransformerNet()
    dummy = jnp.zeros((batch, height, width, 3), jnp.float32)
    return model.init(rng, dummy)


def gram_matrix(features):
    """Channel covariance of NHWC activations, per sample — the style
    statistic of fast neural style (Gatys et al.)."""
    n, h, w, c = features.shape
    f = features.reshape(n, h * w, c)
    return jnp.einsum("nic,nid->ncd", f, f) / (h * w * c)


def style_transfer_loss(apply_fn, params, content, style_grams,
                        content_weight: float = 1.0,
                        style_weight: float = 1e-4,
                        tv_weight: float = 1e-6):
    """Training objective for the style network: content fidelity + gram
    style statistics + total-variation smoothness. (The torch example uses
    frozen-VGG perceptual features; this self-contained objective has the
    same structure and exercises the identical training-step machinery.)"""
    out = apply_fn(params, content)
    content_loss = jnp.mean((out - content) ** 2)
    g = gram_matrix(out)
    style_loss = jnp.mean((g - style_grams) ** 2)
    tv = (jnp.mean(jnp.abs(out[:, 1:] - out[:, :-1]))
          + jnp.mean(jnp.abs(out[:, :, 1:] - out[:, :, :-1])))
    return (content_weight * content_loss + style_weight * style_loss
            + tv_weight * tv)

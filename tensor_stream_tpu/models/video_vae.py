"""Causal Video-VAE — the video-generation building block, TPU-native.

Latent video models (diffusion/AR generation, world models) train on
the latents of a 3D VAE over exactly the [B, T, H, W, C] clips the
clip loaders produce. This one is TEMPORALLY CAUSAL: every 3D conv
pads only to the left in time, so frame t's latent depends only on
frames <= t — the encoder can run over a live stream chunk-by-chunk,
and the first frame behaves like an image (image checkpoints
bootstrap cleanly). The standard modern video-VAE recipe, built
TPU-first:

  * NTHWC layout, bf16 conv compute / f32 params (MXU-native);
  * space 4x/4x and time 2x downsampling via strided causal convs —
    stride-2 convs instead of pooling (one MXU pass each);
  * GroupNorm (f32) + SiLU; nearest-upsample + conv on the decoder
    (checkerboard-free, same choice as the style network);
  * diagonal-Gaussian bottleneck with the classic reparameterized
    sample + KL(q || N(0,1)).

`make_vae_train_step` builds the dp-sharded recon+KL training step.
No reference counterpart (per-frame CNN inference only).
"""
from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P


class CausalConv3D(nn.Module):
    """3D conv, causal in time: left-only temporal padding, SAME space."""
    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        pad = [(kt - 1, 0),
               ((kh - 1) // 2, kh // 2),
               ((kw - 1) // 2, kw // 2)]
        return nn.Conv(self.features, self.kernel, strides=self.strides,
                       padding=pad, dtype=self.compute_dtype,
                       param_dtype=jnp.float32)(x)


def _norm(features):
    """GroupNorm with PER-FRAME statistics (reduces over H, W and the
    group's channels only — the default would reduce over T too, and a
    frame-t activation depending on frame-t+k statistics would break
    temporal causality)."""
    return nn.GroupNorm(num_groups=min(8, features), dtype=jnp.float32,
                        reduction_axes=(2, 3, 4))


class ResBlock(nn.Module):
    features: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = _norm(x.shape[-1])(x)
        h = nn.silu(h).astype(self.compute_dtype)
        h = CausalConv3D(self.features,
                         compute_dtype=self.compute_dtype)(h)
        h = _norm(self.features)(h)
        h = nn.silu(h).astype(self.compute_dtype)
        h = CausalConv3D(self.features,
                         compute_dtype=self.compute_dtype)(h)
        if x.shape[-1] != self.features:
            x = CausalConv3D(self.features, kernel=(1, 1, 1),
                             compute_dtype=self.compute_dtype)(x)
        return (x + h).astype(jnp.float32)


class Encoder(nn.Module):
    base: int
    latent: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = self.compute_dtype
        x = CausalConv3D(self.base, compute_dtype=c)(x.astype(c))
        x = ResBlock(self.base, c)(x)
        # space /2, time /1 — keep early frames cheap to stream.
        x = CausalConv3D(self.base * 2, strides=(1, 2, 2),
                         compute_dtype=c)(x.astype(c))
        x = ResBlock(self.base * 2, c)(x)
        # space /2, time /2.
        x = CausalConv3D(self.base * 4, strides=(2, 2, 2),
                         compute_dtype=c)(x.astype(c))
        x = ResBlock(self.base * 4, c)(x)
        moments = CausalConv3D(2 * self.latent, kernel=(1, 1, 1),
                               compute_dtype=c)(x.astype(c))
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class Decoder(nn.Module):
    base: int
    out_channels: int = 3
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, z):
        c = self.compute_dtype
        x = CausalConv3D(self.base * 4, compute_dtype=c)(z.astype(c))
        x = ResBlock(self.base * 4, c)(x)
        # time x2, space x2 (nearest + conv: checkerboard-free).
        x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2),
                       2, axis=3)
        x = CausalConv3D(self.base * 2, compute_dtype=c)(x.astype(c))
        x = ResBlock(self.base * 2, c)(x)
        # space x2.
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        x = CausalConv3D(self.base, compute_dtype=c)(x.astype(c))
        x = ResBlock(self.base, c)(x)
        return CausalConv3D(self.out_channels, kernel=(1, 1, 1),
                            compute_dtype=c)(x.astype(c)
                                             ).astype(jnp.float32)


class VideoVAE(nn.Module):
    """[B, T, H, W, C] → (recon, mean, logvar). T, H, W must be
    divisible by 2, 4, 4 (one temporal and two spatial stride-2s)."""
    base: int = 32
    latent: int = 8
    out_channels: int = 3
    compute_dtype: Any = jnp.bfloat16

    def setup(self):
        self.encoder = Encoder(self.base, self.latent, self.compute_dtype)
        self.decoder = Decoder(self.base, self.out_channels,
                               self.compute_dtype)

    def __call__(self, clips, rng):
        b, t, h, w, _ = clips.shape
        assert t % 2 == 0 and h % 4 == 0 and w % 4 == 0, clips.shape
        mean, logvar = self.encoder(clips)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape)
        return self.decoder(z), mean, logvar

    def encode(self, clips):
        return self.encoder(clips)

    def decode(self, z):
        return self.decoder(z)


def vae_loss(recon, clips, mean, logvar, kl_weight=1e-4):
    """L2 reconstruction + KL(q || N(0,1)), both per-element means."""
    rec = jnp.mean((recon - clips) ** 2)
    kl = 0.5 * jnp.mean(jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar)
    return rec + kl_weight * kl, (rec, kl)


def make_vae_train_step(mesh, model: VideoVAE, tx, kl_weight=1e-4):
    """(shard_params, step): dp-sharded VAE training step.
    step(params, opt_state, clips, rng) -> (params, opt, loss, rec, kl)."""
    data_s = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    def shard_params(params):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, clips, rng):
        clips = jax.lax.with_sharding_constraint(clips, data_s)

        def loss_fn(p):
            recon, mean, logvar = model.apply(p, clips, rng)
            return vae_loss(recon, clips, mean, logvar, kl_weight)

        (loss, (rec, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state,
                loss, rec, kl)

    return shard_params, step

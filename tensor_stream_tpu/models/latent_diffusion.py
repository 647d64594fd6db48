"""Latent video diffusion — DiT over Video-VAE latents, TPU-native.

The generation-side capstone of the model zoo: clips from the loaders
encode into the causal Video-VAE's latent space, a diffusion
transformer (DiT) learns to denoise those latents, and DDIM sampling
decodes new latents back through the VAE. The transformer REUSES the
factorized space-time attention layout (spatial then temporal per
block, bf16 MXU matmuls), so all the parallelism machinery (tp specs,
remat) applies unchanged. Conditioning is adaLN-zero by default (the
DiT recipe: per-sublayer shift/scale/gate regressed from the timestep
embedding, zero-init — every block starts as the identity);
conditioning="in_context" keeps the plain FactorizedBlock variant
with the embedding added to the tokens.

Scheduler: DDPM cosine ᾱ schedule (Nichol & Dhariwal), ε-prediction
MSE training, deterministic DDIM sampling under `lax.scan` (static
step count, jit-friendly). All schedule tensors are precomputed
numpy — nothing data-dependent inside jit.
"""
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .video_vit import MHA, FactorizedBlock, tubelet_embed


# --------------------------------------------------------------- schedule

def cosine_alpha_bar(timesteps: int, s: float = 0.008) -> np.ndarray:
    """ᾱ_t for t in [0, timesteps], cosine schedule; ᾱ_0 = 1."""
    t = np.linspace(0, 1, timesteps + 1)
    f = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
    return (f / f[0]).astype(np.float32)


class DiffusionSchedule:
    """Precomputed DDPM/DDIM quantities (host numpy; indexable in jit)."""

    def __init__(self, timesteps: int = 1000):
        self.timesteps = timesteps
        # Nichol & Dhariwal's guard: clip the per-step BETAS at 0.999
        # (not abar itself) — abar stays strictly decreasing all the
        # way to t=T instead of flattening, and never reaches the exact
        # 0 that would blow up x0-from-eps.
        ab = cosine_alpha_bar(timesteps).astype(np.float64)
        betas = np.clip(1.0 - ab[1:] / ab[:-1], 0.0, 0.999)
        self.alpha_bar = jnp.asarray(
            np.concatenate([[1.0], np.cumprod(1.0 - betas)])
            .astype(np.float32))                              # [T+1]

    def q_sample(self, x0, t, noise):
        """Forward process: x_t = sqrt(ᾱ_t) x0 + sqrt(1-ᾱ_t) ε.
        t: [B] int in [1, timesteps]."""
        ab = self.alpha_bar[t][:, None, None, None, None]
        return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise

    def x0_from_eps(self, xt, t, eps):
        ab = self.alpha_bar[t][:, None, None, None, None]
        return (xt - jnp.sqrt(1.0 - ab) * eps) / jnp.sqrt(ab)

    def ddim_step(self, xt, t, t_prev, eps):
        """Deterministic DDIM x_t → x_{t_prev} given predicted ε."""
        x0 = self.x0_from_eps(xt, t, eps)
        ab_prev = self.alpha_bar[t_prev][:, None, None, None, None]
        return jnp.sqrt(ab_prev) * x0 + jnp.sqrt(1.0 - ab_prev) * eps


# ------------------------------------------------------------------ model

def timestep_embedding(t, dim: int, max_period: float = 10_000.0):
    """Sinusoidal embedding of integer timesteps, [B] → [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class DiTBlock(nn.Module):
    """Factorized space-time block with adaLN-zero conditioning (the
    DiT recipe): each sublayer's LayerNorm is non-affine and modulated
    by a (shift, scale, gate) triple regressed from the conditioning
    vector, all zero-init — at initialization every block is exactly
    the identity, so depth costs nothing at the start of training.

    `ring_axis`/`mesh`: context parallelism for the spatial pathway
    (ring attention over the sp-sharded token axis — ops/
    ring_attention.py), same contract as FactorizedBlock's."""
    num_heads: int
    hidden_mult: int = 4
    compute_dtype: Any = jnp.bfloat16
    ring_axis: Any = None
    mesh: Any = None
    ring_batch_axis: Any = "dp"
    ring_head_axis: Any = None

    @nn.compact
    def __call__(self, x, c):
        d = x.shape[-1]
        mods = nn.Dense(9 * d, kernel_init=nn.initializers.zeros,
                        dtype=jnp.float32, name="adaLN")(nn.silu(c))
        m = jnp.split(mods, 9, axis=-1)     # each [B, D]

        def mod(h, shift, scale):
            return h * (1 + scale[:, None, None]) + shift[:, None, None]

        ln = partial(nn.LayerNorm, dtype=jnp.float32, use_bias=False,
                     use_scale=False)
        mha = partial(MHA, num_heads=self.num_heads,
                      compute_dtype=self.compute_dtype)
        # Spatial attention.
        y = mod(ln(name="ln_s")(x), m[0], m[1]).astype(self.compute_dtype)
        x = x + m[2][:, None, None] * mha(
            name="attn_s", ring_axis=self.ring_axis, mesh=self.mesh,
            ring_batch_axis=self.ring_batch_axis,
            ring_head_axis=self.ring_head_axis)(y).astype(x.dtype)
        # Temporal attention.
        y = mod(ln(name="ln_t")(x), m[3], m[4]).astype(self.compute_dtype)
        y = jnp.swapaxes(y, 1, 2)
        y = mha(name="attn_t")(y)
        x = x + m[5][:, None, None] * jnp.swapaxes(y, 1, 2).astype(x.dtype)
        # MLP.
        y = mod(ln(name="ln_m")(x), m[6], m[7]).astype(self.compute_dtype)
        h = nn.Dense(self.hidden_mult * d, dtype=self.compute_dtype,
                     param_dtype=jnp.float32, name="fc1")(y)
        h = nn.gelu(h)
        y = nn.Dense(d, dtype=self.compute_dtype,
                     param_dtype=jnp.float32, name="fc2")(h)
        return x + m[8][:, None, None] * y.astype(x.dtype)


class VideoDiT(nn.Module):
    """ε-predictor over [B, T', h', w', Cz] latents.

    Tokens come from the SHARED tubelet stem (video_vit.tubelet_embed,
    default tubelet_t=patch=1: a per-latent-pixel linear embed —
    latents are already 4-8x compressed, so N stays small); adaLN-zero
    DiTBlocks by default (in-context FactorizedBlocks via
    conditioning=); linear head back to Cz channels, zero-init so the
    initial prediction is 0 (training starts stable)."""
    depth: int = 4
    dim: int = 192
    num_heads: int = 3
    hidden_mult: int = 4
    patch: int = 1
    tubelet_t: int = 1
    compute_dtype: Any = jnp.bfloat16
    remat: bool = False
    # "adaln" (default, the DiT recipe: zero-init shift/scale/gate per
    # sublayer — every block starts as the identity) or "in_context"
    # (timestep embedding added to the tokens; plain FactorizedBlocks).
    conditioning: str = "adaln"
    # > 0: class-conditional generation. Label num_classes is the
    # NULL (unconditional) class — train with label dropout, sample
    # with classifier-free guidance (cfg_eps / guidance_scale).
    num_classes: int = 0
    # Context parallelism: spatial attention rings over the sp-sharded
    # token axis (see video_vit.MHA / ops/ring_attention.py).
    ring_axis: Any = None
    mesh: Any = None
    ring_batch_axis: Any = "dp"
    ring_head_axis: Any = None

    @nn.compact
    def __call__(self, z, t, y=None):
        # The linear head writes one latent pixel per token; patchified
        # stems would need an unpatchify head.
        assert self.patch == 1 and self.tubelet_t == 1, \
            (self.patch, self.tubelet_t)
        assert self.conditioning in ("adaln", "in_context")
        b, tt_in, hh_in, ww_in, cz = z.shape
        x = tubelet_embed(self, z)        # [B, T', N, D], pos included
        temb = timestep_embedding(t, self.dim)
        temb = nn.Dense(self.dim, dtype=jnp.float32, name="time_mlp1")(temb)
        temb = nn.Dense(self.dim, dtype=jnp.float32,
                        name="time_mlp2")(nn.silu(temb))
        if self.num_classes:
            assert y is not None, "class-conditional model needs labels"
            # Index num_classes = the learned NULL embedding.
            yemb = nn.Embed(self.num_classes + 1, self.dim,
                            param_dtype=jnp.float32, name="label_embed")(y)
            temb = temb + yemb
        tt = tt_in // self.tubelet_t
        hh, ww = hh_in // self.patch, ww_in // self.patch
        if self.conditioning == "adaln":
            block = nn.remat(DiTBlock) if self.remat else DiTBlock
            for i in range(self.depth):
                x = block(num_heads=self.num_heads,
                          hidden_mult=self.hidden_mult,
                          compute_dtype=self.compute_dtype,
                          ring_axis=self.ring_axis, mesh=self.mesh,
                          ring_batch_axis=self.ring_batch_axis,
                          ring_head_axis=self.ring_head_axis,
                          name=f"block{i}")(x, temb)
        else:
            x = x + temb[:, None, None]
            block = nn.remat(FactorizedBlock) if self.remat \
                else FactorizedBlock
            for i in range(self.depth):
                x = block(num_heads=self.num_heads,
                          hidden_mult=self.hidden_mult,
                          compute_dtype=self.compute_dtype,
                          ring_axis=self.ring_axis, mesh=self.mesh,
                          ring_batch_axis=self.ring_batch_axis,
                          ring_head_axis=self.ring_head_axis,
                          name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_f")(x)
        eps = nn.Dense(cz, dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros,
                       name="head")(x)
        return eps.reshape(b, tt, hh, ww, cz)


# --------------------------------------------------------------- training

def _make_train_step(mesh, model: VideoDiT, schedule: DiffusionSchedule,
                     tx, conditional: bool, label_dropout: float):
    """Shared dp-sharded eps-MSE training step; the conditional flavor
    adds labels with NULL-class dropout (the classifier-free-guidance
    training recipe, Ho & Salimans)."""
    data_s = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    null = model.num_classes

    def shard_params(params):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), params)

    def body(params, opt_state, latents, labels, rng):
        latents = jax.lax.with_sharding_constraint(latents, data_s)
        b = latents.shape[0]
        rt, rn, rd = jax.random.split(rng, 3)
        t = jax.random.randint(rt, (b,), 1, schedule.timesteps + 1)
        noise = jax.random.normal(rn, latents.shape)
        xt = schedule.q_sample(latents, t, noise)
        if conditional:
            drop = jax.random.uniform(rd, (b,)) < label_dropout
            y = (jnp.where(drop, null, labels),)
        else:
            y = ()

        def loss_fn(p):
            eps = model.apply(p, xt, t, *y)
            return jnp.mean((eps - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    if conditional:
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, latents, labels, rng):
            return body(params, opt_state, latents, labels, rng)
    else:
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, latents, rng):
            return body(params, opt_state, latents, None, rng)

    return shard_params, step


def make_diffusion_train_step(mesh, model: VideoDiT,
                              schedule: DiffusionSchedule, tx):
    """(shard_params, step) — dp-sharded ε-prediction MSE training on
    latents. step(params, opt, latents, rng) -> (params, opt, loss)."""
    return _make_train_step(mesh, model, schedule, tx,
                            conditional=False, label_dropout=0.0)


def make_conditional_diffusion_train_step(mesh, model: VideoDiT,
                                          schedule: DiffusionSchedule, tx,
                                          label_dropout: float = 0.1):
    """Class-conditional flavor: step(params, opt, latents, labels,
    rng); `label_dropout` of the labels become the NULL class per step
    so the model also learns the unconditional prediction CFG needs."""
    assert model.num_classes > 0
    return _make_train_step(mesh, model, schedule, tx,
                            conditional=True, label_dropout=label_dropout)


def ddim_sample(model: VideoDiT, params, schedule: DiffusionSchedule,
                rng, shape, n_steps: int = 50, y=None,
                guidance_scale: float = 0.0):
    """Deterministic DDIM sampling: noise → latents, `n_steps` evenly
    spaced through the schedule, one compiled scan.

    Conditional models pass labels `y` [B]; guidance_scale w > 0
    applies classifier-free guidance, eps = (1 + w)·eps(y) − w·eps(∅)
    (two model calls per step)."""
    ts = np.linspace(schedule.timesteps, 0, n_steps + 1).round()
    ts = jnp.asarray(ts.astype(np.int32))          # [n_steps+1], desc to 0
    x = jax.random.normal(rng, shape)
    null = jnp.full((shape[0],), model.num_classes, jnp.int32) \
        if model.num_classes else None

    def eps_fn(x, t):
        if y is None:
            return model.apply(params, x, t)
        cond = model.apply(params, x, t, y)
        if guidance_scale == 0.0:
            return cond
        uncond = model.apply(params, x, t, null)
        return (1.0 + guidance_scale) * cond - guidance_scale * uncond

    def body(x, i):
        t = jnp.full((shape[0],), ts[i], jnp.int32)
        t_prev = jnp.full((shape[0],), ts[i + 1], jnp.int32)
        return schedule.ddim_step(x, t, t_prev, eps_fn(x, t)), None

    x, _ = jax.lax.scan(body, x, jnp.arange(n_steps))
    return x

"""Mixture-of-Experts VideoViT — expert parallelism ("ep"), TPU-native.

Completes the parallelism matrix (dp/tp/sp in video_vit.py, pp in
parallel/pipeline.py): the block MLP becomes a Switch-style top-1
mixture of E experts whose weights are STACKED on a leading expert axis
and sharded P("ep") — each device holds (and optimizes) only its own
experts. Routing uses the GShard/Switch einsum formulation: one-hot
dispatch/combine masks turn token routing into dense einsums with
static shapes, so the whole thing jits cleanly and GSPMD inserts the
all-to-alls between the token-sharded and expert-sharded layouts. No
reference counterpart (single-GPU CNN examples only).

Recipe (Switch Transformer, public):
  * router: logits [G, S, E] in f32, softmax, top-1 expert per token;
  * capacity C = ceil(S / E * capacity_factor) per group (a group is
    one clip's tokens — routing never crosses clips, so dp sharding of
    the batch needs no cross-device cumsum);
  * tokens over capacity are DROPPED (the residual connection carries
    them through unchanged — standard Switch behavior);
  * dispatch [G, S, E, C] one-hot → expert inputs [E, G, C, D] via one
    einsum (this is where GSPMD places the all-to-all when tokens are
    dp-sharded and experts ep-sharded);
  * experts: per-expert 2-layer gelu MLP as batched matmuls over the
    ep-sharded expert axis — large, square, bf16: MXU food;
  * combine einsum scales by the router gate (differentiable path);
  * aux load-balance loss: E * sum_e f_e * p_e (=1 at perfect balance),
    plus router z-loss 1e-3 * mean(logsumexp(logits)^2).
"""
from functools import partial
from typing import Any, Optional, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .video_vit import MHA, tubelet_embed


class MoEMLP(nn.Module):
    """Switch top-1 MoE over the tokens of each group.

    Input [G, S, D] → (output [G, S, D], aux-loss scalar). Dropped
    (over-capacity) tokens produce zero output; callers keep them alive
    through the residual.
    """
    num_experts: int
    hidden_mult: int = 4
    capacity_factor: float = 1.25
    compute_dtype: Any = jnp.bfloat16
    router_weight: float = 0.01
    zloss_weight: float = 1e-3

    @nn.compact
    def __call__(self, x):
        g, s, d = x.shape
        e = self.num_experts
        f = self.hidden_mult * d
        c = int(np.ceil(s / e * self.capacity_factor))
        # Router in f32: tiny matmul, numerically load-bearing.
        logits = nn.Dense(e, use_bias=False, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="router")(
                              x.astype(jnp.float32))           # [G,S,E]
        probs = jax.nn.softmax(logits, axis=-1)
        expert = jnp.argmax(probs, axis=-1)                     # [G,S]
        mask = jax.nn.one_hot(expert, e, dtype=jnp.float32)     # [G,S,E]
        gate = jnp.sum(probs * mask, axis=-1)                   # [G,S]
        # Position of each token inside its expert's buffer.
        pos = jnp.cumsum(mask, axis=1) * mask - 1.0             # [G,S,E]
        keep = (pos < c) & (mask > 0)
        pos_c = jnp.clip(pos, 0, c - 1).astype(jnp.int32)
        dispatch = (jax.nn.one_hot(pos_c, c, dtype=jnp.float32)
                    * keep[..., None])                          # [G,S,E,C]
        combine = dispatch * gate[:, :, None, None]
        # Dispatch → [E, G, C, D] (expert-major: this axis shards on ep).
        xin = jnp.einsum("gsec,gsd->egcd", dispatch,
                         x.astype(jnp.float32)).astype(self.compute_dtype)
        w1 = self.param("w1", nn.initializers.lecun_normal(), (e, d, f),
                        jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (e, f), jnp.float32)
        w2 = self.param("w2", nn.initializers.lecun_normal(), (e, f, d),
                        jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (e, d), jnp.float32)
        h = jnp.einsum("egcd,edf->egcf", xin,
                       w1.astype(self.compute_dtype))
        h = nn.gelu(h + b1[:, None, None].astype(self.compute_dtype))
        y = jnp.einsum("egcf,efd->egcd", h,
                       w2.astype(self.compute_dtype))
        y = y + b2[:, None, None].astype(self.compute_dtype)
        out = jnp.einsum("gsec,egcd->gsd", combine,
                         y.astype(jnp.float32))
        # Switch aux losses. f_e: fraction of tokens routed to e;
        # p_e: mean router prob for e. Balanced routing → balance = 1.
        f_e = mask.mean(axis=1)                                 # [G,E]
        p_e = probs.mean(axis=1)                                # [G,E]
        balance = e * jnp.sum(f_e * p_e, axis=-1).mean()
        zloss = jnp.mean(jax.scipy.special.logsumexp(logits, axis=-1) ** 2)
        aux = self.router_weight * balance + self.zloss_weight * zloss
        return out.astype(x.dtype), aux


class MoEBlock(nn.Module):
    """FactorizedBlock with the dense MLP swapped for MoEMLP; returns
    (x, aux). Attention layout identical to video_vit.FactorizedBlock."""
    num_heads: int
    num_experts: int
    hidden_mult: int = 4
    capacity_factor: float = 1.25
    compute_dtype: Any = jnp.bfloat16
    act_sharding: Optional[Callable] = None

    def _pin(self, x):
        return self.act_sharding(x) if self.act_sharding is not None else x

    @nn.compact
    def __call__(self, x):
        ln = partial(nn.LayerNorm, dtype=jnp.float32,
                     param_dtype=jnp.float32)
        mha = partial(MHA, num_heads=self.num_heads,
                      compute_dtype=self.compute_dtype)
        y = ln(name="ln_s")(x).astype(self.compute_dtype)
        x = self._pin(x + mha(name="attn_s")(y).astype(x.dtype))
        y = ln(name="ln_t")(x).astype(self.compute_dtype)
        y = jnp.swapaxes(y, 1, 2)
        y = mha(name="attn_t")(y)
        x = self._pin(x + jnp.swapaxes(y, 1, 2).astype(x.dtype))
        y = ln(name="ln_m")(x)
        b, t, n, d = y.shape
        y, aux = MoEMLP(num_experts=self.num_experts,
                        hidden_mult=self.hidden_mult,
                        capacity_factor=self.capacity_factor,
                        compute_dtype=self.compute_dtype,
                        name="moe")(y.reshape(b, t * n, d))
        return self._pin(x + y.reshape(b, t, n, d).astype(x.dtype)), aux


class VideoMoE(nn.Module):
    """VideoViT with MoE MLPs: [B, T, H, W, C] → (logits, aux-loss)."""
    num_classes: int
    num_experts: int = 4
    depth: int = 4
    dim: int = 192
    num_heads: int = 3
    patch: int = 16
    tubelet_t: int = 2
    hidden_mult: int = 4
    capacity_factor: float = 1.25
    compute_dtype: Any = jnp.bfloat16
    remat: bool = False
    act_sharding: Optional[Callable] = None

    @nn.compact
    def __call__(self, clips):
        x = tubelet_embed(self, clips)
        if self.act_sharding is not None:
            x = self.act_sharding(x)
        block = MoEBlock
        if self.remat:
            block = nn.remat(block)
        aux = 0.0
        for i in range(self.depth):
            x, a = block(num_heads=self.num_heads,
                         num_experts=self.num_experts,
                         hidden_mult=self.hidden_mult,
                         capacity_factor=self.capacity_factor,
                         compute_dtype=self.compute_dtype,
                         act_sharding=self.act_sharding,
                         name=f"block{i}")(x)
            aux = aux + a
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_f")(x)
        x = x.mean(axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="head")(x)
        return logits, aux / self.depth


def moe_param_specs(params, ep_axis: str = "ep"):
    """PartitionSpec pytree: expert weights sharded on their leading
    expert axis; everything else replicated (compose with
    video_vit.vit_param_specs rules manually if tp is also wanted)."""
    def spec(path, x):
        names = [getattr(k, "key", None) for k in path]
        if "moe" in names and names[-1] in ("w1", "b1", "w2", "b2"):
            return P(*((ep_axis,) + (None,) * (x.ndim - 1)))
        return P()
    return jax.tree_util.tree_map_with_path(spec, params)


def make_moe_train_step(mesh, model: VideoMoE, tx, ep_axis: str = "ep"):
    """(shard_params, step) over a ("dp", "ep") mesh: dp shards clips,
    ep shards the experts. Loss = CE + the model's aux (balance+z)."""
    data_s = NamedSharding(mesh, P("dp"))

    def shard_params(params):
        specs = moe_param_specs(params, ep_axis)
        return jax.tree_util.tree_map(
            lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
            params, specs)

    def loss_fn(params, clips, labels):
        logits, aux = model.apply(params, clips)
        ce = -jnp.take_along_axis(
            jax.nn.log_softmax(logits), labels[:, None], axis=1).mean()
        acc = (logits.argmax(-1) == labels).mean()
        return ce + aux, (acc, aux)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, clips, flip_mask):
        clips = jax.lax.with_sharding_constraint(clips, data_s)
        x = jnp.where(flip_mask[:, None, None, None, None],
                      jnp.flip(clips, axis=1), clips)
        labels = flip_mask.astype(jnp.int32)
        (loss, (acc, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, labels)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state,
                loss, acc, aux)

    return shard_params, step

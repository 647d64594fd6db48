"""Pipeline parallelism (GPipe) for the VideoViT block stack.

Completes the parallelism matrix (dp batch / mp tensor / sp sequence in
models/video_vit.py; pp here): the transformer's blocks are split into
S stages, one per device along the mesh's "pp" axis, and microbatches
flow stage-to-stage over ICI via `lax.ppermute` inside a `shard_map`.
The reference has no counterpart (single-GPU instances only); this is
the TPU-idiomatic schedule from the public scaling playbook — a
circulating-activation loop of `M + S - 1` ticks where stage 0 injects
a fresh microbatch each tick and the last stage emits one from tick
`S - 1` on, so every device computes its stage on every tick once the
pipeline fills (bubble overhead = (S-1)/(M+S-1)).

Design notes:

  * Stage weights are the per-block param pytrees STACKED on a leading
    axis of length S, sharded P("pp") — each device physically holds
    only its own stage's weights (this is what makes pp a memory win:
    params, grads and optimizer state all shard S-ways).
  * The time loop is a `lax.scan` (compiler-friendly: one compiled tick,
    no Python unrolling); microbatch injection/extraction use masked
    `jnp.where` against the tick index — static shapes throughout.
  * The backward pass is plain `jax.grad` through the scan: autodiff
    transposes `ppermute` into the reverse permute, so gradients flow
    backward through the pipe in the same schedule, and each device's
    param grads stay local to its stage (no all-reduce over pp).
  * Batch parallelism composes: the mesh is ("dp", "pp"), the batch axis
    is dp-sharded outside, and grads are averaged over dp by the usual
    GSPMD psum the jit inserts.
  * Embedding/positional/head params are tiny; they run OUTSIDE the
    shard_map, replicated, with their grads reduced by GSPMD as usual.

`make_pp_train_step` returns the full arrow-of-time training step used
by tests/__graft_entry__; `pp_apply` is the inference/forward entry.
"""
from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.video_vit import FactorizedBlock, VideoViT


def make_pp_mesh(n_devices: int | None = None, pp: int | None = None,
                 axes: Tuple[str, str] = ("dp", "pp")) -> Mesh:
    """("dp", "pp") mesh: pp defaults to the largest divisor <= sqrt(n)
    (delegates to make_mesh's factoring)."""
    from .sharding import make_mesh
    if pp is None:
        return make_mesh(n_devices, axes=axes)
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % pp == 0, (n, pp)
    return Mesh(np.asarray(devices[:n]).reshape(n // pp, pp), axes)


class _Embed(nn.Module):
    """Tubelet + positional embedding (VideoViT.__call__ up to the
    blocks); shares models.video_vit.tubelet_embed, so the param names
    (tubelet, pos_spatial, pos_temporal) match the full model's and the
    outer subtree slots in unchanged."""
    dim: int
    patch: int
    tubelet_t: int
    compute_dtype: object

    @nn.compact
    def __call__(self, clips):
        from ..models.video_vit import tubelet_embed
        return tubelet_embed(self, clips)


class _Head(nn.Module):
    """Final LN + pool + classifier; names match the full model's."""
    num_classes: int

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_f")(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="head")(x)


def _split_module(model: VideoViT):
    """The per-stage block module (identical across stages) and the
    pre/post (embed / head) twins of `model`, applied on the outer
    param subtree."""
    block = FactorizedBlock(num_heads=model.num_heads,
                            hidden_mult=model.hidden_mult,
                            compute_dtype=model.compute_dtype)
    embed_m = _Embed(model.dim, model.patch, model.tubelet_t,
                     model.compute_dtype)
    head_m = _Head(model.num_classes)

    def embed(outer_params, clips):
        p = outer_params["params"]
        sub = {k: p[k] for k in ("tubelet", "pos_spatial", "pos_temporal")}
        return embed_m.apply({"params": sub}, clips)

    def head(outer_params, x):
        p = outer_params["params"]
        sub = {k: p[k] for k in ("ln_f", "head")}
        return head_m.apply({"params": sub}, x)

    return block, embed, head


def init_pp_params(rng, model: VideoViT, clip_shape, n_stages: int):
    """(outer_params, stage_params): outer = embed+head leaves; stage =
    per-block params stacked on leading [S, L] axes (S = pipeline
    stages sharded P("pp"), L = depth // S blocks applied sequentially
    inside each stage). model.depth must be divisible by n_stages;
    blocks are assigned contiguously (stage s runs blocks
    [s*L, (s+1)*L))."""
    assert model.depth % n_stages == 0, (
        f"depth={model.depth} not divisible by stages={n_stages}")
    full = model.init(rng, jnp.zeros(clip_shape, jnp.float32))["params"]
    blocks = [full.pop(f"block{i}") for i in range(model.depth)]
    per_stage = model.depth // n_stages
    stage = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    stage = jax.tree_util.tree_map(
        lambda x: x.reshape((n_stages, per_stage) + x.shape[1:]), stage)
    return {"params": full}, {"params": stage}


def _pp_forward(mesh: Mesh, block, n_stages: int, n_micro: int):
    """The shard_map'd pipeline over the block stack.

    tokens [B_local, T, N, D] enter on every pp member (replicated over
    pp after the dp shard); the result is replicated back over pp via a
    masked psum of the last stage's output.
    """
    S, M = n_stages, n_micro
    nxt = [(i, (i + 1) % S) for i in range(S)]

    def local(stage_params, tokens):
        # tokens: [B_loc, T, N, D]. Split into M microbatches.
        b = tokens.shape[0]
        assert b % M == 0, (b, M)
        mb = b // M
        micro = tokens.reshape((M, mb) + tokens.shape[1:])
        stage = jax.lax.axis_index("pp")
        # Local shard [1, L, ...] -> this stage's L block-param stack.
        params = jax.tree_util.tree_map(lambda p: p[0], stage_params)

        def apply_block(x):
            # The stage's L blocks run sequentially (scanned: one
            # compiled block body regardless of L).
            def body(h, blk):
                return block.apply({"params": blk}, h), None
            h, _ = jax.lax.scan(body, x, params)
            return h

        def tick(carry, t):
            state, out = carry
            # Stage 0 swallows microbatch t (clamped; masked past M).
            inj = micro[jnp.minimum(t, M - 1)]
            x = jnp.where(stage == 0, inj, state)
            y = apply_block(x)
            # Collect the last stage's finished microbatch t-(S-1).
            slot = jnp.clip(t - (S - 1), 0, M - 1)
            take = jnp.logical_and(stage == S - 1, t >= S - 1)
            upd = jnp.where(take, y, out[slot])
            out = jax.lax.dynamic_update_index_in_dim(out, upd, slot, 0)
            # Hand activations down the pipe (ring; stage S-1 -> 0 is
            # dead weight overwritten by injection next tick).
            state = jax.lax.ppermute(y, "pp", nxt)
            return (state, out), None

        out0 = jnp.zeros_like(micro)
        state0 = jnp.zeros_like(micro[0])
        (_, out), _ = jax.lax.scan(tick, (state0, out0),
                                   jnp.arange(M + S - 1))
        # Replicate the result across pp members: only stage S-1 holds
        # real data; a masked psum broadcasts it.
        out = jnp.where(stage == S - 1, out, 0)
        out = jax.lax.psum(out, "pp")
        return out.reshape(tokens.shape)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("pp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False)


def pp_apply(mesh: Mesh, model: VideoViT, outer_params, stage_params,
             clips, n_micro: int = 2):
    """Pipeline-parallel forward: logits for a clip batch."""
    S = mesh.shape["pp"]
    block, embed, head = _split_module(model)
    tokens = embed(outer_params, clips)
    tokens = _pp_forward(mesh, block, S, n_micro)(
        stage_params["params"], tokens)
    return head(outer_params, tokens)


def make_pp_train_step(mesh: Mesh, model: VideoViT, tx, n_micro: int = 2):
    """(shard_fn, step): the arrow-of-time training step over a
    ("dp", "pp") mesh. shard_fn places outer params replicated and stage
    params P("pp")-sharded; step(outer, stage, opt_state, clips,
    flip_mask) -> (outer, stage, opt_state, loss, acc)."""
    S = mesh.shape["pp"]
    data_s = NamedSharding(mesh, P("dp"))
    stage_s = NamedSharding(mesh, P("pp"))
    repl_s = NamedSharding(mesh, P())

    def shard_fn(outer_params, stage_params):
        outer = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl_s), outer_params)
        stage = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, stage_s), stage_params)
        return outer, stage

    def loss_fn(outer, stage, clips, labels):
        logits = pp_apply(mesh, model, outer, stage, clips, n_micro)
        loss = -jnp.take_along_axis(
            jax.nn.log_softmax(logits), labels[:, None], axis=1).mean()
        acc = (logits.argmax(-1) == labels).mean()
        return loss, acc

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(outer, stage, opt_state, clips, flip_mask):
        clips = jax.lax.with_sharding_constraint(clips, data_s)
        x = jnp.where(flip_mask[:, None, None, None, None],
                      jnp.flip(clips, axis=1), clips)
        labels = flip_mask.astype(jnp.int32)
        (loss, acc), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(outer, stage, x, labels)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates((outer, stage), updates)
        return params[0], params[1], opt_state, loss, acc

    return shard_fn, step

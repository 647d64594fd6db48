"""VideoViT — a factorized space-time video transformer, TPU-native.

Second model family beyond the fast-neural-style CNN (the reference
example stops at per-frame CNN inference, python_examples/
fast_neural_style/neural_style.py; this framework's clip loaders produce
the [B, T, H, W, C] batches video transformers train on, which the
reference cannot produce at all). The architecture is the factorized
encoder of ViViT: each block attends spatially (within a frame), then
temporally (across frames at the same patch position), then applies an
MLP — O(N² + T²) attention instead of O((N·T)²), which keeps the
attention matmuls large and square for the MXU without blowing up HBM.

TPU-first design decisions:

  * bfloat16 compute / float32 parameters (mixed precision): every
    matmul feeds the MXU in bf16; attention logits and softmax
    accumulate in f32 (`preferred_element_type`), the numerically
    load-bearing part.
  * NTHWC tubelet embedding: one strided Conv3D (t×p×p patches) — a
    single big MXU matmul after im2col, channels-last.
  * factorized positional embeddings: (T', D) temporal + (N, D) spatial
    added broadcast — T'·N·D params would dominate tiny models and
    shard poorly.
  * `remat=True` wraps each block in `jax.checkpoint`: activations are
    recomputed in the backward pass, trading MXU FLOPs (cheap) for HBM
    (the bottleneck) — the standard way to fit longer clips.
  * Megatron-style tensor parallelism via `vit_param_specs`: q/k/v
    projections column-sharded over heads, the output projection
    row-sharded, MLP fc1 column- / fc2 row-sharded. GSPMD inserts the
    psum after the row-sharded matmuls; each block does exactly two
    collectives, the textbook schedule.
  * optional sequence parallelism: `act_sharding` shards the token axis
    of every residual-stream activation; GSPMD all-gathers tokens only
    where attention genuinely needs them.

Sharding helpers at the bottom build the full pjit train step over a
("dp", "mp") mesh; see tests/test_video_vit.py for the 8-device proofs.
"""
from functools import partial
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P


class MHA(nn.Module):
    """Multi-head attention over the last-but-one axis.

    Input [..., S, D]; leading axes are batch. Logits/softmax in f32,
    everything else in `compute_dtype`. `causal=True` masks future
    positions (used by the temporal pathway for streaming inference).

    `use_flash=True` routes the core through the Pallas flash-attention
    kernel (ops/flash_attention.py): the [S, S] logits never reach HBM
    and the backward recomputes tile-by-tile — same numerics contract
    (f32 logits/softmax, compute-dtype P@V), asserted equal in
    tests/test_flash_attention.py. Worth it once S is hundreds of
    tokens; the default materialized path is fine for short factorized
    sequences.

    `ring_axis`/`mesh` route the core through ring attention
    (ops/ring_attention.py): the token axis stays SHARDED over the
    named mesh axis through attention itself — K/V blocks rotate via
    ppermute, an online-softmax accumulator merges them — instead of
    GSPMD all-gathering the sequence. Context parallelism for token
    axes too long for one device; asserted equal to the gathered path
    in tests/test_ring_attention.py.
    """
    num_heads: int
    compute_dtype: Any = jnp.bfloat16
    causal: bool = False
    use_flash: bool = False
    # "auto" = kernel on TPU, materialized path elsewhere; tests force
    # "pallas" to exercise the kernel (interpret mode) on the CPU mesh.
    flash_impl: str = "auto"
    # GQA/MQA: fewer kv heads than query heads (must divide num_heads);
    # the serving KV-cache shrinks by the group factor. None = MHA.
    num_kv_heads: Optional[int] = None
    # Sliding-window (local) attention: with causal=True each position
    # attends to the last `window` steps (== the streaming ring cache's
    # max_steps, models/streaming.py); without causal the symmetric band
    # |i-j| < window. None = full attention.
    window: Optional[int] = None
    # Ring (context-parallel) attention: the mesh axis the token axis is
    # sharded over, the mesh itself, and the axis batch dims shard over
    # (None when the batch is replicated w.r.t. the mesh).
    ring_axis: Optional[str] = None
    mesh: Any = None
    ring_batch_axis: Optional[str] = "dp"
    # Megatron tp composes with the ring: name the mesh axis the head
    # axis is sharded over (vit_param_specs' tp_axis) and each device
    # rings over its own heads — no head gather.
    ring_head_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        d_model = x.shape[-1]
        assert d_model % self.num_heads == 0, (d_model, self.num_heads)
        head_dim = d_model // self.num_heads
        kv_heads = self.num_kv_heads or self.num_heads
        if self.num_heads % kv_heads:
            raise ValueError(f"num_kv_heads {kv_heads} must divide "
                             f"num_heads {self.num_heads}")
        dense = partial(nn.DenseGeneral, dtype=self.compute_dtype,
                        param_dtype=jnp.float32)
        q = dense(features=(self.num_heads, head_dim), name="query")(x)
        k = dense(features=(kv_heads, head_dim), name="key")(x)
        v = dense(features=(kv_heads, head_dim), name="value")(x)
        scale = head_dim ** -0.5
        if self.ring_axis is not None:
            if kv_heads != self.num_heads:
                raise ValueError("ring attention does not compose with "
                                 "num_kv_heads")
            from jax.sharding import PartitionSpec

            from ..ops.ring_attention import ring_attention
            if self.mesh is None:
                raise ValueError("ring_axis needs the mesh")
            ring = self.mesh.shape[self.ring_axis]
            s = x.shape[-2]
            if s % ring:
                raise ValueError(f"token axis {s} must divide the ring "
                                 f"size {ring} ({self.ring_axis!r})")
            if (self.ring_batch_axis is not None
                    and x.shape[0] % self.mesh.shape[self.ring_batch_axis]):
                raise ValueError(
                    f"batch {x.shape[0]} must divide mesh axis "
                    f"{self.ring_batch_axis!r}="
                    f"{self.mesh.shape[self.ring_batch_axis]}")
            if (self.ring_head_axis is not None and self.num_heads
                    % self.mesh.shape[self.ring_head_axis]):
                raise ValueError(
                    f"num_heads {self.num_heads} must divide mesh axis "
                    f"{self.ring_head_axis!r}="
                    f"{self.mesh.shape[self.ring_head_axis]}")
            # [*lead, S, H, dh] with lead[0]=batch on ring_batch_axis and
            # S on the ring axis; all other axes replicated/local.
            spec = [None] * (x.ndim + 1)
            spec[0] = self.ring_batch_axis
            spec[-3] = self.ring_axis
            spec[-2] = self.ring_head_axis
            spec = PartitionSpec(*spec)

            def body(qb, kb, vb):
                def bhsd(t):   # local [*lead, s, H, dh] -> [b', H, s, dh]
                    return t.reshape((-1,) + t.shape[-3:]).transpose(
                        0, 2, 1, 3)
                ob = ring_attention(bhsd(qb), bhsd(kb), bhsd(vb),
                                    axis_name=self.ring_axis,
                                    causal=self.causal, window=self.window,
                                    sm_scale=scale)
                return ob.transpose(0, 2, 1, 3).reshape(qb.shape)

            o = jax.shard_map(body, mesh=self.mesh,
                              in_specs=(spec, spec, spec), out_specs=spec,
                              check_vma=False)(q, k, v)
        elif self.use_flash:
            from ..ops.flash_attention import flash_attention
            lead, s = x.shape[:-2], x.shape[-2]
            def bhsd(t):   # [..., S, H, dh] -> [prod(lead), H, S, dh]
                return t.reshape((-1, s) + t.shape[-2:]).transpose(0, 2, 1, 3)
            o = flash_attention(bhsd(q), bhsd(k), bhsd(v),
                                causal=self.causal, window=self.window,
                                sm_scale=scale, impl=self.flash_impl)
            o = o.transpose(0, 2, 1, 3).reshape(
                lead + (s, self.num_heads, head_dim))
        else:
            if kv_heads != self.num_heads:
                # Materialized GQA: repeat the shared kv heads (the flash
                # kernel streams them without the repeat).
                rep = self.num_heads // kv_heads
                k = jnp.repeat(k, rep, axis=-2)
                v = jnp.repeat(v, rep, axis=-2)
            logits = jnp.einsum("...qhd,...khd->...hqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            s = x.shape[-2]
            mask = None
            if self.causal:
                mask = jnp.tril(jnp.ones((s, s), bool))
            if self.window is not None:
                row = jnp.arange(s)[:, None]
                col = jnp.arange(s)[None, :]
                band = (col > row - self.window) if self.causal \
                    else (jnp.abs(col - row) < self.window)
                mask = band if mask is None else jnp.logical_and(mask, band)
            if mask is not None:
                logits = jnp.where(mask, logits, -jnp.inf)
            probs = jax.nn.softmax(logits, axis=-1).astype(self.compute_dtype)
            o = jnp.einsum("...hqk,...khd->...qhd", probs, v)
        return dense(features=d_model, axis=(-2, -1), name="out")(o)


class MLP(nn.Module):
    hidden_mult: int = 4
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d_model = x.shape[-1]
        h = nn.Dense(self.hidden_mult * d_model, dtype=self.compute_dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        h = nn.gelu(h)
        return nn.Dense(d_model, dtype=self.compute_dtype,
                        param_dtype=jnp.float32, name="fc2")(h)


class FactorizedBlock(nn.Module):
    """Pre-LN block: spatial attention → temporal attention → MLP.

    Input [B, T, N, D]. LayerNorm runs in f32 (its rsqrt is the
    precision-sensitive op); attention/MLP in `compute_dtype`.
    `act_sharding` (if set) re-pins the residual stream after every
    sub-layer so sequence-parallel layouts survive GSPMD propagation.
    `causal=True` masks the temporal pathway (spatial stays full) —
    the batch twin of the streaming KV-cache step (models/streaming.py).

    `ring_axis`/`mesh` (context parallelism): the SPATIAL attention runs
    as ring attention over the sp-sharded token axis — K/V blocks rotate
    via ppermute instead of GSPMD gathering the tokens. The temporal
    pathway needs no ring: with tokens sharded on N its batch axis is
    the sharded one, so it is communication-free by construction.
    """
    num_heads: int
    hidden_mult: int = 4
    compute_dtype: Any = jnp.bfloat16
    act_sharding: Optional[Callable] = None
    causal: bool = False
    use_flash: bool = False
    flash_impl: str = "auto"
    # GQA/MQA head grouping for BOTH pathways (shrinks the streaming
    # KV cache by num_heads/num_kv_heads). With tensor parallelism,
    # num_kv_heads must stay divisible by the tp axis size.
    num_kv_heads: Optional[int] = None
    # Sliding window for the TEMPORAL pathway only (requires causal):
    # each step attends to the last `temporal_window` steps — the exact
    # batch twin of the streaming ring cache with max_steps=window.
    temporal_window: Optional[int] = None
    # Symmetric band |i-j| < spatial_window over the SPATIAL token axis
    # (patch locality). Composes with ring_axis: the band is masked by
    # global position per rotating K/V block.
    spatial_window: Optional[int] = None
    ring_axis: Optional[str] = None
    mesh: Any = None
    ring_batch_axis: Optional[str] = "dp"
    ring_head_axis: Optional[str] = None

    def _pin(self, x):
        return self.act_sharding(x) if self.act_sharding is not None else x

    @nn.compact
    def __call__(self, x):
        ln = partial(nn.LayerNorm, dtype=jnp.float32,
                     param_dtype=jnp.float32)
        mha = partial(MHA, num_heads=self.num_heads,
                      compute_dtype=self.compute_dtype,
                      use_flash=self.use_flash,
                      flash_impl=self.flash_impl,
                      num_kv_heads=self.num_kv_heads)
        # Spatial: tokens within a frame attend; (B, T) are batch axes.
        y = ln(name="ln_s")(x).astype(self.compute_dtype)
        x = self._pin(x + mha(name="attn_s", ring_axis=self.ring_axis,
                              mesh=self.mesh,
                              window=self.spatial_window,
                              ring_batch_axis=self.ring_batch_axis,
                              ring_head_axis=self.ring_head_axis,
                              )(y).astype(x.dtype))
        # Temporal: same patch position across frames; (B, N) are batch.
        y = ln(name="ln_t")(x).astype(self.compute_dtype)
        y = jnp.swapaxes(y, 1, 2)                       # [B, N, T, D]
        y = mha(name="attn_t", causal=self.causal,
                window=self.temporal_window)(y)
        x = self._pin(x + jnp.swapaxes(y, 1, 2).astype(x.dtype))
        y = ln(name="ln_m")(x).astype(self.compute_dtype)
        return self._pin(x + MLP(self.hidden_mult, self.compute_dtype,
                                 name="mlp")(y).astype(x.dtype))


class JointBlock(nn.Module):
    """Pre-LN joint space-time block: attention over ALL tokens at once.

    Input [B, S, D] (S = T'·N flattened). O(S²) attention instead of
    the factorized O(N² + T²) — the regime where `use_flash=True` (the
    Pallas kernel: 2x at S=2048, 14x at S=8192 fwd+bwd measured on the
    chip) and `ring_axis` (context parallelism once S outgrows a chip)
    are the production paths rather than options.
    """
    num_heads: int
    hidden_mult: int = 4
    compute_dtype: Any = jnp.bfloat16
    act_sharding: Optional[Callable] = None
    use_flash: bool = False
    flash_impl: str = "auto"
    num_kv_heads: Optional[int] = None
    ring_axis: Optional[str] = None
    mesh: Any = None
    ring_batch_axis: Optional[str] = "dp"
    ring_head_axis: Optional[str] = None

    def _pin(self, x):
        return self.act_sharding(x) if self.act_sharding is not None else x

    @nn.compact
    def __call__(self, x):
        ln = partial(nn.LayerNorm, dtype=jnp.float32,
                     param_dtype=jnp.float32)
        y = ln(name="ln_a")(x).astype(self.compute_dtype)
        y = MHA(num_heads=self.num_heads, compute_dtype=self.compute_dtype,
                use_flash=self.use_flash, flash_impl=self.flash_impl,
                num_kv_heads=self.num_kv_heads,
                ring_axis=self.ring_axis, mesh=self.mesh,
                ring_batch_axis=self.ring_batch_axis,
                ring_head_axis=self.ring_head_axis, name="attn")(y)
        x = self._pin(x + y.astype(x.dtype))
        y = ln(name="ln_m")(x).astype(self.compute_dtype)
        return self._pin(x + MLP(self.hidden_mult, self.compute_dtype,
                                 name="mlp")(y).astype(x.dtype))


def tubelet_embed(m: nn.Module, clips):
    """Shared stem: tubelet Conv3D + factorized positional embeddings.

    Creates its params ("tubelet", "pos_spatial", "pos_temporal") in
    the CALLER's scope — VideoViT, VideoMoE and the pipeline's embed
    twin all share this code and stay checkpoint-compatible. `m` needs
    dim/patch/tubelet_t/compute_dtype attributes.
    """
    b, t, h, w, c = clips.shape
    assert t % m.tubelet_t == 0 and h % m.patch == 0 \
        and w % m.patch == 0, (clips.shape, m.tubelet_t, m.patch)
    x = clips.astype(m.compute_dtype)
    x = nn.Conv(m.dim, kernel_size=(m.tubelet_t, m.patch, m.patch),
                strides=(m.tubelet_t, m.patch, m.patch),
                padding="VALID", dtype=m.compute_dtype,
                param_dtype=jnp.float32, name="tubelet")(x)
    tt, hh, ww = x.shape[1:4]
    x = x.reshape(b, tt, hh * ww, m.dim).astype(jnp.float32)
    pos_s = m.param("pos_spatial", nn.initializers.normal(0.02),
                    (hh * ww, m.dim))
    pos_t = m.param("pos_temporal", nn.initializers.normal(0.02),
                    (tt, m.dim))
    x = x + pos_s[None, None] + pos_t[None, :, None]
    # Residual-stream dtype: f32 by default (tight streaming/KV parity);
    # bf16 halves activation HBM traffic — the training-throughput
    # config (LayerNorms still compute in f32 either way).
    return x.astype(getattr(m, "residual_dtype", jnp.float32))


class VideoViT(nn.Module):
    """Factorized space-time ViT: [B, T, H, W, C] clips → logits.

    T must be divisible by tubelet_t and H, W by patch. Residual stream
    is float32 (parameters' dtype); matmuls run in `compute_dtype`.
    """
    num_classes: int
    depth: int = 4
    dim: int = 192
    num_heads: int = 3
    patch: int = 16
    tubelet_t: int = 2
    hidden_mult: int = 4
    compute_dtype: Any = jnp.bfloat16
    remat: bool = False
    act_sharding: Optional[Callable] = None
    # causal=True: temporal attention masked, logits PER TUBELET STEP
    # [B, T', classes] (pooled over tokens only) — the batch-mode twin
    # of streaming inference (models/streaming.py).
    causal: bool = False
    # use_flash=True: Pallas flash-attention core (long token axes).
    use_flash: bool = False
    flash_impl: str = "auto"
    # GQA/MQA: fewer kv heads (must divide num_heads) in every
    # attention — the streaming KV cache (models/streaming.py) shrinks
    # by the group factor. None = MHA. Not composable with ring_axis.
    num_kv_heads: Optional[int] = None
    # Sliding-window temporal attention (requires causal=True,
    # factorized): each step attends to the last `temporal_window`
    # steps. With temporal_window == the streaming cache's max_steps,
    # the batch forward reproduces stream_step EXACTLY at every t,
    # including beyond the ring wrap. None = full causal attention.
    temporal_window: Optional[int] = None
    # Symmetric spatial locality band |i-j| < spatial_window over the
    # patch token axis (factorized only); composes with ring_axis.
    spatial_window: Optional[int] = None
    # ring_axis + mesh: context parallelism — spatial attention rings
    # over the sp-sharded token axis instead of gathering it (combine
    # with act_sharding=make_act_sharding(mesh, ring_axis)).
    ring_axis: Optional[str] = None
    mesh: Any = None
    ring_batch_axis: Optional[str] = "dp"
    ring_head_axis: Optional[str] = None
    # Residual-stream dtype. f32 (default) maximizes streaming/batch
    # parity; bf16 halves activation HBM traffic for training
    # throughput (LayerNorm/softmax still accumulate in f32).
    residual_dtype: Any = jnp.float32
    # "factorized" (default: spatial then temporal per block, the ViViT
    # recipe) or "joint" (ALL T'·N tokens attend at once — O(S²); pair
    # with use_flash and/or ring_axis, which is what they exist for).
    # causal=True requires factorized (per-frame ordering is undefined
    # on the flattened axis).
    attention: str = "factorized"

    @nn.compact
    def __call__(self, clips):
        assert self.attention in ("factorized", "joint"), self.attention
        x = tubelet_embed(self, clips)
        joint = self.attention == "joint"
        if joint:
            assert not self.causal, "causal needs factorized attention"
            b, tt, n, d = x.shape
            x = x.reshape(b, tt * n, d)
        if self.act_sharding is not None:
            x = self.act_sharding(x)
        block = JointBlock if joint else FactorizedBlock
        if self.remat:
            block = nn.remat(block)
        if self.temporal_window is not None and not self.causal:
            raise ValueError("temporal_window requires causal=True")
        common = dict(num_heads=self.num_heads,
                      hidden_mult=self.hidden_mult,
                      compute_dtype=self.compute_dtype,
                      act_sharding=self.act_sharding,
                      use_flash=self.use_flash, flash_impl=self.flash_impl,
                      ring_axis=self.ring_axis, mesh=self.mesh,
                      ring_batch_axis=self.ring_batch_axis,
                      ring_head_axis=self.ring_head_axis)
        common["num_kv_heads"] = self.num_kv_heads
        if not joint:
            common["causal"] = self.causal
            common["temporal_window"] = self.temporal_window
            common["spatial_window"] = self.spatial_window
        elif self.spatial_window is not None:
            raise ValueError("spatial_window requires factorized "
                             "attention (the joint token axis mixes "
                             "space and time)")
        for i in range(self.depth):
            x = block(name=f"block{i}", **common)(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_f")(x)
        if self.causal:
            x = x.mean(axis=2)               # per-step pool (tokens only)
        elif joint:
            x = x.mean(axis=1)               # global token pool (flat)
        else:
            x = x.mean(axis=(1, 2))          # global token pool
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="head")(x)


# ---------------------------------------------------------------------------
# Sharding: Megatron tensor parallelism + dp batch parallelism.
# ---------------------------------------------------------------------------

def vit_param_specs(params, tp_axis: str = "mp", mesh=None):
    """PartitionSpec pytree for VideoViT params (Megatron schedule).

    q/k/v kernels (D, H, dh): heads column-sharded → P(None, tp, None);
    out kernel (H, dh, D): row-sharded → P(tp, None, None) (GSPMD inserts
    the psum); MLP fc1 (D, F) column- / fc2 (F, D) row-sharded; matching
    bias shards; everything else replicated.

    Pass `mesh` to validate the head axes up front: with GQA/MQA the
    key/value head axis is `num_kv_heads`, and sharding it over a tp
    axis it doesn't divide fails deep inside GSPMD with an opaque
    divisibility error — here it raises a ValueError naming the counts.
    """
    tp_size = None
    if mesh is not None:
        tp_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(tp_axis)

    def spec(path, x):
        names = [getattr(k, "key", None) for k in path]
        leaf = names[-1]
        if any(n in ("query", "key", "value") for n in names):
            if leaf == "kernel":
                if tp_size and x.shape[1] % tp_size:
                    proj = next(n for n in names
                                if n in ("query", "key", "value"))
                    raise ValueError(
                        f"{proj} projection has {x.shape[1]} heads "
                        f"(num_kv_heads for key/value under GQA/MQA), not "
                        f"divisible by mesh axis '{tp_axis}' of size "
                        f"{tp_size}; pick num_kv_heads as a multiple of "
                        f"the tp axis size, or shrink the tp axis.")
                return P(None, tp_axis, None)
            if leaf == "bias":
                return P(tp_axis, None)
        if "out" in names and leaf == "kernel":
            return P(tp_axis, None, None)
        if "fc1" in names:
            return P(None, tp_axis) if leaf == "kernel" else P(tp_axis)
        if "fc2" in names and leaf == "kernel":
            return P(tp_axis, None)
        return P()
    return jax.tree_util.tree_map_with_path(spec, params)


def make_act_sharding(mesh, seq_axis: Optional[str], joint: bool = False):
    """Residual-stream pin: [B, T, N, D] with batch on dp and (optionally)
    the spatial-token axis on `seq_axis` (sequence parallelism).
    joint=True pins the flattened [B, S, D] stream of
    VideoViT(attention="joint") instead (S = T'·N on `seq_axis`)."""
    spec = P("dp", seq_axis, None) if joint \
        else P("dp", None, seq_axis, None)
    s = NamedSharding(mesh, spec)

    def pin(x):
        return jax.lax.with_sharding_constraint(x, s)
    return pin


def init_vit(rng, model: VideoViT, clip_shape: Tuple[int, ...]):
    """Initializes the param pytree for `clip_shape` clips."""
    return model.init(rng, jnp.zeros(clip_shape, jnp.float32))


def make_vit_train_step(mesh, model: VideoViT, tx, tp_axis: str = "mp"):
    """Builds (shard_params, step): an arrow-of-time training step jitted
    over `mesh` — dp shards the clip batch, `tp_axis` shards
    heads/MLP-hidden (tensor parallel); construct the model with
    `act_sharding=make_act_sharding(mesh, "sp")` for sequence parallelism
    on top.

    step(params, opt_state, clips, flip_mask) -> (params, opt_state,
    loss, acc); clips [B, T, H, W, C] float, flip_mask [B] bool. The
    masked clips are time-reversed ON DEVICE and the mask is the label —
    the same self-supervised task as python_examples/video_classifier.py.
    """
    data_s = NamedSharding(mesh, P("dp"))

    def shard_params(params):
        specs = vit_param_specs(params, tp_axis, mesh=mesh)
        return jax.tree_util.tree_map(
            lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
            params, specs)

    def loss_fn(params, clips, labels):
        logits = model.apply(params, clips)
        loss = -jnp.take_along_axis(
            jax.nn.log_softmax(logits), labels[:, None], axis=1).mean()
        acc = (logits.argmax(-1) == labels).mean()
        return loss, acc

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, clips, flip_mask):
        clips = jax.lax.with_sharding_constraint(clips, data_s)
        x = jnp.where(flip_mask[:, None, None, None, None],
                      jnp.flip(clips, axis=1), clips)
        labels = flip_mask.astype(jnp.int32)
        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, labels)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    return shard_params, step

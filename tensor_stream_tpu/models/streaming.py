"""Streaming (online) VideoViT inference with a temporal KV-cache.

Live analytics over an endless stream can't form [B, T, ...] clips and
rerun O(T²) attention per frame. The causal VideoViT
(`VideoViT(causal=True)`) trains with masked temporal attention; this
module runs it ONLINE: one tubelet (tubelet_t frames) in, one logits
row out, with each block's temporal keys/values cached — per-step cost
is O(T) attention against the cache instead of O(T²) recompute, the
standard KV-cache serving schedule.

Exact contract (tests/test_streaming.py): feeding a clip step-by-step
through `stream_step` reproduces the batch causal forward's per-step
logits while `t < max_steps`. The cache is a fixed-size RING (static
shapes — jit-friendly): step t writes slot `t % max_steps`, so beyond
`max_steps` the attention window slides over the most recent
`max_steps` steps (softmax is permutation-invariant over keys, so ring
order never matters) — exactly the batch model's
`temporal_window=max_steps` sliding-window attention, so a
windowed causal VideoViT reproduces stream_step at EVERY t, including
past the wrap. GQA (`num_kv_heads`) carries through: the cache stores
only the kv heads (memory / group_factor). Steps beyond the trained
temporal extent clamp to the last positional embedding.

    model = VideoViT(num_classes=..., causal=True, ...)
    cache = init_stream_cache(model, params, batch=1, max_steps=64)
    step = jax.jit(partial(stream_step, model, params))
    for frames in stream:            # [B, tubelet_t, H, W, 3]
        cache, logits = step(cache, frames)

All parameters are the ordinary VideoViT ones — train in batch mode
(causal=True), serve streaming, no conversion.
"""
from functools import partial
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .video_vit import MHA, VideoViT


def init_stream_cache(model: VideoViT, params: Any, batch: int,
                      max_steps: int) -> Dict:
    """Fixed-size temporal KV cache: per block k/v of shape
    [B, N, max_steps, Hkv, dh] in the model's compute dtype, plus the
    step counter. N comes from the positional table (params carry it).
    With GQA (`model.num_kv_heads < num_heads`) the cache carries only
    the kv heads — memory shrinks by the group factor.
    """
    n_tokens = params["params"]["pos_spatial"].shape[0]
    head_dim = model.dim // model.num_heads
    kv_heads = model.num_kv_heads or model.num_heads
    kv = lambda: jnp.zeros((batch, n_tokens, max_steps, kv_heads,
                            head_dim), model.compute_dtype)
    return {
        "t": jnp.zeros((), jnp.int32),
        "blocks": [{"k": kv(), "v": kv()} for _ in range(model.depth)],
    }


def _ln(p, x):
    mean = x.mean(axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    return y * p["scale"] + p["bias"]


def _temporal_attn(p, y, cache_blk, t, compute_dtype):
    """One streaming step of causal temporal attention.

    y: [B, 1, N, D] (post-LN, compute dtype); cache k/v
    [B, N, S, Hkv, dh] (Hkv < H is GQA: each group of H/Hkv query
    heads shares one cached kv head). Returns (out [B, 1, N, D], new
    cache entry). Mirrors MHA's numerics: f32 logits/softmax,
    compute-dtype matmuls.
    """
    b, _, n, d = y.shape
    yt = y[:, 0]                                        # [B, N, D]
    proj = lambda name: (jnp.einsum(
        "bnd,dhk->bnhk", yt, p[name]["kernel"].astype(compute_dtype))
        + p[name]["bias"].astype(compute_dtype))
    q, k_new, v_new = proj("query"), proj("key"), proj("value")
    s = cache_blk["k"].shape[2]
    slot = t % s                                        # sliding ring
    kc = jax.lax.dynamic_update_index_in_dim(cache_blk["k"], k_new, slot,
                                             axis=2)
    vc = jax.lax.dynamic_update_index_in_dim(cache_blk["v"], v_new, slot,
                                             axis=2)
    head_dim = q.shape[-1]
    h, hk = q.shape[2], kc.shape[3]
    g = h // hk                                         # GQA group size
    qg = q.reshape(b, n, hk, g, head_dim)
    logits = jnp.einsum("bnkgd,bnskd->bnkgs", qg, kc,
                        preferred_element_type=jnp.float32)
    logits = logits * (head_dim ** -0.5)
    live = jnp.arange(s) <= t        # all slots live once the ring wraps
    logits = jnp.where(live[None, None, None, None, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
    o = jnp.einsum("bnkgs,bnskd->bnkgd", probs, vc)
    o = o.reshape(b, n, h, head_dim)
    out = (jnp.einsum("bnhk,hkd->bnd", o,
                      p["out"]["kernel"].astype(compute_dtype))
           + p["out"]["bias"].astype(compute_dtype))
    return out[:, None], {"k": kc, "v": vc}


def stream_step(model: VideoViT, params: Any, cache: Dict, frames):
    """(cache, frames [B, tubelet_t, H, W, 3]) -> (cache, logits [B, C]).

    Numerically the batch causal forward's step `cache["t"]`, computed
    against the cache instead of the full history.
    """
    assert model.causal, "stream_step needs VideoViT(causal=True)"
    p = params["params"]
    t = cache["t"]
    cdt = model.compute_dtype

    # Tubelet embedding of ONE temporal step (reuses the conv params).
    conv = nn.Conv(model.dim,
                   kernel_size=(model.tubelet_t, model.patch, model.patch),
                   strides=(model.tubelet_t, model.patch, model.patch),
                   padding="VALID", dtype=cdt, param_dtype=jnp.float32)
    x = conv.apply({"params": p["tubelet"]}, frames.astype(cdt))
    b = x.shape[0]
    x = x.reshape(b, 1, -1, model.dim).astype(jnp.float32)  # [B,1,N,D]
    pos_t = p["pos_temporal"]
    t_pos = jnp.minimum(t, pos_t.shape[0] - 1)          # clamp past extent
    x = x + p["pos_spatial"][None, None] + pos_t[t_pos][None, None, None]

    mha_s = MHA(num_heads=model.num_heads, compute_dtype=cdt,
                num_kv_heads=model.num_kv_heads)
    new_blocks = []
    for i in range(model.depth):
        bp = p[f"block{i}"]
        # Spatial attention (full, within the frame) — reuse MHA.
        y = _ln(bp["ln_s"], x).astype(cdt)
        x = x + mha_s.apply({"params": bp["attn_s"]}, y).astype(x.dtype)
        # Temporal attention against the cache (causal by construction).
        y = _ln(bp["ln_t"], x).astype(cdt)
        o, blk = _temporal_attn(bp["attn_t"], y, cache["blocks"][i], t,
                                cdt)
        new_blocks.append(blk)
        x = x + o.astype(x.dtype)
        # MLP (same gelu variant as the batch model).
        y = _ln(bp["ln_m"], x).astype(cdt)
        h = (y @ bp["mlp"]["fc1"]["kernel"].astype(cdt)
             + bp["mlp"]["fc1"]["bias"].astype(cdt))
        h = nn.gelu(h)
        y = (h @ bp["mlp"]["fc2"]["kernel"].astype(cdt)
             + bp["mlp"]["fc2"]["bias"].astype(cdt))
        x = x + y.astype(x.dtype)

    x = _ln(p["ln_f"], x)
    x = x[:, 0].mean(axis=1)                            # pool tokens
    logits = x @ p["head"]["kernel"] + p["head"]["bias"]
    return {"t": t + 1, "blocks": new_blocks}, logits

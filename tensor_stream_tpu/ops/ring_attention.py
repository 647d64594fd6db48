"""Ring attention — context parallelism: attention over a sharded axis.

Sequence parallelism (`make_act_sharding(mesh, "sp")`) pins the residual
stream's token axis to a mesh axis, but attention still needs every
query to see every key: GSPMD answers by all-gathering K/V (and the
[S, S] logits live whole on every device). Ring attention removes that
gather — the token axis stays sharded THROUGH attention:

  * each device holds S/n query tokens and one rotating K/V block;
  * n steps of `lax.ppermute` move the K/V blocks one hop around the
    ring (the mesh axis order IS the ring, so every hop is an ICI
    neighbor transfer that overlaps the block's matmuls);
  * an online-softmax accumulator (running max m, normalizer l,
    unnormalized output o — the same recurrence as the flash-attention
    kernel, ops/flash_attention.py) merges each block's partial
    attention exactly.

Per-device memory is O(S/n · S/n) for the block logits instead of
O(S²); K/V traffic is the same bytes an all-gather would move, but
pipelined hop-by-hop and overlapped with compute instead of paid up
front. This is the standard TPU long-context recipe (blockwise/ring
attention over a mesh axis) and composes with the rest of the
parallelism matrix: dp on batch, tp on heads (Megatron specs shard the
head axis BEFORE the ring, so each device rings over its own heads),
and cp = this module on the token axis.

Numerics contract matches `flash_attention._reference`: logits and
softmax statistics in f32 (`preferred_element_type`), P cast to the
value dtype for the P·V matmul with f32 accumulation, output cast back
to the query dtype. The online merge is mathematically exact (not an
approximation); tests assert fwd + grads against full attention to f32
tolerance (tests/test_ring_attention.py).

Differentiable by construction: the ring is a `lax.scan` whose carried
K/V blocks rotate via `ppermute` (linear; its transpose is the inverse
rotation), so `jax.grad` produces the reverse ring — dk/dv accumulate
hop-by-hop exactly like the forward. The scan saves O(S/n · d) per step
per device (the rotating blocks), never the O(S²) logits.

Causal note: the ring runs in SPMD lockstep, so fully-masked blocks
(device i's steps past its own position) still occupy their ring slot —
causal ring attention pays the full S² matmul schedule, not the
triangle. The known fix is a striped ("zigzag") token layout that gives
every device half-early/half-late tokens so per-step work balances;
contiguous block layout is kept here because it is what the sp residual
sharding (`make_act_sharding`) produces and what positional embeddings
assume. Revisit if causal ring becomes a measured bottleneck.

The reference CUDA project has no attention at all; this is the
framework's own long-context axis (SURVEY §5.7) built TPU-first.
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def ring_attention(q, k, v, *, axis_name: str, causal: bool = False,
                   window: Optional[int] = None,
                   sm_scale: Optional[float] = None):
    """Per-device ring attention body (call inside `jax.shard_map`).

    q: [b, h, sq_local, d], k/v: [b, h, sk_local, d] — the LOCAL shards
    of sequences sharded over `axis_name`. Global semantics equal full
    softmax(Q Kᵀ·scale) V over the gathered sequence; `causal=True`
    masks by GLOBAL position (requires equal global q/kv lengths, i.e.
    equal local lengths on every device). `window=W` is the same
    sliding band as `flash_attention` — GLOBAL col in (row-W, row]
    when causal, |row-col| < W symmetric — masked per ring block (the
    SPMD lockstep still rotates out-of-band blocks through every slot,
    so a window saves no ring steps; it exists for semantic parity
    with the single-chip kernel, models and KV cache).
    """
    n = jax.lax.psum(1, axis_name)           # static ring length
    idx = jax.lax.axis_index(axis_name)      # this device's slot
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if sm_scale is None:
        sm_scale = float(d) ** -0.5
    scale = jnp.float32(sm_scale)

    q_pos = idx * sq + jnp.arange(sq, dtype=jnp.int32)
    perm = [(j, (j + 1) % n) for j in range(n)]
    neg = jnp.float32(_MASK_VALUE)

    def step(carry, i):
        o, l, m, kc, vc = carry
        # Block held at step i: each hop sends to the next slot, so this
        # device sees blocks idx, idx-1, ..., idx-(n-1) (mod n).
        blk = jax.lax.rem(idx - i + n, n)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kc,
                       preferred_element_type=jnp.float32) * scale
        mask = None
        if causal or window is not None:
            k_pos = blk * sk + jnp.arange(sk, dtype=jnp.int32)
            rel = q_pos[:, None] - k_pos[None, :]     # row - col, global
            if causal:
                mask = rel >= 0
                if window is not None:
                    mask = jnp.logical_and(mask, rel < window)
            else:
                mask = jnp.abs(rel) < window
            s = jnp.where(mask[None, None], s, neg)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        if mask is not None:
            # An all-masked block leaves m_new at the init sentinel and
            # exp(neg - neg) = 1 — zero those lanes explicitly.
            p = jnp.where(mask[None, None], p, 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        pv = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vc.dtype), vc,
                        preferred_element_type=jnp.float32)
        o = o * corr[..., None] + pv
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (o, l, m_new, kc, vc), None

    o0 = jnp.zeros((b, h, sq, d), jnp.float32)
    l0 = jnp.zeros((b, h, sq), jnp.float32)
    m0 = jnp.full((b, h, sq), neg, jnp.float32)
    (o, l, _, _, _), _ = jax.lax.scan(
        step, (o0, l0, m0, k, v), jnp.arange(n, dtype=jnp.int32))
    l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
    return (o * l_inv[..., None]).astype(q.dtype)


def ring_attention_sharded(mesh, q, k, v, *, seq_axis: str,
                           batch_axis: Optional[str] = None,
                           causal: bool = False,
                           window: Optional[int] = None,
                           sm_scale: Optional[float] = None):
    """Ring attention on GLOBAL [b, h, S, d] arrays.

    Wraps `ring_attention` in a `shard_map` over `mesh`: the sequence
    axis shards over `seq_axis` (the ring), the batch axis optionally
    over `batch_axis` (plain dp — each dp row runs its own ring).
    S must divide by the ring size; `causal=True` additionally needs
    equal q/kv lengths.
    """
    n = mesh.shape[seq_axis]
    if q.ndim != 4 or k.shape[:2] != q.shape[:2] or v.shape != k.shape:
        raise ValueError(f"bad attention shapes {q.shape} {k.shape} "
                         f"{v.shape}")
    if q.shape[2] % n or k.shape[2] % n:
        raise ValueError(
            f"sequence lengths {q.shape[2]}/{k.shape[2]} must divide the "
            f"ring size {n} (mesh axis {seq_axis!r})")
    if causal and q.shape[2] != k.shape[2]:
        raise ValueError("causal=True requires equal q/kv lengths")
    if window is not None:
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        if q.shape[2] != k.shape[2]:
            raise ValueError("window requires equal q/kv lengths")
        window = int(window)
    if batch_axis is not None and q.shape[0] % mesh.shape[batch_axis]:
        raise ValueError(
            f"batch {q.shape[0]} must divide mesh axis "
            f"{batch_axis!r}={mesh.shape[batch_axis]}")
    spec = P(batch_axis, None, seq_axis, None)
    body = partial(ring_attention, axis_name=seq_axis, causal=causal,
                   window=window, sm_scale=sm_scale)
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)

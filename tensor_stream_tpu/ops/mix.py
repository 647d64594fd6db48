"""Batch-level training mixes: MixUp and CutMix for clip/frame batches.

Companions to the per-clip transforms in ops/augment.py (the reference
stops at deterministic preprocessing, src/VideoProcessor.cpp:94-166;
these are the timm/DALI `mixup`/`cutmix` capability for video). They
operate ACROSS the batch axis, so they live in the train step rather
than the loader: take the loader's device batch, mix it under jit, and
mix the labels with the same coefficients.

    mixed, perm, lam = mixup(key, clips, alpha=0.2)
    target = mix_labels(one_hot, perm, lam)

Semantics follow the papers:

* MixUp (Zhang et al. 2018): raw ``lam ~ Beta(alpha, alpha)``, one draw
  per batch (batch-wise mode), blended against a reversed batch —
  ``x[::-1]`` — which is a fixed, bijective pairing that traces to a
  static gather (a random permutation adds nothing statistically: the
  batch order is already random).
* CutMix (Yun et al. 2019): ``lam ~ Beta(alpha, alpha)``, one rectangle
  with area fraction ``1 - lam`` at a uniform center, clipped to the
  frame; ``lam`` is then CORRECTED to the exact surviving-pixel
  fraction (the paper's Eq. 3 adjustment). The same rectangle applies
  to every frame of a clip and every channel — temporally consistent.

Everything is jittable with static ``alpha``; the returned ``lam`` is a
traced scalar to fold into the loss.
"""
import jax
import jax.numpy as jnp


def _pair(x):
    """The mixing partner of every batch element: the reversed batch."""
    return jnp.flip(x, axis=0)


def mixup(key, batch, alpha=0.2):
    """MixUp a ``[B, ...]`` float batch.

    Returns ``(mixed, perm, lam)``: ``mixed = lam * batch +
    (1 - lam) * batch[perm]`` with one raw ``lam ~ Beta(alpha, alpha)``
    for the whole batch (the paper's draw, unfolded) and ``perm`` the
    reversal pairing — pass both to `mix_labels` for the soft
    targets."""
    b = batch.shape[0]
    lam = jax.random.beta(key, alpha, alpha)
    mixed = lam * batch + (1.0 - lam) * _pair(batch)
    return mixed, jnp.arange(b - 1, -1, -1), lam


def cutmix(key, batch, alpha=1.0, spatial_axes=(-2, -1)):
    """CutMix a ``[B, ...]`` batch (any dtype; pixels are copied, not
    blended).

    ``spatial_axes`` locates (H, W): ``(-2, -1)`` for planar
    ``[B, T, C, H, W]`` / ``[B, C, H, W]``, ``(-3, -2)`` for merged
    ``[B, T, H, W, C]`` / ``[B, H, W, C]``. One rectangle per batch
    (drawn from ``lam ~ Beta(alpha, alpha)``, area fraction
    ``1 - lam``, uniform center, clipped) replaces the region with the
    reversed batch's pixels in every frame/channel. Returns
    ``(mixed, perm, lam)`` where ``lam`` is the EXACT fraction of
    surviving original pixels after clipping."""
    b = batch.shape[0]
    h_ax = spatial_axes[0] % batch.ndim
    w_ax = spatial_axes[1] % batch.ndim
    H, W = batch.shape[h_ax], batch.shape[w_ax]
    k_lam, k_y, k_x = jax.random.split(key, 3)
    lam0 = jax.random.beta(k_lam, alpha, alpha)
    cut = jnp.sqrt(1.0 - lam0)  # rect side fraction
    ch = cut * H
    cw = cut * W
    cy = jax.random.uniform(k_y) * H
    cx = jax.random.uniform(k_x) * W
    y0 = jnp.clip(jnp.round(cy - ch / 2), 0, H).astype(jnp.int32)
    y1 = jnp.clip(jnp.round(cy + ch / 2), 0, H).astype(jnp.int32)
    x0 = jnp.clip(jnp.round(cx - cw / 2), 0, W).astype(jnp.int32)
    x1 = jnp.clip(jnp.round(cx + cw / 2), 0, W).astype(jnp.int32)
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    in_y = (ys >= y0) & (ys < y1)
    in_x = (xs >= x0) & (xs < x1)
    shape_y = [1] * batch.ndim
    shape_y[h_ax] = H
    shape_x = [1] * batch.ndim
    shape_x[w_ax] = W
    inside = in_y.reshape(shape_y) & in_x.reshape(shape_x)
    mixed = jnp.where(inside, _pair(batch), batch)
    # Paper Eq. 3: lam = 1 - cut_area / frame_area, post-clipping.
    lam = 1.0 - ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / (H * W)
    return mixed, jnp.arange(b - 1, -1, -1), lam


def mix_labels(one_hot, perm, lam):
    """Soft targets for a mixed batch: ``lam * y + (1 - lam) * y[perm]``
    on one-hot (or already-soft) ``[B, num_classes]`` labels."""
    return lam * one_hot + (1.0 - lam) * jnp.take(one_hot, perm, axis=0)

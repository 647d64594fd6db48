"""End-to-end training integration: real decode (ClipLoader) → fused
on-device augmentation → MixUp → VideoViT train step → checkpoint
resume. The whole production training path in one test file."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tensor_stream_tpu import (AugmentConfig, ClipLoader, FourCC, Planes,
                               ResizeType, TrainCheckpointer, mix_labels,
                               mixup)
from tensor_stream_tpu.models.video_vit import VideoViT, init_vit

from conftest import BUNNY

needs_fixture = pytest.mark.skipif(not os.path.exists(BUNNY),
                                   reason="reference fixtures absent")

SIZE, CLIP_LEN, BATCH = 32, 4, 4


def make_loader(**extra):
    kw = dict(clip_len=CLIP_LEN, batch=BATCH, shuffle=True, seed=0,
              workers=2, host_resize=True, width=40, height=40,
              resize_type=ResizeType.BILINEAR, pixel_format=FourCC.RGB24,
              planes_pos=Planes.MERGED, normalization=True,
              augment=AugmentConfig(width=SIZE, height=SIZE,
                                    scale=(0.5, 1.0), hflip=0.5,
                                    brightness=0.2))
    kw.update(extra)
    return ClipLoader(BUNNY, **kw)


@needs_fixture
def test_vit_trains_on_real_decode_with_augment_and_mixup(tmp_path):
    model = VideoViT(num_classes=2, depth=2, dim=32, num_heads=2,
                     patch=8, tubelet_t=2, compute_dtype=jnp.bfloat16,
                     remat=True)
    params = init_vit(jax.random.PRNGKey(0), model,
                      (BATCH, CLIP_LEN, SIZE, SIZE, 3))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, clips, labels1h, key):
        # Batch-level MixUp on device, soft labels.
        mixed, perm, lam = mixup(key, clips, alpha=0.2)
        soft = mix_labels(labels1h, perm, lam)

        def loss_fn(p):
            logits = model.apply(p, mixed)
            return optax.softmax_cross_entropy(logits, soft).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    loader = make_loader()
    losses = []
    try:
        it = iter(loader)
        for step in range(4):
            try:
                clips, starts = next(it)
            except StopIteration:
                it = iter(loader)
                clips, starts = next(it)
            assert clips.shape == (BATCH, CLIP_LEN, SIZE, SIZE, 3)
            assert clips.dtype == jnp.float32
            labels = jax.nn.one_hot(
                jnp.asarray([s % 2 for s in starts]), 2)
            params, opt, loss = train_step(
                params, opt, clips, labels,
                jax.random.fold_in(jax.random.PRNGKey(7), step))
            losses.append(float(loss))
    finally:
        loader.close()
    assert np.isfinite(losses).all(), losses

    # Checkpoint the final state + cursor; restore round-trips.
    with TrainCheckpointer(str(tmp_path)) as ckpt:
        ckpt.save(4, {"params": params, "opt": opt},
                  loader_state={"epoch": 0, "start_clip": 4})
        step, restored, cursor = ckpt.restore(
            template={"params": params, "opt": opt})
    assert step == 4 and cursor["start_clip"] == 4
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@needs_fixture
def test_augmented_clips_are_deterministic_per_epoch():
    """Two loaders with the same seed/epoch produce identical augmented
    batches (the transform keys derive from (aug_seed, epoch, clip))."""
    a = make_loader()
    b = make_loader()
    try:
        ca, sa = next(iter(a))
        cb, sb = next(iter(b))
    finally:
        a.close()
        b.close()
    assert sa == sb
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))

"""Pipeline parallelism (GPipe over VideoViT blocks): forward/grad
parity vs the sequential model, and the dp x pp train step, on the
virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tensor_stream_tpu.models.video_vit import VideoViT
from tensor_stream_tpu.parallel.pipeline import (init_pp_params,
                                                 make_pp_mesh,
                                                 make_pp_train_step,
                                                 pp_apply)

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")

CLIP = (8, 4, 16, 16, 3)  # B, T, H, W, C (B/dp=4 locals)


def tiny(**kw):
    kw.setdefault("num_classes", 2)
    kw.setdefault("depth", 4)       # = pp stages
    kw.setdefault("dim", 32)
    kw.setdefault("num_heads", 2)
    kw.setdefault("patch", 8)
    kw.setdefault("tubelet_t", 2)
    kw.setdefault("compute_dtype", jnp.float32)
    return VideoViT(**kw)


def seq_and_pp_params(model, rng):
    full = model.init(rng, jnp.zeros(CLIP, jnp.float32))
    outer, stage = init_pp_params(rng, model, CLIP, model.depth)
    return full, outer, stage


@needs_mesh
@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_pp_forward_matches_sequential(n_micro):
    """Each block runs the same ops on the same data — only ppermutes
    move activations — so pipeline logits match the sequential model
    to float tolerance regardless of microbatch count."""
    mesh = make_pp_mesh(8, pp=4)
    model = tiny()
    full, outer, stage = seq_and_pp_params(model, jax.random.PRNGKey(0))
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    want = np.asarray(jax.jit(model.apply)(full, clips))
    got = np.asarray(pp_apply(mesh, model, outer, stage, clips,
                              n_micro=n_micro))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@needs_mesh
def test_pp_grads_match_sequential():
    """jax.grad through the scan + ppermute pipe must equal the
    sequential model's grads: embed/head grads directly, block grads
    after de-stacking."""
    mesh = make_pp_mesh(8, pp=4)
    model = tiny()
    full, outer, stage = seq_and_pp_params(model, jax.random.PRNGKey(0))
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    labels = jnp.array([0, 1, 1, 0, 1, 0, 0, 1])

    def seq_loss(p):
        logits = model.apply(p, clips)
        return -jnp.take_along_axis(jax.nn.log_softmax(logits),
                                    labels[:, None], axis=1).mean()

    def pp_loss(o, s):
        logits = pp_apply(mesh, model, o, s, clips, n_micro=2)
        return -jnp.take_along_axis(jax.nn.log_softmax(logits),
                                    labels[:, None], axis=1).mean()

    g_seq = jax.jit(jax.grad(seq_loss))(full)["params"]
    g_out, g_stage = jax.jit(jax.grad(pp_loss, argnums=(0, 1)))(outer, stage)
    g_out, g_stage = g_out["params"], g_stage["params"]

    for name in g_out:  # embed + head leaves
        for a, b in zip(jax.tree_util.tree_leaves(g_out[name]),
                        jax.tree_util.tree_leaves(g_seq[name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
    for i in range(model.depth):  # stage i, block 0 == block i (L=1)
        a_i = jax.tree_util.tree_map(lambda p: p[i, 0], g_stage)
        for a, b in zip(jax.tree_util.tree_leaves(a_i),
                        jax.tree_util.tree_leaves(g_seq[f"block{i}"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


@needs_mesh
def test_pp_stage_params_physically_sharded():
    mesh = make_pp_mesh(8, pp=4)
    model = tiny()
    _, outer, stage = seq_and_pp_params(model, jax.random.PRNGKey(0))
    shard_fn, _ = make_pp_train_step(mesh, model, optax.sgd(1e-2))
    outer, stage = shard_fn(outer, stage)
    k = stage["params"]["attn_s"]["query"]["kernel"]  # [S, D, H, dh]
    assert k.shape[0] == 4
    # Each pp member holds exactly one stage (leading axis 4 over pp=4).
    assert k.addressable_shards[0].data.shape[0] == 1


@needs_mesh
def test_pp_train_step_descends():
    """Full dp x pp train step (bf16 compute + remat-free): loss falls
    on the brightness-ramp arrow-of-time toy."""
    mesh = make_pp_mesh(8, pp=4)
    model = tiny(compute_dtype=jnp.bfloat16)
    _, outer, stage = seq_and_pp_params(model, jax.random.PRNGKey(0))
    tx = optax.adam(3e-3)
    shard_fn, step = make_pp_train_step(mesh, model, tx, n_micro=2)
    outer, stage = shard_fn(outer, stage)
    opt = tx.init((outer, stage))
    rng = np.random.default_rng(3)
    ramp = np.linspace(0, 1, CLIP[1], dtype=np.float32)
    clips = (rng.uniform(0, .25, CLIP).astype(np.float32)
             + ramp[None, :, None, None, None])
    mask = np.array([True, False, True, False, False, True, False, True])
    losses = []
    for _ in range(8):
        outer, stage, opt, loss, acc = step(outer, stage, opt, clips, mask)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@needs_mesh
def test_pp_multiple_blocks_per_stage():
    """depth=8 on pp=4 (2 blocks per stage, scanned inside the stage):
    forward parity with the sequential model and a descending train
    step."""
    mesh = make_pp_mesh(8, pp=4)
    model = tiny(depth=8)
    full = model.init(jax.random.PRNGKey(0), jnp.zeros(CLIP, jnp.float32))
    outer, stage = init_pp_params(jax.random.PRNGKey(0), model, CLIP, 4)
    k = stage["params"]["attn_s"]["query"]["kernel"]
    assert k.shape[:2] == (4, 2)       # [stages, blocks-per-stage, ...]
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    want = np.asarray(jax.jit(model.apply)(full, clips))
    got = np.asarray(pp_apply(mesh, model, outer, stage, clips, n_micro=2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    tx = optax.adam(3e-3)
    shard_fn, step = make_pp_train_step(mesh, model, tx, n_micro=2)
    outer, stage = shard_fn(outer, stage)
    opt = tx.init((outer, stage))
    mask = np.array([True, False] * 4)
    outer, stage, opt, loss, acc = step(outer, stage, opt, clips, mask)
    assert np.isfinite(float(loss))

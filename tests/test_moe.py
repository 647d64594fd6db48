"""Switch-MoE VideoViT: routing/capacity laws, dense-equivalence,
expert-parallel sharding parity on the virtual 8-device mesh."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tensor_stream_tpu.models.moe import (MoEMLP, VideoMoE,
                                          make_moe_train_step,
                                          moe_param_specs)
from tensor_stream_tpu.parallel import make_mesh

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")

CLIP = (4, 4, 16, 16, 3)


def tiny_moe(**kw):
    kw.setdefault("num_classes", 2)
    kw.setdefault("num_experts", 4)
    kw.setdefault("depth", 2)
    kw.setdefault("dim", 32)
    kw.setdefault("num_heads", 2)
    kw.setdefault("patch", 8)
    kw.setdefault("tubelet_t", 2)
    kw.setdefault("compute_dtype", jnp.float32)
    return VideoMoE(**kw)


def test_single_expert_equals_dense_mlp():
    """E=1: every token routes to expert 0 with gate exactly 1.0
    (softmax over one logit), ample capacity — the MoE layer must equal
    the plain 2-layer gelu MLP with that expert's weights."""
    moe = MoEMLP(num_experts=1, hidden_mult=2, capacity_factor=1.0,
                 compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
    params = moe.init(jax.random.PRNGKey(0), x)
    # HIGHEST pins every matmul to true f32 so the law checks exactly on
    # the TPU backend too (at DEFAULT the dispatch-einsum path and the
    # plain-matmul oracle round differently through bf16 MXU passes).
    with jax.default_matmul_precision("highest"):
        got = np.asarray(moe.apply(params, x)[0])
        p = params["params"]
        want = np.asarray(
            nn.gelu(x @ p["w1"][0] + p["b1"][0]) @ p["w2"][0] + p["b2"][0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_capacity_overflow_drops_tokens():
    """Router rigged to send every token to expert 0: tokens past the
    expert's capacity C produce EXACTLY zero output (the residual is
    the caller's job)."""
    s, d, e = 8, 16, 2
    cf = 0.5                     # C = ceil(8/2 * 0.5) = 2
    moe = MoEMLP(num_experts=e, hidden_mult=2, capacity_factor=cf,
                 compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, s, d))
    params = moe.init(jax.random.PRNGKey(0), x)
    # Zero router: all logits tie, argmax picks expert 0 for every
    # token (deterministic routing independent of x).
    params["params"]["router"]["kernel"] = jnp.zeros((d, e))
    out, aux = moe.apply(params, x)
    out = np.asarray(out)
    c = 2
    assert np.abs(out[0, :c]).sum() > 0           # kept tokens computed
    np.testing.assert_array_equal(out[0, c:], 0)  # overflow dropped
    assert np.isfinite(float(aux))


def test_balance_loss_is_one_at_uniform():
    """Perfectly uniform routing drives the Switch balance term to 1:
    with the router weight 0.01 and z-loss ~0, aux ≈ 0.01."""
    s, d, e = 16, 8, 4
    moe = MoEMLP(num_experts=e, hidden_mult=1, capacity_factor=4.0,
                 compute_dtype=jnp.float32, zloss_weight=0.0)
    # One-hot-ish inputs that tie tokens to experts round-robin via a
    # rigged identity-block router.
    x = jnp.eye(e, d)[jnp.tile(jnp.arange(e), s // e)][None]  # [1,S,D]
    params = moe.init(jax.random.PRNGKey(0), x)
    router = np.zeros((d, e), np.float32)
    router[:e, :e] = np.eye(e) * 50.0            # token i → expert i%e
    params["params"]["router"]["kernel"] = jnp.asarray(router)
    _, aux = moe.apply(params, x)
    np.testing.assert_allclose(float(aux), 0.01, rtol=1e-4)


def test_videomoe_forward_and_grads_finite():
    model = tiny_moe()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros(CLIP, jnp.float32))
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)

    def loss(p):
        logits, aux = model.apply(p, clips)
        return logits.sum() + aux

    logits, aux = jax.jit(model.apply)(params, clips)
    assert logits.shape == (CLIP[0], 2)
    assert float(aux) > 0
    g = jax.jit(jax.grad(loss))(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


@needs_mesh
def test_expert_parallel_matches_unsharded():
    """dp=4 x ep=2 sharded apply must match the single-device forward
    (routing is deterministic; only layouts change)."""
    mesh = make_mesh(8, axes=("dp", "ep"))
    model = tiny_moe()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros(CLIP, jnp.float32))
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    want_logits, want_aux = jax.jit(model.apply)(params, clips)

    shard_params, _ = make_moe_train_step(mesh, model, optax.sgd(1e-2))
    sp = shard_params(params)
    got_logits, got_aux = jax.jit(model.apply)(sp, clips)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(got_aux), float(want_aux), rtol=1e-5)


@needs_mesh
def test_expert_weights_physically_sharded():
    mesh = make_mesh(8, axes=("dp", "ep"))
    model = tiny_moe()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros(CLIP, jnp.float32))
    shard_params, _ = make_moe_train_step(mesh, model, optax.sgd(1e-2))
    sp = shard_params(params)
    w1 = sp["params"]["block0"]["moe"]["w1"]     # [E, D, F]
    ep = mesh.shape["ep"]
    assert w1.addressable_shards[0].data.shape[0] * ep == w1.shape[0]


@needs_mesh
def test_moe_train_step_descends():
    mesh = make_mesh(8, axes=("dp", "ep"))
    model = tiny_moe(compute_dtype=jnp.bfloat16, remat=True)
    tx = optax.adam(3e-3)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros(CLIP, jnp.float32))
    shard_params, step = make_moe_train_step(mesh, model, tx)
    sp = shard_params(params)
    so = tx.init(sp)
    rng = np.random.default_rng(4)
    ramp = np.linspace(0, 1, CLIP[1], dtype=np.float32)
    clips = (rng.uniform(0, .25, CLIP).astype(np.float32)
             + ramp[None, :, None, None, None])
    mask = np.array([True, False, True, False])
    losses = []
    for _ in range(8):
        sp, so, loss, acc, aux = step(sp, so, clips, mask)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

"""VideoViT model family: forward/grad correctness, remat equivalence,
and the dp x tp (x sp) sharded train step on the virtual 8-device mesh.

The reference has no video-transformer counterpart (its examples stop at
per-frame CNN inference); this family exists because the clip loaders
produce the [B, T, H, W, C] batches such models train on.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tensor_stream_tpu.models.video_vit import (VideoViT, init_vit,
                                                make_act_sharding,
                                                make_vit_train_step,
                                                vit_param_specs)
from tensor_stream_tpu.parallel import make_mesh

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")

CLIP = (2, 4, 32, 32, 3)  # B, T, H, W, C


def tiny(compute_dtype=jnp.float32, **kw):
    kw.setdefault("num_classes", 2)
    kw.setdefault("depth", 2)
    kw.setdefault("dim", 32)
    kw.setdefault("num_heads", 2)
    kw.setdefault("patch", 8)
    kw.setdefault("tubelet_t", 2)
    return VideoViT(compute_dtype=compute_dtype, **kw)


def test_forward_shape_and_dtype():
    model = tiny(compute_dtype=jnp.bfloat16)
    params = init_vit(jax.random.PRNGKey(0), model, CLIP)
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    logits = jax.jit(model.apply)(params, clips)
    assert logits.shape == (CLIP[0], 2)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()
    # Params stay f32 (mixed precision: bf16 is compute-only).
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(params))


def test_bf16_residual_stream_matches_f32_residual():
    """residual_dtype=bf16 (the training-throughput config: half the
    activation HBM traffic) shares the f32-residual model's params and
    agrees with it to bf16 tolerance — same argmax, finite, and it
    really is a different program (outputs not bit-identical)."""
    kw = dict(compute_dtype=jnp.bfloat16)
    f32res = tiny(**kw)
    bf16res = tiny(residual_dtype=jnp.bfloat16, **kw)
    params = init_vit(jax.random.PRNGKey(0), f32res, CLIP)
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    a = np.asarray(jax.jit(f32res.apply)(params, clips))
    b = np.asarray(jax.jit(bf16res.apply)(params, clips))
    assert b.dtype == np.float32 and np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
    assert (a.argmax(-1) == b.argmax(-1)).all()
    assert not np.array_equal(a, b)


def test_temporal_attention_sees_order():
    """A reversed clip must produce different logits than the forward
    clip (the temporal pathway carries order; a pure spatial model
    would be invariant under frame reversal after mean-pooling)."""
    model = tiny()
    params = init_vit(jax.random.PRNGKey(0), model, CLIP)
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    fwd = np.asarray(model.apply(params, clips))
    rev = np.asarray(model.apply(params, jnp.flip(clips, axis=1)))
    assert not np.allclose(fwd, rev, atol=1e-6)


def test_remat_grads_match_exactly():
    """jax.checkpoint recomputes the SAME ops: grads must match the
    non-remat model to the last ulp in f32 compute."""
    m_plain = tiny(remat=False)
    m_remat = tiny(remat=True)
    params = init_vit(jax.random.PRNGKey(0), m_plain, CLIP)
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)

    def loss(model, p):
        return model.apply(p, clips).sum()

    g1 = jax.jit(jax.grad(lambda p: loss(m_plain, p)))(params)
    g2 = jax.jit(jax.grad(lambda p: loss(m_remat, p)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_param_spec_shapes_cover_tree():
    """Every sharded spec must name axes that exist in the leaf's shape,
    and the Megatron rules must hit the q/k/v, out, fc1, fc2 kernels."""
    model = tiny()
    params = init_vit(jax.random.PRNGKey(0), model, CLIP)
    specs = vit_param_specs(params)
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree_util.tree_leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert len(flat_p) == len(flat_s)
    n_sharded = 0
    for (path, leaf), spec in zip(flat_p, flat_s):
        assert len(spec) <= leaf.ndim, (path, leaf.shape, spec)
        if any(ax is not None for ax in spec):
            n_sharded += 1
    # 2 attention modules/block x (3 qkv kernels + 3 qkv biases + 1 out
    # kernel) + mlp (fc1 kernel+bias, fc2 kernel) per block.
    assert n_sharded == model.depth * (2 * 7 + 3)


@needs_mesh
def test_param_specs_reject_indivisible_kv_heads():
    """MQA (1 kv head) under tp=2 must fail up front with an error that
    names the head count and the axis — not deep inside GSPMD
    (ADVICE r4: the constraint used to live only in a comment)."""
    mesh = make_mesh(8, axes=("dp", "mp"))  # mp=2
    model = tiny(num_kv_heads=1)
    params = init_vit(jax.random.PRNGKey(0), model, CLIP)
    with pytest.raises(ValueError, match=r"key.*1 heads.*'mp'.*2"):
        vit_param_specs(params, mesh=mesh)
    # Divisible configs still produce specs with the mesh passed.
    ok = vit_param_specs(init_vit(jax.random.PRNGKey(0), tiny(), CLIP),
                         mesh=mesh)
    assert any(ax is not None
               for s in jax.tree_util.tree_leaves(
                   ok, is_leaf=lambda x: isinstance(x, P)) for ax in s)


@needs_mesh
def test_sharded_step_matches_single_device():
    """dp=4 x mp=2 sharded train step computes the same loss/acc/params
    as the unsharded step (f32 compute; tp reduction reorder only).
    SGD, not adam: adam's g/(sqrt(g^2)+eps) is sign-unstable for
    near-zero grads, amplifying legitimate cross-shard reduction
    reorder into O(lr) param diffs."""
    mesh = make_mesh(8, axes=("dp", "mp"))
    model = tiny()
    tx = optax.sgd(1e-2)
    params = init_vit(jax.random.PRNGKey(0), model, CLIP)
    rng = np.random.default_rng(0)
    clips = rng.uniform(0, 1, (4,) + CLIP[1:]).astype(np.float32)
    mask = np.array([True, False, False, True])

    # Unsharded twin first: the sharded step donates its inputs, and
    # device_put may alias the device-0 shard to the original buffers.
    def loss_fn(p, x, labels):
        logits = model.apply(p, x)
        loss = -jnp.take_along_axis(jax.nn.log_softmax(logits),
                                    labels[:, None], axis=1).mean()
        return loss, (logits.argmax(-1) == labels).mean()

    x = np.where(mask[:, None, None, None, None], clips[:, ::-1], clips)
    (u_loss, u_acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, jnp.asarray(x), jnp.asarray(mask.astype(np.int32)))
    updates, _ = tx.update(grads, tx.init(params))
    u_params = optax.apply_updates(params, updates)

    shard_params, step = make_vit_train_step(mesh, model, tx)
    sp = shard_params(params)
    so = tx.init(sp)
    sp, so, s_loss, s_acc = step(sp, so, clips, mask)

    np.testing.assert_allclose(float(s_loss), float(u_loss), rtol=1e-5)
    assert float(s_acc) == float(u_acc)
    for a, b in zip(jax.tree_util.tree_leaves(sp),
                    jax.tree_util.tree_leaves(u_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@needs_mesh
def test_sharded_params_actually_sharded():
    """The qkv/mlp kernels must physically live sharded over mp (this is
    tensor parallelism, not replication)."""
    mesh = make_mesh(8, axes=("dp", "mp"))
    model = tiny()
    params = init_vit(jax.random.PRNGKey(0), model, CLIP)
    shard_params, _ = make_vit_train_step(mesh, model, tx=optax.sgd(1e-3))
    sp = shard_params(params)
    k = sp["params"]["block0"]["attn_s"]["query"]["kernel"]
    mp = mesh.shape["mp"]
    assert len(k.addressable_shards) == 8
    # Head axis split over mp: each shard holds 1/mp of axis 1.
    assert k.addressable_shards[0].data.shape[1] * mp == k.shape[1]
    f = sp["params"]["block0"]["mlp"]["fc1"]["kernel"]
    assert f.addressable_shards[0].data.shape[1] * mp == f.shape[1]


@needs_mesh
def test_sequence_parallel_matches():
    """dp x sp mesh with the token axis sharded: same loss as unsharded
    (GSPMD all-gathers where attention needs full sequences)."""
    mesh = make_mesh(8, axes=("dp", "mp"))
    model_sp = tiny(act_sharding=make_act_sharding(mesh, "mp"))
    model_ref = tiny()
    tx = optax.sgd(1e-2)
    params = init_vit(jax.random.PRNGKey(0), model_ref, CLIP)
    rng = np.random.default_rng(1)
    clips = rng.uniform(0, 1, (4,) + CLIP[1:]).astype(np.float32)
    mask = np.array([False, True, False, True])

    x = np.where(mask[:, None, None, None, None], clips[:, ::-1], clips)
    logits = model_ref.apply(params, jnp.asarray(x))
    labels = jnp.asarray(mask.astype(np.int32))
    u_loss = -jnp.take_along_axis(jax.nn.log_softmax(logits),
                                  labels[:, None], axis=1).mean()

    shard_params, step = make_vit_train_step(mesh, model_sp, tx)
    sp = shard_params(params)
    _, _, s_loss, _ = step(sp, tx.init(sp), clips, mask)
    np.testing.assert_allclose(float(s_loss), float(u_loss), rtol=1e-5)


@needs_mesh
def test_sharded_bf16_step_descends():
    """The production config (bf16 compute, remat, dp x mp) trains: loss
    decreases over a few steps on a memorizable toy batch."""
    mesh = make_mesh(8, axes=("dp", "mp"))
    model = tiny(compute_dtype=jnp.bfloat16, remat=True)
    tx = optax.adam(3e-3)
    params = init_vit(jax.random.PRNGKey(0), model, CLIP)
    shard_params, step = make_vit_train_step(mesh, model, tx)
    sp = shard_params(params)
    so = tx.init(sp)
    rng = np.random.default_rng(2)
    # Strongly-ordered signal: brightness ramps over time.
    ramp = np.linspace(0, 1, CLIP[1], dtype=np.float32)
    clips = (rng.uniform(0, .25, (4,) + CLIP[1:]).astype(np.float32)
             + ramp[None, :, None, None, None])
    mask = np.array([True, False, True, False])
    losses = []
    for _ in range(8):
        sp, so, loss, acc = step(sp, so, clips, mask)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@needs_mesh
def test_vit_train_step_on_sharded_clip_loader():
    """Glue: ShardedClipLoader's dp-sharded global clip batches feed
    make_vit_train_step on a 2D (dp, mp) mesh directly — the step's
    sharding constraint reshards the 1D-dp arrays, loss finite and the
    step descends over an epoch. NHWC merged RGB, augment-free."""
    import os

    from tensor_stream_tpu import FourCC, Planes, ShardedClipLoader

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "bbb_720x480_RGB24_250.h264")
    if not os.path.exists(fix):
        pytest.skip("fixture absent")
    mesh = make_mesh(8, axes=("dp", "mp"))
    model = tiny(compute_dtype=jnp.bfloat16, patch=16)
    tx = optax.adam(1e-3)

    loader = ShardedClipLoader(fix, clip_len=4, per_device=1, seed=3,
                               workers=2, host_resize=True, width=32,
                               height=32, pixel_format=FourCC.RGB24,
                               planes_pos=Planes.MERGED,
                               normalization=True)
    try:
        params = init_vit(jax.random.PRNGKey(0), model,
                          (loader.batch, 4, 32, 32, 3))
        shard_params, step = make_vit_train_step(mesh, model, tx)
        sp = shard_params(params)
        so = tx.init(sp)
        rng = np.random.default_rng(0)
        losses = []
        for clips, starts in loader:
            assert clips.shape == (8, 4, 32, 32, 3)
            mask = rng.random(clips.shape[0]) < 0.5
            sp, so, loss, acc = step(sp, so, clips, mask)
            losses.append(float(loss))
    finally:
        loader.close()
    assert len(losses) >= 3
    assert np.isfinite(losses).all()


# --------------------------------------------------- joint attention mode

def test_joint_forward_shape_and_grads():
    """attention="joint": one full-attention pathway over T'·N tokens."""
    model = tiny(attention="joint")
    params = init_vit(jax.random.PRNGKey(0), model, CLIP)
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    logits = jax.jit(model.apply)(params, clips)
    assert logits.shape == (CLIP[0], 2)
    assert np.isfinite(np.asarray(logits)).all()

    def loss(p):
        return jnp.sum(model.apply(p, clips) ** 2)
    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # The joint block has ONE attention sublayer (no temporal twin).
    names = params["params"]["block0"].keys()
    assert "attn" in names and "attn_t" not in names


def test_joint_attends_across_frames():
    """Joint attention mixes frames in one hop: perturbing frame T-1
    changes frame-0 tokens' contribution to the logits (factorized needs
    the temporal sublayer for that; joint does it in the attention)."""
    model = tiny(attention="joint", depth=1)
    params = init_vit(jax.random.PRNGKey(0), model, CLIP)
    clips = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), CLIP))
    base = np.asarray(model.apply(params, jnp.asarray(clips)))
    pert = clips.copy()
    pert[:, -1] += 0.5
    got = np.asarray(model.apply(params, jnp.asarray(pert)))
    assert np.abs(got - base).max() > 1e-6


def test_joint_flash_parity():
    """use_flash through the JOINT pathway (the sequence regime the
    kernel exists for) == the materialized path, same params."""
    base = tiny(attention="joint")
    flash = tiny(attention="joint", use_flash=True, flash_impl="pallas")
    params = init_vit(jax.random.PRNGKey(0), base, CLIP)
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    want = base.apply(params, clips)
    got = flash.apply(params, clips)
    tol = 2e-3 if jax.default_backend() == "tpu" else 2e-5
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=tol, rtol=tol)


def test_joint_rejects_causal():
    model = tiny(attention="joint", causal=True)
    with pytest.raises(AssertionError, match="factorized"):
        init_vit(jax.random.PRNGKey(0), model, CLIP)


@needs_mesh
def test_joint_ring_parity():
    """Joint attention + ring over the FLATTENED token axis (S = T'·N,
    the context-parallel regime) == the unsharded joint model."""
    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    base = tiny(attention="joint")
    ringed = tiny(attention="joint",
                  act_sharding=make_act_sharding(mesh, "sp", joint=True),
                  ring_axis="sp", mesh=mesh, ring_batch_axis="dp")
    params = init_vit(jax.random.PRNGKey(0), base, CLIP)
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    want = base.apply(params, clips)
    got = jax.jit(lambda p: ringed.apply(p, clips))(params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_joint_remat_matches():
    """remat=True (jax.checkpoint around each JointBlock) is
    value-preserving, incl. through the flash custom-VJP path."""
    base = tiny(attention="joint")
    remat = tiny(attention="joint", remat=True)
    params = init_vit(jax.random.PRNGKey(0), base, CLIP)
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)

    def loss(model):
        return lambda p: jnp.sum(model.apply(p, clips) ** 2)
    g_base = jax.grad(loss(base))(params)
    g_remat = jax.grad(loss(remat))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_base),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)

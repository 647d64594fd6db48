"""Ring attention (ops/ring_attention.py) vs full attention — forward
AND gradients, on the virtual 8-device mesh.

The oracle is `flash_attention._reference` — the exact numerics contract
of the model layer's materialized path (f32 logits/softmax, value-dtype
P@V) — so agreement here is agreement with the production gathered
path: ring attention must be a LAYOUT change (token axis stays sharded,
K/V rotate via ppermute), never a numerics change. The online-softmax
merge is mathematically exact; tolerances only cover reduction order.

The reference CUDA project has no attention at all (SURVEY §5.7): this
is the framework's context-parallelism axis, proven the same way the
other mesh axes are (tests/test_parallel.py, test_pipeline_parallel.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tensor_stream_tpu.ops.flash_attention import _reference
from tensor_stream_tpu.ops.ring_attention import (ring_attention,
                                                  ring_attention_sharded)

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")

TOL = dict(atol=2e-5, rtol=2e-5)


def _mesh(axes, shape=None):
    devs = jax.devices()[:8]
    if shape is None:
        shape = (len(devs),)
    return Mesh(np.asarray(devs).reshape(shape), axes)


def _qkv(b, h, s, d, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    def mk():
        return jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, dtype)
    return mk(), mk(), mk()


# ------------------------------------------------------------- forward

@needs_mesh
@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full(causal):
    """8-way ring == full attention (the gathered oracle), f32."""
    mesh = _mesh(("cp",))
    q, k, v = _qkv(2, 2, 64, 16)
    got = ring_attention_sharded(mesh, q, k, v, seq_axis="cp",
                                 causal=causal)
    want = _reference(q, k, v, causal, 16 ** -0.5)
    assert got.shape == want.shape and got.dtype == q.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


@needs_mesh
def test_ring_dp_cp_mesh():
    """dp x cp: each dp row runs its own independent ring."""
    mesh = _mesh(("dp", "cp"), (2, 4))
    q, k, v = _qkv(4, 2, 32, 16, seed=1)
    got = ring_attention_sharded(mesh, q, k, v, seq_axis="cp",
                                 batch_axis="dp", causal=True)
    want = _reference(q, k, v, True, 16 ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


@needs_mesh
def test_ring_custom_scale_and_bf16():
    """Explicit sm_scale and bf16 inputs (f32 stats inside, bf16 out)."""
    mesh = _mesh(("cp",))
    q, k, v = _qkv(1, 2, 64, 16, seed=2, dtype=jnp.bfloat16)
    got = ring_attention_sharded(mesh, q, k, v, seq_axis="cp",
                                 sm_scale=0.125)
    want = _reference(q, k, v, False, 0.125)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_ring_single_device():
    """Ring of 1 == full attention (runs on any backend, incl. the
    chip parity lane: a 1-device mesh ppermutes to itself)."""
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("cp",))
    q, k, v = _qkv(1, 2, 48, 16, seed=3)
    got = ring_attention_sharded(mesh, q, k, v, seq_axis="cp", causal=True)
    want = _reference(q, k, v, True, 16 ** -0.5)
    tol = dict(atol=2e-3, rtol=2e-3) \
        if jax.default_backend() == "tpu" else TOL
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **tol)


@needs_mesh
@pytest.mark.parametrize("causal,window", [(True, 12), (False, 20),
                                           (True, 64)])
def test_ring_window_matches_full(causal, window):
    """Sliding window through the ring: the band is masked by GLOBAL
    position per rotating block (including windows narrower than one
    block — whole ring steps then contribute nothing; and wider than
    the sequence — full attention)."""
    mesh = _mesh(("cp",))
    q, k, v = _qkv(2, 2, 64, 16, seed=7)
    got = ring_attention_sharded(mesh, q, k, v, seq_axis="cp",
                                 causal=causal, window=window)
    want = _reference(q, k, v, causal, 16 ** -0.5, window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


@needs_mesh
def test_ring_window_grads_match_full():
    """Windowed ring gradients == windowed full attention's (the band
    mask is inside the scan; its transpose rides the reverse ring)."""
    mesh = _mesh(("cp",))
    q, k, v = _qkv(2, 2, 64, 16, seed=8)
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal(q.shape) * 0.1,
        jnp.float32)

    def loss_ring(q, k, v):
        out = ring_attention_sharded(mesh, q, k, v, seq_axis="cp",
                                     causal=True, window=24)
        return jnp.sum(out * cot)

    def loss_full(q, k, v):
        return jnp.sum(_reference(q, k, v, True, 16 ** -0.5, 24) * cot)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_ring, g_full, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   err_msg=f"d{name}", **TOL)


# ------------------------------------------------------------ gradients

@needs_mesh
@pytest.mark.parametrize("causal", [False, True])
def test_ring_grads_match_full(causal):
    """d/d{q,k,v} through the ring (scan + ppermute transpose) == full
    attention's gradients: the reverse ring rotates dk/dv home."""
    mesh = _mesh(("cp",))
    q, k, v = _qkv(2, 2, 64, 16, seed=4)
    cot = jnp.asarray(
        np.random.default_rng(5).standard_normal(q.shape) * 0.1,
        jnp.float32)

    def loss_ring(q, k, v):
        out = ring_attention_sharded(mesh, q, k, v, seq_axis="cp",
                                     causal=causal)
        return jnp.sum(out * cot)

    def loss_full(q, k, v):
        return jnp.sum(_reference(q, k, v, causal, 16 ** -0.5) * cot)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_ring, g_full, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   err_msg=f"d{name}", **TOL)


# ----------------------------------------------------------- validation

@needs_mesh
def test_ring_rejects_indivisible_and_raggedness():
    mesh = _mesh(("cp",))
    q, k, v = _qkv(1, 1, 60, 16)   # 60 % 8 != 0
    with pytest.raises(ValueError, match="divide the ring"):
        ring_attention_sharded(mesh, q, k, v, seq_axis="cp")
    q2, k2, v2 = _qkv(1, 1, 64, 16)
    with pytest.raises(ValueError, match="equal q/kv"):
        ring_attention_sharded(mesh, q2, k2[:, :, :32], v2[:, :, :32],
                               seq_axis="cp", causal=True)


# --------------------------------------------------------- model wiring

@needs_mesh
def test_mha_ring_parity():
    """MHA(ring_axis=...) == plain MHA with the SAME params: the ring is
    a layout change, invisible to the function the module computes."""
    from tensor_stream_tpu.models.video_vit import MHA

    mesh = _mesh(("dp", "sp"), (2, 4))
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 3, 16, 32)) * 0.5,
        jnp.float32)
    base = MHA(num_heads=2, compute_dtype=jnp.float32)
    params = base.init(jax.random.PRNGKey(0), x)
    want = base.apply(params, x)
    ringed = MHA(num_heads=2, compute_dtype=jnp.float32,
                 ring_axis="sp", mesh=mesh, ring_batch_axis="dp")
    got = ringed.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


@needs_mesh
def test_mha_ring_window_parity():
    """MHA(window, ring_axis) == plain MHA(window) with the same params
    — the sliding band composes through the ring path (r04 item 8)."""
    from tensor_stream_tpu.models.video_vit import MHA

    mesh = _mesh(("dp", "sp"), (2, 4))
    x = jnp.asarray(
        np.random.default_rng(10).standard_normal((2, 3, 16, 32)) * 0.5,
        jnp.float32)
    kw = dict(num_heads=2, compute_dtype=jnp.float32, causal=True,
              window=5)
    base = MHA(**kw)
    params = base.init(jax.random.PRNGKey(0), x)
    want = base.apply(params, x)
    ringed = MHA(ring_axis="sp", mesh=mesh, ring_batch_axis="dp", **kw)
    got = ringed.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


@needs_mesh
def test_vit_ring_forward_and_grads():
    """VideoViT with ring spatial attention + sp-sharded residuals: same
    logits and same param grads as the unsharded model, through jit on
    the dp x sp mesh."""
    import optax

    from tensor_stream_tpu.models.video_vit import (VideoViT,
                                                    make_act_sharding)

    mesh = _mesh(("dp", "sp"), (2, 4))
    patch = 8
    clip = (2, 4, patch * 4, patch * 4, 3)   # N = 16 tokens, sp=4
    base = VideoViT(num_classes=5, depth=2, dim=32, num_heads=2,
                    patch=patch, tubelet_t=2, compute_dtype=jnp.float32)
    ringed = VideoViT(num_classes=5, depth=2, dim=32, num_heads=2,
                      patch=patch, tubelet_t=2, compute_dtype=jnp.float32,
                      act_sharding=make_act_sharding(mesh, "sp"),
                      ring_axis="sp", mesh=mesh, ring_batch_axis="dp")
    clips = jnp.asarray(
        np.random.default_rng(7).uniform(0, 1, clip), jnp.float32)
    labels = jnp.asarray([1, 3])
    params = base.init(jax.random.PRNGKey(1), clips)

    def loss(model):
        def f(p):
            logits = model.apply(p, clips)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        return f

    l_got, g_got = jax.jit(jax.value_and_grad(loss(ringed)))(params)
    l_want, g_want = jax.value_and_grad(loss(base))(params)
    np.testing.assert_allclose(float(l_got), float(l_want), **TOL)
    flat_got = jax.tree_util.tree_leaves(g_got)
    flat_want = jax.tree_util.tree_leaves(g_want)
    for got, want in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


@needs_mesh
def test_vit_spatial_window_through_ring():
    """VideoViT(spatial_window) — patch-locality band on the spatial
    pathway — produces identical logits ringed over sp vs unsharded
    (r04 item 8: window through the ring path at model level)."""
    from tensor_stream_tpu.models.video_vit import (VideoViT,
                                                    make_act_sharding)

    mesh = _mesh(("dp", "sp"), (2, 4))
    patch = 8
    clip = (2, 4, patch * 4, patch * 4, 3)   # N = 16 tokens, sp=4
    kw = dict(num_classes=5, depth=2, dim=32, num_heads=2, patch=patch,
              tubelet_t=2, compute_dtype=jnp.float32, spatial_window=5)
    base = VideoViT(**kw)
    ringed = VideoViT(act_sharding=make_act_sharding(mesh, "sp"),
                      ring_axis="sp", mesh=mesh, ring_batch_axis="dp",
                      **kw)
    clips = jnp.asarray(
        np.random.default_rng(11).uniform(0, 1, clip), jnp.float32)
    params = base.init(jax.random.PRNGKey(1), clips)
    want = base.apply(params, clips)
    got = jax.jit(ringed.apply)(params, clips)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)
    # The band actually bites: full attention differs.
    full = VideoViT(**{**kw, "spatial_window": None})
    assert not np.allclose(np.asarray(want),
                           np.asarray(full.apply(params, clips)))


@needs_mesh
def test_mha_ring_composes_with_tp():
    """dp x tp x cp: Megatron head-sharded q/k/v params + the ring over
    the token axis, heads named in the shard_map specs (ring_head_axis)
    so each device rings over its OWN heads — same output as the
    unsharded module."""
    from tensor_stream_tpu.models.video_vit import MHA, vit_param_specs
    from jax.sharding import NamedSharding

    mesh = _mesh(("dp", "tp", "cp"), (2, 2, 2))
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal((2, 3, 16, 32)) * 0.5,
        jnp.float32)
    base = MHA(num_heads=2, compute_dtype=jnp.float32)
    params = base.init(jax.random.PRNGKey(3), x)
    want = base.apply(params, x)
    specs = vit_param_specs(params, tp_axis="tp")
    sharded = jax.tree_util.tree_map(
        lambda p, sp: jax.device_put(p, NamedSharding(mesh, sp)),
        params, specs)
    ringed = MHA(num_heads=2, compute_dtype=jnp.float32,
                 ring_axis="cp", mesh=mesh, ring_batch_axis="dp",
                 ring_head_axis="tp")
    got = jax.jit(lambda p: ringed.apply(p, x))(sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


@needs_mesh
def test_dit_ring_parity():
    """VideoDiT (adaLN) with ring spatial attention == the plain model
    with the same params: the generation stack rings too."""
    from tensor_stream_tpu.models.latent_diffusion import VideoDiT

    mesh = _mesh(("dp", "sp"), (2, 4))
    z = jnp.asarray(
        np.random.default_rng(8).standard_normal((2, 3, 4, 4, 8)) * 0.3,
        jnp.float32)                       # N = 16 latent pixels, sp=4
    t = jnp.asarray([10, 500])
    base = VideoDiT(depth=2, dim=32, num_heads=2,
                    compute_dtype=jnp.float32)
    params = base.init(jax.random.PRNGKey(2), z, t)
    want = base.apply(params, z, t)
    ringed = VideoDiT(depth=2, dim=32, num_heads=2,
                      compute_dtype=jnp.float32,
                      ring_axis="sp", mesh=mesh, ring_batch_axis="dp")
    got = jax.jit(lambda p: ringed.apply(p, z, t))(params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)

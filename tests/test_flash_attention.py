"""Flash-attention kernel (ops/flash_attention.py) vs the materialized
oracle — forward AND gradients.

The oracle `_reference` is the exact same numerics contract the model
layer uses (f32 logits/softmax, input-dtype P@V), so agreement here is
agreement with the production `use_flash=False` path. On the CPU test
backend the kernel runs in Pallas interpret mode (impl="pallas"); with
TS_TEST_TPU=1 the compiled Mosaic kernel runs on the chip (this suite is
part of the tools/tpu_parity.py lane). The reference framework has no
attention at all — this covers the beyond-parity model stack's one
custom kernel to the same bar tests/test_pallas.py sets for the color
kernel.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensor_stream_tpu.ops.flash_attention import (_reference,
                                                   flash_attention)

ON_TPU = jax.default_backend() == "tpu"


def _qkv(b, h, sq, sk, d, dtype, seed=0):
    rng = np.random.default_rng(seed)
    def mk(s):
        return jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, dtype)
    return mk(sq), mk(sk), mk(sk)


def _tol(dtype):
    # bf16 outputs quantize to 8 mantissa bits: tile-vs-full reduction
    # order shows up as 1-2 ulp (~0.8-1.6% relative) on the cast result.
    if dtype == jnp.bfloat16:
        return dict(atol=2e-2, rtol=2e-2)
    # f32 on CPU: interpret mode evaluates the same op graph as the
    # oracle up to reduction order. f32 on the chip: DEFAULT-precision
    # matmuls run as bf16 MXU passes, so kernel and oracle each carry
    # the ~1e-3 default-precision envelope (the same error the XLA path
    # has vs a float64 oracle) with different rounding points.
    return dict(atol=2e-3, rtol=2e-3) if ON_TPU \
        else dict(atol=2e-5, rtol=2e-5)


def _assert_close(got, want, dtype, scale=1.0):
    t = _tol(dtype)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=t["atol"] * scale, rtol=t["rtol"] * scale)


# ------------------------------------------------------------- forward

@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq", [128, 256, 200, 100])
def test_forward_matches_oracle(dtype, causal, seq):
    """Self-attention at tile-aligned AND ragged lengths (200, 100 force
    the pad-run-slice path and padded-tile/straddling-tile masking)."""
    q, k, v = _qkv(1, 2, seq, seq, 64, dtype)
    got = flash_attention(q, k, v, causal=causal, impl="pallas")
    want = _reference(q, k, v, causal, 64 ** -0.5)
    assert got.dtype == q.dtype and got.shape == q.shape
    _assert_close(got, want, dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("sq,sk", [(128, 384), (100, 300), (256, 128),
                                   (300, 100)])
def test_cross_attention(dtype, sq, sk):
    """kv length != q length (cross-attention), both aligned and ragged."""
    q, k, v = _qkv(1, 2, sq, sk, 64, dtype, seed=1)
    got = flash_attention(q, k, v, impl="pallas")
    want = _reference(q, k, v, False, 64 ** -0.5)
    _assert_close(got, want, dtype)


@pytest.mark.parametrize("block_q,block_k", [(128, 256), (256, 128)])
def test_unequal_blocks(block_q, block_k):
    """block_q != block_k exercises the lane-replication tiling of the
    running stats against the wider/narrower logits block."""
    q, k, v = _qkv(1, 2, 512, 512, 64, jnp.float32, seed=2)
    got = flash_attention(q, k, v, causal=True, block_q=block_q,
                          block_k=block_k, impl="pallas")
    want = _reference(q, k, v, True, 64 ** -0.5)
    # scale=2: at S=512 the kernel rescales the accumulator across 2-4x
    # more tile iterations than the aligned tests, and on the chip each
    # DEFAULT-precision pass carries bf16 rounding — the worst element
    # lands ~2 ulps (0.9% rel) from the oracle's single-softmax rounding
    # point (measured: 1/65536 elements beyond the 1-ulp envelope).
    _assert_close(got, want, jnp.float32, scale=2.0)


def test_head_dim_wider_than_lanes():
    """head_dim > 128: the accumulator is wider than the lane-replicated
    stats — the alpha/l_inv rescale must broadcast from one lane (a
    [:, :d] slice crashed here before)."""
    q, k, v = _qkv(1, 1, 128, 128, 256, jnp.float32, seed=3)
    got = flash_attention(q, k, v, impl="pallas")
    want = _reference(q, k, v, False, 256 ** -0.5)
    _assert_close(got, want, jnp.float32)


def test_small_sequence_single_tile():
    """Sequences shorter than a lane tile clamp blocks to one padded
    tile."""
    q, k, v = _qkv(2, 2, 17, 23, 32, jnp.float32, seed=4)
    got = flash_attention(q, k, v, impl="pallas")
    want = _reference(q, k, v, False, 32 ** -0.5)
    _assert_close(got, want, jnp.float32)


def test_x64_mode_keeps_f32_kernel():
    """Under jax.enable_x64 the kernel's mask fill must stay f32 (a bare
    Python float weak-types to f64, which Mosaic cannot truncate). On
    the compiled TPU path x64 additionally breaks Pallas's own grid
    index maps, so flash_attention routes x64 calls to the materialized
    path there — either way the call must work and stay f32."""
    with jax.enable_x64():
        q, k, v = _qkv(1, 1, 128, 128, 64, jnp.float32, seed=5)
        got = flash_attention(q, k, v, causal=True, impl="pallas")
        want = _reference(q, k, v, True, 64 ** -0.5)
    assert got.dtype == jnp.float32
    _assert_close(got, want, jnp.float32)


def test_matmul_precision_highest_config():
    """The kernel pins DEFAULT precision on its dots, so a global
    jax_default_matmul_precision='highest' (common in numerics tests)
    must not change how the bf16 kernel compiles."""
    with jax.default_matmul_precision("highest"):
        q, k, v = _qkv(1, 2, 128, 128, 64, jnp.bfloat16, seed=6)
        got = flash_attention(q, k, v, impl="pallas")
    want = _reference(q, k, v, False, 64 ** -0.5)
    # The oracle ran at default precision outside the ctx; bf16 envelope.
    _assert_close(got, want, jnp.bfloat16)


# --------------------------------------------------- GQA / sliding window

@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("kv_heads,causal", [(1, False), (2, True),
                                             (4, False)])
def test_gqa_forward_matches_oracle(dtype, kv_heads, causal):
    """k/v with fewer heads than q (GQA; kv_heads=1 is MQA, =num_heads
    is plain MHA) — the kernel streams the SHARED kv tiles via its
    index maps; the oracle materializes the head repeat."""
    q, _, _ = _qkv(1, 4, 256, 256, 64, dtype, seed=11)
    _, k, v = _qkv(1, kv_heads, 256, 256, 64, dtype, seed=12)
    got = flash_attention(q, k, v, causal=causal, impl="pallas")
    want = _reference(q, k, v, causal, 64 ** -0.5)
    assert got.shape == q.shape
    _assert_close(got, want, dtype)


def test_gqa_grads_match_oracle():
    """VJP accumulates dk/dv over the query-head group: dk/dv keep the
    kv head count, dq the q head count."""
    q, _, _ = _qkv(1, 4, 200, 200, 64, jnp.float32, seed=13)
    _, k, v = _qkv(1, 2, 200, 200, 64, jnp.float32, seed=14)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)
        return f

    flash = loss(lambda q, k, v: flash_attention(
        q, k, v, causal=True, impl="pallas"))
    ref = loss(lambda q, k, v: _reference(q, k, v, True, 64 ** -0.5))
    g_flash = jax.grad(flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    assert g_flash[0].shape == q.shape
    assert g_flash[1].shape == k.shape and g_flash[2].shape == v.shape
    for gf, gr in zip(g_flash, g_ref):
        _assert_close(gf, gr, jnp.float32, scale=10.0)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("causal,window,seq",
                         [(True, 64, 256), (True, 200, 300),
                          (False, 64, 256), (False, 50, 200)])
def test_window_forward_matches_oracle(dtype, causal, window, seq):
    """Sliding-window band: causal = last `window` positions, else the
    symmetric |row-col| < window band; small block sizes force actual
    grid-level tile skips on BOTH sides of the band."""
    q, k, v = _qkv(1, 2, seq, seq, 64, dtype, seed=15)
    got = flash_attention(q, k, v, causal=causal, window=window,
                          block_q=128, block_k=128, impl="pallas")
    want = _reference(q, k, v, causal, 64 ** -0.5, window)
    _assert_close(got, want, dtype)


def test_window_wider_than_seq_is_full_attention():
    q, k, v = _qkv(1, 2, 128, 128, 64, jnp.float32, seed=16)
    banded = flash_attention(q, k, v, window=1000, impl="pallas")
    full = flash_attention(q, k, v, impl="pallas")
    _assert_close(banded, full, jnp.float32)


def test_window_grads_match_oracle():
    """VJP re-applies the band mask in the tile-recomputed P."""
    q, k, v = _qkv(1, 2, 256, 256, 64, jnp.float32, seed=17)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)
        return f

    flash = loss(lambda q, k, v: flash_attention(
        q, k, v, causal=True, window=64, block_q=128, block_k=128,
        impl="pallas"))
    ref = loss(lambda q, k, v: _reference(q, k, v, True, 64 ** -0.5, 64))
    g_flash = jax.grad(flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        _assert_close(gf, gr, jnp.float32, scale=10.0)


@pytest.mark.parametrize("causal,kv_heads", [(True, 2), (False, 2),
                                             (True, 1)])
def test_window_banded_backward_matches_oracle(causal, kv_heads):
    """Long-S windowed VJP: with seq >> block_k + window the backward
    scan slices each kv tile's live q-row band (banded_bwd engages —
    seq=512, window=64, block_k=128 puts the 256-row band well under
    S), so windowed training is O(S·W) end to end. Gradients must stay
    exact vs the materialized oracle, including GQA accumulation."""
    q, _, _ = _qkv(1, 2, 512, 512, 64, jnp.float32, seed=23)
    _, k, v = _qkv(1, kv_heads, 512, 512, 64, jnp.float32, seed=24)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)
        return f

    flash = loss(lambda q, k, v: flash_attention(
        q, k, v, causal=causal, window=64, block_q=128, block_k=128,
        impl="pallas"))
    ref = loss(lambda q, k, v: _reference(q, k, v, causal, 64 ** -0.5, 64))
    g_flash = jax.grad(flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    assert g_flash[1].shape == k.shape and g_flash[2].shape == v.shape
    for gf, gr in zip(g_flash, g_ref):
        _assert_close(gf, gr, jnp.float32, scale=10.0)


def test_gqa_window_compose():
    """GQA and the sliding window together (the serving shape: MQA
    KV-cache + bounded look-back)."""
    q, _, _ = _qkv(1, 4, 256, 256, 64, jnp.bfloat16, seed=18)
    _, k, v = _qkv(1, 1, 256, 256, 64, jnp.bfloat16, seed=19)
    got = flash_attention(q, k, v, causal=True, window=96,
                          block_q=128, block_k=128, impl="pallas")
    want = _reference(q, k, v, True, 64 ** -0.5, 96)
    _assert_close(got, want, jnp.bfloat16)


def test_mha_gqa_window_parity():
    """MHA(num_kv_heads, window): flash and materialized paths agree
    with identical params; GQA shrinks the k/v projection params."""
    from tensor_stream_tpu.models.video_vit import MHA

    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (2, 160, 128), jnp.float32)
    kw = dict(num_heads=4, num_kv_heads=2, window=48, causal=True,
              compute_dtype=jnp.float32)
    plain = MHA(**kw)
    flash = MHA(use_flash=True, flash_impl="pallas", **kw)
    params = plain.init(rng, x)
    # GQA halves the key/value projection heads.
    assert params["params"]["key"]["kernel"].shape == (128, 2, 32)
    assert params["params"]["query"]["kernel"].shape == (128, 4, 32)
    out_p = plain.apply(params, x)
    out_f = flash.apply(params, x)
    _assert_close(out_f, out_p, jnp.float32, scale=4.0)


# ------------------------------------------------------------ backward

@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("causal", [False, True])
def test_grads_match_oracle(dtype, causal):
    q, k, v = _qkv(1, 2, 256, 256, 64, dtype, seed=7)
    t = jnp.asarray(np.random.default_rng(8).standard_normal(
        (1, 2, 256, 64)), dtype)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=causal, impl="pallas")
        return jnp.sum((o.astype(jnp.float32) - t.astype(jnp.float32)) ** 2)

    def loss_ref(q, k, v):
        o = _reference(q, k, v, causal, 64 ** -0.5)
        return jnp.sum((o.astype(jnp.float32) - t.astype(jnp.float32)) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        assert gf.dtype == dtype
        # Gradients accumulate one more matmul chain than the forward.
        _assert_close(gf, gr, dtype, scale=10.0)


def test_grads_cross_attention_ragged():
    """VJP over the pad-and-slice path: ragged kv, kv != q."""
    q, k, v = _qkv(1, 1, 100, 300, 64, jnp.float32, seed=9)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)
        return f

    flash = loss(lambda q, k, v: flash_attention(q, k, v, impl="pallas"))
    ref = loss(lambda q, k, v: _reference(q, k, v, False, 64 ** -0.5))
    g_flash = jax.grad(flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        _assert_close(gf, gr, jnp.float32, scale=10.0)


# ----------------------------------------------------- model integration

def test_videovit_use_flash_train_step():
    """One real VideoViT train step with use_flash=True (kernel forced
    through interpret mode on CPU / Mosaic on TPU) tracks the
    materialized-attention twin: same loss, params move together."""
    import optax
    from tensor_stream_tpu.models.video_vit import VideoViT

    rng = jax.random.PRNGKey(0)
    clips = jax.random.normal(rng, (2, 4, 32, 32, 3), jnp.float32)
    kw = dict(num_classes=2, depth=1, dim=64, num_heads=2, patch=16,
              tubelet_t=2, compute_dtype=jnp.float32)
    flash = VideoViT(use_flash=True, flash_impl="pallas", **kw)
    plain = VideoViT(use_flash=False, **kw)
    params = plain.init(rng, clips)

    def step(model, params):
        def loss_fn(p):
            logits = model.apply(p, clips)
            return -jax.nn.log_softmax(logits)[:, 0].mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        tx = optax.sgd(1e-2)
        updates, _ = tx.update(grads, tx.init(params))
        return loss, optax.apply_updates(params, updates)

    loss_f, params_f = step(flash, params)
    loss_p, params_p = step(plain, params)
    # On the chip both paths carry the DEFAULT-precision matmul envelope
    # with different rounding points (see _tol).
    tol = 2e-3 if ON_TPU else 1e-4
    np.testing.assert_allclose(float(loss_f), float(loss_p),
                               atol=tol, rtol=tol)
    flat_f = jax.tree_util.tree_leaves(params_f)
    flat_p = jax.tree_util.tree_leaves(params_p)
    for a, b in zip(flat_f, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=4 * tol, rtol=5e-3)


def test_mha_flash_parity_bf16():
    """MHA(use_flash=True) == MHA(use_flash=False) with the production
    bf16 compute dtype and identical params."""
    from tensor_stream_tpu.models.video_vit import MHA

    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 3, 160, 64), jnp.float32)
    plain = MHA(num_heads=2, compute_dtype=jnp.bfloat16)
    flash = MHA(num_heads=2, compute_dtype=jnp.bfloat16, use_flash=True,
                flash_impl="pallas")
    params = plain.init(rng, x)
    out_p = plain.apply(params, x)
    out_f = flash.apply(params, x)
    assert out_f.dtype == out_p.dtype and out_f.shape == out_p.shape
    _assert_close(out_f, out_p, jnp.bfloat16, scale=4.0)


# ------------------------------------------------------------- surface

def test_auto_falls_back_off_tpu():
    """impl='auto' must not run interpret mode off-TPU (orders of
    magnitude slower) — it routes to the materialized path there and to
    the kernel only on TPU hardware."""
    q, k, v = _qkv(1, 1, 128, 128, 64, jnp.float32, seed=10)
    auto = flash_attention(q, k, v)
    oracle = _reference(q, k, v, False, 64 ** -0.5)
    if ON_TPU:
        _assert_close(auto, oracle, jnp.float32)
    else:
        # Bitwise: off-TPU "auto" IS the materialized path.
        assert np.array_equal(np.asarray(auto), np.asarray(oracle))


def test_bad_shapes_raise():
    q = jnp.zeros((1, 2, 128, 64))
    with pytest.raises(ValueError, match="bad attention shapes"):
        flash_attention(q, jnp.zeros((2, 2, 128, 64)),
                        jnp.zeros((2, 2, 128, 64)))
    with pytest.raises(ValueError, match="multiple of kv"):
        flash_attention(q, jnp.zeros((1, 3, 128, 64)),
                        jnp.zeros((1, 3, 128, 64)))
    with pytest.raises(ValueError, match="equal q/kv lengths"):
        flash_attention(q, jnp.zeros((1, 2, 256, 64)),
                        jnp.zeros((1, 2, 256, 64)), causal=True)
    with pytest.raises(ValueError, match="equal q/kv lengths"):
        flash_attention(q, jnp.zeros((1, 2, 256, 64)),
                        jnp.zeros((1, 2, 256, 64)), window=32)
    with pytest.raises(ValueError, match="window must be"):
        flash_attention(q, q, q, window=0)
    with pytest.raises(ValueError, match="unknown impl"):
        flash_attention(q, q, q, impl="cuda")
    with pytest.raises(ValueError, match="multiples of 128"):
        flash_attention(q, q, q, block_q=96, impl="pallas")


def test_mha_ring_rejects_gqa():
    """Ring attention shards the token axis; it does not compose with
    GQA (documented constraint, explicit error). The window band DOES
    compose — masked by global position per ring block
    (tests/test_ring_attention.py::test_ring_window_matches_full)."""
    from tensor_stream_tpu.models.video_vit import MHA
    x = jnp.zeros((2, 128, 64))
    m = MHA(num_heads=2, ring_axis="sp", num_kv_heads=1)
    with pytest.raises(ValueError, match="ring attention"):
        m.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="must divide"):
        MHA(num_heads=2, num_kv_heads=3).init(jax.random.PRNGKey(0), x)

"""Weight-only int8 quantization: roundtrip error bounds, footprint,
logit agreement on VideoViT, and the quantized serving-export path."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tensor_stream_tpu.models.quantize import (dequantize_weights,
                                               quantization_error,
                                               quantized_bytes,
                                               quantize_weights)
from tensor_stream_tpu.models.video_vit import VideoViT, init_vit

CLIP = (4, 4, 32, 32, 3)


def vit_and_params(dim=64):
    model = VideoViT(num_classes=10, depth=2, dim=dim, num_heads=2,
                     patch=8, tubelet_t=2, compute_dtype=jnp.float32)
    params = init_vit(jax.random.PRNGKey(0), model, CLIP)
    return model, params


def test_roundtrip_error_bounded():
    """Per-channel int8: every quantized kernel reconstructs within
    1% relative L2 (127 levels over each channel's max-abs; the
    qkv kernels share scales across heads, the loosest case)."""
    _, params = vit_and_params()
    qtree = quantize_weights(params)
    err = quantization_error(params, qtree)
    assert 0 < err < 1e-2, err
    deq = dequantize_weights(qtree)
    # Unquantized leaves (biases, LN, pos embeds) pass through exactly.
    b = params["params"]["block0"]["mlp"]["fc1"]["bias"]
    db = deq["params"]["block0"]["mlp"]["fc1"]["bias"]
    np.testing.assert_array_equal(np.asarray(b), np.asarray(db))


def test_footprint_shrinks():
    """Kernels dominate the footprint: int8 storage must cut total
    parameter bytes by >2.5x vs f32."""
    _, params = vit_and_params(dim=128)
    qtree = quantize_weights(params)
    before = quantized_bytes(params)
    after = quantized_bytes(qtree)
    assert after < before / 2.5, (before, after)
    # The kernels really are int8 on the wire.
    k = qtree["params"]["block0"]["mlp"]["fc1"]["kernel"]
    assert k["q"].dtype == jnp.int8 and k["scale"].dtype == jnp.float32


def test_logit_agreement_on_vit():
    """Quantized serving forward: top-1 agreement with the f32 model on
    random clips, small relative logit error."""
    model, params = vit_and_params()
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    want = np.asarray(jax.jit(model.apply)(params, clips))

    qtree = quantize_weights(params)

    @jax.jit
    def serve(clips):
        return model.apply(dequantize_weights(qtree), clips)

    got = np.asarray(serve(clips))
    assert (got.argmax(-1) == want.argmax(-1)).all()
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    assert rel < 0.05, rel


def test_quantized_export_roundtrip(tmp_path):
    """The quantized forward exports/reloads (int8 weights baked into
    the serving artifact) and matches in-process execution."""
    from tensor_stream_tpu.export import export_inference, load_inference
    model, params = vit_and_params()
    qtree = quantize_weights(params)

    def serve(clips):
        return model.apply(dequantize_weights(qtree), clips)

    clips = jax.random.uniform(jax.random.PRNGKey(2), CLIP)
    path = str(tmp_path / "q.shlo")
    export_inference(serve, (clips,), path)
    reloaded = load_inference(path)
    np.testing.assert_array_equal(np.asarray(reloaded(clips)),
                                  np.asarray(jax.jit(serve)(clips)))


def test_quantized_streaming_kv_cache_serves():
    """Composition: int8 weight-only quantization + the causal
    streaming KV-cache path — dequantize inside the jitted step, per-
    step argmax matches the f32 streaming model."""
    from functools import partial

    from tensor_stream_tpu.models.streaming import (init_stream_cache,
                                                    stream_step)
    from tensor_stream_tpu.models.video_vit import VideoViT, init_vit

    B, T, HW, TUB = 2, 8, 32, 2
    model = VideoViT(num_classes=3, depth=2, dim=32, num_heads=2,
                     patch=8, tubelet_t=TUB, compute_dtype=jnp.float32,
                     causal=True)
    params = init_vit(jax.random.PRNGKey(0), model, (B, T, HW, HW, 3))
    qtree = quantize_weights(params)

    def qstep(cache, frames):
        return stream_step(model, dequantize_weights(qtree), cache,
                           frames)

    clips = jax.random.uniform(jax.random.PRNGKey(1), (B, T, HW, HW, 3))
    steps = T // TUB
    c_f32 = init_stream_cache(model, params, batch=B, max_steps=steps)
    c_int8 = init_stream_cache(model, params, batch=B, max_steps=steps)
    f32_step = jax.jit(partial(stream_step, model, params))
    int8_step = jax.jit(qstep)
    for t in range(steps):
        frames = clips[:, t * TUB:(t + 1) * TUB]
        c_f32, want = f32_step(c_f32, frames)
        c_int8, got = int8_step(c_int8, frames)
        got, want = np.asarray(got), np.asarray(want)
        assert (got.argmax(-1) == want.argmax(-1)).all(), t
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
        assert rel < 0.08, (t, rel)

"""StreamInferencer: demux correctness, async double-buffering liveness,
stats counters, and service through a jax.export artifact."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor_stream_tpu import FourCC, FrameLoader, Planes
from tensor_stream_tpu.serving import StreamInferencer

from conftest import BUNNY

needs_fixture = pytest.mark.skipif(not os.path.exists(BUNNY),
                                   reason="reference fixtures absent")

KW = dict(width=64, height=48, pixel_format=FourCC.RGB24,
          planes_pos=Planes.MERGED, host_resize=True)


@needs_fixture
def test_identity_demux_matches_single_loader():
    """infer_fn=identity over two copies of the same stream: each
    stream's results carry its own consecutive frame clock, and the
    bytes equal a standalone FrameLoader reading the same file."""
    ref = FrameLoader(BUNNY, batch=3, **KW)
    want = {}
    for _ in range(2):
        tensors, idx = next(ref)
        for k, i in enumerate(idx):
            want[i] = np.asarray(tensors[k])
    ref.close()

    with StreamInferencer([BUNNY, BUNNY], lambda x: x, per_stream=3,
                          **KW) as eng:
        results = list(eng.stream(max_batches=2))
    # 2 batches x 2 streams, stream order inside each batch.
    assert [r.stream for r in results] == [0, 1, 0, 1]
    for r in results:
        assert len(r.frames) == 3
        for k, i in enumerate(r.frames):
            np.testing.assert_array_equal(np.asarray(r.outputs[k]),
                                          want[i],
                                          err_msg=f"stream {r.stream} "
                                                  f"frame {i}")
    # Each stream saw the same consecutive clock.
    s0 = [i for r in results if r.stream == 0 for i in r.frames]
    s1 = [i for r in results if r.stream == 1 for i in r.frames]
    assert s0 == s1 == sorted(s0)


@needs_fixture
def test_model_outputs_and_stats():
    """A jitted reduction model: output rows bind to the right frames,
    stats track batches/frames/latency/fps."""
    @jax.jit
    def brightness(batch):  # [B, H, W, 3] -> [B]
        return batch.astype(jnp.float32).mean(axis=(1, 2, 3))

    with StreamInferencer([BUNNY, BUNNY], brightness, per_stream=2,
                          **KW) as eng:
        results = list(eng.stream(max_batches=3))
        stats = eng.stats()
    assert stats["batches"] == 3
    assert stats["frames"] == {0: 6, 1: 6}
    assert stats["total_frames"] == 12
    assert stats["latency_ms"]["p50"] is not None
    assert stats["latency_ms"]["p50"] >= 0
    assert stats["fps"] > 0
    # Same file on both streams: identical brightness trajectories.
    b0 = np.concatenate([np.asarray(r.outputs) for r in results
                         if r.stream == 0])
    b1 = np.concatenate([np.asarray(r.outputs) for r in results
                         if r.stream == 1])
    np.testing.assert_array_equal(b0, b1)
    assert np.isfinite(b0).all() and b0.std() >= 0


@needs_fixture
def test_serving_from_exported_artifact(tmp_path):
    """The engine serves a jax.export artifact reloaded without model
    code — the full production path (batch-polymorphic export)."""
    from tensor_stream_tpu.export import export_inference, load_inference

    @jax.jit
    def model(batch):
        return batch.astype(jnp.float32).mean(axis=(1, 2, 3))

    path = str(tmp_path / "m.shlo")
    export_inference(model, (jnp.zeros((4, 48, 64, 3), jnp.uint8),),
                     path, batch_poly=True)
    serve = load_inference(path)

    with StreamInferencer([BUNNY, BUNNY], serve, per_stream=2,
                          **KW) as eng:
        results = list(eng.stream(max_batches=2))
    assert len(results) == 4
    with StreamInferencer([BUNNY, BUNNY], model, per_stream=2,
                          **KW) as eng:
        direct = list(eng.stream(max_batches=2))
    for a, b in zip(results, direct):
        assert a.stream == b.stream and a.frames == b.frames
        np.testing.assert_array_equal(np.asarray(a.outputs),
                                      np.asarray(b.outputs))


@needs_fixture
@pytest.mark.parametrize("pipeline", ["pooled", "fused"])
def test_pooled_and_fused_match_per_stream(pipeline):
    """pipeline='pooled'/'fused' serve the same outputs bound to the
    same frame clocks as the default per-stream engine — fused runs the
    model INSIDE the loader's single VPP dispatch."""
    def brightness(batch):
        return batch.astype(jnp.float32).mean(axis=(1, 2, 3))

    def collect(**kw):
        with StreamInferencer([BUNNY, BUNNY], brightness, per_stream=3,
                              **KW, **kw) as eng:
            return [(r.stream, list(r.frames),
                     np.asarray(jax.block_until_ready(r.outputs)))
                    for r in eng.stream(max_batches=3)]

    want = collect()
    got = collect(pipeline=pipeline)
    assert [(s, f) for s, f, _ in got] == [(s, f) for s, f, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


@needs_fixture
@pytest.mark.parametrize("pipeline", ["per-stream", "fused"])
def test_inflight_depth_preserves_results(pipeline):
    """stream(inflight=3) pipelines three ticks deep but yields the
    same (stream, frames, outputs) sequence as the default
    double-buffered depth, including the final-drain tail."""
    def brightness(batch):
        return batch.astype(jnp.float32).mean(axis=(1, 2, 3))

    def collect(inflight):
        with StreamInferencer([BUNNY, BUNNY], brightness, per_stream=3,
                              pipeline=pipeline, **KW) as eng:
            return [(r.stream, list(r.frames),
                     np.asarray(jax.block_until_ready(r.outputs)))
                    for r in eng.stream(max_batches=4, inflight=inflight)]

    want = collect(1)
    got = collect(3)
    assert [(s, f) for s, f, _ in got] == [(s, f) for s, f, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


@needs_fixture
def test_inflight_validated():
    with StreamInferencer([BUNNY], lambda x: x, **KW) as eng:
        with pytest.raises(ValueError, match="inflight"):
            list(eng.stream(inflight=0))


def test_pipeline_arg_validated():
    with pytest.raises(ValueError, match="pipeline"):
        StreamInferencer([BUNNY], lambda x: x, pipeline="sharded")
    with pytest.raises(ValueError, match="stateless"):
        StreamInferencer([BUNNY], lambda c, x: (c, x), pipeline="fused",
                         carry=jnp.zeros((1,)), **KW)


@needs_fixture
def test_run_callback_and_exhaustion():
    """run() drives to stream exhaustion cleanly when the file ends."""
    seen = []
    with StreamInferencer([BUNNY], lambda x: x, per_stream=16,
                          **KW) as eng:
        eng.run(lambda r: seen.append(r.stream), max_batches=10_000)
    assert seen and set(seen) == {0}


@needs_fixture
def test_stateful_temporal_serving_matches_independent_streams():
    """The streaming KV-cache VideoViT behind StreamInferencer: two
    streams share one batched cache (stream axis = cache batch axis);
    each stream's per-step logits equal an independent single-stream
    stream_step run over the same frames. Matmul precision pinned to
    highest: the parity here is between two groupings of the SAME f32
    math, and the TPU's default bf16-pass matmuls make batch=2 vs
    batch=1 runs drift ~2e-3 (same pin as test_streaming)."""
    from functools import partial

    import jax.numpy as jnp

    from tensor_stream_tpu.models.streaming import (init_stream_cache,
                                                    stream_step)
    from tensor_stream_tpu.models.video_vit import VideoViT, init_vit

    TUB, SIZE, STEPS = 2, 32, 3
    model = VideoViT(num_classes=3, depth=2, dim=32, num_heads=2,
                     patch=8, tubelet_t=TUB, compute_dtype=jnp.float32,
                     causal=True)
    with jax.default_matmul_precision("highest"):
        params = init_vit(jax.random.PRNGKey(0), model,
                          (2, TUB, SIZE, SIZE, 3))

        skw = dict(width=SIZE, height=SIZE, pixel_format=FourCC.RGB24,
                   planes_pos=Planes.MERGED, host_resize=True,
                   normalization=True)

        # Stateful engines hand infer_fn [n_streams, per_stream, ...]
        # directly — stream_step consumes it with no reshape.
        infer = jax.jit(partial(stream_step, model, params))

        cache = init_stream_cache(model, params, batch=2,
                                  max_steps=STEPS)
        with StreamInferencer([BUNNY, BUNNY], infer, per_stream=TUB,
                              carry=cache, **skw) as eng:
            results = list(eng.stream(max_batches=STEPS))
        assert [r.stream for r in results] == [0, 1] * STEPS
        assert all(r.outputs.shape == (1, 3) for r in results)
        assert all(len(r.frames) == TUB for r in results)

        # Independent single-stream run over the same decoded frames.
        cache1 = init_stream_cache(model, params, batch=1,
                                   max_steps=STEPS)
        step1 = jax.jit(partial(stream_step, model, params))
        loader = FrameLoader(BUNNY, batch=TUB, **skw)
        try:
            for t in range(STEPS):
                tensors, idx = next(loader)
                cache1, want = step1(cache1, tensors[None])
                for r in results:
                    if r.frames == idx:
                        np.testing.assert_allclose(
                            np.asarray(r.outputs[0]),
                            np.asarray(want[0]),
                            rtol=1e-5, atol=1e-6,
                            err_msg=f"stream {r.stream} step {t}")
        finally:
            loader.close()


@needs_fixture
def test_on_end_drop_keeps_serving_survivors():
    """Streams of different lengths with on_end='drop': when the short
    stream ends it is evicted (loader closed, stats frozen) and the
    long stream keeps serving to ITS end — total frames per stream
    equal each file's full length."""
    import os
    bbb = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "bbb_720x480_RGB24_250.h264")
    if not os.path.exists(bbb):
        pytest.skip("local fixture absent")
    kw = dict(width=32, height=32, pixel_format=FourCC.RGB24,
              planes_pos=Planes.MERGED, host_resize=True)
    with StreamInferencer([BUNNY, bbb], lambda x: x, per_stream=5,
                          on_end="drop", **kw) as eng:
        results = list(eng.stream())
        stats = eng.stats()
    # bunny.mp4 has 241 frames, the bbb fixture 250 — every frame of
    # BOTH streams was served despite the early bunny exhaustion.
    assert stats["frames"] == {0: 241, 1: 250}
    # bunny: 49 ticks (48 full + 1 partial), bbb: 50 — the final tick
    # served the survivor alone.
    assert results[-1].stream == 1
    n0 = sum(1 for r in results if r.stream == 0)
    n1 = sum(1 for r in results if r.stream == 1)
    assert (n0, n1) == (49, 50)


@needs_fixture
def test_on_end_drop_evicts_carry_rows():
    """Stateful drop mode: the carry's stream row is sliced out when
    its stream dies, so batch rows and carry rows stay aligned."""
    import os
    bbb = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "bbb_720x480_RGB24_250.h264")
    if not os.path.exists(bbb):
        pytest.skip("local fixture absent")

    def infer(carry, batch):
        # Per-stream-row outputs: one row per carry row. Uses the carry
        # so a batch/carry row mismatch would throw a shape error.
        return carry + 1.0, carry[:, None]

    kw = dict(width=32, height=32, pixel_format=FourCC.RGB24,
              planes_pos=Planes.MERGED, host_resize=True)
    carry0 = jnp.zeros((2,), jnp.float32)
    with StreamInferencer([BUNNY, bbb], infer, per_stream=5,
                          on_end="drop", carry=carry0, **kw) as eng:
        results = list(eng.stream())
        final = np.asarray(eng.carry)
    # Every stream evicted by exhaustion: the carry ends empty.
    assert final.shape == (0,)
    # The survivor's final tick ran with a 1-row carry that had kept
    # counting: output = pre-increment carry = tick index - 1 = 49.
    last = results[-1]
    assert last.stream == 1
    assert np.asarray(last.outputs).shape == (1, 1)
    assert float(np.asarray(last.outputs)[0, 0]) == 49.0
    assert {r.stream for r in results} == {0, 1}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@needs_fixture
def test_multichip_serving_via_sharded_loader():
    """Multi-chip serving: StreamInferencer over a ShardedStreamLoader —
    each stream's frames live on their own chip, one pjit'd model call
    services the global dp-sharded batch, per-stream demux matches the
    single-device engine byte-for-byte."""
    from tensor_stream_tpu import ShardedStreamLoader

    @jax.jit
    def model(batch):
        return batch.astype(jnp.float32).mean(axis=(1, 2, 3))

    urls = [BUNNY] * 4
    sharded = ShardedStreamLoader(urls, per_stream=2, **KW)
    with StreamInferencer(urls, model, per_stream=2,
                          loader=sharded) as eng:
        got = list(eng.stream(max_batches=2))
    with StreamInferencer(urls, model, per_stream=2, **KW) as eng:
        want = list(eng.stream(max_batches=2))
    assert [(r.stream, r.frames) for r in got] == \
           [(r.stream, r.frames) for r in want]
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a.outputs),
                                      np.asarray(b.outputs))
    # The sharded batch really was distributed: each stream's shard
    # lives on its own device.
    with ShardedStreamLoader(urls, per_stream=2, **KW) as ld:
        batch, _ = next(iter(ld))
        assert len(batch.sharding.device_set) == 4

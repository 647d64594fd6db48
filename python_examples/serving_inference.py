"""Many-camera serving: exported model artifact + StreamInferencer.

The production inference shape on TPU: N streams (files here; rtmp://
or rtsp:// URLs work the same) decode through one loader into a single
batched device dispatch per tick, one model call services every
stream, results demux back per stream. The model is a StableHLO
artifact (jax.export) — the serving process needs no model code, and
the same artifact carries both tpu and cpu lowerings.

    # 1) export once (e.g. after training):
    python serving_inference.py --export model.shlo
    # 2) serve it over streams:
    python serving_inference.py -i cam0.mp4 cam1.mp4 --model model.shlo
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from tensor_stream_tpu import FourCC, Planes, StreamInferencer
from tensor_stream_tpu.export import export_inference, load_inference

SIZE = 112


def build_demo_model():
    """Stand-in classifier: VideoViT-free per-frame scorer (random
    weights) — swap in your trained forward with baked params."""
    from functools import partial

    from tensor_stream_tpu.models import VideoViT, init_vit
    from tensor_stream_tpu.models.quantize import (dequantize_weights,
                                                   quantize_weights)
    model = VideoViT(num_classes=4, depth=2, dim=64, num_heads=2,
                     patch=16, tubelet_t=1)
    params = init_vit(jax.random.PRNGKey(0), model,
                      (1, 1, SIZE, SIZE, 3))
    qtree = quantize_weights(params)   # int8 weights in the artifact

    def forward(frames):               # [B, H, W, 3] -> [B, classes]
        clips = frames[:, None].astype(jnp.float32)   # T=1 clips
        return model.apply(dequantize_weights(qtree), clips)

    return forward


def serve_temporal(args):
    """Stateful serving: all streams share ONE batched KV cache whose
    batch axis is the stream axis; each tick advances every stream by
    one tubelet with O(T) attention against the cache."""
    from functools import partial

    from tensor_stream_tpu.models.streaming import (init_stream_cache,
                                                    stream_step)
    from tensor_stream_tpu.models import VideoViT, init_vit

    TUB = args.per_stream       # one tick = one tubelet per stream
    n = len(args.input)
    model = VideoViT(num_classes=4, depth=2, dim=64, num_heads=2,
                     patch=16, tubelet_t=TUB, causal=True)
    params = init_vit(jax.random.PRNGKey(0), model,
                      (n, TUB, SIZE, SIZE, 3))
    cache = init_stream_cache(model, params, batch=n, max_steps=256)
    eng = StreamInferencer(args.input,
                           jax.jit(partial(stream_step, model, params)),
                           per_stream=TUB, carry=cache,
                           width=SIZE, height=SIZE, host_resize=True,
                           pixel_format=FourCC.RGB24,
                           planes_pos=Planes.MERGED, normalization=True,
                           loop=n > 1)
    try:
        for r in eng.stream(max_batches=args.batches):
            top = int(jnp.argmax(r.outputs[0]))
            print(f"stream {r.stream} t={r.frames[0]//TUB}: class {top}")
    finally:
        stats = eng.stats()
        eng.close()
    print(f"temporal served {stats['total_frames']} frames "
          f"({stats['batches']} ticks, {stats['fps']:.0f} fps)")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-i", "--input", nargs="+", default=[])
    ap.add_argument("--model", default=None,
                    help="StableHLO artifact from --export (default: "
                         "build the demo model in-process)")
    ap.add_argument("--export", default=None,
                    help="write the demo model artifact and exit")
    ap.add_argument("--per-stream", type=int, default=4)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--temporal", action="store_true",
                    help="serve a CAUSAL VideoViT with a sliding-ring "
                         "temporal KV cache: one batched cache row per "
                         "stream, per-step logits with temporal context "
                         "(random weights — swap in trained params)")
    args = ap.parse_args()

    if args.temporal:
        if not args.input:
            ap.error("need -i streams")
        serve_temporal(args)
        return

    if args.export:
        export_inference(build_demo_model(),
                         (jnp.zeros((1, SIZE, SIZE, 3), jnp.uint8),),
                         args.export, batch_poly=True)
        print(f"exported {args.export} "
              f"({os.path.getsize(args.export)} bytes, batch-polymorphic, "
              f"platforms cpu+tpu)")
        return
    if not args.input:
        ap.error("need -i streams (or --export)")

    infer = (load_inference(args.model) if args.model
             else jax.jit(build_demo_model()))
    eng = StreamInferencer(args.input, infer, per_stream=args.per_stream,
                           width=SIZE, height=SIZE, host_resize=True,
                           pixel_format=FourCC.RGB24,
                           planes_pos=Planes.MERGED,
                           loop=len(args.input) > 1)
    try:
        for r in eng.stream(max_batches=args.batches):
            top = jnp.argmax(r.outputs, axis=-1)
            print(f"stream {r.stream} frames {r.frames[0]}..{r.frames[-1]}"
                  f" -> classes {top.tolist()}")
    finally:
        stats = eng.stats()
        eng.close()
    p50 = stats["latency_ms"]["p50"]
    print(f"served {stats['total_frames']} frames in {stats['batches']} "
          f"batches: {stats['fps']:.0f} fps"
          + (f", result-wait p50 {p50:.2f} ms" if p50 is not None else ""))


if __name__ == "__main__":
    main()

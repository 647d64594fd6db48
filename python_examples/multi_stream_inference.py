"""Many streams -> ONE batched TPU inference dispatch.

The TPU transpose of the reference's different_streams.py (one instance
per GPU): N streams stack into the batch dimension of a single
fast-neural-style TransformerNet forward per step, which is where the
MXU wants its work. With a multi-chip mesh, shard the batch over 'dp'
(see tensor_stream_tpu.parallel).

    python multi_stream_inference.py -i a.mp4 b.mp4 -n 8 --size 256
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tensor_stream_tpu import (FourCC, MultiStreamLoader, Planes,  # noqa: E402
                               ResizeType)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--inputs", nargs="+", required=True)
    p.add_argument("-n", "--batches", type=int, default=8)
    p.add_argument("--per-stream", type=int, default=4)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()

    import jax
    from tensor_stream_tpu.models import TransformerNet, init_params

    model = TransformerNet()
    params = init_params(jax.random.PRNGKey(0), args.size, args.size)
    forward = jax.jit(lambda x: model.apply(params, x))

    with MultiStreamLoader(args.inputs, per_stream=args.per_stream,
                           width=args.size, height=args.size,
                           resize_type=ResizeType.BILINEAR,
                           host_resize=True, loop=True,
                           pixel_format=FourCC.RGB24,
                           planes_pos=Planes.PLANAR,
                           normalization=True) as loader:
        # NHWC for the conv net; the VPP emits planar NCHW-style [N,3,H,W].
        styled = None
        t0 = time.perf_counter()
        frames = 0
        for _ in range(args.batches):
            batch, indices = next(loader)
            styled = forward(batch.transpose(0, 2, 3, 1) * 255.0)
            frames += batch.shape[0]
        jax.block_until_ready(styled)
        dt = time.perf_counter() - t0
    print(f"{len(args.inputs)} streams, {frames} frames styled in {dt:.2f}s "
          f"({frames / dt:.1f} fps) on {jax.devices()[0]}")


if __name__ == "__main__":
    main()

"""Real-time video style transfer on TPU.

TPU re-design of the reference example (reference:
python_examples/fast_neural_style/neural_style.py:67-119): frames stream
from TensorStreamConverter straight into the flax TransformerNet on the
TPU (zero host round-trip between VPP and model), and styled frames are
written out as raw RGB (pipe to ffmpeg to encode, see --output).

Without a pretrained checkpoint the net is randomly initialized — use
--train-steps to fit it to a style image first (self-contained gram-matrix
objective), or load a .msgpack checkpoint with --model.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tensor_stream_tpu import (FourCC, FrameRate, Planes,
                               TensorStreamConverter, VideoWriter)
from tensor_stream_tpu.models import TransformerNet, init_params
from tensor_stream_tpu.models.transformer_net import (gram_matrix,
                                                      style_transfer_loss)


def parse_arguments():
    parser = argparse.ArgumentParser(add_help=False,
                                     description="Real-time style transfer")
    parser.add_argument("--help", action="help")
    parser.add_argument("-m", "--model", default="",
                        help="Path to a flax .msgpack checkpoint")
    parser.add_argument("-i", "--input", required=True,
                        help="Input stream (RTMP) or local video file")
    parser.add_argument("-o", "--output", default="styled.mp4",
                        help="Output video (.mp4/.mkv/.flv encoded "
                             "in-process; .rgb writes raw RGB24; '' "
                             "skips writing)")
    parser.add_argument("--fps", type=float, default=0,
                        help="Output frame rate (default: input's)")
    parser.add_argument("-w", "--width", type=int, default=640)
    parser.add_argument("-h", "--height", type=int, default=360)
    parser.add_argument("-t", "--time", type=int, default=0,
                        help="Seconds to process (default: whole stream)")
    parser.add_argument("--train-steps", type=int, default=0,
                        help="Fit the net to the first frame's style first")
    return parser.parse_args()


def maybe_train(params, reader, args):
    if not args.train_steps:
        return params
    import optax
    model = TransformerNet()
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    frame = reader.read(name="style", pixel_format=FourCC.RGB24,
                        width=args.width, height=args.height)
    content = jnp.asarray(frame, jnp.float32)[None]
    style_grams = gram_matrix(content)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: style_transfer_loss(model.apply, p, content, style_grams)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.train_steps):
        params, opt_state, loss = step(params, opt_state)
        if i % 10 == 0:
            print(f"train step {i}: loss {float(loss):.4f}")
    return params


def main():
    args = parse_arguments()
    model = TransformerNet()
    params = init_params(jax.random.PRNGKey(0), args.height, args.width)
    if args.model:
        import flax.serialization
        with open(args.model, "rb") as f:
            params = flax.serialization.from_bytes(params, f.read())

    reader = TensorStreamConverter(args.input,
                                   framerate_mode=FrameRate.BLOCKING)
    reader.initialize(repeat_number=20)
    reader.start()
    params = maybe_train(params, reader, args)

    @jax.jit
    def stylize(params, frame):
        x = frame.astype(jnp.float32)[None]          # [1, H, W, 3] 0..255
        y = model.apply(params, x)[0]
        return jnp.clip(y, 0, 255).astype(jnp.uint8)

    out_file = writer = None
    if args.output and args.output.endswith(".rgb"):
        out_file = open(args.output, "wb")
    elif args.output:
        # In-process libavcodec encode (tensor_stream_tpu.VideoWriter) —
        # the reference piped frames to an external ffmpeg process here
        # (ffmpeg_video_writer.py); this is the read->infer->encode loop
        # with no subprocess.
        fps = args.fps or (reader.fps or 30)
        writer = VideoWriter(args.output, (args.width, args.height),
                             fps=fps)
    frames = 0
    start = time.time()
    try:
        while True:
            if args.time and time.time() - start > args.time:
                break
            frame = reader.read(name="style", pixel_format=FourCC.RGB24,
                                width=args.width, height=args.height)
            styled = stylize(params, frame)
            if out_file:
                out_file.write(np.asarray(styled).tobytes())
            elif writer:
                writer.write(styled)
            frames += 1
    except RuntimeError as err:
        print(f"Stream ended: {err}")
    finally:
        reader.stop()
        if out_file:
            out_file.close()
        if writer:
            writer.close()
    elapsed = time.time() - start
    print(f"styled {frames} frames in {elapsed:.1f}s "
          f"({frames / max(elapsed, 1e-9):.1f} fps)")
    if args.output:
        if args.output.endswith(".rgb"):
            print(f"encode with: ffmpeg -f rawvideo -pix_fmt rgb24 "
                  f"-s {args.width}x{args.height} -i {args.output} out.mp4")
        else:
            print(f"wrote {args.output}")


if __name__ == "__main__":
    main()

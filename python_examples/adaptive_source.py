"""Adaptive sources: mid-stream resolution switches + VUI colorimetry.

TPU extension with no reference counterpart: live/adaptive streams
(HLS/DASH renditions, WebRTC simulcast, a reconnect landing on a
re-configured encoder) change geometry and colorimetry mid-stream. This
example shows the two consumption styles:

  * read() — renegotiates internally; output shapes simply change at
    the switch frame. color_standard=AUTO picks the YUV matrix from the
    stream's own VUI metadata.
  * read_batch(host_resize=True) — fixed output geometry; switches are
    invisible (each ring slot is resized from its own dimensions).

    python adaptive_source.py -i switch.h264 [--batch]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from tensor_stream_tpu import (ColorStandard, FourCC, FrameRate, Planes,
                               ResizeType, TensorStreamConverter)

DEFAULT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "tests", "fixtures", "switch_320x240_480x360_24.h264")


def per_frame(reader, frames):
    """Shapes follow the source; the switch is just a new output shape."""
    last_shape, index = None, None
    for _ in range(frames):
        try:
            tensor, index = reader.read(
                name="adaptive", pixel_format=FourCC.RGB24,
                color_standard=ColorStandard.AUTO, return_index=True)
        except RuntimeError:
            break
        if tuple(tensor.shape) != last_shape:
            last_shape = tuple(tensor.shape)
            print(f"frame {index}: shape -> {last_shape}")
    print(f"last frame index: {index}")


def batched(reader, frames):
    """Fixed 224x224 batches across the switch — training-loader style."""
    import jax
    got = 0
    while got < frames:
        try:
            tensors, idx = reader.read_batch(
                8, name="adaptive", host_resize=True, width=224, height=224,
                resize_type=ResizeType.BILINEAR, pixel_format=FourCC.RGB24,
                planes_pos=Planes.PLANAR, return_index=True)
        except RuntimeError:
            break
        jax.block_until_ready(tensors)
        got += tensors.shape[0]
        print(f"batch of {tensors.shape[0]} at {tuple(tensors.shape[1:])}, "
              f"frames {idx[0]}..{idx[-1]}")
    print(f"read {got} frames at fixed geometry")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--input", default=DEFAULT)
    parser.add_argument("-n", "--number", type=int, default=24)
    parser.add_argument("--batch", action="store_true",
                        help="fixed-geometry host-resized batches instead "
                             "of shape-following reads")
    args = parser.parse_args()

    # BLOCKING for the shape-following reads (lockstep with the consumer,
    # so a short file cannot outrun the first jit compile); unpaced FAST
    # for the cursor-mode batches (the 32-slot ring covers the fixture).
    mode = FrameRate.FAST if args.batch else FrameRate.BLOCKING
    reader = TensorStreamConverter(args.input, buffer_size=32,
                                   framerate_mode=mode)
    reader.initialize(repeat_number=20)
    print(f"probe: {reader.frame_size} @ {reader.fps} fps")
    reader.start()
    if args.batch:
        batched(reader, args.number)
    else:
        per_frame(reader, args.number)
    reader.stop()


if __name__ == "__main__":
    main()

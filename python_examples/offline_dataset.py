"""Offline dataset job: segment-parallel decode -> TPU batches -> encoded
preview clip.

The reference's examples are live-serving shaped (simple.py,
many_consumers.py); the data-engineering shape on a TPU VM is the
opposite: a SEEKABLE file, every frame exactly once, as fast as the
host decodes. This example wires the round-3 surfaces together:

  * FrameLoader(segment_parallel=N): N demuxer+decoder instances over
    keyframe-split chunks, stitched bit-exactly into serial order —
    decode scales with host cores instead of stopping at libavcodec
    frame-threading (csrc/segment_reader.cpp);
  * checkpoint/resume: --resume-from continues exactly where a prior
    run stopped;
  * VideoWriter: re-encodes the first --preview-frames model inputs to
    a playable clip (in-process libavcodec, no ffmpeg binary).

    python offline_dataset.py -i video.mp4 --workers 4 \
        --preview preview.mp4
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tensor_stream_tpu import (FourCC, FrameLoader, Planes, ResizeType,
                               VideoWriter)


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("-i", "--input", required=True)
    parser.add_argument("--workers", type=int, default=max(
        2, (os.cpu_count() or 2) - 1))
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("-w", "--width", type=int, default=224)
    parser.add_argument("--height", type=int, default=224)
    parser.add_argument("--resume-from", type=int, default=1,
                        help="1-based frame index to resume at")
    parser.add_argument("--preview", default="",
                        help="Write the first --preview-frames inputs "
                             "to this mp4 (visual sanity check)")
    parser.add_argument("--preview-frames", type=int, default=50)
    args = parser.parse_args()

    loader = FrameLoader(args.input, batch=args.batch,
                         segment_parallel=args.workers, host_resize=True,
                         width=args.width, height=args.height,
                         resize_type=ResizeType.BILINEAR,
                         pixel_format=FourCC.RGB24,
                         planes_pos=Planes.PLANAR, normalization=True,
                         start_frame=args.resume_from)

    # Stand-in for a training/eval step: per-batch channel statistics.
    @jax.jit
    def step(x):  # [B, 3, H, W] f32
        return jnp.stack([x.mean(axis=(0, 2, 3)), x.std(axis=(0, 2, 3))])

    writer = None
    if args.preview:
        writer = VideoWriter(args.preview, (args.width, args.height),
                             fps=25)

    frames = 0
    start = time.time()
    ckpt = loader.checkpoint()
    stats = None
    try:
        for tensors, indices in loader:
            stats = step(tensors)
            if writer and frames < args.preview_frames:
                # planar f32 [B,3,H,W] -> u8 HWC frames
                batch = np.asarray(
                    jnp.clip(tensors * 255.0, 0, 255).astype(jnp.uint8))
                for f in batch.transpose(0, 2, 3, 1):
                    if writer.frames_written >= args.preview_frames:
                        break
                    writer.write(f)
            frames += tensors.shape[0]
            ckpt = loader.checkpoint()
        if stats is not None:  # zero batches: e.g. resuming past the end
            jax.block_until_ready(stats)
    finally:
        loader.close()
        if writer:
            writer.close()
    elapsed = time.time() - start
    print(f"processed {frames} frames in {elapsed:.1f}s "
          f"({frames / max(elapsed, 1e-9):.1f} fps, "
          f"{args.workers} decode workers)")
    print(f"resume token: --resume-from {ckpt['next_index']}")
    if args.preview:
        print(f"preview: {args.preview}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Video-model training on randomly-sampled clips (ClipLoader demo).

The reference's examples stop at per-frame inference; video models
(action recognition, video diffusion, VLM frame stacks) train on
shuffled fixed-length clips — a shape the reference cannot produce at
all (its Parser::Reset is unimplemented; streams only play forward).
This example trains a small 3D CNN on the classic self-supervised
"arrow of time" task — predict whether a clip plays forward or reversed
— so it needs no labels, just a video file:

  * ClipLoader samples shuffled bit-exact [B, T, H, W, C] clip batches
    (csrc/clip_reader.cpp seeks each clip to its IDR entry point; decode
    overlaps device compute through the loader's fill thread);
  * half of each batch is time-reversed ON DEVICE (jnp.flip under jit —
    no host copies), labels = reversal mask;
  * the model runs NTHWC with bfloat16 compute — the MXU-native layout
    and dtype — and f32 parameters/optimizer (standard mixed precision).

    python video_classifier.py -i video.mp4 --steps 20 --batch 4 \
        --clip-len 8 --size 112
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
import optax
from flax import linen as nn

from tensor_stream_tpu import (AugmentConfig, ClipDataset, ClipLoader,
                               FourCC, Planes, ResizeType)


class TimeDirectionNet(nn.Module):
    """Small 3D CNN: NTHWC clips -> forward/reversed logits.

    Convolutions compute in bfloat16 (MXU-native); parameters stay
    float32. Temporal stride only kicks in once the spatial grid has
    shrunk, keeping the early layers' frame-to-frame differences — the
    only signal the task has."""
    features: tuple = (16, 32, 64)

    @nn.compact
    def __call__(self, x):  # [B, T, H, W, C] float
        x = x.astype(jnp.bfloat16)
        for i, f in enumerate(self.features):
            t_stride = 2 if i > 0 else 1
            x = nn.Conv(f, kernel_size=(3, 3, 3),
                        strides=(t_stride, 2, 2),
                        dtype=jnp.bfloat16)(x)
            x = nn.relu(x)
        x = x.mean(axis=(1, 2, 3))  # global average over T, H, W
        return nn.Dense(2, dtype=jnp.float32)(x)


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("-i", "--input", required=True, nargs="+",
                        help="one or more seekable video files; several "
                             "train on a globally-shuffled ClipDataset")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--clip-len", type=int, default=8)
    parser.add_argument("--frame-stride", type=int, default=1)
    parser.add_argument("--size", type=int, default=112)
    parser.add_argument("--workers", type=int,
                        default=max(2, (os.cpu_count() or 2) // 2))
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--uniform-shuffle", action="store_true",
                        help="full clip permutation per epoch instead "
                             "of the default GOP-grouped segment "
                             "shuffle (slower decode, clip-level "
                             "i.i.d. order)")
    parser.add_argument("--model", choices=("cnn", "vit"), default="cnn",
                        help="cnn = small 3D CNN; vit = factorized "
                             "space-time VideoViT (bf16 MXU matmuls, "
                             "remat) — needs --size divisible by 16 and "
                             "--clip-len divisible by 2")
    parser.add_argument("--vit-dim", type=int, default=192)
    parser.add_argument("--vit-depth", type=int, default=4)
    parser.add_argument("--augment", action="store_true",
                        help="fuse RandomResizedCrop + flip + ColorJitter "
                             "into the loader's device program (one key "
                             "per clip; epochs re-draw)")
    parser.add_argument("--ckpt-dir", default=None,
                        help="checkpoint directory: saves model+optimizer "
                             "shards AND the loader's clip cursor every "
                             "--ckpt-every steps; if it already holds a "
                             "step, training resumes from it (same data "
                             "order, same optimizer state)")
    parser.add_argument("--ckpt-every", type=int, default=50)
    args = parser.parse_args()

    if args.model == "vit":
        from tensor_stream_tpu.models import VideoViT
        model = VideoViT(num_classes=2, depth=args.vit_depth,
                         dim=args.vit_dim,
                         num_heads=max(1, args.vit_dim // 64),
                         remat=True)
    else:
        model = TimeDirectionNet()
    rng = jax.random.PRNGKey(args.seed)
    dummy = jnp.zeros((args.batch, args.clip_len, args.size, args.size, 3),
                      jnp.float32)
    params = model.init(rng, dummy)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, clips, flip_mask):
        # Time-reverse the masked clips on device; labels = the mask.
        reversed_clips = jnp.flip(clips, axis=1)
        x = jnp.where(flip_mask[:, None, None, None, None], reversed_clips,
                      clips)
        labels = flip_mask.astype(jnp.int32)

        def loss_fn(p):
            logits = model.apply(p, x)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    kw = dict(clip_len=args.clip_len, batch=args.batch,
              frame_stride=args.frame_stride,
              # segment shuffle: GOP-grouped epochs decode each GOP
              # ~once (~1.5x input throughput vs the full permutation;
              # pass --uniform-shuffle for clip-level i.i.d. order).
              shuffle="uniform" if args.uniform_shuffle else "segment",
              seed=args.seed,
              workers=args.workers, host_resize=True,
              width=args.size, height=args.size,
              resize_type=ResizeType.BILINEAR, pixel_format=FourCC.RGB24,
              planes_pos=Planes.MERGED, normalization=True)
    if args.augment:
        # Decode slightly larger, then RandomResizedCrop back to --size
        # inside the same jitted program as the NV12 conversion. All
        # frames of a clip share one transform (temporal consistency —
        # required for the arrow-of-time signal); epochs fold into the
        # keys, so every epoch re-draws.
        decode = (int(args.size * 1.15) + 1) // 2 * 2
        kw.update(width=decode, height=decode,
                  augment=AugmentConfig(
                      width=args.size, height=args.size,
                      scale=(0.5, 1.0), ratio=(0.75, 4 / 3), hflip=0.5,
                      brightness=0.4, contrast=0.4, saturation=0.4,
                      hue=0.05))
    ckpt = None
    step = 0
    if args.ckpt_dir:
        from tensor_stream_tpu import TrainCheckpointer
        ckpt = TrainCheckpointer(args.ckpt_dir)
        if ckpt.latest_step() is not None:
            step, restored, cursor = ckpt.restore(
                template={"params": params, "opt": opt_state})
            params, opt_state = restored["params"], restored["opt"]
            if cursor:
                kw.update(epoch=cursor["epoch"],
                          start_clip=cursor["start_clip"])
            print(f"resumed from step {step} "
                  f"(epoch {cursor['epoch']}, clip {cursor['start_clip']})"
                  if cursor else f"resumed from step {step}")
    if len(args.input) == 1:
        loader = ClipLoader(args.input[0], **kw)
    else:  # corpus: one globally-shuffled epoch across every file
        loader = ClipDataset(args.input, **kw)
    print(f"{len(args.input)} file(s), {len(loader.starts)} clip starts, "
          f"{len(loader)} batches/epoch")

    t0 = time.perf_counter()
    try:
        while step < args.steps:
            for clips, starts in loader:
                # Flip draws keyed on the step (not a consumed stream):
                # checkpoint resume replays the identical label sequence.
                flip = jnp.asarray(np.random.default_rng(
                    args.seed * 1_000_003 + step).random(clips.shape[0])
                    < 0.5)
                params, opt_state, loss, acc = train_step(
                    params, opt_state, clips, flip)
                step += 1
                if step % 5 == 0 or step == args.steps:
                    print(f"step {step}: loss {float(loss):.4f} "
                          f"acc {float(acc):.3f}")
                if ckpt and step % args.ckpt_every == 0:
                    ckpt.save(step, {"params": params, "opt": opt_state},
                              loader_state=loader.state())
                if step >= args.steps:
                    break
            # for-loop exhaustion = epoch boundary; loop to continue into
            # the next (reshuffled) epoch.
    finally:
        eff = (step * args.batch * args.clip_len /
               max(loader.frames_decoded, 1))
        loader.close()
        if ckpt:
            ckpt.save(step, {"params": params, "opt": opt_state},
                      loader_state=loader.state(), force=True)
            ckpt.close()
    dt = time.perf_counter() - t0
    print(f"training done: {step} steps in {dt:.1f}s "
          f"({step * args.batch * args.clip_len / dt:.0f} frames/s, "
          f"sampling efficiency {eff:.2f})")


if __name__ == "__main__":
    main()

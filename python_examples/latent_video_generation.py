"""Latent video generation end-to-end: VAE + diffusion on real clips.

The generation-side showcase: clips sampled from a video file train a
causal Video-VAE; the frozen VAE's latents train a diffusion
transformer (DiT); DDIM sampling draws new latents that decode to a
playable mp4 through the in-process VideoWriter. On a toy budget this
produces texture-like output — the point is the complete wiring
(loader → VAE → latents → DiT → sampler → decoder → encoder), every
stage of which is the real production component.

    python latent_video_generation.py -i video.mp4 --size 64 \
        --vae-steps 60 --dit-steps 120 -o generated.mp4
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

from tensor_stream_tpu import ClipLoader, FourCC, Planes, ResizeType
from tensor_stream_tpu.models.latent_diffusion import (DiffusionSchedule,
                                                       VideoDiT,
                                                       ddim_sample,
                                                       make_diffusion_train_step)
from tensor_stream_tpu.models.video_vae import (VideoVAE,
                                                make_vae_train_step)
from tensor_stream_tpu.parallel import make_mesh


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-o", "--output", default="generated.mp4")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--clip-len", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--vae-steps", type=int, default=60)
    ap.add_argument("--dit-steps", type=int, default=120)
    ap.add_argument("--sample-steps", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    mesh = make_mesh(max(1, len(jax.devices())), axes=("dp", "mp"))
    loader = ClipLoader(args.input, clip_len=args.clip_len,
                        batch=args.batch, shuffle=True, seed=args.seed,
                        workers=2, host_resize=True, width=args.size,
                        height=args.size, resize_type=ResizeType.BILINEAR,
                        pixel_format=FourCC.RGB24,
                        planes_pos=Planes.MERGED, normalization=True)

    def batches():
        while True:
            for clips, _ in loader:
                yield clips

    it = batches()
    key = jax.random.PRNGKey(args.seed)

    # ---- stage 1: VAE on real clips -----------------------------------
    vae = VideoVAE(base=16, latent=4)
    first = next(it)
    vparams = vae.init(jax.random.PRNGKey(1), first, jax.random.PRNGKey(2))
    tx_v = optax.adam(1e-3)
    vshard, vstep = make_vae_train_step(mesh, vae, tx_v)
    vparams = vshard(vparams)
    vopt = tx_v.init(vparams)
    t0 = time.perf_counter()
    for i in range(args.vae_steps):
        clips = next(it)
        vparams, vopt, loss, rec, kl = vstep(
            vparams, vopt, clips, jax.random.fold_in(key, i))
        if (i + 1) % 20 == 0:
            print(f"vae {i + 1}: loss {float(loss):.4f} "
                  f"rec {float(rec):.4f} kl {float(kl):.2f}")
    print(f"vae trained in {time.perf_counter() - t0:.1f}s")

    # ---- stage 2: DiT on the frozen VAE's latents ---------------------
    encode = jax.jit(lambda c: vae.apply(vparams, c,
                                         method=VideoVAE.encode)[0])
    lat0 = encode(first)
    dit = VideoDiT(depth=4, dim=128, num_heads=2,
                   compute_dtype=jnp.bfloat16)
    sched = DiffusionSchedule(1000)
    dparams = dit.init(jax.random.PRNGKey(3), lat0,
                       jnp.zeros((lat0.shape[0],), jnp.int32))
    tx_d = optax.adam(2e-4)
    dshard, dstep = make_diffusion_train_step(mesh, dit, sched, tx_d)
    dparams = dshard(dparams)
    dopt = tx_d.init(dparams)
    t0 = time.perf_counter()
    for i in range(args.dit_steps):
        latents = encode(next(it))
        dparams, dopt, loss = dstep(dparams, dopt, latents,
                                    jax.random.fold_in(key, 10_000 + i))
        if (i + 1) % 40 == 0:
            print(f"dit {i + 1}: eps-mse {float(loss):.4f}")
    print(f"dit trained in {time.perf_counter() - t0:.1f}s")
    loader.close()

    # ---- stage 3: sample, decode, encode to mp4 -----------------------
    z = ddim_sample(dit, dparams, sched, jax.random.PRNGKey(args.seed + 7),
                    lat0.shape, n_steps=args.sample_steps)
    clips = vae.apply(vparams, z, method=VideoVAE.decode)
    clips = np.asarray(jnp.clip(clips, 0.0, 1.0) * 255).astype(np.uint8)

    from tensor_stream_tpu import VideoWriter
    with VideoWriter(args.output, (args.size, args.size), fps=8) as wr:
        for clip in clips:          # [T, H, W, 3] each
            for frame in clip:
                wr.write(frame)
    print(f"wrote {args.output}: {clips.shape[0] * clips.shape[1]} frames "
          f"({clips.shape[1]} per sampled clip)")


if __name__ == "__main__":
    main()

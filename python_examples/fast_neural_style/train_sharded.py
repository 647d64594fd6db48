"""Distributed style-transfer training straight from a video stream.

The TPU-native capstone of the fast_neural_style example (reference:
python_examples/fast_neural_style/neural_style.py trains nothing and runs
one GPU): raw NV12 batches drain from the native pipeline and the FULL
training step — sharded VPP (dp over frames x mp over frame rows) +
TransformerNet forward/backward (dp on batch, mp on conv channels) + adam
update — runs as ONE jitted SPMD program over a `jax.sharding.Mesh`; XLA
inserts the ICI collectives the shardings imply.

Runs unchanged on real multi-chip hardware or a virtual mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python train_sharded.py -i video.h264 --steps 20 --batch 8

The style target defaults to the gram matrices of the first batch's
frames (self-contained); pass --style-video to take it from another clip.
"""
import argparse
import ctypes
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def parse_arguments():
    parser = argparse.ArgumentParser(description="Sharded style training")
    parser.add_argument("-i", "--input", required=True,
                        help="Training video (any ingested codec)")
    parser.add_argument("--style-video", default="",
                        help="Clip providing the style target "
                             "(default: first batch of --input)")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--batch", type=int, default=0,
                        help="Global batch (default: 2 frames per dp shard)")
    parser.add_argument("--size", type=int, default=128,
                        help="Training resolution (square)")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--checkpoint", default="",
                        help="Write final params to this .msgpack path")
    return parser.parse_args()


class Nv12BatchReader:
    """Drains [batch, H, W] NV12 batches from the native pipeline's
    no-drop cursor (loop replay, unpaced) — the ingest half of
    FrameLoader without the device VPP, which here lives inside the
    sharded training step."""

    def __init__(self, url, batch):
        import numpy as np

        from tensor_stream_tpu import _native
        self.lib = _native.load()
        self.batch = batch
        self.p = self.lib.ts_pipeline_create()
        sts = self.lib.ts_pipeline_init_ex(
            self.p, url.encode(), 5, max(2 * batch, 8), 3, 0, 0, 1, 0)
        if sts != 0:
            raise RuntimeError(f"cannot open {url} ({sts})")
        self.lib.ts_pipeline_register_cursor(self.p, b"train")
        self.lib.ts_pipeline_start(self.p)
        self.width = self.lib.ts_pipeline_width(self.p)
        self.height = self.lib.ts_pipeline_height(self.p)
        self._ys = np.empty((batch, self.height, self.width), np.uint8)
        self._uvs = np.empty((batch, self.height // 2, self.width), np.uint8)

    def next(self):
        first = ctypes.c_int(0)
        got = self.lib.ts_pipeline_get_batch(
            self.p, b"train", self.batch, self._ys.ctypes.data,
            self._uvs.ctypes.data, ctypes.byref(first))
        if got < self.batch:
            raise RuntimeError("stream drained (loop=True should replay)")
        return self._ys, self._uvs

    def close(self):
        self.lib.ts_pipeline_stop(self.p)
        self.lib.ts_pipeline_destroy(self.p)


def main():
    args = parse_arguments()
    import jax
    import numpy as np

    from tensor_stream_tpu.enums import FourCC, Planes, ResizeType
    from tensor_stream_tpu.models.transformer_net import gram_matrix
    from tensor_stream_tpu.ops.vpp import VPPConfig, build_vpp_batched
    from tensor_stream_tpu.parallel import (build_train_step, make_mesh,
                                            make_train_state)

    mesh = make_mesh()
    dp, mp = mesh.shape["dp"], mesh.shape["mp"]
    batch = args.batch or 2 * dp
    if batch % dp:
        raise SystemExit(f"--batch {batch} must be divisible by the dp "
                         f"axis size ({dp})")
    size = args.size

    reader = Nv12BatchReader(args.input, batch)
    if reader.height % mp:
        raise SystemExit(f"frame height {reader.height} must be divisible "
                         f"by the mp axis size ({mp}) for row sharding")
    cfg = VPPConfig(src_width=reader.width, src_height=reader.height,
                    width=size, height=size,
                    resize_type=ResizeType.BILINEAR, fourcc=FourCC.RGB24,
                    planes=Planes.MERGED, normalization=True)
    print(f"mesh={dict(mesh.shape)} batch={batch} "
          f"stream={reader.width}x{reader.height} -> {size}x{size}")

    # Style target: gram matrices of a reference batch, computed once
    # with the (unsharded) batched VPP. A --style-video clip gets its own
    # VPP config: the conversion bakes the SOURCE resolution into its
    # resize tables, and the style clip need not match the input's.
    style_reader, style_cfg = reader, cfg
    if args.style_video:
        style_reader = Nv12BatchReader(args.style_video, batch)
        style_cfg = VPPConfig(src_width=style_reader.width,
                              src_height=style_reader.height,
                              width=size, height=size,
                              resize_type=ResizeType.BILINEAR,
                              fourcc=FourCC.RGB24, planes=Planes.MERGED,
                              normalization=True)
    ys, uvs = style_reader.next()
    style_rgb = build_vpp_batched(style_cfg)(ys, uvs)
    # Pull to host so jit replicates it over the mesh (the VPP above ran
    # on a single device).
    style_grams = np.asarray(gram_matrix(style_rgb).mean(axis=0,
                                                         keepdims=True))
    if args.style_video:
        style_reader.close()

    params, opt_state, tx = make_train_state(mesh, size, size, batch=batch,
                                             learning_rate=args.lr)
    step = build_train_step(mesh, tx, cfg)

    for i in range(args.steps):
        ys, uvs = reader.next()
        params, opt_state, loss = step(params, opt_state, ys, uvs,
                                       style_grams)
        loss = float(loss)
        if not np.isfinite(loss):
            raise SystemExit(f"non-finite loss at step {i}")
        print(f"step {i + 1}/{args.steps} loss={loss:.5f}")
    reader.close()

    if args.checkpoint:
        from flax import serialization
        with open(args.checkpoint, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(params)))
        print(f"wrote {args.checkpoint}")
    print("training done")


if __name__ == "__main__":
    main()

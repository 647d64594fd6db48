"""Headline benchmark: 1080p H.264 decode -> 224x224 RGB planar float32
jax.Arrays, frames/sec on one chip (BASELINE.json north star: 2000 fps).

Pipeline under test = the real production path: native producer thread
(demux + multithreaded software decode into the NV12 ring) overlapped with
batched TPU VPP dispatches (crop/resize/convert/normalize fused by XLA,
async dispatch so host decode and device compute overlap).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}
"""
import json
import os
import sys
import time

import numpy as np

VIDEO = os.environ.get(
    "TS_BENCH_VIDEO",
    "/root/reference/tests/resources/billiard_1920x1080_420_100.h264")
BATCH = int(os.environ.get("TS_BENCH_BATCH", "16"))
TARGET_SECONDS = float(os.environ.get("TS_BENCH_SECONDS", "12"))
BASELINE_FPS = 2000.0


def main():
    import jax

    from tensor_stream_tpu import FourCC, FrameRate, Planes, ResizeType
    from tensor_stream_tpu import TensorStreamConverter
    from tensor_stream_tpu.ops.vpp import VPPConfig, build_vpp_batched

    kwargs = dict(pixel_format=FourCC.RGB24, planes_pos=Planes.PLANAR,
                  width=224, height=224, resize_type=ResizeType.BILINEAR,
                  normalization=True)

    # Warm the compile cache before timing.
    reader = TensorStreamConverter(VIDEO, framerate_mode=FrameRate.BLOCKING,
                                   buffer_size=2 * BATCH)
    reader.initialize(repeat_number=3)
    w, h = reader.frame_size
    cfg = VPPConfig(src_width=w, src_height=h, width=224, height=224,
                    resize_type=ResizeType.BILINEAR, fourcc=FourCC.RGB24,
                    planes=Planes.PLANAR, normalization=True)
    vpp = build_vpp_batched(cfg)
    dummy_y = np.zeros((BATCH, h, w), np.uint8)
    dummy_uv = np.zeros((BATCH, h // 2, w), np.uint8)
    jax.block_until_ready(vpp(dummy_y, dummy_uv))
    reader.stop()

    # Single looped pipeline: the demuxer seeks back to the start on EOF,
    # the producer decodes flat-out (FAST), and the consumer drains every
    # frame through batched async device dispatches (no-drop cursor mode).
    reader = TensorStreamConverter(VIDEO, framerate_mode=FrameRate.FAST,
                                   buffer_size=4 * BATCH, loop=True)
    reader.initialize(repeat_number=3)
    reader.start()
    out = reader.read_batch(BATCH, name="bench", host_resize=True,
                            **kwargs)  # warm path
    jax.block_until_ready(out)
    frames = 0
    pending = None
    start = time.perf_counter()
    while time.perf_counter() - start < TARGET_SECONDS:
        out = reader.read_batch(BATCH, name="bench", host_resize=True,
                                **kwargs)
        pending = out  # async dispatch; don't block inside the loop
        frames += out.shape[0]
    if pending is not None:
        jax.block_until_ready(pending)
    elapsed = time.perf_counter() - start
    reader.stop()
    fps = frames / elapsed

    result = {
        "metric": "1080p_decode_to_224px_rgb_planar_f32_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()

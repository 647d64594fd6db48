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


VIDEO = os.environ.get(
    "TS_BENCH_VIDEO",
    "/root/reference/tests/resources/billiard_1920x1080_420_100.h264")
BATCH = int(os.environ.get("TS_BENCH_BATCH", "16"))
TARGET_SECONDS = float(os.environ.get("TS_BENCH_SECONDS", "12"))
BASELINE_FPS = 2000.0


def main():
    import jax

    from tensor_stream_tpu import FourCC, FrameLoader, Planes, ResizeType

    # Production input-pipeline shape: looped demux + flat-out decode in
    # the native producer thread, drain + host NV12 resize in the loader
    # thread (both GIL-free), batched convert/normalize on the TPU with
    # async dispatch — decode, transfer, and device compute all overlap.
    loader = FrameLoader(VIDEO, batch=BATCH, prefetch=3, host_resize=True,
                         loop=True, width=224, height=224,
                         resize_type=ResizeType.BILINEAR,
                         pixel_format=FourCC.RGB24, planes_pos=Planes.PLANAR,
                         normalization=True)
    out, _ = next(loader)  # warm the jit cache before timing
    jax.block_until_ready(out)
    frames = 0
    pending = None
    start = time.perf_counter()
    while time.perf_counter() - start < TARGET_SECONDS:
        out, _ = next(loader)
        pending = out  # async dispatch; don't block inside the loop
        frames += out.shape[0]
    if pending is not None:
        jax.block_until_ready(pending)
    elapsed = time.perf_counter() - start
    loader.close()
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

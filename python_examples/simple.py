"""Decode a stream and dump processed frames — the canonical example.

TPU re-design of the reference example (reference:
python_examples/simple.py:19-136): same CLI surface, jax.Array output.

    python simple.py -i bunny.mp4 -o dump -fc RGB24 -w 720 -h 480 -n 10
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tensor_stream_tpu import (FourCC, FrameRate, LogsLevel, LogsType, Planes,
                               ResizeType, TensorStreamConverter)


def parse_arguments():
    parser = argparse.ArgumentParser(
        add_help=False, description="Simple usage example")
    parser.add_argument("--help", action="help")
    parser.add_argument("-i", "--input",
                        default="rtmp://37.228.119.44:1935/vod/big_buck_bunny.mp4",
                        help="Input stream (RTMP) or local video file")
    parser.add_argument("-o", "--output", default="",
                        help="Name of output raw stream (default: no output)")
    parser.add_argument("-w", "--width", type=int, default=0,
                        help="Output width (default: input width)")
    parser.add_argument("-h", "--height", type=int, default=0,
                        help="Output height (default: input height)")
    parser.add_argument("-fc", "--fourcc", default="RGB24",
                        choices=[f.name for f in FourCC],
                        help="Decoded stream' FourCC (default: RGB24)")
    parser.add_argument("-v", "--verbose", default="NONE",
                        choices=[l.name for l in LogsLevel],
                        help="Set output level from library (default: NONE)")
    parser.add_argument("-n", "--number", type=int, default=50,
                        help="Number of frames to parse (default: 50)")
    parser.add_argument("-bs", "--buffer_size", type=int, default=10,
                        help="Size of internal buffer stores decoded frames")
    parser.add_argument("--normalize", action="store_true",
                        help="Normalize output to [0, 1]")
    parser.add_argument("--nvtx", action="store_true",
                        help="Enable tracing (host spans + jax profiler)")
    parser.add_argument("--cuda_device", type=int, default=0,
                        help="Device index (kept for API compatibility)")
    parser.add_argument("--planes", default="MERGED",
                        choices=[p.name for p in Planes],
                        help="Plane order in RGB formats (default: MERGED)")
    parser.add_argument("--resize_type", default="NEAREST",
                        choices=[r.name for r in ResizeType],
                        help="Resize algorithm (default: NEAREST)")
    parser.add_argument("--framerate_mode", default="NATIVE",
                        choices=[m.name for m in FrameRate],
                        help="Stream reading mode (default: NATIVE)")
    parser.add_argument("--skip_analyze", action="store_true",
                        help="Skip bitstream reorder/loss analyze stage")
    parser.add_argument("--timeout", type=float, default=None,
                        help="Seconds to wait for a new frame")
    parser.add_argument("--crop", default="0,0,0,0",
                        help="Crop left,top,right,bottom (default: no crop)")
    return parser.parse_args()


def main():
    args = parse_arguments()
    reader = TensorStreamConverter(args.input,
                                   cuda_device=args.cuda_device,
                                   buffer_size=args.buffer_size,
                                   framerate_mode=FrameRate[args.framerate_mode],
                                   timeout=args.timeout)
    if args.verbose != "NONE":
        reader.enable_logs(LogsLevel[args.verbose], LogsType.CONSOLE)
    if args.nvtx:
        reader.enable_nvtx()
    if args.skip_analyze:
        reader.skip_analyze()
    reader.initialize(repeat_number=20)
    reader.start()
    print(f"stream: {reader.frame_size[0]}x{reader.frame_size[1]} "
          f"@ {reader.fps} fps")

    crop = tuple(int(c) for c in args.crop.split(","))
    params = dict(name="default",
                  width=args.width, height=args.height,
                  crop_coords=crop,
                  resize_type=ResizeType[args.resize_type],
                  pixel_format=FourCC[args.fourcc],
                  planes_pos=Planes[args.planes],
                  normalization=args.normalize or None,
                  return_index=True)
    try:
        for _ in range(args.number):
            tensor, index = reader.read(**params)
            if args.output:
                reader.dump(tensor, args.output,
                            width=args.width, height=args.height,
                            crop_coords=crop,
                            pixel_format=FourCC[args.fourcc],
                            planes_pos=Planes[args.planes],
                            normalization=args.normalize or None)
    except RuntimeError as err:
        print(f"Stream ended: {err}")
    finally:
        reader.stop()
    print(f"last tensor: shape={tuple(tensor.shape)} dtype={tensor.dtype} "
          f"device={list(tensor.devices())[0]}")


if __name__ == "__main__":
    main()

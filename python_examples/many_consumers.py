"""Several consumers read the same stream with different formats/sizes —
one decode, N conversions (reference: python_examples/many_consumers.py)."""
import argparse
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tensor_stream_tpu import (FourCC, FrameRate, Planes, TensorStreamConverter)


def consumer(reader, name, pixel_format, width, height, frames):
    shapes = []
    try:
        for _ in range(frames):
            tensor = reader.read(name=name, pixel_format=pixel_format,
                                 width=width, height=height)
            shapes.append(tuple(tensor.shape))
    except RuntimeError as err:
        print(f"[{name}] stream ended: {err}")
    print(f"[{name}] read {len(shapes)} frames of {pixel_format.name} "
          f"{shapes[-1] if shapes else ()}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--input",
                        default="rtmp://37.228.119.44:1935/vod/big_buck_bunny.mp4")
    parser.add_argument("-n", "--number", type=int, default=20)
    args = parser.parse_args()

    reader = TensorStreamConverter(args.input, max_consumers=2,
                                   framerate_mode=FrameRate.BLOCKING)
    reader.initialize(repeat_number=20)
    reader.start()

    threads = [
        threading.Thread(target=consumer,
                         args=(reader, "rgb", FourCC.RGB24, 720, 480, args.number)),
        threading.Thread(target=consumer,
                         args=(reader, "gray", FourCC.Y800, 320, 240, args.number)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    reader.stop()


if __name__ == "__main__":
    main()

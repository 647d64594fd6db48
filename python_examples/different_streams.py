"""Two independent pipelines over different streams, one TPU core each —
the TPU equivalent of the reference's one-GPU-per-instance pattern
(reference: python_examples/different_streams.py:76-99)."""
import argparse
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

from tensor_stream_tpu import (FourCC, FrameRate, LogsLevel, LogsType, Planes,
                               TensorStreamConverter)


def stream_worker(url, device_index, name, pixel_format, frames, verbose):
    reader = TensorStreamConverter(url, cuda_device=device_index,
                                   framerate_mode=FrameRate.BLOCKING)
    if verbose:
        reader.enable_logs(LogsLevel.LOW, LogsType.CONSOLE)
    reader.initialize(repeat_number=20)
    reader.start()
    count = 0
    try:
        for _ in range(frames):
            tensor = reader.read(name=name, pixel_format=pixel_format,
                                 width=320, height=240)
            count += 1
    except RuntimeError as err:
        print(f"[{name}] ended: {err}")
    reader.stop()
    print(f"[{name}] {count} frames on device {device_index} "
          f"({jax.devices()[device_index]})")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i1", "--input1", required=True)
    parser.add_argument("-i2", "--input2", required=True)
    parser.add_argument("-n", "--number", type=int, default=20)
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args()

    n_dev = len(jax.devices())
    threads = [
        threading.Thread(target=stream_worker,
                         args=(args.input1, 0, "first", FourCC.RGB24,
                               args.number, args.verbose)),
        threading.Thread(target=stream_worker,
                         args=(args.input2, 1 % n_dev, "second", FourCC.BGR24,
                               args.number, args.verbose)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()


if __name__ == "__main__":
    main()

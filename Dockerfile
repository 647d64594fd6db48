# TPU-VM image for tensor-stream-tpu (reference: Dockerfile built CUDA +
# FFmpeg-with-NVDEC + torch; here the stack is FFmpeg dev libraries for
# the native ingest runtime and jax[tpu] for the device VPP).
#
#   docker build -t tensor-stream-tpu .
#   docker run --privileged --net=host tensor-stream-tpu \
#       python -m pytest tests/ -q
#
# On a Cloud TPU VM the TPU devices are exposed via /dev/accel*; run with
# --privileged (or map the accel devices) so libtpu can claim them.
FROM ubuntu:22.04

ENV DEBIAN_FRONTEND=noninteractive
RUN apt-get update && \
    apt-get -y install build-essential pkgconf git cmake ninja-build \
        libavformat-dev libavcodec-dev libavutil-dev libswscale-dev \
        libx264-dev \
        python3 python3-pip python3-dev python3-setuptools && \
    ln -sf /usr/bin/python3 /usr/bin/python && \
    apt-get clean && rm -rf /var/lib/apt/lists/*

# jax[tpu] pulls libtpu from the Google release bucket.
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir flax optax numpy pytest

WORKDIR /app
COPY . /app
RUN make -C csrc && python setup.py develop

CMD ["python", "bench.py"]

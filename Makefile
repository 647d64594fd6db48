# Top-level convenience targets (reference: Makefile drove docker
# build/run/wheel; same spirit, TPU image).
NAME ?= tensor-stream-tpu

.PHONY: all native test test-fast bench wheel docker fixtures fuzz clean docs

all: native

native:
	$(MAKE) -C csrc

test: native
	python -m pytest tests/ -q

# Iteration pass: drops the compile-heavy / spawned-process integration
# tests (marked `slow`, ~6 min of an ~12 min warm-cache full run); every
# oracle family stays covered.
test-fast: native
	python -m pytest tests/ -q -m "not slow"

bench: native
	python bench.py

# Oracle subset on the real TPU chip -> TPU_PARITY_r{N}.json artifact
# (committed per-round evidence of hardware bit-exactness).
tpu-parity: native
	python tools/tpu_parity.py $(ROUND)

# Generated API reference -> docs/api/ (the reference's Doxyfile
# capability; no doxygen/sphinx in this image, so tools/gendocs.py
# introspects the live package + scans the native headers).
docs: native
	python tools/gendocs.py

wheel: native
	python setup.py sdist bdist_wheel

docker:
	docker build -t $(NAME) .

# Mutation fuzz of the untrusted-bitstream parsers (BitReader + the four
# stream-health analyzers) under ASan+UBSan. Header-only targets, so no
# library sources needed.
fuzz:
	g++ -O1 -g -std=c++20 -fsanitize=address,undefined -fno-sanitize-recover=all \
	  tools/fuzz_analyzers.cpp -o tools/fuzz_analyzers
	./tools/fuzz_analyzers /root/reference/tests/resources/bbb_1080x608_420_10.h264 20000
	./tools/fuzz_analyzers tests/fixtures/synthetic_640x360_120.h265 10000
	./tools/fuzz_analyzers tests/fixtures/synthetic_640x360_90_vp9.ivf 10000
	./tools/fuzz_analyzers tests/fixtures/synthetic_320x240_60_av1.ivf 10000
	./tools/fuzz_analyzers tests/fixtures/switch_320x240_480x360_24.h264 10000
	./tools/fuzz_analyzers tests/fixtures/switch_hevc_320x240_480x360_20.h265 10000
	$(MAKE) fuzz-vpp

# The VPP sweep mirrors the library build's SIMD isolation: only the
# AVX2 TU gets -mavx2/-mfma (behind the runtime simd::Available()
# check), so the sweep still runs on x86 hosts without AVX2 and on
# non-x86 targets.
FUZZ_CXX = g++ -O1 -g -std=c++20 -fsanitize=address,undefined \
  -fno-sanitize-recover=all -ffp-contract=off
TARGET_ARCH := $(shell g++ -dumpmachine 2>/dev/null)
ifneq (,$(findstring x86_64,$(TARGET_ARCH)))
FUZZ_SIMD_FLAGS = -mavx2 -mfma
else
FUZZ_SIMD_FLAGS =
endif
.PHONY: fuzz-vpp
fuzz-vpp:
	$(FUZZ_CXX) $(FUZZ_SIMD_FLAGS) -c csrc/vpp_host_avx2.cpp -o csrc/vpp_host_avx2.asan.o
	$(FUZZ_CXX) tools/asan_vpp_sweep.cpp csrc/vpp_host.cpp csrc/vpp_convert.cpp \
	  csrc/vpp_host_avx2.asan.o -o tools/asan_vpp_sweep
	./tools/asan_vpp_sweep

# Race-detection build: whole native runtime + stress harness under TSAN
# (the reference shipped no sanitizer coverage; SURVEY §5.2).
tsan:
	g++ -O1 -g -std=c++20 -fsanitize=thread -fPIC -pthread -mavx2 -mfma \
	  csrc/parser.cpp csrc/decoder.cpp csrc/pipeline.cpp csrc/stream_pool.cpp csrc/segment_reader.cpp csrc/vpp_host.cpp csrc/vpp_host_avx2.cpp csrc/vpp_convert.cpp \
	  tools/stress_tsan.cpp -lavformat -lavcodec -lavutil -lswscale \
	  -o tools/stress_tsan
	./tools/stress_tsan tests/fixtures/bbb_720x480_RGB24_250.h264 4 \
	  tests/fixtures/switch_320x240_480x360_24.h264

# Regenerates the fixtures upstream declares missing (needs libx264),
# plus the open-GOP HEVC fixture (CRA entries with RASL leading
# pictures, needs libx265).
fixtures:
	g++ -O2 -std=c++20 tools/make_fixture.cpp -lavcodec -lavutil -o tools/make_fixture
	./tools/make_fixture tests/fixtures/bbb_720x480_RGB24_250.h264
	./tools/make_fixture tests/fixtures/synthetic_640x360_96_opengop.h265 \
	  96 640 360 24 libx265 yuv420p "" \
	  "open-gop=1:bframes=3:b-adapt=0:keyint=24:min-keyint=24:scenecut=0"

clean:
	$(MAKE) -C csrc clean
	rm -f tools/make_fixture

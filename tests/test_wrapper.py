"""End-to-end pipeline tests, ported from the reference gtest suite
(reference: tests/src/WrapperTests.cpp): dump CRCs, pacing, BLOCKING
lockstep, multi-instance, shutdown watchdog."""
import os
import threading
import time

import numpy as np
import pytest

from conftest import resource
from tensor_stream_tpu import (FourCC, FrameRate, Planes, ResizeType,
                               TensorStreamConverter)
from tensor_stream_tpu.utils.crc import av_crc32


def make_reader(path, mode=FrameRate.BLOCKING, **kw):
    reader = TensorStreamConverter(path, framerate_mode=mode, **kw)
    reader.initialize(repeat_number=3)
    reader.start()
    return reader


def test_ten_frame_dump_deterministic(tmp_path):
    """Ten RGB24 frames dumped twice must produce identical bytes
    (the reference pins crc=249831002 for its 720x480 fixture which is
    absent upstream, .MISSING_LARGE_BLOBS:2 — determinism and size are
    asserted against bunny.mp4 instead)."""
    crcs = []
    for run in range(2):
        reader = make_reader(resource("bunny.mp4"))
        out = tmp_path / f"dump{run}"
        for _ in range(10):
            t = reader.read(name="c", pixel_format=FourCC.RGB24,
                            width=720, height=480)
            reader.dump(t, str(out), width=720, height=480)
        reader.stop()
        data = np.fromfile(f"{out}.yuv", np.uint8)
        assert data.size == 720 * 480 * 3 * 10
        crcs.append(av_crc32(data))
    assert crcs[0] == crcs[1]


def test_blocking_sequential_indexes_single_thread():
    """BLOCKING mode: indexes strictly sequential from 1
    (reference: WrapperTests.cpp:374-482)."""
    reader = make_reader(resource("billiard_1920x1080_420_100.h264"))
    idxs = []
    for _ in range(15):
        _, idx = reader.read(name="c", pixel_format=FourCC.Y800,
                             width=320, height=240, return_index=True)
        idxs.append(idx)
    reader.stop()
    assert idxs == list(range(1, 16))


def test_blocking_sequential_indexes_two_threads():
    reader = make_reader(resource("billiard_1920x1080_420_100.h264"),
                         max_consumers=2)
    results = {}

    def consume(name):
        idxs = []
        for _ in range(10):
            _, idx = reader.read(name=name, pixel_format=FourCC.Y800,
                                 width=192, height=108, return_index=True)
            idxs.append(idx)
        results[name] = idxs

    threads = [threading.Thread(target=consume, args=(n,)) for n in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    reader.stop()
    assert results["a"] == list(range(1, 11))
    assert results["b"] == list(range(1, 11))


def test_two_instances_simultaneously(tmp_path):
    """Two independent pipelines over different streams
    (reference: WrapperTests.cpp:214-242)."""
    r1 = make_reader(resource("bbb_1080x608_420_10.h264"))
    r2 = make_reader(resource("billiard_1920x1080_420_100.h264"))
    t1 = r1.read(name="a", pixel_format=FourCC.RGB24)
    t2 = r2.read(name="b", pixel_format=FourCC.BGR24, width=720, height=480)
    assert t1.shape == (608, 1080, 3)
    assert t2.shape == (480, 720, 3)
    r1.stop()
    r2.stop()


def _warm_vpp(reader, **read_kwargs):
    """Pre-compile the jitted VPP program a consumer will use, so NATIVE
    CRC tests aren't starved by first-read compile latency (jit compiles
    on the first concrete call, so run one dummy frame through)."""
    import jax

    from tensor_stream_tpu.ops.vpp import build_vpp
    from tensor_stream_tpu.tensor_stream import FrameParameters
    w, h = reader.frame_size
    fp = FrameParameters(**read_kwargs)
    fn = build_vpp(fp.to_config(w, h), reader.device_index)
    y = np.zeros((h, w), np.uint8)
    uv = np.zeros((h // 2, w), np.uint8)
    jax.block_until_ready(fn(y, uv))


def _dump_cycle(reader, name, frames, dump, errors=None, **read_kwargs):
    """Reads `frames` frames, letting XLA work drain asynchronously, and
    dumps them all after the loop: on this 1-core host a consumer that
    blocks on device compute inside the read loop cannot keep a NATIVE
    producer's pace (the reference's consumers ran the VPP on a GPU with
    the GIL released, so their loop was effectively free)."""
    try:
        tensors = []
        for _ in range(frames):
            tensors.append(reader.read(name=name, **read_kwargs))
        for t in tensors:
            reader.dump(t, dump, pixel_format=read_kwargs["pixel_format"])
    except BaseException as e:  # surfaced by the test thread's joiner
        if errors is None:
            raise
        errors.append((name, e))


def test_multi_consumer_dump_crcs(tmp_path):
    """Whole-pipeline byte parity: two concurrent consumers of one NATIVE
    stream reproduce the reference's committed dump CRCs — 10 RGB24
    720x480 frames = 249831002 and 9 Y800 1920x1080 frames at delay=-1
    = 756348339 (reference: WrapperTests.cpp:130-171). This pins the
    full demux->decode->ring(look-back)->VPP->dump byte path to the
    CUDA implementation.

    Like the reference's own version, the scenario assumes consumers keep
    the producer's 25fps pace; a scheduling hiccup on a loaded 1-core CI
    host can legitimately drop a frame (latest-frame semantics), so the
    run is retried a few times before declaring failure.
    """
    from tensor_stream_tpu import _native
    from tensor_stream_tpu.ops.vpp import vpp_numpy
    from tensor_stream_tpu.tensor_stream import FrameParameters

    lib = _native.load()

    def series(reader, name, delay, count, results):
        # Grab `count` consecutive latest-frame reads entirely in C (GIL
        # released for the whole series): a paced consumer loop in Python
        # cannot hold 25fps on a 1-core host against XLA's own runtime
        # threads. The reference's getCycle consumers were C++ threads
        # with GPU-async VPPs, i.e. the same in-loop cost profile.
        w, h = reader.frame_size
        ys = np.empty((count, h, w), np.uint8)
        uvs = np.empty((count, h // 2, w), np.uint8)
        got = lib.ts_pipeline_get_series(reader._handle, name.encode(),
                                         delay, count, ys.ctypes.data,
                                         uvs.ctypes.data, None)
        results[name] = (got, ys, uvs)

    a = dict(pixel_format=FourCC.RGB24, width=720, height=480)
    b = dict(pixel_format=FourCC.Y800, width=1920, height=1080)
    last = None
    for attempt in range(4):
        reader = TensorStreamConverter(resource("bbb_1080x608_420_10.h264"),
                                       framerate_mode=FrameRate.NATIVE,
                                       max_consumers=2)
        reader.initialize(repeat_number=3)
        reader.start()
        results = {}
        ta = threading.Thread(target=series,
                              args=(reader, "first", 0, 10, results))
        tb = threading.Thread(target=series,
                              args=(reader, "second", -1, 9, results))
        ta.start()
        tb.start()
        ta.join()
        tb.join()
        reader.stop()
        w, h = reader.frame_size
        got_a, ys_a, uvs_a = results["first"]
        got_b, ys_b, uvs_b = results["second"]
        cfg_a = FrameParameters(**a).to_config(w, h)
        cfg_b = FrameParameters(**b).to_config(w, h)
        first = np.concatenate(
            [np.asarray(vpp_numpy(cfg_a, ys_a[i], uvs_a[i])).reshape(-1)
             for i in range(got_a)]) if got_a else np.empty(0, np.uint8)
        # The delay=-1 consumer deterministically gets 8 of its 9 reads:
        # the aligned-index quirk REPEATs the read right after every ring
        # wrap ((current-1) % 5 - 1 < 0 at frame 6), and the 9th read
        # blocks into EOF. The reference's own run did the same — its
        # committed CRC covers 8 real frames (1,2,3,4,6,7,8,9) plus one
        # frame of ZEROS, because checkCRC freads an 8-frame file into a
        # zero-initialized 9-frame buffer (WrapperTests.cpp:53-58).
        frame_bytes = 1920 * 1080
        second = np.zeros(frame_bytes * 9, np.uint8)
        if got_b:
            real = np.concatenate(
                [np.asarray(vpp_numpy(cfg_b, ys_b[i], uvs_b[i])).reshape(-1)
                 for i in range(got_b)])
            second[:real.size] = real
        last = (got_a, av_crc32(first) if first.size else 0,
                got_b, av_crc32(second))
        if (got_a == 10 and got_b == 8
                and av_crc32(first) == 249831002
                and av_crc32(second) == 756348339):
            return
    pytest.fail(f"multi-consumer CRCs failed after 4 attempts: {last}")


def test_two_instance_dump_crcs(tmp_path):
    """Two simultaneous pipeline instances over different streams
    reproduce the reference's committed dump CRCs (reference:
    WrapperTests.cpp:214-242): BBB RGB24 1920x1080 x10 = 1775796233,
    billiard BGR24 720x480 x10 = 3048624823. BLOCKING mode delivers the
    same frames 1..10 per consumer as the reference's NATIVE run but in
    deterministic lockstep, so the byte comparison cannot race."""
    r1 = TensorStreamConverter(resource("bbb_1080x608_420_10.h264"),
                               framerate_mode=FrameRate.BLOCKING)
    r2 = TensorStreamConverter(resource("billiard_1920x1080_420_100.h264"),
                               framerate_mode=FrameRate.BLOCKING)
    for r in (r1, r2):
        r.initialize(repeat_number=3)
    r1.start()
    r2.start()
    d1, d2 = str(tmp_path / "BBB"), str(tmp_path / "billiard")
    errors = []
    t1 = threading.Thread(
        target=_dump_cycle, args=(r1, "BBB", 10, d1, errors),
        kwargs=dict(pixel_format=FourCC.RGB24, width=1920, height=1080))
    t2 = threading.Thread(
        target=_dump_cycle, args=(r2, "Billiard", 10, d2, errors),
        kwargs=dict(pixel_format=FourCC.BGR24, width=720, height=480))
    t1.start()
    t2.start()
    t1.join()
    t2.join()
    r1.stop()
    r2.stop()
    assert not errors, errors
    bbb = np.fromfile(f"{d1}.yuv", np.uint8)
    billiard = np.fromfile(f"{d2}.yuv", np.uint8)
    assert bbb.size == 1920 * 1080 * 3 * 10
    assert billiard.size == 720 * 480 * 3 * 10
    assert av_crc32(bbb) == 1775796233
    assert av_crc32(billiard) == 3048624823


def test_native_pacing_cadence():
    """NATIVE mode pacing: reads arrive roughly at the stream frame
    interval (reference asserts realTimeDelay ± 4 ms,
    WrapperTests.cpp:173-212; we allow generous slack for a loaded CI
    host but still catch FAST-like behavior)."""
    reader = make_reader(resource("bbb_720x480_RGB24_250.h264"),
                         mode=FrameRate.NATIVE)
    delay_ms = 1000.0 / reader.fps
    # warm the jit cache before timing
    reader.read(name="c", pixel_format=FourCC.Y800, width=96, height=64)
    times = []
    for _ in range(8):
        t0 = time.monotonic()
        reader.read(name="c", pixel_format=FourCC.Y800, width=96, height=64)
        times.append((time.monotonic() - t0) * 1000)
    reader.stop()
    avg = sum(times) / len(times)
    assert delay_ms * 0.5 < avg < delay_ms * 2.5, f"avg={avg} expected~{delay_ms}"


def test_fast_mode_faster_than_native(native):
    """Unpaced modes must outpace the native frame rate
    (reference: WrapperTests.cpp:258-317). The rate-limit proof is the
    pipeline's own sleep ledger — zero pacing sleeps — because on a
    contended single-core CI host wall-clock margins measure scheduler
    noise, not the pacing logic under test (this assertion's previous
    wall-clock form was de-flaked twice and still raced); a generous 2x
    wall-clock bound remains as a liveness check."""
    reader = make_reader(resource("bbb_720x480_RGB24_250.h264"),
                         mode=FrameRate.BLOCKING)
    reader.read(name="c", pixel_format=FourCC.Y800, width=96, height=64)
    t0 = time.monotonic()
    for _ in range(20):
        reader.read(name="c", pixel_format=FourCC.Y800,
                    width=96, height=64)
    elapsed = time.monotonic() - t0
    slept_ms = native.ts_pipeline_slept_ms(reader._handle)
    reader.stop()
    assert slept_ms == 0, f"mode paced the producer: slept {slept_ms} ms"
    # Pure liveness bound: per-read wall time on this box is dominated
    # by TPU-tunnel RPC latency (~90 ms/dispatch under suite load), not
    # by the pipeline, so anything tighter re-measures the tunnel.
    assert elapsed < 30, f"{elapsed:.2f}s for 20 unpaced reads"


def test_shutdown_under_load_no_hang():
    """stop() while a consumer is blocked must complete < 5 s
    (reference: WrapperTests.cpp:537-562)."""
    reader = TensorStreamConverter(resource("billiard_1920x1080_420_100.h264"),
                                   framerate_mode=FrameRate.NATIVE)
    reader.initialize(repeat_number=3)
    # Compile the consumer's VPP before timing: on TPU the first jit can
    # take tens of seconds, which would otherwise be billed to stop().
    _warm_vpp(reader, pixel_format=FourCC.Y800, width=96, height=64)
    reader.start()
    stopped = threading.Event()

    def consume():
        try:
            while True:
                reader.read(name="c", pixel_format=FourCC.Y800,
                            width=96, height=64)
        except RuntimeError:
            stopped.set()

    t = threading.Thread(target=consume)
    t.start()
    time.sleep(0.5)
    t0 = time.monotonic()
    reader.stop()
    t.join(timeout=5)
    assert time.monotonic() - t0 < 5
    assert not t.is_alive()


def test_multiple_init_stop_cycles():
    reader = TensorStreamConverter(resource("billiard_1920x1080_420_100.h264"),
                                   framerate_mode=FrameRate.BLOCKING)
    for _ in range(3):
        reader.initialize()
        reader.start()
        t = reader.read(name="c", pixel_format=FourCC.Y800, width=96, height=64)
        assert t.shape == (1, 64, 96)
        reader.stop()


def test_stream_error_detection_exposed():
    """The analyzer's loss/reorder mask is queryable (reference logs it;
    broken_420 fixtures are known-broken streams)."""
    reader = make_reader(resource("broken_420/Without_IDR.h264"))
    try:
        reader.read(name="c", pixel_format=FourCC.Y800)
    except RuntimeError:
        pass
    mask = reader.stream_errors
    reader.stop()
    assert mask & 2  # FRAME_NUM discontinuity detected


def test_blocking_mixed_perframe_and_bulk_consumers():
    """BLOCKING with BOTH consumer kinds: the per-frame consumer keeps
    its strict no-drop handshake (sequential indexes) while a bulk
    cursor consumer drains concurrently (cursor consumers bypass the
    handshake only when they are alone)."""
    reader = make_reader(resource("bbb_720x480_RGB24_250.h264"),
                         mode=FrameRate.BLOCKING, max_consumers=2,
                         buffer_size=8)
    bulk_indices = []
    done = threading.Event()

    def bulk():
        try:
            while True:
                _, idx = reader.read_batch(4, name="bulk",
                                           pixel_format=FourCC.Y800,
                                           width=96, height=64,
                                           return_index=True)
                bulk_indices.extend(idx)
        except RuntimeError:
            done.set()

    t = threading.Thread(target=bulk)
    t.start()
    seq = []
    for _ in range(12):
        _, idx = reader.read(name="frame", pixel_format=FourCC.Y800,
                             width=96, height=64, return_index=True)
        seq.append(idx)
    assert seq == list(range(seq[0], seq[0] + 12)), seq
    reader.stop()
    t.join(timeout=10)
    assert not t.is_alive()
    # The bulk consumer saw a consecutive no-drop prefix as well.
    assert bulk_indices == list(range(bulk_indices[0],
                                      bulk_indices[0] + len(bulk_indices)))


def test_low_delay_drops_demuxer_buffer():
    """NATIVE_LOW_DELAY = NATIVE pacing with the demuxer buffer dropped
    (AVFMT_FLAG_NOBUFFER) — the reference proves the buffer-drop via a
    first-frame latency ratio (WrapperTests.cpp:67-119), which is pure
    timing; here the flag is asserted structurally and the mode is proven
    to keep decoding (NOBUFFER discards the probe-buffered packets, so
    early frames may legally decode without their references — the
    live-stream trade the mode exists for; the reference never asserts
    bytes for it either)."""
    from tensor_stream_tpu import _native
    lib = _native.load()

    ld = TensorStreamConverter(resource("bbb_720x480_RGB24_250.h264"),
                               framerate_mode=FrameRate.NATIVE_LOW_DELAY)
    ld.initialize(repeat_number=3)
    assert lib.ts_pipeline_keeps_buffer(ld._handle) == 0
    _warm_vpp(ld, pixel_format=FourCC.RGB24)
    ld.start()
    idxs = []
    for _ in range(5):
        t, idx = ld.read(name="c", pixel_format=FourCC.RGB24,
                         return_index=True)
        idxs.append(idx)
    frame = np.asarray(t)
    ld.stop()
    # NATIVE pacing underneath: the consumer sees strictly advancing
    # frames (latest-frame semantics may legally skip one under CI load)
    # and the stream keeps decoding real content.
    assert all(b > a for a, b in zip(idxs, idxs[1:])), idxs
    assert frame.shape == (480, 720, 3) and frame.std() > 1

    nat = TensorStreamConverter(resource("bbb_720x480_RGB24_250.h264"),
                                framerate_mode=FrameRate.NATIVE)
    nat.initialize(repeat_number=3)
    assert lib.ts_pipeline_keeps_buffer(nat._handle) == 1
    nat.start()
    t, idx = nat.read(name="c", pixel_format=FourCC.RGB24, return_index=True)
    # A fresh consumer's first read returns the LATEST frame; NATIVE
    # pacing normally holds the producer at frame 1 by then, but under
    # CI load the consumer may register a pacing interval or two late —
    # assert promptness, not exact index (the structural check above is
    # keeps_buffer, not pacing).
    assert 1 <= idx <= 5, idx
    nat.stop()


def test_native_simple_pacing_cadence():
    """NATIVE_SIMPLE paces with a fixed realTimeDelay sleep per frame
    (reference: WrapperC.cpp:166-170); reads must arrive at roughly the
    frame interval, like the NATIVE cadence test above."""
    reader = make_reader(resource("bbb_720x480_RGB24_250.h264"),
                         mode=FrameRate.NATIVE_SIMPLE)
    delay_ms = 1000.0 / reader.fps
    reader.read(name="c", pixel_format=FourCC.Y800, width=96, height=64)
    times = []
    for _ in range(8):
        t0 = time.monotonic()
        reader.read(name="c", pixel_format=FourCC.Y800, width=96, height=64)
        times.append((time.monotonic() - t0) * 1000)
    reader.stop()
    avg = sum(times) / len(times)
    assert delay_ms * 0.5 < avg < delay_ms * 2.5, f"avg={avg} expected~{delay_ms}"


def test_read_timeout_interrupts_stalled_source():
    """The read-timeout interrupt callback (csrc/parser.cpp, reference:
    Parser.cpp:295-309) must abort a blocked network read: a localhost
    HTTP source serves a valid stream prefix, then stalls with the
    connection held open. With set_timeout(1) the producer exits
    TS_TIMEOUT and blocked readers are released within a bounded wall
    time instead of hanging forever. (FFmpeg's tcp/http protocols poll
    the interrupt callback; a local file read would not.)"""
    import http.server
    import socketserver

    data = open(resource("bbb_720x480_RGB24_250.h264"), "rb").read()
    stall = threading.Event()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data[: 256 * 1024])
            self.wfile.flush()
            stall.wait(timeout=30)  # hold the socket open, send nothing

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), Handler) as srv:
        port = srv.server_address[1]
        st = threading.Thread(target=srv.serve_forever)
        st.start()
        try:
            reader = TensorStreamConverter(
                f"http://127.0.0.1:{port}/stall.h264", timeout=1,
                framerate_mode=FrameRate.FAST)
            reader.initialize(repeat_number=1)
            reader.start()
            t0 = time.monotonic()
            with pytest.raises(RuntimeError):
                for _ in range(1000):
                    reader.read(name="c", pixel_format=FourCC.Y800,
                                width=96, height=64)
            elapsed = time.monotonic() - t0
            # ~1 s timeout + decode of the prefix; generous CI slack, but
            # far below the 30 s the stalled socket would otherwise take.
            assert elapsed < 15, f"timeout did not fire, took {elapsed:.1f}s"
            reader.stop()
            reader.set_timeout(None)
        finally:
            stall.set()
            srv.shutdown()
            st.join(timeout=10)


def test_native_pacing_by_sleep_accounting():
    """Deterministic pacing assertion on the pipeline's own accounting
    (the wall-clock cadence test above needs generous slack on a loaded
    host). NATIVE pacing sleeps to the DTS schedule, so processing K
    frames takes at least (K-1) frame intervals — a hard lower bound —
    and the pipeline's recorded sleep accounts for nearly all of it."""
    from tensor_stream_tpu import _native
    lib = _native.load()
    reader = TensorStreamConverter(resource("bbb_1080x608_420_10.h264"),
                                   framerate_mode=FrameRate.NATIVE)
    reader.initialize(repeat_number=3)
    interval_ms = 1000.0 / reader.fps
    t0 = time.monotonic()
    reader.start()
    # Drain reads until the producer finishes the 10-frame file.
    with pytest.raises(RuntimeError):
        while True:
            reader.read(name="c", pixel_format=FourCC.NV12)
    elapsed_ms = (time.monotonic() - t0) * 1000
    slept_ms = lib.ts_pipeline_slept_ms(reader._handle)
    reader.stop()
    expected = 9 * interval_ms  # frames 2..10 each scheduled one interval on
    # Hard lower bound (sleep guarantees schedule), catching any
    # 2x-pacing bug by a 360 ms margin on this 25fps fixture:
    assert elapsed_ms >= expected - 2, (elapsed_ms, expected)
    # The producer's own sleep ledger covers the schedule minus real
    # work (decode of 10 frames is ~25-50 ms on this host):
    assert slept_ms >= expected * 0.5, (slept_ms, expected)
    assert slept_ms <= expected + 2 * interval_ms, (slept_ms, expected)


def test_live_tcp_stream_ingest():
    """Live-network ingest without egress (docs/ROADMAP.md item 2): a
    localhost TCP server feeds raw Annex-B H.264 at real-time pacing;
    the reader consumes it as a live stream (tcp:// URL through the same
    avformat path RTMP/RTSP use) and the frames match the file decode."""
    import socket

    from tensor_stream_tpu import _native
    lib = _native.load()

    path = resource("bbb_1080x608_420_10.h264")
    data = open(path, "rb").read()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def feeder():
        conn, _ = srv.accept()
        try:
            # ~25fps pacing in 8 KiB slices (the file is 10 frames).
            chunk = 8192
            for off in range(0, len(data), chunk):
                conn.sendall(data[off:off + chunk])
                time.sleep(0.02)
        finally:
            conn.close()

    ft = threading.Thread(target=feeder)
    ft.start()
    try:
        reader = TensorStreamConverter(f"tcp://127.0.0.1:{port}",
                                       framerate_mode=FrameRate.FAST,
                                       timeout=10)
        reader.initialize(repeat_number=1)
        assert reader.frame_size == (1080, 608)
        # Raw NV12 series in C keeps pace with the live feed.
        w, h = reader.frame_size
        n = 6
        ys = np.empty((n, h, w), np.uint8)
        uvs = np.empty((n, h // 2, w), np.uint8)
        reader.start()
        got = lib.ts_pipeline_get_series(reader._handle, b"live", 0, n,
                                         ys.ctypes.data, uvs.ctypes.data,
                                         None)
        reader.stop()
        reader.set_timeout(None)
        assert got == n
        # Frame bytes are the file decode's bytes (H.264 is bit-exact):
        # the first live frame must be one of the file's first frames.
        from tensor_stream_tpu.utils.crc import av_crc32
        file_reader = TensorStreamConverter(path,
                                            framerate_mode=FrameRate.BLOCKING)
        file_reader.initialize(repeat_number=3)
        file_reader.start()
        file_crcs = set()
        for _ in range(10):
            y, uv, _ = file_reader._get_nv12("f", 0)
            file_crcs.add(av_crc32(y))
        file_reader.stop()
        live_crcs = [av_crc32(ys[i]) for i in range(n)]
        assert set(live_crcs) <= file_crcs, (live_crcs, file_crcs)
    finally:
        ft.join(timeout=30)
        srv.close()

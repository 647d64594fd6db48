"""Live-source reconnect (elastic recovery, csrc/pipeline.cpp
tryReconnect): when a network source dies mid-stream, the producer
re-opens the URL with backoff; consumers keep blocking and frame
numbering continues. The reference's only recovery was Python-side
initialize(repeat_number) at startup (SURVEY §5.3); its Parser::Reset
was declared but never implemented (reference: include/Parser.h:104).
"""
import socket
import threading
import time

import numpy as np
import pytest

from conftest import resource

from tensor_stream_tpu import _native


@pytest.fixture
def h264_bytes():
    return open(resource("bbb_1080x608_420_10.h264"), "rb").read()


class RestartableServer:
    """Localhost TCP server that serves the stream bytes, drops the
    connection after `first_bytes`, then serves the FULL stream again to
    the next connection (like a restarted RTMP relay)."""

    def __init__(self, data, first_bytes):
        self.data = data
        self.first_bytes = first_bytes
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(2)
        self.port = self.srv.getsockname()[1]
        self.connections = 0
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        for round_ in range(2):
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            self.connections += 1
            payload = (self.data[:self.first_bytes] if round_ == 0
                       else self.data)
            try:
                chunk = 8192
                for off in range(0, len(payload), chunk):
                    conn.sendall(payload[off:off + chunk])
                    time.sleep(0.005)
            except OSError:
                pass
            finally:
                conn.close()

    def close(self):
        self.srv.close()


def test_reconnect_resumes_live_stream(h264_bytes):
    """The producer survives a dropped connection: frames keep arriving
    from the re-served stream, numbering continues past the break."""
    lib = _native.load()
    # First connection carries roughly half the stream (cut mid-data so
    # several frames decode before the break).
    server = RestartableServer(h264_bytes, len(h264_bytes) // 2)
    url = f"tcp://127.0.0.1:{server.port}"
    p = lib.ts_pipeline_create()
    try:
        sts = lib.ts_pipeline_init_ex2(p, url.encode(), 5, 8, 3, 0, 0, 0, 0,
                                       1, 100, 50)  # reconnect on
        assert sts == 0
        w, h = lib.ts_pipeline_width(p), lib.ts_pipeline_height(p)
        assert (w, h) == (1080, 608)
        lib.ts_pipeline_register_cursor(p, b"r")
        lib.ts_pipeline_start(p)
        import ctypes
        y = np.empty((h, w), np.uint8)
        uv = np.empty((h // 2, w), np.uint8)
        first = ctypes.c_int(0)
        indices = []
        deadline = time.monotonic() + 30
        while len(indices) < 12 and time.monotonic() < deadline:
            got = lib.ts_pipeline_get_batch(p, b"r", 1, y.ctypes.data,
                                            uv.ctypes.data,
                                            ctypes.byref(first))
            if got <= 0:
                break
            indices.append(int(first.value))
        assert len(indices) >= 12, (indices, server.connections)
        # No-drop cursor across the reconnect: strictly sequential from 1.
        assert indices == list(range(1, len(indices) + 1))
        # The break really happened and was survived, and the
        # observability counter recorded it.
        assert server.connections == 2
        assert lib.ts_pipeline_reconnect_count(p) >= 1
    finally:
        lib.ts_pipeline_stop(p)
        lib.ts_pipeline_destroy(p)
        server.close()


def test_reconnect_attempts_exhausted_finishes(h264_bytes):
    """When the source never comes back, bounded attempts run out and
    the pipeline finishes like a normal EOF (readers unblock)."""
    lib = _native.load()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    data = h264_bytes

    def feeder():
        conn, _ = srv.accept()
        try:
            conn.sendall(data)  # whole stream once, then silence forever
        finally:
            conn.close()
            srv.close()  # port gone: every reconnect attempt must fail

    ft = threading.Thread(target=feeder, daemon=True)
    ft.start()
    p = lib.ts_pipeline_create()
    try:
        sts = lib.ts_pipeline_init_ex2(p, f"tcp://127.0.0.1:{port}".encode(),
                                       5, 8, 3, 0, 0, 0, 0,
                                       1, 50, 3)  # 3 attempts x 50 ms
        assert sts == 0
        lib.ts_pipeline_start(p)
        t0 = time.monotonic()
        w, h = lib.ts_pipeline_width(p), lib.ts_pipeline_height(p)
        y = np.empty((h, w), np.uint8)
        uv = np.empty((h // 2, w), np.uint8)
        reads = 0
        while True:
            sts = lib.ts_pipeline_get(p, b"c", 0, y.ctypes.data,
                                      uv.ctypes.data)
            if sts < 0:
                break  # TS_FINISHED after attempts ran out
            reads += 1
            if time.monotonic() - t0 > 30:
                pytest.fail("pipeline did not finish")
        assert reads > 0
    finally:
        lib.ts_pipeline_stop(p)
        lib.ts_pipeline_destroy(p)


def test_stop_during_reconnect_backoff_returns_quickly(h264_bytes):
    """Stop() must interrupt a reconnect backoff sleep, not wait it out
    (the shutdown-watchdog property, reference WrapperTests.cpp:537-562,
    extended to the reconnect path)."""
    lib = _native.load()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def feeder():
        conn, _ = srv.accept()
        try:
            conn.sendall(h264_bytes[:len(h264_bytes) // 2])
        finally:
            conn.close()
            srv.close()

    threading.Thread(target=feeder, daemon=True).start()
    p = lib.ts_pipeline_create()
    sts = lib.ts_pipeline_init_ex2(p, f"tcp://127.0.0.1:{port}".encode(),
                                   5, 8, 3, 0, 0, 0, 0,
                                   1, 10_000, -1)  # huge backoff, forever
    assert sts == 0
    lib.ts_pipeline_start(p)
    time.sleep(1.0)  # let the connection die and the backoff start
    t0 = time.monotonic()
    lib.ts_pipeline_stop(p)
    elapsed = time.monotonic() - t0
    lib.ts_pipeline_destroy(p)
    assert elapsed < 5.0, f"stop took {elapsed:.1f}s during backoff"

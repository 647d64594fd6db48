"""StreamInferencer — continuous batched inference over many streams.

The serving engine tying the ingest and model layers together: N
streams (files, RTMP/RTSP feeds) decode through one MultiStreamLoader /
PooledStreamLoader into a single [N*per_stream, ...] device batch per
tick, one jitted (or jax.export-reloaded) model call services every
stream at once — batches are where the MXU wants its work — and the
results demux back to per-stream slices with their frame indices.

The reference's serving story was one process per GPU with consumers
pulling frames one at a time (python_examples/many_consumers.py);
batching across streams is the TPU-shaped transpose of that design.

Dispatch stays ASYNC: jax enqueues each model call and the loop only
blocks one batch behind (double buffering), so host decode of batch
k+1 overlaps device compute of batch k. Per-batch device latency and
per-stream frame counts are tracked continuously (`stats()`).

    from tensor_stream_tpu.serving import StreamInferencer
    eng = StreamInferencer(["cam0.mp4", "cam1.mp4"], serve_fn,
                           per_stream=4, width=224, height=224,
                           pixel_format=FourCC.RGB24,
                           planes_pos=Planes.MERGED, host_resize=True)
    for r in eng.stream(max_batches=100):
        push(r.stream, r.frames, r.outputs)   # per-stream slice
    eng.close()
"""
import time
from collections import namedtuple
from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np

from .data import MultiStreamLoader

StreamResult = namedtuple("StreamResult", ("stream", "frames", "outputs"))
StreamResult.__doc__ = """One stream's slice of a served batch.

stream:  index into the engine's stream_urls
frames:  frame indices (this stream's clock) of the rows
outputs: the model outputs for those rows (leading axis = frames)
"""


class StreamInferencer:
    """Batched many-stream inference with per-stream demux + stats."""

    def __init__(self, stream_urls: Sequence[str], infer_fn: Callable,
                 per_stream: int = 8, loader: Optional[Any] = None,
                 carry: Any = None, on_end: str = "stop",
                 pipeline: str = "per-stream", **loader_kwargs):
        """`infer_fn(batch) -> outputs` must keep the leading batch
        axis (any pytree of arrays with that axis works). Pass a
        prebuilt Multi/PooledStreamLoader via `loader`, or let the
        engine build a MultiStreamLoader from `stream_urls` and
        `loader_kwargs` (loop=True for endless service).

        STATEFUL models (e.g. the streaming KV-cache VideoViT): pass
        the initial state as `carry`; infer_fn then has the signature
        `infer_fn(carry, batch) -> (carry, outputs)` and the engine
        hands it batch = [n_streams, per_stream, ...] (STACKED per
        stream — stream_step consumes it directly; set per_stream to
        the model's step size, e.g. tubelet_t). The carry's leading
        axis is the same stream axis. Ticks where a stream delivers
        fewer than per_stream frames (its tail) end that stream: the
        partial chunk is discarded, because a fixed-step temporal
        model cannot consume it. Dispatch stays async: the carry
        chains device-side.

        `on_end`: "stop" (default) ends service when ANY stream ends;
        "drop" evicts exhausted streams (and their carry rows) and
        keeps serving the survivors — the batch shrinks, so the model
        must accept smaller batches (a jit refires per size; a
        batch-polymorphic exported artifact always fits).

        `pipeline` picks the many-stream decode/dispatch topology:
          "per-stream" (default): one MultiStreamLoader — a native
            producer thread + device dispatch per stream per tick;
            supports on_end="drop" and stateful carry.
          "pooled": one PooledStreamLoader — N streams share a bounded
            native worker pool and ONE flat staging buffer; one
            transfer + one VPP dispatch per tick.
          "fused": pooled, AND infer_fn traced INTO the loader's VPP
            program — one device dispatch per tick total, XLA fusing
            convert/normalize into the model's first ops. The fastest
            serving config; requires a stateless traceable infer_fn.
        Pooled/fused engines own their loader (pass no `loader`) and
        end service when any stream drains (on_end="stop")."""
        if on_end not in ("stop", "drop"):
            raise ValueError(f"on_end must be 'stop' or 'drop': {on_end}")
        if on_end == "drop" and loader is not None:
            raise ValueError("on_end='drop' needs engine-owned loaders "
                             "(omit the loader argument)")
        if pipeline not in ("per-stream", "pooled", "fused"):
            raise ValueError("pipeline must be 'per-stream', 'pooled' "
                             f"or 'fused': {pipeline!r}")
        if pipeline != "per-stream":
            if loader is not None or carry is not None or on_end != "stop":
                raise ValueError(
                    f"pipeline={pipeline!r} builds its own pooled "
                    "loader and is stateless: omit loader/carry and "
                    "keep on_end='stop'")
        self.pipeline = pipeline
        self.infer_fn = infer_fn
        self.carry = carry
        self._stateful = carry is not None
        self.per_stream = per_stream
        self.on_end = on_end
        self._own_loader = loader is None
        if loader is not None:
            self.loader = loader
        elif pipeline == "per-stream":
            self.loader = MultiStreamLoader(
                stream_urls, per_stream=per_stream, **loader_kwargs)
        else:
            from .data import PooledStreamLoader
            self.loader = PooledStreamLoader(
                stream_urls, per_stream=per_stream,
                post_fn=infer_fn if pipeline == "fused" else None,
                **loader_kwargs)
            if pipeline == "fused":
                # The loader's single dispatch already produced the
                # model outputs; the engine's infer step is identity.
                self.infer_fn = lambda outputs: outputs
        self._n_streams = len(stream_urls)
        self._frames = [0] * self._n_streams
        self._batches = 0
        self._lat_ms = []
        self._t0 = None
        # on_end="drop": alive (stream_id, loader) pairs, sid-sorted —
        # position in this list == row in the stateful carry.
        self._alive = list(enumerate(self.loader.loaders)) \
            if on_end == "drop" else None

    # -------------------------------------------------------------- core

    def stream(self, max_batches: Optional[int] = None,
               inflight: int = 1):
        """Generator of StreamResult — one per stream per batch, in
        stream order. Pipelined: up to `inflight` model calls stay
        enqueued before the oldest batch's results are awaited.
        inflight=1 is classic double buffering (results lag dispatch by
        one tick); deeper values hide more device/link round-trip
        latency at the cost of result lag — on a remote-attached chip
        where each result wait pays a full RTT, inflight=2 keeps the
        host decode loop running during that wait. The pooled loader's
        own `prefetch` bounds how far decode can run ahead regardless."""
        from collections import deque
        if inflight < 1:
            raise ValueError(f"inflight must be >= 1: {inflight}")
        pending = deque()  # (dispatch_t, outputs, indices), oldest first
        fetched = 0
        self._t0 = self._t0 or time.perf_counter()
        it = None if self.on_end == "drop" else iter(self.loader)
        while max_batches is None or fetched < max_batches:
            try:
                batch, indices = (self._next_dropping()
                                  if self.on_end == "drop"
                                  else self._next_stop(it))
            except StopIteration:
                break
            fetched += 1
            t_dispatch = time.perf_counter()
            if self._stateful:
                self.carry, out = self.infer_fn(self.carry, batch)
            else:
                out = self.infer_fn(batch)
            pending.append((t_dispatch, out, indices))
            if len(pending) > inflight:
                yield from self._drain(pending.popleft())
        while pending:
            yield from self._drain(pending.popleft())

    def _next_stop(self, it):
        """Stop mode: the MultiStreamLoader's flat batch; for stateful
        models re-stack to [n_streams, per_stream, ...], ending service
        at the first ragged tick (a partial tail chunk)."""
        import jax.numpy as jnp
        batch, indices = next(it)
        if not self._stateful:
            return batch, indices
        if any(len(v) != self.per_stream for v in indices.values()):
            raise StopIteration  # fixed-step temporal model: tail ends it
        return (batch.reshape((len(indices), self.per_stream)
                              + batch.shape[1:]), indices)

    def _next_dropping(self):
        """One tick's batch from the alive streams; exhausted streams
        are evicted (their carry row too, BEFORE the tick's dispatch,
        so batch rows and carry rows always agree). Stateful models
        additionally treat a partial (ragged) chunk as the stream's
        end — their step size is fixed. StopIteration when none
        survive."""
        import jax.numpy as jnp
        parts, indices = [], {}
        evicted = 0
        for row, (sid, ld) in enumerate(list(self._alive)):
            try:
                tensors, idx = next(ld)
                if self._stateful and len(idx) != self.per_stream:
                    raise StopIteration  # discard the partial tail
            except StopIteration:
                self._evict(row - evicted, sid, ld)
                evicted += 1
                continue
            parts.append(tensors)
            indices[sid] = idx
        if not parts:
            raise StopIteration
        if self._stateful:
            return jnp.stack(parts, axis=0), indices
        return jnp.concatenate(parts, axis=0), indices

    def _evict(self, row, sid, loader):
        """Removes a finished stream: loader closed, carry row sliced
        out (stateful engines), alive list updated."""
        self._alive = [(s, l) for s, l in self._alive if s != sid]
        loader.close()
        if self._stateful and self.carry is not None:
            import jax.numpy as jnp

            def drop_row(x):
                return jnp.concatenate([x[:row], x[row + 1:]], axis=0)
            self.carry = jax.tree_util.tree_map(drop_row, self.carry)

    def _drain(self, item):
        t_dispatch, outputs, indices = item
        t0 = time.perf_counter()
        outputs = jax.block_until_ready(outputs)
        # Residual device wait AFTER the overlapped host work — the
        # serving-relevant number (dispatch-to-now would fold the next
        # batch's decode into "device latency").
        self._lat_ms.append((time.perf_counter() - t0) * 1e3)
        self._batches += 1
        # Stateless models emit one row per FRAME; stateful temporal
        # models (KV-cache step) emit one row per STREAM per tick.
        total = sum(len(v) for v in indices.values())
        lead = jax.tree_util.tree_leaves(outputs)[0].shape[0]
        per_stream_rows = lead == len(indices) and lead != total
        row = 0
        for k, stream in enumerate(sorted(indices)):
            frames = indices[stream]
            n = 1 if per_stream_rows else len(frames)
            start = k if per_stream_rows else row
            sl = jax.tree_util.tree_map(
                lambda o: o[start:start + n], outputs)
            self._frames[stream] += len(frames)
            row += n
            yield StreamResult(stream, frames, sl)

    def run(self, callback: Callable[[StreamResult], None],
            max_batches: Optional[int] = None, inflight: int = 1):
        """Drives stream() to completion, invoking callback per result."""
        for r in self.stream(max_batches, inflight=inflight):
            callback(r)

    # ------------------------------------------------------------- stats

    def stats(self) -> dict:
        """Continuous counters: batches, per-stream frames, result-wait
        latency percentiles (ms — the residual device wait after the
        overlapped host work; ~0 when host-bound), aggregate fps since
        first dispatch."""
        lat = np.asarray(self._lat_ms, np.float64)
        total = int(sum(self._frames))
        dt = (time.perf_counter() - self._t0) if self._t0 else 0.0
        return {
            "batches": self._batches,
            "frames": dict(enumerate(self._frames)),
            "total_frames": total,
            "latency_ms": {
                "p50": float(np.percentile(lat, 50)) if lat.size else None,
                "p95": float(np.percentile(lat, 95)) if lat.size else None,
            },
            "fps": (total / dt) if dt > 0 else 0.0,
        }

    def close(self):
        if self._own_loader:
            self.loader.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

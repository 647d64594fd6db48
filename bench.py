"""Headline benchmark: 1080p H.264 decode -> 224x224 RGB planar float32
jax.Arrays, frames/sec on one chip (BASELINE.json north star: 2000 fps).

Pipeline under test = the real production path: native producer thread
(demux + multithreaded software decode into the NV12 ring) overlapped with
batched TPU VPP dispatches (crop/resize/convert/normalize fused by XLA,
async dispatch so host decode and device compute overlap).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N,
   "stages": {...}, "scaling": {...}}

The `stages` decomposition isolates each budget so a reviewer can see
where the wall-clock goes on the measured host (the end-to-end number is
min-bounded by the slowest stage, decode on a 1-core host):
  decode_fps       demux + SW decode, ring writes, no consumer
                   (measured interleaved with the headline windows;
                   loader_efficiency_vs_decode = headline / decode_fps).
                   NOTE: a conservative denominator — the zero-copy ring
                   defers NV12 packing, so a producer with NO consumer
                   skips the pack/resize work any real consumer forces;
                   host_resize_fps (drain + native resize) is the
                   tighter single-consumer wall, and the headline loader
                   typically lands between the two (batching gains vs
                   host_resize, transfer+dispatch costs vs decode).
  drain_fps        + bulk NV12 copy-out to a consumer (C memcpy path)
  host_resize_fps  + native NV12 resize 1080p -> 224x224 in the drain
  transfer_gbps    host->device device_put of resized NV12 batches
  device_vpp_fps   batched convert+normalize on device, compute only
  pool_aggregate_fps  N pooled streams on shared workers, aggregate decode
  segment_parallel_fps / segment_serial_fps  GOP-parallel reader vs the
                   serial pipeline on the SAME multi-GOP fixture (which
                   decodes ~2.3x slower than billiard; do not compare
                   segment numbers against decode_fps)
  clip_sampling_fps / clip_sampling_efficiency  shuffled random-access
                   clip batches (training input path); efficiency =
                   returned / decoded incl. IDR warm-up

`scaling` measures decode thread scaling when cores allow, and records
the skip reason on hosts where it cannot (TS_BENCH_SCALING=1 forces it).
"""
import ctypes
import json
import os
import time


def _ensure_live_backend(
        probe_seconds=float(os.environ.get("TS_BENCH_PROBE_S", "240"))):
    """The axon TPU tunnel is intermittently dead: jax.devices() (or the
    first dispatch) can hang for minutes, which would lose the round's
    bench artifact entirely. Probe the default backend with a trivial
    op under a watchdog; on timeout, re-exec the bench on the CPU
    backend and mark the result. Runs BEFORE anyone imports jax.
    240s default: the tunnel is sometimes merely slow (~minutes for
    the first op) — prefer a slow chip number over a CPU fallback."""
    import subprocess
    import sys
    if os.environ.get("TS_BENCH_BACKEND_CHECKED"):
        return os.environ.get("TS_BENCH_FALLBACK", "")
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        os.environ["TS_BENCH_BACKEND_CHECKED"] = "1"
        return ""  # already CPU (or explicitly configured): no probe
    # The probe must look like the bench: the tunnel sometimes flickers
    # in a state where small ops land but real transfers stall — a
    # trivial-op probe green-lights a bench that hangs on its first
    # batch. Three rounds of a bench-sized host->device transfer plus a
    # dispatch; if THIS can't finish inside the window, the chip bench
    # would be garbage anyway and the CPU number is the better artifact.
    code = ("import jax, jax.numpy as jnp, numpy as np\n"
            "buf = np.ones(128 * 224 * 336, np.uint8)  # one NV12 batch\n"
            "for _ in range(3):\n"
            "    d = jax.device_put(buf)\n"
            "    (d.astype(jnp.float32).sum()).block_until_ready()\n"
            "print('ok')")
    def _trace(msg):
        if os.environ.get("TS_BENCH_TRACE"):
            with open(os.environ["TS_BENCH_TRACE"], "a") as f:
                f.write(msg + "\n")
    import time as _t
    _t0 = _t.time()
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=probe_seconds, capture_output=True)
        alive = r.returncode == 0 and b"ok" in r.stdout
        _trace(f"probe rc={r.returncode} dt={_t.time()-_t0:.1f} alive={alive}")
    except subprocess.TimeoutExpired:
        alive = False
        _trace(f"probe TIMEOUT dt={_t.time()-_t0:.1f}")
    env = dict(os.environ, TS_BENCH_BACKEND_CHECKED="1")
    if alive:
        os.environ["TS_BENCH_BACKEND_CHECKED"] = "1"
        return ""
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["TS_BENCH_FALLBACK"] = "tpu_tunnel_dead_cpu_fallback"
    if sys.argv and os.path.basename(sys.argv[0]) == "bench.py":
        # bench.py IS the process: restart it clean on the CPU backend.
        # (execve replaces the whole process, so it is safe even though
        # the axon sitecustomize imports jax at interpreter startup —
        # which also means an in-process JAX_PLATFORMS override can
        # never dodge the startup-claimed plugin.)
        _trace("execve -> cpu")
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    # Imported by some other script (or jax already loaded): never
    # re-exec the host process — prime the env for it/subprocesses and
    # report; if jax already claimed the dead backend we can't save it.
    os.environ.update({k: env[k] for k in
                       ("JAX_PLATFORMS", "TS_BENCH_FALLBACK",
                        "TS_BENCH_BACKEND_CHECKED")})
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    return env["TS_BENCH_FALLBACK"]


def _supervised_run():
    """When the TPU probe passes, the bench can STILL stall later (the
    tunnel flickers into a state where small ops land but the first
    big remote compile/transfer hangs). Guarantee an artifact: the
    parent runs the real bench in a child with a deadline
    (TS_BENCH_TPU_TIMEOUT_S, default 1800 s); on timeout/failure it
    reruns on the CPU backend with the fallback marker. Returns True
    in the PARENT (result already printed), False in children."""
    import subprocess
    import sys
    if os.environ.get("TS_BENCH_CHILD"):
        return False
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False  # CPU already: no supervision needed
    deadline = float(os.environ.get("TS_BENCH_TPU_TIMEOUT_S", "1800"))
    env = dict(os.environ, TS_BENCH_CHILD="1")
    argv = [sys.executable] + sys.argv
    import time as _t
    print(f"[bench-supervisor] tpu child, deadline {deadline}s",
          file=sys.stderr, flush=True)
    _t0 = _t.time()
    try:
        r = subprocess.run(argv, env=env, timeout=deadline,
                           capture_output=True, text=True)
        if r.returncode == 0 and r.stdout.strip():
            sys.stdout.write(r.stdout)
            sys.stderr.write(r.stderr[-2000:])
            return True
        reason = f"tpu_bench_failed_rc{r.returncode}_cpu_fallback"
    except subprocess.TimeoutExpired:
        reason = "tpu_bench_hung_cpu_fallback"
    print(f"[bench-supervisor] {reason} after {_t.time()-_t0:.0f}s; "
          "rerunning on CPU", file=sys.stderr, flush=True)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["TS_BENCH_FALLBACK"] = reason
    env["TS_BENCH_BACKEND_CHECKED"] = "1"
    r = subprocess.run(argv, env=env, timeout=deadline,
                       capture_output=True, text=True)
    sys.stdout.write(r.stdout)
    sys.stderr.write(r.stderr[-2000:])
    return True


_FALLBACK = _ensure_live_backend()


VIDEO = os.environ.get(
    "TS_BENCH_VIDEO",
    "/root/reference/tests/resources/billiard_1920x1080_420_100.h264")
# Batch 128 amortizes the per-dispatch overheads (tunnel RPC latency on
# the transfer + program launch) to <0.06 ms/frame; with the 32-slot
# ring the headline then tracks the decode wall within noise on a
# 1-core host. Latency per batch at 128 is ~250 ms — a data-loading
# configuration, not a live-stream one (live consumers use
# read()/read_batch with small batches).
BATCH = int(os.environ.get("TS_BENCH_BATCH", "128"))
TARGET_SECONDS = float(os.environ.get("TS_BENCH_SECONDS", "12"))
STAGE_SECONDS = float(os.environ.get("TS_BENCH_STAGE_SECONDS", "4"))
BASELINE_FPS = 2000.0


def _make_pipeline(lib, decode_threads=0, video=None):
    p = lib.ts_pipeline_create()
    # Ring of 32 regardless of BATCH: bulk cursors drain sequentially
    # with back-pressure, so the ring only needs to cover scheduling
    # jitter — outsized rings just add hundreds of MB of first-touch
    # page faults inside the measurement window.
    sts = lib.ts_pipeline_init_ex(p, (video or VIDEO).encode(), 5, 32,
                                  3, 0, decode_threads, 1, 0)  # FR_FAST, loop
    assert sts == 0, f"pipeline init failed: {sts}"
    return p


def bench_decode_only(lib, seconds, decode_threads=0, video=None):
    """Producer alone: demux + decode + ring stores, no consumer."""
    p = _make_pipeline(lib, decode_threads, video)
    lib.ts_pipeline_start(p)
    time.sleep(0.3)  # spin-up
    f0 = lib.ts_pipeline_frame_index(p)
    t0 = time.perf_counter()
    time.sleep(seconds)
    frames = lib.ts_pipeline_frame_index(p) - f0
    elapsed = time.perf_counter() - t0
    lib.ts_pipeline_stop(p)
    lib.ts_pipeline_destroy(p)
    return frames / elapsed


def _bench_bulk(lib, seconds, resized):
    """Decode + bulk cursor drain (optionally with native host resize)."""
    p = _make_pipeline(lib)
    lib.ts_pipeline_register_cursor(p, b"bench")
    lib.ts_pipeline_start(p)
    w, h = lib.ts_pipeline_width(p), lib.ts_pipeline_height(p)
    ow, oh = (224, 224) if resized else (w, h)
    ys = ctypes.create_string_buffer(BATCH * ow * oh)
    uvs = ctypes.create_string_buffer(BATCH * ow * (oh // 2))
    first = ctypes.c_int(0)
    frames = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        if resized:
            got = lib.ts_pipeline_get_batch_resized(
                p, b"bench", BATCH, ow, oh, 1, ys, uvs, ctypes.byref(first))
        else:
            got = lib.ts_pipeline_get_batch(p, b"bench", BATCH, ys, uvs,
                                            ctypes.byref(first))
        if got <= 0:
            break
        frames += got
    elapsed = time.perf_counter() - t0
    lib.ts_pipeline_stop(p)
    lib.ts_pipeline_destroy(p)
    return frames / elapsed


def bench_transfer(seconds):
    """Steady-state host->HBM device_put of resized NV12 batches."""
    import jax
    import numpy as np

    nbytes = BATCH * 224 * 224 * 3 // 2
    bufs = [np.random.randint(0, 255, nbytes, np.uint8) for _ in range(2)]
    dev = jax.devices()[0]
    jax.device_put(bufs[0], dev).block_until_ready()  # warm
    total = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        jax.device_put(bufs[total % 2], dev).block_until_ready()
        total += nbytes
    elapsed = time.perf_counter() - t0
    return total / elapsed / 1e9, (total / nbytes) * BATCH / elapsed


def bench_device_vpp(seconds):
    """Batched convert+normalize on device, compute only (input already
    resident): the post-host-resize VPP program of the headline path."""
    import jax
    import numpy as np

    from tensor_stream_tpu import FourCC, Planes
    from tensor_stream_tpu.ops.vpp import VPPConfig, build_vpp_batched_flat

    cfg = VPPConfig(src_width=224, src_height=224, fourcc=FourCC.RGB24,
                    planes=Planes.PLANAR, normalization=True)
    fn = build_vpp_batched_flat(cfg, BATCH)
    flat = jax.device_put(np.random.randint(
        0, 255, BATCH * 224 * 224 * 3 // 2, np.uint8), jax.devices()[0])
    jax.block_until_ready(fn(flat))  # compile
    frames = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        out = fn(flat)
        frames += BATCH
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    return frames / elapsed


def bench_device_augment(seconds):
    """Batched convert + fused training augmentation on device, compute
    only: the clip loaders' augment=AugmentConfig(...) program
    (RandomResizedCrop + flip + full ColorJitter + normalize on top of
    the headline VPP). Compare with device_vpp_fps — the delta is the
    entire device cost of augmentation."""
    import jax
    import numpy as np

    from tensor_stream_tpu import AugmentConfig, FourCC, Planes
    from tensor_stream_tpu.ops.vpp import (VPPConfig,
                                           build_vpp_clip_augment)

    clip_len = 8
    clips = max(1, BATCH // clip_len)
    cfg = VPPConfig(src_width=224, src_height=224, fourcc=FourCC.RGB24,
                    planes=Planes.PLANAR, normalization=True)
    aug = AugmentConfig(width=224, height=224, scale=(0.3, 1.0),
                        ratio=(0.75, 4 / 3), hflip=0.5, brightness=0.4,
                        contrast=0.4, saturation=0.4, hue=0.05,
                        mean=(0.45, 0.45, 0.45), std=(0.225, 0.225, 0.225))
    fn = build_vpp_clip_augment(cfg, aug, clips, clip_len, 0)
    n = clips * clip_len
    flat = jax.device_put(np.random.randint(
        0, 255, n * 224 * 224 * 3 // 2, np.uint8), jax.devices()[0])
    ids = np.stack([np.zeros(clips, np.int32),
                    np.arange(clips, dtype=np.int32)], axis=1)
    jax.block_until_ready(fn(flat, ids))  # compile
    frames = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        out = fn(flat, ids)
        frames += n
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    return frames / elapsed


def bench_pool_aggregate(lib, seconds, n_streams=4, workers=0):
    """Aggregate decode fps of N pooled streams on shared workers
    (ts::StreamPool) — the many-stream serving path. On a 1-core host
    this sits at the single-stream decode wall (the workers share the
    core); on a real TPU-VM host it scales with `workers` toward
    cores * per-stream decode."""
    workers = workers or max(1, (os.cpu_count() or 1) - 1)
    pool = lib.ts_pool_create(workers)
    for _ in range(n_streams):
        idx = lib.ts_pool_add_stream(pool, VIDEO.encode(), 16, 1, 0)
        assert idx >= 0
    assert lib.ts_pool_start(pool) == 0
    time.sleep(0.3)
    handles = [lib.ts_pool_stream(pool, k) for k in range(n_streams)]
    f0 = sum(lib.ts_pipeline_frame_index(h) for h in handles)
    t0 = time.perf_counter()
    time.sleep(seconds)
    frames = sum(lib.ts_pipeline_frame_index(h) for h in handles) - f0
    elapsed = time.perf_counter() - t0
    lib.ts_pool_stop(pool)
    lib.ts_pool_destroy(pool)
    return frames / elapsed


_SEGMENT_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures",
    "bench_1920x1080_gop25_200.h264")


def bench_segment_parallel(lib, seconds, workers=0):
    """GOP/segment-parallel decode throughput (csrc/segment_reader.cpp):
    N decoder instances over keyframe-split chunks of a multi-GOP 1080p
    fixture, per-slot resized to 224x224 in the workers, stitched
    bit-exactly into serial order (tests/test_segment_parallel.py).
    ~1x the serial wall on this 1-core host by construction; the stage
    exists to measure the decode-scaling architecture on multi-core
    TPU-VM hosts, where it is the only path past frame-threading.

    NOT comparable to `decode_fps`: splitting needs periodic IDRs, so
    this stage runs its own multi-GOP fixture, which decodes ~2.3x
    slower than billiard (8x the keyframes, 2x the bitrate). Compare
    against `segment_serial_fps` — the SAME fixture through the serial
    pipeline — for the parallel-vs-serial story."""
    workers = workers or min(4, os.cpu_count() or 1)
    fixture = _SEGMENT_FIXTURE
    s = lib.ts_segmented_create(fixture.encode(), workers, 64, 1,
                                224, 224, 1, 1, 0, 48)
    if not s:
        return 0.0
    lib.ts_segmented_start(s)
    ys = ctypes.create_string_buffer(BATCH * 224 * 224)
    uvs = ctypes.create_string_buffer(BATCH * 224 * 112)
    first = ctypes.c_int(0)
    frames = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        got = lib.ts_segmented_get_batch(s, BATCH, ys, uvs,
                                         ctypes.byref(first))
        if got <= 0:
            break
        frames += got
    elapsed = time.perf_counter() - t0
    lib.ts_segmented_stop(s)
    lib.ts_segmented_destroy(s)
    return frames / elapsed


def bench_clip_sampling(lib, seconds, workers=0, mode="segment"):
    """Shuffled random-access clip sampling (csrc/clip_reader.cpp):
    epochs of 8-frame clips from the multi-GOP fixture in batches of 8,
    resized to 224x224 in the workers — the video-model training input
    path. The epoch order is exactly ClipLoader._epoch_order's:
    mode="segment" (the recommended training config: segments permuted,
    clips shuffled within, each GOP decoded ~once via the native
    ride-chains) or mode="uniform" (full permutation — pays IDR warm-up
    per random clip; kept for comparability with earlier rounds).
    Reports returned-frames/sec plus the sampling efficiency
    (returned / decoded incl. warm-up). Same fixture caveat as the
    segment stage: compare against segment_serial_fps, not
    decode_fps."""
    import numpy as np

    workers = workers or min(4, os.cpu_count() or 1)
    p = lib.ts_clip_create(_SEGMENT_FIXTURE.encode(), workers, 224, 224, 1,
                           1, 0)
    if not p:
        return 0.0, 0.0
    total = lib.ts_clip_total_frames(p)
    nseg = lib.ts_clip_segments(p)
    firsts = np.empty(nseg, np.int64)
    lib.ts_clip_segment_table(
        p, firsts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), nseg)
    clip_len, clips = 8, 8
    starts_all = np.arange(0, total - clip_len + 1, clip_len, dtype=np.int64)

    def epoch_order(epoch):  # = data._ClipLoaderBase._epoch_order
        rng = np.random.default_rng(epoch)
        if mode == "uniform":
            return rng.permutation(starts_all)
        keys = np.searchsorted(firsts, starts_all, side="right") - 1
        uniq, inv = np.unique(keys, return_inverse=True)
        rank = rng.permutation(len(uniq))[inv]
        return starts_all[np.argsort(rank, kind="stable")]

    ys = np.empty(clips * clip_len * 224 * 224, np.uint8)
    uvs = np.empty(clips * clip_len * 112 * 224, np.uint8)
    frames, epoch, cur = 0, 0, 0
    order = epoch_order(0)
    t0 = time.perf_counter()
    # Run WHOLE epochs (finish the current epoch once time expires):
    # efficiency is a steady-state per-epoch property; a partial epoch
    # over- or under-weights its cold seeks depending where it stops.
    while time.perf_counter() - t0 < seconds or cur > 0:
        if cur + clips > len(order):
            epoch, cur = epoch + 1, 0
            order = epoch_order(epoch)
            continue
        batch = np.ascontiguousarray(order[cur:cur + clips])
        cur += clips
        arr = batch.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))
        if lib.ts_clip_get_batch(p, arr, clips, clip_len, 1,
                                 ys.ctypes.data, uvs.ctypes.data) != 0:
            break
        frames += clips * clip_len
    elapsed = time.perf_counter() - t0
    decoded = lib.ts_clip_frames_decoded(p)
    lib.ts_clip_destroy(p)
    return frames / elapsed, frames / max(int(decoded), 1)


def bench_serving(seconds, n_streams=2, per_stream=8):
    """StreamInferencer end-to-end: N streams of the 1080p fixture →
    one batched 224² RGB dispatch per tick → a jitted reduction model,
    double-buffered (decode overlaps device compute). Reports served
    frames/sec across all streams — the many-camera inference path
    (the headline measures one stream's data-loading path)."""
    import jax
    import jax.numpy as jnp

    from tensor_stream_tpu.enums import FourCC, Planes
    from tensor_stream_tpu.serving import StreamInferencer

    @jax.jit
    def model(batch):
        return batch.astype(jnp.float32).mean(axis=(1, 2, 3))

    eng = StreamInferencer(
        [VIDEO] * n_streams, model, per_stream=per_stream,
        width=224, height=224, host_resize=True,
        pixel_format=FourCC.RGB24, planes_pos=Planes.MERGED, loop=True)
    try:
        it = eng.stream()
        for _ in range(n_streams):   # drain batch 1 fully: pay all
            next(it)                 # compiles before the timed window
        t0 = time.perf_counter()
        frames = 0
        while time.perf_counter() - t0 < seconds:
            frames += len(next(it).frames)
        return frames / (time.perf_counter() - t0)
    finally:
        eng.close()


def bench_fast_read_latency(lib, n_reads=200):
    """p50/p95 per-read latency of FAST-mode latest-frame reads (NV12,
    no VPP): the quantitative counterpart of the reference's ~3 ms/frame
    FAST assertion (WrapperTests.cpp:303-309). Each GetFrame wakes on a
    FRESH decoded frame, so the p50 tracks the decode cadence; the tail
    shows scheduler jitter on the measured host."""
    p = _make_pipeline(lib)
    lib.ts_pipeline_start(p)
    w, h = lib.ts_pipeline_width(p), lib.ts_pipeline_height(p)
    y = ctypes.create_string_buffer(w * h)
    uv = ctypes.create_string_buffer(w * (h // 2))
    lib.ts_pipeline_get(p, b"lat", 0, y, uv)  # register + first frame
    lat = []
    for _ in range(n_reads):
        t0 = time.perf_counter()
        if lib.ts_pipeline_get(p, b"lat", 0, y, uv) < 0:
            break
        lat.append(time.perf_counter() - t0)
    lib.ts_pipeline_stop(p)
    lib.ts_pipeline_destroy(p)
    if not lat:
        return {}
    lat.sort()
    return {"fast_read_p50_ms": round(1e3 * lat[len(lat) // 2], 3),
            "fast_read_p95_ms": round(1e3 * lat[int(len(lat) * 0.95)], 3)}


def bench_scaling(lib):
    """Decode thread-count sweep — the proof that the decode wall scales
    with host cores. Skipped (with reason) when the host cannot show
    scaling."""
    cores = os.cpu_count() or 1
    if cores < 4 and not os.environ.get("TS_BENCH_SCALING"):
        return {"cpu_cores": cores,
                "skipped": f"host has {cores} core(s); decode is "
                           "CPU-bound and cannot scale below 4 cores "
                           "(set TS_BENCH_SCALING=1 to force)"}
    sweep = {}
    seg_sweep = {}
    for threads in (1, 2, 4, min(8, cores)):
        if threads > cores:
            break
        sweep[str(threads)] = round(
            bench_decode_only(lib, STAGE_SECONDS / 2, threads), 1)
        # The segment-parallel sweep is the decode-scaling proof that
        # frame-threading alone cannot give (~2-3x ceiling): N workers
        # over disjoint GOP chunks scale decode ~linearly with cores.
        seg_sweep[str(threads)] = round(
            bench_segment_parallel(lib, STAGE_SECONDS / 2, threads), 1)
    return {"cpu_cores": cores, "decode_fps_by_threads": sweep,
            "segment_parallel_fps_by_workers": seg_sweep}


def _headline_window(loader, seconds):
    import jax

    frames = 0
    pending = None
    start = time.perf_counter()
    while time.perf_counter() - start < seconds:
        out, _ = next(loader)
        pending = out  # async dispatch; don't block inside the loop
        frames += out.shape[0]
    if pending is not None:
        jax.block_until_ready(pending)
    return frames / (time.perf_counter() - start)


def bench_headline_and_decode(lib):
    """Headline loader fps and the decode-only wall, measured in
    INTERLEAVED windows (h, d, h, d, h, d) so both sample the same host
    noise regime — measured a minute apart on this shared 1-core box the
    two regularly land in different hypervisor-steal regimes and the
    headline/decode efficiency ratio comes out meaningless (even > 1).
    Best-of over the windows: transient stalls only ever subtract, so
    the max is the stable capability estimate (see _best_of)."""
    import jax

    from tensor_stream_tpu import FourCC, FrameLoader, Planes, ResizeType

    best_h, best_d = 0.0, 0.0
    for i in range(3):
        # Ring of 32 regardless of BATCH (bulk cursors drain with
        # back-pressure): measured on the 1-core host, ring 64 costs
        # ~40 fps of headline vs ring 32 — outsized rings pay
        # first-touch page faults and evict the resize working set.
        loader = FrameLoader(VIDEO, batch=BATCH, prefetch=3,
                             host_resize=True, buffer_size=32, loop=True,
                             width=224, height=224,
                             resize_type=ResizeType.BILINEAR,
                             pixel_format=FourCC.RGB24,
                             planes_pos=Planes.PLANAR, normalization=True)
        if i == 0:  # warm the jit cache before the first timed window
            out, _ = next(loader)
            jax.block_until_ready(out)
        best_h = max(best_h, _headline_window(loader, TARGET_SECONDS / 2))
        loader.close()
        best_d = max(best_d, bench_decode_only(lib, STAGE_SECONDS))
    return best_h, best_d


def _best_of(n, fn, *args):
    """Capability measurement on a noisy shared host: transient stalls
    only ever subtract, so the max over n windows is the stable
    estimate (a single window regularly inverts the stage ordering)."""
    return max(fn(*args) for _ in range(n))


def main():
    from tensor_stream_tpu import _native

    lib = _native.load()
    fps, decode_fps = bench_headline_and_decode(lib)
    transfer_gbps, transfer_fps = bench_transfer(STAGE_SECONDS / 2)
    half = STAGE_SECONDS / 2
    stages = {
        # decode_fps is measured interleaved with the headline windows
        # (same noise regime — it is the headline's denominator):
        # headline/decode_fps = loader efficiency.
        "decode_fps": round(decode_fps, 1),
        "loader_efficiency_vs_decode": round(fps / max(decode_fps, 1e-9), 3),
        "drain_fps": round(_best_of(2, _bench_bulk, lib, half, False), 1),
        "host_resize_fps": round(_best_of(2, _bench_bulk, lib, half, True), 1),
        "transfer_gbps": round(transfer_gbps, 3),
        "transfer_fps_at_224": round(transfer_fps, 1),
        "device_vpp_fps": round(bench_device_vpp(STAGE_SECONDS), 1),
        "augment_vpp_fps": round(bench_device_augment(half), 1),
        "pool_aggregate_fps": round(
            _best_of(2, bench_pool_aggregate, lib, half), 1),
        "segment_parallel_fps": round(
            _best_of(2, bench_segment_parallel, lib, half), 1),
        # The serial wall of the segment fixture itself (it decodes
        # ~2.3x slower than billiard — 8x the keyframes, 2x the
        # bitrate): segment_parallel_fps / segment_serial_fps is the
        # parallel-vs-serial ratio, ~0.93x on this 1-core host and
        # ~workers x on multi-core ones.
        "segment_serial_fps": round(
            _best_of(2, bench_decode_only, lib, half, 0, _SEGMENT_FIXTURE),
            1),
        **bench_fast_read_latency(lib),
    }
    clip_fps, clip_eff = bench_clip_sampling(lib, half, mode="segment")
    stages["clip_sampling_fps"] = round(clip_fps, 1)
    stages["clip_sampling_efficiency"] = round(clip_eff, 3)
    uni_fps, uni_eff = bench_clip_sampling(lib, half / 2, mode="uniform")
    stages["clip_uniform_fps"] = round(uni_fps, 1)
    stages["clip_uniform_efficiency"] = round(uni_eff, 3)
    stages["serving_fps"] = round(bench_serving(half), 1)
    result = {
        "metric": "1080p_decode_to_224px_rgb_planar_f32_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "stages": stages,
        "scaling": bench_scaling(lib),
    }
    if _FALLBACK or os.environ.get("TS_BENCH_FALLBACK"):
        result["backend_fallback"] = (_FALLBACK or
                                      os.environ["TS_BENCH_FALLBACK"])
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    if not _supervised_run():
        main()

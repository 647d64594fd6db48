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
    # 3300 s: the r05 stage list adds ~6 remote compiles (serving model
    # MHA+GQA, long-S joint flash+xla, scan-timed flash loops) on top of
    # r04's ~25 min — the deadline exists to catch a HUNG tunnel, not to
    # truncate a slow-but-progressing run.
    deadline = float(os.environ.get("TS_BENCH_TPU_TIMEOUT_S", "3300"))
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
# The tunnel's HONEST per-dispatch round-trip floor (device_get-synced,
# see probe_link) measures ~28 ms steady on this rig — it is a network
# tunnel RTT, not a local PCIe hop, and async-dispatch throughput paths
# never pay it per batch. Degraded = well above that norm.
DEGRADED_DISPATCH_MS = 80.0


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
    handles = [lib.ts_pool_stream(pool, k) for k in range(n_streams)]
    # State-based warm-up: a fresh pool first-touches ~190 MB of ring +
    # DPB pages (rings x streams), and on this virtualized host a fault
    # can cost ~25 us once the page was returned to the hypervisor — the
    # r04 artifact's 6.3 fps was this spin-up, not steady state (traced:
    # fault storm ends after ~1 s, then 0 faults/s at 500+ fps). Wait
    # until every stream is past its ring fill (or 10 s), THEN measure.
    warm_deadline = time.perf_counter() + 10.0
    while time.perf_counter() < warm_deadline:
        if min(lib.ts_pipeline_frame_index(h) for h in handles) >= 32:
            break
        time.sleep(0.1)
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


def bench_serving(seconds, n_streams=2, per_stream=8,
                  pipeline="fused"):
    """StreamInferencer end-to-end: N streams of the 1080p fixture →
    batched 224² RGB → a jitted reduction model, double-buffered
    (decode overlaps device compute). Reports served frames/sec across
    all streams — the many-camera inference path (the headline measures
    one stream's data-loading path). pipeline="fused" is the
    recommended production config: streams share one native worker
    pool + flat staging buffer and the model traces INTO the VPP
    program — ONE device dispatch per tick (the per-stream engine pays
    2 dispatches + a concat per stream per tick, which is pure dispatch
    overhead on a remote-tunnel chip). inflight=2 keeps two ticks'
    results in flight so each result wait's RTT overlaps the next
    tick's decode+transfer — the throughput-serving config;
    latency-first deployments keep the default inflight=1."""
    import jax.numpy as jnp

    from tensor_stream_tpu.enums import FourCC, Planes
    from tensor_stream_tpu.serving import StreamInferencer

    def model(batch):
        return batch.astype(jnp.float32).mean(axis=(1, 2, 3))

    eng = StreamInferencer(
        [VIDEO] * n_streams, model, per_stream=per_stream,
        pipeline=pipeline, width=224, height=224, host_resize=True,
        pixel_format=FourCC.RGB24, planes_pos=Planes.MERGED, loop=True)
    try:
        it = eng.stream(inflight=2 if pipeline == "fused" else 1)
        # Warm 3 full ticks, not 1: the first pays the jit compile, and
        # the shared pool's decode workers ramp over the next few (r05
        # trial: a 1-tick warm + 1 s window recorded 114 fps where 3 s
        # steady-state windows measure 320-430 — spin-up, not serving).
        for _ in range(3 * n_streams):
            next(it)
        t0 = time.perf_counter()
        frames = 0
        while time.perf_counter() - t0 < seconds:
            frames += len(next(it).frames)
        lat = eng.stats()["latency_ms"]
        return frames / (time.perf_counter() - t0), lat
    finally:
        eng.close()


def bench_serving_stream_model(seconds, n_streams=2):
    """Serving with a REAL temporal model in the dispatch (r04 verdict
    items 2/7 — the serving numbers must not be toy-mean artifacts):
    the streaming KV-cache VideoViT rides the StreamInferencer carry
    path. N streams decode through native producers, each tick feeds
    one tubelet per stream to stream_step and the cache chains
    device-side (dispatch stays async, inflight=2). Measured twice —
    MHA (6 kv heads) and GQA (2 kv heads), same ring window
    (max_steps=16 == the batch model's temporal_window) — so the
    artifact shows the KV-cache memory lever (bytes shrink by the
    group factor) and that GQA costs no throughput (>= ~1x)."""
    import functools

    import jax
    import jax.numpy as jnp

    from tensor_stream_tpu.enums import FourCC, Planes
    from tensor_stream_tpu.models.streaming import (init_stream_cache,
                                                    stream_step)
    from tensor_stream_tpu.models.video_vit import VideoViT
    from tensor_stream_tpu.serving import StreamInferencer

    depth, dim, heads, tub, max_steps = 4, 384, 6, 2, 16

    def run(kv_heads):
        model = VideoViT(num_classes=400, depth=depth, dim=dim,
                         num_heads=heads, num_kv_heads=kv_heads,
                         patch=16, tubelet_t=tub, causal=True,
                         compute_dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        clips = jnp.zeros((1, tub * max_steps, 224, 224, 3), jnp.float32)
        params = model.init(rng, clips)
        cache = init_stream_cache(model, params, batch=n_streams,
                                  max_steps=max_steps)
        kv_bytes = sum(x.size * x.dtype.itemsize
                       for blk in cache["blocks"] for x in blk.values())
        step = jax.jit(functools.partial(stream_step, model, params))
        eng = StreamInferencer(
            [VIDEO] * n_streams, step, per_stream=tub, carry=cache,
            width=224, height=224, host_resize=True,
            pixel_format=FourCC.RGB24, planes_pos=Planes.MERGED,
            normalization=True, loop=True)
        try:
            it = eng.stream(inflight=2)
            for _ in range(3 * n_streams):  # compile + fill the pipeline
                next(it)
            t0 = time.perf_counter()
            results = 0
            while time.perf_counter() - t0 < seconds:
                next(it)
                results += 1
            dt = time.perf_counter() - t0
        finally:
            eng.close()
        # One result per stream per tick; each tick advances every
        # stream by one tubelet (tub frames).
        return results / n_streams / dt, kv_bytes

    gqa_rate, gqa_bytes = run(2)
    mha_rate, mha_bytes = run(None)
    return {
        "serving_model_steps_per_s": round(gqa_rate, 2),
        "serving_model_fps": round(gqa_rate * n_streams * tub, 1),
        "serving_model_kv_mb": round(gqa_bytes / 2 ** 20, 2),
        "serving_model_kv_mb_mha": round(mha_bytes / 2 ** 20, 2),
        "serving_model_kv_ratio": round(mha_bytes / gqa_bytes, 2),
        "serving_model_gqa_vs_mha": round(
            gqa_rate / max(mha_rate, 1e-9), 3),
    }


def bench_fast_read_latency(lib, n_reads=200, windows=2):
    """p50/p95 per-read latency of STEADY-STATE FAST-mode latest-frame
    reads (NV12, no VPP): the quantitative counterpart of the
    reference's ~3 ms/frame FAST assertion (WrapperTests.cpp:303-309).
    Each GetFrame wakes on a FRESH decoded frame, so the p50 tracks the
    decode cadence and the tail the decode cadence's VARIANCE. Traced
    tail anatomy on this host (r3 verdict item 5): (a) the first ~30
    reads ride the decoder/ring spin-up at 3-4x cadence — excluded here
    by a 0.5 s warm-up, as latency SLOs are steady-state; (b) reads
    landing on the file-loop wrap pay the IDR decode (a full intra
    1080p frame, ~3-4x a P frame) — intrinsic codec cost, reported, not
    excluded; (c) hypervisor-steal spikes on this shared 1-core box —
    best-of-N windows (noise only ever adds; see _best_of).
    fast_read_tail_ok asserts the p95 <= 3x p50 budget."""
    p = _make_pipeline(lib)
    lib.ts_pipeline_start(p)
    w, h = lib.ts_pipeline_width(p), lib.ts_pipeline_height(p)
    y = ctypes.create_string_buffer(w * h)
    uv = ctypes.create_string_buffer(w * (h // 2))
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 0.5:  # spin-up: ring fill, threads
        lib.ts_pipeline_get(p, b"lat", 0, y, uv)
    best = None
    for _ in range(windows):
        lat = []
        for _ in range(n_reads):
            t0 = time.perf_counter()
            if lib.ts_pipeline_get(p, b"lat", 0, y, uv) < 0:
                break
            lat.append(time.perf_counter() - t0)
        if not lat:
            break
        lat.sort()
        win = (lat[int(len(lat) * 0.95)], lat[len(lat) // 2],
               lat[int(len(lat) * 0.99)])
        if best is None or win < best:
            best = win
    lib.ts_pipeline_stop(p)
    lib.ts_pipeline_destroy(p)
    if best is None:
        return {}
    p95, p50, p99 = best
    return {"fast_read_p50_ms": round(1e3 * p50, 3),
            "fast_read_p95_ms": round(1e3 * p95, 3),
            "fast_read_p99_ms": round(1e3 * p99, 3),
            "fast_read_tail_ok": bool(p95 <= 3 * p50)}


def probe_link(seconds=1.0):
    """Link-health stamp for the artifact of record: per-dispatch floor
    (jit of a 128-float add, round-tripped) on the device tunnel. With
    stages.transfer_gbps this explains any headline residual — r03's
    headline recorded tunnel weather (0.193 GB/s vs r02's 1.37) with
    nothing in the artifact saying so.

    Synced per dispatch via `device_get` of the result: on the remote
    plugin `block_until_ready` sometimes returns before execution (the
    same quirk bench_vit_train documents) — r05's trial run recorded
    0.04 ms window probes next to a 27 ms end-of-run floor, two
    readings of the SAME tunnel, one of them a lie. A host round-trip
    of the value cannot lie."""
    import jax
    import numpy as np

    dev = jax.devices()[0]
    x = jax.device_put(np.zeros(128, np.float32), dev)
    f = jax.jit(lambda a: a + 1.0)
    float(jax.device_get(f(x)[0]))
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        float(jax.device_get(f(x)[0]))
        n += 1
    return 1e3 * (time.perf_counter() - t0) / max(n, 1)


_PEAK_BF16 = {
    # chip -> dense bf16 peak FLOP/s (public spec sheets)
    "TPU v5 lite": 197e12, "TPU v5e": 197e12,
    "TPU v5": 459e12, "TPU v5p": 459e12,
    "TPU v4": 275e12, "TPU v6 lite": 918e12, "TPU v6e": 918e12,
}


def _vit_train_flops(B, t_tok, s_tok, dim, depth, mult, patch, tub):
    """Analytic matmul FLOPs of one VideoViT train step (fwd + bwd ~= 3x
    fwd): per block 2 attention sublayers (qkvo = 8·N·d² each) + MLP
    (16·N·d² at mult=4) + attention scores 4·N·S·d per sublayer, plus
    the tubelet embedding. Elementwise/LN/softmax FLOPs are excluded —
    MFU here is MXU utilization, the number that says whether the
    matmuls saturate the systolic array."""
    n_tok = B * t_tok * s_tok
    per_block = (16 * dim * dim            # 2 x qkvo
                 + 4 * mult * dim * dim    # MLP fc1+fc2
                 ) * n_tok + 4 * n_tok * dim * (s_tok + t_tok)
    embed = 2 * n_tok * (patch * patch * 3 * tub) * dim
    return 3 * (depth * per_block + embed)


def bench_vit_train(steps=16):
    """Model-layer training throughput on the chip: a ViT-B-class
    VideoViT (dim 768, depth 12, factorized space-time attention, bf16
    compute AND bf16 residual stream / f32 params+optimizer+LayerNorms
    — the training-throughput config; bf16 residuals halve activation
    HBM traffic, 54.7 -> 51.7 ms/step measured, and larger batches do
    NOT raise MFU further: B=16 measures 0.41 vs B=8's 0.44) over
    [8, 8, 224, 224, 3] clips. Reports step time, tokens/s and MFU vs
    the chip's bf16 peak. Inputs are device-resident (the data path has
    its own stages); steps dispatch async and sync once, so the number
    is device throughput, not tunnel round-trips. Target (documented in
    BASELINE.md): >= 0.4 MFU — the typical well-fused transformer range
    on this class of hardware; the reference has no model layer to
    compare (its one example is per-frame CNN inference)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tensor_stream_tpu.models.video_vit import VideoViT

    B, T, H, W = 8, 8, 224, 224
    dim, depth, heads, patch, tub, mult = 768, 12, 12, 16, 2, 4
    model = VideoViT(num_classes=1000, depth=depth, dim=dim,
                     num_heads=heads, patch=patch, tubelet_t=tub,
                     hidden_mult=mult, compute_dtype=jnp.bfloat16,
                     residual_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    clips = jax.random.normal(rng, (B, T, H, W, 3), jnp.float32)
    labels = jax.random.randint(rng, (B,), 0, 1000)
    params = model.init(rng, clips)
    tx = optax.sgd(1e-3, momentum=0.9)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, clips, labels):
        def loss_fn(p):
            logits = model.apply(p, clips)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    @jax.jit
    def digest(params):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(params))

    params, opt, loss = step(params, opt, clips, labels)  # compile
    float(jax.device_get(digest(params)))
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt, loss = step(params, opt, clips, labels)
    # Sync via device_get of a value DATA-DEPENDENT on the whole chain:
    # on the remote-tunnel plugin block_until_ready is unreliable (it
    # sometimes returns before execution — measured 2.7 "ms/step" vs
    # the true 54), and a host round-trip of a chain-dependent scalar
    # is the one sync that cannot lie. One RTT amortized over `steps`.
    float(jax.device_get(digest(params)))
    dt = (time.perf_counter() - t0) / steps
    t_tok, s_tok = T // tub, (H // patch) * (W // patch)
    tokens = B * t_tok * s_tok
    flops = _vit_train_flops(B, t_tok, s_tok, dim, depth, mult, patch, tub)
    peak = _PEAK_BF16.get(jax.devices()[0].device_kind)
    return {
        "vit_train_step_ms": round(1e3 * dt, 2),
        "vit_train_tokens_per_s": round(tokens / dt, 1),
        "vit_train_tflops": round(flops / dt / 1e12, 2),
        "vit_train_mfu": round(flops / dt / peak, 4) if peak else None,
    }


def bench_vit_train_joint(steps=12):
    """Joint space-time VideoViT train step (attention="joint": all
    T'·N = 1568 tokens attend at once) with the flash kernel vs the
    materialized path — the kernel in a PRODUCTION train step, not a
    micro-bench. Same token count as the factorized stage (6272/step:
    B=4, T=16 vs B=8, T=8), so the two MFUs compare directly; the
    analytic FLOPs include the O(S²) score matmuls (flash's backward
    recompute is NOT counted — MFU stays the useful-work metric).
    Reports both step times, the speedup, and flash-path MFU."""
    import jax
    import jax.numpy as jnp
    import optax

    from tensor_stream_tpu.models.video_vit import VideoViT

    B, T, H, W = 4, 16, 224, 224
    dim, depth, heads, patch, tub, mult = 768, 12, 12, 16, 2, 4
    rng = jax.random.PRNGKey(0)
    clips = jax.random.normal(rng, (B, T, H, W, 3), jnp.float32)
    labels = jax.random.randint(rng, (B,), 0, 1000)
    tx = optax.sgd(1e-3, momentum=0.9)
    t_tok, s_tok = T // tub, (H // patch) * (W // patch)
    s_joint = t_tok * s_tok                     # 1568
    n_tok = B * s_joint

    def run(use_flash):
        model = VideoViT(num_classes=1000, depth=depth, dim=dim,
                         num_heads=heads, patch=patch, tubelet_t=tub,
                         hidden_mult=mult, compute_dtype=jnp.bfloat16,
                         residual_dtype=jnp.bfloat16, attention="joint",
                         use_flash=use_flash)
        params = model.init(rng, clips)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, clips, labels):
            def loss_fn(p):
                logits = model.apply(p, clips)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt)
            return optax.apply_updates(params, updates), opt, loss

        @jax.jit
        def digest(params):
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree_util.tree_leaves(params))

        params, opt, _ = step(params, opt, clips, labels)  # compile
        float(jax.device_get(digest(params)))
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt, _ = step(params, opt, clips, labels)
        float(jax.device_get(digest(params)))   # chain-dependent sync
        return (time.perf_counter() - t0) / steps

    dt_flash = run(True)
    dt_xla = run(False)
    per_block = (8 * dim * dim + 4 * mult * dim * dim) * n_tok \
        + 4 * n_tok * s_joint * dim
    embed = 2 * n_tok * (patch * patch * 3 * tub) * dim
    flops = 3 * (depth * per_block + embed)
    peak = _PEAK_BF16.get(jax.devices()[0].device_kind)
    return {
        "vit_joint_step_ms": round(1e3 * dt_flash, 2),
        "vit_joint_step_ms_noflash": round(1e3 * dt_xla, 2),
        "vit_joint_flash_speedup": round(dt_xla / dt_flash, 3),
        "vit_joint_tokens_per_s": round(n_tok / dt_flash, 1),
        "vit_joint_mfu": round(flops / dt_flash / peak, 4) if peak
        else None,
    }


def bench_vit_train_joint_long(steps=3):
    """Long-S joint train step: 448² frames, T=16 → S = 8·784 = 6272
    joint tokens — the regime the flash kernel exists for, in a FULL
    production train step (r04 verdict item 4's long-S point). Both
    paths run remat=True: the materialized path's [S, S] f32 logits are
    1.9 GB/layer and cannot live across the backward at this S (that is
    the point), and remat must match for a fair speedup. Reports the
    flash-path step time/MFU and the speedup over the materialized
    path; the XLA path is its own try (it may legitimately OOM — that
    outcome is recorded, not hidden)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tensor_stream_tpu.models.video_vit import VideoViT

    B, T, H, W = 1, 16, 448, 448
    dim, depth, heads, patch, tub, mult = 768, 12, 12, 16, 2, 4
    rng = jax.random.PRNGKey(0)
    clips = jax.random.normal(rng, (B, T, H, W, 3), jnp.float32)
    labels = jax.random.randint(rng, (B,), 0, 1000)
    tx = optax.sgd(1e-3, momentum=0.9)
    t_tok, s_tok = T // tub, (H // patch) * (W // patch)
    s_joint = t_tok * s_tok                     # 6272
    n_tok = B * s_joint

    def run(use_flash):
        model = VideoViT(num_classes=1000, depth=depth, dim=dim,
                         num_heads=heads, patch=patch, tubelet_t=tub,
                         hidden_mult=mult, compute_dtype=jnp.bfloat16,
                         residual_dtype=jnp.bfloat16, attention="joint",
                         remat=True, use_flash=use_flash)
        params = model.init(rng, clips)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, clips, labels):
            def loss_fn(p):
                logits = model.apply(p, clips)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt)
            return optax.apply_updates(params, updates), opt, loss

        @jax.jit
        def digest(params):
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree_util.tree_leaves(params))

        params, opt, _ = step(params, opt, clips, labels)  # compile
        float(jax.device_get(digest(params)))
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt, _ = step(params, opt, clips, labels)
        float(jax.device_get(digest(params)))   # chain-dependent sync
        return (time.perf_counter() - t0) / steps

    dt_flash = run(True)
    per_block = (8 * dim * dim + 4 * mult * dim * dim) * n_tok \
        + 4 * n_tok * s_joint * dim
    embed = 2 * n_tok * (patch * patch * 3 * tub) * dim
    flops = 3 * (depth * per_block + embed)
    peak = _PEAK_BF16.get(jax.devices()[0].device_kind)
    out = {
        "vit_joint_long_step_ms": round(1e3 * dt_flash, 2),
        "vit_joint_long_tokens_per_s": round(n_tok / dt_flash, 1),
        "vit_joint_long_mfu": round(flops / dt_flash / peak, 4) if peak
        else None,
    }
    try:
        dt_xla = run(False)
        out["vit_joint_long_flash_speedup"] = round(dt_xla / dt_flash, 3)
    except Exception as e:
        out["vit_joint_long_xla_error"] = f"{type(e).__name__}: {e}"[:160]
    return out


def bench_flash_attention(heads=8, d=64):
    """Flash-attention kernel vs the materialized XLA path, fwd+bwd at
    long sequences ([1, 8, S, 64] bf16, causal) — the regime the kernel
    exists for (the [S, S] logits never reach HBM; the VJP recomputes
    tile-by-tile). S=2048 is the MXU-bound point (~2x), S=8192 the
    HBM-bound one (the XLA path's logits working set blows HBM, ~15x).
    Reports both times and the speedup; the numerics equality is
    tests/test_flash_attention.py's job. Synced via chain-dependent
    device_get (see bench_vit_train)."""
    import jax
    import jax.numpy as jnp

    from tensor_stream_tpu.ops.flash_attention import flash_attention

    # Scan-based timing: `inner` kernel calls chained inside ONE jit
    # dispatch (data-dependent through q), so the remote tunnel's
    # per-dispatch floor (~2 ms on this rig — comparable to the kernel
    # itself at these shapes) divides out instead of polluting the
    # number. r04's per-call timings recorded dispatch weather: the
    # same kernels measure 4.75 -> 1.9 ms (full) under scan timing.
    def timed(impl, seq, iters, window=None, inner=4):
        rng = jax.random.PRNGKey(0)
        q, k, v = (jax.random.normal(jax.random.fold_in(rng, i),
                                     (1, heads, seq, d), jnp.bfloat16)
                   for i in range(3))

        def loss(q, k, v):
            o = flash_attention(q, k, v, causal=True, window=window,
                                impl=impl)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def loop(q, k, v):
            def body(qc, _):
                return g(qc, k, v)[0].astype(qc.dtype), ()
            out, _ = jax.lax.scan(body, q, None, length=inner)
            return out

        out = loop(q, k, v)
        float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = loop(out, k, v)  # chain through dq
        float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
        return (time.perf_counter() - t0) / (iters * inner)

    out = {}
    for seq, iters in ((2048, 8), (8192, 2)):
        t_flash = timed("pallas", seq, iters)
        t_xla = timed("xla", seq, iters)
        out[f"flash_fwdbwd_ms_s{seq}"] = round(1e3 * t_flash, 3)
        out[f"xla_attn_fwdbwd_ms_s{seq}"] = round(1e3 * t_xla, 3)
        out[f"flash_speedup_s{seq}"] = round(t_xla / t_flash, 3)
    # Windowed fwd+bwd at long S: the banded backward (band-sliced scan
    # steps) makes TRAINING with a window O(S·W) — compare against the
    # full-causal fwd+bwd at the same S (t_flash still holds s8192).
    t_wtrain = timed("pallas", 8192, 3, window=1024)
    out["flash_window_fwdbwd_ms_s8192_w1024"] = round(1e3 * t_wtrain, 3)
    out["flash_window_fwdbwd_speedup"] = round(t_flash / t_wtrain, 3)

    # Sliding-window forward at long S: the band kernel fetches each q
    # tile's whole live band as one kv block — out-of-band tiles cost
    # neither DMA nor matmul, so cost is O(S·W) not O(S²) — the
    # long-stream serving regime (window == the ring cache's
    # max_steps). The measured ratio vs full causal sits BELOW the
    # live-pair ratio (4.3x at S=8192/W=1024): at d=64 both kernels
    # are VPU/softmax-bound, and the padded band (block_q + W + lane
    # alignment ≈ 1.4·W) keeps ~2.9x of the exp work ratio; see
    # docs/PERF.md for the sweep.
    def timed_fwd(seq, window, iters, inner=8):
        rng = jax.random.PRNGKey(1)
        q, k, v = (jax.random.normal(jax.random.fold_in(rng, i),
                                     (1, heads, seq, d), jnp.bfloat16)
                   for i in range(3))

        @jax.jit
        def loop(q, k, v):
            def body(qc, _):
                o = flash_attention(qc, k, v, causal=True, window=window,
                                    impl="pallas")
                return o.astype(qc.dtype), ()
            out, _ = jax.lax.scan(body, q, None, length=inner)
            return out

        o = loop(q, k, v)
        float(jax.device_get(jnp.sum(o.astype(jnp.float32))))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = loop(o, k, v)                   # chain through q
        float(jax.device_get(jnp.sum(o.astype(jnp.float32))))
        return (time.perf_counter() - t0) / (iters * inner)

    t_full = timed_fwd(8192, None, 3)
    t_win = timed_fwd(8192, 1024, 3)
    out["flash_fwd_ms_s8192"] = round(1e3 * t_full, 3)
    out["flash_fwd_ms_s8192_w1024"] = round(1e3 * t_win, 3)
    out["flash_window_speedup_s8192_w1024"] = round(t_full / t_win, 3)
    # Achieved / peak FLOP/s of the forward kernels (r04 verdict item
    # 3: quantify kernel utilization every round). USEFUL matmul FLOPs
    # only — 4·d per live (q, kv) pair (QK^T + PV, 2 matmuls); causal
    # halves the pairs, a window keeps W·S - W(W-1)/2 of them — so
    # block-padding and masked work count against utilization, which is
    # the point: this is the headroom meter vs the chip's bf16 peak.
    peak = _PEAK_BF16.get(jax.devices()[0].device_kind)
    if peak:
        s, w = 8192, 1024
        full_pairs = heads * s * (s + 1) // 2
        win_pairs = heads * (w * s - w * (w - 1) // 2)
        out["flash_kernel_flops_util"] = round(
            4 * d * full_pairs / t_full / peak, 4)
        out["flash_window_flops_util"] = round(
            4 * d * win_pairs / t_win / peak, 4)
    return out


def bench_scaling(lib):
    """Decode thread-count sweep — the proof that the decode wall scales
    with host cores. Skipped (with reason) when the host cannot show
    scaling."""
    cores = os.cpu_count() or 1
    # Armed UNCONDITIONALLY from 2 cores up (no env flag): the first
    # multi-core bench host produces the decode-scaling curve with no
    # builder action. Only a 1-core host (where decode is CPU-bound and
    # nothing can scale) skips, and TS_BENCH_SCALING=1 forces even that
    # — the forced 1-core output shape is committed in docs/ROADMAP.md
    # so the emission path stays proven.
    if cores < 2 and not os.environ.get("TS_BENCH_SCALING"):
        return {"cpu_cores": cores,
                "skipped": f"host has {cores} core(s); decode is "
                           "CPU-bound and cannot scale on 1 core "
                           "(set TS_BENCH_SCALING=1 to force)"}
    sweep = {}
    seg_sweep = {}
    for threads in sorted({1, 2, 4, min(8, cores)}):
        if threads > cores and not os.environ.get("TS_BENCH_SCALING"):
            break
        sweep[str(threads)] = round(
            bench_decode_only(lib, STAGE_SECONDS / 2, threads), 1)
        # The segment-parallel sweep is the decode-scaling proof that
        # frame-threading alone cannot give (~2-3x ceiling): N workers
        # over disjoint GOP chunks scale decode ~linearly with cores.
        seg_sweep[str(threads)] = round(
            bench_segment_parallel(lib, STAGE_SECONDS / 2, threads), 1)
        if threads >= cores and not os.environ.get("TS_BENCH_SCALING"):
            break
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


def _loader_window(seconds):
    """One timed window of the HEADLINE loader config (fresh loader,
    jit cache already warm after the headline phase) — the adjacent
    denominator for stage-vs-headline ratios."""
    from tensor_stream_tpu import FourCC, FrameLoader, Planes, ResizeType

    loader = FrameLoader(VIDEO, batch=BATCH, prefetch=3,
                         host_resize=True, buffer_size=32, loop=True,
                         width=224, height=224,
                         resize_type=ResizeType.BILINEAR,
                         pixel_format=FourCC.RGB24,
                         planes_pos=Planes.PLANAR, normalization=True)
    try:
        return _headline_window(loader, seconds)
    finally:
        loader.close()


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

    def _probe():
        try:
            return round(probe_link(0.5), 3)
        except Exception:
            return None

    def _window(first):
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
        if first:  # warm the jit cache before the first timed window
            out, _ = next(loader)
            jax.block_until_ready(out)
        h = _headline_window(loader, TARGET_SECONDS / 2)
        loader.close()
        d = bench_decode_only(lib, STAGE_SECONDS)
        return h, d

    # Every window is recorded WITH its link probe (r04 verdict item 5:
    # the artifact must show the distribution, not one draw) and the
    # headline retries when the tunnel was degraded throughout the
    # planned windows but a later probe clears — a committed artifact
    # should only read degraded if the box never offered a clean window.
    windows = []
    for i in range(3):
        p = _probe()
        h, d = _window(first=(i == 0))
        windows.append({"headline_fps": round(h, 2),
                        "decode_fps": round(d, 1), "probe_ms": p})
    for _ in range(2):  # degraded-throughout: retry on a cleared probe
        probes = [w["probe_ms"] for w in windows if w["probe_ms"]]
        if probes and min(probes) <= DEGRADED_DISPATCH_MS:
            break
        time.sleep(5.0)
        p = _probe()
        if p is None or p > DEGRADED_DISPATCH_MS:
            continue
        h, d = _window(first=False)
        windows.append({"headline_fps": round(h, 2),
                        "decode_fps": round(d, 1), "probe_ms": p})
    best_h = max(w["headline_fps"] for w in windows)
    best_d = max(w["decode_fps"] for w in windows)
    return best_h, best_d, windows


def _best_of(n, fn, *args):
    """Capability measurement on a noisy shared host: transient stalls
    only ever subtract, so the max over n windows is the stable
    estimate (a single window regularly inverts the stage ordering)."""
    return max(fn(*args) for _ in range(n))


def main():
    from tensor_stream_tpu import _native

    lib = _native.load()
    fps, decode_fps, headline_windows = bench_headline_and_decode(lib)
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
    # Serving interleaved with single-stream loader windows (s, l, s,
    # l): the serving/loader ratio of the SAME noise regime. r04's
    # artifact recorded serving at 0.69x a best-of-4 headline taken
    # minutes earlier in a different hypervisor-steal regime; measured
    # adjacently the fused engine sits at the multi-stream decode wall.
    serving_fps, serving_lat, loader_adj = 0.0, {"p50": None}, 0.0
    for _ in range(2):
        s_fps, s_lat = bench_serving(half)
        if s_fps > serving_fps:
            serving_fps, serving_lat = s_fps, s_lat
        loader_adj = max(loader_adj, _loader_window(half))
    stages["serving_fps"] = round(serving_fps, 1)
    stages["serving_vs_adjacent_loader"] = round(
        serving_fps / max(loader_adj, 1e-9), 3)
    if serving_lat["p50"] is not None:
        stages["serving_wait_p50_ms"] = round(serving_lat["p50"], 2)
        stages["serving_wait_p95_ms"] = round(serving_lat["p95"], 2)
    stages["serving_perstream_fps"] = round(
        bench_serving(half / 2, pipeline="per-stream")[0], 1)
    try:
        stages.update(bench_serving_stream_model(half))
    except Exception as e:  # never lose the artifact to the model stage
        stages["serving_model_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        stages.update(bench_vit_train())
    except Exception as e:  # never lose the artifact to the model stage
        stages["vit_train_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        stages.update(bench_vit_train_joint())
    except Exception as e:
        stages["vit_joint_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        import jax
        if jax.devices()[0].platform == "tpu":  # 6k-token step: chip only
            stages.update(bench_vit_train_joint_long())
    except Exception as e:
        stages["vit_joint_long_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        import jax
        if jax.devices()[0].platform == "tpu":  # kernel path is TPU-only
            stages.update(bench_flash_attention())
    except Exception as e:
        stages["flash_error"] = f"{type(e).__name__}: {e}"[:200]
    link = {
        "transfer_gbps": stages["transfer_gbps"],
        "dispatch_floor_ms": round(probe_link(), 3),
    }
    # Healthy-tunnel reference points measured on this rig: ~0.7-1.4
    # GB/s transfer, ~28 ms honest dispatch round-trip (the tunnel RTT;
    # see DEGRADED_DISPATCH_MS). Outside these the headline is
    # recording tunnel weather — say so in the artifact of record.
    link["degraded"] = bool(link["transfer_gbps"] < 0.5
                            or link["dispatch_floor_ms"]
                            > DEGRADED_DISPATCH_MS)
    result = {
        "metric": "1080p_decode_to_224px_rgb_planar_f32_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "stages": stages,
        "link": link,
        "windows": headline_windows,
        "scaling": bench_scaling(lib),
    }
    regressions = _stage_regressions(stages)
    if regressions:
        result["regressions"] = regressions
    if _FALLBACK or os.environ.get("TS_BENCH_FALLBACK"):
        result["backend_fallback"] = (_FALLBACK or
                                      os.environ["TS_BENCH_FALLBACK"])
    _persist_best(result)
    print(json.dumps(result))
    return result


def _stage_regressions(stages, floor=0.2):
    """Regression tripwire (r04 verdict item 1): any throughput stage
    below `floor` x its BENCH_BEST counterpart gets an explicit entry in
    the artifact, so a collapse (pool_aggregate 571 -> 6.3 in r04) can
    never ship silently again. Latency stages (_ms) and booleans are
    skipped — lower/flag semantics don't fit a 'fraction of best'
    floor; ratios and fps both do."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_BEST.json")
    try:
        with open(path) as f:
            best = json.load(f).get("stages", {})
    except (OSError, ValueError):
        return []
    out = []
    for key, val in stages.items():
        ref = best.get(key)
        if (not isinstance(val, (int, float)) or isinstance(val, bool)
                or not isinstance(ref, (int, float)) or isinstance(ref, bool)
                or key.endswith("_ms") or ref <= 0):
            continue
        if val < floor * ref:
            out.append({"stage": key, "value": val, "best": ref,
                        "ratio": round(val / ref, 4)})
    return out


def _persist_best(result):
    """Keeps the best committed headline run in BENCH_BEST.json (chip
    backend only) and stamps a summary of it into every artifact: a
    degraded-tunnel round then still records the demonstrated
    capability next to the weather that hid it."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_BEST.json")
    best = None
    try:
        with open(path) as f:
            best = json.load(f)
    except (OSError, ValueError):
        pass
    on_chip = not (result.get("backend_fallback")
                   or os.environ.get("TS_BENCH_FALLBACK"))
    if on_chip and (best is None or result["value"] > best.get("value", 0)):
        best = dict(result, recorded_at=time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                      time.gmtime()))
        try:
            with open(path, "w") as f:
                json.dump(best, f, indent=1)
                f.write("\n")
        except OSError:
            pass
    if best is not None and best.get("value") != result["value"]:
        result["best_recorded"] = {
            "value": best["value"],
            "recorded_at": best.get("recorded_at"),
            "loader_efficiency_vs_decode":
                best["stages"].get("loader_efficiency_vs_decode"),
            "link": best.get("link"),
        }


if __name__ == "__main__":
    if not _supervised_run():
        main()

"""Persistent XLA compilation cache for the VPP programs.

Every (size, crop, resize, fourcc, planes, normalization) combination is
its own jitted XLA program (ops/vpp.py) — the TPU-native counterpart of
the reference's precompiled CUDA kernels (src/Resize.cu etc.). CUDA
kernels ship compiled; XLA programs compile at first use, which on a
small host can cost tens of seconds per config. Pointing JAX's
persistent compilation cache at a per-user directory makes every run
after the first start in milliseconds.

Resolution order:
  * ``TS_COMPILE_CACHE=0``            — disable (leave JAX untouched)
  * ``TS_COMPILE_CACHE=<dir>``        — use that directory
  * ``JAX_COMPILATION_CACHE_DIR`` set or ``jax.config`` already
    configured — respect the user's setup, change nothing
  * otherwise ``$XDG_CACHE_HOME/tensor_stream_tpu/jax`` (default
    ``~/.cache/tensor_stream_tpu/jax``)

Cache setup can never fail a read: any error just skips the cache.
"""
import os

_configured = False


def _cache_path():
    pref = os.environ.get("TS_COMPILE_CACHE", "")
    if pref and pref != "0":
        return pref
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "tensor_stream_tpu", "jax")


def ensure_compile_cache():
    """Idempotent; called from the jit-build points (ops/vpp.py)."""
    global _configured
    if _configured:
        return
    _configured = True
    if os.environ.get("TS_COMPILE_CACHE", "") == "0":
        return
    try:
        import jax

        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return  # user already opted in via env (jax reads it itself)
        if getattr(jax.config, "jax_compilation_cache_dir", None):
            return  # configured programmatically by the embedding app
        path = _cache_path()
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # The default only persists compiles >1 s; first-read latency is
        # the whole point here, so persist everything.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:  # pragma: no cover - best-effort by design
        pass

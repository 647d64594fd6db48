"""Persistent-compilation-cache defaulting (tensor_stream_tpu/_compile_cache.py).

The reference shipped precompiled CUDA kernels; the TPU rebuild compiles
XLA programs at first use, so the package points JAX's persistent cache
at a per-user dir unless the user configured (or disabled) one.
"""
import os

import jax

from tensor_stream_tpu import _compile_cache as cc


def _fresh(monkeypatch):
    monkeypatch.setattr(cc, "_configured", False)


def test_cache_path_override_and_default(monkeypatch):
    monkeypatch.setenv("TS_COMPILE_CACHE", "/tmp/ts-cache-override")
    assert cc._cache_path() == "/tmp/ts-cache-override"
    monkeypatch.delenv("TS_COMPILE_CACHE")
    monkeypatch.setenv("XDG_CACHE_HOME", "/tmp/ts-xdg")
    assert cc._cache_path() == "/tmp/ts-xdg/tensor_stream_tpu/jax"


def test_disabled_leaves_jax_untouched(monkeypatch):
    _fresh(monkeypatch)
    monkeypatch.setenv("TS_COMPILE_CACHE", "0")
    before = getattr(jax.config, "jax_compilation_cache_dir", None)
    cc.ensure_compile_cache()
    assert getattr(jax.config, "jax_compilation_cache_dir", None) == before


def test_respects_user_env(monkeypatch, tmp_path):
    # conftest exports JAX_COMPILATION_CACHE_DIR for the suite; the
    # package must not override a user-chosen location.
    _fresh(monkeypatch)
    monkeypatch.delenv("TS_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    before = getattr(jax.config, "jax_compilation_cache_dir", None)
    cc.ensure_compile_cache()
    assert getattr(jax.config, "jax_compilation_cache_dir", None) == before


def test_defaults_when_unconfigured(monkeypatch, tmp_path):
    _fresh(monkeypatch)
    monkeypatch.delenv("TS_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    saved = getattr(jax.config, "jax_compilation_cache_dir", None)
    saved_min = getattr(jax.config,
                        "jax_persistent_cache_min_compile_time_secs", None)
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        cc.ensure_compile_cache()
        got = jax.config.jax_compilation_cache_dir
        assert got == str(tmp_path / "tensor_stream_tpu" / "jax")
        assert os.path.isdir(got)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0
        # Idempotent: a second call must not re-evaluate the environment.
        monkeypatch.setenv("XDG_CACHE_HOME", "/tmp/elsewhere")
        cc.ensure_compile_cache()
        assert jax.config.jax_compilation_cache_dir == got
    finally:
        jax.config.update("jax_compilation_cache_dir", saved)
        if saved_min is not None:
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              saved_min)

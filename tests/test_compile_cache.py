"""Persistent XLA compilation cache gate (runtime/compile_cache.py)."""

import os

from mfas_tpu.runtime.compile_cache import enable_persistent_compilation_cache


def test_enable_creates_dir_and_sets_config(tmp_path, monkeypatch):
    import jax

    target = str(tmp_path / "xla")
    monkeypatch.delenv("MFAS_COMPILE_CACHE", raising=False)
    got = enable_persistent_compilation_cache(target)
    assert got == target and os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target


def test_env_opt_out(monkeypatch, tmp_path):
    monkeypatch.setenv("MFAS_COMPILE_CACHE", "0")
    assert enable_persistent_compilation_cache(str(tmp_path / "x")) is None
    assert not (tmp_path / "x").exists()


def test_env_dir_override(monkeypatch, tmp_path):
    monkeypatch.delenv("MFAS_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("MFAS_COMPILE_CACHE_DIR", str(tmp_path / "y"))
    assert enable_persistent_compilation_cache() == str(tmp_path / "y")

"""Persistent compile cache scoping (ti_tpu/utils/compile_cache.py).

XLA's cache key does not cover host CPU machine features, and CPU cache
entries are AOT host executables — a cache written on one driver machine
and read on another loads with a SIGILL risk (observed across rounds).
Entries must therefore land in a per-host-fingerprint subdirectory.
"""

import jax
import pytest

from ti_tpu.utils import compile_cache


@pytest.fixture
def restore_cache_dir():
    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)


def test_host_fingerprint_stable_and_short():
    fp = compile_cache.host_fingerprint()
    assert fp == compile_cache.host_fingerprint()
    assert len(fp) == 12
    int(fp, 16)  # hex digest


def test_cache_dir_is_host_scoped(tmp_path, monkeypatch, restore_cache_dir):
    monkeypatch.delenv("TI_TPU_NO_COMPILE_CACHE", raising=False)
    path = compile_cache.enable_compile_cache(str(tmp_path))
    assert path is not None
    assert path.startswith(str(tmp_path))
    assert path.endswith(compile_cache.host_fingerprint())
    assert jax.config.jax_compilation_cache_dir == path


def test_env_base_dir_also_scoped(tmp_path, monkeypatch, restore_cache_dir):
    monkeypatch.delenv("TI_TPU_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("TI_TPU_CACHE_DIR", str(tmp_path / "base"))
    path = compile_cache.enable_compile_cache()
    assert path == str(tmp_path / "base" / compile_cache.host_fingerprint())


def test_opt_out(monkeypatch):
    monkeypatch.setenv("TI_TPU_NO_COMPILE_CACHE", "1")
    assert compile_cache.enable_compile_cache() is None

"""Compile-cache fingerprinting (core/cache.py): CPU runs must never share
cache entries across hosts (r3: a foreign host SIGILL'd loading this
machine's CPU executables), while TPU runs keep the shared root cache."""

import os

import jax

from text_similarity_tpu.core.cache import resolve_cache_dir


def test_cpu_cache_dir_is_host_fingerprinted(tmp_path):
    # the conftest pins jax_platforms=cpu, so this resolves the cpu branch
    d = resolve_cache_dir(str(tmp_path))
    assert d.startswith(os.path.join(str(tmp_path), "cpu-"))
    tail = os.path.basename(d)
    # cpu-<machine>-<8-hex-hash-of-cpu-flags>
    assert len(tail.rsplit("-", 1)[1]) == 8


def test_cpu_cache_dir_is_stable(tmp_path):
    assert resolve_cache_dir(str(tmp_path)) == resolve_cache_dir(
        str(tmp_path)
    )


def test_tpu_platform_uses_shared_root(tmp_path):
    # a tpu/axon platform resolves to the shared root (TPU executables
    # have no host-CPU dependence; the warm remote-compile cache is
    # shared); anything cpu-flavored or unknown is fingerprinted
    assert resolve_cache_dir(str(tmp_path), "axon") == str(tmp_path)
    assert resolve_cache_dir(str(tmp_path), "tpu") == str(tmp_path)
    for hint in ("cpu", "tpu,cpu", "unknown"):
        assert resolve_cache_dir(str(tmp_path), hint) != str(tmp_path)


def test_conftest_cache_is_active():
    cache = jax.config.jax_compilation_cache_dir
    assert cache and os.path.basename(cache).startswith("cpu-")

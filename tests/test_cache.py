"""Compile-cache platform gating (core/cache.py): CPU runs must never
persist or load host-specific executables (r3: a foreign host SIGILL'd
loading this machine's CPU cache entries; XLA's CPU AOT loader warns about
feature mismatches even same-host), while TPU runs keep the shared warm
root cache."""

import jax

from text_similarity_tpu.core.cache import resolve_cache_dir


def test_cpu_platform_gets_no_persistent_cache(tmp_path):
    # the conftest pins jax_platforms=cpu, so this resolves the cpu branch
    assert resolve_cache_dir(str(tmp_path)) is None
    for hint in ("cpu", "tpu,cpu", "unknown", ""):
        assert resolve_cache_dir(str(tmp_path), hint or None) is None


def test_tpu_platform_uses_shared_root(tmp_path):
    # a tpu/axon platform resolves to the shared root (TPU executables
    # have no host-CPU dependence; the warm remote-compile cache is
    # shared across hosts)
    assert resolve_cache_dir(str(tmp_path), "axon") == str(tmp_path)
    assert resolve_cache_dir(str(tmp_path), "tpu") == str(tmp_path)


def test_conftest_did_not_set_cpu_cache():
    cache = jax.config.jax_compilation_cache_dir
    assert not cache or ".jax_cache" not in cache

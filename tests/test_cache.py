"""Compile-cache platform gating (core/cache.py): CPU runs must never
persist or load host-specific executables (r3: a foreign host SIGILL'd
loading this machine's CPU cache entries; XLA's CPU AOT loader warns about
feature mismatches even same-host), while TPU runs keep the shared warm
root cache."""

import jax

from text_similarity_tpu.core.cache import resolve_cache_dir


def test_cpu_platform_gets_no_persistent_cache(tmp_path):
    # the conftest pins jax_platforms=cpu, so this resolves the cpu
    # branch: NO persistent cache (r3: foreign-host SIGILL from shipped
    # CPU executables; r4: same-host cross-process tmp-dir reuse aborted
    # a full pytest run mid-readback)
    for hint in ("cpu", "tpu,cpu", "unknown", None):
        assert resolve_cache_dir(str(tmp_path), hint) is None


def test_tpu_platform_uses_shared_root(tmp_path):
    # a tpu/axon platform resolves to the shared root (TPU executables
    # have no host-CPU dependence; the warm remote-compile cache is
    # shared across hosts)
    assert resolve_cache_dir(str(tmp_path), "axon") == str(tmp_path)
    assert resolve_cache_dir(str(tmp_path), "tpu") == str(tmp_path)


def test_conftest_leaves_cpu_cache_unset():
    cache = jax.config.jax_compilation_cache_dir
    assert not cache or ".jax_cache" not in cache

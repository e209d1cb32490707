"""Compile-cache platform gating (core/cache.py): CPU runs must never
persist or load host-specific executables (r3: a foreign host SIGILL'd
loading this machine's CPU cache entries; XLA's CPU AOT loader warns about
feature mismatches even same-host), while TPU runs keep the shared warm
root cache."""

import jax

from text_similarity_tpu.core.cache import resolve_cache_dir


def test_cpu_platform_cache_never_in_repo(tmp_path):
    # the conftest pins jax_platforms=cpu, so this resolves the cpu
    # branch: a machine-local tmp dir, NEVER under the given root (the
    # r3 trap was shipping host-specific CPU executables in the repo)
    import tempfile

    for hint in ("cpu", "tpu,cpu", "unknown", None):
        d = resolve_cache_dir(str(tmp_path), hint)
        assert d is not None and not d.startswith(str(tmp_path))
        assert d.startswith(tempfile.gettempdir())


def test_tpu_platform_uses_shared_root(tmp_path):
    # a tpu/axon platform resolves to the shared root (TPU executables
    # have no host-CPU dependence; the warm remote-compile cache is
    # shared across hosts)
    assert resolve_cache_dir(str(tmp_path), "axon") == str(tmp_path)
    assert resolve_cache_dir(str(tmp_path), "tpu") == str(tmp_path)


def test_conftest_cache_outside_repo():
    cache = jax.config.jax_compilation_cache_dir
    assert cache and ".jax_cache" not in cache

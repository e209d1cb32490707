"""Test config: force an 8-device CPU platform so sharding/collective code
paths run without TPU hardware — the TPU-world equivalent of a fake backend
(SURVEY.md §4).

Note: this environment's sitecustomize pins JAX_PLATFORMS=axon (remote TPU
tunnel), so the env var alone is not enough — we must also set the jax
config after import."""

import os

# Must be set before the backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Compile cache: CPU platforms get NO persistent cache (core/cache.py) —
# CPU AOT executables are host-specific (r3: foreign-host SIGILL from the
# shipped cache) and even same-host cross-process reuse aborted a full
# pytest run (r4, 2026-08-19). CPU compiles are cheap.
from text_similarity_tpu.core.cache import setup_compile_cache  # noqa: E402

_cache_dir = setup_compile_cache()
assert _cache_dir is None or ".jax_cache" not in _cache_dir

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    assert jax.device_count() == 8
    return jax.devices()

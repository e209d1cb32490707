"""Persistent-compile-cache setup shared by every entry point (CLI, bench,
driver entries, tests).

Why fingerprinting: XLA's CPU backend emits host-specific machine code —
a cache entry compiled on one machine can SIGILL on another (reproduced in
round 3: the repo-shipped cache aborted the full pytest run on a foreign
host with "CPU compilation doesn't match the machine type"). TPU
executables have no such host dependence (and on this environment they
cost minutes of remote compile), so:

- TPU/axon runs keep the cache at ``<root>/.jax_cache`` — backwards
  compatible with the warm entries shipped in the repo;
- CPU runs use ``<root>/.jax_cache/cpu-<machine>-<cpu-flags-hash>`` — a
  per-host-microarchitecture subdirectory that can never collide across
  machines.

Replaces nothing in the reference (it has no compile cache); this is
infrastructure for the remote-compile environment (CLAUDE.md rule 3).
"""

from __future__ import annotations

import hashlib
import os
import platform

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _host_fingerprint() -> str:
    """Machine arch + a hash of the CPU feature flags: two hosts whose
    fingerprints match can safely share CPU-compiled XLA executables."""
    tag = platform.machine() or "unknown"
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith(("flags", "features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats = platform.processor()
    h = hashlib.md5(feats.encode()).hexdigest()[:8]
    return f"{tag}-{h}"


def resolve_cache_dir(
    root: str | None = None, platform_hint: str | None = None
) -> str:
    """The platform-appropriate cache dir (no jax import needed).

    Platform intent comes from the env/config the caller already set —
    NOT from ``jax.default_backend()``, which would eagerly initialize the
    backend (and can hang for minutes when the TPU relay is down)."""
    base = root or os.environ.get(
        "TS_TPU_CACHE", os.path.join(_REPO_ROOT, ".jax_cache")
    )
    plat = platform_hint or os.environ.get("JAX_PLATFORMS", "")
    if not platform_hint:
        try:  # a jax.config.update("jax_platforms", ...) overrides the env
            import jax

            cfg = getattr(jax.config, "jax_platforms", None)
            if cfg:
                plat = cfg
        except Exception:
            pass
    toks = set((plat or "").lower().replace(",", " ").split())
    if toks & {"tpu", "axon"} and "cpu" not in toks:
        return base
    # cpu — or unknown, which on a foreign host resolves to cpu: never
    # share host-specific executables across machines
    return os.path.join(base, f"cpu-{_host_fingerprint()}")


def setup_compile_cache(root: str | None = None) -> str:
    """Point jax's persistent compile cache at the fingerprinted dir."""
    import jax

    cache = resolve_cache_dir(root)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache

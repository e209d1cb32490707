"""Persistent-compile-cache setup shared by every entry point (CLI, bench,
driver entries, tests).

Why platform-gating: XLA's CPU backend emits host-specific machine code —
a cache entry compiled on one machine can SIGILL on another (reproduced in
round 3: the repo-shipped cache aborted the full pytest run on a foreign
host with "CPU compilation doesn't match the machine type"), and the CPU
AOT loader warns about feature mismatches even for SAME-host reuse across
processes. CPU compiles are fast, so CPU runs simply get NO persistent
cache. TPU executables have no host-CPU dependence and (in this
environment) cost minutes of remote compile — TPU/axon runs keep the
shared warm cache at ``<root>/.jax_cache``.

Replaces nothing in the reference (it has no compile cache); this is
infrastructure for the remote-compile environment (CLAUDE.md rule 3).
"""

from __future__ import annotations

import os
from typing import Optional

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def resolve_cache_dir(
    root: Optional[str] = None, platform_hint: Optional[str] = None
) -> Optional[str]:
    """The platform-appropriate cache dir, or None = no persistent cache.

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
    # cpu — or unknown, which on a foreign host resolves to cpu: NO
    # persistent cache at all. CPU AOT executables are host-specific
    # (SIGILL across hosts), and even SAME-host cross-process reuse is
    # unsafe: the loader flags +prefer-no-scatter/-gather feature
    # mismatches and a full pytest run was observed to fatally abort
    # mid-readback loading a tmp-dir cache written by a sibling process
    # (2026-08-19). CPU compiles are cheap; correctness wins.
    return None


def setup_compile_cache(root: Optional[str] = None) -> Optional[str]:
    """Point jax's persistent compile cache at the platform-keyed dir
    (no-op for CPU platforms)."""
    import jax

    cache = resolve_cache_dir(root)
    if cache is None:
        return None
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache

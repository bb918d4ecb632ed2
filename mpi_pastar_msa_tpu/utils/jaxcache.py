"""Persistent XLA compilation cache setup.

First compilation of the whole-search kernels costs 30s-5min on a remote TPU
(tunnel + Mosaic); the persistent cache makes every subsequent process reuse
them.  Called once from the engine modules; idempotent.
"""
from __future__ import annotations

import os

_DONE = False


def _machine_fingerprint() -> str:
    """Short stable hash of this host's CPU flags + per-process XLA target
    environment (see enable_compilation_cache).

    JAX_PLATFORMS/XLA_FLAGS are included because XLA:CPU bakes plugin-derived
    pseudo-features (e.g. +prefer-no-scatter under the axon TPU plugin) into
    AOT results without keying the cache on them — a process without the
    plugin then loads a mismatched executable."""
    import hashlib
    import platform

    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    feats += "|" + os.environ.get("JAX_PLATFORMS", "")
    feats += "|" + os.environ.get("XLA_FLAGS", "")
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


def enable_compilation_cache() -> None:
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = os.environ.get(
        "MSA_PASTAR_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    # Segregate by machine fingerprint: XLA:CPU persists AOT executables
    # whose cache key does NOT cover the full host feature set, so a cache
    # written on one machine type gets loaded on another (observed:
    # "+prefer-no-scatter is not supported on the host machine"), producing
    # divergent per-process binaries (multi-process gloo deadlock) or SIGILL.
    cache_dir = os.path.join(cache_dir, _machine_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - older/newer jax flag name drift
        pass
    _DONE = True

"""Persistent XLA compilation cache setup.

First compilation of the whole-search kernels costs 30s-5min on a remote TPU
(tunnel + Mosaic); the persistent cache makes every subsequent process reuse
them.  Called once from the engine modules; idempotent.
"""
from __future__ import annotations

import os

_DONE = False


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
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - older/newer jax flag name drift
        pass
    _DONE = True

"""Atomic load-or-export for the StableHLO export caches.

Shared by the single-chip engine (search/engine.py:_start_precompile) and
the sharded engine (parallel/sharded.py:_maybe_export_chunk): both key a
serialized ``jax.export`` module by (source, problem, config, backend) so
fresh processes skip the multi-minute retrace.  This helper owns the two
failure modes the per-site copies diverged on:

* a corrupt or version-incompatible cache entry (e.g. written by a
  different jax release) must fall through to a re-export that REPLACES
  the bad file — not permanently disable the export path;
* concurrent writers must not interleave into one temp file — the temp
  name is pid-keyed and published with an atomic ``os.replace``.
"""
import os
from typing import Callable, Tuple


def load_or_export(path: str,
                   make_exported: Callable) -> Tuple[object, bool]:
    """Return ``(exported, from_cache)``.

    Deserializes ``path`` when it holds a valid entry; otherwise calls
    ``make_exported()`` (the expensive trace+export) and publishes the
    result atomically.  A failed deserialize removes the bad entry so this
    and later processes re-export instead of silently paying the retrace
    forever.  Exceptions from ``make_exported`` propagate (callers keep
    their traced-path fallback); publish failures are best-effort.
    """
    import jax.export as jex

    if path and os.path.exists(path):
        try:
            with open(path, "rb") as f:
                return jex.deserialize(f.read()), True
        except Exception:  # noqa: BLE001 - corrupt/incompatible entry
            # NOTE: this remove can race a concurrent writer that just
            # atomically replaced the file with a fresh valid entry; the
            # race is benign (the remover re-exports identical bytes and
            # republishes), costing at most one redundant export.
            try:
                os.remove(path)
            except OSError:
                pass
    exported = make_exported()
    if path:
        try:
            tmp = f"{path}.tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(exported.serialize())
            os.replace(tmp, path)
        except OSError:
            pass
    return exported, False

"""Random-access roofline microbenchmark for the insert-path cost model.

The frontier engine's per-step cost is dominated by the insert protocol's
random-access ops per candidate lane: ONE 8-word bucket-row gather (the
round-0 lookup / probe call) and ~1.3 single-word scatters (t_sig way
write + t_best scatter-min).  This script measures those primitives in
isolation on the live backend so the engine's measured step time can be
compared against a hardware floor:

    floor_s ~= lanes * (t_row_gather + 1.3 * t_scatter)

plus the sequential-scan term for selection.  Results feed
benchmarks/roofline_kinase.md.

Usage: python scripts/roofline.py [--c 24] [--l 19] [--k 64]
  --c: log2 table size (words)   --l: log2 access batch   --k: chained reps
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _settle(out):
    """Fetch a scalar-sized slice of every output (forces the dispatch
    chain to drain; block_until_ready lies on this tunneled backend)."""
    jax.tree.map(
        lambda a: np.asarray(a if np.ndim(a) == 0 else a.ravel()[:1]), out)


def timed(fn, *args, reps=3):
    out = fn(*args)
    _settle(out)  # settle compile
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _settle(out)
        walls.append(time.perf_counter() - t0)
    return min(walls)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=24)
    ap.add_argument("--l", type=int, default=19)
    ap.add_argument("--k", type=int, default=64)
    args = ap.parse_args()
    C, L, K = 1 << args.c, 1 << args.l, args.k
    NB = C // 8

    print(f"backend={jax.default_backend()} C=2^{args.c} words "
          f"L=2^{args.l} lanes K={args.k}", flush=True)

    key = jax.random.PRNGKey(0)
    idx0 = jax.random.randint(key, (L,), 0, C, dtype=jnp.int32)
    tab = jnp.zeros((C,), dtype=jnp.int32)
    rows = jnp.zeros((NB, 8), dtype=jnp.int32)

    # 1. sequential scan (selection analogue: masked min over the table)
    @jax.jit
    def scan_min(tab):
        def body(i, acc):
            return acc + jnp.min(tab + i)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    w = timed(scan_min, tab)
    per = w / K / C * 1e9
    print(f"seq scan     : {w / K * 1e3:7.3f} ms/pass  {per:6.3f} ns/word "
          f"({C * 4 / (w / K) / 1e9:.0f} GB/s)", flush=True)

    # 2. random 8-word row gather (round-0 bucket lookup analogue)
    @jax.jit
    def row_gather(rows, idx):
        def body(i, carry):
            idx, acc = carry
            r = jnp.take(rows, (idx + i) & (NB - 1), axis=0)  # (L, 8)
            s = jnp.sum(r, axis=1)
            # chain: next indices depend on gathered data (defeats elision)
            return (idx ^ s, acc + s[0])
        return jax.lax.fori_loop(0, K, body, (idx, jnp.int32(0)))

    w = timed(row_gather, rows, idx0)
    per = w / K / L * 1e9
    print(f"row gather 8w: {w / K * 1e3:7.3f} ms/pass  {per:6.2f} ns/row",
          flush=True)

    # 3. random single-word scatter-min (t_best placement analogue)
    @jax.jit
    def scatter_min(tab, idx):
        def body(i, carry):
            tab, idx = carry
            tab = tab.at[(idx + i) & (C - 1)].min(idx, mode="drop")
            # chain through the table so passes serialize
            idx = idx ^ tab[0]
            return (tab, idx)
        return jax.lax.fori_loop(0, K, body, (tab, idx))

    w = timed(scatter_min, tab, idx0)
    per = w / K / L * 1e9
    print(f"scatter-min  : {w / K * 1e3:7.3f} ms/pass  {per:6.2f} ns/elem",
          flush=True)

    # 4. random single-word gather (claim-check analogue)
    @jax.jit
    def word_gather(tab, idx):
        def body(i, carry):
            idx, acc = carry
            v = jnp.take(tab, (idx + i) & (C - 1))
            return (idx ^ v, acc + v[0])
        return jax.lax.fori_loop(0, K, body, (idx, jnp.int32(0)))

    w = timed(word_gather, tab, idx0)
    per = w / K / L * 1e9
    print(f"word gather  : {w / K * 1e3:7.3f} ms/pass  {per:6.2f} ns/elem",
          flush=True)


if __name__ == "__main__":
    main()

"""Microbenchmarks: element gather vs scatter-min vs prefix-sum variants."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpi_pastar_msa_tpu.search import engine as E


def timeit(fn, reps, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    C = 1 << 24
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 2**30, size=C, dtype=np.int32))
    tbl8 = jnp.asarray(
        rng.integers(0, 2**30, size=(C // 8, 8), dtype=np.int32))
    for L in (1 << 19, 1 << 17, 1 << 15):
        idx = jnp.asarray(rng.integers(0, C, size=L, dtype=np.int32))
        val = jnp.asarray(rng.integers(0, 2**30, size=L, dtype=np.int32))

        g1 = jax.jit(lambda t, i: t[i].sum())
        sc = jax.jit(lambda t, i, v: t.at[i].min(v).ravel()[0])
        rg = jax.jit(lambda t, i: t[i & (C // 8 - 1)].sum())

        t_g = timeit(g1, 30, tbl, idx)
        t_s = timeit(sc, 30, tbl, idx, val)
        t_r = timeit(rg, 30, tbl8, idx)
        print(f"L={L:7d}: elem gather {t_g:6.2f} ms ({t_g*1e6/L:5.1f} ns/el)  "
              f"scatter-min {t_s:6.2f} ms ({t_s*1e6/L:5.1f} ns/el)  "
              f"row8 gather {t_r:6.2f} ms ({t_r*1e6/(L*8):5.2f} ns/el)")

    L = 1 << 19
    x = jnp.asarray(rng.integers(0, 2, size=L, dtype=np.int32))
    p0 = jax.jit(lambda v: E._prefix_sum(v)[-1])
    pc = jax.jit(lambda v: jnp.cumsum(v)[-1])
    print(f"prefix_sum(L=2^19) matmul512: {timeit(p0, 30, x):.2f} ms; "
          f"plain cumsum: {timeit(pc, 5, x):.2f} ms")

    for blk in (1024, 2048):
        K = L // blk

        def pfx_blk(v, blk=blk, K=K):
            x2 = v.reshape(K, blk).astype(jnp.float32)
            tri = jnp.triu(jnp.ones((blk, blk), jnp.float32))
            within = jax.lax.dot_general(
                x2, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            bt = within[:, -1].astype(jnp.int32)
            off = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(bt)[:-1]])
            return (within.astype(jnp.int32) + off[:, None]).reshape(L)[-1]

        print(f"prefix_sum blk={blk}: {timeit(jax.jit(pfx_blk), 30, x):.2f} ms")


if __name__ == "__main__":
    main()

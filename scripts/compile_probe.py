"""Measure XLA lowering/compile cost of the engine's jitted pieces.

Usage: MSA_PASTAR_JAX_CACHE=/tmp/coldprobe python scripts/compile_probe.py FASTA [piece]
piece in {run_chunk, step, walk, all}.  Prints lowering time, HLO text size,
and backend compile time for each piece at the real problem's shapes.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
from mpi_pastar_msa_tpu.search import engine as E


def main() -> None:
    path = sys.argv[1]
    piece = sys.argv[2] if len(sys.argv) > 2 else "all"
    problem = problem_from_fasta(path)
    t0 = time.perf_counter()
    eng = E.TpuFrontierSearch(problem)
    t1 = time.perf_counter()
    st = eng.st
    print(f"setup {t1 - t0:.1f}s  layout={eng.layout}  N={st.n} M={st.M} "
          f"B={st.B} C={st.C} L={st.B * st.M} T3={st.T3} "
          f"sig_ok={st.sig_ok}", flush=True)

    tab = eng._init_table()
    counters = jnp.zeros((E.N_COUNTERS,), dtype=jnp.int32)
    htab = eng._htab_arg()
    henc = st.d_enc
    tri8 = st.d_tri8
    ub = jnp.int32(min(eng.ub, 2**30))
    chunk = jnp.int32(4)

    def probe(name, fn, args):
        t0 = time.perf_counter()
        lowered = fn.lower(*args)
        t1 = time.perf_counter()
        txt = lowered.as_text()
        t2 = time.perf_counter()
        compiled = lowered.compile()
        t3 = time.perf_counter()
        try:
            mem = compiled.memory_analysis()
            extra = f" peak={mem.temp_size_in_bytes / 2**20:.0f}MB"
        except Exception:
            extra = ""
        print(f"{name:12s} lower={t1 - t0:6.1f}s hlo_text={len(txt) / 1e6:6.2f}MB "
              f"compile={t3 - t2:6.1f}s{extra}", flush=True)
        return compiled

    if piece in ("run_chunk", "all"):
        probe("run_chunk", eng._run_loop,
              (tab, counters, chunk, ub, htab, henc, tri8))
    if piece in ("step", "all"):
        probe("step", eng._step,
              (tab, jnp.int32(2**30), ub, jnp.int32(0), htab, henc, tri8))
    if piece in ("walk", "all"):
        probe("walk", eng._walk, (tab, jnp.zeros((st.n,), dtype=jnp.int32)))


if __name__ == "__main__":
    main()

"""End-to-end wall-clock attribution of a warm kinase run.

Splits eng.run() into its host-visible stages: table init, each chunk
dispatch (the engine already records per-chunk walls), device backtrace
walk, finish-stage table reductions, and host-side path work.  The step
profiler (profile_step.py) covers the in-loop phase split; this script
covers everything AROUND the loop that the headline wall also pays.

Usage: python scripts/profile_run.py [--capacity 16777216] [--batch 16384]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.search import engine as E

KINASE = "/root/reference/kinase.fasta"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=1 << 23)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--chunk", type=int, default=64)
    args = ap.parse_args()

    t0 = time.perf_counter()
    kin = problem_from_fasta(KINASE)
    h = HPairHeuristic.build(kin)
    print(f"hpair build: {time.perf_counter() - t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    eng = E.TpuFrontierSearch(kin, h, capacity=args.capacity,
                              batch=args.batch, chunk_steps=args.chunk)
    print(f"engine ctor (cubes+UB+precompile kickoff): "
          f"{time.perf_counter() - t0:.2f}s", flush=True)

    # warmup run absorbs compile/caching
    t0 = time.perf_counter()
    r = eng.run()
    print(f"warm-up run: {time.perf_counter() - t0:.2f}s "
          f"(expanded={r.nodes_expanded} steps={r.steps})", flush=True)

    # instrumented warm run
    st = eng.st
    t_all = time.perf_counter()

    t0 = time.perf_counter()
    tab = eng._init_table()
    counters = jnp.asarray(E.fresh_counters())
    np.asarray(tab[1][0])  # settle
    t_init = time.perf_counter() - t0

    ub_dev = jnp.asarray(np.int32(eng.ub))
    chunk_walls = []
    t_loop = time.perf_counter()
    while True:
        t0 = time.perf_counter()
        tab, counters = eng._run_loop(tab, counters,
                                      jnp.asarray(np.int32(args.chunk)),
                                      ub_dev, eng._htab_arg(), st.d_enc,
                                      st.d_tri8,
                                      jnp.asarray(np.int32(eng.fill_target)))
        stats_np = np.asarray(counters)
        chunk_walls.append(time.perf_counter() - t0)
        goal_v, fmin_v = int(stats_np[0]), int(stats_np[1])
        if fmin_v >= goal_v or int(stats_np[6]) > 0:
            break
    t_loop = time.perf_counter() - t_loop
    steps = int(stats_np[2])

    t0 = time.perf_counter()
    final = jnp.asarray(st.final_np)
    masks, coord_fin = eng._walk(tab, final)
    masks_np = np.asarray(masks)
    assert np.all(np.asarray(coord_fin) == 0)
    t_walk = time.perf_counter() - t0

    t0 = time.perf_counter()
    if eng.layout == "unpacked":
        n_closed = int(jnp.sum(tab[4] == 2))
        n_open = int(jnp.sum(tab[4] == 1))
    else:
        t_best, t_closed = tab[1], tab[2]
        n_open = int(jnp.sum(t_best < t_closed))
        n_closed = int(jnp.sum((t_closed < E.INFP) & (t_best >= t_closed)))
    t_finish = time.perf_counter() - t0

    t0 = time.perf_counter()
    from mpi_pastar_msa_tpu.search.backtrace import attach_path_g
    closed = {}
    coord = tuple(int(v) for v in st.final_np)
    origin = tuple(0 for _ in range(st.n))
    for mv in masks_np:
        if coord == origin:
            break
        mv = int(mv)
        if mv == 0:
            continue
        closed[coord] = (0, mv)
        coord = tuple(coord[i] - ((mv >> i) & 1) for i in range(st.n))
    scale = getattr(eng.heuristic, "cost_scale", 1)
    closed = attach_path_g(kin, eng.heuristic.weight_i, closed,
                           goal_g=goal_v if scale == 1 else None)
    t_host = time.perf_counter() - t0

    total = time.perf_counter() - t_all
    expanded = int(stats_np[3])
    print(f"\n=== warm run breakdown (total {total:.3f}s, steps={steps}, "
          f"expanded={expanded}) ===")
    print(f"init_table : {t_init:.3f}s")
    print(f"chunk loop : {t_loop:.3f}s over {len(chunk_walls)} dispatches "
          f"-> {t_loop / max(1, steps) * 1e3:.2f} ms/step")
    print(f"  chunk walls: {[round(w, 2) for w in chunk_walls]}")
    print(f"device walk: {t_walk:.3f}s")
    print(f"finish sums: {t_finish:.3f}s")
    print(f"host path  : {t_host:.3f}s")
    print(f"nodes/s    : {expanded / total:,.0f} (loop-only "
          f"{expanded / max(t_loop, 1e-9):,.0f})")
    sel_proc, lt, lr0, lpr, lun, ltl = (int(v) for v in stats_np[8:14])
    if lt:
        print(f"lane acct  : true={lt:,} r0={lr0:,} "
              f"(padding {lr0 / lt - 1:+.1%}) probe_lanes={lpr:,} "
              f"({lpr / lt:.2f} rounds/lane) sel_proc={sel_proc:,} "
              f"(expand pad {sel_proc * ((1 << st.n) - 1) / lt - 1:+.1%})")
        print(f"             unmatched={lun:,} ({lun / lt:.1%} of true) "
              f"tail={ltl:,} ({ltl / max(lun, 1):.1%} of unmatched)")


if __name__ == "__main__":
    main()

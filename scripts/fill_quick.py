"""Quick runtime fill-target sweep on the CURRENT engine build.

`fill` is traced as data, so one compiled program serves every value —
each extra point costs only the run itself.  Used to re-tune the default
after per-step cost changes (the optimum trades expansions against
steps x per-step fixed cost, so it moves whenever either side does).

Usage: python scripts/fill_quick.py [--fills 8192,4096,...] [--repeats 2]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

KINASE = "/root/reference/kinase.fasta"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fasta", default=KINASE)
    ap.add_argument("--gold", type=int, default=421546)
    ap.add_argument("--fills", default="16384,8192,6144,4096,2048")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--capacity", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    p = problem_from_fasta(args.fasta)
    h = HPairHeuristic.build(p)
    eng = TpuFrontierSearch(p, h, capacity=args.capacity, batch=args.batch)
    r = eng.run()  # warm-up: compile + caches
    assert r.g == args.gold, (r.g, args.gold)
    print(f"warmed: B={eng.st.B} C={eng.st.C} default_fill={eng.fill_target}",
          flush=True)

    for fill in (int(v) for v in args.fills.split(",")):
        eng.fill_target = fill
        walls, best = [], None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            r = eng.run()
            walls.append(round(time.perf_counter() - t0, 3))
            assert r.g == args.gold, (r.g, args.gold)
            best = r
        print({"fill": fill, "walls": walls, "wall_min": min(walls),
               "expanded": best.nodes_expanded,
               "reopened": best.nodes_reopened, "steps": best.steps},
              flush=True)


if __name__ == "__main__":
    main()

"""Time each engine-setup phase (heuristic, UB beam, triples fill, statics).

Usage: MSA_PASTAR_JAX_CACHE=/tmp/x python scripts/setup_probe.py FASTA
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from mpi_pastar_msa_tpu.core.problem import problem_from_fasta


def main() -> None:
    path = sys.argv[1]
    problem = problem_from_fasta(path)

    t0 = time.perf_counter()
    from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic

    heuristic = HPairHeuristic.build(problem)
    t1 = time.perf_counter()
    print(f"hpair build   {t1 - t0:6.1f}s", flush=True)

    from mpi_pastar_msa_tpu.search.bounds import greedy_upper_bound

    ub = greedy_upper_bound(problem, heuristic, beam=1024)
    t2 = time.perf_counter()
    print(f"ub beam       {t2 - t1:6.1f}s  ub={ub}", flush=True)

    from mpi_pastar_msa_tpu.heuristic.triples import HTriples

    ht = HTriples.build(heuristic)
    t3 = time.perf_counter()
    print(f"triples fill  {t3 - t2:6.1f}s  T={len(ht.triangles) if ht else 0}",
          flush=True)

    from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

    eng = TpuFrontierSearch(problem, ht if ht else heuristic)
    t4 = time.perf_counter()
    print(f"engine ctor   {t4 - t3:6.1f}s  layout={eng.layout} B={eng.st.B} "
          f"C={eng.st.C}", flush=True)


if __name__ == "__main__":
    main()

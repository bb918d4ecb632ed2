"""Pre-populate the persistent XLA compilation cache for the bench lanes.

Runs the PF08184 + test2 smoke engines and the kinase engine once on
whatever backend is live (TPU if attached).  After this, every bench/smoke
retry pays cache hits (seconds) instead of cold Mosaic/XLA compiles
(minutes) — the round-2 bench lost its headline number to exactly that
cold-compile-inside-a-timeout failure mode.
"""
import os
import subprocess
import sys
import time

REPO = __file__.rsplit("/", 2)[0]


def check() -> int:
    """Freshness check: does the kinase export-cache entry exist for the
    CURRENT semantic source key?  Exits nonzero (loudly) when the key has
    drifted since the last `make warmcache` — i.e. the next fresh process
    would pay the full retrace.  Run as `make warmcheck` (or
    `python scripts/warm_cache.py --check`) after any engine edit."""
    sys.path.insert(0, REPO)
    from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
    from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
    from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

    kin = problem_from_fasta("/root/reference/kinase.fasta")
    eng = TpuFrontierSearch(kin, HPairHeuristic.build(kin))
    path = eng._export_cache_path()
    if not path:
        print("warmcheck: NO CACHE DIR (jax_compilation_cache_dir unset)")
        return 2
    if os.path.exists(path):
        print(f"warmcheck: OK — export entry present for the current "
              f"semantic key\n  {path}")
        return 0
    print(f"warmcheck: KEY DRIFT — no export entry for the current "
          f"semantic key; the next fresh process pays the full retrace.\n"
          f"  missing: {path}\n  run `make warmcache` before benching")
    return 1


def main() -> None:
    t0 = time.perf_counter()
    print("warmcache: smoke lane (PF08184 + test2 + sharded)", flush=True)
    rc = subprocess.run([sys.executable, REPO + "/scripts/tpu_smoke.py"]).returncode
    print(f"warmcache: smoke rc={rc} wall={time.perf_counter() - t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    print("warmcache: kinase lane", flush=True)
    rc = subprocess.run(
        [sys.executable, REPO + "/scripts/bench_kinase_tpu.py"]).returncode
    print(f"warmcache: kinase rc={rc} wall={time.perf_counter() - t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    if "--check" in sys.argv:
        sys.exit(check())
    main()

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
    """Freshness check: do the export-cache entries the bench lanes need
    exist for the CURRENT semantic source keys?  Exits nonzero (loudly)
    when a key has drifted since the last `make warmcache` — i.e. the next
    fresh process would pay the full retrace.  Run as `make warmcheck`
    (or `python scripts/warm_cache.py --check`) after any engine edit.

    MSA_NO_PRECOMPILE prevents the engine build from exporting on the
    spot — without it the check would itself perform the retrace it
    exists to detect, then report OK forever after.  Covers BOTH caches:
    the single-chip kinase runloop and the sharded chunk program (keyed
    on sharded.py + engine.py)."""
    os.environ["MSA_NO_PRECOMPILE"] = "1"
    sys.path.insert(0, REPO)
    import jax

    from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
    from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
    from mpi_pastar_msa_tpu.parallel.sharded import ShardedFrontierSearch
    from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

    # config must mirror scripts/bench_kinase_tpu.py exactly (the key
    # covers every trace-baked config value)
    kin = problem_from_fasta("/root/reference/kinase.fasta")
    kin_h = HPairHeuristic.build(kin)
    eng = TpuFrontierSearch(kin, kin_h, capacity=1 << 23, batch=4096,
                            fill_target=4096, chunk_steps=64)
    paths = {"kinase runloop": eng._export_cache_path()}

    # the smoke lane's sharded engine (scripts/tpu_smoke.py pf_sharded
    # stage) — checked on whatever devices are visible here; if the TPU is
    # absent the platform differs from the smoke lane's and the row is
    # reported as unverifiable rather than drifted
    try:
        devs = [d for d in jax.devices() if d.platform != "cpu"]
        if not devs:
            print("warmcheck: sharded row skipped (no accelerator here; "
                  "the smoke lane's key is platform-specific)")
        else:
            pf = problem_from_fasta("/root/reference/PF08184.fasta")
            sh = ShardedFrontierSearch(pf, HPairHeuristic.build(pf),
                                       devices=devs[:1])
            paths["sharded chunk (pf, 1-dev)"] = sh._chunk_export_path()
    except Exception as e:  # noqa: BLE001
        print(f"warmcheck: sharded row unverifiable ({e})")

    rc = 0
    for name, path in paths.items():
        if not path:
            print(f"warmcheck: {name}: NO CACHE DIR")
            rc = max(rc, 2)
        elif os.path.exists(path):
            print(f"warmcheck: {name}: OK\n  {path}")
        else:
            print(f"warmcheck: {name}: KEY DRIFT — no export entry for "
                  f"the current semantic key; the next fresh process pays "
                  f"the full retrace.\n  missing: {path}\n"
                  f"  run `make warmcache` before benching")
            rc = max(rc, 1)
    return rc


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
    # beyond-reference bench lanes (bench.py runs them after the kinase
    # headline): warm their traces/exports too so the bench pays loads,
    # not the one-time trace
    for script in ("bench_synth4_long.py", "bench_globin6.py"):
        t0 = time.perf_counter()
        print(f"warmcache: {script}", flush=True)
        rc = subprocess.run(
            [sys.executable, f"{REPO}/scripts/{script}"]).returncode
        print(f"warmcache: {script} rc={rc} "
              f"wall={time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    if "--check" in sys.argv:
        sys.exit(check())
    main()

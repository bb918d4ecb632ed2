"""Benchmark: wall-clock to provably-optimal WSP alignment on PF08184.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The baseline is the reference's serial A* semantics executed by this repo's
native C engine on the host CPU (the reference binary itself is not buildable
here — MPI/Boost/LZ4 absent; see BASELINE.md).  ``vs_baseline`` is the speedup
factor (baseline_wall / tpu_wall, >1 means the TPU engine is faster).

Robustness: the TPU tunnel in this environment can stall; if the TPU run
fails or JAX is unavailable, the native result is reported with
vs_baseline=1.0 so the driver always gets its JSON line.
"""
import json
import os
import sys
import time

INPUT = "/root/reference/PF08184.fasta"
WANT_G = 24450
KINASE = "/root/reference/kinase.fasta"
KINASE_G = 421546


def main() -> None:
    from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
    from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
    from mpi_pastar_msa_tpu.search.native import NativeAStar

    problem = problem_from_fasta(INPUT)
    heuristic = HPairHeuristic.build(problem)

    # baseline: native serial engine (reference-semantics A*) on host CPU
    nat = NativeAStar(problem, heuristic)
    nat.run()  # warm
    t0 = time.perf_counter()
    nres = nat.run()
    native_wall = time.perf_counter() - t0
    assert nres.g == WANT_G, f"native baseline wrong: {nres.g}"

    tpu_wall = None
    nodes = None
    try:
        from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

        eng = TpuFrontierSearch(problem, heuristic)
        r = eng.run()  # includes compile
        assert r.g == WANT_G, f"tpu result wrong: {r.g}"
        t0 = time.perf_counter()
        r = eng.run()  # warm run: compile cached
        tpu_wall = time.perf_counter() - t0
        nodes = r.nodes_expanded
    except Exception as e:  # noqa: BLE001
        print(f"tpu bench failed ({e}); reporting native baseline", file=sys.stderr)

    kinase_extra = {}
    if os.environ.get("MSA_BENCH_KINASE"):
        try:
            kp = problem_from_fasta(KINASE)
            kh = HPairHeuristic.build(kp)
            knat = NativeAStar(kp, kh, init_capacity=1 << 22)
            t0 = time.perf_counter()
            knr = knat.run()
            k_native_wall = time.perf_counter() - t0
            assert knr.g == KINASE_G
            from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

            keng = TpuFrontierSearch(kp, kh, capacity=1 << 24, batch=8192,
                                     chunk_steps=64)
            kr = keng.run()  # includes compile
            assert kr.g == KINASE_G
            t0 = time.perf_counter()
            kr = keng.run()
            k_tpu_wall = time.perf_counter() - t0
            kinase_extra = {
                "kinase_tpu_wall_s": round(k_tpu_wall, 2),
                "kinase_native_wall_s": round(k_native_wall, 2),
                "kinase_tpu_nodes_per_sec": round(kr.nodes_expanded / k_tpu_wall),
            }
        except Exception as e:  # noqa: BLE001
            print(f"kinase bench failed ({e})", file=sys.stderr)

    if tpu_wall is not None:
        print(json.dumps({
            "metric": "pf08184_wallclock_to_optimal_tpu",
            "value": round(tpu_wall, 4),
            "unit": "s",
            "vs_baseline": round(native_wall / tpu_wall, 3),
            "extra": {"nodes_expanded": nodes,
                      "nodes_per_sec": round(nodes / tpu_wall),
                      "native_wall_s": round(native_wall, 4),
                      **kinase_extra},
        }))
    else:
        print(json.dumps({
            "metric": "pf08184_wallclock_to_optimal_native_cpu",
            "value": round(native_wall, 4),
            "unit": "s",
            "vs_baseline": 1.0,
        }))


if __name__ == "__main__":
    main()

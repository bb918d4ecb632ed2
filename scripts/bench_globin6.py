"""Beyond-reference benchmark lane: globin6 (6 REAL globins) on TPU.

The reference's compile-time N dispatch caps it below N=6 without a
rebuild (ref: include/max_seq_helper.h:9-20); this lane runs the TPU
frontier engine on the real-biology 6-sequence fixture to its
native-certified optimum (g=988171, tests/test_globin6.py) and prints a
JSON row for bench.py / benchmarks/globin6.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "data", "globin6.fasta")
GOLD_G = 988171


def main() -> None:
    import jax

    from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
    from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
    from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

    print("STAGE devices", flush=True)
    if not [d for d in jax.devices() if d.platform != "cpu"]:
        print("TPU_ABSENT", flush=True)
        return

    row = {"input": "tests/data/globin6.fasta", "gold_g": GOLD_G}
    print("STAGE load+hpair", flush=True)
    p = problem_from_fasta(DATA)
    h = HPairHeuristic.build(p)

    print("STAGE engine build", flush=True)
    t0 = time.perf_counter()
    eng = TpuFrontierSearch(p, h, chunk_steps=256)  # else auto (B=8192, C=2^23, fill B/2)
    row["build_wall_s"] = round(time.perf_counter() - t0, 1)

    print("STAGE warm-up run", flush=True)
    t0 = time.perf_counter()
    r = eng.run()
    assert r.g == GOLD_G, r.g
    row["warmup_wall_s"] = round(time.perf_counter() - t0, 1)

    print("STAGE timed run", flush=True)
    t0 = time.perf_counter()
    r = eng.run()
    wall = time.perf_counter() - t0
    assert r.g == GOLD_G, r.g
    row.update(tpu_wall_s=round(wall, 2), tpu_nodes=r.nodes_expanded,
               steps=r.steps,
               maxchunk_s=round(max(eng.last_chunk_walls or [0.0]), 1))
    print("GLOBIN6 " + json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

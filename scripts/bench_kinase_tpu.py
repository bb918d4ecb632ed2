"""Warm kinase TPU measurement lane (run as a subprocess by bench.py).

Protocol mirrors the round-1 headline measurement: build the engine (cube
fill + UB beam), one warm-up run (absorbs any residual compile), then one
timed run.  Per-stage STAGE lines make a tunnel stall attributable from
partial output; the final KINASE_TPU line carries the numbers.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

KINASE = "/root/reference/kinase.fasta"
KINASE_G = 421546


def main() -> None:
    import jax

    print("STAGE devices", flush=True)
    devs = [d for d in jax.devices() if d.platform != "cpu"]
    if not devs:
        print("TPU_ABSENT", flush=True)
        return

    from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
    from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
    from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

    print("STAGE load+hpair", flush=True)
    kin = problem_from_fasta(KINASE)
    kin_h = HPairHeuristic.build(kin)

    print("STAGE engine build (cube fill + UB beam)", flush=True)
    t0 = time.perf_counter()
    # measured-best kinase config (r5 sweep, benchmarks/fill_target_kinase
    # .jsonl): C=2^23 (select scan halves vs 2^24, sig layout still
    # encodable), B=4096 + fill=B (2.09 s vs 2.26 at B=8192, 2.45 at
    # B=16384 — the cube bound keeps f-bands thin, so narrow batches shed
    # premature expansions faster than the extra steps cost)
    # chunk_steps=256: ~2 dispatches for the ~360-step search instead of
    # ~6 (each chunk boundary pays a tunnel round-trip; thr rides the
    # counters so chunk size no longer changes the trajectory) — measured
    # -0.2 s on the loop; chunk_steps is a runtime operand, so this costs
    # no retrace and each dispatch stays ~1.3 s, far under the watchdog
    eng = TpuFrontierSearch(kin, kin_h, capacity=1 << 23, batch=4096,
                            fill_target=4096, chunk_steps=256)
    print(f"OK build wall={time.perf_counter() - t0:.1f}s", flush=True)

    print("STAGE warmup run (includes any residual compile)", flush=True)
    t0 = time.perf_counter()
    r = eng.run()
    assert r.g == KINASE_G, r.g
    # maxchunk: largest single-chunk wall — a backend blackout shows as one
    # chunk of 30-200+ s among ~0.5 s neighbours, so bench.py can tell a
    # poisoned warmup (and retry the fresh-process cold shot) from a slow one
    walls = getattr(eng, "last_chunk_walls", []) or [0.0]
    ph = {k: round(v, 1) for k, v in
          getattr(eng, "last_phase_walls", {}).items()}
    print(f"OK warmup g={r.g} wall={time.perf_counter() - t0:.1f}s "
          f"maxchunk={max(walls):.1f}s chunks={len(walls)} phases={ph}",
          flush=True)

    print("STAGE timed run", flush=True)
    t0 = time.perf_counter()
    r = eng.run()
    wall = time.perf_counter() - t0
    assert r.g == KINASE_G, r.g
    walls = getattr(eng, "last_chunk_walls", []) or [0.0]
    cubes = len(getattr(eng.heuristic, "triangles", []) or [])
    print(f"KINASE_TPU wall={wall:.3f} nodes={r.nodes_expanded} "
          f"cubes={cubes} maxchunk={max(walls):.1f}", flush=True)


if __name__ == "__main__":
    main()

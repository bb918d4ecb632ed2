"""Real-TPU smoke driver (run WITHOUT JAX_PLATFORMS=cpu).

Exercises the Mosaic-sensitive paths on actual hardware: sig-table probe
protocol, fused expand, triple-cube gathers, device backtrace, and the
shard_map engine.  Prints TPU_ABSENT if no TPU platform is available
(the pytest wrapper skips), else one OK line per stage.

Every stage announces itself with a ``STAGE <name>`` line BEFORE dispatching
so that a tunnel stall is attributable to a specific stage from partial
output (the round-2 bench could not tell a stall from a long compile).
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    import jax

    print("STAGE devices", flush=True)
    try:
        devs = [d for d in jax.devices() if d.platform != "cpu"]
    except Exception:  # noqa: BLE001
        devs = []
    if not devs:
        print("TPU_ABSENT", flush=True)
        return

    # trivial dispatch first: distinguishes "backend blackout" from any
    # engine/Mosaic problem in the later stages
    print("STAGE trivial_op", flush=True)
    t0 = time.perf_counter()
    import jax.numpy as jnp

    val = int(jax.jit(lambda x: x.sum())(jnp.arange(1024)).block_until_ready())
    assert val == 1024 * 1023 // 2
    print(f"OK trivial_op wall={time.perf_counter() - t0:.1f}s", flush=True)

    from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
    from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
    from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

    # Pallas wavefront kernel ON HARDWARE (Mosaic lowering, not interpret):
    # kinase-scale Phase 1, checked cell-for-cell against the NumPy oracle
    print("STAGE pallas_wavefront (kinase Phase 1 on-chip)", flush=True)
    import numpy as np

    from mpi_pastar_msa_tpu.heuristic.pairwise import all_pair_tables
    from mpi_pastar_msa_tpu.heuristic.wavefront_pallas import pair_tables_pallas

    kin = problem_from_fasta("/root/reference/kinase.fasta")
    t0 = time.perf_counter()
    stacked = pair_tables_pallas(kin)
    wall_p = time.perf_counter() - t0
    oracle = all_pair_tables(kin.seqs)
    for k, (x, y) in enumerate(kin.pairs()):
        got = stacked[k, : len(kin.seqs[x]) + 1, : len(kin.seqs[y]) + 1]
        assert np.array_equal(got, oracle[k]), f"pair {k} mismatch"
    print(f"OK pallas_wavefront pairs={len(oracle)} wall={wall_p:.2f}s",
          flush=True)

    # PF08184: end-to-end sig engine incl. triple cube + device walk
    print("STAGE pf_sig (engine build + search, compile-cached)", flush=True)
    pf = problem_from_fasta("/root/reference/PF08184.fasta")
    pf_h = HPairHeuristic.build(pf)
    t0 = time.perf_counter()
    eng = TpuFrontierSearch(pf, pf_h)
    res = eng.run()
    assert res.g == 24450, res.g
    print(f"OK pf_sig g={res.g} layout={eng.layout} "
          f"wall={time.perf_counter() - t0:.1f}s", flush=True)

    # search-only wall (second run, engine warm): apples-to-apples with the
    # native baseline's search-only timing for bench.py's fallback row
    t0 = time.perf_counter()
    res = eng.run()
    assert res.g == 24450, res.g
    print(f"OK pf_sig_search wall={time.perf_counter() - t0:.3f}s", flush=True)

    # test2: a deeper search (reopen/width-tier paths get real traffic)
    print("STAGE test2", flush=True)
    t2 = problem_from_fasta("/root/reference/test2.fasta")
    t2_h = HPairHeuristic.build(t2)
    t0 = time.perf_counter()
    eng2 = TpuFrontierSearch(t2, t2_h)
    res2 = eng2.run()
    assert res2.g == 45037, res2.g
    print(f"OK test2 g={res2.g} expanded={res2.nodes_expanded} "
          f"wall={time.perf_counter() - t0:.1f}s", flush=True)

    # sharded engine on the real chip (1-device mesh still runs the
    # shard_map/all_to_all code path end-to-end)
    print("STAGE pf_sharded", flush=True)
    from mpi_pastar_msa_tpu.parallel.sharded import ShardedFrontierSearch

    t0 = time.perf_counter()
    seng = ShardedFrontierSearch(pf, pf_h, devices=devs[:1])
    # on an all-accelerator mesh "auto" selects the ragged_all_to_all
    # exchange; even the 1-device mesh executes the ragged collective (the
    # dense fast path is bypassed), so a Mosaic/backend regression in the
    # ragged path surfaces HERE, on hardware
    assert seng.exchange == "ragged", seng.exchange
    sres = seng.run()
    assert sres.g == 24450, sres.g
    print(f"OK pf_sharded g={sres.g} exchange={seng.exchange} "
          f"wall={time.perf_counter() - t0:.1f}s", flush=True)

    print("TPU_SMOKE_PASS", flush=True)


if __name__ == "__main__":
    main()

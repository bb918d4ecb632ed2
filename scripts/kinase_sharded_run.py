"""One-shot: kinase through the sharded engine on the virtual 8-device CPU
mesh — the full-scale multi-chip proof run (VERDICT item 8).

Prints a JSON line with g, expansions, migrated count, per-shard skew, wall.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# 8 virtual devices time-share 2 physical cores: the default 40 s CPU
# collective rendezvous can abort a legitimate (just slow) step
if "collective_timeout" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags.strip()

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402

from mpi_pastar_msa_tpu.core.problem import problem_from_fasta  # noqa: E402
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic  # noqa: E402
from mpi_pastar_msa_tpu.parallel.sharded import ShardedFrontierSearch  # noqa: E402


def main() -> None:
    ndev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    p = problem_from_fasta("/root/reference/kinase.fasta")
    h = HPairHeuristic.build(p)
    devs = jax.devices("cpu")[:ndev]
    hash_type = sys.argv[2] if len(sys.argv) > 2 else "FZORDER"
    hash_shift = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    triples = sys.argv[4] if len(sys.argv) > 4 else "auto"
    if triples == "fractional":
        # fractional all-triples cover: 10 kinase cubes, only viable on a
        # mesh because the sharded cube store splits them across devices
        from mpi_pastar_msa_tpu.heuristic.triples import HTriples

        ht = HTriples.build(h, device=devs[0], fractional=True,
                            budget_bytes=10 << 30)
        assert ht is not None and ht.cost_scale == p.n_seq - 2
        h = ht
    # kinase's f<=f* shell is millions of states: the total-oriented auto
    # capacity (2^23 across the mesh) runs the sig tables at ~60% load and
    # probe chains crawl, and the strong-scaling auto batch (256/shard)
    # quadruples the step count while the full-table select pass still
    # dominates — size both explicitly like the round-2 proof run
    eng = ShardedFrontierSearch(p, h, devices=devs, chunk_steps=16,
                                capacity=1 << 22, batch=2048,
                                hash_type=hash_type, hash_shift=hash_shift)
    t0 = time.perf_counter()
    res = eng.run()
    wall = time.perf_counter() - t0
    per = [int(row[0]) for row in res.shard_stats]
    mean = sum(per) / len(per)
    print(json.dumps({
        "input": "kinase.fasta", "devices": ndev, "hash": hash_type,
        "shift": hash_shift, "triples": triples, "g": res.g,
        "steps": res.steps, "nodes_expanded": res.nodes_expanded,
        "nodes_migrated": res.nodes_migrated, "wall_s": round(wall, 1),
        "nodes_per_s": round(res.nodes_expanded / wall),
        "shard_expanded": per,
        "skew_max_over_mean": round(max(per) / mean, 4) if mean else None,
        "shard_cubes": eng.shard_cubes,
        "cubes": eng.st.T3,
        "cube_bytes_per_device": eng.cube_bytes_per_device,
        "cube_bytes_total_mesh": eng.cube_bytes_per_device * ndev,
    }))


if __name__ == "__main__":
    main()

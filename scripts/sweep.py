"""Hash/shift/device sweep harness.

TPU-native analogue of the reference's sweep scripts
(ref: pastar/sum_tests.sh:9-22, pastar/zorder_tests.sh:9-22), which rebuild
with every (threads x shift x hash) combination and run each input 10x under
perf stat.  Here no rebuild is needed — hash type/shift/devices are runtime
parameters — and results are emitted as JSON lines.

Usage:
  python scripts/sweep.py INPUT.fasta [--devices 1 2 4 8] [--shifts 0 6 12]
                          [--hashes FZORDER FSUM] [--repeats 3]
                          [--platform cpu] [--out sweep.jsonl]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("fasta")
    ap.add_argument("--devices", type=int, nargs="+", default=[1])
    ap.add_argument("--shifts", type=int, nargs="+", default=[12])
    ap.add_argument("--hashes", nargs="+", default=["FZORDER"])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--engine", default="auto", choices=["auto", "sharded"],
                    help="'sharded' forces ShardedFrontierSearch even at "
                         "1 device (apples-to-apples scaling baselines)")
    args = ap.parse_args()

    import jax

    from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
    from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic

    if args.platform:
        jax.config.update("jax_default_device", jax.devices(args.platform)[0])
    all_devs = jax.devices(args.platform) if args.platform else jax.devices()

    problem = problem_from_fasta(args.fasta)
    heuristic = HPairHeuristic.build(problem)
    sink = open(args.out, "a") if args.out else sys.stdout

    for ndev in args.devices:
        for hash_type in args.hashes:
            for shift in args.shifts:
                if ndev > 1 or args.engine == "sharded":
                    from mpi_pastar_msa_tpu.parallel.sharded import ShardedFrontierSearch

                    eng = ShardedFrontierSearch(
                        problem, heuristic, devices=all_devs[:ndev],
                        hash_type=hash_type, hash_shift=shift,
                    )
                else:
                    from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

                    eng = TpuFrontierSearch(
                        problem, heuristic, hash_type=hash_type, hash_shift=shift,
                    )
                walls = []
                res = None
                for rep in range(args.repeats):
                    t0 = time.perf_counter()
                    res = eng.run()
                    walls.append(time.perf_counter() - t0)
                rec = {
                    "input": args.fasta,
                    "devices": ndev,
                    "hash": hash_type,
                    "shift": shift,
                    "g": res.g,
                    "steps": res.steps,
                    "nodes_expanded": res.nodes_expanded,
                    "wall_s": [round(w, 4) for w in walls],
                    "first_wall_s": round(walls[0], 4),  # includes compiles
                    "best_wall_s": round(min(walls), 4),
                    "nodes_per_s": round(res.nodes_expanded / min(walls)),
                }
                # per-shard expansion skew + migration volume: the two
                # signals the reference tunes its 4 hash variants + shift
                # against — load balance vs remote-send traffic
                # (ref: pastar/CoordHash.cpp:105-166)
                stats = getattr(res, "shard_stats", None)
                if stats:
                    exp = [int(s[0]) for s in stats]
                    rec["shard_expanded"] = exp
                    rec["skew_max_over_mean"] = round(
                        max(exp) / (sum(exp) / len(exp)), 4) if sum(exp) else 0.0
                migr = getattr(res, "nodes_migrated", None)
                if migr is not None:
                    rec["nodes_migrated"] = int(migr)
                    rec["migration_ratio"] = round(
                        migr / max(1, res.nodes_expanded), 3)
                print(json.dumps(rec), file=sink, flush=True)


if __name__ == "__main__":
    main()

"""Command-line interface: TPU-native equivalent of the reference CLI.

Mirrors the reference's option surface (ref: pastar/msa_options.cpp:30-69):
  -t/--threads      -> shard count (device-lane count for the TPU engine)
  -s/--hash_shift   -> owner-hash shift (reference default 12,
                       pastar/include/CoordHash.h:9-12; here 4, set from the
                       committed tuning sweep benchmarks/hash_tuning_synth5.jsonl)
  -y/--hash_type    -> FZORDER | FSUM | PZORDER | PSUM (reference default
                       FZORDER; here FSUM, same data)
  --memory_debug    -> keep interpreter cleanup (reference flips force_quit)
  positional        -> FASTA file (must be a regular file)

plus TPU-era additions: --engine {auto,serial,native,tpu}, --devices.

Output format follows the reference's printed oracle surface:
"Final Score:" node line (ref: pastar/backtrace.cpp:53), "Similarity: x.xx%"
(ref: pastar/backtrace.cpp:162-164), wrapped alignment, and per-shard node
count table (ref: pastar/PAStar.cpp:591-619).
"""
from __future__ import annotations

import argparse
import os
import sys

from .core.problem import problem_from_fasta
from .heuristic.hpair import HPairHeuristic
from .search.backtrace import build_alignment, format_alignment, similarity
from .utils.timing import TimeCounter

HASH_TYPES = ("FZORDER", "PZORDER", "FSUM", "PSUM")


def make_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="msa_pastar",
        description="TPU-native parallel A* multiple sequence alignment",
    )
    ap.add_argument("-v", "--version", action="version",
                    version="msa_pastar_tpu 0.1.0")
    ap.add_argument("fasta", help="input FASTA file")
    ap.add_argument("-t", "--threads", type=int, default=0,
                    help="shard count (0 = one per device)")
    ap.add_argument("-s", "--hash_shift", type=int, default=4,
                    help="owner-hash shift (default 4, from the committed "
                         "tuning sweep; the reference defaults to 12)")
    ap.add_argument("-y", "--hash_type", choices=HASH_TYPES, default="FSUM",
                    help="owner-hash strategy")
    ap.add_argument("--memory_debug", action="store_true",
                    help="strict-cleanup mode: drop all engine/heuristic "
                         "state, force GC, and report device buffers still "
                         "live (the reference's flag keeps destructors for "
                         "leak checkers, ref: msa_options.cpp:114-117)")
    ap.add_argument("--engine", choices=("auto", "serial", "native", "tpu"),
                    default="auto", help="search engine backend")
    ap.add_argument("--devices", type=int, default=0,
                    help="number of devices for the tpu engine (0 = all)")
    ap.add_argument("--platform", default=None,
                    help="JAX platform to take devices from (e.g. tpu, cpu)")
    ap.add_argument("--width", type=int, default=None,
                    help="alignment print width (default: terminal width)")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of Phase 2 into DIR")
    ap.add_argument("--batch", type=int, default=None,
                    help="frontier batch size (default: auto)")
    ap.add_argument("--capacity", type=int, default=None,
                    help="hash-table capacity (default: auto)")
    ap.add_argument("--chunk", type=int, default=64,
                    help="super-steps per device dispatch")
    ap.add_argument("--fill", type=int, default=None,
                    help="selection-fill target for the threshold "
                         "controller (default batch/2 single-device, "
                         "batch*devices multi-device — a MESH-TOTAL "
                         "target; smaller = shallower f-windows, fewer "
                         "premature re-expansions, narrower batch tiers "
                         "— see benchmarks/fill_target_kinase.jsonl; each "
                         "distinct value is baked into the compiled program "
                         "and pays one extra trace/export on first use)")
    ap.add_argument("--exchange", choices=("auto", "ragged", "dense"),
                    default="auto",
                    help="sharded-engine migration collective: "
                         "ragged_all_to_all (TPU) or dense capacity+carry "
                         "all_to_all (CPU fallback)")
    ap.add_argument("--triples", choices=("auto", "on", "off", "fractional"),
                    default="auto",
                    help="triple-wise heuristic cubes (auto: when applicable;"
                         " fractional: all-triples cover with (n-2)-scaled"
                         " costs — on multi-device meshes the cube stack is"
                         " sharded by triangle)")
    ap.add_argument("--checkpoint", metavar="PATH", default=None,
                    help="periodically checkpoint the search state; resumes "
                         "automatically if PATH exists for the same problem")
    return ap


def run(argv=None) -> int:
    args = make_parser().parse_args(argv)

    # multi-host bootstrap (no-op single-process): host 0 reads the FASTA and
    # broadcasts it, mirroring the reference's MPI rank-0 distribution
    # (ref: pastar/msa_pastar_main.cpp:97-179)
    from .parallel.multihost import broadcast_problem, init_distributed

    proc = init_distributed()
    if proc == 0:
        if not os.path.isfile(args.fasta):
            print(f"Option parse error: File {args.fasta} does not exist "
                  f"or isn't a regular file", file=sys.stderr)
            return 1
        problem = problem_from_fasta(args.fasta)
    else:
        problem = None
    problem = broadcast_problem(problem)
    print(f"Aligning {problem.n_seq} sequences (max length {problem.max_length}) "
          f"with engine={args.engine} hash={args.hash_type} shift={args.hash_shift}")

    with TimeCounter("Phase 1 - init heuristic: "):
        heuristic = HPairHeuristic.build(problem, backend="auto")

    engine = args.engine
    if engine == "auto":
        # small lattices finish in milliseconds on the native host engine;
        # the TPU engine pays dispatch/compile latency that only amortises on
        # large searches
        lattice = 1
        for s in problem.seqs:
            lattice *= len(s) + 1
            if lattice > 10**8:
                break
        engine = "native" if lattice <= 10**8 else "tpu"
        print(f"engine auto -> {engine}")

    if engine == "serial":
        from .search.serial import SerialAStar

        with TimeCounter("Phase 2: A-Star running time: ") as t2:
            res = SerialAStar(problem, heuristic).run()
        closed = res.closed
        stats = [(res.nodes_expanded, res.nodes_reopened, len(res.closed), res.open_size)]
    elif engine == "native":
        from .search.native import NativeAStar

        # -t > 1 selects the shared-memory HDA* engine — the reference's
        # thread model (ref: pastar/PAStar.cpp:643-654) run natively
        with TimeCounter("Phase 2: A-Star running time: ") as t2:
            res = NativeAStar(problem, heuristic,
                              threads=max(1, args.threads)).run()
        closed = res.closed
        # res.closed is the path-only dict for the backtrace renderer; the
        # real closed-list size (per thread) comes from the engine counters
        # (ref per-tid table: pastar/PAStar.cpp:591-619)
        stats = res.thread_stats
    else:
        import jax

        n_dev = args.devices or (args.threads if args.threads > 1 else 1)
        all_devs = jax.devices(args.platform) if args.platform else jax.devices()
        if args.platform:
            jax.config.update("jax_default_device", all_devs[0])
        if args.profile:
            jax.profiler.start_trace(args.profile)
        with TimeCounter("Phase 2: PA-Star running time: ") as t2:
            if n_dev > 1:
                from .parallel.sharded import ShardedFrontierSearch

                devs = all_devs[:n_dev]
                if args.triples == "off":
                    heuristic = getattr(heuristic, "base", heuristic)
                elif args.triples == "fractional":
                    # sharded-cube store + descale path make the fractional
                    # cover multi-device capable (the stack shards by
                    # triangle, so per-device memory SHRINKS with the mesh)
                    from .heuristic.triples import HTriples

                    ht = HTriples.build(heuristic, device=devs[0],
                                        fractional=True,
                                        budget_bytes=10 << 30)
                    if ht is None:
                        print("error: fractional triples not applicable to "
                              "this input", file=sys.stderr)
                        return 2
                    heuristic = ht
                elif (args.triples == "on"
                      and not hasattr(heuristic, "triangles")):
                    from .heuristic.triples import HTriples

                    ht = HTriples.build(heuristic, device=devs[0])
                    heuristic = ht if ht is not None else heuristic
                eng = ShardedFrontierSearch(problem, heuristic, devices=devs,
                                            hash_type=args.hash_type,
                                            hash_shift=args.hash_shift,
                                            batch=args.batch,
                                            capacity=args.capacity,
                                            chunk_steps=args.chunk,
                                            exchange=args.exchange,
                                            fill_target=args.fill)
            else:
                from .search.engine import TpuFrontierSearch

                eng = TpuFrontierSearch(problem, heuristic,
                                        hash_type=args.hash_type,
                                        hash_shift=args.hash_shift,
                                        batch=args.batch,
                                        capacity=args.capacity,
                                        chunk_steps=args.chunk,
                                        checkpoint_path=args.checkpoint,
                                        triples=args.triples,
                                        fill_target=args.fill)
            res = eng.run()
        if args.profile:
            jax.profiler.stop_trace()
            print(f"profile trace written to {args.profile}")
        closed = res.closed
        stats = res.shard_stats

    g = res.g
    h = res.h
    coord_str = "(" + " ".join(str(int(v)) for v in problem.final_coord) + ")"
    print(f"Final Score: {coord_str}\tg - {g} (h - {h} f - {g + h})")

    with TimeCounter("Phase 3 - backtrace: "):
        al = build_alignment(problem, closed)
    print(f"Similarity: {similarity(al):.2f}%")
    print(format_alignment(al, args.width))

    print("Total nodes counters")
    total_exp = sum(s[0] for s in stats)
    total_reopen = sum(s[1] for s in stats)
    total_closed = sum(s[2] for s in stats)
    total_open = sum(s[3] for s in stats)
    for tid, row in enumerate(stats):
        exp, reopen, closed_n, open_n = row[:4]
        migr = f"\tmigrated {row[4]}" if len(row) > 4 else ""
        print(f"tid {tid}\texpanded {exp}\treopened {reopen}"
              f"\tclosed {closed_n}\topen {open_n}{migr}")
    print(f"total\texpanded {total_exp}\treopened {total_reopen}"
          f"\tclosed {total_closed}\topen {total_open}")
    if t2.elapsed > 0:
        print(f"throughput: {total_exp / t2.elapsed:.0f} nodes expanded/s")

    if args.memory_debug:
        # Device analogue of the reference's --memory_debug (which disables
        # the exit(0) fast path so valgrind sees destructors,
        # ref: pastar/msa_options.cpp:114-117, pastar/include/AStar.h:13-17):
        # drop every engine/heuristic reference, force GC, and report any
        # device buffers still alive — a leak in the functional engine shows
        # up as unexpectedly retained arrays here.
        import gc

        import jax

        del res, closed, stats, heuristic
        eng = None  # tpu-path engine, if any; rebind drops the device tables
        del eng
        gc.collect()
        live = [a for a in jax.live_arrays() if not a.is_deleted()]
        n_bytes = sum(a.nbytes for a in live)
        print(f"memory_debug: {len(live)} live device arrays, "
              f"{n_bytes / 1e6:.1f} MB after cleanup")
    return 0


def main() -> None:
    sys.exit(run())


if __name__ == "__main__":
    main()

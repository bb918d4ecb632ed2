"""Two-process (jax.distributed + gloo) sharded-engine measurement.

The process boundary is the repo's analogue of the reference's MPI rank
axis (ref: pastar/msa_pastar_main.cpp:87-89); this measures what that
boundary costs on one machine — the reference's own multi-node test setup
(``mpiexec -n K`` on one host, ref README.md:15).  Emits one JSON line
comparing 2 processes x 2 devices against 1 process x 4 devices on the
same input/batch/capacity.

Usage: python scripts/multiproc_bench.py [INPUT.fasta] [GOLD_G]
"""
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main() -> None:
    fasta = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "tests", "data", "synth5.fasta")
    gold = int(sys.argv[2]) if len(sys.argv) > 2 else 266713
    batch, cap, repeats = 512, 1 << 20, 3

    # --- 2 processes x 2 local devices (gloo over the process boundary) ---
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env.update(MSA_MH_FASTA=fasta, MSA_MH_GOLD=str(gold),
               MSA_MH_BATCH=str(batch), MSA_MH_CAP=str(cap),
               MSA_MH_REPEATS=str(repeats))
    worker = os.path.join(REPO, "scripts", "multihost_worker.py")
    t0 = time.perf_counter()
    procs = [subprocess.Popen(
        [sys.executable, worker, str(rank), "2", coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for rank in range(2)]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    mp_total = time.perf_counter() - t0
    rec = {"input": os.path.relpath(fasta, REPO), "g": gold,
           "batch_per_shard": batch, "capacity_per_shard": cap}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_OK rank=0"):
                kv = dict(t.split("=") for t in line.split()[1:])
                rec["mp2x2_walls_s"] = [float(w) for w in
                                        kv["walls"].split(",")]
                rec["mp2x2_best_wall_s"] = min(rec["mp2x2_walls_s"])
                rec["mp2x2_expanded"] = int(kv["expanded"])
                rec["mp2x2_migrated"] = int(kv["migrated"])
                rec["mp2x2_steps"] = int(kv["steps"])
    rec["mp2x2_total_wall_s"] = round(mp_total, 1)
    if "mp2x2_best_wall_s" not in rec:
        print("2-proc run failed:\n" + "\n".join(o[-500:] for o in outs),
              file=sys.stderr)
        sys.exit(1)
    print("# stage1 " + json.dumps(rec), flush=True)

    # --- 1 process x 4 virtual devices (same mesh size, no process
    # boundary) --------------------------------------------------------
    code = (
        "import sys, time, json; sys.path.insert(0, %r)\n"
        "import jax\n"
        "from mpi_pastar_msa_tpu.core.problem import problem_from_fasta\n"
        "from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic\n"
        "from mpi_pastar_msa_tpu.parallel.sharded import ShardedFrontierSearch\n"
        "p = problem_from_fasta(%r); h = HPairHeuristic.build(p)\n"
        "eng = ShardedFrontierSearch(p, h, devices=jax.devices('cpu')[:4],"
        " batch=%d, capacity=%d)\n"
        "walls = []\n"
        "for _ in range(%d):\n"
        "    t0 = time.perf_counter(); r = eng.run();"
        " walls.append(round(time.perf_counter()-t0, 3))\n"
        "assert r.g == %d, r.g\n"
        "print('SP_OK', json.dumps({'walls': walls,"
        " 'expanded': r.nodes_expanded, 'migrated': r.nodes_migrated,"
        " 'steps': r.steps}))\n"
    ) % (REPO, fasta, batch, cap, repeats, gold)
    env1 = dict(env, XLA_FLAGS="--xla_force_host_platform_device_count=4")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800, env=env1, cwd=REPO)
    for line in out.stdout.splitlines():
        if line.startswith("SP_OK"):
            sp = json.loads(line[6:])
            rec["sp1x4_walls_s"] = sp["walls"]
            rec["sp1x4_best_wall_s"] = min(sp["walls"])
            rec["sp1x4_expanded"] = sp["expanded"]
            rec["sp1x4_migrated"] = sp["migrated"]
            rec["sp1x4_steps"] = sp["steps"]
    if "sp1x4_best_wall_s" in rec:
        rec["process_boundary_overhead"] = round(
            rec["mp2x2_best_wall_s"] / rec["sp1x4_best_wall_s"], 3)

    # --- 4 processes x 2 local devices: 3 rank boundaries (VERDICT r3
    # item 6; same batch/cap as the committed 4-rank integration test so
    # the compile cache is shared).  Exercises remote-remote routing the
    # 2-rank case cannot. ------------------------------------------------
    if os.environ.get("MSA_MP_FOUR", "1") == "1":
        coord = f"127.0.0.1:{_free_port()}"
        env4 = dict(env, MSA_MH_BATCH="256", MSA_MH_CAP=str(1 << 19),
                    MSA_MH_REPEATS=str(repeats))
        t0 = time.perf_counter()
        procs = [subprocess.Popen(
            [sys.executable, worker, str(rank), "4", coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env4, cwd=REPO) for rank in range(4)]
        outs4 = [p.communicate(timeout=1800)[0] for p in procs]
        for out4 in outs4:
            for line in out4.splitlines():
                if line.startswith("MULTIHOST_OK rank=0"):
                    kv = dict(t.split("=") for t in line.split()[1:])
                    rec["mp4x2_walls_s"] = [float(w) for w in
                                            kv["walls"].split(",")]
                    rec["mp4x2_best_wall_s"] = min(rec["mp4x2_walls_s"])
                    rec["mp4x2_expanded"] = int(kv["expanded"])
                    rec["mp4x2_migrated"] = int(kv["migrated"])
                    rec["mp4x2_steps"] = int(kv["steps"])
        rec["mp4x2_total_wall_s"] = round(time.perf_counter() - t0, 1)
        rec["mp4x2_batch_per_shard"] = 256
        rec["mp4x2_capacity_per_shard"] = 1 << 19

    # --- 8 processes x 1 local device: every shard lives behind a rank
    # boundary (VERDICT r4 item 6; the widest rank count the reference's
    # own sweeps use, ref: pastar/msa_pastar_main.cpp:87-89).  Pure
    # cross-process routing — no intra-process shard shortcut exists. ----
    if os.environ.get("MSA_MP_EIGHT", "1") == "1":
        coord = f"127.0.0.1:{_free_port()}"
        env8 = dict(env, MSA_MH_LOCALDEV="1", MSA_MH_BATCH="256",
                    MSA_MH_CAP=str(1 << 19), MSA_MH_REPEATS=str(repeats))
        t0 = time.perf_counter()
        procs = [subprocess.Popen(
            [sys.executable, worker, str(rank), "8", coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env8, cwd=REPO) for rank in range(8)]
        outs8 = [p.communicate(timeout=2400)[0] for p in procs]
        for out8 in outs8:
            for line in out8.splitlines():
                if line.startswith("MULTIHOST_OK rank=0"):
                    kv = dict(t.split("=") for t in line.split()[1:])
                    rec["mp8x1_walls_s"] = [float(w) for w in
                                            kv["walls"].split(",")]
                    rec["mp8x1_best_wall_s"] = min(rec["mp8x1_walls_s"])
                    rec["mp8x1_expanded"] = int(kv["expanded"])
                    rec["mp8x1_migrated"] = int(kv["migrated"])
                    rec["mp8x1_steps"] = int(kv["steps"])
        rec["mp8x1_total_wall_s"] = round(time.perf_counter() - t0, 1)
        rec["mp8x1_batch_per_shard"] = 256
        rec["mp8x1_capacity_per_shard"] = 1 << 19
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

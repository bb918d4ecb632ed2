"""Worker for the two-process multi-host integration test.

Usage: python scripts/multihost_worker.py <rank> <nprocs> <coordinator>

Each process runs jax.distributed + gloo CPU collectives with 2 local
virtual CPU devices, receives the problem via the host-0 broadcast
(ref: pastar/msa_pastar_main.cpp:97-179), and runs the sharded engine over
the process-spanning mesh.  This is the reference's ``mpiexec -n K`` on one
machine (README.md:15) — indistinguishable from K hosts.
"""
import os
import sys

rank = int(sys.argv[1])
nprocs = int(sys.argv[2])
coordinator = sys.argv[3]

# local XLA CPU devices; do NOT force JAX_PLATFORMS=cpu — under a tunneled
# TPU plugin that name can resolve to the remote CPU (1 device, no gloo)
os.environ.pop("JAX_PLATFORMS", None)
os.environ["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
_LOCALDEV = int(os.environ.get("MSA_MH_LOCALDEV", "2"))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_LOCALDEV}"
).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpi_pastar_msa_tpu.parallel.multihost import (  # noqa: E402
    broadcast_problem, init_distributed)

pid = init_distributed(coordinator, nprocs, rank)
assert pid == rank, (pid, rank)

import jax  # noqa: E402

cpus = jax.devices("cpu")
assert len(cpus) == _LOCALDEV * nprocs, len(cpus)

from mpi_pastar_msa_tpu.core.problem import problem_from_fasta  # noqa: E402
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic  # noqa: E402
from mpi_pastar_msa_tpu.parallel.sharded import ShardedFrontierSearch  # noqa: E402

# measurement overrides (scripts/multiproc_bench.py); defaults reproduce the
# PF08184 integration test exactly
FASTA = os.environ.get("MSA_MH_FASTA", "/root/reference/PF08184.fasta")
GOLD = int(os.environ.get("MSA_MH_GOLD", "24450"))
BATCH = int(os.environ.get("MSA_MH_BATCH", "64"))
CAP = int(os.environ.get("MSA_MH_CAP", str(1 << 14)))
REPEATS = int(os.environ.get("MSA_MH_REPEATS", "1"))

problem = problem_from_fasta(FASTA) if pid == 0 else None
problem = broadcast_problem(problem, devices=cpus)

h = HPairHeuristic.build(problem)
eng = ShardedFrontierSearch(problem, h, devices=cpus, batch=BATCH,
                            capacity=CAP)
assert eng.multiprocess
if problem.n_seq == 3:
    # the triple-wise heuristic must auto-enable on multi-process meshes too
    # (N=3: the single cube makes h exact)
    assert eng.st.T3 == 1, eng.st.T3
import time  # noqa: E402

walls = []
res = None
for _ in range(REPEATS):
    t0 = time.perf_counter()
    res = eng.run()
    walls.append(round(time.perf_counter() - t0, 3))
assert res.g == GOLD, res.g
print(f"MULTIHOST_OK rank={pid} g={res.g} expanded={res.nodes_expanded} "
      f"ndev={eng.ndev} T3={eng.st.T3} migrated={res.nodes_migrated} "
      f"steps={res.steps} walls={','.join(str(w) for w in walls)}",
      flush=True)
# per-shard (expanded, reopened, closed, open, migrated) rows — the
# reference's per-tid node table over MPI ranks (ref: pastar/PAStar.cpp:
# 591-619 after sync_pastar_data)
for tid, row in enumerate(res.shard_stats):
    print(f"MULTIHOST_SHARD rank={pid} tid={tid} "
          + " ".join(str(int(v)) for v in row), flush=True)

# exit hard: jax.distributed teardown can wedge at interpreter exit (gRPC
# shutdown races between the two processes) — the success line is out, so a
# clean _exit keeps the harness from reading a hang as a failure
try:
    jax.distributed.shutdown()
except Exception:  # noqa: BLE001
    pass
os._exit(0)

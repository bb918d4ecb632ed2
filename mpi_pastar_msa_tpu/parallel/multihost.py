"""Multi-host bootstrap: jax.distributed init + host-0 problem broadcast.

TPU-native equivalent of the reference's MPI bootstrap
(ref: pastar/msa_pastar_main.cpp:56-190): instead of
``MPI_Init_thread(MPI_THREAD_MULTIPLE)`` + rank-0 reading the FASTA and
sending a boost-serialized, LZ4-compressed sequence blob to every rank
(ref: msa_pastar_main.cpp:97-179), we initialise ``jax.distributed`` and
broadcast the raw sequence bytes with ``multihost_utils`` — dense arrays over
DCN need no wire codec, so the whole serialization/compression layer
disappears.

On a single host every function degrades to a no-op passthrough, so the CLI
can call them unconditionally.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..core.problem import Problem


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialise jax.distributed if a multi-process env is configured.

    Returns this process's index (0 on single host).  Environment variables
    (JAX_COORDINATOR_ADDRESS etc.) or explicit args select the cluster; with
    neither, single-process mode is assumed.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        return 0
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    if process_id is not None:
        return process_id
    # the distributed service's id, NOT jax.process_index() — the latter is
    # per-backend and can come from an unrelated default backend
    from jax._src import distributed

    gs_pid = getattr(distributed.global_state, "process_id", None)
    return int(gs_pid) if gs_pid is not None else jax.process_index()


def _bcast_nonneg(x_np: np.ndarray, devices, is_source: bool) -> np.ndarray:
    """Broadcast a non-negative host array from the source process to every
    process, over an explicit device set.

    Each process contributes its value (source) or zeros; an elementwise max
    over the device axis replicates the source's data everywhere.  Works on
    any backend — unlike ``multihost_utils.broadcast_one_to_all``, which is
    pinned to the default backend (wrong under a tunneled-TPU default with a
    multi-process CPU mesh)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(devices), ("b",))
    sh = NamedSharding(mesh, P("b"))
    # this process's index ON THE DEVICES' OWN BACKEND (jax.process_index()
    # defaults to the default backend, which can be a different client)
    me = devices[0].client.process_index()
    local_devs = [d for d in devices if d.process_index == me]
    src = x_np if is_source else np.zeros_like(x_np)
    shards = [jax.device_put(src[None], d) for d in local_devs]
    garr = jax.make_array_from_single_device_arrays(
        (len(devices),) + x_np.shape, sh, shards
    )
    out = jax.jit(
        lambda a: jnp.max(a, axis=0),
        out_shardings=NamedSharding(mesh, P()),
    )(garr)
    return np.asarray(out.addressable_shards[0].data)


def broadcast_problem(problem: Optional[Problem], devices=None) -> Problem:
    """Host-0 reads the FASTA; everyone else receives the sequences.

    The reference's rank-0 send loop (msa_pastar_main.cpp:112-139) + receive
    path (:145-174) becomes one broadcast of a padded uint8 matrix + lengths
    (dense arrays over DCN/ICI — no wire codec needed).
    """
    import jax

    if devices is None:
        devices = jax.devices()
    nproc = len({d.process_index for d in devices})
    if nproc == 1:
        assert problem is not None
        return problem

    is_src = devices[0].client.process_index() == 0
    if is_src:
        assert problem is not None
        n = problem.n_seq
        lens = np.array([len(s) for s in problem.seqs], dtype=np.int32)
        lmax = int(lens.max())
        header = np.array([n, lmax], dtype=np.int32)
    else:
        header = np.zeros(2, dtype=np.int32)

    header = _bcast_nonneg(header, devices, is_src)
    n, lmax = int(header[0]), int(header[1])
    if is_src:
        enc = problem.encoded(lmax)
    else:
        lens = np.zeros(n, dtype=np.int32)
        enc = np.zeros((n, lmax), dtype=np.uint8)
    lens = _bcast_nonneg(lens, devices, is_src)
    enc = _bcast_nonneg(enc, devices, is_src)

    seqs = tuple(
        bytes(enc[i, : int(lens[i])]).decode("latin-1") for i in range(n)
    )
    return Problem(seqs)

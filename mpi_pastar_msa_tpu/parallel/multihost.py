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
from typing import Optional, Tuple

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
    return jax.process_index()


def broadcast_problem(problem: Optional[Problem]) -> Problem:
    """Host-0 reads the FASTA; everyone else receives the sequences.

    The reference's rank-0 send loop (msa_pastar_main.cpp:112-139) + receive
    path (:145-174) becomes one ``broadcast_one_to_all`` of a padded uint8
    matrix + lengths.
    """
    import jax

    if jax.process_count() == 1:
        assert problem is not None
        return problem

    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        assert problem is not None
        n = problem.n_seq
        lens = np.array([len(s) for s in problem.seqs], dtype=np.int32)
        lmax = int(lens.max())
        enc = problem.encoded(lmax)
        header = np.array([n, lmax], dtype=np.int32)
    else:
        header = np.zeros(2, dtype=np.int32)

    header = multihost_utils.broadcast_one_to_all(header)
    n, lmax = int(header[0]), int(header[1])
    if jax.process_index() != 0:
        lens = np.zeros(n, dtype=np.int32)
        enc = np.zeros((n, lmax), dtype=np.uint8)
    lens = multihost_utils.broadcast_one_to_all(lens)
    enc = multihost_utils.broadcast_one_to_all(enc)

    seqs = tuple(
        bytes(enc[i, : int(lens[i])]).decode("latin-1") for i in range(n)
    )
    return Problem(seqs)

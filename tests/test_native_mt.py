"""Multithreaded native HDA* engine (native/fast_astar_mt.c) parity tests.

The MT engine is the honest apples-to-apples CPU baseline: the reference
spawns hardware_concurrency() worker threads with per-thread open/closed
shards and an owner hash (ref: pastar/PAStar.cpp:91-101,643-654); this is
the same architecture in shared memory.
"""
import random

import pytest

from mpi_pastar_msa_tpu.core.problem import Problem, problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.search.backtrace import build_alignment, similarity
from mpi_pastar_msa_tpu.search.native import NativeAStar

REF = "/root/reference"


class TestNativeMT:
    @pytest.mark.parametrize("threads", [2, 4])
    def test_pf08184_optimal(self, threads):
        p = problem_from_fasta(f"{REF}/PF08184.fasta")
        h = HPairHeuristic.build(p)
        r = NativeAStar(p, h, threads=threads).run()
        assert r.g == 24450
        al = build_alignment(p, r.closed)
        assert round(similarity(al), 2) == 95.48
        for row, s in zip(al, p.seqs):
            assert row.replace("-", "") == s

    def test_random_instances_match_serial(self):
        random.seed(31)
        for _ in range(6):
            seqs = tuple(
                "".join(random.choice("ACDEFGHIKLMNPQRSTVWY")
                        for _ in range(random.randint(5, 11)))
                for _ in range(4)
            )
            p = Problem(seqs)
            h = HPairHeuristic.build(p)
            want = NativeAStar(p, h).run().g
            for t in (2, 3):
                got = NativeAStar(p, h, threads=t).run()
                assert got.g == want
                # path masks must reconstruct the sequences
                al = build_alignment(p, got.closed)
                for row, s in zip(al, p.seqs):
                    assert row.replace("-", "") == s

    def test_five_seq_matches_serial(self):
        random.seed(13)
        seqs = tuple(
            "".join(random.choice("ACDEFG") for _ in range(random.randint(6, 9)))
            for _ in range(5)
        )
        p = Problem(seqs)
        h = HPairHeuristic.build(p)
        want = NativeAStar(p, h).run().g
        assert NativeAStar(p, h, threads=2).run().g == want

"""Greedy upper-bound tests: validity (UB >= optimal) and tightness."""
import random

import pytest

from mpi_pastar_msa_tpu.core.problem import Problem, problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.search.bounds import greedy_upper_bound
from mpi_pastar_msa_tpu.search.serial import SerialAStar

REF = "/root/reference"


class TestGreedyUpperBound:
    @pytest.mark.parametrize(
        "name,opt",
        [("test.fasta", 52440), ("test2.fasta", 45037), ("PF08184.fasta", 24450)],
    )
    def test_bundled_exact(self, name, opt):
        p = problem_from_fasta(f"{REF}/{name}")
        h = HPairHeuristic.build(p)
        ub = greedy_upper_bound(p, h, beam=32)
        assert ub == opt  # greedy happens to be optimal on these

    def test_always_upper_bound(self):
        random.seed(21)
        for _ in range(5):
            seqs = tuple(
                "".join(random.choice("ACDEFGHIKLMNPQRSTVWY")
                        for _ in range(random.randint(4, 10)))
                for _ in range(3)
            )
            p = Problem(seqs)
            h = HPairHeuristic.build(p)
            opt = SerialAStar(p, h).run().g
            for beam in (1, 4):
                ub = greedy_upper_bound(p, h, beam=beam)
                assert ub >= opt
            assert greedy_upper_bound(p, h, beam=32) >= opt

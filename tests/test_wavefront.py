"""Device wavefront pairwise-DP tests: exact parity with the NumPy oracle."""
import random

import numpy as np
import pytest

from mpi_pastar_msa_tpu.core.problem import Problem, problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.heuristic.pairwise import all_pair_tables
from mpi_pastar_msa_tpu.heuristic.wavefront import pair_tables_device

REF = "/root/reference"


class TestWavefrontParity:
    @pytest.mark.parametrize("name", ["PF08184.fasta", "test2.fasta", "kinase.fasta"])
    def test_bundled(self, name):
        p = problem_from_fasta(f"{REF}/{name}")
        host = all_pair_tables(p.seqs)
        dev = pair_tables_device(p)
        for k, t in enumerate(host):
            assert np.array_equal(dev[k, : t.shape[0], : t.shape[1]], t), (name, k)

    def test_random_unequal_lengths(self):
        random.seed(13)
        seqs = tuple(
            "".join(random.choice("ACDEFGHIKLMNPQRSTVWY") for _ in range(random.randint(2, 40)))
            for _ in range(5)
        )
        p = Problem(seqs)
        host = all_pair_tables(p.seqs)
        dev = pair_tables_device(p)
        for k, t in enumerate(host):
            assert np.array_equal(dev[k, : t.shape[0], : t.shape[1]], t), k

    def test_heuristic_backend_equivalence(self):
        p = problem_from_fasta(f"{REF}/PF08184.fasta")
        hh = HPairHeuristic.build(p, backend="host")
        hd = HPairHeuristic.build(p, backend="device")
        for a, b in zip(hh.tables, hd.tables):
            assert np.array_equal(a, b)
        c = (3, 17, 42)
        assert hh.calculate_h(c) == hd.calculate_h(c)


class TestPallasKernel:
    def test_interpret_tiny(self):
        p = Problem(("ACDEF", "ACF", "CDE"))
        from mpi_pastar_msa_tpu.heuristic.wavefront_pallas import pair_tables_pallas

        host = all_pair_tables(p.seqs)
        dev = pair_tables_pallas(p, interpret=True)
        for k, t in enumerate(host):
            assert np.array_equal(dev[k, : t.shape[0], : t.shape[1]], t), k

    def test_interpret_unequal(self):
        random.seed(31)
        seqs = tuple(
            "".join(random.choice("ACDEFGHIKLMNPQRSTVWY") for _ in range(random.randint(2, 15)))
            for _ in range(4)
        )
        p = Problem(seqs)
        from mpi_pastar_msa_tpu.heuristic.wavefront_pallas import pair_tables_pallas

        host = all_pair_tables(p.seqs)
        dev = pair_tables_pallas(p, interpret=True)
        for k, t in enumerate(host):
            assert np.array_equal(dev[k, : t.shape[0], : t.shape[1]], t), k

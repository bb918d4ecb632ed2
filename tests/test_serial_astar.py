"""Serial A* oracle tests: brute-force parity + bundled-input goldens."""
import random

import pytest

from mpi_pastar_msa_tpu.core.problem import Problem, problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.search.backtrace import build_alignment, similarity
from mpi_pastar_msa_tpu.search.bruteforce import optimal_cost
from mpi_pastar_msa_tpu.search.serial import SerialAStar

REF = "/root/reference"


class TestBruteForceParity:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_3seq(self, seed):
        random.seed(seed)
        seqs = tuple(
            "".join(random.choice("ACDEFGHIKLMNPQRSTVWY") for _ in range(random.randint(3, 8)))
            for _ in range(3)
        )
        p = Problem(seqs)
        h = HPairHeuristic.build(p)
        assert SerialAStar(p, h).run().g == optimal_cost(p, h)

    def test_random_4seq(self):
        random.seed(42)
        seqs = tuple("".join(random.choice("ACDEFG") for _ in range(5)) for _ in range(4))
        p = Problem(seqs)
        h = HPairHeuristic.build(p)
        assert SerialAStar(p, h).run().g == optimal_cost(p, h)


class TestBundledInputs:
    """Golden values produced by this framework's independent oracles
    (serial A* cross-checked against exhaustive DP on small inputs)."""

    def test_test_fasta(self):
        p = problem_from_fasta(f"{REF}/test.fasta")
        res = SerialAStar(p).run()
        assert res.g == 52440
        assert res.h == 0
        al = build_alignment(p, res.closed)
        assert all(len(a) == len(al[0]) for a in al)
        assert abs(similarity(al) - 50.0) < 1e-9

    def test_pf08184(self):
        p = problem_from_fasta(f"{REF}/PF08184.fasta")
        res = SerialAStar(p).run()
        assert res.g == 24450
        al = build_alignment(p, res.closed)
        # degapped rows must reproduce the inputs
        for row, s in zip(al, p.seqs):
            assert row.replace("-", "") == s
        assert round(similarity(al), 2) == 95.48

    def test_alignment_roundtrip_gapped(self):
        p = Problem(("ACDEFG", "ACDFG", "ACEFG"))
        res = SerialAStar(p).run()
        al = build_alignment(p, res.closed)
        for row, s in zip(al, p.seqs):
            assert row.replace("-", "") == s
        assert len({len(a) for a in al}) == 1


class TestTwoSequences:
    def test_n2_pairwise_alignment(self):
        # N=2 degenerates to plain pairwise alignment; weight scales to 8
        p = Problem(("ACDEF", "ACF"))
        h = HPairHeuristic.build(p)
        r = SerialAStar(p, h).run()
        assert r.g == optimal_cost(p, h)
        assert int(h.weight_i[0, 1]) == 8


class TestGoldens:
    def test_goldens_fixture_consistent(self):
        import json
        import os

        path = os.path.join(os.path.dirname(__file__), "goldens.json")
        goldens = json.load(open(path))
        assert goldens["test.fasta"]["optimal_g"] == 52440
        assert goldens["PF08184.fasta"]["optimal_g"] == 24450
        assert goldens["kinase.fasta"]["optimal_g"] == 421546
        assert goldens["test2.fasta"]["optimal_g"] == 45037
        for name, rec in goldens.items():
            al = rec["alignment"]
            assert len({len(a) for a in al}) == 1

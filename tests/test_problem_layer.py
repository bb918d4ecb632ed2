"""Tests for the problem layer: FASTA, cost table, Problem."""
import numpy as np
import pytest

from mpi_pastar_msa_tpu.core.cost import COST_TABLE, GAP_EXTENSION, GAP_GAP, GAP_OPEN, cost
from mpi_pastar_msa_tpu.core.problem import Problem, problem_from_fasta
from mpi_pastar_msa_tpu.io.fasta import read_fasta_text

REF = "/root/reference"


class TestFasta:
    def test_bundled_test_fasta(self):
        p = problem_from_fasta(f"{REF}/test.fasta")
        assert p.seqs == ("AAAA", "AAAB", "AABA", "AABB", "ABBA", "ABBB", "BBBA", "BBBB")

    def test_bundled_counts(self):
        assert problem_from_fasta(f"{REF}/test2.fasta").n_seq == 5
        k = problem_from_fasta(f"{REF}/kinase.fasta")
        assert k.n_seq == 5
        assert 260 <= k.max_length <= 280
        pf = problem_from_fasta(f"{REF}/PF08184.fasta")
        assert pf.n_seq == 3
        assert all(len(s) == 59 for s in pf.seqs)

    def test_multiline_records_concatenate(self):
        seqs = read_fasta_text(">a\nABC\nDEF\n>b\nGH\n")
        assert seqs == ["ABCDEF", "GH"]

    def test_blank_line_delimits(self):
        # an empty line ends a record, like the reference parser
        seqs = read_fasta_text(">a\nABC\n\nDEF\n")
        assert seqs == ["ABC", "DEF"]

    def test_no_trailing_newline(self):
        assert read_fasta_text(">a\nABC") == ["ABC"]


class TestCostTable:
    def test_known_entries(self):
        # spot values from the reference table (pastar/Cost.cpp)
        assert cost("C", "C") == 5
        assert cost("C", "S") == 17 and cost("S", "C") == 17
        assert cost("-", "P") == 12
        assert cost("W", "W") == 0
        assert cost("A", "A") == 15
        assert cost("F", "Y") == 10

    def test_unset_entries_are_zero(self):
        # zero-init quirk: 'B' is not in the table
        assert cost("A", "B") == 0
        assert cost("B", "B") == 0
        assert cost("-", "-") == 0

    def test_symmetry(self):
        assert np.array_equal(COST_TABLE, COST_TABLE.T)

    def test_gap_constants(self):
        assert GAP_OPEN == GAP_EXTENSION == GAP_GAP == 30


class TestProblem:
    def test_coords(self):
        p = Problem(("AB", "ABC"))
        assert list(p.final_coord) == [2, 3]
        assert list(p.initial_coord) == [0, 0]
        assert p.root_parent_mask == 3
        assert p.is_final((2, 3)) and not p.is_final((2, 2))

    def test_encoded_padding(self):
        p = Problem(("AB", "ABC"))
        e = p.encoded()
        assert e.shape == (2, 3)
        assert e[0, 2] == 0 and e[1, 2] == ord("C")

    def test_pair_order(self):
        p = Problem(("A", "B", "C", "D"))
        assert p.pairs() == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]

    def test_rejects_single_sequence(self):
        with pytest.raises(ValueError):
            Problem(("A",))

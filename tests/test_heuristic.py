"""Tests for the pairwise suffix DP, weight pipeline and HPair heuristic."""
import numpy as np

from mpi_pastar_msa_tpu.core.cost import GAP_EXTENSION, GAP_OPEN, cost
from mpi_pastar_msa_tpu.core.problem import Problem, problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.heuristic.pairwise import suffix_table_numpy
from mpi_pastar_msa_tpu.heuristic.weights import altschul_rationale2, gotoh_distances

REF = "/root/reference"


def _naive_suffix_table(s1: str, s2: str) -> np.ndarray:
    """Direct scalar transcription of the backward DP recurrence (oracle)."""
    n1, n2 = len(s1), len(s2)
    NOGAP, GX, GY = 0, 1, 2
    m = np.zeros((n1 + 1, n2 + 1), dtype=np.int64)
    aff = np.zeros((n1 + 1, n2 + 1), dtype=np.int64)
    m[n1][n2] = 0
    aff[n1][n2] = NOGAP
    m[n1][n2 - 1] = GAP_OPEN
    aff[n1][n2 - 1] = GY
    m[n1 - 1][n2] = GAP_OPEN
    aff[n1 - 1][n2] = GX
    for j in range(n2 - 2, -1, -1):
        m[n1][j] = m[n1][j + 1] + GAP_EXTENSION
        aff[n1][j] = GY
    for i in range(n1 - 2, -1, -1):
        m[i][n2] = m[i + 1][n2] + GAP_EXTENSION
        aff[i][n2] = GX

    def gap_cost(i, j, dest):
        return GAP_EXTENSION if aff[i][j] == dest else GAP_OPEN

    for i in range(n1 - 1, -1, -1):
        for j in range(n2 - 1, -1, -1):
            c0 = m[i + 1][j] + gap_cost(i + 1, j, GX)
            c1 = m[i][j + 1] + gap_cost(i, j + 1, GY)
            if c0 < c1:
                mv, gv = c0, GX
            else:
                mv, gv = c1, GY
            c2 = m[i + 1][j + 1] + cost(s1[i], s2[j])
            if c2 < mv:
                mv, gv = c2, NOGAP
            m[i][j] = mv
            aff[i][j] = gv
    return m


class TestSuffixDP:
    def test_matches_naive_recurrence(self):
        import random

        random.seed(1)
        for _ in range(5):
            s1 = "".join(random.choice("ACDEFGHIKLMNPQRSTVWY") for _ in range(random.randint(2, 30)))
            s2 = "".join(random.choice("ACDEFGHIKLMNPQRSTVWY") for _ in range(random.randint(2, 30)))
            assert np.array_equal(suffix_table_numpy(s1, s2), _naive_suffix_table(s1, s2))

    def test_goal_cell_zero(self):
        t = suffix_table_numpy("ACD", "AC")
        assert t[3, 2] == 0

    def test_identical_sequences_diagonal(self):
        s = "ACDEF"
        t = suffix_table_numpy(s, s)
        # aligning identical suffixes: best is all matches
        expected = sum(cost(c, c) for c in s)
        assert t[0, 0] == expected

    def test_admissible_monotone_borders(self):
        t = suffix_table_numpy("ACD", "ACD")
        # last row/col are pure gap runs: GapOpen + k*GapExtension
        assert t[3, 2] == GAP_OPEN
        assert t[3, 1] == GAP_OPEN + GAP_EXTENSION
        assert t[3, 0] == GAP_OPEN + 2 * GAP_EXTENSION


class TestWeights:
    def test_distances_symmetric_positive(self):
        p = problem_from_fasta(f"{REF}/PF08184.fasta")
        D = gotoh_distances(p.seqs)
        assert np.array_equal(D, D.T)
        off = D[~np.eye(3, dtype=bool)]
        assert (off >= 1).all()

    def test_identical_sequences_distance_clamped(self):
        # identical sequences give 0 per-mille distance -> clamped to 1
        D = gotoh_distances(("ACDEFGH", "ACDEFGH", "WYWYWYW"))
        assert D[0, 1] == 1.0

    def test_min_weight_scaled_to_8(self):
        # smallest pair weight is int(min/(min/7.9)+0.5) = int(8.4) = 8
        for path in ("test.fasta", "test2.fasta", "PF08184.fasta"):
            p = problem_from_fasta(f"{REF}/{path}")
            wf, wi = altschul_rationale2(p.seqs)
            off = wi[~np.eye(p.n_seq, dtype=bool)]
            assert off.min() == 8, path

    def test_test_fasta_weight_values(self):
        # values captured from the reference binary itself
        # (tests/ref_captured/test_weights.txt; see tools/refbuild/)
        p = problem_from_fasta(f"{REF}/test.fasta")
        wf, wi = altschul_rationale2(p.seqs)
        assert wi[0, 1] == 341
        assert wi[3, 6] == 55 and wi[3, 7] == 34
        assert np.array_equal(wi, wi.T)


class TestHPair:
    def test_h_zero_at_goal(self):
        p = problem_from_fasta(f"{REF}/PF08184.fasta")
        h = HPairHeuristic.build(p)
        assert h.calculate_h(p.final_coord) == 0

    def test_h_matches_manual_sum(self):
        p = Problem(("ACD", "ACE", "AD"))
        h = HPairHeuristic.build(p)
        c = (1, 0, 2)
        manual = 0
        for (x, y), t in zip(p.pairs(), h.tables):
            manual += int(t[c[x], c[y]]) * int(h.weight_i[x, y])
        assert h.calculate_h(c) == manual

    def test_stacked_tables_agree(self):
        p = Problem(("ACD", "ACE", "AD"))
        h = HPairHeuristic.build(p)
        st = h.stacked_tables()
        for k, ((x, y), t) in enumerate(zip(p.pairs(), h.tables)):
            assert np.array_equal(st[k, : t.shape[0], : t.shape[1]], t)


class TestGotohWavefront:
    def test_device_matrices_match_numpy(self):
        # the device anti-diagonal Gotoh fill must be bit-identical to the
        # host fill (both int arithmetic) on random sequences
        import random

        from mpi_pastar_msa_tpu.heuristic import weights as W
        from mpi_pastar_msa_tpu.heuristic.gotoh_wavefront import (
            gotoh_matrices_device)

        random.seed(11)
        seqs = [
            "".join(random.choice("ACDEFGHIKLMNPQRSTVWY")
                    for _ in range(random.randint(4, 23)))
            for _ in range(4)
        ]
        enc = [np.frombuffer(("-" + s).encode("latin-1"),
                             dtype=np.uint8).astype(np.int32) for s in seqs]
        ij = [(i, j) for i in range(3) for j in range(i + 1, 4)]
        dev = gotoh_matrices_device(
            [(enc[i], enc[j]) for i, j in ij],
            [(len(enc[i]) - 1, len(enc[j]) - 1) for i, j in ij],
        )
        for (i, j), (dd_d, hh_d, vv_d) in zip(ij, dev):
            dd, hh, vv = W._gotoh_pair_matrices(enc[i], enc[j])
            np.testing.assert_array_equal(dd_d, dd)
            np.testing.assert_array_equal(hh_d, hh)
            np.testing.assert_array_equal(vv_d, vv)

    def test_device_distances_match_host(self):
        from mpi_pastar_msa_tpu.heuristic.weights import gotoh_distances
        from mpi_pastar_msa_tpu.io.fasta import read_fasta_file

        seqs = tuple(read_fasta_file("/root/reference/PF08184.fasta"))
        d_host = gotoh_distances(seqs, device=False)
        d_dev = gotoh_distances(seqs, device=True)
        np.testing.assert_array_equal(d_host, d_dev)

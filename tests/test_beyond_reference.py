"""Beyond-reference scale: sequences past the reference's hard caps.

The reference caps its weight pipeline at MAX_SEQ_SIZE=1000 residues
(ref: pastar/include/WeightedSP.hpp:10, pastar/WeightedSP.cpp:148): a
sequence longer than 1000 is silently TRUNCATED in the Gotoh distance
primer, producing wrong Altschul weights — so L>1000 inputs are outside
the reference's correct operating range entirely.  This framework has no
such cap (the device wavefront and the host DP both scale with L).

Fixture: tests/data/synth4_long.fasta — 4 synthetic sequences of
1096-1107 aa at ~25% substitution + 2% indel divergence (deterministic
seed 20260821).  Native-oracle certificate: optimal WSP g=841545 with
4,397,665 expansions (serial, ~27 s on this host) — committed as the
golden below.
"""
import os

import pytest

from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic

DATA = os.path.join(os.path.dirname(__file__), "data", "synth4_long.fasta")
GOLD_G = 841545


def test_fixture_shape():
    p = problem_from_fasta(DATA)
    assert p.n_seq == 4
    assert p.max_length > 1000  # past the reference's weight-pipeline cap
    assert all(len(s) > 1000 for s in p.seqs)


@pytest.mark.slow
def test_wavefront_parity_beyond_1000():
    """The scan wavefront (the auto backend for L>1000) must match the
    host oracle cell-for-cell at this scale."""
    import numpy as np

    from mpi_pastar_msa_tpu.heuristic.pairwise import all_pair_tables
    from mpi_pastar_msa_tpu.heuristic.wavefront import pair_tables_device

    p = problem_from_fasta(DATA)
    stacked = pair_tables_device(p)
    oracle = all_pair_tables(p.seqs)
    for k, (x, y) in enumerate(p.pairs()):
        got = stacked[k, : len(p.seqs[x]) + 1, : len(p.seqs[y]) + 1]
        assert np.array_equal(got, oracle[k]), f"pair {k}"


@pytest.mark.slow
def test_native_oracle_golden():
    """Optimality certificate: the native A* (independent engine) reaches
    the committed optimum."""
    from mpi_pastar_msa_tpu.search.native import NativeAStar

    p = problem_from_fasta(DATA)
    h = HPairHeuristic.build(p)
    r = NativeAStar(p, h, init_capacity=1 << 24).run()
    assert r.g == GOLD_G
    assert r.nodes_expanded == 4_397_665


# --- synth7: 7 sequences = 127 successor masks per expansion -----------
# The reference instantiates N=7 (max_seq_helper.h), but publishes no
# measurement anywhere near it; this fixture (7 x 117-122 aa, 40% sub + 3%
# indel, seed 20260821) is this repo's committed large-N evidence.
DATA7 = os.path.join(os.path.dirname(__file__), "data", "synth7.fasta")
GOLD7_G = 402469


def test_synth7_fixture_shape():
    p = problem_from_fasta(DATA7)
    assert p.n_seq == 7
    assert all(110 <= len(s) <= 130 for s in p.seqs)


@pytest.mark.slow
def test_synth7_native_oracle_golden():
    from mpi_pastar_msa_tpu.search.native import NativeAStar

    p = problem_from_fasta(DATA7)
    h = HPairHeuristic.build(p)
    r = NativeAStar(p, h, init_capacity=1 << 24).run()
    assert r.g == GOLD7_G
    assert r.nodes_expanded == 761_134


# --- synth10: 10 sequences = 1023 successor masks per expansion --------
DATA10 = os.path.join(os.path.dirname(__file__), "data", "synth10.fasta")
GOLD10_G = 575615


def test_synth10_fixture_shape():
    p = problem_from_fasta(DATA10)
    assert p.n_seq == 10
    assert all(55 <= len(s) <= 65 for s in p.seqs)


@pytest.mark.slow
def test_synth10_native_oracle_golden():
    from mpi_pastar_msa_tpu.search.native import NativeAStar

    p = problem_from_fasta(DATA10)
    h = HPairHeuristic.build(p)
    r = NativeAStar(p, h, init_capacity=1 << 22).run()
    assert r.g == GOLD10_G
    assert r.nodes_expanded == 193_043

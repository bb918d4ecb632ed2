"""Six-sequence non-trivial instance (tests/data/synth6.fasta).

The bundled reference inputs stop at N=5 for non-trivial searches
(kinase) — this fixture exercises N=6 (M = 63 move masks, 15 pairs,
cherry cover with >2 cubes) at a size where the search is real
(native serial: 1.29 M expansions, ~32 s).  Golden g captured from the
native engine; the TPU-engine measurement lives in
benchmarks/synth6_tpu.jsonl (2.12 s warm on the chip, 6.9x the best
native config).
"""
import os

import pytest

from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic

HERE = os.path.dirname(os.path.abspath(__file__))
FASTA = os.path.join(HERE, "data", "synth6.fasta")
GOLD_G = 272848


def test_fixture_shape():
    p = problem_from_fasta(FASTA)
    assert p.n_seq == 6
    assert [len(s) for s in p.seqs] == [94, 98, 90, 102, 98, 100]


@pytest.mark.slow
def test_native_serial_and_mt_agree():
    from mpi_pastar_msa_tpu.search.native import NativeAStar

    p = problem_from_fasta(FASTA)
    h = HPairHeuristic.build(p)
    r = NativeAStar(p, h, init_capacity=1 << 22).run()
    assert r.g == GOLD_G
    rmt = NativeAStar(p, h, init_capacity=1 << 22, threads=2).run()
    assert rmt.g == GOLD_G


@pytest.mark.slow
def test_tpu_engine_matches(tmp_path):
    # CPU backend in the test lane; minutes-scale, hence slow-marked
    from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

    p = problem_from_fasta(FASTA)
    h = HPairHeuristic.build(p)
    r = TpuFrontierSearch(p, h, capacity=1 << 23, batch=8192).run()
    assert r.g == GOLD_G

"""Biological large-N instance: a real globin family (6 sequences).

VERDICT r4 item 8: the beyond-reference large-N evidence (synth7/synth10)
was all synthetic; this fixture is a real protein family — human
hemoglobin alpha/beta/gamma-1 + human/horse/sperm-whale myoglobin — i.e.
the classic globin MSA benchmark composition (moderate within-family
identity, ~25-45% across the hemoglobin/myoglobin split).

Provenance: transcribed from the well-characterized UniProt entries named
in the headers (P69905, P68871, P69891, P02144, P68082, P02185); lengths
match the canonical entries (141/146/146/153/153/153).  Transcription
fidelity is NOT independently certified (zero-egress build environment) —
the fixture's role is a biologically realistic divergence/composition
workload, and the optimum below is certified by this repo's own native
oracle (g=988171, 203,555 expansions, native MT-2 4.19 s on this host;
benchmarks/globin6.jsonl).

The reference binary cannot run N=6 beyond its compile-time cap without
rebuilding (ref: include/max_seq_helper.h:9-20 dispatches N at compile
time); this framework's per-problem jit specialisation handles it as-is.
"""
import os

import pytest

from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic

HERE = os.path.dirname(__file__)
GLOBIN6 = os.path.join(HERE, "data", "globin6.fasta")
GOLD = 988171  # native-oracle certificate (see module docstring)


def test_fixture_shape():
    p = problem_from_fasta(GLOBIN6)
    assert p.n_seq == 6
    assert [len(s) for s in p.seqs] == [141, 146, 146, 153, 153, 153]
    # protein alphabet only (a transcription typo would likely break this)
    assert set("".join(p.seqs)) <= set("ACDEFGHIKLMNPQRSTVWY")


@pytest.mark.skipif(not os.path.exists(
    os.path.join(HERE, "..", "native", "libfastastar.so")),
    reason="native engine not built")
def test_native_reaches_certificate():
    from mpi_pastar_msa_tpu.search.native import NativeAStar

    p = problem_from_fasta(GLOBIN6)
    h = HPairHeuristic.build(p)
    r = NativeAStar(p, h).run()
    assert r.g == GOLD


@pytest.mark.slow
def test_tpu_engine_reaches_certificate():
    from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

    p = problem_from_fasta(GLOBIN6)
    h = HPairHeuristic.build(p)
    eng = TpuFrontierSearch(p, h, batch=2048, capacity=1 << 21)
    r = eng.run()
    assert r.g == GOLD

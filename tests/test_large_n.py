"""Large-N coverage: N = 10/14/16 (the reference's template set tops out at
N = 16, ref: pastar/include/max_seq_helper.h:9-20, MaxSequences=64 at
pastar/include/Sequences.h:31).

The packed/sig layouts store f - h(root) (f-rebasing, engine._Static.f0), so
their 31 - n f bits only need to cover the heuristic's total slack — which
keeps them eligible at N >= 10 where absolute f values would overflow.
"""
import numpy as np
import pytest

from mpi_pastar_msa_tpu.core.problem import Problem
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch
from mpi_pastar_msa_tpu.search.native import NativeAStar

AA = "ARNDCQEGHILKMFPSTWYV"


def _family(rng, n, L, sub=0.3, indel=0.08):
    anc = "".join(AA[i] for i in rng.integers(0, 20, L))
    seqs = []
    for _ in range(n):
        out = []
        for ch in anc:
            r = rng.random()
            if r < indel:
                continue
            out.append(AA[rng.integers(0, 20)] if r < indel + sub else ch)
        if not out:
            out.append(AA[rng.integers(0, 20)])
        seqs.append("".join(out))
    return seqs


class TestN10:
    def test_n10_parity_with_native(self):
        rng = np.random.default_rng(100)
        p = Problem(tuple(_family(rng, 10, 7)))
        h = HPairHeuristic.build(p)
        truth = NativeAStar(p, h).run()

        eng = TpuFrontierSearch(p, h, capacity=1 << 16)
        # the whole point: N=10 must NOT fall back to the unpacked layout
        assert eng.layout in ("sig", "packed"), eng.layout
        res = eng.run()
        assert res.g == truth.g
        # the backtraced path must reach the origin and re-derive g exactly
        assert res.closed[tuple(int(v) for v in p.final_coord)][0] == res.g

    def test_n10_sharded_parity(self):
        import jax

        from mpi_pastar_msa_tpu.parallel.sharded import ShardedFrontierSearch

        rng = np.random.default_rng(101)
        p = Problem(tuple(_family(rng, 10, 6)))
        h = HPairHeuristic.build(p)
        truth = NativeAStar(p, h).run()

        eng = ShardedFrontierSearch(p, h, devices=jax.devices("cpu")[:4],
                                    batch=64, capacity=1 << 14)
        assert eng.layout in ("sig", "packed"), eng.layout
        res = eng.run()
        assert res.g == truth.g


class TestN14Plus:
    """N = 14/16: the f field has 31 - n = 17/15 bits.  For HOMOLOGOUS
    families (the actual MSA regime) the rebased spread fits and the fast
    layouts stay eligible; for unrelated random sequences the heuristic
    slack is intrinsically larger than 2^17 (the pairwise bound degrades
    with C(N,2)) and the engine must fall back to the unpacked layout and
    still match the native oracle."""

    @pytest.mark.slow
    def test_n14_related_family_sig(self):
        rng = np.random.default_rng(141)
        p = Problem(tuple(_family(rng, 14, 5, sub=0.10, indel=0.03)))
        h = HPairHeuristic.build(p)
        truth = NativeAStar(p, h).run()

        eng = TpuFrontierSearch(p, h, capacity=1 << 14, batch=16)
        assert eng.layout in ("sig", "packed"), eng.layout
        res = eng.run()
        assert res.g == truth.g

    @pytest.mark.slow
    def test_n14_divergent_falls_back_unpacked(self):
        rng = np.random.default_rng(140)
        p = Problem(tuple(_family(rng, 14, 4, sub=0.4)))
        h = HPairHeuristic.build(p)
        truth = NativeAStar(p, h).run()

        eng = TpuFrontierSearch(p, h, capacity=1 << 14, batch=16)
        assert eng.layout == "unpacked", eng.layout  # spread > 2^17
        res = eng.run()
        assert res.g == truth.g

    def test_n16_packed_eligibility(self):
        """At N=16 the f field has 15 bits; rebasing must keep a related
        family eligible (absolute f ~ 30M+ would need 25 bits)."""
        rng = np.random.default_rng(163)
        p = Problem(tuple(_family(rng, 16, 5, sub=0.25, indel=0.05)))
        h = HPairHeuristic.build(p)
        eng = TpuFrontierSearch(p, h, capacity=1 << 14, batch=16)
        f0 = eng.st.f0
        assert f0 > (1 << 15), f0  # absolute f would overflow 15 bits...
        assert eng.packed, (eng.ub, f0)  # ...but the rebased spread fits
        assert eng.layout in ("sig", "packed")

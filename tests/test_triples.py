"""Triple-wise heuristic (heuristic/triples.py) validation.

The triangle suffix cubes must be (a) bit-identical between the host oracle
and the device wavefront, (b) admissible and dominating vs the pairwise sum,
(c) EXACT for N == 3 (one triangle covers all pairs), and (d) transparent to
the engine's optimal cost (heuristic strength changes work, never answers).
"""
import numpy as np
import pytest

from mpi_pastar_msa_tpu.core.problem import Problem, problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.heuristic.triples import (
    HTriples, pick_triangles, triple_suffix_table_host, triple_tables_device)
from mpi_pastar_msa_tpu.search.bruteforce import optimal_cost
from mpi_pastar_msa_tpu.search.serial import SerialAStar

REF = "/root/reference"
AL = "ACDEFGHIKLMNPQRSTVWY"


def _rand_seqs(rng, n, lo=3, hi=8):
    return ["".join(rng.choice(list(AL), size=rng.integers(lo, hi)))
            for _ in range(n)]


class TestCube:
    def test_device_matches_host_oracle(self):
        rng = np.random.default_rng(0)
        for _ in range(3):
            seqs = _rand_seqs(rng, 3)
            p = Problem(seqs)
            hp = HPairHeuristic.build(p)
            wi = hp.weight_i
            host = triple_suffix_table_host(
                seqs[0], seqs[1], seqs[2],
                int(wi[0, 1]), int(wi[0, 2]), int(wi[1, 2]))
            cubes, org = triple_tables_device(p, [(0, 1, 2)], wi)
            dev = np.asarray(cubes)[0]
            Lx, Ly, Lz = (len(s) for s in seqs)
            assert np.array_equal(
                dev[: Lx + 1, : Ly + 1, : Lz + 1].astype(np.int64), host)
            # carried origin values match the cube's own origin cell
            assert org[0] == dev[0, 0, 0]

    def test_dominates_pairwise_and_zero_at_goal(self):
        rng = np.random.default_rng(1)
        seqs = _rand_seqs(rng, 3)
        p = Problem(seqs)
        hp = HPairHeuristic.build(p)
        wi = hp.weight_i
        host = triple_suffix_table_host(
            seqs[0], seqs[1], seqs[2],
            int(wi[0, 1]), int(wi[0, 2]), int(wi[1, 2]))
        Lx, Ly, Lz = (len(s) for s in seqs)
        ps = (wi[0, 1] * hp.tables[0][: Lx + 1, : Ly + 1, None].astype(np.int64)
              + wi[0, 2] * hp.tables[1][: Lx + 1, None, : Lz + 1].astype(np.int64)
              + wi[1, 2] * hp.tables[2][None, : Ly + 1, : Lz + 1].astype(np.int64))
        assert (host >= ps).all()
        assert host[Lx, Ly, Lz] == 0

    def test_exact_for_three_sequences(self):
        rng = np.random.default_rng(2)
        for _ in range(2):
            p = Problem(_rand_seqs(rng, 3, 3, 7))
            hp = HPairHeuristic.build(p)
            ht = HTriples.build(hp)
            assert ht is not None
            assert ht.calculate_h(np.zeros(3, np.int32)) == optimal_cost(p, hp)
            assert ht.calculate_h(p.final_coord) == 0


class TestPacking:
    def test_edge_disjoint(self):
        rng = np.random.default_rng(3)
        wi = rng.integers(8, 40, size=(6, 6))
        wi = (wi + wi.T) // 2
        tris = pick_triangles(wi, 6)
        used = set()
        for (x, y, z) in tris:
            for e in ((x, y), (x, z), (y, z)):
                assert e not in used
                used.add(e)
        assert len(tris) >= 2  # K6 admits at least two disjoint triangles

    def test_admissible_consistent_vs_true_remaining(self):
        # h3(c) <= true remaining cost for every lattice coordinate
        rng = np.random.default_rng(4)
        p = Problem(_rand_seqs(rng, 4, 3, 6))
        hp = HPairHeuristic.build(p)
        ht = HTriples.build(hp)
        # N=4 cover: one full triangle + one cherry cube (zero-weight third
        # edge) + one leftover pairwise term
        assert ht is not None and len(ht.triangles) == 2
        # true remaining cost: backward DP over the full 4-D lattice
        import itertools
        from mpi_pastar_msa_tpu.core.cost import (COST_TABLE, GAP_EXTENSION,
                                                  GAP_GAP)
        lens = [len(s) for s in p.seqs]
        pairs = p.pairs()
        pw = [int(hp.weight_i[x, y]) for x, y in pairs]
        enc = [np.frombuffer(s.encode("latin-1"), dtype=np.uint8) for s in p.seqs]
        INF = 1 << 40
        rem = np.full([l + 1 for l in lens], INF, dtype=np.int64)
        rem[tuple(lens)] = 0
        for coord in sorted(itertools.product(*[range(l + 1) for l in lens]),
                            key=lambda c: -sum(c)):
            if coord == tuple(lens):
                continue
            best = INF
            for mask in range(1, 1 << 4):
                child = tuple(coord[i] + ((mask >> i) & 1) for i in range(4))
                if any(child[i] > lens[i] for i in range(4)):
                    continue
                c = 0
                for k, (x, y) in enumerate(pairs):
                    bx, by = (mask >> x) & 1, (mask >> y) & 1
                    if bx and by:
                        c += pw[k] * int(COST_TABLE[enc[x][coord[x]], enc[y][coord[y]]])
                    elif bx or by:
                        c += pw[k] * GAP_EXTENSION
                    else:
                        c += pw[k] * GAP_GAP
                best = min(best, c + int(rem[child]))
            rem[coord] = best
        h2_0 = hp.calculate_h(np.zeros(4, np.int32))
        h3_0 = ht.calculate_h(np.zeros(4, np.int32))
        for coord in itertools.product(*[range(l + 1) for l in lens]):
            h3 = ht.calculate_h(np.array(coord, np.int32))
            assert h3 <= rem[coord], (coord, h3, rem[coord])
            assert h3 >= hp.calculate_h(np.array(coord, np.int32))
        assert h3_0 >= h2_0


class TestEngineWithTriples:
    @pytest.mark.parametrize("fasta,flag", [("test.fasta", "auto"),
                                            ("PF08184.fasta", "on")])
    def test_optimal_cost_unchanged(self, fasta, flag):
        from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

        p = problem_from_fasta(f"{REF}/{fasta}")
        h = HPairHeuristic.build(p)
        want = SerialAStar(p, h).run().g
        eng = TpuFrontierSearch(p, h, triples=flag)
        assert getattr(eng.heuristic, "triangles", None), "triples not active"
        res = eng.run()
        assert res.g == want
        # stronger heuristic must not expand more than the serial pairwise
        # run on the tiny N=3 input (exactness collapses the frontier)
        if fasta == "PF08184.fasta":
            assert res.nodes_expanded <= SerialAStar(p, h).run().nodes_expanded

    def test_triples_off_matches(self):
        from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

        p = problem_from_fasta(f"{REF}/PF08184.fasta")
        h = HPairHeuristic.build(p)
        on = TpuFrontierSearch(p, h, triples="on").run().g
        off = TpuFrontierSearch(p, HPairHeuristic.build(p), triples="off").run().g
        assert on == off


class TestFractional:
    """All-triples fractional cover: the whole cost algebra runs scaled by
    n-2 (heuristic/triples.py pick_fractional_cover); the engine must descale
    g exactly and the scaled bound must stay admissible and dominate both
    the pairwise sum and the cherry cover."""

    def test_cover_structure_and_scale(self):
        rng = np.random.default_rng(7)
        for n in (4, 5):
            p = Problem(_rand_seqs(rng, n, 3, 6))
            hp = HPairHeuristic.build(p)
            ht = HTriples.build(hp, fractional=True)
            assert ht is not None
            assert ht.cost_scale == n - 2
            from math import comb
            assert len(ht.triangles) == comb(n, 3)
            # every pair appears in exactly n-2 triangles, at full weight
            from collections import Counter
            seen = Counter()
            for (x, y, z), (wxy, wxz, wyz) in zip(ht.triangles,
                                                  ht.tri_weights):
                assert wxy == int(hp.weight_i[x, y])
                assert wxz == int(hp.weight_i[x, z])
                assert wyz == int(hp.weight_i[y, z])
                seen[(x, y)] += 1
                seen[(x, z)] += 1
                seen[(y, z)] += 1
            assert all(v == n - 2 for v in seen.values())
            # scaled weight surface (edge costs, UB, path-g all consume it)
            assert np.array_equal(ht.weight_i, hp.weight_i * (n - 2))

    def test_admissible_and_dominates_pairwise_scaled(self):
        # frac h(c) <= (n-2) * true remaining, and >= (n-2) * pairwise h(c)
        # (cherry and fractional covers are incomparable pointwise: cherry
        # concentrates full weights in few cubes, fractional spreads each
        # pair over its n-2 cubes)
        rng = np.random.default_rng(8)
        p = Problem(_rand_seqs(rng, 4, 3, 6))
        hp = HPairHeuristic.build(p)
        ht_cherry = HTriples.build(hp)
        ht_frac = HTriples.build(hp, fractional=True)
        assert ht_frac is not None and ht_frac.cost_scale == 2
        import itertools
        from mpi_pastar_msa_tpu.core.cost import (COST_TABLE, GAP_EXTENSION,
                                                  GAP_GAP)
        lens = [len(s) for s in p.seqs]
        pairs = p.pairs()
        pw = [int(hp.weight_i[x, y]) for x, y in pairs]
        enc = [np.frombuffer(s.encode("latin-1"), dtype=np.uint8)
               for s in p.seqs]
        INF = 1 << 40
        rem = np.full([l + 1 for l in lens], INF, dtype=np.int64)
        rem[tuple(lens)] = 0
        for coord in sorted(itertools.product(*[range(l + 1) for l in lens]),
                            key=lambda c: -sum(c)):
            if coord == tuple(lens):
                continue
            best = INF
            for mask in range(1, 1 << 4):
                child = tuple(coord[i] + ((mask >> i) & 1) for i in range(4))
                if any(child[i] > lens[i] for i in range(4)):
                    continue
                c = 0
                for k, (x, y) in enumerate(pairs):
                    bx, by = (mask >> x) & 1, (mask >> y) & 1
                    if bx and by:
                        c += pw[k] * int(
                            COST_TABLE[enc[x][coord[x]], enc[y][coord[y]]])
                    elif bx or by:
                        c += pw[k] * GAP_EXTENSION
                    else:
                        c += pw[k] * GAP_GAP
                best = min(best, c + int(rem[child]))
            rem[coord] = best
        scale = ht_frac.cost_scale
        for coord in itertools.product(*[range(l + 1) for l in lens]):
            ca = np.array(coord, np.int32)
            hf = ht_frac.calculate_h(ca)
            assert hf <= scale * int(rem[coord]), (coord, hf, rem[coord])
            assert hf >= scale * hp.calculate_h(ca)
        # both covers stay admissible at the origin
        assert ht_cherry.calculate_h(np.zeros(4, np.int32)) <= int(rem[0, 0, 0, 0])

    @pytest.mark.parametrize("n,seed", [(4, 11), (4, 12), (5, 13)])
    def test_engine_parity_vs_native(self, n, seed):
        # end-to-end: the (n-2)-scaled search descales g to the exact
        # optimum; closed-path g values divide exactly (attach_path_g
        # would throw otherwise); alignment renders
        from mpi_pastar_msa_tpu.search.backtrace import build_alignment
        from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch
        from mpi_pastar_msa_tpu.search.native import NativeAStar

        rng = np.random.default_rng(seed)
        p = Problem(_rand_seqs(rng, n, 4, 8))
        hp = HPairHeuristic.build(p)
        want = NativeAStar(p, hp).run().g
        eng = TpuFrontierSearch(p, HPairHeuristic.build(p),
                                triples="fractional")
        assert getattr(eng.heuristic, "cost_scale", 1) == n - 2, \
            "fractional cover not active"
        res = eng.run()
        assert res.g == want
        al = build_alignment(p, res.closed)
        assert all(len(r) == len(al[0]) for r in al)
        for row, seq in zip(al, p.seqs):
            assert row.replace("-", "") == seq

    def test_explicit_fractional_fallback_warns(self):
        # an explicit fractional request that cannot fit the budget must not
        # degrade silently (the user asked for a specific bound)
        rng = np.random.default_rng(14)
        p = Problem(_rand_seqs(rng, 5, 4, 8))
        hp = HPairHeuristic.build(p)
        with pytest.warns(RuntimeWarning, match="fractional"):
            ht = HTriples.build(hp, fractional=True, max_triangles=3)
        assert ht is not None and ht.cost_scale == 1  # cherry fallback

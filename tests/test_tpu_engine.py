"""TPU frontier-engine tests (run on the CPU backend via conftest)."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpi_pastar_msa_tpu.core.problem import Problem, problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.search import engine as E
from mpi_pastar_msa_tpu.search.backtrace import build_alignment, similarity
from mpi_pastar_msa_tpu.search.serial import SerialAStar

REF = "/root/reference"


class TestExpandParity:
    def test_matches_serial_successors(self):
        p = problem_from_fasta(f"{REF}/test.fasta")
        h = HPairHeuristic.build(p)
        sa = SerialAStar(p, h)
        eng = E.TpuFrontierSearch(p, h, batch=4)
        st = eng.st

        random.seed(0)
        coords = [tuple(0 for _ in range(p.n_seq))] + [
            tuple(random.randint(0, int(l)) for l in p.final_coord) for _ in range(3)
        ]
        parentis = [p.root_parent_mask, 5, 255, 37]
        gs = [0, 100, 50, 7]
        cj = jnp.asarray(np.array(coords, dtype=np.int32))
        gj = jnp.asarray(np.array(gs, dtype=np.int32))
        pj = jnp.asarray(np.array(parentis, dtype=np.int32))
        act = jnp.ones(4, bool)
        expand = jax.jit(lambda c, g, pp, a: E._expand(st, c, g, pp, a))
        _, g_c, f_c, _, valid, _, _, _ = expand(cj, gj, pj, act)
        g_c = np.asarray(g_c).reshape(4, st.M)
        f_c = np.asarray(f_c).reshape(4, st.M)
        valid = np.asarray(valid).reshape(4, st.M)

        for b, (coord, g0, par) in enumerate(zip(coords, gs, parentis)):
            ser = {}
            for child, cg, mask in sa._successors(coord, g0, par):
                # the engine may auto-upgrade to the triple heuristic; compare
                # against ITS resolved h (g is heuristic-independent)
                ser[mask] = (cg, cg + eng.heuristic.calculate_h(child))
            for m in range(st.M):
                mask = m + 1
                if mask in ser:
                    assert valid[b, m]
                    assert ser[mask] == (g_c[b, m], f_c[b, m])
                else:
                    assert not valid[b, m]


class TestPackHash:
    def test_pack_roundtrip(self):
        coords = jnp.asarray(np.array([[1, 2, 3, 4, 5], [0, 0, 0, 0, 0],
                                       [65534, 1, 65533, 2, 7]], dtype=np.int32))
        keys = E._pack_keys(coords, 3)
        # unpack
        out = np.stack(
            [
                (np.asarray(keys)[:, i // 2] >> (16 * (i % 2))) & 0xFFFF
                for i in range(5)
            ],
            axis=-1,
        )
        assert np.array_equal(out, np.asarray(coords))

    def test_hash_avalanche(self):
        # sequential lattice coords must not cluster
        n = 4096
        coords = np.zeros((n, 4), dtype=np.int32)
        coords[:, 0] = np.arange(n) % 64
        coords[:, 1] = np.arange(n) // 64
        keys = E._pack_keys(jnp.asarray(coords), 2)
        h = np.asarray(E._hash_keys(keys)) & (8192 - 1)
        # no slot should collect a pathological share
        counts = np.bincount(h, minlength=8192)
        assert counts.max() <= 8


class TestEngineEndToEnd:
    @pytest.mark.parametrize(
        "name,want_g,want_sim",
        [
            ("test.fasta", 52440, 50.0),
            ("test2.fasta", 45037, 39.17),
            ("PF08184.fasta", 24450, 95.48),
        ],
    )
    def test_bundled(self, name, want_g, want_sim):
        p = problem_from_fasta(f"{REF}/{name}")
        h = HPairHeuristic.build(p)
        res = E.TpuFrontierSearch(p, h).run()
        assert res.g == want_g
        al = build_alignment(p, res.closed)
        assert round(similarity(al), 2) == round(want_sim, 2)
        for row, s in zip(al, p.seqs):
            assert row.replace("-", "") == s

    def test_random_matches_serial(self):
        random.seed(7)
        seqs = tuple(
            "".join(random.choice("ACDEFGHIKLMNPQRSTVWY") for _ in range(random.randint(5, 12)))
            for _ in range(4)
        )
        p = Problem(seqs)
        h = HPairHeuristic.build(p)
        want = SerialAStar(p, h).run().g
        res = E.TpuFrontierSearch(p, h, batch=64, capacity=1 << 14).run()
        assert res.g == want

    @pytest.mark.parametrize("layout", ["sig", "packed", "unpacked"])
    def test_layouts_agree(self, layout):
        # all three table layouts must find the same optimum and a valid
        # alignment on PF08184 (the default 'auto' resolves to sig here)
        p = problem_from_fasta(f"{REF}/PF08184.fasta")
        h = HPairHeuristic.build(p)
        eng = E.TpuFrontierSearch(p, h, layout=layout)
        assert eng.layout == layout
        res = eng.run()
        assert res.g == 24450
        al = build_alignment(p, res.closed)
        for row, s in zip(al, p.seqs):
            assert row.replace("-", "") == s

    def test_overflow_autoregrow(self):
        # a 32-slot table overflows immediately; the engine must double the
        # capacity and still return the optimal result (never silently lose
        # states)
        p = problem_from_fasta(f"{REF}/PF08184.fasta")
        h = HPairHeuristic.build(p)
        eng = E.TpuFrontierSearch(p, h, batch=64, capacity=1 << 5)
        res = eng.run()
        assert res.g == 24450
        assert eng.st.C > (1 << 5)  # regrow happened


class TestDegenerateWeights:
    def test_warns_and_completes(self):
        import warnings

        # W/Y-only inputs give non-positive rationale-2 weights -> negative
        # edge costs; the engine must warn, disable pruning, and still finish
        p = Problem(("WYWY", "WYY", "YWW"))
        h = HPairHeuristic.build(p)
        assert (h.weight_i[0, 1] <= 0) or (h.weight_i[0, 2] <= 0) or (h.weight_i[1, 2] <= 0)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            res = E.TpuFrontierSearch(p, h, batch=16, capacity=1 << 12).run()
        assert any("optimality is undefined" in str(x.message) for x in w)
        assert res.closed  # produced some alignment path


class TestSixSequences:
    @pytest.mark.slow
    def test_six_sequence_family_matches_native(self):
        # N=6 exercises the 63-mask expansion and 3-word packed keys — a
        # regime none of the bundled inputs covers (kinase N=5, test N=8 is
        # 4-char toy).  Synthetic family: random base + point mutations /
        # indels, solved by both the native C engine and the TPU engine.
        import random

        from mpi_pastar_msa_tpu.search.native import NativeAStar

        random.seed(123)
        aa = "ACDEFGHIKLMNPQRSTVWY"
        base = [random.choice(aa) for _ in range(40)]

        def mutate(seq):
            s = list(seq)
            for _ in range(6):  # point mutations
                s[random.randrange(len(s))] = random.choice(aa)
            for _ in range(2):  # indels
                if random.random() < 0.5 and len(s) > 30:
                    del s[random.randrange(len(s))]
                else:
                    s.insert(random.randrange(len(s)), random.choice(aa))
            return "".join(s)

        seqs = tuple(mutate(base) for _ in range(6))
        p = Problem(seqs)
        h = HPairHeuristic.build(p)

        nat = NativeAStar(p, h).run()
        eng = E.TpuFrontierSearch(p, h)
        res = eng.run()
        assert res.g == nat.g
        # the backtraced alignment must be valid: degapping reproduces inputs
        rows = build_alignment(p, res.closed)
        assert len({len(r) for r in rows}) == 1
        for row, s in zip(rows, seqs):
            assert row.replace("-", "") == s


class TestRealStats:
    def test_path_g_values_and_table_counts(self):
        """The closed dict carries exact g per path node and the per-tid
        stats are real table sizes, semantically matching the reference's
        print_nodes_count (ref: pastar/PAStar.cpp:591-619)."""
        from mpi_pastar_msa_tpu.search.serial import SerialAStar

        p = problem_from_fasta(f"{REF}/PF08184.fasta")
        h = HPairHeuristic.build(p)
        res = E.TpuFrontierSearch(p, h).run()
        oracle = SerialAStar(p, h).run()

        # every path node's g is the exact optimal-path prefix cost
        for coord, (g, mask) in res.closed.items():
            assert coord in oracle.closed
            assert g == oracle.closed[coord][0], coord
        goal = tuple(int(v) for v in p.final_coord)
        assert res.closed[goal][0] == res.g

        # real closed/open table counts: the closed set covers at least the
        # path, closed <= expansions, and closed+open equals the number of
        # distinct coordinates the engine ever inserted (occupancy)
        (exp, reopen, n_closed, n_open), = res.shard_stats
        assert n_closed >= len(res.closed)
        assert n_closed <= exp
        assert exp == res.nodes_expanded
        assert n_open == res.open_size
        assert n_closed > 0 and n_open >= 0


def test_trajectory_independent_of_chunk_size():
    """r5 regression guard: the selection threshold (thr) is CARRIED in the
    counters across chunk dispatches, so the search trajectory — expansion
    count, steps, reopens — must not depend on chunk_steps.  (Before r5,
    thr reset to 0 every chunk and chunk_steps=64 vs 256 changed kinase's
    expansion count by double-digit percents.)"""
    import os

    from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
    from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
    from mpi_pastar_msa_tpu.search.engine import TpuFrontierSearch

    here = os.path.dirname(__file__)
    p = problem_from_fasta(os.path.join(here, "data", "synth5.fasta"))
    h = HPairHeuristic.build(p)
    runs = {}
    for chunk in (8, 64):
        eng = TpuFrontierSearch(p, h, capacity=1 << 19, batch=512,
                                chunk_steps=chunk)
        r = eng.run()
        assert r.g == 266713
        runs[chunk] = (r.nodes_expanded, r.steps, r.nodes_reopened)
    assert runs[8] == runs[64], runs

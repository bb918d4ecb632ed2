"""Randomized stress test of the batch hash-insert protocol.

Feeds batches with heavy duplicate keys (the claim-reservation race paths)
into a small table and checks every result against a Python dict model with
identical decrease-key/reopen semantics.
"""
import random

import jax.numpy as jnp
import numpy as np

from mpi_pastar_msa_tpu.core.problem import Problem
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.search import engine as E


def _mk_static(capacity=1 << 10, batch=64):
    p = Problem(("ACDEFG", "ACDFG", "ACEFG"))
    h = HPairHeuristic.build(p)
    eng = E.TpuFrontierSearch(p, h, batch=batch, capacity=capacity)
    return eng.st


class TestInsertStress:
    def test_randomized_batches_match_model(self):
        st = _mk_static()
        C = st.C
        rng = random.Random(17)
        model = {}  # key tuple -> (g, parenti, f, state)

        t_key = jnp.full((C, st.W), E._EMPTY_WORD, dtype=jnp.uint32)
        t_g = jnp.full((C,), E.INF, dtype=jnp.int32)
        t_f = jnp.full((C,), E.INF, dtype=jnp.int32)
        t_par = jnp.zeros((C,), dtype=jnp.int32)
        t_state = jnp.zeros((C,), dtype=jnp.int32)
        tab = (t_key, t_g, t_f, t_par, t_state)
        claim = jnp.full((C,), E._EMPTY_WORD, dtype=jnp.uint32)

        L = 96
        for step in range(12):
            coords = np.array(
                [[rng.randint(0, 4), rng.randint(0, 3), rng.randint(0, 3)]
                 for _ in range(L)], dtype=np.int32,
            )
            g = np.array([rng.randint(0, 500) for _ in range(L)], dtype=np.int32)
            f = g + 7
            par = np.array([rng.randint(1, 7) for _ in range(L)], dtype=np.int32)
            valid = np.array([rng.random() < 0.8 for _ in range(L)])

            keys = np.asarray(E._pack_keys(jnp.asarray(coords), st.W))
            keys = np.where(valid[:, None], keys, 0xFFFFFFFF).astype(np.uint32)

            tab, reopen, ovf, claim = E._insert(
                st, tab, jnp.asarray(keys), jnp.asarray(g), jnp.asarray(f),
                jnp.asarray(par), jnp.asarray(valid),
                claim=claim, step_tag=jnp.uint32(step),
            )
            assert int(ovf) == 0

            # model update: min-g wins; ties keep either (check g only then)
            for i in range(L):
                if not valid[i]:
                    continue
                k = tuple(coords[i])
                cur = model.get(k)
                if cur is None or g[i] < cur[0]:
                    model[k] = (int(g[i]), int(par[i]), int(f[i]), 1)

            # verify table contents against the model
            tk = np.asarray(tab[0])
            tg = np.asarray(tab[1])
            occupied = tk[:, 0] != 0xFFFFFFFF
            seen = {}
            for s in np.nonzero(occupied)[0]:
                c = tuple(
                    int((tk[s, j // 2] >> (16 * (j % 2))) & 0xFFFF) for j in range(3)
                )
                assert c not in seen, f"duplicate table entry for {c}"
                seen[c] = s
                assert c in model, f"unexpected key {c}"
                assert tg[s] == model[c][0], (c, tg[s], model[c])
            assert set(seen) == set(model)

    def test_same_key_batch_collapse(self):
        # an entire batch of ONE key must produce exactly one entry with min g
        st = _mk_static()
        C = st.C
        L = 64
        coords = np.tile(np.array([[2, 1, 1]], dtype=np.int32), (L, 1))
        g = np.arange(100, 100 + L, dtype=np.int32)[::-1].copy()  # min g = 100 at last
        keys = np.asarray(E._pack_keys(jnp.asarray(coords), st.W)).astype(np.uint32)

        t_key = jnp.full((C, st.W), E._EMPTY_WORD, dtype=jnp.uint32)
        tab = (t_key,
               jnp.full((C,), E.INF, dtype=jnp.int32),
               jnp.full((C,), E.INF, dtype=jnp.int32),
               jnp.zeros((C,), dtype=jnp.int32),
               jnp.zeros((C,), dtype=jnp.int32))
        tab, reopen, ovf, _ = E._insert(
            st, tab, jnp.asarray(keys), jnp.asarray(g), jnp.asarray(g + 5),
            jnp.asarray(np.full(L, 3, np.int32)), jnp.asarray(np.ones(L, bool)),
        )
        assert int(ovf) == 0
        tk = np.asarray(tab[0])
        occ = np.nonzero(tk[:, 0] != 0xFFFFFFFF)[0]
        assert len(occ) == 1
        assert int(np.asarray(tab[1])[occ[0]]) == 100


class TestInsertPackedStress:
    """Same protocol stress, packed layout (the production fast path)."""

    def test_randomized_batches_match_model(self):
        st = _mk_static()
        C = st.C
        nb = st.nb
        rng = random.Random(23)
        model = {}  # key tuple -> (packed_best, h)

        t_key = jnp.full((C, st.KW), E._EMPTY_WORD, dtype=jnp.uint32)
        t_best = jnp.full((C,), E.INFP, dtype=jnp.int32)
        t_closed = jnp.full((C,), E.INFP, dtype=jnp.int32)
        tab = (t_key, t_best, t_closed)
        claim = jnp.full((C,), E._EMPTY_WORD, dtype=jnp.uint32)

        L = 96
        for step in range(12):
            coords = np.array(
                [[rng.randint(0, 4), rng.randint(0, 3), rng.randint(0, 3)]
                 for _ in range(L)], dtype=np.int32,
            )
            f = np.array([rng.randint(1, 500) for _ in range(L)], dtype=np.int32)
            par = np.array([rng.randint(1, 7) for _ in range(L)], dtype=np.int32)
            # h must be a pure function of the coordinate (as in the engine)
            h = np.array([(c[0] * 7 + c[1] * 3 + c[2]) % 50 for c in coords],
                         dtype=np.int32)
            packed = (f << nb) | par
            valid = np.array([rng.random() < 0.8 for _ in range(L)])

            keys = np.asarray(E._pack_keys(jnp.asarray(coords), st.W))
            keys = np.where(valid[:, None], keys, 0xFFFFFFFF).astype(np.uint32)

            tab, ovf, claim, _acct = E._insert_packed(
                st, tab, jnp.asarray(keys), jnp.asarray(h), jnp.asarray(packed),
                jnp.asarray(valid), claim=claim, step_tag=jnp.uint32(step),
            )
            assert int(ovf) == 0

            for i in range(L):
                if not valid[i]:
                    continue
                k = tuple(coords[i])
                cur = model.get(k)
                if cur is None or int(packed[i]) < cur[0]:
                    model[k] = (int(packed[i]), int(h[i]))

            tk = np.asarray(tab[0])
            tb = np.asarray(tab[1])
            occupied = tk[:, 0] != 0xFFFFFFFF
            seen = {}
            for s in np.nonzero(occupied)[0]:
                c = tuple(
                    int((tk[s, j // 2] >> (16 * (j % 2))) & 0xFFFF) for j in range(3)
                )
                assert c not in seen, f"duplicate table entry for {c}"
                seen[c] = s
                assert c in model, f"unexpected key {c}"
                assert tb[s] == model[c][0], (c, tb[s], model[c])
                assert int(tk[s, st.W]) == model[c][1], "h mismatch"
            assert set(seen) == set(model)

    def test_randomized_batches_match_model_sig(self):
        # sig layout: identical protocol, single-word exact signatures in
        # 8-way buckets; table contents are decoded back via _sig_decode
        st = _mk_static()
        assert st.sig_ok
        C = st.C
        nb = st.nb
        rng = random.Random(41)
        model = {}  # key tuple -> (packed_best, h)

        t_sig = jnp.full((st.nbuck, st.ways), E._EMPTY_WORD, dtype=jnp.uint32)
        t_best = jnp.full((C,), E.INFP, dtype=jnp.int32)
        t_closed = jnp.full((C,), E.INFP, dtype=jnp.int32)
        tab = (t_sig, t_best, t_closed)
        claim = jnp.full((C,), E._EMPTY_WORD, dtype=jnp.uint32)

        L = 96
        for step in range(12):
            coords = np.array(
                [[rng.randint(0, 4), rng.randint(0, 3), rng.randint(0, 3)]
                 for _ in range(L)], dtype=np.int32,
            )
            f = np.array([rng.randint(1, 500) for _ in range(L)], dtype=np.int32)
            par = np.array([rng.randint(1, 7) for _ in range(L)], dtype=np.int32)
            h = np.array([(c[0] * 7 + c[1] * 3 + c[2]) % 50 for c in coords],
                         dtype=np.int32)
            packed = (f << nb) | par
            valid = np.array([rng.random() < 0.8 for _ in range(L)])

            home, sigb = E._sig_encode(st, jnp.asarray(coords))
            tab, ovf, claim, _acct = E._insert_sig(
                st, tab, home, sigb, jnp.asarray(h), jnp.asarray(packed),
                jnp.asarray(valid), claim=claim, step_tag=jnp.uint32(step),
            )
            assert int(ovf) == 0

            for i in range(L):
                if not valid[i]:
                    continue
                k = tuple(coords[i])
                cur = model.get(k)
                if cur is None or int(packed[i]) < cur[0]:
                    model[k] = (int(packed[i]), int(h[i]))

            ts = np.asarray(tab[0]).reshape(-1)
            tb = np.asarray(tab[1])
            occ = np.nonzero(ts != 0xFFFFFFFF)[0].astype(np.int32)
            dec = np.asarray(E._sig_decode(
                st, jnp.asarray(occ), jnp.asarray(ts[occ])))
            seen = {}
            for s, c_arr in zip(occ, dec):
                c = tuple(int(v) for v in c_arr)
                assert c not in seen, f"duplicate table entry for {c}"
                seen[c] = s
                assert c in model, f"unexpected key {c}"
                assert tb[s] == model[c][0], (c, tb[s], model[c])
            assert set(seen) == set(model)

    def test_sig_encode_decode_roundtrip(self):
        st = _mk_static()
        rng = np.random.default_rng(7)
        coords = np.stack([rng.integers(0, hi + 1, 512)
                           for hi in st.final_np], axis=1).astype(np.int32)
        home, sigb = E._sig_encode(st, jnp.asarray(coords))
        # decode from way 0 of the home bucket with r=0 (what a stored
        # entry holds)
        dec = np.asarray(E._sig_decode(
            st, (home.astype(jnp.int32) * st.ways), sigb))
        np.testing.assert_array_equal(dec, coords)
        # distinct coords must map to distinct (home, sig) pairs
        pairs = set(zip(np.asarray(home).tolist(), np.asarray(sigb).tolist()))
        uniq = {tuple(c) for c in coords.tolist()}
        assert len(pairs) == len(uniq)

    def test_sig_full_bucket_chains_high_load(self):
        # tiny table (16 buckets x 8 ways = 128 slots) loaded to 75% with
        # the FULL 6x4x4 lattice: forces full buckets, multi-bucket probe
        # walks, and way-claim conflicts — the rare paths of the bucketed
        # layout.  Every key must land exactly once, best = model min.
        st = _mk_static(capacity=1 << 7, batch=16)
        assert st.sig_ok and st.nbuck == 16
        C = st.C
        nb = st.nb
        rng = random.Random(99)
        all_coords = [(a, b, c) for a in range(6) for b in range(4)
                      for c in range(4)]
        model = {}

        t_sig = jnp.full((st.nbuck, st.ways), E._EMPTY_WORD, dtype=jnp.uint32)
        t_best = jnp.full((C,), E.INFP, dtype=jnp.int32)
        t_closed = jnp.full((C,), E.INFP, dtype=jnp.int32)
        tab = (t_sig, t_best, t_closed)
        claim = jnp.full((C,), E._EMPTY_WORD, dtype=jnp.uint32)

        L = 64
        for step in range(14):
            picks = [rng.choice(all_coords) for _ in range(L)]
            coords = np.array(picks, dtype=np.int32)
            f = np.array([rng.randint(1, 500) for _ in range(L)], dtype=np.int32)
            par = np.array([rng.randint(1, 7) for _ in range(L)], dtype=np.int32)
            packed = (f << nb) | par
            valid = np.array([rng.random() < 0.9 for _ in range(L)])

            home, sigb = E._sig_encode(st, jnp.asarray(coords))
            tab, ovf, claim, _acct = E._insert_sig(
                st, tab, home, sigb, jnp.zeros(L, jnp.int32),
                jnp.asarray(packed), jnp.asarray(valid),
                claim=claim, step_tag=jnp.uint32(step),
            )
            assert int(ovf) == 0
            for i in range(L):
                if not valid[i]:
                    continue
                k = tuple(coords[i].tolist())
                cur = model.get(k)
                if cur is None or int(packed[i]) < cur:
                    model[k] = int(packed[i])

            ts = np.asarray(tab[0]).reshape(-1)
            tb = np.asarray(tab[1])
            occ = np.nonzero(ts != 0xFFFFFFFF)[0].astype(np.int32)
            dec = np.asarray(E._sig_decode(
                st, jnp.asarray(occ), jnp.asarray(ts[occ])))
            seen = {}
            for s, c_arr in zip(occ, dec):
                c = tuple(int(v) for v in c_arr)
                assert c not in seen, f"duplicate table entry for {c}"
                seen[c] = s
                assert c in model, f"unexpected key {c}"
                assert tb[s] == model[c], (c, tb[s], model[c])
            assert set(seen) == set(model)
        # the walk populated most of the lattice: high load reached
        assert len(model) >= 80

    def test_reopen_semantics_via_select(self):
        # equal-f reinsert of a closed slot must NOT reopen; strictly better
        # f must (the reference's `<` rule, pastar/PAStar.cpp:226-231)
        st = _mk_static(capacity=1 << 8, batch=16)
        C = st.C
        nb = st.nb
        coords = np.array([[1, 1, 1]], dtype=np.int32)
        keys = np.asarray(E._pack_keys(jnp.asarray(coords), st.W)).astype(np.uint32)
        h = np.array([5], dtype=np.int32)

        tab = (jnp.full((C, st.KW), E._EMPTY_WORD, dtype=jnp.uint32),
               jnp.full((C,), E.INFP, dtype=jnp.int32),
               jnp.full((C,), E.INFP, dtype=jnp.int32))

        def ins(tab, f, par):
            packed = np.array([(f << nb) | par], dtype=np.int32)
            tab, ovf, *_rest = E._insert_packed(
                st, tab, jnp.asarray(keys), jnp.asarray(h), jnp.asarray(packed),
                jnp.asarray(np.ones(1, bool)))
            assert int(ovf) == 0
            return tab

        def n_open(tab):
            return int(np.asarray(jnp.sum(tab[1] < tab[2])))

        tab = ins(tab, 100, 3)
        assert n_open(tab) == 1
        # close it the way selection does
        t_key, t_best, t_closed = tab
        slot = int(np.nonzero(np.asarray(t_key)[:, 0] != 0xFFFFFFFF)[0][0])
        t_closed = t_closed.at[slot].set(t_best[slot])
        tab = (t_key, t_best, t_closed)
        assert n_open(tab) == 0
        tab = ins(tab, 100, 5)  # equal f, different par -> par 5 > 3 loses; stays closed
        assert n_open(tab) == 0
        tab = ins(tab, 100, 2)  # equal f, lower par wins the tie -> reopens
        assert n_open(tab) == 1
        t_key, t_best, t_closed = tab
        t_closed = t_closed.at[slot].set(t_best[slot])
        tab = (t_key, t_best, t_closed)
        tab = ins(tab, 99, 7)  # strictly better f -> reopens
        assert n_open(tab) == 1

"""Stage-by-stage attribution INSIDE the sig-layout insert.

Runs K full steps per dispatch where the insert is truncated after stage S:
  0: sig_encode + prefix_sum (vector math only)
  1: + round-0 lookup (bucket row gather, full width)
  2: + match placement (full-width scatter-min on t_best)
  3: + compact_gather of non-matching lanes to L/4
  4: + first probe call (claim scatter + verify + sig write)
  5: + mop-up while_loop
  6: + tier placement scatter-min  (== full insert, tierA path)
Wall clock around the dispatch (final host fetch) is the honest time.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpi_pastar_msa_tpu.core.problem import problem_from_fasta
from mpi_pastar_msa_tpu.heuristic.hpair import HPairHeuristic
from mpi_pastar_msa_tpu.search import engine as E

KINASE = "/root/reference/kinase.fasta"


def staged_insert(st, tab, claim, home, sigb, packed, valid, step_tag, stage):
    t_sig, t_best, t_closed = tab
    C, NB, ways = st.C, st.nbuck, st.ways
    L = home.shape[0]
    acc = jnp.int32(0)

    nv = E._prefix_sum(valid.astype(jnp.int32))
    acc = acc + nv[-1]
    if stage == 0:
        return tab, claim, acc

    rec = jnp.stack(
        [jax.lax.bitcast_convert_type(home, jnp.int32),
         jax.lax.bitcast_convert_type(sigb, jnp.int32),
         packed], axis=1)
    buck = (home & np.uint32(NB - 1)).astype(jnp.int32)
    row = t_sig[jnp.clip(buck, 0, NB - 1)]
    match_w = row == sigb[:, None]
    match = jnp.any(match_w, axis=1) & valid
    slot0 = buck * ways + jnp.argmax(match_w, axis=1).astype(jnp.int32)
    rec = jnp.concatenate(
        [rec, jax.lax.bitcast_convert_type(row, jnp.int32)], axis=1)
    acc = acc + jnp.sum(match)
    if stage == 1:
        return tab, claim, acc

    t_best = t_best.at[jnp.where(match, slot0, C)].min(packed, mode="drop")
    acc = acc + t_best[0]
    if stage == 2:
        return (t_sig, t_best, t_closed), claim, acc

    un = valid & ~match
    Ma = max(L // 4, 1024)
    nvA = E._prefix_sum(un.astype(jnp.int32))
    rowsA, okA, cntA = E._compact_gather(un, nvA, Ma, rec)
    acc = acc + cntA + rowsA[0, 0]
    if stage == 3:
        return (t_sig, t_best, t_closed), claim, acc

    idx = jnp.arange(Ma, dtype=jnp.uint32)
    first = E._probe_body_sig_factory(st, rowsA, idx, step_tag,
                                      use_rec_row=True)
    carry = (jnp.int32(0), ~okA, jnp.full((Ma,), C, dtype=jnp.int32),
             (t_sig, t_best), claim)
    carry = first(carry)
    k, adone, aslot, (t_sig, t_best), claim = carry
    acc = acc + jnp.sum(adone)
    if stage == 4:
        return (t_sig, t_best, t_closed), claim, acc

    body = E._probe_body_sig_factory(st, rowsA, idx, step_tag)

    def cond(c):
        kk, dn, _, _, _ = c
        return (kk < st.max_probes) & jnp.any(~dn)

    k, adone, aslot, (t_sig, t_best), claim = jax.lax.while_loop(
        cond, body, (k, adone, aslot, (t_sig, t_best), claim))
    acc = acc + jnp.sum(adone) + k
    if stage == 5:
        return (t_sig, t_best, t_closed), claim, acc

    placed = okA & adone
    t_best = t_best.at[jnp.where(placed, aslot, C)].min(rowsA[:, 2],
                                                        mode="drop")
    acc = acc + t_best[0]
    return (t_sig, t_best, t_closed), claim, acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    kin = problem_from_fasta(KINASE)
    h = HPairHeuristic.build(kin)
    eng = E.TpuFrontierSearch(kin, h, capacity=1 << 24, batch=16384,
                              chunk_steps=64)
    st = eng.st

    tab = eng._init_table()
    counters = jnp.asarray(np.array([E.INF, 0, 0, 0, 0, 0, 0], dtype=np.int32))
    ub_dev = jnp.asarray(np.int32(eng.ub))
    for _ in range(args.chunks):
        tab, counters = eng._run_loop(tab, counters,
                                      jnp.asarray(np.int32(64)), ub_dev,
                                      eng._htab_arg(), st.d_enc)
    cv = np.asarray(counters)
    print(f"warm state: steps={cv[2]} expanded={cv[3]} n_open={cv[5]}")
    tab_np = tuple(np.asarray(a) for a in tab)
    K = args.steps

    def variant(stage):
        @jax.jit
        def run(tab, ub, htab, henc):
            goal_g = jnp.asarray(np.int32(1 << 30))
            claim = jnp.full((st.C,), E._EMPTY_WORD, dtype=jnp.uint32)

            def body(i, carry):
                tab, claim, thr, acc = carry
                tab, coords, g, par, active, fmin, n_open, n_sel, ro = \
                    E._select_sig(st, tab, goal_g, thr)
                keys, g_c, f_c, mask_c, valid, is_goal, child, h_c = \
                    E._expand(st, coords, g, par, active, None, htab, henc,
                              g_is_f=True)
                valid = valid & (f_c <= ub)
                packed = (f_c << st.nb) | mask_c
                home, sigb = E._sig_encode(st, child)
                tab, claim, acc2 = staged_insert(
                    st, tab, claim, home, sigb, packed, valid,
                    i.astype(jnp.uint32), stage)
                thr = E._adapt_thr(thr, n_sel, st.B)
                return tab, claim, thr, acc + acc2 + fmin

            tab, claim, thr, acc = jax.lax.fori_loop(
                0, K, body, (tab, claim, jnp.int32(64), jnp.int32(0)))
            return acc
        return run

    base = None
    for stage in range(7):
        fn = variant(stage)
        t_in = tuple(jnp.asarray(a) for a in tab_np)
        np.asarray(fn(t_in, ub_dev, eng._htab_arg(), st.d_enc))
        walls = []
        for _ in range(3):
            t_in = tuple(jnp.asarray(a) for a in tab_np)
            np.asarray(t_in[0][0, 0])
            t0 = time.perf_counter()
            acc = fn(t_in, ub_dev, eng._htab_arg(), st.d_enc)
            np.asarray(acc)
            walls.append((time.perf_counter() - t0) / K * 1e3)
        w = min(walls)
        d = "" if base is None else f"  (+{w - base:.3f})"
        print(f"stage {stage}: {w:7.3f} ms/step{d}")
        base = w


if __name__ == "__main__":
    main()

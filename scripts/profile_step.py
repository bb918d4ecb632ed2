"""Per-phase step attribution on a realistic mid-search kinase state.

block_until_ready does not reliably wait on this tunneled backend, so each
variant runs K super-steps INSIDE one dispatch (lax.while_loop) and the wall
clock around the dispatch (with a final host fetch of the counters) is the
honest device time.  Variants: select-only, select+expand, full step.

Usage: python scripts/profile_step.py [--chunks 6] [--steps 64]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--capacity", type=int, default=1 << 23)
    args = ap.parse_args()

    kin = problem_from_fasta(KINASE)
    h = HPairHeuristic.build(kin)
    eng = E.TpuFrontierSearch(kin, h, capacity=args.capacity,
                              batch=args.batch, chunk_steps=64)
    st = eng.st
    print(f"layout={eng.layout} B={st.B} C={st.C} M={st.M} P={st.P}")

    tab = eng._init_table()
    counters = jnp.asarray(E.fresh_counters())
    ub_dev = jnp.asarray(np.int32(eng.ub))
    for _ in range(args.chunks):
        tab, counters = eng._run_loop(tab, counters,
                                      jnp.asarray(np.int32(64)), ub_dev,
                                      eng._htab_arg(), st.d_enc, st.d_tri8,
                                      jnp.asarray(np.int32(eng.fill_target)))
    cv = np.asarray(counters)
    print(f"warm state: steps={cv[2]} expanded={cv[3]} n_open={cv[5]} "
          f"fmin={cv[1]}")
    tab_np = tuple(np.asarray(a) for a in tab)  # restorable snapshot

    K = args.steps

    def variant_loop(mode):
        @jax.jit
        def run(tab, ub, htab, henc, tri8):
            goal_g = jnp.asarray(np.int32(1 << 30))
            claim = jnp.zeros((1,), dtype=jnp.uint32)  # sig path ignores it

            def body(i, carry):
                tab, claim, thr, acc = carry
                tab, coords, g, par, active, fmin, n_open, n_sel, ro = \
                    E._select_sig(st, tab, goal_g, thr)
                acc = acc + fmin + n_sel
                if mode >= 1:
                    keys, g_c, f_c, mask_c, valid, is_goal, child, h_c = \
                        E._expand(st, coords, g, par, active, None, htab,
                                  henc, g_is_f=True, tri8=tri8)
                    valid = valid & (f_c <= ub)
                    acc = acc + jnp.sum(valid)
                if mode >= 2:
                    packed = (f_c << st.nb) | mask_c
                    tab, ovf, claim, _acct = E._insert_sig(
                        st, tab, *E._candidates_sig(st, keys, child), h_c,
                        packed, valid, claim=claim,
                        step_tag=i.astype(jnp.uint32))
                    acc = acc + ovf
                thr = E._adapt_thr(thr, n_sel, st.B)
                return tab, claim, thr, acc

            tab, claim, thr, acc = jax.lax.fori_loop(
                0, K, body, (tab, claim, jnp.int32(64), jnp.int32(0)))
            return acc

        return run

    names = ["select-only", "select+expand", "full step"]
    results = {}
    for mode in (0, 1, 2):
        fn = variant_loop(mode)
        t_in = tuple(jnp.asarray(a) for a in tab_np)
        acc = fn(t_in, ub_dev, eng._htab_arg(), st.d_enc, st.d_tri8)
        np.asarray(acc)  # compile + settle
        walls = []
        for _ in range(3):
            t_in = tuple(jnp.asarray(a) for a in tab_np)
            np.asarray(t_in[0][0, 0])  # make sure upload settled
            t0 = time.perf_counter()
            acc = fn(t_in, ub_dev, eng._htab_arg(), st.d_enc, st.d_tri8)
            np.asarray(acc)
            walls.append((time.perf_counter() - t0) / K * 1e3)
        results[mode] = min(walls)
        print(f"{names[mode]:14s}: {results[mode]:7.3f} ms/step", flush=True)

    print(f"expand ~= {results[1] - results[0]:.3f} ms, "
          f"insert ~= {results[2] - results[1]:.3f} ms")


if __name__ == "__main__":
    main()

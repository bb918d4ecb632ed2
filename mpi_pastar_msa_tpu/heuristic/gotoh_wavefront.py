"""Device-side anti-diagonal wavefront for the Gotoh primer matrices.

TPU-native replacement for the host NumPy 3-matrix (diag/horiz/vert) global
alignment fill used by the Altschul rationale-2 weight precompute
(`weights._gotoh_pair_matrices`, mirroring ref: pastar/WeightedSP.cpp:144-220):
cells on one anti-diagonal are independent, so a ``lax.scan`` walks diagonals
forward from (0, 0) carrying the previous two diagonals of all three
matrices, and ``vmap`` batches ALL C(N,2) pairs at once.  This lifts the
reference's ``MAX_SEQ_SIZE=1000`` cap (ref: pastar/include/WeightedSP.hpp:10)
for the weight phase the same way `wavefront.py` lifted it for the HPair
suffix tables.

All arithmetic is int32 (the reference uses int), so the device fill is
bit-identical to the NumPy fill; the per-mille distance traceback
(`weights._traceback_distance`) stays on host — it is O(n+m) sequential and
needs random access into the filled matrices.

Layout: sequences are dash-prefixed as in the reference's workaround
(ref: WeightedSP.cpp:445-447); matrices are (n+1) x (m+1) with the interior
recurrence on (1..n) x (1..m) (the reference's loop bound ``i < n`` is over
the dash-PREFIXED length), borders hh[0, j] / vv[i, 0] accumulated in-scan,
and everything else left at _BIG — exactly the cells the host fill produces.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cost import COST_TABLE, DASH, PRIMER_EFFECTIVE_GAP_COST, PRIMER_GAP_COST

_BIG = np.int32(999999)  # ref: WeightedSP.hpp:12


@partial(jax.jit, static_argnums=(4,))
def _gotoh_wavefront(seq_a, seq_b, n1s, n2s, l1: int):
    """Batched Gotoh dd/hh/vv fills.

    seq_a/seq_b: (P, l1) int32 dash-prefixed residue codes (0-padded);
                 seq_a[p, 0] == ord('-')
    n1s/n2s:     (P,) int32 ORIGINAL lengths (n, m) — arrays hold n+1 / m+1
    l1:          static max dash-prefixed length (max(n)+1)
    returns:     3 arrays (P, l1, l1) int32 — dd, hh, vv
    """
    cost = jnp.asarray(COST_TABLE)
    D = 2 * (l1 - 1)  # max diagonal index
    EGC = np.int32(PRIMER_EFFECTIVE_GAP_COST)
    GC = np.int32(PRIMER_GAP_COST)

    def one_pair(a, b, n, m):
        subH = cost[DASH, b]  # (l1,) cost(DASH, b[j])
        subV = cost[a, DASH]  # (l1,) cost(a[i], DASH)

        ii = jnp.arange(l1)

        def sub_at(d):
            j = jnp.clip(d - ii, 0, l1 - 1)
            return cost[a[jnp.clip(ii, 0, l1 - 1)], b[j]]

        def scan_body(carry, d):
            dd1, hh1, vv1, dd2, hh2, vv2 = carry  # diagonals d-1 and d-2
            i = ii
            j = d - i
            # terminal-gap discount on the LAST row/column (i == n, j == m):
            # the reference's n is the dash-prefixed length, so its i==n-1
            # test fires at the last real char (ref: WeightedSP.cpp:203-216;
            # captured-binary-verified in round 2)
            Gi = jnp.where(i == n, EGC, GC)
            Gj = jnp.where(j == m, EGC, GC)

            def shift(x, fill):
                # value at lane i-1 of the same diagonal array
                return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])

            # [i, j-1] = prev1 lane i; [i-1, j] = prev1 lane i-1;
            # [i-1, j-1] = prev2 lane i-1
            dd1_im1 = shift(dd1, _BIG)
            hh1_im1 = shift(hh1, _BIG)
            vv1_im1 = shift(vv1, _BIG)
            dd2_im1 = shift(dd2, _BIG)
            hh2_im1 = shift(hh2, _BIG)
            vv2_im1 = shift(vv2, _BIG)

            gH = subH[jnp.clip(j, 0, l1 - 1)]
            gV = subV[jnp.clip(i, 0, l1 - 1)]

            d_new = (jnp.minimum(jnp.minimum(dd2_im1, hh2_im1), vv2_im1)
                     + sub_at(d))
            h_new = (jnp.minimum(jnp.minimum(dd1 + Gi, hh1), vv1 + Gi) + gH)
            v_new = (jnp.minimum(jnp.minimum(dd1_im1 + Gj, hh1_im1 + Gj),
                                 vv1_im1) + gV)

            interior = (i >= 1) & (i <= n) & (j >= 1) & (j <= m)
            top = (i == 0) & (j >= 1) & (j <= m)    # hh[0, j] border
            left = (j == 0) & (i >= 1) & (i <= n)   # vv[i, 0] border
            origin = (i == 0) & (j == 0)

            # border accumulation rides the same recurrence inputs:
            # hh[0, j] = hh[0, j-1] + gH;  vv[i, 0] = vv[i-1, 0] + gV
            h_top = hh1 + gH
            v_left = vv1_im1 + gV

            dd_d = jnp.where(origin, 0, jnp.where(interior, d_new, _BIG))
            hh_d = jnp.where(origin, EGC,
                             jnp.where(top, h_top,
                                       jnp.where(interior, h_new, _BIG)))
            vv_d = jnp.where(origin, EGC,
                             jnp.where(left, v_left,
                                       jnp.where(interior, v_new, _BIG)))
            return (dd_d, hh_d, vv_d, dd1, hh1, vv1), (dd_d, hh_d, vv_d)

        big = jnp.full((l1,), _BIG, jnp.int32)
        (_, _, _, _, _, _), (ddd, hhd, vvd) = jax.lax.scan(
            scan_body, (big, big, big, big, big, big),
            jnp.arange(D + 1),
        )

        # assemble (i, j)-major: out[i, j] = diag[i + j][i]
        i = jnp.arange(l1)[:, None]
        j = jnp.arange(l1)[None, :]
        d_idx = jnp.clip(i + j, 0, D)

        def to_ij(diags):
            out = diags[d_idx, i]
            return jnp.where(i + j <= D, out, _BIG)

        return to_ij(ddd), to_ij(hhd), to_ij(vvd)

    return jax.vmap(one_pair)(seq_a, seq_b, n1s, n2s)


def gotoh_matrices_device(enc_pairs, lens):
    """Batched device fill.

    enc_pairs: list of (a, b) int arrays, dash-prefixed (as weights.py builds)
    lens:      list of (n, m) original lengths
    Returns list of (dd, hh, vv) int64 NumPy triples matching
    weights._gotoh_pair_matrices exactly (shape (n+1, m+1) per pair).
    """
    P = len(enc_pairs)
    l1 = max(max(len(a), len(b)) for a, b in enc_pairs)
    # round the static shape up so different problem sizes share one compiled
    # program (the scan length is 2*l1 — padding costs a few % of runtime,
    # recompiling costs ~30 s)
    l1 = ((l1 + 511) // 512) * 512
    seq_a = np.zeros((P, l1), dtype=np.int32)
    seq_b = np.zeros((P, l1), dtype=np.int32)
    for p, (a, b) in enumerate(enc_pairs):
        seq_a[p, : len(a)] = a
        seq_b[p, : len(b)] = b
    n1s = np.array([n for n, _ in lens], dtype=np.int32)
    n2s = np.array([m for _, m in lens], dtype=np.int32)
    dd, hh, vv = _gotoh_wavefront(
        jnp.asarray(seq_a), jnp.asarray(seq_b),
        jnp.asarray(n1s), jnp.asarray(n2s), l1,
    )
    dd = np.asarray(dd).astype(np.int64)
    hh = np.asarray(hh).astype(np.int64)
    vv = np.asarray(vv).astype(np.int64)
    out = []
    for p, (n, m) in enumerate(lens):
        out.append((dd[p, : n + 1, : m + 1],
                    hh[p, : n + 1, : m + 1],
                    vv[p, : n + 1, : m + 1]))
    return out

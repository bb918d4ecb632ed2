"""Device-side anti-diagonal wavefront DP for the pairwise suffix tables.

TPU-native replacement for the host NumPy suffix DP
(`pairwise.suffix_table_numpy`, mirroring ref: pastar/PairAlign.cpp:137-171):
cells on one anti-diagonal are independent, so the whole diagonal is one
vector op; a ``lax.scan`` walks diagonals from the high corner to (0, 0), and
``vmap`` batches ALL C(N,2) pairs at once — this removes the reference's
serial per-pair Phase-1 loop (ref: pastar/HeuristicHPair.cpp:54-62) and lifts
its MAX_SEQ_SIZE=1000 cap.

Diagonal-major layout: ``diag[d, i] = m[i, d - i]``; the final (i, j)-major
stack is produced by one gather at the end.

Cost model matches the reference exactly (including the GapX-over-GapY tie
preference and the direction-matrix affine bookkeeping, which only matters
when GapOpen != GapExtension).
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from ..core.cost import COST_TABLE, GAP_EXTENSION, GAP_OPEN
from ..core.problem import Problem

_BIG = np.int32(2**28)
_NOGAP, _GAPX, _GAPY = 0, 1, 2


@partial(jax.jit, static_argnums=(4,))
def _wavefront_tables(seq_a, seq_b, n1s, n2s, lmax: int):
    """Batched suffix tables.

    seq_a/seq_b: (P, lmax) int32 residue codes (0-padded)
    n1s/n2s:     (P,) int32 true lengths
    returns:     (P, lmax+1, lmax+1) int32 tables (cells outside a pair's
                 (n1+1)x(n2+1) range hold _BIG)
    """
    P = seq_a.shape[0]
    L1 = lmax + 1
    cost = jnp.asarray(COST_TABLE)

    # sub in diagonal-major layout: subd[p, d, i] = cost(a[i], b[d - i])
    ii = jnp.arange(L1)
    dd = jnp.arange(2 * lmax + 1)
    jj = dd[:, None] - ii[None, :]  # (D, L1)
    jv = jnp.clip(jj, 0, lmax - 1 if lmax > 0 else 0)
    iv = jnp.clip(ii, 0, lmax - 1 if lmax > 0 else 0)

    def sub_pair(a, b):
        return cost[a[iv][None, :].repeat(dd.shape[0], 0), b[jv]]

    subd = jax.vmap(sub_pair)(seq_a, seq_b)  # (P, D, L1)

    E, O = GAP_EXTENSION, GAP_OPEN

    def one_pair(subd_p, n1, n2):
        D = n1 + n2  # top diagonal index (cell (n1, n2))

        def border_val(i, d):
            """Value of border cell (i, d-i) on the bottom row / right col."""
            j = d - i
            bottom = O + (n2 - 1 - j) * E  # i == n1, j < n2
            right = O + (n1 - 1 - i) * E   # j == n2, i < n1
            corner = jnp.int32(0)
            v = jnp.where(i == n1, jnp.where(j == n2, corner, bottom), right)
            return v

        def border_aff(i, d):
            j = d - i
            return jnp.where(
                (i == n1) & (j == n2), _NOGAP, jnp.where(i == n1, _GAPY, _GAPX)
            )

        def scan_body(carry, dr):
            # dr counts down: d = D - dr - 1 is the diagonal we fill
            v1, a1, v2 = carry  # diagonals d+1 and d+2
            d = D - dr - 1
            i = jnp.arange(L1)
            j = d - i
            in_range = (i >= 0) & (i <= n1) & (j >= 0) & (j <= n2)
            is_border = (i == n1) | (j == n2)

            v1_ip1 = jnp.concatenate([v1[1:], jnp.full((1,), _BIG)])
            a1_ip1 = jnp.concatenate([a1[1:], jnp.full((1,), _NOGAP)])
            v2_ip1 = jnp.concatenate([v2[1:], jnp.full((1,), _BIG)])

            c0 = v1_ip1 + jnp.where(a1_ip1 == _GAPX, E, O)  # from (i+1, j)
            c1 = v1 + jnp.where(a1 == _GAPY, E, O)          # from (i, j+1)
            c2 = v2_ip1 + subd_p[jnp.clip(d, 0, 2 * lmax), :]  # from (i+1, j+1)

            take_x = c0 < c1
            mv = jnp.where(take_x, c0, c1)
            gv = jnp.where(take_x, _GAPX, _GAPY)
            diag_w = c2 < mv
            mv = jnp.where(diag_w, c2, mv)
            gv = jnp.where(diag_w, _NOGAP, gv)

            mv = jnp.where(is_border, border_val(i, d), mv)
            gv = jnp.where(is_border, border_aff(i, d), gv)
            mv = jnp.where(in_range, mv, _BIG)
            gv = jnp.where(in_range, gv, _NOGAP)
            return (mv, gv, v1), (mv, d)

        # init: diagonal D holds only the corner (n1, n2); D+1 is empty
        i0 = jnp.arange(L1)
        vD = jnp.where(i0 == n1, 0, _BIG)
        aD = jnp.full((L1,), _NOGAP)
        vD1 = jnp.full((L1,), _BIG)

        (_, _, _), (diags, ds) = jax.lax.scan(
            scan_body, (vD, aD, vD1), jnp.arange(2 * lmax)
        )
        # assemble (i, j) layout: out[i, j] = diag[d = i+j][i]
        # diags[k] is diagonal D-k-1; add diagonal D back at index 0
        all_diags = jnp.concatenate([vD[None, :], diags], axis=0)  # (2*lmax+1, L1)
        all_ds = jnp.concatenate([jnp.full((1,), D), ds])

        # scatter diag rows into a diag-indexed buffer; negative diagonals
        # (shorter-than-lmax pairs) land in a trash row, not row 0
        buf = jnp.full((2 * lmax + 2, L1), _BIG, jnp.int32)
        buf = buf.at[jnp.where(all_ds >= 0, all_ds, 2 * lmax + 1)].set(all_diags)
        i = jnp.arange(L1)[:, None]
        j = jnp.arange(L1)[None, :]
        out = buf[jnp.clip(i + j, 0, 2 * lmax + 1), i]
        valid = (i <= n1) & (j <= n2)
        return jnp.where(valid, out, _BIG)

    return jax.vmap(one_pair)(subd, n1s, n2s)


def pair_tables_device(problem: Problem) -> np.ndarray:
    """All C(N,2) suffix tables computed on device; (P, Lmax+1, Lmax+1) int32."""
    pairs = problem.pairs()
    lmax = problem.max_length
    enc = problem.encoded(lmax).astype(np.int32)  # (N, lmax)
    seq_a = np.stack([enc[x] for x, _ in pairs])
    seq_b = np.stack([enc[y] for _, y in pairs])
    n1s = np.array([len(problem.seqs[x]) for x, _ in pairs], dtype=np.int32)
    n2s = np.array([len(problem.seqs[y]) for _, y in pairs], dtype=np.int32)
    out = _wavefront_tables(
        jnp.asarray(seq_a), jnp.asarray(seq_b),
        jnp.asarray(n1s), jnp.asarray(n2s), lmax,
    )
    return np.asarray(out)

"""Pallas TPU kernel for the anti-diagonal pairwise suffix DP.

Hand-scheduled variant of ``wavefront._wavefront_tables``: one kernel instance
per sequence pair (grid=(P,)), the three rolling diagonals live in VMEM
scratch, and each ``fori_loop`` iteration computes one full anti-diagonal as a
vector op and stores it to the diagonal-major output block — no HBM traffic
for the carried state, unlike the XLA scan which round-trips the carry.

Cost model identical to the reference recurrence (ref: pastar/PairAlign.cpp:
96-171): min over gap-from-below / gap-from-right (GapX preferred on ties,
gap cost chosen by the direction matrix) and diagonal substitution.

Layout: all vectors are (1, L1p) rows with L1p padded to a lane multiple; the
(i, j)-major stack is assembled outside the kernel with one gather.
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(nlim_ref, subd_ref, out_ref, v1_ref, a1_ref, v2_ref, *, lmax: int, L1p: int):
    """One pair's full suffix DP.

    nlim_ref: (2,) SMEM int32 [n1, n2]
    subd_ref: (D, L1p) VMEM int32, subd[d, i] = cost(a[i], b[d-i]) (garbage
              where out of range; masked below)
    out_ref:  (D+1, L1p) VMEM int32 diagonal-major result
    v1/a1/v2: (1, L1p) VMEM scratch (diagonals d+1, its direction, d+2)
    """
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)
    n1 = nlim_ref[pid, 0]
    n2 = nlim_ref[pid, 1]
    D = n1 + n2
    E = jnp.int32(GAP_EXTENSION)
    O = jnp.int32(GAP_OPEN)

    i_idx = jax.lax.broadcasted_iota(jnp.int32, (1, L1p), 1)

    # top diagonal D: only the corner (n1, n2)
    vD = jnp.where(i_idx == n1, jnp.int32(0), _BIG)
    v1_ref[...] = vD
    a1_ref[...] = jnp.full((1, L1p), _NOGAP, jnp.int32)
    v2_ref[...] = jnp.full((1, L1p), _BIG, jnp.int32)
    out_ref[0, jnp.minimum(D, 2 * lmax), :] = vD[0]

    def body(dr, _):
        d = D - dr - 1

        @pl.when(d >= 0)
        def _():
            v1 = v1_ref[...]
            a1 = a1_ref[...]
            v2 = v2_ref[...]
            j_idx = d - i_idx
            in_range = (i_idx <= n1) & (j_idx >= 0) & (j_idx <= n2)
            is_border = (i_idx == n1) | (j_idx == n2)

            # shift left by one lane: x[i+1]
            def shift1(x, fill):
                return jnp.where(
                    i_idx < L1p - 1,
                    jnp.roll(x, -1, axis=1),
                    jnp.full((1, L1p), fill, jnp.int32),
                )

            v1s = shift1(v1, _BIG)
            a1s = shift1(a1, _NOGAP)
            v2s = shift1(v2, _BIG)

            sub_row = subd_ref[0, jnp.maximum(d, 0), :][None, :]
            c0 = v1s + jnp.where(a1s == _GAPX, E, O)
            c1 = v1 + jnp.where(a1 == _GAPY, E, O)
            c2 = v2s + sub_row

            take_x = c0 < c1
            mv = jnp.where(take_x, c0, c1)
            gv = jnp.where(take_x, jnp.int32(_GAPX), jnp.int32(_GAPY))
            dwin = c2 < mv
            mv = jnp.where(dwin, c2, mv)
            gv = jnp.where(dwin, jnp.int32(_NOGAP), gv)

            # borders: bottom row (i == n1) is a GapY run, right col a GapX run
            bottom = O + (n2 - 1 - j_idx) * E
            right = O + (n1 - 1 - i_idx) * E
            bval = jnp.where(i_idx == n1,
                             jnp.where(j_idx == n2, jnp.int32(0), bottom), right)
            baff = jnp.where((i_idx == n1) & (j_idx == n2), jnp.int32(_NOGAP),
                             jnp.where(i_idx == n1, jnp.int32(_GAPY), jnp.int32(_GAPX)))
            mv = jnp.where(is_border, bval, mv)
            gv = jnp.where(is_border, baff, gv)
            mv = jnp.where(in_range, mv, _BIG)
            gv = jnp.where(in_range, gv, jnp.int32(_NOGAP))

            out_ref[0, jnp.maximum(d, 0), :] = mv[0]
            v2_ref[...] = v1
            v1_ref[...] = mv
            a1_ref[...] = gv

        return 0

    jax.lax.fori_loop(0, 2 * lmax, body, 0)


@partial(jax.jit, static_argnums=(3, 4))
def _pallas_tables(subd, nlims, dummy, lmax: int, interpret: bool = False):
    """subd: (P, D, L1p) int32; nlims: (P, 2) int32 -> (P, D+1, L1p) diag-major."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, D, L1p = subd.shape
    grid = (P,)
    kernel = partial(_kernel, lmax=lmax, L1p=L1p)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # whole (P, 2) scalar table in SMEM (Mosaic requires full-array
            # blocks unless tile-aligned); the kernel indexes by program_id
            pl.BlockSpec((P, 2), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, D, L1p), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D + 1, L1p), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, D + 1, L1p), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, L1p), jnp.int32),
            pltpu.VMEM((1, L1p), jnp.int32),
            pltpu.VMEM((1, L1p), jnp.int32),
        ],
        interpret=interpret,
    )(nlims, subd)
    return out


def pair_tables_pallas(problem: Problem, interpret: bool = False) -> np.ndarray:
    """All C(N,2) suffix tables via the Pallas wavefront kernel."""
    pairs = problem.pairs()
    lmax = problem.max_length
    L1 = lmax + 1
    L1p = _round_up(L1, 128)
    D = 2 * lmax + 1

    enc = problem.encoded(lmax).astype(np.int32)
    xs = [x for x, _ in pairs]
    ys = [y for _, y in pairs]
    n1s = np.array([len(problem.seqs[x]) for x in xs], dtype=np.int32)
    n2s = np.array([len(problem.seqs[y]) for y in ys], dtype=np.int32)

    # subd[p, d, i] = cost(a[i], b[d-i]) computed host-side (cheap, one-time)
    ii = np.arange(L1p)
    dd = np.arange(D)
    jj = dd[:, None] - ii[None, :]
    iv = np.clip(ii, 0, max(lmax - 1, 0))
    jv = np.clip(jj, 0, max(lmax - 1, 0))
    subd = np.zeros((len(pairs), D, L1p), dtype=np.int32)
    for p, (x, y) in enumerate(pairs):
        subd[p] = COST_TABLE[enc[x][iv][None, :], enc[y][jv]]

    nlims = np.stack([n1s, n2s], axis=1)
    diag = np.asarray(_pallas_tables(jnp.asarray(subd), jnp.asarray(nlims),
                                     None, lmax, interpret))

    # assemble (i, j)-major
    out = np.full((len(pairs), L1, L1), _BIG, dtype=np.int32)
    i = np.arange(L1)[:, None]
    j = np.arange(L1)[None, :]
    for p in range(len(pairs)):
        dmat = np.clip(i + j, 0, diag.shape[1] - 1)
        vals = diag[p][dmat, i]
        valid = (i <= n1s[p]) & (j <= n2s[p])
        out[p] = np.where(valid, vals, _BIG)
    return out

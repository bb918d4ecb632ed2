"""Upper-bound estimation for search pruning.

A greedy (beam-1..k) descent from the origin to the goal yields a valid
alignment whose cost upper-bounds the optimal.  With an admissible heuristic,
every node on an optimal path satisfies f <= optimal <= UB, so the frontier
engine can prune any candidate with f > UB without losing optimality — this
caps the batched engine's frontier flood (strict best-first, as the
reference's priority queue enforces, never visits f > optimal either).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..core.cost import COST_TABLE, GAP_EXTENSION, GAP_GAP, GAP_OPEN
from ..core.problem import Problem
from ..heuristic.hpair import HPairHeuristic


def greedy_upper_bound(problem: Problem, heuristic: HPairHeuristic,
                       beam: int = 8) -> int:
    """Beam-search descent to the goal; returns the best complete-path cost.

    Each step extends every beam state by all 2^N-1 move masks and keeps the
    `beam` lowest-f children.  Terminates in at most sum(lengths) steps.
    """
    n = problem.n_seq
    pairs = problem.pairs()
    pw = np.array([int(heuristic.weight_i[x, y]) for x, y in pairs], dtype=np.int64)
    xs = np.array([x for x, _ in pairs])
    ys = np.array([y for _, y in pairs])
    final = problem.final_coord.astype(np.int64)
    enc = problem.encoded(problem.max_length + 1).astype(np.int64)
    tables = heuristic.tables

    M = (1 << n) - 1
    bits = np.zeros((M, n), dtype=np.int64)
    for m in range(1, M + 1):
        bits[m - 1] = [(m >> i) & 1 for i in range(n)]
    bx = bits[:, xs]
    by = bits[:, ys]
    both = (bx & by).astype(bool)
    E, O, GG = GAP_EXTENSION, GAP_OPEN, GAP_GAP
    # constant part per mask assuming O == E (exact for reference defaults);
    # the parenti-dependent distinction vanishes when O == E
    const_part = np.where(both, 0, np.where(~bx & ~by, GG, E)) @ pw

    def h_of(coords: np.ndarray) -> np.ndarray:
        """(K, N) -> (K,) heuristic values."""
        out = np.zeros(len(coords), dtype=np.int64)
        for k, (x, y) in enumerate(pairs):
            out += pw[k] * np.array(
                [int(tables[k][c[x], c[y]]) for c in coords], dtype=np.int64
            )
        return out

    states: List[Tuple[np.ndarray, int]] = [(np.zeros(n, dtype=np.int64), 0)]
    best_complete = None
    max_steps = int(final.sum()) + 1
    for _ in range(max_steps):
        cand_coords = []
        cand_g = []
        for coord, g in states:
            mm = COST_TABLE[enc[np.arange(n), np.minimum(coord, problem.max_length)][xs],
                            enc[np.arange(n), np.minimum(coord, problem.max_length)][ys]]
            edge = const_part + (np.where(both, mm[None, :], 0) * pw).sum(axis=1)
            child = coord[None, :] + bits  # (M, N)
            ok = np.all(child <= final[None, :], axis=1)
            for m in np.nonzero(ok)[0]:
                cand_coords.append(child[m])
                cand_g.append(g + int(edge[m]))
        if not cand_coords:
            break
        cand_coords = np.array(cand_coords)
        cand_g = np.array(cand_g, dtype=np.int64)
        # dedup by coordinate, keep min g
        keys = [tuple(c) for c in cand_coords]
        best = {}
        for k_i, (kk, gg) in enumerate(zip(keys, cand_g)):
            if kk not in best or gg < cand_g[best[kk]]:
                best[kk] = k_i
        idx = np.array(sorted(best.values()))
        cand_coords = cand_coords[idx]
        cand_g = cand_g[idx]

        at_goal = np.all(cand_coords == final[None, :], axis=1)
        if at_goal.any():
            gmin = int(cand_g[at_goal].min())
            best_complete = gmin if best_complete is None else min(best_complete, gmin)
        keep = ~at_goal
        cand_coords = cand_coords[keep]
        cand_g = cand_g[keep]
        if len(cand_g) == 0:
            break
        f = cand_g + h_of(cand_coords)
        order = np.argsort(f, kind="stable")[:beam]
        states = [(cand_coords[i], int(cand_g[i])) for i in order]
        if best_complete is not None and all(
            cand_g[i] + 0 >= best_complete for i in order
        ):
            break

    if best_complete is None:
        raise RuntimeError("greedy descent failed to reach the goal")
    return best_complete

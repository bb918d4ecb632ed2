"""HPair heuristic: admissible lower bound from pairwise suffix tables.

h(c) = sum over pairs (x, y) of  suffix_table[x,y][c_x, c_y] * int(weight[x,y])
(ref: pastar/HeuristicHPair.cpp:73-86).  Admissible because each pairwise term
lower-bounds that pair's remaining cost, and the WSP objective is the weighted
sum of pair costs.

Host object carries NumPy tables for the serial oracle plus device-ready
stacked tensors for the TPU engine.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from ..core.problem import Problem
from .pairwise import all_pair_tables, stack_pair_tables
from .weights import altschul_rationale2


@dataclass(frozen=True)
class HPairHeuristic:
    problem: Problem
    tables: Tuple[np.ndarray, ...]      # per-pair suffix tables, (i<j) order
    weight_f: np.ndarray                # (N, N) float32 Altschul weights
    weight_i: np.ndarray                # (N, N) int32 truncated runtime weights

    @classmethod
    def build(cls, problem: Problem, backend: str = "host") -> "HPairHeuristic":
        """Build all pair tables + weights.

        backend="host":   NumPy anti-diagonal DP (reference-exact oracle).
        backend="device": batched JAX wavefront over all pairs at once
                          (TPU-native Phase 1; removes the reference's serial
                          per-pair loop and its MAX_SEQ_SIZE cap).
        backend="auto":   device for long sequences (host DP is O(P*L^2)
                          NumPy — fine to ~1000, the reference's own cap),
                          host otherwise.
        """
        if backend == "auto":
            backend = "device" if problem.max_length > 1000 else "host"
        if backend == "device":
            from .wavefront import pair_tables_device

            stacked = pair_tables_device(problem)
            tables = tuple(
                stacked[k, : len(problem.seqs[x]) + 1, : len(problem.seqs[y]) + 1]
                for k, (x, y) in enumerate(problem.pairs())
            )
        else:
            tables = tuple(all_pair_tables(problem.seqs))
        wf, wi = altschul_rationale2(problem.seqs)
        return cls(problem, tables, wf, wi)

    def pair_list(self) -> List[Tuple[int, int]]:
        return self.problem.pairs()

    def calculate_h(self, coord) -> int:
        """Scalar h for one coordinate (ref: pastar/HeuristicHPair.cpp:73-86)."""
        c = np.asarray(coord)
        h = 0
        for (x, y), t in zip(self.problem.pairs(), self.tables):
            h += int(t[c[x], c[y]]) * int(self.weight_i[x, y])
        return h

    def stacked_tables(self) -> np.ndarray:
        """(P, Lmax+1, Lmax+1) int32 stack for device-side gathers."""
        return stack_pair_tables(list(self.tables), self.problem.max_length)

    def pair_weights_i(self) -> np.ndarray:
        """(P,) int32 weights in pair order."""
        return np.array([self.weight_i[x, y] for x, y in self.problem.pairs()], dtype=np.int32)

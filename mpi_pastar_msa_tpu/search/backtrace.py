"""Solution recovery: walk the closed set goal -> origin and render the alignment.

Host-side equivalent of the reference's backtrace + printing layer
(ref: pastar/backtrace.cpp:46-206).  The parent of a closed node is recovered
from its move mask: parent[i] = pos[i] - bit_i(mask) (ref: pastar/include/
Node.h:45, pastar/Coord.cpp:112-126).
"""
from __future__ import annotations

import shutil
import sys
from typing import Dict, List, Tuple

from ..core.problem import Problem


def build_alignment(problem: Problem,
                    closed: Dict[Tuple[int, ...], Tuple[int, int]]) -> List[str]:
    """Reconstruct the N aligned strings from the closed dict
    (coord -> (g, parent_move_mask)); ref: pastar/backtrace.cpp:46-69."""
    n = problem.n_seq
    cols: List[List[str]] = [[] for _ in range(n)]
    coord = tuple(int(v) for v in problem.final_coord)
    origin = tuple(0 for _ in range(n))
    while coord != origin:
        g, mask = closed[coord]
        parent = tuple(coord[i] - ((mask >> i) & 1) for i in range(n))
        for i in range(n):
            if coord[i] != parent[i]:
                cols[i].append(problem.seqs[i][coord[i] - 1])
            else:
                cols[i].append("-")
        coord = parent
    return ["".join(reversed(c)) for c in cols]


def similarity(alignment: List[str]) -> float:
    """Pairwise char-equality percentage (ref: pastar/backtrace.cpp:135-165)."""
    n = len(alignment)
    total = equal = 0
    for col in zip(*alignment):
        for i in range(n):
            for j in range(i + 1, n):
                total += 1
                if col[i] == col[j]:
                    equal += 1
    return (equal * 100) / float(total)


def format_alignment(alignment: List[str], width: int | None = None) -> str:
    """Wrapped alignment text (ref: pastar/backtrace.cpp:171-191)."""
    if width is None:
        width = shutil.get_terminal_size((80, 24)).columns - 1 if sys.stdout.isatty() else 1 << 30
    out: List[str] = []
    L = len(alignment[0])
    for start in range(0, L, width):
        out.append("")
        for row in alignment:
            out.append(row[start:start + width])
    return "\n".join(out)

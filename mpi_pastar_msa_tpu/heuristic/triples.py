"""Triple-wise heuristic: exact weighted 3-sequence suffix DP per triangle.

Strengthens the reference's pairwise HPair bound (ref:
pastar/HeuristicHPair.cpp:73-86) — a capability the reference does NOT have —
by replacing, for a set of edge-disjoint triangles (x, y, z), the three
independent pairwise terms

    w_xy*t_xy[cx,cy] + w_xz*t_xz[cx,cz] + w_yz*t_yz[cy,cz]

with the jointly-optimal value

    H3[cx,cy,cz] = min over 3-seq suffix alignments of the weighted sum of
                   the SAME per-column pair costs (ref: pastar/Node.cpp:129-152)

Validity (requires GapOpen == GapExtension, the reference default,
pastar/include/Cost.h:13, which makes every edge cost column-local):

- *Admissible*: project any N-path's remaining columns onto (x, y, z);
  columns advancing none of the three contribute ``(w_xy+w_xz+w_yz)*GapGap
  >= 0`` and are dropped by the projection, every other column maps to a
  3-seq alignment column with identical pair costs — so the projected cost is
  >= the 3-seq DP minimum.
- *Consistent*: for a move with a non-empty (x,y,z) sub-mask the N-edge's
  (x,y,z)-pair cost equals one DP transition, so H3(c) <= edge + H3(c');
  for an empty sub-mask H3 is unchanged and the edge cost is >= 0.
- *Dominating*: the joint minimum is >= the sum of the three independent
  pairwise minima, so h_triples >= h_pair pointwise (strictly better bound).

For N == 3 a single triangle makes the heuristic EXACT (h == remaining cost),
collapsing A* to the optimal-path corridor.

The table fill is an anti-diagonal wavefront over planes d = i+j+k (the 3-D
analogue of heuristic/wavefront.py): plane d depends only on planes d+1..d+3,
so one ``lax.scan`` of length Lx+Ly+Lz fills the cube with O(L^2) vector work
per step — TPU-friendly, no data-dependent control flow.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.cost import COST_TABLE, GAP_EXTENSION, GAP_GAP, GAP_OPEN
from ..core.problem import Problem
from .hpair import HPairHeuristic

INF3 = np.int32(2**30)


def pick_triangles(weight_i: np.ndarray, n: int,
                   max_triangles: Optional[int] = None) -> List[Tuple[int, int, int]]:
    """Greedy max-weight edge-disjoint triangle packing over K_n.

    Each triangle's score is the sum of its three Altschul pair weights —
    the heuristic mass it gets to couple jointly.  Edge-disjointness keeps
    the summed bound admissible (every pair counted once).
    """
    cands = []
    for x in range(n):
        for y in range(x + 1, n):
            for z in range(y + 1, n):
                w = int(weight_i[x, y]) + int(weight_i[x, z]) + int(weight_i[y, z])
                cands.append((w, (x, y, z)))
    cands.sort(key=lambda t: (-t[0], t[1]))
    used = set()
    out: List[Tuple[int, int, int]] = []
    for _, (x, y, z) in cands:
        edges = {(x, y), (x, z), (y, z)}
        if edges & used:
            continue
        used |= edges
        out.append((x, y, z))
        if max_triangles is not None and len(out) >= max_triangles:
            break
    return out


def triple_suffix_table_host(sx: str, sy: str, sz: str,
                             wxy: int, wxz: int, wyz: int) -> np.ndarray:
    """Reference-style host oracle: (Lx+1, Ly+1, Lz+1) int64 suffix DP.

    Plain loops — used only by tests (tiny L) to validate the device
    wavefront bit-for-bit.  Requires GapOpen == GapExtension.
    """
    if GAP_OPEN != GAP_EXTENSION:
        raise NotImplementedError("triple DP needs GapOpen == GapExtension")
    ex = np.frombuffer(sx.encode("latin-1"), dtype=np.uint8)
    ey = np.frombuffer(sy.encode("latin-1"), dtype=np.uint8)
    ez = np.frombuffer(sz.encode("latin-1"), dtype=np.uint8)
    Lx, Ly, Lz = len(ex), len(ey), len(ez)
    big = np.int64(INF3)
    H = np.full((Lx + 1, Ly + 1, Lz + 1), big, dtype=np.int64)
    H[Lx, Ly, Lz] = 0
    E, GG = GAP_EXTENSION, GAP_GAP
    for i in range(Lx, -1, -1):
        for j in range(Ly, -1, -1):
            for k in range(Lz, -1, -1):
                if (i, j, k) == (Lx, Ly, Lz):
                    continue
                best = big
                for m in range(1, 8):
                    bx, by, bz = m & 1, (m >> 1) & 1, (m >> 2) & 1
                    if i + bx > Lx or j + by > Ly or k + bz > Lz:
                        continue
                    cxy = int(COST_TABLE[ex[i], ey[j]]) if (bx and by) else (GG if not (bx or by) else E)
                    cxz = int(COST_TABLE[ex[i], ez[k]]) if (bx and bz) else (GG if not (bx or bz) else E)
                    cyz = int(COST_TABLE[ey[j], ez[k]]) if (by and bz) else (GG if not (by or bz) else E)
                    v = H[i + bx, j + by, k + bz] + wxy * cxy + wxz * cxz + wyz * cyz
                    if v < best:
                        best = v
                H[i, j, k] = best
    return H


def _fill_one_device(ex: np.ndarray, ey: np.ndarray, ez: np.ndarray,
                     lens: Tuple[int, int, int], ws: Tuple[int, int, int],
                     S: int):
    """Anti-diagonal wavefront fill of one triangle's suffix cube on device.

    Returns a (S, S, S) int32 jax array; cells outside the (Lx+1, Ly+1, Lz+1)
    box hold INF3.  Cost matrices are precomputed host-side (tiny) so each
    wavefront step is 3 plane-sized gathers + elementwise mins.
    """
    import jax
    import jax.numpy as jnp

    Lx, Ly, Lz = lens
    wxy, wxz, wyz = (int(w) for w in ws)
    E, GG = GAP_EXTENSION, GAP_GAP

    # per-pair (L+1, L+1) cost matrices at table stride S (padded rows cost 0;
    # they are only read through masked-out moves)
    def _cm(a, b):
        c = np.zeros((S, S), dtype=np.int32)
        c[: len(a), : len(b)] = COST_TABLE[np.ix_(a, b)]
        return jnp.asarray(c.reshape(-1))

    cxy_t, cxz_t, cyz_t = _cm(ex, ey), _cm(ex, ez), _cm(ey, ez)

    jj = jnp.arange(S, dtype=jnp.int32)[:, None]
    kk = jnp.arange(S, dtype=jnp.int32)[None, :]
    Dmax = Lx + Ly + Lz

    def step(carry, d):
        p1, p2, p3 = carry  # planes d+1, d+2, d+3
        ii = d - jj - kk  # (S, S)
        in_range = (ii >= 0) & (ii <= Lx) & (jj <= Ly) & (kk <= Lz)
        ic = jnp.clip(ii, 0, S - 1)
        cxy = jnp.take(cxy_t, ic * S + jj, axis=0)
        cxz = jnp.take(cxz_t, ic * S + kk, axis=0)
        cyz = jnp.take(cyz_t, jj * S + kk, axis=0)

        planes = (p1, p2, p3)
        padded = [jnp.pad(p, ((0, 1), (0, 1)), constant_values=INF3) for p in planes]
        best = jnp.full((S, S), INF3, dtype=jnp.int32)
        for m in range(1, 8):
            bx, by, bz = m & 1, (m >> 1) & 1, (m >> 2) & 1
            child = jax.lax.slice(padded[bx + by + bz - 1], (by, bz), (by + S, bz + S))
            ok = (ii + bx <= Lx) & (jj + by <= Ly) & (kk + bz <= Lz) & (child < INF3)
            mc = (wxy * (cxy if (bx and by) else (GG if not (bx or by) else E))
                  + wxz * (cxz if (bx and bz) else (GG if not (bx or bz) else E))
                  + wyz * (cyz if (by and bz) else (GG if not (by or bz) else E)))
            # mc is array-valued only when a match term is present
            mc = jnp.broadcast_to(jnp.asarray(mc, jnp.int32), (S, S))
            best = jnp.minimum(best, jnp.where(ok, child + mc, INF3))
        at_goal = (ii == Lx) & (jj == Ly) & (kk == Lz)
        newp = jnp.where(in_range, jnp.where(at_goal, 0, best), INF3)
        return (newp, p1, p2), newp

    inf_plane = jnp.full((S, S), INF3, dtype=jnp.int32)
    ds = jnp.arange(Dmax, -1, -1, dtype=jnp.int32)
    _, planes = jax.lax.scan(step, (inf_plane, inf_plane, inf_plane), ds)
    # planes[t] is anti-diagonal d = Dmax - t; H[i,j,k] = planes[Dmax-(i+j+k), j, k]
    ii3 = jnp.arange(S, dtype=jnp.int32)[:, None, None]
    jj3 = jnp.arange(S, dtype=jnp.int32)[None, :, None]
    kk3 = jnp.arange(S, dtype=jnp.int32)[None, None, :]
    t = jnp.clip(Dmax - (ii3 + jj3 + kk3), 0, Dmax)
    H = planes[t, jj3, kk3]
    return jnp.where(ii3 + jj3 + kk3 > Dmax, INF3, H)


def triple_tables_device(problem: Problem,
                         triangles: Sequence[Tuple[int, int, int]],
                         weight_i: np.ndarray, device=None):
    """(T, S, S, S) int32 device stack of triangle suffix cubes,
    S = max_length + 2 (matching the engine's pair-table stride).

    ``device`` pins the build (and the resulting arrays) to a specific
    device — the sharded engine passes its mesh's device so the cubes live
    on the mesh platform rather than whatever the default backend is.
    """
    import contextlib

    import jax
    import jax.numpy as jnp

    S = problem.max_length + 2
    enc = [np.frombuffer(s.encode("latin-1"), dtype=np.uint8) for s in problem.seqs]
    ctx = jax.default_device(device) if device is not None else contextlib.nullcontext()
    with ctx:
        tabs = []
        for (x, y, z) in triangles:
            tabs.append(_fill_one_device(
                enc[x], enc[y], enc[z],
                (len(enc[x]), len(enc[y]), len(enc[z])),
                (int(weight_i[x, y]), int(weight_i[x, z]), int(weight_i[y, z])),
                S,
            ))
        return jnp.stack(tabs)


@dataclass
class HTriples:
    """HPair heuristic augmented with triangle suffix cubes.

    Drop-in for HPairHeuristic everywhere (same duck-typed surface); the
    TPU engine detects ``triangles`` and couples the covered pairs jointly.
    """
    base: HPairHeuristic
    triangles: List[Tuple[int, int, int]]
    tri_tabs: object = field(repr=False)  # jax (T, S, S, S) int32
    device: object = None  # build device (None = default backend)
    h_origin: object = None  # (T,) np.int64 cube values at the origin
    _np_tabs: object = field(default=None, repr=False)  # lazy host copy

    # --- delegated surface -------------------------------------------------
    @property
    def problem(self) -> Problem:
        return self.base.problem

    @property
    def tables(self):
        return self.base.tables

    @property
    def weight_i(self) -> np.ndarray:
        return self.base.weight_i

    @property
    def weight_f(self) -> np.ndarray:
        return self.base.weight_f

    def pair_list(self):
        return self.base.pair_list()

    def stacked_tables(self) -> np.ndarray:
        return self.base.stacked_tables()

    def pair_weights_i(self) -> np.ndarray:
        return self.base.pair_weights_i()

    # --- triple-aware pieces ----------------------------------------------
    @property
    def covered_pairs(self) -> set:
        out = set()
        for (x, y, z) in self.triangles:
            out |= {(x, y), (x, z), (y, z)}
        return out

    def pair_weights_h_i(self) -> np.ndarray:
        """Pair weights with triangle-covered pairs zeroed — the pairwise
        part of the enhanced h (the engine's edge costs keep full weights)."""
        cov = self.covered_pairs
        return np.array(
            [0 if (x, y) in cov else int(self.weight_i[x, y])
             for x, y in self.problem.pairs()],
            dtype=np.int32,
        )

    def calculate_h(self, coord) -> int:
        c = np.asarray(coord)
        cov = self.covered_pairs
        h = 0
        for (x, y), t in zip(self.problem.pairs(), self.base.tables):
            if (x, y) not in cov:
                h += int(t[c[x], c[y]]) * int(self.weight_i[x, y])
        # cube terms: the engines only ever ask at the origin and the goal —
        # serve those from build-time host values (per-scalar device fetches
        # are pathologically slow under jax.distributed / remote tunnels);
        # arbitrary coords (tests) lazily pull ONE bulk host copy
        if not c.any():
            return h + int(np.sum(self.h_origin))
        if np.array_equal(c, self.problem.final_coord):
            return h  # every suffix cube is 0 at the goal by construction
        if self._np_tabs is None:
            self._np_tabs = np.asarray(self.tri_tabs)
        for ti, (x, y, z) in enumerate(self.triangles):
            h += int(self._np_tabs[ti, int(c[x]), int(c[y]), int(c[z])])
        return h

    def rebuild(self) -> None:
        """Recompute the device cubes (after a TPU worker restart)."""
        self.tri_tabs = triple_tables_device(
            self.problem, self.triangles, self.weight_i, device=self.device)
        self._np_tabs = None

    @classmethod
    def build(cls, base: HPairHeuristic,
              max_triangles: Optional[int] = None,
              budget_bytes: int = 2 << 30,
              device=None) -> Optional["HTriples"]:
        """Wrap ``base`` with as many greedy triangles as the budget allows.

        Returns None when triples are not applicable (N < 3, affine gap
        split, degenerate weights, or the cube would not fit the budget).
        """
        problem = base.problem
        n = problem.n_seq
        if n < 3 or GAP_OPEN != GAP_EXTENSION:
            return None
        wi = base.weight_i
        if bool((wi[~np.eye(n, dtype=bool)] <= 0).any()):
            return None  # negative edge costs: bound algebra undefined
        S = problem.max_length + 2
        per = S * S * S * 4
        cap = max(0, budget_bytes // max(per, 1))
        if max_triangles is not None:
            cap = min(cap, max_triangles)
        if cap <= 0:
            return None
        tris = pick_triangles(wi, n, max_triangles=cap)
        if not tris:
            return None
        tabs = triple_tables_device(problem, tris, wi, device=device)
        h_origin = np.asarray(tabs[:, 0, 0, 0]).astype(np.int64)
        return cls(base=base, triangles=tris, tri_tabs=tabs, device=device,
                   h_origin=h_origin)

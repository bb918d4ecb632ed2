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


def pick_cover(weight_i: np.ndarray, n: int,
               max_triangles: Optional[int] = None
               ) -> List[Tuple[Tuple[int, int, int], Tuple[int, int, int]]]:
    """Weighted triangle cover: every pair's FULL weight lives in exactly one
    cube (or stays pairwise), so the summed bound remains admissible.

    Phase 1: greedy max-weight edge-disjoint triangle packing (full weights).
    Phase 2: leftover pairs are coupled two-at-a-time by "cherry" triangles —
    two leftover edges sharing a vertex form triangle (a, b, c) whose third
    edge gets weight 0.  A zero-weight pair contributes nothing to the cube's
    objective but the cube still enforces joint sequence consistency on the
    two live pairs, so the cube value >= the two pairwise table values.

    Returns [(triangle, (w_xy, w_xz, w_yz)), ...] with x < y < z per triangle.
    """
    tris = pick_triangles(weight_i, n, max_triangles=max_triangles)
    out = []
    used = set()
    for (x, y, z) in tris:
        out.append(((x, y, z), (int(weight_i[x, y]), int(weight_i[x, z]),
                                int(weight_i[y, z]))))
        used |= {(x, y), (x, z), (y, z)}
    if max_triangles is not None and len(out) >= max_triangles:
        return out[:max_triangles]
    # leftover pairs, greedily matched into vertex-sharing cherries
    left = [(x, y) for x in range(n) for y in range(x + 1, n)
            if (x, y) not in used]
    cherries = []
    for i, e1 in enumerate(left):
        for j in range(i + 1, len(left)):
            e2 = left[j]
            shared = set(e1) & set(e2)
            if len(shared) == 1:
                w = (int(weight_i[e1[0], e1[1]]) + int(weight_i[e2[0], e2[1]]))
                cherries.append((w, e1, e2))
    cherries.sort(key=lambda t: (-t[0], t[1], t[2]))
    taken = set()
    for _, e1, e2 in cherries:
        if max_triangles is not None and len(out) >= max_triangles:
            break
        if e1 in taken or e2 in taken:
            continue
        taken |= {e1, e2}
        x, y, z = sorted(set(e1) | set(e2))
        live = {e1, e2}
        ws = tuple(int(weight_i[a, b]) if (a, b) in live else 0
                   for (a, b) in ((x, y), (x, z), (y, z)))
        out.append(((x, y, z), ws))
    return out


def pick_fractional_cover(weight_i: np.ndarray, n: int
                          ) -> List[Tuple[Tuple[int, int, int], Tuple[int, int, int]]]:
    """All-triples fractional cover: EVERY triangle of K_n gets each of its
    pairs at the pair's full weight, and all edge costs (and hence g) are
    scaled by ``n - 2``.

    Each pair (a, b) lies in exactly n-2 triangles, so the per-cube shares
    sum to (n-2)*w_ab — the classic "sum over all triples divided by (n-2)"
    MSA lower bound, realized with integer arithmetic by scaling the whole
    cost algebra instead of dividing the bound.  Admissible for the scaled
    search: projecting any remaining N-path onto each triangle costs at
    least that cube's DP minimum, and summing over all cubes counts every
    pair exactly n-2 times.  Consistent by the same per-move argument as the
    cherry cover (module docstring).  Dominates (n-2) x the pairwise bound
    cube-by-cube, and couples every pair with ALL of its third partners
    rather than the single partner the cherry cover picks.
    """
    out = []
    for x in range(n):
        for y in range(x + 1, n):
            for z in range(y + 1, n):
                out.append(((x, y, z),
                            (int(weight_i[x, y]), int(weight_i[x, z]),
                             int(weight_i[y, z]))))
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


def _fill_chunk_device(H, p1, p2, p3, d0, cxy, cxz, cyz, lens, ws,
                       S: int, CH: int):
    """One CHUNK (CH anti-diagonal planes, d = d0, d0-1, ...) of the
    wavefront fill of ALL T triangle suffix cubes at once.

    H: (T*S^3 + 128,) int32 flat cube stack (donated; planes scattered in as
    they are computed).  The 128-slot TAIL holds the T origin values
    H[t, 0, 0, 0], scattered there when the wavefront computes plane d == 0:
    post-hoc element extraction from the cube (strided slice, gather, or a
    small scan-carried output array) costs a 60-360 s layout/Mosaic
    pathology on the tunneled backend PER FETCH, while a contiguous slice of
    a big standard-layout array transfers instantly (measured).
    p1/p2/p3: (T, S, S) planes d0+1, d0+2, d0+3.
    cxy/cxz/cyz: (T, S*S) int32 per-pair residue-cost matrices;
    lens: (T, 3) int32 lengths; ws: (T, 3) int32 cube pair weights.

    Batching all T cubes into one scan gives a single compilation
    (persistently cached) regardless of T; chunking keeps each device
    dispatch well under remote-tunnel watchdogs for long sequences.  d0 is
    traced, so ONE executable serves every chunk.
    """
    import jax
    import jax.numpy as jnp

    E, GG = GAP_EXTENSION, GAP_GAP
    T = cxy.shape[0]
    jj = jnp.arange(S, dtype=jnp.int32)[None, :, None]  # (1, S, 1)
    kk = jnp.arange(S, dtype=jnp.int32)[None, None, :]  # (1, 1, S)
    Lx = lens[:, 0][:, None, None]
    Ly = lens[:, 1][:, None, None]
    Lz = lens[:, 2][:, None, None]
    wxy = ws[:, 0][:, None, None]
    wxz = ws[:, 1][:, None, None]
    wyz = ws[:, 2][:, None, None]

    tt = jnp.arange(T, dtype=jnp.int32)[:, None, None]

    def step(carry, d):
        H, p1, p2, p3 = carry  # (T, S, S) planes d+1, d+2, d+3
        ii = d - jj - kk  # (1, S, S)
        in_range = (ii >= 0) & (ii <= Lx) & (jj <= Ly) & (kk <= Lz)
        ic = jnp.clip(ii, 0, S - 1)
        idx_xy = jnp.broadcast_to((ic * S + jj).reshape(1, -1), (T, S * S))
        idx_xz = jnp.broadcast_to((ic * S + kk).reshape(1, -1), (T, S * S))
        idx_yz = jnp.broadcast_to(
            jnp.broadcast_to(jj * S + kk, (1, S, S)).reshape(1, -1), (T, S * S))
        gxy = jnp.take_along_axis(cxy, idx_xy, axis=1).reshape(T, S, S)
        gxz = jnp.take_along_axis(cxz, idx_xz, axis=1).reshape(T, S, S)
        gyz = jnp.take_along_axis(cyz, idx_yz, axis=1).reshape(T, S, S)

        planes = (p1, p2, p3)
        padded = [jnp.pad(p, ((0, 0), (0, 1), (0, 1)), constant_values=INF3)
                  for p in planes]
        best = jnp.full((T, S, S), INF3, dtype=jnp.int32)
        for m in range(1, 8):
            bx, by, bz = m & 1, (m >> 1) & 1, (m >> 2) & 1
            child = jax.lax.slice(padded[bx + by + bz - 1], (0, by, bz),
                                  (T, by + S, bz + S))
            ok = (ii + bx <= Lx) & (jj + by <= Ly) & (kk + bz <= Lz) & (child < INF3)
            mc = (wxy * (gxy if (bx and by) else (GG if not (bx or by) else E))
                  + wxz * (gxz if (bx and bz) else (GG if not (bx or bz) else E))
                  + wyz * (gyz if (by and bz) else (GG if not (by or bz) else E)))
            best = jnp.minimum(best, jnp.where(ok, child + mc, INF3))
        at_goal = (ii == Lx) & (jj == Ly) & (kk == Lz)
        newp = jnp.where(in_range, jnp.where(at_goal, 0, best), INF3)
        # scatter the finished plane into the cube stack (drop out-of-range)
        TS3 = T * S * S * S
        flat = tt * (S * S * S) + jnp.clip(ii, 0, S - 1) * (S * S) + jj * S + kk
        flat = jnp.where(in_range, flat, H.shape[0])
        H = H.at[flat.reshape(-1)].set(newp.reshape(-1), mode="drop")
        # plane d == 0 holds exactly the origin cells (0, 0, 0) at (j=0, k=0);
        # park them in the contiguous tail (out-of-range index drops)
        oidx = jnp.where(d == 0, TS3 + jnp.arange(T, dtype=jnp.int32),
                         H.shape[0])
        H = H.at[oidx].set(newp[:, 0, 0], mode="drop")
        return (H, newp, p1, p2), None

    ds = d0 - jnp.arange(CH, dtype=jnp.int32)
    (H, p1, p2, p3), _ = jax.lax.scan(step, (H, p1, p2, p3), ds)
    return H, p1, p2, p3


def triple_tables_device(problem: Problem,
                         triangles: Sequence[Tuple[int, int, int]],
                         weight_i: np.ndarray, device=None,
                         tri_weights: Optional[Sequence[Tuple[int, int, int]]] = None):
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
    if tri_weights is None:
        tri_weights = [(int(weight_i[x, y]), int(weight_i[x, z]),
                        int(weight_i[y, z])) for (x, y, z) in triangles]
    T = len(triangles)
    # per-pair residue-cost matrices at stride S (padded rows cost 0: only
    # read through masked-out moves)
    cm = np.zeros((3, T, S, S), dtype=np.int32)
    lens = np.zeros((T, 3), dtype=np.int32)
    for t, (x, y, z) in enumerate(triangles):
        ex, ey, ez = enc[x], enc[y], enc[z]
        lens[t] = (len(ex), len(ey), len(ez))
        cm[0, t, : len(ex), : len(ey)] = COST_TABLE[np.ix_(ex, ey)]
        cm[1, t, : len(ex), : len(ez)] = COST_TABLE[np.ix_(ex, ez)]
        cm[2, t, : len(ey), : len(ez)] = COST_TABLE[np.ix_(ey, ez)]
    ws = np.asarray(tri_weights, dtype=np.int32).reshape(T, 3)
    Dmax = int(lens.sum(axis=1).max())
    CH = 128  # planes per dispatch: keeps each well under tunnel watchdogs
    with ctx:
        import functools

        fill = jax.jit(functools.partial(_fill_chunk_device, S=S, CH=CH),
                       donate_argnums=(0, 1, 2, 3))
        TS3 = T * S * S * S
        # +128 tail: origin values parked there by the scan (see
        # _fill_chunk_device) so they come back via a cheap contiguous slice
        H = jnp.full((TS3 + 128,), INF3, dtype=jnp.int32)
        # distinct buffers: all four leading args are donated
        p1 = jnp.full((T, S, S), INF3, dtype=jnp.int32)
        p2 = jnp.full((T, S, S), INF3, dtype=jnp.int32)
        p3 = jnp.full((T, S, S), INF3, dtype=jnp.int32)
        a_cxy = jnp.asarray(cm[0].reshape(T, -1))
        a_cxz = jnp.asarray(cm[1].reshape(T, -1))
        a_cyz = jnp.asarray(cm[2].reshape(T, -1))
        a_lens = jnp.asarray(lens)
        a_ws = jnp.asarray(ws)
        d0 = Dmax
        while d0 >= 0:
            H, p1, p2, p3 = fill(H, p1, p2, p3,
                                 jnp.asarray(np.int32(d0)),
                                 a_cxy, a_cxz, a_cyz, a_lens, a_ws)
            d0 -= CH
        # both outputs stay DEVICE arrays: every dispatch above is async, so
        # the caller can overlap the (long) fill execution with host work —
        # e.g. the engine compiles its step kernels while the cubes fill;
        # the first consumer blocks naturally via device ordering
        return H[:TS3].reshape(T, S, S, S), H[TS3 : TS3 + T]


@dataclass
class HTriples:
    """HPair heuristic augmented with triangle suffix cubes.

    Drop-in for HPairHeuristic everywhere (same duck-typed surface); the
    TPU engine detects ``triangles`` and couples the covered pairs jointly.
    """
    base: HPairHeuristic
    triangles: List[Tuple[int, int, int]]
    tri_tabs: object = field(repr=False)  # jax (T, S, S, S) int32
    tri_weights: Optional[List[Tuple[int, int, int]]] = None  # per-cube pair weights
    device: object = None  # build device (None = default backend)
    h_origin: object = None  # (T,) device int32 cube values at the origin
    # fractional all-triples cover scales the whole cost algebra by n-2
    # (see pick_fractional_cover); engines divide reported g by this
    cost_scale: int = 1
    _np_tabs: object = field(default=None, repr=False)  # lazy host copy
    _h_org_cache: object = field(default=None, repr=False)  # lazy host copy

    # --- delegated surface -------------------------------------------------
    @property
    def problem(self) -> Problem:
        return self.base.problem

    @property
    def tables(self):
        return self.base.tables

    @property
    def weight_i(self) -> np.ndarray:
        # scaled surface: under the fractional cover every consumer of the
        # pair weights (edge costs, UB beam, path-g reconstruction) must
        # work in (n-2)-scaled units so g and h stay commensurate
        return self.base.weight_i * self.cost_scale

    @property
    def weight_f(self) -> np.ndarray:
        return self.base.weight_f

    def pair_list(self):
        return self.base.pair_list()

    def stacked_tables(self) -> np.ndarray:
        return self.base.stacked_tables()

    def pair_weights_i(self) -> np.ndarray:
        return (self.base.pair_weights_i() * self.cost_scale).astype(np.int32)

    # --- triple-aware pieces ----------------------------------------------
    def _weights(self) -> List[Tuple[int, int, int]]:
        if self.tri_weights is not None:
            return self.tri_weights
        return [(int(self.weight_i[x, y]), int(self.weight_i[x, z]),
                 int(self.weight_i[y, z])) for (x, y, z) in self.triangles]

    @property
    def covered_pairs(self) -> set:
        """Pairs whose weight lives in a cube (zero-weight cherry edges are
        NOT covered — their pairwise term must stay in the h sum)."""
        out = set()
        for (x, y, z), (wxy, wxz, wyz) in zip(self.triangles, self._weights()):
            if wxy:
                out.add((x, y))
            if wxz:
                out.add((x, z))
            if wyz:
                out.add((y, z))
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

    def _h_origin_np(self) -> np.ndarray:
        """Host copy of the cube origin values; first use blocks until the
        device fill has drained (build keeps it async so callers can overlap
        the fill with compiles)."""
        if getattr(self, "_h_org_cache", None) is None:
            self._h_org_cache = np.asarray(self.h_origin).astype(np.int64)
        return self._h_org_cache

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
            return h + int(np.sum(self._h_origin_np()))
        if np.array_equal(c, self.problem.final_coord):
            return h  # every suffix cube is 0 at the goal by construction
        if self._np_tabs is None:
            self._np_tabs = np.asarray(self.tri_tabs)
        for ti, (x, y, z) in enumerate(self.triangles):
            h += int(self._np_tabs[ti, int(c[x]), int(c[y]), int(c[z])])
        return h

    def rebuild(self) -> None:
        """Recompute the device cubes (after a TPU worker restart)."""
        self.tri_tabs, self.h_origin = triple_tables_device(
            self.problem, self.triangles, self.weight_i, device=self.device,
            tri_weights=self.tri_weights)
        self._np_tabs = None
        self._h_org_cache = None

    @classmethod
    def build(cls, base: HPairHeuristic,
              max_triangles: Optional[int] = None,
              budget_bytes: int = 6 << 30,
              device=None, fractional: bool = False) -> Optional["HTriples"]:
        """Wrap ``base`` with as many greedy triangles as the budget allows.

        ``fractional=True`` uses the all-triples cover with (n-2)-scaled
        costs (pick_fractional_cover) when all C(n,3) cubes fit the budget;
        otherwise it silently falls back to the cherry cover.

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
        # per-cube footprint: base (4 B/cell) + engine corner rows (32 B/cell)
        per = S * S * S * 36
        cap = max(0, budget_bytes // max(per, 1))
        if max_triangles is not None:
            cap = min(cap, max_triangles)
        if cap <= 0:
            return None
        scale = 1
        cover = None
        if fractional and n >= 4:
            frac = pick_fractional_cover(wi, n)
            if len(frac) <= cap:
                cover, scale = frac, n - 2
            else:
                # the caller explicitly asked for the fractional bound —
                # degrading to the weaker cherry cover must be audible
                import warnings

                warnings.warn(
                    f"fractional triple cover needs {len(frac)} cubes but "
                    f"the budget allows {cap}; falling back to the cherry "
                    f"cover (cost_scale stays 1)",
                    RuntimeWarning, stacklevel=2,
                )
        if cover is None:
            cover = pick_cover(wi, n, max_triangles=cap)
        if not cover:
            return None
        tris = [t for t, _ in cover]
        tws = [w for _, w in cover]
        tabs, h_origin = triple_tables_device(problem, tris, wi, device=device,
                                              tri_weights=tws)
        return cls(base=base, triangles=tris, tri_tabs=tabs, tri_weights=tws,
                   device=device, h_origin=h_origin, cost_scale=scale)

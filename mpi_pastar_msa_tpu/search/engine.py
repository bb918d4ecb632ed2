"""TPU batched-frontier A* engine — the flagship search core.

TPU-native re-design of the reference's parallel A* (ref: pastar/PAStar.cpp,
pastar/Node.cpp:206-248, pastar/include/PriorityList.h): instead of a
priority-queue loop over single nodes, every super-step

  1. selects a batch of lowest-f open states from a device-resident
     open/closed hash table (threshold selection via an f-histogram),
  2. expands all 2^N-1 successor move-masks of every selected state in one
     fused computation — edge costs and the HPair heuristic are evaluated as
     MXU matmuls against small constant mask-indicator matrices (see below),
  3. inserts all successors back into the hash table with decrease-key /
     reopen semantics (functional linear probing with batched claim
     resolution).

Optimality does not require strict best-first order: reopening (keep-min-g)
plus the termination bound ``min_f(open) >= g(goal)`` — the batched analogue
of the reference's two-phase consensus (ref: pastar/PAStar.cpp:494-519) —
guarantee the returned goal cost is optimal for an admissible heuristic.

Edge-cost algebra (ref: pastar/Node.cpp:129-152): for move mask m and pair
p=(x,y) with advance bits bx,by and parent-mask bit p_s,

  pairCost = GG + (E-GG)(bx+by) + (mm + GG - 2E)*bx*by
             + (O-E)*(bx(1-by)p_y + (1-bx)by p_x)

so the weighted sum over pairs becomes constant-matrix contractions:
``cost[b,m] = c0 + c1[m] + Both[m,:]@(w*(mm[b,:]+GG-2E)) + (O-E)*Cmat[m,:]@pbit[b,:]``
where Both/Cmat are precomputed {0,1}/weight matrices over (mask, pair) —
MXU-friendly f32 matmuls, exact because every product is < 2^24.

The heuristic gather uses the T4 trick: a successor's pair coordinate is
parent + {0,1}, so only 4 table cells per (node, pair) are ever needed; h for
ALL masks is then one matmul against a constant one-hot indicator, with the
int32 values split into hi/lo 12-bit halves so the f32 MXU accumulation stays
exact.
"""
from __future__ import annotations


import os
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cost import COST_TABLE, GAP_EXTENSION, GAP_GAP, GAP_OPEN
from ..core.problem import Problem
from ..heuristic.hpair import HPairHeuristic
from .backtrace import attach_path_g
from ..utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

INF = np.int32(2**30)
_EMPTY_WORD = np.uint32(0xFFFFFFFF)



# (r5 freeze note: this comment was added AFTER `make warmcache` as the
# live demonstration that cosmetic edits keep the export caches valid —
# `make warmcheck` passes with this line present; see utils/srckey.py.)
#: Counters vector layout carried through the chunked device drivers:
#: [0] goal_g  [1] fmin  [2] steps  [3] expanded  [4] reopened  [5] n_open
#: [6] overflow  [7] thr (selection threshold, carried across chunks)
#: [8] sel_proc  (sum of expand-pipeline widths Bw — processed SELECTED rows)
#: [9] lanes_true (sum of valid candidate lanes — the search's true work)
#: [10] lanes_r0  (sum of insert round-0 widths — processed candidate lanes)
#: [11] lanes_probe (sum of probe-loop lane-rounds after round 0)
#: [12] lanes_unmatched (candidates NOT settled by the round-0 row lookup —
#:      the probe loop's true workload: new keys + chain walkers)
#: [13] lanes_tail (still unsettled after the 2 bounded tier-A calls — the
#:      contention/chain tail the 1/8-width tail loop exists for)
#: 9-13 feed the throughput accounting in benchmarks/roofline_kinase.md:
#: padding = lanes_r0/lanes_true - 1, probe rounds/lane = lanes_probe/lanes_true.
#: Slots 8-13 are int32 TELEMETRY sums and can wrap past ~2^31 lane-rounds
#: on very long runs (>~100M expansions); control flow only reads 0-7, so a
#: wrap corrupts reporting, never results — consumers should treat negative
#: values as "overflowed, ignore".
N_COUNTERS = 14


def fresh_counters() -> np.ndarray:
    c = np.zeros(N_COUNTERS, dtype=np.int32)
    c[0] = INF
    return c


def _next_pow2(x: int) -> int:
    return 1 << max(1, (x - 1).bit_length())


@dataclass
class TpuSearchResult:
    g: int
    h: int
    f: int
    closed: Dict[Tuple[int, ...], Tuple[int, int]]  # path-only closed dict
    nodes_expanded: int
    nodes_reopened: int
    open_size: int
    steps: int
    shard_stats: List[Tuple[int, int, int, int]]


class _Static:
    """Per-problem static data shipped to the device once."""

    def __init__(self, problem: Problem, heuristic: HPairHeuristic,
                 batch: int, capacity: int, f0: Optional[int] = None,
                 skip_cubes: bool = False):
        # skip_cubes: leave d_tri8 as the dummy — for rebuilds where the
        # corner-row cube stack already lives elsewhere (the sharded
        # triangle store): re-materializing the full replica here while the
        # sharded copy is resident would double peak memory (kinase
        # fractional: +6.9 GB) for data that is immediately dropped
        n = problem.n_seq
        self.n = n
        self.M = (1 << n) - 1
        self.W = (n + 1) // 2
        self.pairs = problem.pairs()
        P = len(self.pairs)
        self.P = P
        self.B = batch
        self.C = capacity
        self.lmax = problem.max_length
        self.S = self.lmax + 2  # table stride with +1 margin for cx+1 gathers

        w_int = heuristic.pair_weights_i().astype(np.int64)  # (P,)

        # move-mask bit matrix (M, N); row m-1 = bits of mask m
        bits = np.zeros((self.M, n), dtype=np.int32)
        for m in range(1, self.M + 1):
            for i in range(n):
                bits[m - 1, i] = (m >> i) & 1
        self.bits = bits

        xs = np.array([x for x, _ in self.pairs])
        ys = np.array([y for _, y in self.pairs])
        bx = bits[:, xs]  # (M, P)
        by = bits[:, ys]
        both = (bx & by).astype(np.int64)
        E, O, GG = GAP_EXTENSION, GAP_OPEN, GAP_GAP

        self.c0 = int((GG * w_int).sum())
        self.c1 = ((E - GG) * (w_int[None, :] * (bx + by)).sum(axis=1)).astype(np.int32)  # (M,)
        self.both_f32 = both.astype(np.float32)  # (M, P)
        # parent-mask cross matrix: Cmat[m, s] = sum_p w_p (bx!by [y_p==s] + !bx by [x_p==s])
        cmat = np.zeros((self.M, n), dtype=np.int64)
        a_y = bx * (1 - by)
        a_x = (1 - bx) * by
        for p, (x, y) in enumerate(self.pairs):
            cmat[:, y] += w_int[p] * a_y[:, p]
            cmat[:, x] += w_int[p] * a_x[:, p]
        self.cmat_f32 = cmat.astype(np.float32)
        self.gap_oe = O - E  # 0 with reference defaults

        # T4 one-hot indicator: Ind[m, p, k] with k = 2*bx + by -> (4P, M)
        ind = np.zeros((self.M, P, 4), dtype=np.float32)
        for m in range(self.M):
            for p in range(P):
                ind[m, p, 2 * bx[m, p] + by[m, p]] = 1.0
        self.ind_f32 = ind.reshape(self.M, 4 * P).T.copy()  # (4P, M)

        # device constants
        self.d_bits = jnp.asarray(bits)
        self.d_both = jnp.asarray(self.both_f32)
        self.d_cmat = jnp.asarray(self.cmat_f32)
        self.d_c1 = jnp.asarray(self.c1)
        self.d_ind = jnp.asarray(self.ind_f32)
        self.d_w = jnp.asarray(w_int.astype(np.int32))
        self.d_xs = jnp.asarray(xs.astype(np.int32))
        self.d_ys = jnp.asarray(ys.astype(np.int32))
        self.d_cost_tab = jnp.asarray(COST_TABLE.reshape(-1))  # (128*128,)

        enc = problem.encoded(self.lmax + 1).astype(np.int32)  # (N, Lmax+1), 0-padded
        self.d_enc = jnp.asarray(enc.reshape(-1))
        self.enc_stride = self.lmax + 1

        tabs = heuristic.stacked_tables()  # (P, Lmax+1, Lmax+1) with pad
        stacked = np.zeros((P, self.S, self.S), dtype=np.int32)
        stacked[:, : tabs.shape[1], : tabs.shape[2]] = np.where(
            tabs >= 2**29, 0, tabs
        )  # zero padding: padded cells only reachable from masked-out successors
        self.d_tables = jnp.asarray(stacked.reshape(-1))
        # T8-contiguous layout: the 4 heuristic cells (i,j),(i,j+1),(i+1,j),
        # (i+1,j+1) PLUS the PAM match cost of the pair's residues at (i,j)
        # stored as one 8-word row, so the per-(node,pair) heuristic gather is
        # a contiguous row gather (~4x cheaper than 4 scattered elements) AND
        # the edge-cost table lookup (ref: pastar/Node.cpp:221-231) rides the
        # same row for free — no separate residue/cost gathers in _expand.
        if P * self.S * self.S * 32 <= (512 << 20):
            t8 = np.zeros((P, self.S, self.S, 8), dtype=np.int32)
            t8[:, :-1, :-1, 0] = stacked[:, :-1, :-1]
            t8[:, :-1, :-1, 1] = stacked[:, :-1, 1:]
            t8[:, :-1, :-1, 2] = stacked[:, 1:, :-1]
            t8[:, :-1, :-1, 3] = stacked[:, 1:, 1:]
            for p, (x, y) in enumerate(self.pairs):
                ex = enc[x]  # (lmax+1,) 0-padded encoding
                ey = enc[y]
                t8[p, : self.lmax + 1, : self.lmax + 1, 4] = COST_TABLE[
                    np.ix_(ex, ey)
                ]
            self.d_tables4 = jnp.asarray(t8.reshape(-1, 8))
        else:
            self.d_tables4 = self.d_tables

        # --- triple heuristic (heuristic/triples.py): pairs covered by a
        # triangle leave the pairwise indicator (d_w_h zeroes them) and are
        # served jointly by ONE corner-row gather per (node, triangle) from
        # the triangle's suffix cube, laid out like d_tables4: the 8 child
        # cells H[cx+bx, cy+by, cz+bz] of a node's cube as one contiguous row.
        tri = getattr(heuristic, "triangles", None)
        self.T3 = len(tri) if tri else 0
        if self.T3:
            S = self.S
            self.tri_x = [t[0] for t in tri]
            self.tri_y = [t[1] for t in tri]
            self.tri_z = [t[2] for t in tri]
            corner = np.zeros((self.T3, self.M), dtype=np.int32)
            for ti, (x, y, z) in enumerate(tri):
                corner[ti] = 4 * bits[:, x] + 2 * bits[:, y] + bits[:, z]
            self.tri_corner = corner
            base3 = heuristic.tri_tabs  # (T, S, S, S) int32, INF outside box
            if tuple(base3.shape) != (self.T3, S, S, S):
                raise ValueError("triangle cube stride mismatch with engine")
            # run the corner-row conversion on the cube's own device: on a
            # multi-process mesh the cubes are pinned to a LOCAL device while
            # the default backend may be a (remote) TPU — mixing wedges
            import contextlib

            _dev = getattr(heuristic, "device", None)
            _ctx = (jax.default_device(_dev) if _dev is not None
                    else contextlib.nullcontext())
            if skip_cubes:
                _ctx = contextlib.nullcontext()
                self.d_tri8 = jnp.zeros((1, 8), dtype=jnp.int32)
            with _ctx:
                if skip_cubes:
                    pass  # d_tri8 stays the dummy set above
                elif self.T3 * S * S * S * 8 <= (1 << 28):
                    t0 = jnp.where(base3 >= 2**29, 0, base3)
                    tp = jnp.pad(t0, ((0, 0), (0, 1), (0, 1), (0, 1)))
                    rows3 = jnp.stack(
                        [tp[:, bx : bx + S, by : by + S, bz : bz + S]
                         for bx in (0, 1) for by in (0, 1) for bz in (0, 1)],
                        axis=-1,
                    )  # corner index c = 4*bx + 2*by + bz matches tri_corner
                    self.d_tri8 = rows3.reshape(-1, 8)
                else:
                    # big cube stacks (fractional cover at kinase scale: 10
                    # cubes x 278^3 x 8 = 6.4 GB) OOM if built in one shot —
                    # the all-triangles stack plus its layout-retile copy
                    # peaks at ~24 GB on a 16 GB chip.  Build per triangle
                    # into a donated buffer: peak = buffer + one cube slice.
                    from functools import partial

                    @partial(jax.jit, donate_argnums=(0,))
                    def _write(buf, piece, off):
                        return jax.lax.dynamic_update_slice(
                            buf, piece, (off, 0))

                    buf = jnp.zeros((self.T3 * S * S * S, 8), dtype=jnp.int32)
                    for ti in range(self.T3):
                        c0 = jnp.where(base3[ti] >= 2**29, 0, base3[ti])
                        cp = jnp.pad(c0, ((0, 1), (0, 1), (0, 1)))
                        piece = jnp.stack(
                            [cp[bx : bx + S, by : by + S, bz : bz + S]
                             for bx in (0, 1) for by in (0, 1)
                             for bz in (0, 1)],
                            axis=-1,
                        ).reshape(-1, 8)
                        buf = _write(buf, piece, ti * S * S * S)
                    self.d_tri8 = buf
            self.d_tri_off = jnp.asarray(
                np.arange(self.T3, dtype=np.int32) * (S * S * S))
            self.d_w_h = jnp.asarray(heuristic.pair_weights_h_i())
            # matmul fallback for wide masks needs the 12-bit hi/lo split to
            # stay exact: table values must fit 24 bits
            if self.T3 * 8 * self.M > 4096:
                mx = int(jnp.max(jnp.where(base3 >= 2**29, 0, base3)))
                if mx >= (1 << 24):
                    raise ValueError("triangle cube values exceed 24 bits")
                ind3 = np.zeros((self.M, self.T3, 8), dtype=np.float32)
                for ti in range(self.T3):
                    ind3[np.arange(self.M), ti, corner[ti]] = 1.0
                self.d_tri_ind = jnp.asarray(
                    ind3.reshape(self.M, 8 * self.T3).T.copy())  # (8T, M)
        else:
            self.d_w_h = self.d_w
            # dummy keeps jit signatures uniform when triples are off
            self.d_tri8 = jnp.zeros((1, 8), dtype=jnp.int32)

        self.d_final = jnp.asarray(problem.final_coord.astype(np.int32))
        self.final_np = problem.final_coord.astype(np.int32)
        self.max_probes = 128
        # packed-mode layout: key row = [key words..., h]; best word =
        # (f << nb) | parent-mask (min-f == min-g per coord since h is fixed)
        self.nb = n
        self.KW = self.W + 1

        # sig-mode layout: when the whole lattice coordinate fits in
        # log2(C/ways) + 25 bits, the BUCKET index carries the low key bits
        # and ONE u32 word (khi << 6 | bucket_probe_round) identifies the key
        # EXACTLY.  The table is C/8 buckets x 8 ways: one contiguous row
        # gather reads all 8 candidate slots of a probe position (row gathers
        # cost ~the same as a single scattered element on this hardware), so
        # nearly every lookup and every claim settles in ONE random access
        # (see _sig_encode for the bijection proof).
        self.cbits = self.C.bit_length() - 1
        self.ways = 8
        self.nbuck = self.C // self.ways
        self.bbits = self.cbits - 3
        self.max_bprobes = 64  # 6-bit r field -> 64 bucket probes = 512 slots
        self.bitw = [max(1, int(v).bit_length()) for v in problem.final_coord]
        self.sig_bits = sum(self.bitw)
        # khi <= 25 bits keeps the stored word < 0xFFFFFFFF (the empty mark)
        self.sig_ok = (self.sig_bits <= self.bbits + 25
                       and self.bbits >= 1 and self.cbits <= 31)

        # f-rebase origin: packed/sig tables store f - f0 in the f field.
        # f0 is the PAIRWISE-ONLY h at the root — a lower bound on every
        # reachable node's f (h_pair(root) <= h(root) <= f along any path,
        # by consistency), so the stored field only needs bits for the f
        # SPREAD (ub - f0: the heuristic's total slack), not the absolute
        # f — this keeps the packed word's 31 - n f bits sufficient up to
        # N = 16 (the reference's largest instantiated N,
        # ref: pastar/include/max_seq_helper.h:9-20).  Defaults to the
        # pairwise value (host-computable instantly, so nothing here blocks
        # on the async triangle cube fill); the engines pass the tighter
        # triple h(root) when the pairwise spread would overflow (large N).
        self.f0 = int(f0) if f0 is not None else int(_rebase_origin(heuristic, n))


def _rebase_origin(heuristic, n: int) -> int:
    """f-rebase origin: pairwise-only h at the root coordinate (see
    _Static.f0).  Uses the base pair tables directly so it never blocks on
    an in-flight triangle cube fill; scaled by cost_scale so it stays a
    lower bound in the fractional cover's (n-2)-scaled cost units."""
    base = getattr(heuristic, "base", heuristic)
    scale = getattr(heuristic, "cost_scale", 1)
    return int(base.calculate_h(np.zeros(n, dtype=np.int32))) * scale


def _pack_keys(coords: jnp.ndarray, W: int) -> jnp.ndarray:
    """(..., N) int32 coords -> (..., W) uint32 packed keys (2 coords/word)."""
    n = coords.shape[-1]
    pad = 2 * W - n
    if pad:
        coords = jnp.concatenate(
            [coords, jnp.zeros(coords.shape[:-1] + (pad,), coords.dtype)], axis=-1
        )
    c = coords.astype(jnp.uint32)
    return c[..., 0::2] | (c[..., 1::2] << 16)


def _hash_keys(keys: jnp.ndarray) -> jnp.ndarray:
    """FNV-1a over the W words + murmur3 finalizer -> uint32 hash.

    The finalizer's avalanche keeps linear-probe clusters short even for the
    highly regular lattice coordinates this table stores.
    """
    h = jnp.full(keys.shape[:-1], np.uint32(2166136261), dtype=jnp.uint32)
    for w in range(keys.shape[-1]):
        h = (h ^ keys[..., w]) * np.uint32(16777619)
    h = h ^ (h >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _probe_slot(h0: jnp.ndarray, r, Cmask: np.uint32) -> jnp.ndarray:
    """Triangular probing: h0 + r(r+1)/2 visits every slot of a 2^k table."""
    ru = r.astype(jnp.uint32) if hasattr(r, "astype") else np.uint32(r)
    off = (ru * (ru + np.uint32(1))) >> np.uint32(1)
    return ((h0 + off) & Cmask).astype(jnp.int32)


# invertible odd multiplier (golden ratio) + its inverse mod 2^32; masking to
# cbits preserves the inverse property mod 2^cbits
_SIG_ODD = np.uint32(0x9E3779B1)
_SIG_ODD_INV = np.uint32(0x0E8B2F51)


def _mix32(x: jnp.ndarray) -> jnp.ndarray:
    """Murmur3 finalizer (bijective on u32): spreads khi groups over slots."""
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _sig_encode(st: _Static, coords: jnp.ndarray):
    """(X, N) coords -> (home BUCKET u32, sig base word u32). EXACT addressing.

    The coordinate packs into sig_bits <= bbits + 25 bits, split as
    klo (low bbits = log2(C/8)) | khi (the rest).  home = (klo * ODD) ^
    (mix32(khi) & Bmask) is a bucket index; probing is LINEAR over buckets
    (bucket_r = home + r) and the stored word is (khi << 6) | r.  Given
    (slot, word): bucket = slot >> 3, khi = word >> 6, r = word & 63,
    home = bucket - r, and klo = ((home ^ mix32(khi)) * ODD^-1) & Bmask — a
    bijection, so a single-word match at a probed slot identifies the full
    key exactly (no hash collisions, unlike a truncated-hash signature).
    Keys sharing khi can never collide with each other (odd multiply + XOR
    by the same constant is injective on klo).  The odd multiply matters:
    raw klo values are contiguous coordinate runs, which would pile the
    frontier into a few argmin groups (poor batch selection) and create
    locally dense probe regions; the multiply scatters them with zero
    information loss.  Linear bucket probing keeps r recoverable; with
    8-way buckets at <=25% load, full buckets (the only thing that extends
    a chain) are vanishingly rare, so clustering is a non-issue."""
    bbits = st.bbits
    Bmask = np.uint32(st.nbuck - 1)
    X = coords.shape[0]
    lo = jnp.zeros((X,), jnp.uint32)
    hi = jnp.zeros((X,), jnp.uint32)
    sh = 0
    for i in range(st.n):
        c = coords[:, i].astype(jnp.uint32)
        if sh < 32:
            lo = lo | (c << np.uint32(sh))
            if sh + st.bitw[i] > 32:
                hi = hi | (c >> np.uint32(32 - sh))
        else:
            hi = hi | (c << np.uint32(sh - 32))
        sh += st.bitw[i]
    klo = lo & Bmask
    khi = (lo >> np.uint32(bbits))
    if st.sig_bits > 32:
        khi = khi | (hi << np.uint32(32 - bbits))
    home = ((klo * _SIG_ODD) & Bmask) ^ (_mix32(khi) & Bmask)
    return home, khi << np.uint32(6)


def _sig_decode(st: _Static, slots: jnp.ndarray, sig: jnp.ndarray):
    """Invert _sig_encode: (slot i32, stored sig word u32) -> (X, N) coords."""
    bbits = st.bbits
    Bmask = np.uint32(st.nbuck - 1)
    r = sig & np.uint32(63)
    khi = sig >> np.uint32(6)
    bucket = slots.astype(jnp.uint32) >> np.uint32(3)
    home = (bucket - r) & Bmask
    klo = (((home ^ (_mix32(khi) & Bmask)) * _SIG_ODD_INV) & Bmask)
    lo = klo | (khi << np.uint32(bbits))
    hi = khi >> np.uint32(32 - bbits) if st.sig_bits > 32 else jnp.zeros_like(khi)
    out = []
    sh = 0
    for i in range(st.n):
        bw = st.bitw[i]
        m = np.uint32((1 << bw) - 1)
        if sh + bw <= 32:
            v = (lo >> np.uint32(sh)) & m
        elif sh >= 32:
            v = (hi >> np.uint32(sh - 32)) & m
        else:
            v = ((lo >> np.uint32(sh)) | (hi << np.uint32(32 - sh))) & m
        out.append(v.astype(jnp.int32))
        sh += bw
    return jnp.stack(out, axis=-1)


_PFX_BLOCK = 512


def _prefix_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of an int32 vector via MXU triangular matmul.

    XLA's 1-D cumsum on TPU runs as a sequential window scan (~10 ms at 250k
    elements — it dominated the insert phase); a (K, 512) @ (512, 512)
    upper-triangular ones-matmul computes all within-block prefixes on the
    MXU, with only the tiny K-length block-offset cumsum left sequential.
    Exact while totals stay below 2^24 (candidate counts always do).
    """
    L = x.shape[0]
    if L % _PFX_BLOCK != 0 or L <= _PFX_BLOCK:
        return jnp.cumsum(x)
    K = L // _PFX_BLOCK
    x2 = x.reshape(K, _PFX_BLOCK).astype(jnp.float32)
    tri = jnp.triu(jnp.ones((_PFX_BLOCK, _PFX_BLOCK), jnp.float32))
    within = jax.lax.dot_general(
        x2, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    block_tot = within[:, -1].astype(jnp.int32)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(block_tot)[:-1]])
    return (within.astype(jnp.int32) + offsets[:, None]).reshape(L)


def _expand(st: _Static, coords, g, parenti, active, f_parent=None,
            htab=None, henc=None, g_is_f=False, tri8=None, h3=None):
    """Expand a batch: (B, N) coords -> all-mask successor candidates.

    With ``g_is_f`` the g argument is the parent's f; the parent's h is
    recovered for free from the T4 heuristic gather (the k=0 cell is the
    table value at the parent's own pair coordinate) and g = f - h.

    ``h3``: optional externally-computed triangle contribution
    ``(h3_children (B, M), h3_parent (B,))`` — used by the sharded engine
    when the cube stack is SHARDED by triangle across the mesh (each shard
    computes partial sums for its local cubes and psums; see
    parallel/sharded._tri_partial).  When given, the internal tri8 gather
    path is skipped entirely.

    Returns flat (B*M,) candidate arrays: keys (B*M, W), g, f, move mask, valid.
    """
    B, n = coords.shape
    M, P, S = st.M, st.P, st.S

    if htab is None:
        htab = st.d_tables
    if henc is None:
        henc = st.d_enc

    # pair endpoint coordinates: STATIC column picks (a take_along_axis with
    # constant indices lowers to a general gather — ~2.5 ms/step at B=16k —
    # while a stack of slices fuses to a free shuffle)
    xs_l = [x for x, _ in st.pairs]
    ys_l = [y for _, y in st.pairs]
    cx = jnp.stack([coords[:, i] for i in xs_l], axis=1)  # (B, P)
    cy = jnp.stack([coords[:, i] for i in ys_l], axis=1)
    cx = jnp.clip(cx, 0, S - 2)
    cy = jnp.clip(cy, 0, S - 2)
    base = (jnp.arange(P, dtype=jnp.int32) * (S * S))[None, :]  # (1, P)
    idx00 = base + cx * S + cy

    if htab.ndim == 2:  # T8-contiguous (P*S*S, 8) layout: one row gather
        t8 = jnp.take(htab, idx00, axis=0)  # (B, P, 8)
        t4 = t8[:, :, :4]
        mm = t8[:, :, 4]  # PAM cost of the pair's residues at (cx, cy)
    else:
        # flat-table fallback: residues at current positions, then the
        # PAM table lookup (ref: pastar/Node.cpp:221-231)
        pos = jnp.clip(coords, 0, st.enc_stride - 1)
        ch = jnp.take(
            henc,
            (jnp.arange(n, dtype=jnp.int32) * st.enc_stride)[None, :] + pos,
            axis=0,
        )  # (B, N)
        chx = jnp.stack([ch[:, i] for i in xs_l], axis=1)  # (B, P)
        chy = jnp.stack([ch[:, i] for i in ys_l], axis=1)
        mm = jnp.take(st.d_cost_tab, chx * 128 + chy, axis=0)  # (B, P) int32
        off = jnp.asarray(np.array([0, 1, S, S + 1], dtype=np.int32))
        t4 = jnp.take(htab, idx00[:, :, None] + off[None, None, :], axis=0)

    E, GG = GAP_EXTENSION, GAP_GAP
    wmm = (st.d_w[None, :] * (mm + (GG - 2 * E))).astype(jnp.float32)  # (B, P)
    cost_mm = jax.lax.dot_general(
        wmm, st.d_both,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, M)
    cost = st.c0 + st.d_c1[None, :] + cost_mm.astype(jnp.int32)
    if st.gap_oe != 0:
        pbit = ((parenti[:, None] >> jnp.arange(n)[None, :]) & 1).astype(jnp.float32)
        cross = jax.lax.dot_general(
            pbit, st.d_cmat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        cost = cost + (st.gap_oe * cross).astype(jnp.int32)

    child = coords[:, None, :] + st.d_bits[None, :, :]  # (B, M, N)
    valid = jnp.all(child <= st.d_final[None, None, :], axis=-1)  # (B, M)
    valid = valid & active[:, None]

    # (B, P, 4) heuristic cells (from the T8 row gather above);
    # order k=2i+j matches Ind.  d_w_h zeroes triangle-covered pairs (their
    # h contribution comes from the joint cube rows below); edge costs above
    # keep full weights.
    t4w = t4 * st.d_w_h[None, :, None]  # (B, P, 4) int32, < 2^24-ish
    hi = (t4w >> 12).astype(jnp.float32).reshape(B, 4 * P)
    lo = (t4w & 0xFFF).astype(jnp.float32).reshape(B, 4 * P)
    h_hi = jax.lax.dot_general(hi, st.d_ind, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    h_lo = jax.lax.dot_general(lo, st.d_ind, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    h = (h_hi.astype(jnp.int32) << 12) + h_lo.astype(jnp.int32)  # (B, M)

    rows3 = None
    if h3 is not None:
        h = h + h3[0]
    elif st.T3:
        # joint triangle terms: one contiguous 8-word row gather per
        # (node, triangle) — the cube's corner-row layout mirrors d_tables4
        c3x = jnp.clip(jnp.stack([coords[:, i] for i in st.tri_x], axis=1), 0, S - 2)
        c3y = jnp.clip(jnp.stack([coords[:, i] for i in st.tri_y], axis=1), 0, S - 2)
        c3z = jnp.clip(jnp.stack([coords[:, i] for i in st.tri_z], axis=1), 0, S - 2)
        idx3 = st.d_tri_off[None, :] + (c3x * S + c3y) * S + c3z  # (B, T)
        # the cube is threaded as an explicit jit argument (like htab): a
        # closure constant this large wedges multi-process compiles
        t8src = tri8 if tri8 is not None else st.d_tri8
        rows3 = jnp.take(t8src, idx3, axis=0)  # (B, T, 8) int32
        if st.T3 * 8 * st.M <= 4096:
            # static-index corner picks fuse to free shuffles — exact int32
            for t in range(st.T3):
                r = rows3[:, t, :]
                h = h + jnp.stack(
                    [r[:, int(ci)] for ci in st.tri_corner[t]], axis=1)
        else:
            flat3 = rows3.reshape(B, 8 * st.T3)
            hi3 = (flat3 >> 12).astype(jnp.float32)
            lo3 = (flat3 & 0xFFF).astype(jnp.float32)
            th_hi = jax.lax.dot_general(
                hi3, st.d_tri_ind, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            th_lo = jax.lax.dot_general(
                lo3, st.d_tri_ind, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            h = h + (th_hi.astype(jnp.int32) << 12) + th_lo.astype(jnp.int32)

    if g_is_f:
        # h(parent) = sum_p w_p * table_p[cx, cy] — exactly t4w's k=0 cell —
        # plus each triangle cube's own-coordinate corner (c = 0)
        h_par = jnp.sum(t4w[:, :, 0], axis=1)  # (B,) int32, exact
        if h3 is not None:
            h_par = h_par + h3[1]
        elif rows3 is not None:
            h_par = h_par + jnp.sum(rows3[:, :, 0], axis=1)
        g = g - h_par

    g_child = g[:, None] + cost
    f_child = g_child + h
    if f_parent is not None:
        # pathmax: with an inconsistent heuristic, a child's f may dip below
        # its parent's; max-ing keeps f monotone along paths (still a valid
        # lower bound on any completion), which stabilises the selection
        # order and curbs slack-induced reopening
        f_child = jnp.maximum(f_child, f_parent[:, None])
    mask_id = jnp.arange(1, M + 1, dtype=jnp.int32)[None, :].repeat(B, 0)

    keys = _pack_keys(child, st.W).reshape(B * M, st.W)
    keys = jnp.where(valid.reshape(-1, 1), keys, _EMPTY_WORD)
    is_goal = jnp.all(child == st.d_final[None, None, :], axis=-1) & valid
    return (
        keys,
        g_child.reshape(-1),
        f_child.reshape(-1),
        mask_id.reshape(-1),
        valid.reshape(-1),
        is_goal.reshape(-1),
        child.reshape(B * M, n),
        h.reshape(-1),
    )


def _probe_body_factory(st: _Static, keys, h0, idx_orig, step_tag):
    """Build one probing round for a fixed candidate array set.

    Claim tags are (step_tag*R + r)*Lfull + idx_orig — unique per (step,
    round, original candidate) within a chunk's claim-array lifetime.
    """
    C = st.C
    Cmask = np.uint32(C - 1)
    Lfull = np.uint32(st.B * st.M)

    def body(carry):
        r, done, slot_out, claimed_out, t_key, claim = carry
        slot = _probe_slot(h0, r, Cmask)
        probe_slot = jnp.where(done, C, slot)  # OOB -> dropped in scatters
        k_at = t_key[jnp.clip(slot, 0, C - 1)]  # (X, W)
        st_occ = k_at[:, 0] != _EMPTY_WORD
        match = jnp.all(k_at == keys, axis=1) & st_occ & ~done
        empty = ~st_occ & ~done

        tag = (step_tag * np.uint32(st.max_probes) + r.astype(jnp.uint32)) * Lfull + idx_orig
        claim = claim.at[jnp.where(empty, probe_slot, C)].set(tag, mode="drop")
        won = empty & (claim[jnp.clip(slot, 0, C - 1)] == tag)
        # winners write their key (occupying the slot)
        t_key = t_key.at[jnp.where(won, probe_slot, C)].set(keys, mode="drop")
        # losers re-check: the slot may now hold an equal key written this round
        k_at2 = t_key[jnp.clip(slot, 0, C - 1)]
        match2 = jnp.all(k_at2 == keys, axis=1) & ~done & ~won & ~match

        settled = match | won | match2
        slot_out = jnp.where(settled, slot, slot_out)
        claimed_out = claimed_out | won
        done = done | settled
        return r + 1, done, slot_out, claimed_out, t_key, claim

    return body


def _insert_core(st: _Static, tab, claim, keys, g_new, f_new, parenti_new,
                 valid, h0, idx_orig, step_tag):
    """Probe + place + decrease-key at the given (static) candidate width.

    Probing narrows after two rounds: the few unsettled candidates (long
    probe chains / claim losers) are compacted into a buffer 1/8 the width so
    the tail rounds — whose count is the MAX chain length over the batch —
    run at a fraction of the memory traffic.
    """
    t_key, t_g, t_f, t_par, t_state = tab
    C = st.C
    X = keys.shape[0]
    R = st.max_probes

    body = _probe_body_factory(st, keys, h0, idx_orig, step_tag)

    def cond(carry):
        r, done, _, _, _, _ = carry
        return (r < R) & jnp.any(~done)

    # stage A: two unconditional rounds at full width (settles the vast
    # majority; a round where everyone is done is a masked no-op, and a
    # lax.cond wrapper would copy the carried table at the branch boundary)
    carry = (jnp.int32(0), ~valid,
             jnp.full((X,), C, dtype=jnp.int32),
             jnp.zeros((X,), dtype=bool), t_key, claim)
    carry = body(carry)
    carry = body(carry)
    r2, done, slot, claimed, t_key, claim = carry

    Xn = max(X // 8, 256)
    un = ~done
    nv = _prefix_sum(un.astype(jnp.int32))
    cnt = nv[-1]
    fits = (cnt <= Xn) if Xn < X else jnp.asarray(False)

    def narrow_path(op):
        t_key, claim, done, slot, claimed = op
        pos = jnp.where(un, nv - 1, Xn)
        # pack all per-candidate fields into one scatter
        packed = jnp.concatenate(
            [jax.lax.bitcast_convert_type(keys, jnp.int32).reshape(X, -1),
             jax.lax.bitcast_convert_type(h0, jnp.int32)[:, None],
             jax.lax.bitcast_convert_type(idx_orig, jnp.int32)[:, None]],
            axis=1,
        )
        buf = jnp.zeros((Xn, packed.shape[1]), jnp.int32).at[pos].set(
            packed, mode="drop"
        )
        nkeys = jax.lax.bitcast_convert_type(buf[:, : st.W], jnp.uint32)
        nh0 = jax.lax.bitcast_convert_type(buf[:, st.W], jnp.uint32)
        nidx = jax.lax.bitcast_convert_type(buf[:, st.W + 1], jnp.uint32)
        nvalid = jnp.arange(Xn) < cnt

        nbody = _probe_body_factory(st, nkeys, nh0, nidx, step_tag)

        def ncond(c):
            r, nd, _, _, _, _ = c
            return (r < R) & jnp.any(~nd)

        ncarry = (r2, ~nvalid,
                  jnp.full((Xn,), C, dtype=jnp.int32),
                  jnp.zeros((Xn,), dtype=bool), t_key, claim)
        _, ndone, nslot, nclaimed, t_key, claim = jax.lax.while_loop(
            ncond, nbody, ncarry
        )
        # map results back (gather at original width)
        posc = jnp.clip(pos, 0, Xn - 1)
        upd = un & fits
        slot = jnp.where(upd, nslot[posc], slot)
        claimed = jnp.where(upd, nclaimed[posc], claimed)
        done = jnp.where(upd, ndone[posc] & (posc < cnt), done)
        done = done | ~un  # previously settled stay settled
        return t_key, claim, done, slot, claimed

    def wide_path(op):
        t_key, claim, done, slot, claimed = op
        carry = (r2, done, slot, claimed, t_key, claim)
        _, done, slot, claimed, t_key, claim = jax.lax.while_loop(cond, body, carry)
        return t_key, claim, done, slot, claimed

    t_key, claim, done, slot, claimed = jax.lax.cond(
        fits, narrow_path, wide_path, (t_key, claim, done, slot, claimed)
    )

    overflow = jnp.sum(valid & ~done)
    placed = valid & done
    slot_c = jnp.clip(slot, 0, C - 1)
    g_before = jnp.where(claimed, INF, t_g[slot_c])
    state_before = jnp.where(claimed, 0, t_state[slot_c])
    improve = placed & (g_new < g_before)
    slot_i = jnp.where(improve, slot, C)
    t_g = t_g.at[slot_i].min(g_new, mode="drop")
    g_after = t_g[slot_c]
    win_write = improve & (g_new == g_after)
    slot_ww = jnp.where(win_write, slot, C)
    t_par = t_par.at[slot_ww].set(parenti_new, mode="drop")
    t_f = t_f.at[slot_ww].set(f_new, mode="drop")
    t_state = t_state.at[slot_i].set(jnp.int32(1), mode="drop")
    reopen_ct = jnp.sum(improve & (state_before == 2))
    return (t_key, t_g, t_f, t_par, t_state), reopen_ct, overflow, claim


def _insert(st: _Static, tab, keys, g_new, f_new, parenti_new, valid,
            claim=None, step_tag=None):
    """Batch insert with decrease-key/reopen. Returns (tab, reopen_ct,
    overflow, claim).

    Valid candidates are first compacted to half width (UB pruning and border
    checks typically invalidate well over half the batch), so every probing
    round and every placement scatter runs at the reduced width; if more than
    half the batch is valid, the original-width path runs instead.
    """
    L = keys.shape[0]
    h0 = _hash_keys(keys)
    if claim is None:
        claim = jnp.full((st.C,), _EMPTY_WORD, dtype=jnp.uint32)
    if step_tag is None:
        step_tag = jnp.uint32(0)
    idx_vec = jnp.arange(L, dtype=jnp.uint32)

    Lc = max(L // 2, 256)
    if Lc >= L:
        return _insert_core(st, tab, claim, keys, g_new, f_new, parenti_new,
                            valid, h0, idx_vec, step_tag)

    nv = _prefix_sum(valid.astype(jnp.int32))
    cnt = nv[-1]
    fits = cnt <= Lc

    def compact_path(op):
        tab, claim = op
        pos = jnp.where(valid, nv - 1, Lc)
        packed = jnp.concatenate(
            [jax.lax.bitcast_convert_type(keys, jnp.int32).reshape(L, -1),
             g_new[:, None], f_new[:, None], parenti_new[:, None],
             jax.lax.bitcast_convert_type(h0, jnp.int32)[:, None],
             jax.lax.bitcast_convert_type(idx_vec, jnp.int32)[:, None]],
            axis=1,
        )
        buf = jnp.zeros((Lc, packed.shape[1]), jnp.int32).at[pos].set(
            packed, mode="drop"
        )
        W = st.W
        ckeys = jax.lax.bitcast_convert_type(buf[:, :W], jnp.uint32)
        cg = buf[:, W]
        cf = buf[:, W + 1]
        cpar = buf[:, W + 2]
        ch0 = jax.lax.bitcast_convert_type(buf[:, W + 3], jnp.uint32)
        cidx = jax.lax.bitcast_convert_type(buf[:, W + 4], jnp.uint32)
        cvalid = jnp.arange(Lc) < cnt
        return _insert_core(st, tab, claim, ckeys, cg, cf, cpar, cvalid,
                            ch0, cidx, step_tag)

    def full_path(op):
        tab, claim = op
        return _insert_core(st, tab, claim, keys, g_new, f_new, parenti_new,
                            valid, h0, idx_vec, step_tag)

    return jax.lax.cond(fits, compact_path, full_path, (tab, claim))


def _select(st: _Static, tab, goal_g, thr):
    """Pick up to B low-f open slots, scatter-free.

    The table is viewed as B contiguous groups of C/B slots; each group
    contributes its argmin-f open entry within the adaptive threshold
    ``f <= fmin + thr`` — all reductions, no C-wide scatter (scatters are the
    dominant per-step cost on TPU).  The hash spreads open nodes uniformly
    over groups, so a wide frontier fills most of the batch; a narrow one
    leaves lanes inactive, and the threshold controller (in the chunk loop)
    widens ``thr`` when batches under-fill.

    Returns (tab', coords, g, parenti, active, fmin_open, n_open, n_selected).
    """
    t_key, t_g, t_f, t_par, t_state = tab
    C, B = st.C, st.B
    G = C // B  # group width
    is_open = (t_state == 1) & (t_f < goal_g)  # pruning: f >= goal_g can't improve
    f_open = jnp.where(is_open, t_f, INF)
    fmin = jnp.min(f_open)
    n_open = jnp.sum(is_open)

    thr_f = fmin + thr
    v = jnp.where(f_open <= thr_f, f_open, INF).reshape(B, G)
    j = jnp.argmin(v, axis=1)  # (B,)
    vmin = jnp.take_along_axis(v, j[:, None], axis=1)[:, 0]
    slots = jnp.arange(B, dtype=jnp.int32) * G + j.astype(jnp.int32)
    active = vmin < INF
    n_selected = jnp.sum(active)
    slot_c = jnp.clip(slots, 0, C - 1)

    keys = t_key[slot_c]  # (B, W)
    coords = jnp.stack(
        [
            ((keys[:, i // 2] >> (16 * (i % 2))) & 0xFFFF).astype(jnp.int32)
            for i in range(st.n)
        ],
        axis=-1,
    )
    g = t_g[slot_c]
    par = t_par[slot_c]
    f_par = t_f[slot_c]
    # close the selected entries (B-sized scatter only)
    t_state = t_state.at[jnp.where(active, slots, C)].set(jnp.int32(2), mode="drop")
    return ((t_key, t_g, t_f, t_par, t_state), coords, g, par, f_par, active,
            fmin, n_open, n_selected)


def _adapt_thr(thr, n_selected, B):
    """Feedback controller for the selection threshold: widen when batches
    under-fill (frontier spread over many f values), shrink when full
    (minimise slack-induced reopens).  Clamped so repeated widening on a
    stalled frontier can never overflow f + thr arithmetic."""
    widen = n_selected < (B // 2)
    shrink = n_selected >= (B - B // 8)
    return jnp.minimum(
        jnp.where(widen, thr * 2 + 32,
                  jnp.where(shrink, thr // 2, thr)),
        np.int32(1 << 20),
    ).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Packed-table fast path.
#
# When the admissible upper bound fits (2*UB << n < 2^31, true for every
# realistic input), the whole per-slot state collapses into:
#
#   t_key    (C, W+1) uint32  [key words..., h]   written once at claim time
#   t_best   (C,)     int32   (f << n) | parent-mask, min over all inserts
#   t_closed (C,)     int32   snapshot of t_best taken when the slot was
#                             selected (closed); "open" == best < closed
#
# Because h is a function of the coordinate alone, min-f == min-g per slot, so
# ONE scatter-min on t_best replaces the unpacked path's g-min + f/par/state
# writes — and f/par are updated atomically (they live in one word).  Reopen
# semantics are exact: a strictly better path makes best < closed (open
# again); an equal-g reinsert leaves best == closed (stays closed), matching
# the reference's `<` rule (ref: pastar/PAStar.cpp:226-231).  Selection closes
# a slot by copying best into closed (a B-sized scatter).
#
# Candidate compaction is done by scatter-ing only the source index and then
# row-GATHERING the packed fields: on TPU, scatters cost ~12 ns/element with
# no contiguity win, while row gathers amortise to ~2 ns/element, so
# gather-side compaction is ~4x cheaper than the scatter-side packing the
# unpacked path uses.
# ---------------------------------------------------------------------------

INFP = np.int32(0x7FFFFFFF)  # empty/infinite packed (f,par) word


def _compact_gather(valid, nv, Lc, cols):
    """Compact `cols` (L, K) rows where `valid` into (Lc, K).

    Scatter the source index (one word per row), then gather rows — the cheap
    direction on TPU.  Returns (rows, lane_valid, count)."""
    L = cols.shape[0]
    cnt = nv[-1]
    pos = jnp.where(valid, nv - 1, Lc)
    inv = jnp.zeros((Lc,), jnp.int32).at[pos].set(
        jnp.arange(L, dtype=jnp.int32), mode="drop"
    )
    crows = cols[inv]
    cvalid = jnp.arange(Lc) < cnt
    return crows, cvalid, cnt


def _probe_body_packed_factory(st: _Static, rows, idx_orig, step_tag):
    """One probing round over fixed candidate records (packed layout).

    Record columns: [h0, key words (W), h] as i32 bitcasts.  h rides along in
    the winner write so it is stored exactly once per slot.  `store` in the
    carry is the 1-tuple (t_key,)."""
    C = st.C
    Cmask = np.uint32(C - 1)
    Lfull = np.uint32(st.B * st.M)
    W = st.W
    h0 = jax.lax.bitcast_convert_type(rows[:, 0], jnp.uint32)
    keys = jax.lax.bitcast_convert_type(rows[:, 1:1 + W], jnp.uint32)
    krow_new = jnp.concatenate(
        [keys, jax.lax.bitcast_convert_type(rows[:, 1 + W], jnp.uint32)[:, None]],
        axis=1,
    )  # (X, KW)

    def body(carry):
        r, done, slot_out, store, claim = carry
        (t_key,) = store
        slot = _probe_slot(h0, r, Cmask)
        slot_c = jnp.clip(slot, 0, C - 1)
        k_at = t_key[slot_c]  # (X, KW)
        occ = k_at[:, 0] != _EMPTY_WORD
        match = jnp.all(k_at[:, :W] == keys, axis=1) & occ & ~done
        empty = ~occ & ~done

        tag = (step_tag * np.uint32(st.max_probes) + r.astype(jnp.uint32)) * Lfull + idx_orig
        claim = claim.at[jnp.where(empty, slot, C)].set(tag, mode="drop")
        won = empty & (claim[slot_c] == tag)
        t_key = t_key.at[jnp.where(won, slot, C)].set(krow_new, mode="drop")
        # losers re-check: the slot may now hold an equal key written this round
        k_at2 = t_key[slot_c]
        match2 = jnp.all(k_at2[:, :W] == keys, axis=1) & ~done & ~won & ~match

        settled = match | won | match2
        slot_out = jnp.where(settled, slot, slot_out)
        done = done | settled
        return r + 1, done, slot_out, (t_key,), claim

    return body


def _probe_body_sig_factory(st: _Static, rows, idx_orig, step_tag,
                            use_rec_row=False):
    """One probing CALL, bucketed sig layout (see _sig_encode) — CLAIMLESS.

    Record columns: [home bucket, sig base, packed (f,par) word, 8
    bucket-row words from the round-0 gather].  One call reads the 8-way
    bucket row (one contiguous row gather — all 8 probe positions at once;
    with ``use_rec_row`` the FIRST call reuses the round-0 row carried
    through compaction, saving the gather entirely — nothing is written to
    t_sig between round 0 and call 1), settles matches, and lets new keys
    WRITE their word straight into the first empty way (one scatter; among
    racing writers to the same way XLA keeps exactly one — any winner is
    correct).  A writer does NOT learn the race outcome this call: next
    call's row gather shows its word if it (or a duplicate) won — it settles
    as a plain match — or another key's word if it lost — it retries the
    next empty way, or advances when the bucket reads full.  That makes a
    probing call exactly TWO random-access ops (row gather + scatter),
    versus five for a claim-array protocol, at the price of one extra
    (cheap) iteration per contended bucket; stored entries are never
    overwritten (writes only target ways observed empty, and fills are
    permanent), so at most one way per bucket fills per call and the loop
    still terminates in <= chain-length + contention rounds.

    The per-candidate probe position lives in the carry's slot word: for an
    unsettled lane it holds the CURRENT BUCKET (sentinel C = fresh, start at
    home; bucket values < C/8 < C never collide with the sentinel); once
    settled it holds the final slot.  No-deletion fullness monotonicity
    makes the walk exact: a key stored at round r implies buckets
    home..home+r-1 were observed full before the write and stay full, so an
    insert of an existing key always matches before it can claim.

    `store` is (t_sig, t_best); carry position 0 is the call counter k
    (loop cap).  ``idx_orig``/``step_tag`` are unused (kept for signature
    parity with the claim-protocol packed layout)."""
    del idx_orig, step_tag
    C = st.C
    NB = st.nbuck
    ways = st.ways
    Bmask = np.uint32(NB - 1)
    home = jax.lax.bitcast_convert_type(rows[:, 0], jnp.uint32)
    sigb = jax.lax.bitcast_convert_type(rows[:, 1], jnp.uint32)
    rec_row = jax.lax.bitcast_convert_type(rows[:, 3:3 + ways], jnp.uint32)

    def body(carry):
        k, done, sval, store = carry
        t_sig, t_best = store
        cur = (jnp.where(sval == C, home.astype(jnp.int32), sval)
               .astype(jnp.uint32) & Bmask)
        r = (cur - home) & Bmask
        ok_r = r < np.uint32(st.max_bprobes)
        word = sigb | jnp.minimum(r, np.uint32(st.max_bprobes - 1))
        live = ~done & ok_r
        if use_rec_row:
            row = rec_row
        else:
            buck = jnp.where(live, cur.astype(jnp.int32), NB)
            row = t_sig[jnp.clip(buck, 0, NB - 1)]  # (X, 8)
        match_w = (row == word[:, None]) & live[:, None]
        is_match = jnp.any(match_w, axis=1)
        mway = jnp.argmax(match_w, axis=1).astype(jnp.int32)
        empty_w = row == _EMPTY_WORD
        has_empty = jnp.any(empty_w, axis=1)
        # WAY SPREADING: writers pick the (mix(word) mod n_empty)-th empty
        # way, not the first.  All-first-way racing fills at most ONE way
        # per bucket per call, so K distinct new keys colliding in a bucket
        # cost K calls — and the settle loop's cost is the MAX over lanes,
        # so one hot bucket drags the whole width (measured 2.9 probe
        # lane-rounds per true lane at C=2^23 before this).  Keying the
        # pick on the sig word keeps duplicates of the SAME key on the
        # same way (the race winner's entry is what the losers then match),
        # while distinct keys scatter across ways and fill in parallel.
        n_empty = jnp.sum(empty_w.astype(jnp.int32), axis=1)
        rank = (_mix32(word) % jnp.maximum(n_empty, 1).astype(jnp.uint32)
                ).astype(jnp.int32)
        csum = jnp.cumsum(empty_w.astype(jnp.int32), axis=1)
        fway = jnp.argmax((csum == (rank + 1)[:, None]) & empty_w,
                          axis=1).astype(jnp.int32)
        try_write = live & ~is_match & has_empty
        curb = cur.astype(jnp.int32)
        t_sig = t_sig.at[jnp.where(try_write, curb, NB), fway].set(
            word, mode="drop")

        settled = is_match
        slot_fin = curb * ways + mway
        # advance only on an observed-full bucket; writers re-check the same
        # bucket next call (their word may or may not have won the race)
        cur_next = jnp.where(live & ~has_empty, (cur + 1) & Bmask,
                             cur).astype(jnp.int32)
        sval = jnp.where(done, sval, jnp.where(settled, slot_fin, cur_next))
        done = done | settled
        return k + 1, done, sval, (t_sig, t_best)

    return body


def _insert_cascade(st: _Static, store, claim, rec, valid, step_tag,
                    lookup0, make_body):
    """Probe all candidates to a settled slot — generic width cascade.

    Structure is driven by measured TPU access costs (~12-14 ns per scattered
    element, row gathers ~4x cheaper than the equivalent scatter; every
    probing round costs proportional to its static width) and by the measured
    candidate mix: most candidates MATCH an existing key in their very first
    probe; the non-matching remainder (new keys + hash collisions, bounded by
    the new-key rate plus the table load factor) is a quarter of the batch or
    less; and after one claim round only a trickle is left.  So the probe is
    a width cascade:

      round 0 (full width): ONE pure lookup gather — no claims, no writes.
      tier A (1/4 width):   non-matching lanes compacted (scatter-index +
        row-gather, the cheap direction); ONE standard claim round — new
        keys claim empty slots and write their entries at tier width.
      tier B (1/16 width):  still-unsettled lanes compacted again; two
        explicit rounds settle nearly everyone.
      tier C (1/64 width):  the trickle loops to the MAX probe-chain length
        where each round is 16x cheaper than tier A.

    Every tier re-probes from r=0: a claim loser must re-check its slot,
    which now holds the winner's entry (same-key losers settle as matches;
    re-probing occupied slots makes stale claim tags unreachable, so
    cross-tier tag reuse is safe).  Any tier whose candidates overflow its
    buffer (early search: every candidate is a new key) falls back to a
    full-width loop at the parent tier.

    Layout-specific pieces come in as `lookup0(store, rec) -> (match, slot0)`
    (the round-0 pure lookup) and `make_body(rec_rows, idx, step_tag)` (a
    probing-round body over compacted record rows; carry =
    (r, done, slot, store, claim)).  Record column 0 must be the home slot /
    initial hash as an i32 bitcast so compaction carries it for free.
    """
    C = st.C
    L = rec.shape[0]
    R = st.max_probes

    match, slot0 = lookup0(store, rec)
    match = match & valid
    done = match
    slot = jnp.where(match, slot0, C)

    def run_loop(body, carry):
        def cond(c):
            r, dn, _, _, _ = c
            return (r < R) & jnp.any(~dn)
        return jax.lax.while_loop(cond, body, carry)

    un = valid & ~done
    Ma = max(L // 4, 1024)
    Mb = max(L // 16, 512)

    if Ma >= L:
        body = make_body(rec, jnp.arange(L, dtype=jnp.uint32), step_tag)
        carry = (jnp.int32(0), done | ~valid, slot, store, claim)
        _, dn, slot, store, claim = run_loop(body, carry)
        done = dn & valid
        return store, claim, done, slot

    nvA = _prefix_sum(un.astype(jnp.int32))
    fitsA = nvA[-1] <= Ma

    def tierA(op):
        store, claim, done, slot = op
        rowsA, okA, _ = _compact_gather(un, nvA, Ma, rec)
        abody = make_body(rowsA, jnp.arange(Ma, dtype=jnp.uint32), step_tag)
        # one claim round at tier-A width
        r1, adone, aslot, store, claim = abody(
            (jnp.int32(0), ~okA, jnp.full((Ma,), C, dtype=jnp.int32),
             store, claim))

        unB = ~adone
        nvB = _prefix_sum(unB.astype(jnp.int32))
        fitsB = nvB[-1] <= Mb

        def tierB(op2):
            store, claim, adone, aslot = op2
            rowsB, okB, _ = _compact_gather(unB, nvB, Mb, rowsA)
            bbody = make_body(rowsB, jnp.arange(Mb, dtype=jnp.uint32),
                              step_tag)
            bcarry = (jnp.int32(0), ~okB,
                      jnp.full((Mb,), C, dtype=jnp.int32), store, claim)
            bcarry = bbody(bcarry)
            bcarry = bbody(bcarry)
            _, bdone, bslot, store, claim = bcarry

            Mc = max(L // 64, 512)
            unC = ~bdone
            if Mc < Mb:
                nvC = _prefix_sum(unC.astype(jnp.int32))
                fitsC = nvC[-1] <= Mc

                def tierC(op3):
                    store, claim, bdone, bslot = op3
                    rowsC, okC, _ = _compact_gather(unC, nvC, Mc, rowsB)
                    cbody = make_body(
                        rowsC, jnp.arange(Mc, dtype=jnp.uint32), step_tag)
                    _, cdone, cslot, store, claim = run_loop(
                        cbody, (jnp.int32(0), ~okC,
                                jnp.full((Mc,), C, dtype=jnp.int32),
                                store, claim))
                    posC = jnp.clip(jnp.where(unC, nvC - 1, Mc), 0, Mc - 1)
                    # ONE back-map gather: (slot, done) packed in one word
                    # (every random-indexed op costs ~10 ns/row regardless of
                    # width, so halving the op count halves the cost)
                    csd = (cslot << 1) | cdone.astype(jnp.int32)
                    sdC = csd[posC]
                    bslot = jnp.where(unC, sdC >> 1, bslot)
                    bdone = jnp.where(unC, (sdC & 1) == 1, bdone)
                    return store, claim, bdone, bslot

                def wideC(op3):
                    store, claim, bdone, bslot = op3
                    _, bdone, bslot, store, claim = run_loop(
                        bbody, (jnp.int32(2), bdone, bslot, store, claim))
                    return store, claim, bdone, bslot

                store, claim, bdone, bslot = jax.lax.cond(
                    fitsC, tierC, wideC, (store, claim, bdone, bslot))
            else:
                _, bdone, bslot, store, claim = run_loop(
                    bbody, (jnp.int32(2), bdone, bslot, store, claim))

            posB = jnp.clip(jnp.where(unB, nvB - 1, Mb), 0, Mb - 1)
            bsd = (bslot << 1) | bdone.astype(jnp.int32)
            sdB = bsd[posB]
            aslot = jnp.where(unB, sdB >> 1, aslot)
            adone = jnp.where(unB, (sdB & 1) == 1, adone)
            return store, claim, adone, aslot

        def wideB(op2):
            store, claim, adone, aslot = op2
            _, adone, aslot, store, claim = run_loop(
                abody, (r1, adone, aslot, store, claim))
            return store, claim, adone, aslot

        store, claim, adone, aslot = jax.lax.cond(
            fitsB, tierB, wideB, (store, claim, adone, aslot))

        posA = jnp.clip(jnp.where(un, nvA - 1, Ma), 0, Ma - 1)
        asd = (aslot << 1) | adone.astype(jnp.int32)
        sdA = asd[posA]
        slot = jnp.where(un, sdA >> 1, slot)
        done = jnp.where(un, (sdA & 1) == 1, done)
        return store, claim, done, slot

    def wideA(op):
        store, claim, done, slot = op
        body = make_body(rec, jnp.arange(L, dtype=jnp.uint32), step_tag)
        carry = (jnp.int32(0), done | ~valid, slot, store, claim)
        _, dn, slot, store, claim = run_loop(body, carry)
        return store, claim, dn & valid, slot

    store, claim, done, slot = jax.lax.cond(
        fitsA, tierA, wideA, (store, claim, done, slot))
    return store, claim, done, slot


def _insert_core_packed(st: _Static, tab, claim, keys, h_arr, packed, valid,
                        step_tag):
    """Probe + place at the given (static) candidate width — packed layout.

    See _insert_cascade for the width-cascade structure.  Placement is ONE
    width-L scatter-min on the packed (f,par) word."""
    t_key, t_best, t_closed = tab
    C = st.C
    Cmask = np.uint32(C - 1)
    W = st.W
    h0 = _hash_keys(keys)
    rec = jnp.concatenate(
        [jax.lax.bitcast_convert_type(h0, jnp.int32)[:, None],
         jax.lax.bitcast_convert_type(keys, jnp.int32).reshape(keys.shape[0], -1),
         h_arr[:, None]], axis=1)

    def lookup0(store, rec):
        (t_key,) = store
        rh0 = jax.lax.bitcast_convert_type(rec[:, 0], jnp.uint32)
        rkeys = jax.lax.bitcast_convert_type(rec[:, 1:1 + W], jnp.uint32)
        slot0 = _probe_slot(rh0, jnp.int32(0), Cmask)
        k_at = t_key[jnp.clip(slot0, 0, C - 1)]  # (L, KW)
        occ = k_at[:, 0] != _EMPTY_WORD
        match = jnp.all(k_at[:, :W] == rkeys, axis=1) & occ
        return match, slot0

    make_body = partial(_probe_body_packed_factory, st)
    (t_key,), claim, done, slot = _insert_cascade(
        st, (t_key,), claim, rec, valid, step_tag, lookup0, make_body)

    # ---- placement: one scatter-min ----
    overflow = jnp.sum(valid & ~done)
    placed = valid & done
    t_best = t_best.at[jnp.where(placed, slot, C)].min(packed, mode="drop")
    # accounting row (probe lane-rounds not tracked through the deep packed
    # cascade; the sig layout — the production path — reports them exactly)
    acct = jnp.stack([jnp.sum(valid.astype(jnp.int32)),
                      jnp.int32(keys.shape[0]), jnp.int32(0), jnp.int32(0),
                      jnp.int32(0)])
    return (t_key, t_best, t_closed), overflow, claim, acct


def _insert_cascade_sig(st: _Static, store, rec, valid, step_tag,
                        lookup0, make_body):
    """Width cascade for the bucketed sig layout — ONE cond total.

    With 8-way buckets a candidate's whole fate usually resolves in the
    round-0 row gather (match) or the first write call, so there is no
    tier-B/C machinery: non-matching lanes are compacted to quarter width
    once, the first write call reuses the round-0 bucket rows carried
    through compaction (zero gathers), and a while_loop at the same width
    mops up write races and full-bucket chains — typically 1-2 iterations
    (each settling the previous call's successful writers as matches).

    PLACEMENT IS SPLIT BY WIDTH: round-0 matches scatter-min t_best at full
    width straight from slot0; tier lanes scatter-min at tier width from
    the loop's settled slots.  This removes the full-width back-map gather
    (tier slot/done -> candidate lanes, ~3.5 ms/step at kinase scale) the
    single full-width placement needed.  ``store`` is (t_sig, t_best); the
    packed (f,par) word rides rec column 2 through compaction.  Returns
    (store, overflow, probe_lanes) where probe_lanes counts the post-round-0
    probe-loop work in lane-rounds (calls x loop width) for the throughput
    accounting (benchmarks/roofline_kinase.md)."""
    C = st.C
    L = rec.shape[0]
    R = st.max_probes

    match, slot0, rec = lookup0(store, rec)  # augments rec with bucket rows
    match = match & valid
    t_sig, t_best = store
    packed = rec[:, 2]
    t_best = t_best.at[jnp.where(match, slot0, C)].min(packed, mode="drop")
    store = (t_sig, t_best)

    def run_loop(body, carry):
        def cond(c):
            k, dn, _, _ = c
            return (k < R) & jnp.any(~dn)
        return jax.lax.while_loop(cond, body, carry)

    def run_at(rows, carry):
        idx = jnp.arange(rows.shape[0], dtype=jnp.uint32)
        first = make_body(rows, idx, step_tag, use_rec_row=True)
        carry = first(carry)
        return run_loop(make_body(rows, idx, step_tag), carry)

    def place_at(store, live, dn, slot, pk, probe_lanes, un_ct, tail_ct):
        t_sig, t_best = store
        placed = live & dn
        t_best = t_best.at[jnp.where(placed, slot, C)].min(pk, mode="drop")
        overflow = jnp.sum(live & ~dn)
        return (t_sig, t_best), overflow, probe_lanes, un_ct, tail_ct

    un = valid & ~match
    un_ct = jnp.sum(un.astype(jnp.int32))
    # 3L/8, not L/4: the lane accounting measured round-0 unmatched at
    # ~42% of true lanes (~29% of the compacted width) — above a quarter
    # buffer, so tierA's fit test failed and the probe loop ran FULL width
    # on most mid-search steps (22.2M probe lane-rounds vs the ~11M this
    # width admits; see benchmarks/roofline_kinase.md r5 table)
    Ma = max((3 * L) // 8, 1024)
    if Ma >= L:
        k, dn, slot, store = run_at(
            rec, (jnp.int32(0), ~un, jnp.full((L,), C, dtype=jnp.int32),
                  store))
        return place_at(store, un, dn, slot, packed, k * jnp.int32(L),
                        un_ct, jnp.int32(0))

    # HISTORY: an r4 A/B measured a "2 bounded calls + 1/8-width tail"
    # variant 12-13% SLOWER and reverted it — but that was at C=2^24,
    # BEFORE way spreading, and before the r5 lane accounting showed the
    # "settles in ~2 iterations" belief was wrong (measured ~6 calls/step:
    # the loop cost is the MAX over lanes, and chain walkers drag it).
    # The r5 re-measurement WITH the accounting flipped the verdict, so
    # tierA below now IS that shape (2 calls at Ma, tail loop at Ma/8);
    # the lane counters (N_COUNTERS legend) are how to re-judge it if the
    # table geometry changes again.
    nvA = _prefix_sum(un.astype(jnp.int32))
    fitsA = nvA[-1] <= Ma

    def tierA(store):
        rowsA, okA, _ = _compact_gather(un, nvA, Ma, rec)
        idxA = jnp.arange(Ma, dtype=jnp.uint32)
        first = make_body(rowsA, idxA, step_tag, use_rec_row=True)
        abody = make_body(rowsA, idxA, step_tag)
        # two bounded calls at tier width: call 1 (row-0 reuse) writes new
        # keys, call 2 settles the write winners as matches.  What remains
        # is the contention/chain tail — and the settle loop's cost is the
        # MAX over lanes (the r5 lane accounting measured ~6 calls/step
        # with the loop at tier width), so the tail loops at 1/8 width.
        carry = first((jnp.int32(0), ~okA,
                       jnp.full((Ma,), C, dtype=jnp.int32), store))
        k2, adone, aslot, store = abody(carry)
        # place everyone settled by call 2 now (scatter-min is idempotent,
        # so a lane placed here is immune to double-placement downstream)
        store, _, _, _, _ = place_at(store, okA, adone, aslot, rowsA[:, 2],
                                     jnp.int32(0), jnp.int32(0),
                                     jnp.int32(0))

        unB = okA & ~adone
        Mb = max(Ma // 8, 512)
        nvB = _prefix_sum(unB.astype(jnp.int32))
        fitsB = nvB[-1] <= Mb

        def tailB(store):
            # carry each lane's CURRENT probe bucket (aslot) through the
            # compaction so chain-walking lanes resume where they were
            # instead of re-walking from home (a chain of depth d re-walked
            # at one bucket per call would re-add d calls)
            rowsB, okB, _ = _compact_gather(
                unB, nvB, Mb,
                jnp.concatenate([rowsA, aslot[:, None]], axis=1))
            bbody = make_body(rowsB, jnp.arange(Mb, dtype=jnp.uint32),
                              step_tag)
            sv0 = jnp.where(okB, rowsB[:, -1], C)
            kb, bdone, bslot, store = run_loop(
                bbody, (jnp.int32(0), ~okB, sv0, store))
            return place_at(store, okB, bdone, bslot, rowsB[:, 2],
                            jnp.int32(2) * jnp.int32(Ma)
                            + kb * jnp.int32(Mb), un_ct, nvB[-1])

        def wideB(store):
            kw, wdone, wslot, store = run_loop((abody), (k2, adone, aslot,
                                                         store))
            return place_at(store, unB, wdone, wslot, rowsA[:, 2],
                            kw * jnp.int32(Ma), un_ct, nvB[-1])

        return jax.lax.cond(fitsB, tailB, wideB, store)

    def wideA(store):
        k, dn, slot, store = run_at(
            rec, (jnp.int32(0), ~un, jnp.full((L,), C, dtype=jnp.int32),
                  store))
        return place_at(store, un, dn, slot, packed, k * jnp.int32(L),
                        un_ct, jnp.int32(0))

    return jax.lax.cond(fitsA, tierA, wideA, store)


def _insert_core_sig(st: _Static, tab, claim, home, sigb, packed,
                     valid, step_tag):
    """Probe + place, bucketed sig layout (single-word exact signatures,
    8-way bucket rows — see _sig_encode and _probe_body_sig_factory).

    No h column: the layout stores nothing but the sig word per slot —
    selection recovers g from f via the parent's h, which _expand computes
    for free from its T4 heuristic gather.

    ``claim``/``step_tag`` are accepted for signature parity with the packed
    layout but unused: the sig probe protocol is claimless (see
    _probe_body_sig_factory).

    See _insert_cascade_sig for the width-cascade structure."""
    del step_tag
    t_sig, t_best, t_closed = tab
    NB = st.nbuck
    ways = st.ways
    rec = jnp.stack(
        [jax.lax.bitcast_convert_type(home, jnp.int32),
         jax.lax.bitcast_convert_type(sigb, jnp.int32),
         packed], axis=1)

    def lookup0(store, rec):
        t_sig = store[0]
        rhome = jax.lax.bitcast_convert_type(rec[:, 0], jnp.uint32)
        rsigb = jax.lax.bitcast_convert_type(rec[:, 1], jnp.uint32)
        buck = (rhome & np.uint32(NB - 1)).astype(jnp.int32)
        row = t_sig[jnp.clip(buck, 0, NB - 1)]  # (L, 8)
        match_w = row == rsigb[:, None]  # r=0 word IS the sig base
        match = jnp.any(match_w, axis=1)
        slot0 = buck * ways + jnp.argmax(match_w, axis=1).astype(jnp.int32)
        rec = jnp.concatenate(
            [rec, jax.lax.bitcast_convert_type(row, jnp.int32)], axis=1)
        return match, slot0, rec

    make_body = partial(_probe_body_sig_factory, st)
    (t_sig, t_best), overflow, probe_lanes, un_ct, tail_ct = (
        _insert_cascade_sig(
            st, (t_sig, t_best), rec, valid, jnp.uint32(0), lookup0,
            make_body))
    # accounting row: [true lanes, round-0 width, probe lane-rounds,
    # round-0 unmatched, post-2-call tail] (see the N_COUNTERS legend)
    acct = jnp.stack([jnp.sum(valid.astype(jnp.int32)),
                      jnp.int32(home.shape[0]), probe_lanes, un_ct, tail_ct])
    return (t_sig, t_best, t_closed), overflow, claim, acct


def _insert_packed(st: _Static, tab, keys, h_arr, packed, valid,
                   claim=None, step_tag=None):
    """Batch insert, packed layout, with adaptive width compaction.

    Mid-search nearly every candidate is valid, but once the goal bound /
    UB pruning bites (the long tail of the search, where most wall-clock is
    spent), the valid fraction collapses — so when the valid count fits in a
    quarter- or half-width buffer, candidates are compacted (scatter-index +
    row-gather, the cheap direction) and the whole probe/write/place pipeline
    runs at the reduced width."""
    L = keys.shape[0]
    if claim is None:
        claim = jnp.full((st.C,), _EMPTY_WORD, dtype=jnp.uint32)
    if step_tag is None:
        step_tag = jnp.uint32(0)

    # tiering only pays on big searches (its win is the UB-pruned late phase);
    # for small tables the extra lax.cond branches just triple compile time
    if L <= 4096 or st.C <= (1 << 20):
        return _insert_core_packed(st, tab, claim, keys, h_arr, packed, valid,
                                   step_tag)

    nv = _prefix_sum(valid.astype(jnp.int32))
    cnt = nv[-1]

    def compact_to(Lc):
        def run(op):
            tab, claim = op
            cols = jnp.concatenate(
                [jax.lax.bitcast_convert_type(keys, jnp.int32).reshape(L, -1),
                 h_arr[:, None], packed[:, None]],
                axis=1,
            )
            crows, cvalid, _ = _compact_gather(valid, nv, Lc, cols)
            ckeys = jax.lax.bitcast_convert_type(crows[:, : st.W], jnp.uint32)
            return _insert_core_packed(st, tab, claim, ckeys, crows[:, st.W],
                                       crows[:, st.W + 1], cvalid, step_tag)
        return run

    def full_path(op):
        tab, claim = op
        return _insert_core_packed(st, tab, claim, keys, h_arr, packed, valid,
                                   step_tag)

    def half_or_full(op):
        return jax.lax.cond(cnt <= L // 2, compact_to(L // 2), full_path, op)

    def quarter_or_more(op):
        return jax.lax.cond(cnt <= L // 4, compact_to(L // 4), half_or_full,
                            op)

    def eighth_or_more(op):
        # L/16 and L/8 tiers (r5): same motivation as the sig ladder — the
        # UB-pruned tail runs valid counts far below L/4 (globin6 measured
        # 3.15x round-0 padding on this path before these tiers)
        return jax.lax.cond(cnt <= L // 8, compact_to(L // 8),
                            quarter_or_more, op)

    return jax.lax.cond(cnt <= L // 16, compact_to(max(L // 16, 1024)),
                        eighth_or_more, (tab, claim))


def _insert_sig(st: _Static, tab, home, sigb, h_arr, packed, valid,
                claim=None, step_tag=None):
    """Batch insert, sig layout, with adaptive width compaction (the sig
    twin of _insert_packed — see there for why compaction pays).

    ``h_arr`` is accepted for signature parity with _insert_packed but
    unused: the bucketed sig layout stores no h (see _insert_core_sig);
    ``claim`` likewise (the sig probe protocol is claimless) — it is passed
    through untouched so the shared drivers can carry a 1-element dummy."""
    del h_arr
    L = home.shape[0]
    if claim is None:
        claim = jnp.zeros((1,), dtype=jnp.uint32)
    if step_tag is None:
        step_tag = jnp.uint32(0)

    if L <= 4096 or st.C <= (1 << 20):
        return _insert_core_sig(st, tab, claim, home, sigb, packed,
                                valid, step_tag)

    nv = _prefix_sum(valid.astype(jnp.int32))
    cnt = nv[-1]
    cols = jnp.stack(
        [jax.lax.bitcast_convert_type(home, jnp.int32),
         jax.lax.bitcast_convert_type(sigb, jnp.int32),
         packed], axis=1)

    def compact_to(Lc):
        def run(op):
            tab, claim = op
            crows, cvalid, _ = _compact_gather(valid, nv, Lc, cols)
            return _insert_core_sig(
                st, tab, claim,
                jax.lax.bitcast_convert_type(crows[:, 0], jnp.uint32),
                jax.lax.bitcast_convert_type(crows[:, 1], jnp.uint32),
                crows[:, 2], cvalid, step_tag)
        return run

    def full_path(op):
        tab, claim = op
        return _insert_core_sig(st, tab, claim, home, sigb, packed,
                                valid, step_tag)

    def half_or_more(op):
        # 5L/8 tier: mid-search fat steps run ~50-60% valid (UB pruning kills
        # the rest), narrowly missing L/2 — without this tier they pay
        # full-width lookup/scatter (insert cost is near-linear in width)
        def five_eighths_or_full(op):
            return jax.lax.cond(cnt <= (5 * L) // 8, compact_to((5 * L) // 8),
                                full_path, op)
        return jax.lax.cond(cnt <= L // 2, compact_to(L // 2),
                            five_eighths_or_full, op)

    def quarter_or_more(op):
        return jax.lax.cond(cnt <= L // 4, compact_to(L // 4), half_or_more,
                            op)

    def eighth_or_more(op):
        # L/16 and L/8 tiers (r5): the lane accounting measured +82% round-0
        # padding with the ladder bottoming out at L/4 — the long UB-pruned
        # tail of the search runs thin batches whose valid count sits far
        # below a quarter width, yet paid quarter-width gather+scatter
        return jax.lax.cond(cnt <= L // 8, compact_to(L // 8),
                            quarter_or_more, op)

    return jax.lax.cond(cnt <= L // 16, compact_to(max(L // 16, 1024)),
                        eighth_or_more, (tab, claim))


def _select_sig(st: _Static, tab, goal_g, thr):
    """Grouped-argmin batch selection, sig layout: coords are reconstructed
    from (slot, sig word) by inverting the _sig_encode bijection.

    Returns f (not g) in the g position: the layout stores no h, so g is
    recovered downstream in _expand as f - h(parent), where h(parent) falls
    out of the T4 heuristic gather for free (the k=0 cell IS the parent's
    pair coordinate)."""
    t_sig, t_best, t_closed = tab
    C, B, nb = st.C, st.B, st.nb
    G = C // B

    is_open = t_best < t_closed
    f_val = t_best >> nb  # REBASED: stored f field is f - st.f0 (see _Static.f0)
    is_open = is_open & (f_val < goal_g - st.f0)
    v_open = jnp.where(is_open, t_best, INFP)
    n_open = jnp.sum(is_open)

    # ONE grouped pass serves both reductions: the global f-min is the min
    # of the per-group mins (a B-sized reduce, free), and the group's
    # under-cut pick IS its unfiltered argmin whenever that min clears the
    # cut — so no separate full-table min pass and no cut-masked rescan
    # (each saved pass reads the whole 2x64 MB table)
    v = v_open.reshape(B, G)
    j = jnp.argmin(v, axis=1)
    vmin = jnp.take_along_axis(v, j[:, None], axis=1)[:, 0]  # (B,)
    fmin_p = jnp.min(vmin)
    fmin_r = fmin_p >> nb

    cut = (jnp.minimum(fmin_r + thr + 1, INFP >> nb) << nb) - 1
    slots = jnp.arange(B, dtype=jnp.int32) * G + j.astype(jnp.int32)
    active = vmin <= cut  # empty groups hold INFP > cut
    vmin = jnp.where(active, vmin, INFP)
    n_selected = jnp.sum(active)
    slot_c = jnp.clip(slots, 0, C - 1)

    coords = _sig_decode(
        st, slot_c, t_sig[slot_c // st.ways, slot_c % st.ways]
    )  # (B, N)
    fmin = fmin_r + st.f0
    f_sel = (vmin >> nb) + st.f0
    par = vmin & ((1 << nb) - 1)
    reopen_ct = jnp.sum(active & (t_closed[slot_c] < INFP))
    t_closed = t_closed.at[jnp.where(active, slots, C)].set(vmin, mode="drop")
    return ((t_sig, t_best, t_closed), coords, f_sel, par, active,
            fmin, n_open, n_selected, reopen_ct)


def _select_packed(st: _Static, tab, goal_g, thr):
    """Grouped-argmin batch selection over the packed table.

    Ordering on the packed word IS f-ordering (par in the low bits only
    breaks ties, deterministically)."""
    t_key, t_best, t_closed = tab
    C, B, nb = st.C, st.B, st.nb
    G = C // B

    is_open = t_best < t_closed
    f_val = t_best >> nb  # REBASED: stored f field is f - st.f0 (see _Static.f0)
    is_open = is_open & (f_val < goal_g - st.f0)  # f >= g(goal) can't improve
    v_open = jnp.where(is_open, t_best, INFP)
    n_open = jnp.sum(is_open)

    # single grouped pass; global f-min derived from the per-group mins
    # (see _select_sig for the equivalence argument)
    v = v_open.reshape(B, G)
    j = jnp.argmin(v, axis=1)
    vmin = jnp.take_along_axis(v, j[:, None], axis=1)[:, 0]
    fmin_p = jnp.min(vmin)
    fmin_r = fmin_p >> nb

    cut = (jnp.minimum(fmin_r + thr + 1, INFP >> nb) << nb) - 1
    slots = jnp.arange(B, dtype=jnp.int32) * G + j.astype(jnp.int32)
    active = vmin <= cut  # empty groups hold INFP > cut
    vmin = jnp.where(active, vmin, INFP)
    n_selected = jnp.sum(active)
    slot_c = jnp.clip(slots, 0, C - 1)

    rows = t_key[slot_c]  # (B, KW)
    coords = jnp.stack(
        [
            ((rows[:, i // 2] >> (16 * (i % 2))) & 0xFFFF).astype(jnp.int32)
            for i in range(st.n)
        ],
        axis=-1,
    )
    h_sel = rows[:, st.W].astype(jnp.int32)
    fmin = fmin_r + st.f0
    g = (vmin >> nb) + st.f0 - h_sel
    par = vmin & ((1 << nb) - 1)
    # a previously-closed slot being re-selected is a reopen expansion
    # (ref counts reopens at enqueue, pastar/PAStar.cpp:231; counting the
    # resulting re-expansion here is equivalent for the stats table and
    # costs only a B-wide gather)
    reopen_ct = jnp.sum(active & (t_closed[slot_c] < INFP))
    t_closed = t_closed.at[jnp.where(active, slots, C)].set(vmin, mode="drop")
    return ((t_key, t_best, t_closed), coords, g, par, active,
            fmin, n_open, n_selected, reopen_ct)


def _candidates_packed(st: _Static, keys, child):
    return (keys,)


def _candidates_sig(st: _Static, keys, child):
    return _sig_encode(st, child)


def _expand_insert(st: _Static, tab, claim, coords, g, par, active, goal_g,
                   ub, htab, henc, step_tag, insert_fn, cand_fn, g_is_f,
                   tri8=None):
    """Expand a (possibly width-compacted) selected batch and insert all
    successors.  Returns (tab, claim, goal_g, overflow)."""
    keys, g_c, f_c, mask_c, valid, is_goal, child, h_c = _expand(
        st, coords, g, par, active, None, htab, henc, g_is_f=g_is_f,
        tri8=tri8)
    valid = valid & (f_c <= ub)
    packed = ((f_c - st.f0) << st.nb) | mask_c
    goal_g = jnp.minimum(goal_g, jnp.min(jnp.where(is_goal, g_c, INF)))
    tab, ovf, claim, iacct = insert_fn(st, tab, *cand_fn(st, keys, child),
                                       h_c, packed, valid,
                                       claim=claim, step_tag=step_tag)
    # acct: [expand width Bw, true lanes, insert round-0 width, probe rounds]
    acct = jnp.concatenate([jnp.int32(coords.shape[0])[None], iacct])
    return tab, claim, goal_g, ovf, acct


def _expand_insert_tiered(st: _Static, tab, claim, coords, g, par, active,
                          n_sel, goal_g, ub, htab, henc, step_tag,
                          insert_fn, cand_fn, g_is_f, tri8=None):
    """Width-adaptive expand+insert: the batch usually under-fills (the
    grouped-argmin selection yields one node per table group within the
    f-threshold; the controller targets B/2..B), so when the SELECTED count
    fits a quarter- or half-width buffer the selected lanes are compacted
    (scatter-index + row-gather) and the ENTIRE downstream pipeline —
    successor expansion, heuristic gathers, and every insert op — runs at
    the reduced width.  Candidate-level ops dominate the step
    (L = B x (2^N-1) lanes), so this is a near-proportional win on
    under-filled steps."""
    B = st.B
    if B < 4096:  # small problems: pipeline already cheap, skip the conds
        return _expand_insert(st, tab, claim, coords, g, par, active, goal_g,
                              ub, htab, henc, step_tag, insert_fn, cand_fn,
                              g_is_f, tri8)

    cols = jnp.concatenate([coords, g[:, None], par[:, None]], axis=1)
    nv = _prefix_sum(active.astype(jnp.int32))

    def at_width(Bw):
        def run(op):
            tab, claim, goal_g = op
            crows, cvalid, _ = _compact_gather(active, nv, Bw, cols)
            return _expand_insert(
                st, tab, claim, crows[:, : st.n], crows[:, st.n],
                crows[:, st.n + 1], cvalid, goal_g, ub, htab, henc,
                step_tag, insert_fn, cand_fn, g_is_f, tri8)
        return run

    def full(op):
        tab, claim, goal_g = op
        return _expand_insert(st, tab, claim, coords, g, par, active, goal_g,
                              ub, htab, henc, step_tag, insert_fn, cand_fn,
                              g_is_f, tri8)

    def half_or_full(op):
        return jax.lax.cond(n_sel <= B // 2, at_width(B // 2), full, op)

    return jax.lax.cond(n_sel <= B // 4, at_width(B // 4), half_or_full,
                        (tab, claim, goal_g))


def _make_step_packed(st: _Static, select_fn=None, insert_fn=None,
                      cand_fn=None, g_is_f=False):
    """Single super-step (select -> expand -> insert); shared by the packed
    and sig layouts — the layout plugs in via the three functions."""
    select_fn = select_fn or _select_packed
    insert_fn = insert_fn or _insert_packed
    cand_fn = cand_fn or _candidates_packed

    @partial(jax.jit, donate_argnums=(0,))
    def step(tab, goal_g, ub, thr, htab, henc, tri8, fill=None):
        tab, coords, g, par, active, fmin, n_open, n_sel, reopen_ct = select_fn(
            st, tab, goal_g, thr)
        tab, _, goal_g, overflow, _acct = _expand_insert_tiered(
            st, tab, None, coords, g, par, active, n_sel, goal_g, ub, htab,
            henc, None, insert_fn, cand_fn, g_is_f, tri8)
        expanded = jnp.sum(active)
        thr = _adapt_thr(thr, n_sel, st.B if fill is None else fill)
        stats = jnp.stack([goal_g, fmin, n_open, expanded, reopen_ct, overflow])
        return tab, goal_g, thr, stats

    return step


def _make_step_sig(st: _Static):
    return _make_step_packed(st, _select_sig, _insert_sig, _candidates_sig,
                             g_is_f=True)


def _make_run_loop_packed(st: _Static, select_fn=None, insert_fn=None,
                          cand_fn=None, g_is_f=False, needs_claim=True):
    """Chunked on-device driver, packed/sig layouts (see _make_run_loop)."""
    select_fn = select_fn or _select_packed
    insert_fn = insert_fn or _insert_packed
    cand_fn = cand_fn or _candidates_packed

    @partial(jax.jit, donate_argnums=(0,))
    def run_chunk(tab, counters, chunk_steps, ub, htab, henc, tri8, fill):
        goal_g0, steps0, expanded0, reopen0, n_open0, overflow0 = (
            counters[0], counters[2], counters[3],
            counters[4], counters[5], counters[6],
        )
        # thr is CARRIED across chunk boundaries (counters[7]) so the search
        # trajectory is independent of chunk size; resetting it to 0 per
        # chunk was measured to change the expansion count by double-digit
        # percents between chunk_steps settings
        thr0 = counters[7]
        acct0 = counters[8:14]

        # the sig layout's probe protocol is claimless: carry a 1-element
        # dummy so the loop structure stays uniform across layouts
        claim0 = (jnp.full((st.C,), _EMPTY_WORD, dtype=jnp.uint32)
                  if needs_claim else jnp.zeros((1,), dtype=jnp.uint32))

        def cond(carry):
            (tab, claim, goal_g, fmin, thr, steps, expanded, reopen, n_open,
             overflow, acct, local) = carry
            return (fmin < goal_g) & (local < chunk_steps) & (overflow == 0)

        def body(carry):
            (tab, claim, goal_g, fmin, thr, steps, expanded, reopen, n_open,
             overflow, acct, local) = carry
            tab, coords, g, par, active, fmin, n_open, n_sel, reopen_ct = select_fn(
                st, tab, goal_g, thr)
            tab, claim, goal_g, ovf, sacct = _expand_insert_tiered(
                st, tab, claim, coords, g, par, active, n_sel, goal_g, ub,
                htab, henc, local.astype(jnp.uint32), insert_fn, cand_fn,
                g_is_f, tri8)
            # `fill` is a RUNTIME selection-fill target (<= B): smaller
            # targets mean shallower f-windows per step — fewer premature
            # expansions (reopens) at the price of more steps.  Traced as
            # data so one compiled program serves every setting.
            thr = _adapt_thr(thr, n_sel, fill)
            return (tab, claim, goal_g, fmin, thr, steps + 1,
                    expanded + jnp.sum(active),
                    reopen + reopen_ct,
                    n_open, overflow + ovf, acct + sacct, local + 1)

        init = (tab, claim0, goal_g0, jnp.asarray(np.int32(0)),
                thr0, steps0,
                expanded0, reopen0, n_open0, overflow0, acct0,
                jnp.asarray(np.int32(0)))
        (tab, _, goal_g, fmin, thr, steps, expanded, reopen, n_open, overflow,
         acct, local) = jax.lax.while_loop(cond, body, init)
        counters = jnp.concatenate([
            jnp.stack([goal_g, fmin, steps, expanded, reopen, n_open,
                       overflow, thr]), acct])
        return tab, counters

    return run_chunk


def _make_run_loop_sig(st: _Static):
    return _make_run_loop_packed(st, _select_sig, _insert_sig,
                                 _candidates_sig, g_is_f=True,
                                 needs_claim=False)


def _make_backtrace_packed(st: _Static):
    """Device-side path walk over the packed table."""
    C = st.C
    Cmask = np.uint32(C - 1)
    parmask = np.int32((1 << st.nb) - 1)

    @jax.jit
    def walk(tab, start_coord):
        t_key, t_best, t_closed = tab
        tmax = int(st.final_np.sum())
        rs = jnp.arange(st.max_probes, dtype=jnp.uint32)
        offs = (rs * (rs + jnp.uint32(1))) >> 1

        def lookup(coord):
            # all probe positions checked as ONE vectorized row gather — the
            # same access pattern as the hot path (scalar row indexing inside
            # a while_loop makes XLA pick a 32x-padded tiled layout: OOM)
            key = _pack_keys(coord[None, :], st.W)[0]
            h0 = _hash_keys(key[None, :])[0]
            slots = ((h0 + offs) & Cmask).astype(jnp.int32)  # (R,)
            k_at = t_key[slots]  # (R, KW)
            hits = jnp.all(k_at[:, : st.W] == key[None, :], axis=1) & (
                k_at[:, 0] != _EMPTY_WORD
            )
            found = jnp.any(hits)
            slot = slots[jnp.argmax(hits)]
            val = t_best[slot] & parmask
            return jnp.where(found, val, 0), found

        def scan_body(carry, _):
            coord, done = carry
            par, found = lookup(coord)
            at_origin = jnp.all(coord == 0)
            emit = ~done & ~at_origin & found
            mask = jnp.where(emit, par, 0)
            bits = ((par >> jnp.arange(st.n)) & 1).astype(jnp.int32)
            coord = jnp.where(emit, coord - bits, coord)
            done = done | at_origin | ~found
            return (coord, done), mask

        (coord_fin, _), masks = jax.lax.scan(
            scan_body, (start_coord, False), None, length=tmax
        )
        return masks, coord_fin

    return walk


def _make_backtrace_sig(st: _Static):
    """Device-side path walk over the bucketed sig table (see
    _make_backtrace_packed: all probe positions checked as one vectorized
    gather — here a (max_bprobes, 8) block of bucket rows)."""
    NB = st.nbuck
    ways = st.ways
    Bmask = np.uint32(NB - 1)
    parmask = np.int32((1 << st.nb) - 1)

    @jax.jit
    def walk(tab, start_coord):
        t_sig, t_best, t_closed = tab
        tmax = int(st.final_np.sum())
        rs = jnp.arange(st.max_bprobes, dtype=jnp.uint32)

        def lookup(coord):
            home, sigb = _sig_encode(st, coord[None, :])
            bucks = ((home[0] + rs) & Bmask).astype(jnp.int32)  # (R,)
            rows = t_sig[bucks]  # (R, 8)
            hits = rows == (sigb[0] | rs)[:, None]
            found = jnp.any(hits)
            flat = jnp.argmax(hits.reshape(-1))
            slot = bucks[flat // ways] * ways + (flat % ways).astype(jnp.int32)
            val = t_best[slot] & parmask
            return jnp.where(found, val, 0), found

        def scan_body(carry, _):
            coord, done = carry
            par, found = lookup(coord)
            at_origin = jnp.all(coord == 0)
            emit = ~done & ~at_origin & found
            mask = jnp.where(emit, par, 0)
            bits = ((par >> jnp.arange(st.n)) & 1).astype(jnp.int32)
            coord = jnp.where(emit, coord - bits, coord)
            done = done | at_origin | ~found
            return (coord, done), mask

        (coord_fin, _), masks = jax.lax.scan(
            scan_body, (start_coord, False), None, length=tmax
        )
        return masks, coord_fin

    return walk


def _make_step(st: _Static):
    @partial(jax.jit, donate_argnums=(0,))
    def step(tab, goal_g, ub, thr, htab, henc, tri8):
        tab, coords, g, par, f_par, active, fmin, n_open, n_sel = _select(st, tab, goal_g, thr)
        keys, g_c, f_c, mask_c, valid, is_goal, _, _ = _expand(st, coords, g, par, active, f_par,
                                                               htab, henc, tri8=tri8)
        valid = valid & (f_c <= ub)  # admissible UB pruning (see run_chunk)
        goal_g = jnp.minimum(goal_g, jnp.min(jnp.where(is_goal, g_c, INF)))
        tab, reopen_ct, overflow, _ = _insert(st, tab, keys, g_c, f_c, mask_c, valid)
        expanded = jnp.sum(active)
        thr = _adapt_thr(thr, n_sel, st.B)
        # single packed scalar vector -> one host transfer per step
        stats = jnp.stack([goal_g, fmin, n_open, expanded, reopen_ct, overflow])
        return tab, goal_g, thr, stats

    return step


def _make_run_loop(st: _Static):
    """Chunked on-device search driver.

    A host round trip per super-step is ruinous over a remote-TPU tunnel, but
    one unbounded on-device loop trips multi-minute kernel watchdogs (observed
    as "TPU worker crashed" on kinase-scale searches).  Middle ground: the
    reference's worker/check_stop loop (ref: pastar/PAStar.cpp:551-567) runs
    as an on-device ``lax.while_loop`` bounded to a CHUNK of super-steps per
    dispatch; the host re-dispatches until the termination consensus
    (min_f(open) >= g(goal), open exhaustion, overflow) fires.  Host syncs are
    amortised over the chunk (1 small transfer / chunk).
    """

    @partial(jax.jit, donate_argnums=(0,))
    def run_chunk(tab, counters, chunk_steps, ub, htab, henc, tri8, fill):
        goal_g0, _, steps0, expanded0, reopen0, n_open0, overflow0 = (
            counters[0], counters[1], counters[2], counters[3],
            counters[4], counters[5], counters[6],
        )
        thr0 = counters[7]  # carried across chunks (see the packed driver)

        claim0 = jnp.full((st.C,), _EMPTY_WORD, dtype=jnp.uint32)

        def cond(carry):
            tab, claim, goal_g, fmin, thr, steps, expanded, reopen, n_open, overflow, local = carry
            return (fmin < goal_g) & (local < chunk_steps) & (overflow == 0)

        def body(carry):
            tab, claim, goal_g, fmin, thr, steps, expanded, reopen, n_open, overflow, local = carry
            tab, coords, g, par, f_par, active, fmin, n_open, n_sel = _select(st, tab, goal_g, thr)
            keys, g_c, f_c, mask_c, valid, is_goal, _, _ = _expand(st, coords, g, par, active, f_par,
                                                                   htab, henc, tri8=tri8)
            # upper-bound pruning: with admissible h, no optimal-path node has
            # f > UB (a complete-path cost), so dropping them keeps optimality
            # while capping the frontier flood at best-first levels
            valid = valid & (f_c <= ub)
            goal_g = jnp.minimum(goal_g, jnp.min(jnp.where(is_goal, g_c, INF)))
            tab, reopen_ct, ovf, claim = _insert(
                st, tab, keys, g_c, f_c, mask_c, valid,
                claim=claim, step_tag=local.astype(jnp.uint32),
            )
            thr = _adapt_thr(thr, n_sel, fill)
            return (tab, claim, goal_g, fmin, thr, steps + 1,
                    expanded + jnp.sum(active),
                    reopen + reopen_ct,
                    n_open, overflow + ovf, local + 1)

        init = (tab, claim0, goal_g0, jnp.asarray(np.int32(0)),
                thr0, steps0,
                expanded0, reopen0, n_open0, overflow0, jnp.asarray(np.int32(0)))
        tab, _, goal_g, fmin, thr, steps, expanded, reopen, n_open, overflow, local = (
            jax.lax.while_loop(cond, body, init)
        )
        zero = jnp.zeros((6,), dtype=jnp.int32)  # no lane acct on this path
        counters = jnp.concatenate([
            jnp.stack([goal_g, fmin, steps, expanded, reopen, n_open,
                       overflow, thr]), zero])
        return tab, counters

    return run_chunk


def _make_backtrace(st: _Static):
    """Device-side path walk: goal -> origin through the closed table."""
    C = st.C
    Cmask = np.uint32(C - 1)

    @jax.jit
    def walk(tab, start_coord):
        t_key, t_g, t_f, t_par, t_state = tab
        tmax = int(st.final_np.sum())

        def lookup(coord):
            key = _pack_keys(coord[None, :], st.W)[0]
            h0 = _hash_keys(key[None, :])[0]

            def cond(c):
                r, found, _ = c
                return (r < st.max_probes) & ~found

            def body(c):
                r, found, val = c
                slot = _probe_slot(h0, r, Cmask)
                k_at = t_key[slot]
                hit = jnp.all(k_at == key)
                val = jnp.where(hit, t_par[slot], val)
                return r + 1, hit, val

            _, found, val = jax.lax.while_loop(cond, body, (jnp.int32(0), False, jnp.int32(0)))
            return val, found

        def scan_body(carry, _):
            coord, done = carry
            par, found = lookup(coord)
            at_origin = jnp.all(coord == 0)
            emit = ~done & ~at_origin & found
            mask = jnp.where(emit, par, 0)
            bits = ((par >> jnp.arange(st.n)) & 1).astype(jnp.int32)
            coord = jnp.where(emit, coord - bits, coord)
            done = done | at_origin | ~found
            return (coord, done), mask

        (coord_fin, _), masks = jax.lax.scan(
            scan_body, (start_coord, False), None, length=tmax
        )
        return masks, coord_fin

    return walk


class TpuFrontierSearch:
    def __init__(self, problem: Problem, heuristic: Optional[HPairHeuristic] = None,
                 n_devices: Optional[int] = None, hash_type: str = "FSUM",
                 hash_shift: int = 4, batch: Optional[int] = None,
                 capacity: Optional[int] = None, max_steps: int = 1_000_000,
                 chunk_steps: int = 64, snapshot_every: int = 0,
                 driver: str = "chunked", checkpoint_path: Optional[str] = None,
                 checkpoint_every: int = 8, layout: str = "auto",
                 triples: str = "auto", fill_target: Optional[int] = None):
        self.problem = problem
        self.layout_pref = layout
        self.heuristic = heuristic if heuristic is not None else HPairHeuristic.build(problem)
        n = problem.n_seq
        M = (1 << n) - 1
        if capacity is None:
            lattice = 1
            for L in problem.final_coord:
                lattice *= int(L) + 1
                if lattice > (1 << 27):
                    break
            # 2^23 is the kinase-scale default (r5: vs 2^24 it halves the
            # per-step select scan and keeps the sig layout eligible —
            # measured 8.4 ms/step vs 13.6; 2^22 would DROP sig eligibility
            # for kinase-length keys and fall back to the slower packed
            # layout, and 2^25 was measured to double the select scan AND
            # blow up reopens ~40x via the wider selection groups).
            # Searches whose unique-key set outgrows it hit the overflow
            # retry, which doubles capacity and recompiles once.
            capacity = min(1 << 23, max(1 << 16, _next_pow2(min(lattice * 2, 1 << 23))))
        if batch is None:
            # ~0.5M candidates/step on big searches: per-op latency floors
            # dominate below that, expansion waste (batch slack) dominates
            # far above it; small tables keep the old 8192 cap — their
            # searches are short and wide batches just add slack.  The
            # final cap is revisited after the triple-cube setup below
            # (_batch_auto): a tight cube bound keeps each f-band's
            # frontier thin, so cube-assisted searches measured FASTER at
            # B=8192/4096 than 16384 (kinase r5: 2.26/2.09 vs 2.45 s),
            # while pairwise-only searches fill wide batches productively
            # (synth4_long: B=16384 beats 8192 by 22%).
            cap_b = 16384 if capacity >= (1 << 22) else 8192
            batch = max(64, min(cap_b, (1 << 19) // M))
            self._batch_auto = True
        else:
            self._batch_auto = False
        batch = max(16, min(batch, capacity))
        batch = 1 << (batch.bit_length() - 1)  # grouped selection needs B | C
        self.max_steps = max_steps
        self.chunk_steps = chunk_steps
        # selection-fill target for the threshold controller (a RUNTIME
        # value: one compiled program serves any setting; see run_chunk).
        # Auto default is decided AFTER the triple-cube setup below — the
        # two measured regimes differ by 8x (see _auto_fill_target).
        self._fill_override = int(fill_target) if fill_target else None
        self.fill_target = self._fill_override or max(64, batch // 2)
        self.snapshot_every = snapshot_every
        self.driver = driver
        self.checkpoint_path = checkpoint_path
        self.checkpoint_every = checkpoint_every
        self.hash_type = hash_type
        self.hash_shift = hash_shift

        # Upper bound + packed-mode eligibility (decided once per problem).
        from ..core.cost import GAP_EXTENSION as _E, GAP_OPEN as _O
        from .bounds import greedy_upper_bound

        wi = self.heuristic.weight_i
        self.degenerate = bool((wi[~np.eye(n, dtype=bool)] <= 0).any())

        # triple-wise heuristic upgrade (heuristic/triples.py): joint 3-seq
        # suffix cubes dominate the pairwise bound, shrinking the expanded
        # f <= f* shell — the search's work term.  "auto" enables it whenever
        # valid (N >= 3, GapOpen == GapExtension, positive weights, cube
        # fits).  Runs FIRST: the cube fill is dispatched asynchronously, so
        # its device time overlaps the UB beam and the step compiles below
        # (cold-start overlap — nothing here reads the cubes back).
        self.triples = triples
        if (triples in ("auto", "on", "fractional") and not self.degenerate
                and _O == _E
                and getattr(self.heuristic, "triangles", None) is None):
            from ..heuristic.triples import HTriples

            # fractional: all C(n,3) cubes with (n-2)-scaled costs — a
            # tighter bound than the cherry cover when the cubes fit
            # (needs the larger budget: C(n,3) cubes instead of ~n/2)
            ht = (HTriples.build(self.heuristic, fractional=True,
                                 budget_bytes=10 << 30)
                  if triples == "fractional"
                  else HTriples.build(self.heuristic))
            if ht is not None:
                self.heuristic = ht
            elif triples in ("on", "fractional"):
                raise ValueError(
                    f"triples='{triples}' but the triple heuristic is not "
                    "applicable (needs N >= 3, GapOpen == GapExtension, "
                    "positive pair weights, and an in-budget cube size)")

        # auto fill target, now that cube availability is known.  Two
        # measured regimes (benchmarks/fill_target_kinase.jsonl,
        # synth4_long.jsonl, r5 sweeps):
        #  - cube-assisted searches (tight h): B/2; the curve is flat from
        #    B/4 to B (thr now carries across chunks) and B/2 sits at the
        #    measured minimum (kinase 2.45 s vs 2.48/2.55 at B and B/4).
        #  - pairwise-only searches (plateau-heavy, reopen-dominated):
        #    B/16; steps are pinned by the f-band count (synth4_long: 1127
        #    steps for every fill in [1024, 16384]) while reopens fall
        #    ~6x from fill=B/4 to B/16 — measured 13.5 -> 12.7 s, within
        #    1% of the swept optimum (12.58 at fill=512).
        has_cubes = getattr(self.heuristic, "triangles", None) is not None
        if self._batch_auto and has_cubes and batch > 8192:
            batch = 8192  # see the batch-cap note above (kinase r5 sweep)
        if self._fill_override is None:
            self.fill_target = max(64, batch // (2 if has_cubes else 16))

        if _O == _E and not self.degenerate:
            # wider beams tighten the bound; on big searches every unit of UB
            # slack admits a shell of extra open nodes, so spend more there
            beam = 1024 if capacity >= (1 << 22) else 32
            self.ub = greedy_upper_bound(problem, self.heuristic, beam=beam)
        else:
            self.ub = int(INF)

        # packed/sig layouts store f - f0 (see _Static.f0), so they need
        # only the f SPREAD (ub - f0, the heuristic's total slack) to fit
        # above the n parent-mask bits of an int32.  The pairwise f0 is
        # preferred (never blocks on the cube fill); when its spread
        # overflows (large N: pair slack grows with C(N,2)) fall back to the
        # exact triple h(root) — that read blocks until the fill drains,
        # which only this niche pays.
        budget = 1 << (31 - n)
        f0 = _rebase_origin(self.heuristic, n)
        if (self.ub < int(INF) and not (self.ub - f0 + 64) < budget
                and getattr(self.heuristic, "triangles", None)):
            f0 = int(self.heuristic.calculate_h(np.zeros(n, dtype=np.int32)))
        self.packed = (self.ub < int(INF)
                       and (self.ub - f0 + 64) < budget)

        self.st = _Static(problem, self.heuristic, batch, capacity, f0=f0)
        self._make_fns()
        # cold-start overlap: compile the chunk driver + walk on a background
        # thread while the triangle cube fill (dispatched above, async) runs
        # on the device.  backend_compile releases the GIL and the artifact
        # lands in the persistent cache, so the first real dispatch loads it.
        # Only for big searches — small problems compile in seconds, and the
        # extra thread would just churn short-lived test processes.
        # MSA_NO_PRECOMPILE=1 disables it for key-inspection tools
        # (scripts/warm_cache.py --check) that must NOT trigger the very
        # retrace they exist to detect.
        if capacity >= (1 << 22) and not os.environ.get("MSA_NO_PRECOMPILE"):
            self._start_precompile()

    def _precompile_args(self):
        st = self.st
        layout = self.layout
        SD = jax.ShapeDtypeStruct
        i32 = jnp.int32
        if layout == "sig":
            tab = (SD((st.nbuck, st.ways), jnp.uint32), SD((st.C,), i32),
                   SD((st.C,), i32))
        elif layout == "packed":
            tab = (SD((st.C, st.KW), jnp.uint32), SD((st.C,), i32),
                   SD((st.C,), i32))
        else:
            tab = (SD((st.C, st.W), jnp.uint32), SD((st.C,), i32),
                   SD((st.C,), i32), SD((st.C,), i32), SD((st.C,), i32))
        scalar = SD((), i32)
        htab = self._htab_arg()
        args = (tab, SD((N_COUNTERS,), i32), scalar, scalar,
                SD(htab.shape, htab.dtype),
                SD(st.d_enc.shape, st.d_enc.dtype),
                SD(st.d_tri8.shape, st.d_tri8.dtype), scalar)
        walk_args = (tab, SD((st.n,), i32))
        return args, walk_args

    def _export_cache_path(self) -> str:
        """Path of the serialized-StableHLO cache entry for run_loop.

        Measured (r4): on this 2-core host, TRACING the chunked driver —
        the tier cross-product instantiates the expand/insert pipeline many
        times — costs 104 s per fresh process; the XLA compile behind it is
        a 2 s persistent-cache hit.  jax.export lets later processes skip
        the trace: deserialize the StableHLO (native, fast) and jit its
        .call, which hits the compile cache.  The key must cover everything
        the trace bakes in as CONSTANTS: the engine source itself, the
        problem (sequences -> weights, final coords, mask matrices), layout
        and shape config, and the backend.
        """
        import hashlib
        import os

        from ..utils.srckey import semantic_source_key

        st = self.st
        h = hashlib.sha256()
        try:
            # SEMANTIC key (AST, docstrings stripped): comment/docstring
            # edits keep every cached program valid; structural edits
            # invalidate (see utils/srckey.py — round-4 weak #1)
            h.update(semantic_source_key(__file__))
        except OSError:
            return ""  # no stable source -> no export cache
        for s in self.problem.seqs:
            h.update(s.encode())
            h.update(b"\0")
        htab = self._htab_arg()
        h.update(
            f"{self.layout}|{st.B}|{st.C}|{st.n}|{st.P}|{st.S}|{st.T3}|"
            f"{st.f0}|{st.nb}|{getattr(st, 'ways', 0)}|{self.ub}|"
            f"{htab.shape}|{htab.dtype}|{st.d_tri8.shape}|"
            f"{jax.default_backend()}".encode())
        base = jax.config.jax_compilation_cache_dir
        if not base:
            return ""
        d = os.path.join(base, "exported")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"runloop_{h.hexdigest()[:20]}.bin")

    def _start_precompile(self) -> None:
        import threading

        args, walk_args = self._precompile_args()
        run_loop, walk = self._run_loop, self._walk
        path = self._export_cache_path()

        def work():
            try:
                import jax.export as jex

                from ..utils.exportcache import load_or_export

                exported = None
                if path:
                    # cache miss pays the one-time big trace per
                    # (code, problem, config); every later process skips it
                    exported, _ = load_or_export(
                        path, lambda: jex.export(run_loop)(*args))
                if exported is not None:
                    # ALWAYS run via the exported module (even right after
                    # creating it) so the XLA compile-cache entry is keyed
                    # by the round-tripped StableHLO that future processes
                    # will compile — otherwise the first exported run pays
                    # a second full compile
                    loop = jax.jit(exported.call, donate_argnums=(0,))
                    loop.lower(*args).compile()
                    self._run_loop = loop
                else:
                    run_loop.lower(*args).compile()
                walk.lower(*walk_args).compile()
                # PRE-LOAD both executables onto the device: compile() does
                # not ship the program; the first execution pays ~10 s of
                # load each on this tunneled backend (measured r4).  A
                # zero-step dummy run forces the load while the cube fill
                # is still draining.  chunk_steps=0 makes the while_loop
                # exit immediately; dummy (donated) tables are transient.
                try:
                    dummy = tuple(
                        jnp.zeros(a.shape, a.dtype) for a in args[0])
                    out = self._run_loop(
                        dummy, jnp.zeros((N_COUNTERS,), jnp.int32),
                        jnp.asarray(np.int32(0)),  # 0 steps: exit at once
                        jnp.asarray(np.int32(0)), self._htab_arg(),
                        self.st.d_enc, self.st.d_tri8,
                        jnp.asarray(np.int32(self.fill_target)))
                    np.asarray(out[1][0])
                    wtab = tuple(jnp.zeros(a.shape, a.dtype)
                                 for a in walk_args[0])
                    # start at the origin: the walk terminates immediately
                    wout = walk(wtab, jnp.zeros((self.st.n,), jnp.int32))
                    np.asarray(wout[1].ravel()[:1])
                except Exception:  # noqa: BLE001 - load warm is optional
                    pass
            except Exception:  # noqa: BLE001 - best-effort cache warm
                try:
                    run_loop.lower(*args).compile()
                    walk.lower(*walk_args).compile()
                except Exception:  # noqa: BLE001
                    pass

        self._precompile_thread = threading.Thread(target=work, daemon=True)
        self._precompile_thread.start()
        # a daemon thread killed mid-backend_compile at interpreter exit
        # aborts the process (C++ throw with no handler) — always join first
        import atexit

        atexit.register(self._join_precompile)

    def _join_precompile(self) -> None:
        t = getattr(self, "_precompile_thread", None)
        if t is not None:
            t.join()
            self._precompile_thread = None

    @property
    def layout(self) -> str:
        """Resolved table layout: 'sig' | 'packed' | 'unpacked'."""
        if self.layout_pref != "auto":
            return self.layout_pref
        if self.packed and self.st.sig_ok:
            return "sig"
        return "packed" if self.packed else "unpacked"

    def _make_fns(self):
        layout = self.layout
        self._init_build_sig = None  # st-dependent; invalidate on rebuild
        if layout == "sig":
            if not (self.packed and self.st.sig_ok):
                raise ValueError("sig layout requires packed eligibility and "
                                 "sig_bits <= log2(capacity) + 24")
            self._step = _make_step_sig(self.st)
            self._run_loop = _make_run_loop_sig(self.st)
            self._walk = _make_backtrace_sig(self.st)
        elif layout == "packed":
            if not self.packed:
                raise ValueError("packed layout requires a finite upper bound")
            self._step = _make_step_packed(self.st)
            self._run_loop = _make_run_loop_packed(self.st)
            self._walk = _make_backtrace_packed(self.st)
        else:
            self._step = _make_step(self.st)
            self._run_loop = _make_run_loop(self.st)
            self._walk = _make_backtrace(self.st)

    def _init_table_packed(self):
        st = self.st
        C = st.C
        t_key = jnp.full((C, st.KW), _EMPTY_WORD, dtype=jnp.uint32)
        t_best = jnp.full((C,), INFP, dtype=jnp.int32)
        t_closed = jnp.full((C,), INFP, dtype=jnp.int32)
        root = np.zeros((1, st.n), dtype=np.int32)
        key = np.asarray(_pack_keys(jnp.asarray(root), st.W))[0]
        h0 = int(np.asarray(_hash_keys(jnp.asarray(key)[None, :]))[0]) & (C - 1)
        h_root = self.heuristic.calculate_h(root[0])
        krow = np.concatenate([key, np.array([h_root], dtype=np.uint32)])
        t_key = t_key.at[h0].set(jnp.asarray(krow))
        t_best = t_best.at[h0].set(
            np.int32(((h_root - st.f0) << st.nb) | self.problem.root_parent_mask)
        )
        return (t_key, t_best, t_closed)

    def _init_table_sig(self):
        st = self.st
        C = st.C
        # t_sig lives PERMANENTLY as (buckets, ways): reshaping a flat (C,)
        # u32 to (NB, 8) retiles (physically copies) the whole table on every
        # probe call — ~1.5 ms per 64 MB on v5e, several times per step
        root = np.zeros((1, st.n), dtype=np.int32)
        home, sigb = _sig_encode(st, jnp.asarray(root))
        buck_i = int(np.asarray(home)[0])
        slot_i = buck_i * st.ways  # way 0 of the home bucket
        h_root = self.heuristic.calculate_h(root[0])
        root_best = np.int32(
            ((h_root - st.f0) << st.nb) | self.problem.root_parent_mask)

        # ONE fused dispatch: un-jitted, the fills + root placement ran as
        # ~6 separate ops, each a separate tunnel round-trip — measured
        # 0.93 s of the 5.2 s warm kinase run (profile_run.py r4).  The jit
        # is cached on self: a per-call jit object would retrace every run.
        if getattr(self, "_init_build_sig", None) is None:
            @jax.jit
            def build(sig0, best0):
                t_sig = jnp.full((st.nbuck, st.ways), _EMPTY_WORD,
                                 dtype=jnp.uint32).at[buck_i, 0].set(sig0)
                t_best = jnp.full((C,), INFP,
                                  dtype=jnp.int32).at[slot_i].set(best0)
                t_closed = jnp.full((C,), INFP, dtype=jnp.int32)
                return t_sig, t_best, t_closed

            self._init_build_sig = build
        return self._init_build_sig(sigb[0], root_best)

    def _init_table(self):
        layout = self.layout
        if layout == "sig":
            return self._init_table_sig()
        if layout == "packed":
            return self._init_table_packed()
        return self._init_table_unpacked()

    def _htab_arg(self):
        return self.st.d_tables4 if self.layout != "unpacked" else self.st.d_tables

    def _init_table_unpacked(self):
        st = self.st
        C, W = st.C, st.W
        t_key = jnp.full((C, W), _EMPTY_WORD, dtype=jnp.uint32)
        t_g = jnp.full((C,), INF, dtype=jnp.int32)
        t_f = jnp.full((C,), INF, dtype=jnp.int32)
        t_par = jnp.zeros((C,), dtype=jnp.int32)
        t_state = jnp.zeros((C,), dtype=jnp.int32)
        # place the root (ref: pastar/PAStar.cpp:147-155 enqueues node_zero)
        root = np.zeros((1, st.n), dtype=np.int32)
        key = np.asarray(_pack_keys(jnp.asarray(root), W))[0]
        h0 = int(np.asarray(_hash_keys(jnp.asarray(key)[None, :]))[0]) & (C - 1)
        h_root = self.heuristic.calculate_h(root[0])
        t_key = t_key.at[h0].set(jnp.asarray(key))
        t_g = t_g.at[h0].set(0)
        t_f = t_f.at[h0].set(h_root)
        t_par = t_par.at[h0].set(self.problem.root_parent_mask)
        t_state = t_state.at[h0].set(1)
        return (t_key, t_g, t_f, t_par, t_state)

    def _run_host_driver(self, ub: int) -> TpuSearchResult:
        """Per-step host dispatch: slower (1 RTT/step) but immune to kernel
        watchdogs and long chunk compiles; used as a fallback driver."""
        tab = self._init_table()
        goal_g = jnp.asarray(np.int32(min(ub + 1, int(INF))))
        ub_dev = jnp.asarray(np.int32(ub))
        thr = jnp.asarray(np.int32(0))
        total_expanded = total_reopen = steps = 0
        last_n_open = 0
        goal_found = int(INF)
        while steps < self.max_steps:
            tab, goal_g, thr, stats = self._step(tab, goal_g, ub_dev, thr,
                                                 self._htab_arg(), self.st.d_enc,
                                                 self.st.d_tri8)
            sv = np.asarray(stats)
            steps += 1
            goal_found = int(sv[0])
            fmin_v = int(sv[1])
            last_n_open = int(sv[2])
            total_expanded += int(sv[3])
            total_reopen += int(sv[4])
            if int(sv[5]) > 0:
                raise RuntimeError(
                    f"hash table overflow after {steps} steps "
                    f"(capacity {self.st.C}); increase capacity"
                )
            if fmin_v >= goal_found:
                break
        if goal_found > ub:
            raise RuntimeError("open set exhausted without reaching the goal")
        return self._finish(tab, goal_found, steps, total_expanded,
                            total_reopen, last_n_open)

    def _ckpt_meta(self) -> str:
        import hashlib

        h = hashlib.sha256()
        for s in self.problem.seqs:
            h.update(s.encode())
        h.update(f"{self.st.B}:{self.st.C}:{self.st.W}:{self.layout}".encode())
        # stored f values depend on the heuristic definition AND the
        # f-rebase origin (packed/sig store f - f0)
        h.update(f":tri{getattr(self.heuristic, 'triangles', None)}"
                 f":{getattr(self.heuristic, 'tri_weights', None)}"
                 f":f0{self.st.f0}".encode())
        if self.layout == "sig":
            # bucketed-sig format, v3 = 2-D (buckets, ways) t_sig
            h.update(f":w{self.st.ways}v3".encode())
        h.update(b":ctr14")  # 14-slot counters (thr carry + lane acct)
        return h.hexdigest()[:16]

    def _save_checkpoint(self, tab, counters) -> None:
        """Persist the full search state (checkpoint/resume — absent from the
        reference, SURVEY.md §5).  Atomic via rename."""
        import os

        tmp = self.checkpoint_path + ".tmp"
        arrays = {f"tab{i}": np.asarray(a) for i, a in enumerate(tab)}
        np.savez_compressed(
            tmp,
            meta=np.frombuffer(self._ckpt_meta().encode(), dtype=np.uint8),
            ntab=np.int32(len(tab)), counters=np.asarray(counters),
            **arrays,
        )
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp,
                   self.checkpoint_path)

    def _load_checkpoint(self):
        import os

        if not self.checkpoint_path or not os.path.exists(self.checkpoint_path):
            return None, None
        z = np.load(self.checkpoint_path)
        meta = bytes(z["meta"]).decode()
        if meta != self._ckpt_meta() or "ntab" not in z:
            return None, None  # different problem/config/format; start fresh
        tab = tuple(jnp.asarray(z[f"tab{i}"]) for i in range(int(z["ntab"])))
        return tab, jnp.asarray(z["counters"])

    def run(self) -> TpuSearchResult:
        """Run to the provably optimal goal; on table overflow the capacity is
        doubled (up to 2^26) and the search restarts — the functional analogue
        of growing the reference's std::map closed lists."""
        attempts = 0
        while True:
            try:
                res = self._run_once()
                scale = getattr(self.heuristic, "cost_scale", 1)
                if scale > 1:
                    # fractional cover ran the whole search in (n-2)-scaled
                    # cost units; every path cost is divisible by the scale
                    res = TpuSearchResult(
                        g=res.g // scale, h=res.h // scale,
                        f=res.f // scale,
                        closed={c: (g // scale, m)
                                for c, (g, m) in res.closed.items()},
                        nodes_expanded=res.nodes_expanded,
                        nodes_reopened=res.nodes_reopened,
                        open_size=res.open_size, steps=res.steps,
                        shard_stats=res.shard_stats,
                    )
                return res
            except RuntimeError as e:
                if "overflow" not in str(e) or attempts >= 2 or self.st.C >= (1 << 26):
                    raise
                attempts += 1
                self.st = _Static(self.problem, self.heuristic, self.st.B,
                                  self.st.C * 2, f0=self.st.f0)
                self._make_fns()

    def _run_once(self) -> TpuSearchResult:
        st = self.st
        ub = self.ub
        if self.degenerate:
            # pruning assumes positive pair weights (degenerate inputs can
            # yield non-positive rationale-2 weights, i.e. negative edge
            # costs — optimality is undefined there, as in the reference)
            import warnings

            warnings.warn(
                "non-positive Altschul pair weights detected: edge costs "
                "can be negative, so A* optimality is undefined for this "
                "input (the reference has the same limitation)",
                RuntimeWarning, stacklevel=3,
            )
        if self.driver == "host":
            return self._run_host_driver(ub)
        import time as _time0
        # phase walls (complements last_chunk_walls): attributes non-loop
        # time — precompile join (cache deserialize / residual compile),
        # table init, device walk, finish reductions — so a stalled run is
        # diagnosable from telemetry alone
        self.last_phase_walls = {}
        _t = _time0.perf_counter()
        # wait for the background cache-warm (ctor) so the first dispatch
        # below deserializes instead of racing a duplicate compile
        self._join_precompile()
        self.last_phase_walls["precompile_join"] = _time0.perf_counter() - _t
        _t = _time0.perf_counter()
        tab, counters = self._load_checkpoint()
        if tab is None:
            tab = self._init_table()
            counters = jnp.asarray(fresh_counters())
        self.last_phase_walls["init_table"] = _time0.perf_counter() - _t
        ub_dev = jnp.asarray(np.int32(ub))

        # fault tolerance: snapshot the search state between chunks so a TPU
        # worker crash/restart (remote-tunnel flakiness) resumes instead of
        # restarting — a capability the reference lacks entirely (a failed
        # rank hangs or kills the job, SURVEY.md §5)
        snapshot = None
        chunks_done = 0
        chunk_now = self.chunk_steps
        import time as _time
        # per-chunk wall clocks: a backend blackout shows up as ONE chunk
        # taking 30-200+ s among ~0.5 s neighbours, which lets callers
        # (bench.py) tell a poisoned measurement from a slow engine
        self.last_chunk_walls = []
        while True:
            try:
                if self.snapshot_every and chunks_done % self.snapshot_every == 0:
                    snapshot = tuple(np.asarray(a) for a in tab), np.asarray(counters)
                if (self.checkpoint_path and chunks_done
                        and chunks_done % self.checkpoint_every == 0):
                    self._save_checkpoint(tab, counters)
                _t0 = _time.perf_counter()
                tab, counters = self._run_loop(
                    tab, counters, jnp.asarray(np.int32(chunk_now)), ub_dev,
                    self._htab_arg(), self.st.d_enc, self.st.d_tri8,
                    jnp.asarray(np.int32(self.fill_target)),
                )
                stats_np = np.asarray(counters)  # 1 small transfer per chunk
                _dt = _time.perf_counter() - _t0
                self.last_chunk_walls.append(_dt)
                # keep each dispatch well under the remote-worker watchdog
                if _dt > 20 and chunk_now > 8:
                    chunk_now = max(8, chunk_now // 2)
                elif _dt < 8 and chunk_now < 4 * self.chunk_steps:
                    chunk_now *= 2
            except Exception as e:  # noqa: BLE001
                if snapshot is None or "UNAVAILABLE" not in str(e):
                    raise
                # true crash revive: a worker restart invalidates EVERY
                # device buffer, including the heuristic-table constants in
                # _Static — rebuild them (host-side data is retained), re-jit
                # the wrappers (compilation cache makes this cheap), and
                # resume from the host-side snapshot
                if hasattr(self.heuristic, "rebuild"):
                    self.heuristic.rebuild()  # triangle cubes live on device
                self.st = _Static(self.problem, self.heuristic, self.st.B,
                                  self.st.C, f0=self.st.f0)
                self._make_fns()
                st = self.st
                ub_dev = jnp.asarray(np.int32(ub))
                snap_tab, snap_ctr = snapshot
                tab = tuple(jnp.asarray(a) for a in snap_tab)
                counters = jnp.asarray(snap_ctr)
                continue
            chunks_done += 1
            goal_v, fmin_v, steps, total_expanded, total_reopen, last_n_open, overflow = (
                int(v) for v in stats_np[:7]
            )
            # lane accounting (slots 8-11) for throughput forensics
            self.last_acct = {
                "sel_proc": int(stats_np[8]),
                "lanes_true": int(stats_np[9]),
                "lanes_r0": int(stats_np[10]),
                "lanes_probe": int(stats_np[11]),
                "lanes_unmatched": int(stats_np[12]),
                "lanes_tail": int(stats_np[13]),
            }
            if fmin_v >= goal_v or overflow > 0 or steps >= self.max_steps:
                break
        if overflow > 0:
            raise RuntimeError(
                f"hash table overflow after {steps} steps "
                f"(capacity {st.C}); increase capacity"
            )
        if steps >= self.max_steps and fmin_v < goal_v:
            if self.checkpoint_path:
                self._save_checkpoint(tab, counters)
            raise RuntimeError("max_steps exceeded")
        if goal_v >= int(INF):
            raise RuntimeError("open set exhausted without reaching the goal")
        return self._finish(tab, goal_v, steps, total_expanded, total_reopen,
                            last_n_open)

    def _finish(self, tab, goal_v, steps, total_expanded, total_reopen,
                last_n_open) -> TpuSearchResult:
        st = self.st
        import time as _time0
        _t = _time0.perf_counter()
        # backtrace on device
        final = jnp.asarray(st.final_np)
        masks, coord_fin = self._walk(tab, final)
        masks = np.asarray(masks)
        if not np.all(np.asarray(coord_fin) == 0):
            raise RuntimeError("backtrace did not reach the origin")
        if getattr(self, "last_phase_walls", None) is not None:
            self.last_phase_walls["walk"] = _time0.perf_counter() - _t

        closed: Dict[Tuple[int, ...], Tuple[int, int]] = {}
        coord = tuple(int(v) for v in st.final_np)
        origin = tuple(0 for _ in range(st.n))
        for mv in masks:
            if coord == origin:
                break
            mv = int(mv)
            if mv == 0:
                continue
            closed[coord] = (0, mv)
            coord = tuple(coord[i] - ((mv >> i) & 1) for i in range(st.n))

        # exact g per path node (the table stores (f<<n)|parent, not g);
        # with degenerate (non-positive) weights the finalized path may be
        # non-optimal, so skip the goal-g consistency assertion there
        closed = attach_path_g(self.problem, self.heuristic.weight_i, closed,
                               goal_g=None if self.degenerate else goal_v)

        h_goal = self.heuristic.calculate_h(st.final_np)
        # real closed/open sizes from the table, matching the reference's
        # print_nodes_count semantics (ref: pastar/PAStar.cpp:591-619):
        # "closed" = selected and not since reopened (the reference erases a
        # reopened entry from ClosedList, pastar/AStar.cpp:89), "open" =
        # entries whose best f improved past their closed snapshot.
        if self.layout == "unpacked":
            t_state = tab[4]
            n_closed = int(jnp.sum(t_state == 2))
            n_open = int(jnp.sum(t_state == 1))
        else:
            t_best, t_closed = tab[1], tab[2]
            n_open = int(jnp.sum(t_best < t_closed))
            n_closed = int(jnp.sum((t_closed < INFP) & (t_best >= t_closed)))
        return TpuSearchResult(
            g=goal_v, h=h_goal, f=goal_v + h_goal, closed=closed,
            nodes_expanded=total_expanded, nodes_reopened=total_reopen,
            open_size=n_open, steps=steps,
            shard_stats=[(total_expanded, total_reopen, n_closed, n_open)],
        )

"""Multi-chip sharded frontier engine: HDA* over a JAX device mesh.

TPU-native re-design of the reference's distributed PA*
(ref: pastar/PAStar.cpp, pastar/pastar_functions/): every lattice state is
owned by exactly one shard via the configurable owner hash
(ref: pastar/CoordHash.cpp:191-245); each super-step every device

  1. selects its lowest-f open batch from its own table shard,
  2. expands all successors and computes each child's owner shard,
  3. exchanges migrants with a single tiled ``all_to_all`` over ICI
     (replacing the sender/receiver/processor thread trio + LZ4 wire codec,
     ref: pastar/pastar_functions/PAStarSender.cpp / PAStarReceiver.cpp),
  4. inserts received candidates into its local shard with
     decrease-key/reopen semantics,
  5. joins the global termination consensus: ``pmin`` over local best-f and
     goal candidates — the collective analogue of the reference's two
     ``MPI_Allreduce`` calls (ref: pastar/PAStar.cpp:502-519).  Because the
     exchange happens inside the same super-step, the reference's whole
     flush/barrier quiescence dance (ref: pastar/PAStar.cpp:277-298) is
     unnecessary: an ``all_to_all`` IS a quiescent exchange.

The entire search loop runs on-device inside ``shard_map`` (one dispatch, one
final host transfer), and the distributed backtrace is a lockstep walk where
the owner shard answers each lookup and ``psum`` broadcasts it — collapsing
the reference's token-passing FSM (ref: PAStarDistributedBacktrace.cpp).
"""
from __future__ import annotations

from dataclasses import dataclass

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.problem import Problem
from ..heuristic.hpair import HPairHeuristic
from ..utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
from ..search.engine import (
    INF,
    INFP,
    _EMPTY_WORD,
    _Static,
    _expand,
    _hash_keys,
    _insert,
    _insert_packed,
    _insert_sig,
    _pack_keys,
    _probe_slot,
    _select,
    _select_packed,
    _select_sig,
    _sig_encode,
)
from .partition import owner_fn

AXIS = "shards"


@dataclass
class ShardedSearchResult:
    g: int
    h: int
    f: int
    closed: Dict[Tuple[int, ...], Tuple[int, int]]
    nodes_expanded: int
    nodes_reopened: int
    open_size: int
    steps: int
    # per-shard (expanded, reopened, closed, open, migrated)
    shard_stats: List[Tuple[int, int, int, int, int]]
    # candidates routed to a non-generating shard (the reference's
    # remote-send volume, ref: pastar/PAStar.cpp:387-393)
    nodes_migrated: int = 0


def _route(st: _Static, ndev: int, owner, coords, keys, g_c, f_c, mask_c, valid):
    """Sort candidates by destination shard and build the (ndev, L) exchange
    buffer, then swap rows with a tiled all_to_all."""
    L = keys.shape[0]
    dest = jnp.where(valid, owner(coords), ndev).astype(jnp.int32)  # (L,)

    # sort every field by destination (invalid -> ndev, sorted last)
    key_w = [keys[:, w].astype(jnp.uint32) for w in range(st.W)]
    sort_in = (dest, g_c, f_c, mask_c) + tuple(key_w)
    sorted_vals = jax.lax.sort(sort_in, num_keys=1)
    dest_s, g_s, f_s, mask_s = sorted_vals[:4]
    keys_s = jnp.stack(sorted_vals[4:], axis=-1)

    # start offset of each destination's run
    counts = jnp.zeros((ndev + 1,), jnp.int32).at[dest_s].add(1, mode="drop")
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    idx = jnp.arange(L, dtype=jnp.int32)
    col = idx - starts[jnp.clip(dest_s, 0, ndev)]

    # scatter into (ndev, L) padded send buffer; invalid rows dropped
    flat = jnp.where(dest_s < ndev, dest_s * L + col, ndev * L)
    buf_g = jnp.full((ndev * L,), INF, jnp.int32).at[flat].set(g_s, mode="drop")
    buf_f = jnp.full((ndev * L,), INF, jnp.int32).at[flat].set(f_s, mode="drop")
    buf_m = jnp.zeros((ndev * L,), jnp.int32).at[flat].set(mask_s, mode="drop")
    buf_k = jnp.full((ndev * L, st.W), _EMPTY_WORD, jnp.uint32).at[flat].set(
        keys_s, mode="drop"
    )

    # single tiled all_to_all per field (ICI); row j <-> shard j
    def xch(x):
        return jax.lax.all_to_all(
            x.reshape((ndev, L) + x.shape[1:]), AXIS, 0, 0, tiled=False
        ).reshape((ndev * L,) + x.shape[1:])

    rg = xch(buf_g)
    rf = xch(buf_f)
    rm = xch(buf_m)
    rk = xch(buf_k)
    rvalid = rk[:, 0] != _EMPTY_WORD
    return rk, rg, rf, rm, rvalid


def _route_packed(st: _Static, ndev: int, owner, coords, keys, h_c, packed, valid):
    """Packed-layout migration: sort by destination shard, one tiled
    all_to_all per field (keys + h + packed word — the whole node state)."""
    L = keys.shape[0]
    dest = jnp.where(valid, owner(coords), ndev).astype(jnp.int32)

    key_w = [keys[:, w].astype(jnp.uint32) for w in range(st.W)]
    sort_in = (dest, packed, h_c) + tuple(key_w)
    sorted_vals = jax.lax.sort(sort_in, num_keys=1)
    dest_s, packed_s, h_s = sorted_vals[:3]
    keys_s = jnp.stack(sorted_vals[3:], axis=-1)

    counts = jnp.zeros((ndev + 1,), jnp.int32).at[dest_s].add(1, mode="drop")
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    idx = jnp.arange(L, dtype=jnp.int32)
    col = idx - starts[jnp.clip(dest_s, 0, ndev)]

    flat = jnp.where(dest_s < ndev, dest_s * L + col, ndev * L)
    buf_p = jnp.full((ndev * L,), INFP, jnp.int32).at[flat].set(packed_s, mode="drop")
    buf_h = jnp.zeros((ndev * L,), jnp.int32).at[flat].set(h_s, mode="drop")
    buf_k = jnp.full((ndev * L, st.W), _EMPTY_WORD, jnp.uint32).at[flat].set(
        keys_s, mode="drop"
    )

    def xch(x):
        return jax.lax.all_to_all(
            x.reshape((ndev, L) + x.shape[1:]), AXIS, 0, 0, tiled=False
        ).reshape((ndev * L,) + x.shape[1:])

    rp = xch(buf_p)
    rh = xch(buf_h)
    rk = xch(buf_k)
    rvalid = rk[:, 0] != _EMPTY_WORD
    return rk, rh, rp, rvalid


def _route_sig(st: _Static, ndev: int, owner, child, home, sigb, packed, valid):
    """Sig-layout migration: the wire is 3 words per node — (home bucket,
    sig word, packed (f,par)) — because the (home, sig) pair IS the full key
    (see engine._sig_encode) and the layout stores no h.  Beats the packed
    wire (W key words + h + packed) at any N."""
    L = home.shape[0]
    dest = jnp.where(valid, owner(child), ndev).astype(jnp.int32)

    sort_in = (dest, packed, home, sigb)
    dest_s, packed_s, home_s, sigb_s = jax.lax.sort(sort_in, num_keys=1)

    counts = jnp.zeros((ndev + 1,), jnp.int32).at[dest_s].add(1, mode="drop")
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    idx = jnp.arange(L, dtype=jnp.int32)
    col = idx - starts[jnp.clip(dest_s, 0, ndev)]

    flat = jnp.where(dest_s < ndev, dest_s * L + col, ndev * L)
    buf_p = jnp.full((ndev * L,), INFP, jnp.int32).at[flat].set(packed_s, mode="drop")
    buf_h = jnp.zeros((ndev * L,), jnp.uint32).at[flat].set(home_s, mode="drop")
    buf_s = jnp.full((ndev * L,), _EMPTY_WORD, jnp.uint32).at[flat].set(
        sigb_s, mode="drop"
    )

    def xch(x):
        return jax.lax.all_to_all(
            x.reshape((ndev, L) + x.shape[1:]), AXIS, 0, 0, tiled=False
        ).reshape((ndev * L,) + x.shape[1:])

    rp = xch(buf_p)
    rh = xch(buf_h)
    rs = xch(buf_s)
    rvalid = rs != _EMPTY_WORD  # a real sig word is always < 0xFFFFFFFF
    return rh, rs, rp, rvalid


def _make_sharded_run_sig(st: _Static, mesh: Mesh, ndev: int,
                          hash_type: str, hash_shift: int):
    """Bucketed-sig sharded search (see engine.py sig-path notes)."""
    own = owner_fn(hash_type, ndev, hash_shift)
    root_owner = int(own(np.zeros((1, st.n), dtype=np.int32))[0])
    goal_owner_np = int(own(st.final_np[None, :])[0])

    def init_fn(root_h_arr):
        dev = jax.lax.axis_index(AXIS)
        C = st.C
        # 2-D (buckets, ways) t_sig — see engine._init_table_sig
        t_sig = jnp.full((st.nbuck, st.ways), _EMPTY_WORD, dtype=jnp.uint32)
        t_best = jnp.full((C,), INFP, dtype=jnp.int32)
        t_closed = jnp.full((C,), INFP, dtype=jnp.int32)

        root = jnp.zeros((1, st.n), dtype=jnp.int32)
        home, sigb = _sig_encode(st, root)
        buck = home[0].astype(jnp.int32)
        is_owner = dev == root_owner
        t_sig = t_sig.at[jnp.where(is_owner, buck, st.nbuck), 0].set(
            sigb[0], mode="drop")
        t_best = t_best.at[jnp.where(is_owner, buck * st.ways, C)].set(
            ((root_h_arr[0] - st.f0) << st.nb) | ((1 << st.n) - 1), mode="drop")
        return t_sig, t_best, t_closed

    def chunk_fn(t_sig, t_best, t_closed, counters, shard_ctr,
                 chunk_steps, ub, htab, henc, tri8):
        tab = (t_sig, t_best, t_closed)
        goal0, steps0 = counters[0], counters[2]
        me = jax.lax.axis_index(AXIS)
        exp0, reop0, migr0 = (shard_ctr[me, 0], shard_ctr[me, 1],
                              shard_ctr[me, 4])

        claim0 = jnp.full((st.C,), np.uint32(0xFFFFFFFF), dtype=jnp.uint32)

        def cond(carry):
            _, _, goal_g, fmin_g, thr, steps, _, _, _, _, ovf, local = carry
            return (fmin_g < goal_g) & (local < chunk_steps[0]) & (ovf == 0)

        def body(carry):
            tab, claim, goal_g, fmin_g, thr, steps, expanded, reopen, n_open, migr, ovf, local = carry
            tab, coords, f_sel, par, active, fmin_l, n_open_l, n_sel, reopen_ct = (
                _select_sig(st, tab, goal_g, thr))
            keys, g_c, f_c, mask_c, valid, is_goal, child, h_c = _expand(
                st, coords, f_sel, par, active, None, htab, henc, g_is_f=True,
                tri8=tri8,
            )
            valid = valid & (f_c <= ub[0])
            packed = ((f_c - st.f0) << st.nb) | mask_c
            goal_l = jnp.min(jnp.where(is_goal, g_c, INF))
            # migrated = candidates owned elsewhere (the reference's
            # remote-send count, ref: pastar/PAStar.cpp:387-393)
            migr_ct = jnp.sum(valid & (own(child) != me))
            home, sigb = _sig_encode(st, child)
            rh, rs, rp, rvalid = _route_sig(
                st, ndev, own, child, home, sigb, packed, valid
            )
            tab, ovf_l, claim = _insert_sig(
                st, tab, rh, rs, None, rp, rvalid,
                claim=claim, step_tag=local.astype(jnp.uint32),
            )
            # global consensus (the two MPI_Allreduce analogues,
            # ref: pastar/PAStar.cpp:502-519)
            goal_g = jnp.minimum(goal_g, jax.lax.pmin(goal_l, AXIS))
            fmin_g = jax.lax.pmin(fmin_l, AXIS)
            from ..search.engine import _adapt_thr

            thr = _adapt_thr(thr, jax.lax.psum(n_sel, AXIS), st.B * ndev)
            return (tab, claim, goal_g, fmin_g, thr, steps + 1,
                    expanded + jnp.sum(active),
                    reopen + reopen_ct,
                    n_open_l, migr + migr_ct,
                    ovf + jax.lax.psum(ovf_l, AXIS), local + 1)

        z32 = jnp.asarray(np.int32(0))
        init = (tab, claim0, goal0, z32, z32, steps0, exp0, reop0, z32, migr0,
                z32, z32)
        tab, _, goal_g, fmin_g, thr, steps, expanded, reopen, n_open, migr, ovf, _ = (
            jax.lax.while_loop(cond, body, init)
        )
        closed_ct = jnp.sum(tab[1] >= tab[2]).astype(jnp.int32) - jnp.sum(
            tab[1] == INFP).astype(jnp.int32)
        stats = jnp.stack([goal_g, fmin_g, steps, ovf])
        shard_stats = jax.lax.all_gather(
            jnp.stack([expanded, reopen, closed_ct, n_open, migr]), AXIS
        )
        return tab + (stats, shard_stats)

    spec_tab = (P(AXIS), P(AXIS), P(AXIS))
    init_jit = jax.jit(jax.shard_map(
        init_fn, mesh=mesh, in_specs=(P(None),), out_specs=spec_tab,
        check_vma=False,
    ))
    chunk_jit = jax.jit(jax.shard_map(
        chunk_fn, mesh=mesh,
        in_specs=spec_tab + (P(None),) * 7,
        out_specs=spec_tab + (P(None), P(None)),
        check_vma=False,
    ), donate_argnums=(0, 1, 2))
    return init_jit, chunk_jit, goal_owner_np


def _make_sharded_walk_sig(st: _Static, mesh: Mesh, ndev: int):
    NB = st.nbuck
    ways = st.ways
    Bmask = np.uint32(NB - 1)
    parmask = np.int32((1 << st.nb) - 1)

    def device_fn(t_sig, t_best, t_closed, start):
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
            val = jnp.where(found, t_best[slot] & parmask, 0)
            # owner shard answers; psum broadcasts to everyone
            val = jax.lax.psum(val, AXIS)
            found = jax.lax.psum(found.astype(jnp.int32), AXIS) > 0
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
            scan_body, (start, False), None, length=tmax
        )
        return masks, coord_fin

    spec_tab = (P(AXIS), P(AXIS), P(AXIS))
    fn = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=spec_tab + (P(None),),
        out_specs=(P(None), P(None)),
        check_vma=False,
    )
    return jax.jit(fn)


def _make_sharded_run_packed(st: _Static, mesh: Mesh, ndev: int,
                             hash_type: str, hash_shift: int):
    """Packed-layout sharded search (see engine.py packed-path notes)."""
    own = owner_fn(hash_type, ndev, hash_shift)
    root_owner = int(own(np.zeros((1, st.n), dtype=np.int32))[0])
    goal_owner_np = int(own(st.final_np[None, :])[0])

    def init_fn(root_h_arr):
        dev = jax.lax.axis_index(AXIS)
        C = st.C
        t_key = jnp.full((C, st.KW), _EMPTY_WORD, dtype=jnp.uint32)
        t_best = jnp.full((C,), INFP, dtype=jnp.int32)
        t_closed = jnp.full((C,), INFP, dtype=jnp.int32)

        root = jnp.zeros((1, st.n), dtype=jnp.int32)
        rkey = _pack_keys(root, st.W)[0]
        slot = (_hash_keys(rkey[None, :])[0] & np.uint32(C - 1)).astype(jnp.int32)
        is_owner = dev == root_owner
        wslot = jnp.where(is_owner, slot, C)
        krow = jnp.concatenate([rkey, root_h_arr.astype(jnp.uint32)])
        t_key = t_key.at[wslot].set(krow, mode="drop")
        t_best = t_best.at[wslot].set(
            ((root_h_arr[0] - st.f0) << st.nb) | ((1 << st.n) - 1), mode="drop")
        return t_key, t_best, t_closed

    def chunk_fn(t_key, t_best, t_closed, counters, shard_ctr,
                 chunk_steps, ub, htab, henc, tri8):
        tab = (t_key, t_best, t_closed)
        goal0, steps0 = counters[0], counters[2]
        # shard_ctr is a replicated (ndev, 5) table; each shard resumes from
        # its own row (keeps every host-side array replicated so the same
        # code drives single- and multi-process meshes)
        me = jax.lax.axis_index(AXIS)
        exp0, reop0, migr0 = (shard_ctr[me, 0], shard_ctr[me, 1],
                              shard_ctr[me, 4])

        claim0 = jnp.full((st.C,), np.uint32(0xFFFFFFFF), dtype=jnp.uint32)

        def cond(carry):
            _, _, goal_g, fmin_g, thr, steps, _, _, _, _, ovf, local = carry
            return (fmin_g < goal_g) & (local < chunk_steps[0]) & (ovf == 0)

        def body(carry):
            tab, claim, goal_g, fmin_g, thr, steps, expanded, reopen, n_open, migr, ovf, local = carry
            tab, coords, g, par, active, fmin_l, n_open_l, n_sel, reopen_ct = (
                _select_packed(st, tab, goal_g, thr))
            keys, g_c, f_c, mask_c, valid, is_goal, child, h_c = _expand(
                st, coords, g, par, active, None, htab, henc, tri8=tri8
            )
            valid = valid & (f_c <= ub[0])
            packed = ((f_c - st.f0) << st.nb) | mask_c
            goal_l = jnp.min(jnp.where(is_goal, g_c, INF))
            migr_ct = jnp.sum(valid & (own(child) != me))
            rk, rh, rp, rvalid = _route_packed(
                st, ndev, own, child, keys, h_c, packed, valid
            )
            tab, ovf_l, claim = _insert_packed(
                st, tab, rk, rh, rp, rvalid,
                claim=claim, step_tag=local.astype(jnp.uint32),
            )
            # global consensus (the two MPI_Allreduce analogues,
            # ref: pastar/PAStar.cpp:502-519)
            goal_g = jnp.minimum(goal_g, jax.lax.pmin(goal_l, AXIS))
            fmin_g = jax.lax.pmin(fmin_l, AXIS)
            from ..search.engine import _adapt_thr

            thr = _adapt_thr(thr, jax.lax.psum(n_sel, AXIS), st.B * ndev)
            return (tab, claim, goal_g, fmin_g, thr, steps + 1,
                    expanded + jnp.sum(active),
                    reopen + reopen_ct,
                    n_open_l, migr + migr_ct,
                    ovf + jax.lax.psum(ovf_l, AXIS), local + 1)

        z32 = jnp.asarray(np.int32(0))
        init = (tab, claim0, goal0, z32, z32, steps0, exp0, reop0, z32, migr0,
                z32, z32)
        tab, _, goal_g, fmin_g, thr, steps, expanded, reopen, n_open, migr, ovf, _ = (
            jax.lax.while_loop(cond, body, init)
        )
        closed_ct = jnp.sum(tab[1] >= tab[2]).astype(jnp.int32) - jnp.sum(
            tab[1] == INFP).astype(jnp.int32)
        stats = jnp.stack([goal_g, fmin_g, steps, ovf])
        shard_stats = jax.lax.all_gather(
            jnp.stack([expanded, reopen, closed_ct, n_open, migr]), AXIS
        )  # (ndev, 5) replicated — per-tid stats table without P(AXIS) I/O
        return tab + (stats, shard_stats)

    spec_tab = (P(AXIS), P(AXIS), P(AXIS))
    init_jit = jax.jit(jax.shard_map(
        init_fn, mesh=mesh, in_specs=(P(None),), out_specs=spec_tab,
        check_vma=False,
    ))
    chunk_jit = jax.jit(jax.shard_map(
        chunk_fn, mesh=mesh,
        in_specs=spec_tab + (P(None),) * 7,
        out_specs=spec_tab + (P(None), P(None)),
        check_vma=False,
    ), donate_argnums=(0, 1, 2))
    return init_jit, chunk_jit, goal_owner_np


def _make_sharded_walk_packed(st: _Static, mesh: Mesh, ndev: int):
    C = st.C
    Cmask = np.uint32(C - 1)
    parmask = np.int32((1 << st.nb) - 1)

    def device_fn(t_key, t_best, t_closed, start):
        tmax = int(st.final_np.sum())
        rs = jnp.arange(st.max_probes, dtype=jnp.uint32)
        offs = (rs * (rs + jnp.uint32(1))) >> 1

        def lookup(coord):
            key = _pack_keys(coord[None, :], st.W)[0]
            h0 = _hash_keys(key[None, :])[0]
            slots = ((h0 + offs) & Cmask).astype(jnp.int32)
            k_at = t_key[slots]  # (R, KW)
            hits = jnp.all(k_at[:, : st.W] == key[None, :], axis=1) & (
                k_at[:, 0] != _EMPTY_WORD
            )
            found = jnp.any(hits)
            slot = slots[jnp.argmax(hits)]
            val = jnp.where(found, t_best[slot] & parmask, 0)
            # owner shard answers; psum broadcasts to everyone
            val = jax.lax.psum(val, AXIS)
            found = jax.lax.psum(found.astype(jnp.int32), AXIS) > 0
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
            scan_body, (start, False), None, length=tmax
        )
        return masks, coord_fin

    spec_tab = (P(AXIS), P(AXIS), P(AXIS))
    fn = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=spec_tab + (P(None),),
        out_specs=(P(None), P(None)),
        check_vma=False,
    )
    return jax.jit(fn)


def _make_sharded_run(st: _Static, mesh: Mesh, ndev: int, hash_type: str, hash_shift: int):
    own = owner_fn(hash_type, ndev, hash_shift)
    root_owner = int(own(np.zeros((1, st.n), dtype=np.int32))[0])
    goal_owner_np = int(own(st.final_np[None, :])[0])
    root_h = None  # filled by caller closure via init args

    def init_fn(root_h_arr):
        dev = jax.lax.axis_index(AXIS)
        C, W = st.C, st.W
        t_key = jnp.full((C, W), _EMPTY_WORD, dtype=jnp.uint32)
        t_g = jnp.full((C,), INF, dtype=jnp.int32)
        t_f = jnp.full((C,), INF, dtype=jnp.int32)
        t_par = jnp.zeros((C,), dtype=jnp.int32)
        t_state = jnp.zeros((C,), dtype=jnp.int32)

        # place the root on its owner shard
        root = jnp.zeros((1, st.n), dtype=jnp.int32)
        rkey = _pack_keys(root, W)[0]
        slot = (_hash_keys(rkey[None, :])[0] & np.uint32(C - 1)).astype(jnp.int32)
        is_owner = dev == root_owner
        wslot = jnp.where(is_owner, slot, C)
        t_key = t_key.at[wslot].set(rkey, mode="drop")
        t_g = t_g.at[wslot].set(0, mode="drop")
        t_f = t_f.at[wslot].set(root_h_arr[0], mode="drop")
        t_par = t_par.at[wslot].set((1 << st.n) - 1, mode="drop")
        t_state = t_state.at[wslot].set(1, mode="drop")
        return t_key, t_g, t_f, t_par, t_state

    def chunk_fn(t_key, t_g, t_f, t_par, t_state, counters, shard_ctr,
                 chunk_steps, ub, htab, henc, tri8):
        tab = (t_key, t_g, t_f, t_par, t_state)
        goal0, steps0 = counters[0], counters[2]
        exp0, reop0, migr0 = shard_ctr[0], shard_ctr[1], shard_ctr[4]
        me = jax.lax.axis_index(AXIS)

        claim0 = jnp.full((st.C,), np.uint32(0xFFFFFFFF), dtype=jnp.uint32)

        def cond(carry):
            _, _, goal_g, fmin_g, thr, steps, _, _, _, _, ovf, local = carry
            return (fmin_g < goal_g) & (local < chunk_steps[0]) & (ovf == 0)

        def body(carry):
            tab, claim, goal_g, fmin_g, thr, steps, expanded, reopen, n_open, migr, ovf, local = carry
            tab, coords, g, par, f_par, active, fmin_l, n_open_l, n_sel = _select(st, tab, goal_g, thr)
            keys, g_c, f_c, mask_c, valid, is_goal, child, _ = _expand(
                st, coords, g, par, active, f_par, htab, henc, tri8=tri8
            )
            valid = valid & (f_c <= ub[0])  # admissible UB pruning
            goal_l = jnp.min(jnp.where(is_goal, g_c, INF))
            migr_ct = jnp.sum(valid & (own(child) != me))
            rk, rg, rf, rm, rvalid = _route(
                st, ndev, own, child, keys, g_c, f_c, mask_c, valid
            )
            tab, reopen_ct, ovf_l, claim = _insert(
                st, tab, rk, rg, rf, rm, rvalid,
                claim=claim, step_tag=local.astype(jnp.uint32),
            )
            # global consensus (the two MPI_Allreduce analogues,
            # ref: pastar/PAStar.cpp:502-519); counters stay shard-local for
            # the per-tid stats table (ref: pastar/PAStar.cpp:591-619)
            goal_g = jnp.minimum(goal_g, jax.lax.pmin(goal_l, AXIS))
            fmin_g = jax.lax.pmin(fmin_l, AXIS)
            from ..search.engine import _adapt_thr

            thr = _adapt_thr(thr, jax.lax.psum(n_sel, AXIS), st.B * ndev)
            return (tab, claim, goal_g, fmin_g, thr, steps + 1,
                    expanded + jnp.sum(active),
                    reopen + reopen_ct,
                    n_open_l, migr + migr_ct,
                    ovf + jax.lax.psum(ovf_l, AXIS), local + 1)

        z32 = jnp.asarray(np.int32(0))
        init = (tab, claim0, goal0, z32, z32, steps0, exp0, reop0, z32, migr0,
                z32, z32)
        tab, _, goal_g, fmin_g, thr, steps, expanded, reopen, n_open, migr, ovf, _ = (
            jax.lax.while_loop(cond, body, init)
        )
        closed_ct = jnp.sum(tab[4] == 2).astype(jnp.int32)
        stats = jnp.stack([goal_g, fmin_g, steps, ovf])
        shard_stats = jnp.stack([expanded, reopen, closed_ct, n_open, migr])
        return tab + (stats, shard_stats)

    spec_tab = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
    init_jit = jax.jit(jax.shard_map(
        init_fn, mesh=mesh, in_specs=(P(None),), out_specs=spec_tab,
        check_vma=False,
    ))
    chunk_jit = jax.jit(jax.shard_map(
        chunk_fn, mesh=mesh,
        in_specs=spec_tab + (P(None), P(AXIS), P(None), P(None), P(None),
                             P(None), P(None)),
        out_specs=spec_tab + (P(None), P(AXIS)),
        check_vma=False,
    ), donate_argnums=(0, 1, 2, 3, 4))
    return init_jit, chunk_jit, goal_owner_np


def _make_sharded_walk(st: _Static, mesh: Mesh, ndev: int):
    C = st.C
    Cmask = np.uint32(C - 1)

    def device_fn(t_key, t_g, t_f, t_par, t_state, start):
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
                occupied = k_at[0] != _EMPTY_WORD
                hit = jnp.all(k_at == key) & occupied
                val = jnp.where(hit, t_par[slot], val)
                return r + 1, found | hit, val

            _, found, val = jax.lax.while_loop(
                cond, body, (jnp.int32(0), False, jnp.int32(0))
            )
            # owner shard answers; psum broadcasts to everyone
            val = jax.lax.psum(jnp.where(found, val, 0), AXIS)
            found = jax.lax.psum(found.astype(jnp.int32), AXIS) > 0
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
            scan_body, (start, False), None, length=tmax
        )
        return masks, coord_fin

    spec_tab = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
    fn = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=spec_tab + (P(None),),
        out_specs=(P(None), P(None)),
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedFrontierSearch:
    """Mesh-sharded frontier A* (single-host multi-chip; multi-host via
    jax.distributed uses the same code path)."""

    def __init__(self, problem: Problem, heuristic: Optional[HPairHeuristic] = None,
                 devices=None, hash_type: str = "FZORDER", hash_shift: int = 12,
                 batch: Optional[int] = None, capacity: Optional[int] = None,
                 max_steps: int = 500_000, chunk_steps: int = 256,
                 layout: str = "auto"):
        self.layout_pref = layout
        self.problem = problem
        self.heuristic = heuristic if heuristic is not None else HPairHeuristic.build(problem)
        if getattr(self.heuristic, "cost_scale", 1) != 1:
            raise ValueError(
                "fractional (scaled-cost) triple covers are single-chip "
                "only for now; pass the cherry-cover HTriples or the base "
                "heuristic to the sharded engine")
        if devices is None:
            devices = jax.devices()
        self.devices = list(devices)
        self.ndev = len(self.devices)
        self.mesh = Mesh(np.array(self.devices), (AXIS,))
        me = self.devices[0].client.process_index()
        self.multiprocess = any(d.process_index != me for d in self.devices)
        n = problem.n_seq
        M = (1 << n) - 1
        if batch is None:
            batch = max(64, min(2048, (1 << 18) // M))
        if capacity is None:
            lattice = 1
            for L in problem.final_coord:
                lattice *= int(L) + 1
                if lattice > (1 << 26):
                    break
            per_dev = max(1 << 14, min(1 << 22, lattice * 2 // self.ndev))
            capacity = 1 << (per_dev - 1).bit_length()
        batch = max(16, min(batch, capacity))
        batch = 1 << (batch.bit_length() - 1)  # grouped selection needs B | C
        self.max_steps = max_steps
        self.chunk_steps = chunk_steps
        self.hash_type = hash_type
        self.hash_shift = hash_shift

        # packed-mode eligibility, mirroring the single-chip engine
        from ..core.cost import GAP_EXTENSION as _E, GAP_OPEN as _O
        from ..search.bounds import greedy_upper_bound

        wi = self.heuristic.weight_i
        self.degenerate = bool((wi[~np.eye(n, dtype=bool)] <= 0).any())
        if _O == _E and not self.degenerate:
            beam = 1024 if capacity * self.ndev >= (1 << 22) else 32
            self.ub = greedy_upper_bound(problem, self.heuristic, beam=beam)
        else:
            self.ub = int(INF)

        # triple-wise heuristic upgrade (heuristic/triples.py), replicated
        # across the mesh like the pair tables; deterministic int32 DP, so
        # every process builds identical cubes locally (the compute-and-
        # broadcast alternative the SURVEY sanctions is unnecessary: local
        # redundant build is cheaper than shipping the cube over DCN).
        # calculate_h serves origin/goal from build-time host values, so no
        # per-scalar device fetches ride the jax.distributed slow path.
        if (not self.degenerate
                and getattr(self.heuristic, "triangles", None) is None):
            from ..heuristic.triples import HTriples

            # pin the cube build to a LOCAL mesh device: the mesh may be CPU
            # while the default backend is a (remote) TPU, and cross-platform
            # arrays wedge the multi-process path
            me_idx = self.devices[0].client.process_index()
            local_dev = next(
                (d for d in self.devices if d.process_index == me_idx), None)
            ht = HTriples.build(self.heuristic, device=local_dev)
            if ht is not None:
                self.heuristic = ht

        # f-rebase eligibility (see engine._Static.f0: packed/sig store
        # f - f0 with f0 = pairwise h(root), so only the f spread ub - f0
        # must fit above the n parent-mask bits); large-N fallback to the
        # exact triple h(root) as in the single-chip engine
        from ..search.engine import _rebase_origin

        budget = 1 << (31 - n)
        f0 = _rebase_origin(self.heuristic, n)
        if (self.ub < int(INF) and not (self.ub - f0 + 64) < budget
                and getattr(self.heuristic, "triangles", None)):
            f0 = int(self.heuristic.calculate_h(np.zeros(n, dtype=np.int32)))
        self.packed = (self.ub < int(INF)
                       and (self.ub - f0 + 64) < budget)

        self.st = _Static(problem, self.heuristic, batch, capacity, f0=f0)
        if self.layout_pref != "auto":
            self.layout = self.layout_pref
            if self.layout == "sig" and not (self.packed and self.st.sig_ok):
                raise ValueError("sig layout requires packed eligibility and "
                                 "a sig-encodable lattice")
            if self.layout == "packed" and not self.packed:
                raise ValueError("packed layout requires a finite upper bound")
        else:
            self.layout = ("sig" if self.packed and self.st.sig_ok
                           else "packed" if self.packed else "unpacked")
        if self.layout == "sig":
            self._init, self._chunk, self._goal_owner = _make_sharded_run_sig(
                self.st, self.mesh, self.ndev, hash_type, hash_shift
            )
            self._walk = _make_sharded_walk_sig(self.st, self.mesh, self.ndev)
            self._ntab = 3
        elif self.layout == "packed":
            self._init, self._chunk, self._goal_owner = _make_sharded_run_packed(
                self.st, self.mesh, self.ndev, hash_type, hash_shift
            )
            self._walk = _make_sharded_walk_packed(self.st, self.mesh, self.ndev)
            self._ntab = 3
        else:
            self._init, self._chunk, self._goal_owner = _make_sharded_run(
                self.st, self.mesh, self.ndev, hash_type, hash_shift
            )
            self._walk = _make_sharded_walk(self.st, self.mesh, self.ndev)
            self._ntab = 5

    def _rep(self, x):
        """Host value -> replicated device array valid on this mesh.

        On a multi-process mesh (the multi-host path, the analogue of the
        reference's MPI ranks) a plain jnp.asarray is process-local and
        cannot feed a global-mesh jit; build a fully-replicated global array
        instead.  Every process must pass the same value (as every MPI rank
        passes the same broadcast problem, ref: msa_pastar_main.cpp:97-179).
        """
        x = np.asarray(x)
        if not self.multiprocess:
            return jnp.asarray(x)
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            x, self.mesh, P())

    def _read(self, arr):
        """Replicated device array -> host numpy (multi-process safe)."""
        if not self.multiprocess:
            return np.asarray(arr)
        return np.asarray(arr.addressable_shards[0].data)

    def run(self) -> ShardedSearchResult:
        st = self.st
        root_h = np.array([self.heuristic.calculate_h(np.zeros(st.n, np.int32))],
                          dtype=np.int32)
        ub = self.ub
        if self.degenerate:
            import warnings

            warnings.warn(
                "non-positive Altschul pair weights detected: edge costs "
                "can be negative, so A* optimality is undefined for this "
                "input (the reference has the same limitation)",
                RuntimeWarning, stacklevel=2,
            )
        if self.multiprocess and self.layout == "unpacked":
            raise NotImplementedError(
                "multi-process meshes require the packed/sig engine "
                "(degenerate inputs / O != E are single-process only)")
        tab = self._init(self._rep(root_h))
        counters = self._rep(np.array([INF, 0, 0, 0], dtype=np.int32))
        if self.layout != "unpacked":
            shard_ctr = self._rep(np.zeros((self.ndev, 5), dtype=np.int32))
        else:
            shard_ctr = jnp.asarray(np.zeros(self.ndev * 5, dtype=np.int32))
        ub_dev = self._rep(np.array([ub], dtype=np.int32))
        htab_g = self._rep(np.asarray(
            st.d_tables4 if self.layout != "unpacked" else st.d_tables))
        henc_g = self._rep(np.asarray(st.d_enc))
        tri8_g = (st.d_tri8 if not self.multiprocess
                  else self._rep(np.asarray(st.d_tri8)))
        chunk_now = self.chunk_steps
        nt = self._ntab
        import time as _time
        while True:
            _t0 = _time.perf_counter()
            out = self._chunk(*tab, counters, shard_ctr,
                              self._rep(np.array([chunk_now], dtype=np.int32)),
                              ub_dev, htab_g, henc_g, tri8_g)
            tab, counters, shard_ctr = out[:nt], out[nt], out[nt + 1]
            stats_np = self._read(counters)
            _dt = _time.perf_counter() - _t0
            # keep each dispatch under the remote-worker watchdog
            if _dt > 20 and chunk_now > 8:
                chunk_now = max(8, chunk_now // 2)
            elif _dt < 8 and chunk_now < 4 * self.chunk_steps:
                chunk_now *= 2
            if self.multiprocess:
                # chunk_steps bounds the while_loop's collective count, so
                # every process MUST run the next chunk with the SAME value;
                # per-process wall clocks straddling the thresholds diverge
                # here (observed: gloo deadlock when one rank halves and the
                # other doubles).  Process 0 decides for everyone — the
                # analogue of the reference's rank-0-led consensus
                # (ref: pastar/PAStar.cpp:502-519).
                from jax.experimental import multihost_utils

                chunk_now = int(multihost_utils.broadcast_one_to_all(
                    np.int32(chunk_now)))
            goal_v, fmin_v, steps, ovf = (int(v) for v in stats_np)
            if fmin_v >= goal_v or ovf > 0 or steps >= self.max_steps:
                break
        per_shard = self._read(shard_ctr).reshape(self.ndev, 5)
        expanded = int(per_shard[:, 0].sum())
        reopen = int(per_shard[:, 1].sum())
        n_open = int(per_shard[:, 3].sum())
        if ovf > 0:
            raise RuntimeError(
                f"shard hash table overflow (per-shard capacity {st.C}); "
                f"increase capacity"
            )
        if steps >= self.max_steps and fmin_v < goal_v:
            raise RuntimeError("max_steps exceeded")
        if goal_v >= int(INF):
            raise RuntimeError("open set exhausted without reaching the goal")

        masks, coord_fin = self._walk(*tab, self._rep(st.final_np))
        masks = self._read(masks)
        if not np.all(self._read(coord_fin) == 0):
            raise RuntimeError("distributed backtrace did not reach the origin")

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

        # exact g per path node (the table stores (f<<n)|parent, not g)
        from ..search.backtrace import attach_path_g

        closed = attach_path_g(self.problem, self.heuristic.weight_i, closed,
                               goal_g=goal_v)
        h_goal = self.heuristic.calculate_h(st.final_np)
        return ShardedSearchResult(
            g=goal_v, h=h_goal, f=goal_v + h_goal, closed=closed,
            nodes_expanded=expanded, nodes_reopened=reopen,
            open_size=n_open, steps=steps,
            shard_stats=[tuple(int(v) for v in row) for row in per_shard],
            nodes_migrated=int(per_shard[:, 4].sum()),
        )

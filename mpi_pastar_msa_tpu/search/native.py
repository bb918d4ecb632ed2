"""ctypes wrapper for the native C serial A* engine (native/fast_astar.c).

The native library is the performance-grade host runtime: same semantics as
the Python oracle (and the reference's serial driver, pastar/AStar.cpp:53-104)
at native speed — used for large inputs (kinase-scale) and as the CPU baseline
the TPU engine is benchmarked against.  Builds on first use via gcc.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from ..core.cost import COST_TABLE, GAP_EXTENSION, GAP_GAP, GAP_OPEN
from ..core.problem import Problem
from ..heuristic.hpair import HPairHeuristic

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                    "native", "fast_astar.c")
_LIB = os.path.join(os.path.dirname(_SRC), "libfastastar.so")
_SRC_MT = os.path.join(os.path.dirname(_SRC), "fast_astar_mt.c")
_LIB_MT = os.path.join(os.path.dirname(_SRC), "libfastastar_mt.so")
_lib_handle = None
_lib_mt_handle = None


def _build_lib() -> str:
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["gcc", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
        )
    return _LIB


def _build_lib_mt() -> str:
    newest = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_MT))
    if not os.path.exists(_LIB_MT) or os.path.getmtime(_LIB_MT) < newest:
        subprocess.run(
            ["gcc", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             _SRC_MT, "-o", _LIB_MT],
            check=True,
        )
    return _LIB_MT


def _get_lib():
    global _lib_handle
    if _lib_handle is None:
        lib = ctypes.CDLL(_build_lib())
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.astar_search.restype = ctypes.c_int64
        lib.astar_search.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,            # n, n_pairs, W
            ctypes.POINTER(ctypes.c_uint16),                     # final
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,        # seqs, stride
            i32p,                                                # cost_table
            i32p, i32p, i32p,                                    # pair x/y/w
            i32p, ctypes.c_int,                                  # tables, S
            ctypes.c_int, ctypes.c_int, ctypes.c_int,            # gaps
            ctypes.c_int,                                        # root parenti
            ctypes.c_uint32,                                     # init_cap
            i32p, i32p,                                          # out g/h
            i32p, i32p,                                          # out masks/len
            ctypes.POINTER(ctypes.c_int64),                      # out stats
        ]
        _lib_handle = lib
    return _lib_handle


def _get_lib_mt():
    """Multithreaded HDA* engine (native/fast_astar_mt.c) — the honest
    analogue of the reference's hardware_concurrency() worker pool
    (ref: pastar/PAStar.cpp:643-654)."""
    global _lib_mt_handle
    if _lib_mt_handle is None:
        lib = ctypes.CDLL(_build_lib_mt())
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.astar_search_mt.restype = ctypes.c_int64
        lib.astar_search_mt.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,            # n, n_pairs, W
            ctypes.POINTER(ctypes.c_uint16),                     # final
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,        # seqs, stride
            i32p,                                                # cost_table
            i32p, i32p, i32p,                                    # pair x/y/w
            i32p, ctypes.c_int,                                  # tables, S
            ctypes.c_int, ctypes.c_int, ctypes.c_int,            # gaps
            ctypes.c_int,                                        # root parenti
            ctypes.c_uint32,                                     # init_cap
            ctypes.c_int, ctypes.c_int,                          # threads, shift
            i32p, i32p,                                          # out g/h
            i32p, i32p,                                          # out masks/len
            ctypes.POINTER(ctypes.c_int64),                      # out stats
            ctypes.POINTER(ctypes.c_int64),                      # out per-thread stats
        ]
        _lib_mt_handle = lib
    return _lib_mt_handle


@dataclass
class NativeResult:
    g: int
    h: int
    f: int
    closed: Dict[Tuple[int, ...], Tuple[int, int]]
    nodes_expanded: int
    nodes_reopened: int
    open_size: int
    closed_size: int
    # per-thread (expanded, reopened, closed, open) rows — the reference's
    # per-tid node table (ref: pastar/PAStar.cpp:591-619); one row when serial
    thread_stats: Optional[list] = None


class NativeAStar:
    """threads=1 → serial engine; threads>1 → shared-memory HDA* with
    per-worker open/closed shards and a sum-hash owner function, matching
    the reference's thread architecture (ref: pastar/PAStar.cpp:91-101,
    643-654; pastar/CoordHash.cpp:38-44)."""

    def __init__(self, problem: Problem, heuristic: Optional[HPairHeuristic] = None,
                 init_capacity: int = 1 << 16, threads: int = 1,
                 hash_shift: int = 0):
        self.problem = problem
        self.heuristic = heuristic if heuristic is not None else HPairHeuristic.build(problem)
        self.init_capacity = init_capacity
        self.threads = max(1, int(threads))
        self.hash_shift = hash_shift

    def run(self) -> NativeResult:
        p = self.problem
        h = self.heuristic
        n = p.n_seq
        W = (n + 1) // 2
        pairs = p.pairs()
        P = len(pairs)
        lmax = p.max_length
        S = lmax + 2

        final = p.final_coord.astype(np.uint16)
        enc = p.encoded(lmax + 1)  # (N, Lmax+1) uint8
        cost_tab = np.ascontiguousarray(COST_TABLE, dtype=np.int32)
        px = np.array([x for x, _ in pairs], dtype=np.int32)
        py = np.array([y for _, y in pairs], dtype=np.int32)
        pw = h.pair_weights_i()
        stacked = np.zeros((P, S, S), dtype=np.int32)
        raw = h.stacked_tables()
        stacked[:, : raw.shape[1], : raw.shape[2]] = np.where(raw >= 2**29, 0, raw)

        out_g = np.zeros(1, dtype=np.int32)
        out_h = np.zeros(1, dtype=np.int32)
        max_path = int(final.sum())
        out_masks = np.zeros(max(1, max_path), dtype=np.int32)
        out_len = np.zeros(1, dtype=np.int32)
        out_stats = np.zeros(4, dtype=np.int64)

        lib = _get_lib()

        def ptr(a, t):
            return a.ctypes.data_as(ctypes.POINTER(t))

        enc_c = np.ascontiguousarray(enc)
        tstats = None
        if self.threads > 1:
            mt = _get_lib_mt()
            tstats = np.zeros(4 * self.threads, dtype=np.int64)
            rc = mt.astar_search_mt(
                n, P, W,
                ptr(final, ctypes.c_uint16),
                ptr(enc_c, ctypes.c_uint8), lmax + 1,
                ptr(cost_tab, ctypes.c_int32),
                ptr(px, ctypes.c_int32), ptr(py, ctypes.c_int32), ptr(pw, ctypes.c_int32),
                ptr(stacked, ctypes.c_int32), S,
                GAP_OPEN, GAP_EXTENSION, GAP_GAP,
                p.root_parent_mask,
                self.init_capacity,
                self.threads, self.hash_shift,
                ptr(out_g, ctypes.c_int32), ptr(out_h, ctypes.c_int32),
                ptr(out_masks, ctypes.c_int32), ptr(out_len, ctypes.c_int32),
                ptr(out_stats, ctypes.c_int64), ptr(tstats, ctypes.c_int64),
            )
        else:
            rc = lib.astar_search(
                n, P, W,
                ptr(final, ctypes.c_uint16),
                ptr(enc_c, ctypes.c_uint8), lmax + 1,
                ptr(cost_tab, ctypes.c_int32),
                ptr(px, ctypes.c_int32), ptr(py, ctypes.c_int32), ptr(pw, ctypes.c_int32),
                ptr(stacked, ctypes.c_int32), S,
                GAP_OPEN, GAP_EXTENSION, GAP_GAP,
                p.root_parent_mask,
                self.init_capacity,
                ptr(out_g, ctypes.c_int32), ptr(out_h, ctypes.c_int32),
                ptr(out_masks, ctypes.c_int32), ptr(out_len, ctypes.c_int32),
                ptr(out_stats, ctypes.c_int64),
            )
        if rc == -2:
            raise RuntimeError("open list exhausted without reaching the goal")
        if rc != 0:
            raise RuntimeError(f"native astar failed (rc={rc})")

        # path-only closed dict for the backtrace renderer
        closed: Dict[Tuple[int, ...], Tuple[int, int]] = {}
        coord = tuple(int(v) for v in final)
        for mv in out_masks[: int(out_len[0])]:
            mv = int(mv)
            closed[coord] = (0, mv)
            coord = tuple(coord[i] - ((mv >> i) & 1) for i in range(n))

        if tstats is not None:
            # C rows are (expanded, reopened, open, closed); reorder to the
            # CLI's (expanded, reopened, closed, open) row convention
            rows = [(int(tstats[4 * t]), int(tstats[4 * t + 1]),
                     int(tstats[4 * t + 3]), int(tstats[4 * t + 2]))
                    for t in range(self.threads)]
        else:
            rows = [(int(out_stats[0]), int(out_stats[1]),
                     int(out_stats[3]), int(out_stats[2]))]
        return NativeResult(
            g=int(out_g[0]), h=int(out_h[0]), f=int(out_g[0]) + int(out_h[0]),
            closed=closed,
            nodes_expanded=int(out_stats[0]), nodes_reopened=int(out_stats[1]),
            open_size=int(out_stats[2]), closed_size=int(out_stats[3]),
            thread_stats=rows,
        )

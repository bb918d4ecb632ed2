"""Work partitioning: coordinate -> owner-shard hash functions.

Vectorised re-implementations of the reference's four owner-hash strategies
(ref: pastar/CoordHash.cpp:26-166, pastar/include/Coord.h:29):

  FZORDER  full Z-order    interleave the bits of all N dims starting at bit
                           Shift/N, keep log2(size)+Shift%N+1 bits, then
                           ``(hash >> Shift%N) % size``
  PZORDER  partial Z-order same but over the first two dims only
  FSUM     full sum        ``(sum(coords) >> Shift) % size``
  PSUM     partial sum     ``((c0+c1) >> Shift) % size``

Every state is owned by exactly one of ``size`` global shards — the HDA*
ownership discipline that decides intra- vs inter-device routing
(ref: pastar/PAStar.cpp:366-394).  Implementations are pure uint32 bit-math,
usable on NumPy arrays and inside jitted JAX code alike.

Quirk preserved: the reference computes ``bits = log2(size) + Shift%N + 1``
with C's double->int truncation and writes bit positions 0..bits inclusive
(loop condition ``bit_to_write <= total``), i.e. bits+1 positions.
"""
from __future__ import annotations

import math
from typing import Union

import numpy as np

HASH_SHIFT_DEFAULT = 12  # ref: pastar/include/CoordHash.h:9-12
HASH_TYPES = ("FZORDER", "PZORDER", "FSUM", "PSUM")

Array = Union[np.ndarray, "jax.Array"]  # noqa: F821


def _xp(coords):
    """Pick numpy-compatible namespace for the input array."""
    if isinstance(coords, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def sum_hash(coords: Array, size: int, shift: int) -> Array:
    """(sum >> shift) % size (ref: pastar/CoordHash.cpp:27-44)."""
    xp = _xp(coords)
    s = coords.astype(xp.uint32).sum(axis=-1)
    return ((s >> xp.uint32(shift)) % xp.uint32(size)).astype(xp.int32)


def part_sum_hash(coords: Array, size: int, shift: int) -> Array:
    """((c0 + c1) >> shift) % size (ref: pastar/CoordHash.cpp:46-61)."""
    xp = _xp(coords)
    s = coords[..., 0].astype(xp.uint32) + coords[..., 1].astype(xp.uint32)
    return ((s >> xp.uint32(shift)) % xp.uint32(size)).astype(xp.int32)


def _z_order(coords: Array, size: int, shift: int, ndims: int) -> Array:
    """Shared Z-order machinery for the full / partial variants
    (ref: pastar/CoordHash.cpp:105-166)."""
    xp = _xp(coords)
    # C: unsigned bits = log2(size) + (Shift % ndims) + 1  (double -> trunc)
    bits = int(math.log2(size)) + (shift % ndims) + 1
    n_writes = min(bits + 1, 32)  # loop writes positions 0..bits inclusive
    bit_to_read0 = shift // ndims

    h = xp.zeros(coords.shape[:-1], dtype=xp.uint32)
    for w in range(n_writes):
        j = w % ndims
        br = bit_to_read0 + w // ndims
        bit = (coords[..., j].astype(xp.uint32) >> xp.uint32(br)) & xp.uint32(1)
        h = h | (bit << xp.uint32(w))
    return ((h >> xp.uint32(shift % ndims)) % xp.uint32(size)).astype(xp.int32)


def z_order_hash(coords: Array, size: int, shift: int) -> Array:
    n = coords.shape[-1]
    return _z_order(coords, size, shift, n)


def part_z_order_hash(coords: Array, size: int, shift: int) -> Array:
    return _z_order(coords, size, shift, 2)


def owner_fn(hash_type: str, size: int, shift: int = HASH_SHIFT_DEFAULT):
    """Return a vectorised coords(...,N) -> owner shard id function
    (the TPU analogue of Coord::get_id, ref: pastar/CoordHash.cpp:191-245)."""
    ht = hash_type.upper()
    if ht == "FSUM":
        return lambda c: sum_hash(c, size, shift)
    if ht == "PSUM":
        return lambda c: part_sum_hash(c, size, shift)
    if ht == "FZORDER":
        return lambda c: z_order_hash(c, size, shift)
    if ht == "PZORDER":
        return lambda c: part_z_order_hash(c, size, shift)
    raise ValueError(f"unknown hash type {hash_type!r}; expected one of {HASH_TYPES}")

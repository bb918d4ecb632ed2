"""Owner-hash partitioning tests: cross-checked against a direct scalar
transcription of the reference's CoordHash semantics."""
import math
import random

import numpy as np

from mpi_pastar_msa_tpu.parallel.partition import (
    owner_fn,
    part_sum_hash,
    part_z_order_hash,
    sum_hash,
    z_order_hash,
)


def _ref_z_order_scalar(coord, size, shift, ndims):
    """Scalar oracle mirroring pastar/CoordHash.cpp:105-166."""
    h = 0
    bit_to_read = shift // ndims
    bits = int(math.log2(size)) + (shift % ndims) + 1
    total = (1 << bits) & 0xFFFFFFFF
    if total == 0:
        total = 0xFFFFFFFF
    bit_to_write = 1
    while bit_to_write <= total:
        for j in range(ndims):
            if bit_to_write > total:
                break
            if coord[j] & (1 << bit_to_read):
                h |= bit_to_write
            bit_to_write <<= 1
        bit_to_read += 1
    return (h >> (shift % ndims)) % size


class TestSumHashes:
    def test_sum(self):
        c = np.array([[1, 2, 3], [1000, 2000, 3000]], dtype=np.int32)
        np.testing.assert_array_equal(
            sum_hash(c, 7, 0), np.array([6 % 7, 6000 % 7], dtype=np.int32)
        )
        np.testing.assert_array_equal(
            sum_hash(c, 5, 2), np.array([(6 >> 2) % 5, (6000 >> 2) % 5], dtype=np.int32)
        )

    def test_part_sum(self):
        c = np.array([[10, 20, 99]], dtype=np.int32)
        assert part_sum_hash(c, 8, 1)[0] == ((30 >> 1) % 8)


class TestZOrder:
    def test_matches_scalar_oracle(self):
        random.seed(3)
        for ndims in (3, 5, 8):
            for size in (4, 8, 16, 48):
                for shift in (0, 1, 5, 12):
                    coords = np.array(
                        [[random.randint(0, 300) for _ in range(ndims)] for _ in range(64)],
                        dtype=np.int32,
                    )
                    got = z_order_hash(coords, size, shift)
                    want = [_ref_z_order_scalar(c, size, shift, ndims) for c in coords]
                    np.testing.assert_array_equal(got, np.array(want, dtype=np.int32))

    def test_partial_matches_scalar_oracle(self):
        random.seed(4)
        coords = np.array(
            [[random.randint(0, 500) for _ in range(5)] for _ in range(64)], dtype=np.int32
        )
        for size in (4, 16):
            for shift in (0, 3, 12):
                got = part_z_order_hash(coords, size, shift)
                want = [_ref_z_order_scalar(c, size, shift, 2) for c in coords]
                np.testing.assert_array_equal(got, np.array(want, dtype=np.int32))


class TestOwnerFn:
    def test_all_types_in_range(self):
        random.seed(5)
        coords = np.array(
            [[random.randint(0, 400) for _ in range(4)] for _ in range(256)], dtype=np.int32
        )
        for ht in ("FZORDER", "PZORDER", "FSUM", "PSUM"):
            owners = owner_fn(ht, 8, 12)(coords)
            assert owners.min() >= 0 and owners.max() < 8

    def test_jax_agrees_with_numpy(self):
        import jax.numpy as jnp

        random.seed(6)
        coords = np.array(
            [[random.randint(0, 400) for _ in range(4)] for _ in range(64)], dtype=np.int32
        )
        for ht in ("FZORDER", "FSUM"):
            f = owner_fn(ht, 16, 12)
            np.testing.assert_array_equal(np.asarray(f(jnp.asarray(coords))), f(coords))

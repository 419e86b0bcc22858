"""Okapi BM25 scoring kernel — float32-exact port of the reference semantics.

Reference behavior (reimplemented, not copied):
``lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java``
- idf    = (float) ln(1 + (docCount - docFreq + 0.5) / (docFreq + 0.5))   (:70-72)
- avgdl  = (float) (sumTotalTermFreq / (double) docCount)                 (:80-82)
- cache[n] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[n] / avgdl))          (:188-191)
- score  = weight - weight / (1 + freq * cache[norm]), weight = boost*idf (:222-235)

Everything is carried in float32 exactly as the Java code does (Java float
arithmetic == numpy float32 arithmetic: both are IEEE-754 binary32 with
round-to-nearest-even). A float64 variant is provided for the DuckDB
oracle comparisons, where the SQL side computes in double precision.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .smallfloat import LENGTH_TABLE

K1_DEFAULT = np.float32(1.2)
B_DEFAULT = np.float32(0.75)


def idf(doc_freq: int, doc_count: int) -> np.float32:
    """float32 idf — ln(1 + (N - n + 0.5)/(n + 0.5)) computed in double, cast."""
    return np.float32(np.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))


def avg_field_length(sum_total_term_freq: int, doc_count: int) -> np.float32:
    return np.float32(sum_total_term_freq / float(doc_count))


def norm_inverse_cache(avgdl: np.float32, k1=K1_DEFAULT, b=B_DEFAULT) -> np.ndarray:
    """256-entry float32 cache of 1 / (k1 * ((1-b) + b * dl / avgdl)).

    Mirrors the operation order of the Java loop so every intermediate
    rounds identically: b * LENGTH_TABLE[i] is float32 * float32, the
    divide by avgdl is float32, etc.
    """
    k1 = np.float32(k1)
    b = np.float32(b)
    one = np.float32(1.0)
    lt = LENGTH_TABLE.astype(np.float32)
    denom = k1 * ((one - b) + (b * lt) / np.float32(avgdl))
    return (one / denom).astype(np.float32)


@dataclass(frozen=True)
class TermWeight:
    """Per-term query-time scoring state (the reference's BM25Scorer)."""

    term: str
    doc_freq: int
    weight: np.float32          # boost * idf, float32
    cache: np.ndarray           # shared 256-float32 norm-inverse cache

    def score(self, freq: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        """Vectorized float32: weight - weight / (1 + freq * cache[norm])."""
        w = np.float32(self.weight)
        ni = self.cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        f = np.asarray(freq, dtype=np.float32)
        return (w - w / (np.float32(1.0) + f * ni)).astype(np.float32)

    def max_score(self, impact_freqs, impact_norms) -> np.float32:
        """Block-max score from a competitive-impact skyline."""
        if len(impact_freqs) == 0:
            return np.float32(0.0)
        return np.float32(np.max(self.score(np.asarray(impact_freqs), np.asarray(impact_norms))))


def make_term_weight(term, doc_freq, doc_count, sum_ttf, boost=1.0,
                     k1=K1_DEFAULT, b=B_DEFAULT) -> TermWeight:
    avgdl = avg_field_length(sum_ttf, doc_count)
    w = np.float32(np.float32(boost) * idf(doc_freq, doc_count))
    return TermWeight(term=term, doc_freq=doc_freq, weight=w,
                      cache=norm_inverse_cache(avgdl, k1, b))


# ---------------------------------------------------------------------------
# float64 variant — matches what a SQL engine (DuckDB) computes in DOUBLE.
# Used only for the driver's DuckDB-oracle-gated queries; the Lucene
# fidelity path above stays float32.
# ---------------------------------------------------------------------------

def score_f64(freq, norm_decoded_len, doc_freq, doc_count, avgdl,
              k1=1.2, b=0.75):
    """Double-precision BM25 on the *decoded* (quantized) doc length.

    idf = ln(1 + (N - n + 0.5)/(n + 0.5))
    score = idf * f / (f + k1 * (1 - b + b * dl / avgdl))
    (algebraically identical to the reference form; in float64 the
    difference from the rewritten form is below the comparison rounding)
    """
    f = np.asarray(freq, dtype=np.float64)
    dl = np.asarray(norm_decoded_len, dtype=np.float64)
    w = np.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))
    return w * f / (f + k1 * (1.0 - b + b * dl / avgdl))

"""Competitive impacts — per-block (freq, norm) skyline for block-max pruning.

Reimplements the semantics of
`codecs/CompetitiveImpactAccumulator.java:71-117`: keep the pareto
frontier of (freq, norm) pairs such that no retained pair is dominated by
another with freq' >= freq and unsigned(norm') <= unsigned(norm) — a
smaller norm byte decodes to a shorter document, which can only score
higher at equal freq, so dominated pairs can never be the block max.
"""

from __future__ import annotations

import numpy as np


def skyline(freqs: np.ndarray, norms: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """→ (freqs, norms) of the competitive frontier, sorted by norm asc.

    For each distinct norm keep the max freq, then sweep norms ascending
    keeping only pairs with strictly increasing freq.
    """
    f = np.asarray(freqs, dtype=np.int64)
    n = np.asarray(norms, dtype=np.int64) & 0xFF
    if len(f) == 0:
        return f, n
    order = np.lexsort((-f, n))  # norm asc, freq desc within norm
    n_s, f_s = n[order], f[order]
    first = np.ones(len(n_s), dtype=bool)
    first[1:] = n_s[1:] != n_s[:-1]
    n_u, f_u = n_s[first], f_s[first]
    keep_f = np.maximum.accumulate(f_u)
    keep = np.ones(len(f_u), dtype=bool)
    keep[1:] = f_u[1:] > keep_f[:-1]
    return f_u[keep], n_u[keep]


def dominates(sky_f: np.ndarray, sky_n: np.ndarray, freqs, norms) -> bool:
    """CheckIndex-style invariant: every actual (freq, norm) in the block is
    dominated by (or equal to) some skyline pair."""
    f = np.asarray(freqs, dtype=np.int64)
    n = np.asarray(norms, dtype=np.int64) & 0xFF
    for fi, ni in zip(f, n):
        if not np.any((sky_f >= fi) & (sky_n <= ni)):
            return False
    return True

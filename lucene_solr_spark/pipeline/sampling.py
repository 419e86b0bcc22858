"""Deterministic stratified sampling — training-mix construction.

A 100-TB training pipeline rarely uses a corpus whole: it samples each
stratum (language, domain, quality band) at its own rate to hit a
target mixture (the data-mixture stage of Gopher/LLaMA-style recipes;
see PAPERS.md). Requirements at scale:

* **Deterministic** — the same doc keeps/drops identically on every
  run, on any cluster size, so reshards and retries don't change the
  dataset (no ``rand()``, no seed-per-partition hazards).
* **One pass, no shuffle** — membership is a pure projection per row;
  the only wide operation is whatever aggregation the caller adds.
* **Oracle-checkable** — the hash is md5 (identical hex in Spark and
  DuckDB), so the exact sample is SQL-verifiable.

``hash_frac`` maps a key column to a uniform [0,1) double via the
first 8 hex chars of md5; a row survives when ``frac < rate[stratum]``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_frac(key: Column | str) -> Column:
    """Uniform [0,1) from md5(key) — deterministic, cluster-size-free."""
    c = F.col(key) if isinstance(key, str) else key
    return (F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
            .cast("double") / float(1 << 32))


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      rates: dict[str, float],
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row of stratum ``s`` with probability ``rates[s]``,
    decided by the deterministic hash of ``key_col``. Strata absent
    from ``rates`` use ``default_rate`` (0 = drop, 1 = keep all)."""
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    return df.filter(hash_frac(key_col) < rate)

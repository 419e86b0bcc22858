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


def temperature_rates(counts: dict[str, int], alpha: float,
                      sample_frac: float) -> dict[str, float]:
    """Multinomial temperature-sampling rates (XLM-R §3.1 / mT5 §3.2:
    sample stratum ``s`` with probability ``p_s^alpha / Σ p^alpha``):
    given per-stratum row counts, return per-stratum KEEP rates such
    that the expected output is ``sample_frac × total`` rows mixed by
    the temperature-flattened distribution. ``alpha`` < 1 up-samples
    the tail / down-samples the head; 1 = proportional (plain
    ``sample_frac`` everywhere); 0 = uniform across strata. Rates cap
    at 1.0 — a tail stratum whose target exceeds its size keeps
    everything (the standard without-replacement compromise; the
    reference recipes resample WITH replacement at the batch sampler,
    which a deterministic corpus filter cannot)."""
    if not counts:
        return {}
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    total = float(sum(counts.values()))
    wsum = sum(c ** alpha for c in counts.values() if c > 0)
    out = {}
    for s, c in counts.items():
        if c <= 0:
            out[s] = 0.0
            continue
        target = sample_frac * total * (c ** alpha) / wsum
        out[s] = min(1.0, target / c)
    return out


def temperature_sample(df: DataFrame, key_col: str, strata_col: str,
                       alpha: float = 0.7,
                       sample_frac: float = 0.5) -> DataFrame:
    """Temperature-mixed deterministic sample: ONE tiny aggregate for
    the per-stratum counts (collected — one row per stratum, the only
    driver traffic), rates via ``temperature_rates``, membership via
    the same md5 ``hash_frac`` projection as ``stratified_sample`` —
    reshard-invariant and SQL-verifiable at any scale."""
    counts = {r[0]: r[1] for r in
              df.groupBy(strata_col).count().collect()}
    rates = temperature_rates(counts, alpha, sample_frac)
    return stratified_sample(df, key_col, strata_col, rates)


def token_budget_cut(df: DataFrame, budgets: dict[str, float],
                     default_budget: float = 0.0,
                     key_col: str = "doc_id", strata_col: str = "source",
                     tokens_col: str = "n_tok") -> DataFrame:
    """Exact per-stratum TOKEN budget — the final trim of a training
    mixture (Dolma/GPT-3-style recipes quote mixes in tokens, not
    docs; see PAPERS.md): docs are ordered by the deterministic md5
    hash of ``key_col`` (a reshard-stable pseudo-random shuffle, ties
    → key), and each stratum keeps the prefix whose RUNNING token
    total fits its budget — a doc survives iff the cumulative sum
    INCLUDING it is within budget. Adds ``cum_tokens``.

    Scale posture: the running sum is a window partitioned by stratum,
    so each stratum sorts in one task — right for the final trim,
    where stratified_sample/temperature_sample (pure projections, no
    shuffle) have already cut volume to the target's neighborhood and
    per-stratum rows are bounded. For the raw-corpus stage use those
    rate-based samplers; exactness only matters at the end.
    """
    from pyspark.sql import Window
    w = (Window.partitionBy(strata_col)
         .orderBy(hash_frac(key_col).asc(), F.col(key_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    budget = F.lit(float(default_budget))
    for k, v in sorted(budgets.items()):
        budget = (F.when(F.col(strata_col) == k, F.lit(float(v)))
                  .otherwise(budget))
    return (df.withColumn("cum_tokens",
                          F.sum(F.col(tokens_col).cast("long")).over(w))
            .filter(F.col("cum_tokens") <= budget))

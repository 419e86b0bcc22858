"""URL canonicalization + URL-level dedup for web corpora.

Web-crawl pipelines dedup by canonical URL before any content-level
pass (CCNet §3.1 keeps one copy per URL; Dolma's web pipeline
normalizes URLs the same way) — it is the cheapest dedup there is:
a pure string projection plus one aggregation, no content hashing.

Canonicalization rules (the common subset of RFC 3986 §6 syntax-based
normalization and what crawl pipelines apply):

* strip the fragment (``#…``),
* lowercase the scheme and the host,
* drop a leading ``www.`` host label,
* drop the default port (``:80`` for http, ``:443`` for https),
* strip trailing slashes from the path (empty path → ``/``),
* drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``) and sort the surviving query parameters.

Everything is built from ``pyspark.sql.functions`` string/array
primitives — the whole canonical form is ONE codegen projection fused
with the scan; the dedup is ONE map-side-combined aggregation on the
canonical string. At 100 TB the shuffle moves one short string + one
(quality, id) struct per document: there is no smaller dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: parameters dropped before sorting — tracking/click identifiers only
TRACKING_PARAM_RX = "^(utm_[^=]*|fbclid|gclid|msclkid)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` as a single codegen Column (no UDF)."""
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    hostport = F.regexp_replace(
        F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1)), r"^www\.", "")
    host = (F.when(scheme == "http",
                   F.regexp_replace(hostport, ":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(hostport, ":443$", ""))
            .otherwise(hostport))
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    raw_path = F.when(pathq.contains("?"),
                      F.regexp_extract(pathq, r"^([^?]*)", 1)).otherwise(pathq)
    stripped = F.regexp_replace(raw_path, "/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    qs = F.when(pathq.contains("?"),
                F.regexp_replace(pathq, r"^[^?]*\?", "")).otherwise(F.lit(""))
    params = F.array_sort(F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RX)))
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(F.size(params) > 0,
               F.concat(F.lit("?"), F.array_join(params, "&")))
        .otherwise(F.lit("")))


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id",
              quality_col: str | None = None) -> DataFrame:
    """Group by canonical URL; keep-best representative per group
    (highest ``quality_col``, ties → lowest ``id_col``; with no quality
    column, lowest id = keep-first). Returns one row per canonical URL:
    (canonical_url, rep_id, n_dups)."""
    canon = df.select(canonicalize_url(F.col(url_col)).alias("canonical_url"),
                      F.col(id_col).alias("_id"),
                      (F.col(quality_col) if quality_col is not None
                       else F.lit(0)).cast("double").alias("_q"))
    best = F.min(F.struct((-F.col("_q")).alias("nq"),
                          F.col("_id").alias("id")))
    return (canon.groupBy("canonical_url")
            .agg(best.alias("_best"), F.count(F.lit(1)).alias("n_dups"))
            .select("canonical_url", F.col("_best.id").alias("rep_id"),
                    F.col("n_dups").cast("long")))


def url_dedup_assign(df: DataFrame, url_col: str = "url",
                     id_col: str = "doc_id",
                     quality_col: str | None = None) -> DataFrame:
    """Full assignment variant: every input row tagged with its
    canonical URL, the group representative, and ``is_duplicate`` —
    the shape the tombstone writer consumes (one broadcast-joinable
    (canonical_url → rep_id) table against the canonical projection)."""
    reps = url_dedup(df, url_col, id_col, quality_col)
    canon = df.withColumn("canonical_url",
                          canonicalize_url(F.col(url_col)))
    return (canon.join(reps.select("canonical_url", "rep_id"),
                       "canonical_url")
            .withColumn("is_duplicate", F.col(id_col) != F.col("rep_id")))

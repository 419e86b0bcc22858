"""Index-time sort + sorted-index early termination.

Reference semantics:
- `index/IndexWriterConfig.java:484` ``setIndexSort``: segments are
  written with docIDs laid out in sort-key order, recorded in segment
  metadata.
- `search/TopFieldCollector.java:42` (canEarlyTerminate): when the
  query sort is a prefix of the index sort, collection STOPS after k
  competitive docs — the dominant production trick for
  sort-by-time/field top-k at scale, because it reads k dense rows
  instead of heaping the full match set.

Spark-first restatement: the "sorted segment" is a docvalues
generation written ``repartitionByRange(key).sortWithinPartitions
(key, doc_id)`` so the Parquet row-group/file statistics ARE the sort
metadata, plus a manifest recording the sort key and a ladder of key
cut points (approximate quantiles) with cumulative row counts. An
early-terminated top-k then:

1. walks the ladder to the smallest prefix expected to hold k matches,
2. scans ONLY ``key <= cut`` (a pushed range predicate — row-group and
   file pruning, the BKD/segment-skip analog),
3. semi-joins the match set and checks it found k matches STRICTLY
   inside the prefix (ties at the cut boundary can straddle it, so the
   guarantee needs ``key < cut``; the reference's collector has the
   same competitive-tie guard),
4. on success sorts just that bounded slice (a TakeOrderedAndProject
   over ≤ prefix rows); otherwise doubles the prefix — geometric, so
   the total work is O(rows needed), never O(match set).

The unsorted fallback (`extras.sort_by_fields`) remains the correct
path for arbitrary sorts; this generation accelerates exactly the
sorts it was built for, as in Lucene.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST = "_SORTED_MANIFEST.json"
DEFAULT_CUTS = 32


def build_sorted_docvalues(spark: SparkSession, docs: DataFrame, path: str,
                           key: str, n_partitions: int | None = None,
                           cuts: int = DEFAULT_CUTS) -> dict:
    """Write ``docs`` as a sort-keyed docvalues generation: range-
    partitioned and sorted by (key, doc_id), with the sort recorded in
    a manifest alongside a cut-point ladder. Rows with a NULL key are
    written too (they sort last and are served by the fallback scan).
    Returns the manifest dict."""
    n = n_partitions or max(4, spark.sparkContext.defaultParallelism)
    (docs.repartitionByRange(n, F.col(key), F.col("doc_id"))
     .sortWithinPartitions(key, "doc_id")
     .write.mode("overwrite").parquet(f"{path}/docvalues"))
    written = spark.read.parquet(f"{path}/docvalues")
    nonnull = written.filter(F.col(key).isNotNull())
    total = nonnull.count()
    qs = [i / cuts for i in range(1, cuts + 1)]
    cut_vals = (nonnull.agg(F.expr(
        f"approx_percentile({key}, array({', '.join(map(str, qs))}), 10000)"
    ).alias("c")).collect()[0]["c"])
    integral = dict(written.dtypes)[key] in ("tinyint", "smallint", "int",
                                             "bigint")
    ladder = []
    seen = set()
    for v in cut_vals:
        # keep the key's NATIVE type: a float cut against an integral
        # column makes Catalyst cast the COLUMN to double, which blocks
        # Parquet predicate pushdown — the whole point of the layout
        v = int(v) if integral else float(v)
        if v in seen:
            continue
        seen.add(v)
        rows = nonnull.filter(F.col(key) <= v).count()
        ladder.append({"cut": v, "rows": rows})
    manifest = {"key": key, "total_rows": written.count(),
                "nonnull_rows": total, "ladder": ladder}
    with open(os.path.join(path, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


class SortedDocValues:
    """A loaded sorted-docvalues generation; ``topk`` is the
    early-terminated TopFieldCollector analog."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, MANIFEST)) as fh:
            self.manifest = json.load(fh)
        self.key = self.manifest["key"]

    def _scan(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/docvalues")

    def topk_after(self, matches: DataFrame, k: int,
                   after: tuple, ascending: bool = True) -> DataFrame:
        """CursorMark / searchAfter over the INDEX sort
        (solr/search/CursorMark.java over setIndexSort): ``after`` is
        the last (key, doc_id) of the previous page; the after-cursor
        predicate is sargable against the sorted layout, so page N
        costs the same bounded prefix walk as page 1 — deep paging
        never re-sorts or re-skips the full match set."""
        ak, ad = after
        key = F.col(self.key)
        if ascending:
            pred = (key > ak) | ((key == ak) & (F.col("doc_id") > ad))
        else:
            pred = (key < ak) | ((key == ak) & (F.col("doc_id") > ad))
        return self.topk(matches, k, ascending=ascending, extra_pred=pred)

    def topk(self, matches: DataFrame, k: int, ascending: bool = True,
             extra_pred=None) -> DataFrame:
        """Top-k matched docs by the INDEX sort key (tie: doc_id asc) →
        the matched rows with all docvalue columns. ``matches`` is a
        doc_id DataFrame (e.g. ``searcher.match_docs(q)``).

        Ascending sorts walk the cut ladder from the bottom; descending
        from the top (prefix = ``key >= cut``). Every probe is a pushed
        key-range scan + semi-join; the final sort runs on the bounded
        slice only."""
        key = self.key
        m = matches.select("doc_id").distinct()
        order = [F.asc_nulls_last(key) if ascending
                 else F.desc_nulls_last(key), F.asc("doc_id")]
        steps = (self.manifest["ladder"] if ascending
                 else list(reversed(self.manifest["ladder"])))
        i = 0
        while i < len(steps):           # geometric ladder walk: 0,1,3,7,…
            cut = steps[i]["cut"]
            rng = (F.col(key) <= cut) if ascending else (F.col(key) >= cut)
            strict = (F.col(key) < cut) if ascending else (F.col(key) > cut)
            sl = self._scan().filter(rng)
            if extra_pred is not None:
                sl = sl.filter(extra_pred)
            hits = sl.join(m, "doc_id", "left_semi")
            # boundary-tie guard: k matches strictly inside the cut, so
            # no doc outside the slice can be competitive
            if hits.filter(strict).count() >= k:
                return hits.orderBy(*order).limit(k)
            i = 2 * i + 1
        # fallback: not enough matches inside any prefix (or null keys
        # needed) — full scan, still one TakeOrderedAndProject
        sl = self._scan()
        if extra_pred is not None:
            sl = sl.filter(extra_pred)
        hits = sl.join(m, "doc_id", "left_semi")
        return hits.orderBy(*order).limit(k)

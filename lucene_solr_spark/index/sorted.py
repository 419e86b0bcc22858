"""Index-time sort + sorted-index early termination.

Reference semantics:
- `index/IndexWriterConfig.java:484` ``setIndexSort``: segments are
  written with docIDs laid out in sort-key order (ONE OR MORE
  SortFields — compound sorts like (tenant, -timestamp) are the
  production norm), recorded in segment metadata.
- `search/TopFieldCollector.java:42` (canEarlyTerminate): when the
  query sort is a PREFIX of the index sort, collection STOPS after k
  competitive docs — the dominant production trick for
  sort-by-time/field top-k at scale, because it reads k dense rows
  instead of heaping the full match set.

Spark-first restatement: the "sorted segment" is a docvalues
generation written ``repartitionByRange(keys…).sortWithinPartitions
(keys…, doc_id)`` so the Parquet row-group/file statistics ARE the
sort metadata, plus a manifest recording the sort keys and a ladder of
PRIMARY-key cut points (approximate quantiles) with cumulative row
counts — the leading key alone drives pruning, exactly as Lucene's
early termination needs only the sort prefix. An early-terminated
top-k then:

1. walks the ladder to the smallest prefix expected to hold k matches,
2. scans ONLY ``key1 <= cut`` (a pushed range predicate — row-group
   and file pruning, the BKD/segment-skip analog),
3. semi-joins the match set and checks it found k matches STRICTLY
   inside the prefix (ties at the cut boundary can straddle it, so the
   guarantee needs ``key1 < cut``; the reference's collector has the
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
                           key: str | list[str],
                           n_partitions: int | None = None,
                           cuts: int = DEFAULT_CUTS) -> dict:
    """Write ``docs`` as a sort-keyed docvalues generation: range-
    partitioned and sorted by (*keys, doc_id), with the sort recorded
    in a manifest alongside a PRIMARY-key cut-point ladder. ``key`` may
    be one column or a compound list (IndexWriterConfig.setIndexSort
    takes SortField…). Rows with a NULL primary key are written too
    (they sort last and are served by the fallback scan). Returns the
    manifest dict."""
    keys = [key] if isinstance(key, str) else list(key)
    if not keys:
        raise ValueError("at least one sort key required")
    primary = keys[0]
    n = n_partitions or max(4, spark.sparkContext.defaultParallelism)
    (docs.repartitionByRange(n, *[F.col(c) for c in keys], F.col("doc_id"))
     .sortWithinPartitions(*keys, "doc_id")
     .write.mode("overwrite").parquet(f"{path}/docvalues"))
    written = spark.read.parquet(f"{path}/docvalues")
    nonnull = written.filter(F.col(primary).isNotNull())
    total = nonnull.count()
    ptype = dict(written.dtypes)[primary]
    integral = ptype in ("tinyint", "smallint", "int", "bigint")
    if integral or ptype in ("float", "double") or \
            ptype.startswith("decimal"):
        qs = [i / cuts for i in range(1, cuts + 1)]
        cut_vals = (nonnull.agg(F.expr(
            f"approx_percentile({primary}, "
            f"array({', '.join(map(str, qs))}), 10000)").alias("c"))
            .collect()[0]["c"])
        # keep the key's NATIVE type: a float cut against an integral
        # column makes Catalyst cast the COLUMN to double, which blocks
        # Parquet predicate pushdown — the whole point of the layout
        cut_vals = [int(v) if integral else float(v) for v in cut_vals]
    else:
        # non-numeric primary (approx_percentile can't): the write was
        # a global range sort, so the partition maxima ARE evenly-
        # weighted quantile cuts — one agg, any orderable type
        cut_vals = [r["cut"] for r in
                    (nonnull.groupBy(F.spark_partition_id().alias("p"))
                     .agg(F.max(primary).alias("cut"))
                     .orderBy("cut").collect())]
    ladder = []
    seen = set()
    for v in cut_vals:
        if v in seen:
            continue
        seen.add(v)
        rows = nonnull.filter(F.col(primary) <= v).count()
        ladder.append({"cut": v, "rows": rows})
    manifest = {"key": primary, "keys": keys,
                "total_rows": written.count(),
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
        # pre-compound manifests carry only "key"
        self.keys = self.manifest.get("keys", [self.manifest["key"]])
        self.key = self.keys[0]

    def _scan(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/docvalues")

    def _dirs(self, ascending) -> list[bool]:
        if isinstance(ascending, bool):
            return [ascending] * len(self.keys)
        dirs = list(ascending)
        if len(dirs) != len(self.keys):
            raise ValueError(
                f"{len(self.keys)} sort keys need {len(self.keys)} "
                f"directions, got {len(dirs)}")
        return dirs

    def topk_after(self, matches: DataFrame, k: int,
                   after: tuple, ascending=True) -> DataFrame:
        """CursorMark / searchAfter over the INDEX sort
        (solr/search/CursorMark.java over setIndexSort): ``after`` is
        the last (*keys, doc_id) of the previous page; the
        lexicographic after-cursor predicate stays sargable on the
        PRIMARY key, so page N costs the same bounded prefix walk as
        page 1 — deep paging never re-sorts the full match set."""
        dirs = self._dirs(ascending)
        if len(after) != len(self.keys) + 1:
            raise ValueError(
                f"after tuple needs (*{len(self.keys)} keys, doc_id)")
        cols = [F.col(c) for c in self.keys] + [F.col("doc_id")]
        vals = list(after)
        col_dirs = dirs + [True]        # doc_id ties ascend
        # lexicographic strictly-after: OR over the first differing slot
        pred = None
        for i in range(len(cols)):
            eq = None
            for j in range(i):
                e = cols[j] == vals[j]
                eq = e if eq is None else (eq & e)
            gt = cols[i] > vals[i] if col_dirs[i] else cols[i] < vals[i]
            term = gt if eq is None else (eq & gt)
            pred = term if pred is None else (pred | term)
        return self.topk(matches, k, ascending=ascending, extra_pred=pred)

    def topk(self, matches: DataFrame, k: int, ascending=True,
             extra_pred=None) -> DataFrame:
        """Top-k matched docs by the INDEX sort keys (tie: doc_id asc)
        → the matched rows with all docvalue columns. ``matches`` is a
        doc_id DataFrame (e.g. ``searcher.match_docs(q)``).
        ``ascending`` is one bool for all keys or a per-key list; the
        PRIMARY direction drives the ladder walk (secondary keys order
        within a primary value and never affect pruning).

        Ascending primaries walk the cut ladder from the bottom;
        descending from the top (prefix = ``key >= cut``). Every probe
        is a pushed key-range scan + semi-join; the final sort runs on
        the bounded slice only."""
        dirs = self._dirs(ascending)
        primary, p_asc = self.keys[0], dirs[0]
        m = matches.select("doc_id").distinct()
        order = [(F.asc_nulls_last(c) if d else F.desc_nulls_last(c))
                 for c, d in zip(self.keys, dirs)] + [F.asc("doc_id")]
        steps = (self.manifest["ladder"] if p_asc
                 else list(reversed(self.manifest["ladder"])))
        i = 0
        while i < len(steps):           # geometric ladder walk: 0,1,3,7,…
            cut = steps[i]["cut"]
            rng = (F.col(primary) <= cut) if p_asc \
                else (F.col(primary) >= cut)
            strict = (F.col(primary) < cut) if p_asc \
                else (F.col(primary) > cut)
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

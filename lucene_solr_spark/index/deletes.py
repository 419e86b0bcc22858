"""Deletes / live docs — tombstones + expunge, the Lucene deletion model.

Reference semantics (`index/LeafReader.java:227` getLiveDocs,
`index/IndexWriter.java deleteDocuments` → liveDocs bitset,
`IndexWriter.forceMergeDeletes`): a delete only HIDES a document — every
statistic (docFreq, totalTermFreq, norms, docCount, avgdl) keeps
counting it until a merge physically drops it. Scores therefore do NOT
change when a doc is deleted; only the match set shrinks. This module
reproduces exactly that:

- :func:`delete_docs` records tombstones (a small doc_id set). The
  Searcher ships the sorted tombstone array to the kernel, which masks
  those docs out of every match (the liveDocs bitset analog). Like
  Lucene's in-memory liveDocs, the tombstone set is assumed SMALL
  relative to the corpus (bounded by ``MAX_DRIVER_DELETES``); beyond
  that, expunge.
- :func:`expunge_deletes` (forceMergeDeletes analog) rewrites postings
  without the deleted docs and RECOMPUTES dictionary/norms/stats — after
  it, scores reflect the shrunken collection, exactly as after a Lucene
  merge.

A training-data pipeline wires dedup output straight in:
``delete_docs(idx, dedup_result.filter("is_duplicate"))``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .builder import InvertedIndex, POSTINGS_SCHEMA, RAW_SCHEMA, _shuffle_n
from .compact import _unpack_blocks
from .builder import pack_partition

# legacy driver-array bound: a tombstone set at or below this rides the
# kernel spec as a broadcast numpy array (fast, no join); above it the
# per-cell bitmap table takes over automatically — delete_docs no
# longer raises (VERDICT r3 #4)
MAX_DRIVER_DELETES = 2_000_000


def del_table(dels: DataFrame, grid: int) -> DataFrame:
    """Per-grid-cell tombstone table — the liveDocs-FILE analog
    (`index/LeafReader.java:227` getLiveDocs is per-segment; our segment
    is the grid cell): (bucket, del_offsets sorted array<int> of
    in-bucket doc offsets). Co-partitionable with the postings layout on
    ``bucket``, so the kernel masks from a co-located column and the
    driver NEVER materializes doc_ids."""
    return (dels
            .withColumn("bucket", F.expr(f"doc_id div {grid}"))
            .withColumn("off", (F.col("doc_id") % grid).cast("int"))
            .groupBy("bucket")
            .agg(F.sort_array(F.collect_list("off")).alias("del_offsets")))


def _as_doc_df(spark: SparkSession, doc_ids) -> DataFrame:
    if isinstance(doc_ids, DataFrame):
        return doc_ids.select(F.col("doc_id").cast("long")).distinct()
    return spark.createDataFrame([(int(d),) for d in doc_ids],
                                 "doc_id long").distinct()


def _hard_soft(idx):
    """(hard, soft) tombstone DataFrames. Legacy indexes carry only
    ``deletes`` — all hard."""
    soft = getattr(idx, "soft_deletes", None)
    hard = getattr(idx, "hard_deletes", None)
    if hard is None and soft is None:
        hard = getattr(idx, "deletes", None)
    return hard, soft


def _masked_view(spark: SparkSession, idx: InvertedIndex,
                 effective: DataFrame,
                 distributed: bool | None) -> InvertedIndex:
    """Index view whose queries exclude ``effective`` — the carrier
    logic shared by hard and soft deletes.

    Carrier: ≤ MAX_DRIVER_DELETES uses the in-spec sorted array (no
    join per query); above that — a realistic dedup feedback stream on
    a 10%-dup corpus — the per-cell bitmap table (:func:`del_table`)
    is joined to the queried blocks on ``bucket`` instead, so tombstone
    volume never touches the driver. ``distributed=True/False`` forces
    a carrier."""
    out = InvertedIndex(postings=idx.postings, terms=idx.terms,
                        norms=idx.norms, stats=dict(idx.stats),
                        analyzer=idx.analyzer,
                        with_positions=idx.with_positions, raw=idx.raw)
    out.with_offsets = getattr(idx, "with_offsets", False)
    out.with_payloads = getattr(idx, "with_payloads", False)
    out.deletes = effective
    if distributed is None:
        distributed = effective.count() > MAX_DRIVER_DELETES
    if distributed:
        out.deleted_array = None
        out.del_table = del_table(effective,
                                  int(idx.stats["grid"])).persist()
        out.del_table.count()    # pin: one build, not one per query
    else:
        out.del_table = None
        out.deleted_array = np.sort(np.array(
            [r["doc_id"] for r in effective.collect()], dtype=np.int64))
    return out


def delete_docs(spark: SparkSession, idx: InvertedIndex,
                doc_ids, distributed: bool | None = None) -> InvertedIndex:
    """Record HARD tombstones; returns an index view whose queries
    exclude them. ``doc_ids`` is a DataFrame with a doc_id column or an
    iterable of ints. Stats/norms/dictionary are intentionally UNCHANGED
    (IndexWriter semantics: deletes don't affect scoring until merge)."""
    new = _as_doc_df(spark, doc_ids)
    hard, soft = _hard_soft(idx)
    hard = new if hard is None else hard.unionByName(new).distinct()
    eff = hard if soft is None else hard.unionByName(soft).distinct()
    out = _masked_view(spark, idx, eff, distributed)
    out.hard_deletes, out.soft_deletes = hard, soft
    return out


def soft_delete_docs(spark: SparkSession, idx: InvertedIndex,
                     doc_ids, distributed: bool | None = None,
                     soft_delete_field: str = "__soft_deletes"
                     ) -> InvertedIndex:
    """SOFT tombstones (`index/IndexWriterConfig.setSoftDeletesField`,
    `index/SoftDeletesRetentionMergePolicy.java:46`): identical to
    :func:`delete_docs` for every reader opened on the soft-deletes
    field — the docs vanish from every match set and from numDocs
    (:func:`live_doc_count`) while stats/norms/dictionary keep counting
    them (maxDoc retains them) — but :func:`expunge_deletes` can RETAIN
    them physically when they match a retention query, the rollback /
    NRT-history use the reference policy exists for. The marker is
    carried as a tombstone set keyed by ``soft_delete_field`` (the
    reference stores it as a doc-values field; ours lives beside the
    per-cell tombstone tables — same newest-state-wins overlay model as
    index/dv_updates.py)."""
    new = _as_doc_df(spark, doc_ids)
    hard, soft = _hard_soft(idx)
    soft = new if soft is None else soft.unionByName(new).distinct()
    eff = soft if hard is None else hard.unionByName(soft).distinct()
    out = _masked_view(spark, idx, eff, distributed)
    out.hard_deletes, out.soft_deletes = hard, soft
    out.soft_delete_field = soft_delete_field
    return out


def live_doc_count(idx: InvertedIndex) -> int:
    """numDocs() analog: maxDoc-style doc_count minus tombstones."""
    arr = getattr(idx, "deleted_array", None)
    if arr is not None:
        return idx.stats["doc_count"] - len(arr)
    dels = getattr(idx, "deletes", None)
    return idx.stats["doc_count"] - (dels.count() if dels is not None else 0)


def _retained_soft(spark: SparkSession, idx: InvertedIndex,
                   soft: DataFrame, retention) -> DataFrame:
    """Soft-deleted docs matching the retention query
    (`SoftDeletesRetentionMergePolicy.java:118` keepFullyDeletedSegment
    runs the retention query WITHOUT the soft-deletes filter — a
    retained doc is by definition soft-deleted, so the match must see
    it). ``retention`` is a doc_id DataFrame or a query AST evaluated
    on an UNMASKED view of this index."""
    if isinstance(retention, DataFrame):
        keep = retention.select(F.col("doc_id").cast("long")).distinct()
    else:
        from ..search.executor import Searcher
        base = InvertedIndex(postings=idx.postings, terms=idx.terms,
                             norms=idx.norms, stats=dict(idx.stats),
                             analyzer=idx.analyzer,
                             with_positions=idx.with_positions,
                             with_offsets=getattr(idx, "with_offsets",
                                                  False),
                             with_payloads=getattr(idx, "with_payloads",
                                                   False))
        keep = Searcher(spark, base).match_docs(retention).distinct()
    return soft.join(keep, "doc_id", "left_semi")


def expunge_deletes(spark: SparkSession, idx: InvertedIndex,
                    retention=None) -> InvertedIndex:
    """Physically drop tombstoned docs (forceMergeDeletes): unpack →
    filter live → repack, then rebuild dictionary/norms/stats from the
    surviving postings. One bucket-range shuffle, same key as the build.

    ``retention`` (`SoftDeletesRetentionMergePolicy.java:46`): a query
    AST or doc_id DataFrame naming SOFT-deleted docs to KEEP physically
    through the merge. Retained docs stay masked (soft-deleted for
    readers, out of numDocs) but keep contributing to the rebuilt
    df/ttf/doc_count/avgdl — exactly the reference, where a merged
    segment's statistics count every physically-present doc and the
    soft-deletes field keeps hiding them. Hard deletes and
    non-retained soft deletes are dropped as before; with
    ``retention=None`` soft deletes expunge like hard ones (a merge
    with no retention policy)."""
    dels = getattr(idx, "deletes", None)
    if dels is None:
        return idx
    hard, soft = _hard_soft(idx)
    retained = None
    if retention is not None and soft is not None:
        retained = _retained_soft(spark, idx, soft, retention)
        if hard is not None:
            # a doc both hard- and soft-deleted drops: the hard delete
            # clears the liveDocs bit regardless of retention
            retained = retained.join(hard, "doc_id", "left_anti")
        retained = retained.persist()
        if retained.limit(1).count() == 0:
            retained = None
        else:
            dropped_soft = soft.join(retained, "doc_id", "left_anti")
            dels = (dropped_soft if hard is None
                    else hard.unionByName(dropped_soft).distinct())
    with_pos = idx.with_positions
    with_off = getattr(idx, "with_offsets", False)
    with_pay = getattr(idx, "with_payloads", False)
    grid = idx.stats["grid"]
    raw = idx.postings.mapInPandas(
        lambda it: _unpack_blocks(it, with_pos, with_off, with_pay),
        schema=RAW_SCHEMA)
    raw = raw.join(F.broadcast(dels), "doc_id", "left_anti").persist()

    terms = (raw.groupBy("field", "term")
             .agg(F.count("*").alias("df"), F.sum("freq").alias("ttf"),
                  F.min("doc_id").alias("singleton_doc"),
                  F.max("freq").alias("singleton_freq"),
                  F.max("norm").alias("singleton_norm")))
    one = F.col("df") == 1
    terms = (terms.select(
        "field", "term", "df", "ttf",
        F.when(one, F.col("singleton_doc")).alias("singleton_doc"),
        F.when(one, F.col("singleton_freq")).alias("singleton_freq"),
        F.when(one, F.col("singleton_norm")).alias("singleton_norm"))
        .repartitionByRange(max(4, spark.sparkContext.defaultParallelism // 2),
                            "field", "term")
        .sortWithinPartitions("field", "term").persist())

    norms = (idx.norms.join(F.broadcast(dels), "doc_id", "left_anti")
             .repartitionByRange(max(4, spark.sparkContext.defaultParallelism // 2),
                                 "doc_id")
             .sortWithinPartitions("field", "doc_id").persist())
    frows = (norms.groupBy("field")
             .agg(F.count("*").alias("doc_count"),
                  F.sum("dl").alias("sum_ttf"))).collect()
    sdf_rows = terms.groupBy("field").agg(F.sum("df").alias("sum_df")).collect()
    sdf = {r["field"]: int(r["sum_df"]) for r in sdf_rows}
    fstats = {r["field"]: {"doc_count": int(r["doc_count"]),
                           "sum_ttf": int(r["sum_ttf"]),
                           "sum_df": sdf.get(r["field"], 0)}
              for r in frows}
    grow = norms.agg(F.countDistinct("doc_id").alias("n"),
                     F.max("doc_id").alias("mx")).collect()[0]
    stats = {"doc_count": int(grow["n"]),
             "sum_ttf": sum(v["sum_ttf"] for v in fstats.values()),
             "sum_df": sum(v["sum_df"] for v in fstats.values()),
             "max_doc": int(grow["mx"]),
             "grid": grid, "fields": fstats}

    n_part = _shuffle_n(spark)

    def pack(batches):
        yield from pack_partition(batches, grid, with_pos, with_off,
                                  with_pay)

    postings = (raw.withColumn("bucket", F.expr(f"doc_id div {grid}"))
                .repartitionByRange(n_part, "bucket")
                .sortWithinPartitions("bucket", "field", "term", "doc_id")
                .mapInPandas(pack, schema=POSTINGS_SCHEMA))
    out = InvertedIndex(postings=postings, terms=terms, norms=norms,
                        stats=stats, analyzer=idx.analyzer,
                        with_positions=with_pos, with_offsets=with_off,
                        with_payloads=with_pay,
                        raw=raw)
    if retained is not None:
        # physically-retained soft-deleted docs stay soft-deleted: they
        # count in the merged stats above but every reader still masks
        # them (the post-merge state of the reference policy)
        out = _masked_view(spark, out, retained, None)
        out.hard_deletes, out.soft_deletes = None, retained
        out.soft_delete_field = getattr(idx, "soft_delete_field",
                                        "__soft_deletes")
    return out

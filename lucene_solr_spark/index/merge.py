"""Incremental index append — the IndexWriter.addDocuments → commit →
merge lifecycle (`index/IndexWriter.java:1400`, `index/SegmentMerger.java:
100-168`, `index/DocIDMerger.java:32`) restated for Spark.

A delta generation is built from the new documents only (they carry
doc_ids ABOVE the current max — insertion order, exactly Lucene's
per-segment docID base remapping), then the index tables are merged:

- postings: union of block rows, re-range-partitioned by bucket. Blocks
  from different generations never overlap in doc range except inside
  the single boundary grid cell, and the query kernel already handles
  multiple blocks per (term, cell) — so no block rewrite is needed
  (Lucene's merge rewrites files because its postings are
  byte-concatenated; ours are relational rows).
- terms: full-outer merge summing df/ttf, singleton pulsing recomputed.
- norms: disjoint union (doc ranges don't overlap).
- stats: additive.

Query results over append(build(A), B) are identical to build(A+B) —
pinned by tests/test_incremental.py differentially. Block boundaries may
differ at the generation seam (128-alignment restarts), which is the
same freedom Lucene segments have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .builder import IndexBuilder, InvertedIndex


def _merge_terms(a: DataFrame, b: DataFrame) -> DataFrame:
    cols = ["field", "term", "df", "ttf", "singleton_doc", "singleton_freq",
            "singleton_norm"]
    a, b = a.select(cols), b.select(cols)
    j = (a.alias("a").join(b.alias("b"), ["field", "term"], "full_outer"))
    df = F.coalesce(F.col("a.df"), F.lit(0)) + F.coalesce(F.col("b.df"), F.lit(0))
    ttf = (F.coalesce(F.col("a.ttf"), F.lit(0)) +
           F.coalesce(F.col("b.ttf"), F.lit(0)))
    merged = j.select(
        "field", "term", df.alias("df"), ttf.alias("ttf"),
        F.coalesce("a.singleton_doc", "b.singleton_doc").alias("s_doc"),
        F.coalesce("a.singleton_freq", "b.singleton_freq").alias("s_freq"),
        F.coalesce("a.singleton_norm", "b.singleton_norm").alias("s_norm"))
    one = F.col("df") == 1
    return merged.select(
        "field", "term", "df", "ttf",
        F.when(one, F.col("s_doc")).alias("singleton_doc"),
        F.when(one, F.col("s_freq")).alias("singleton_freq"),
        F.when(one, F.col("s_norm")).alias("singleton_norm"))


def merge_stats(a: dict, b: dict) -> dict:
    """Additive merge of two stats dicts, per-field sub-stats included."""
    fields = {}
    for src in (a.get("fields", {}), b.get("fields", {})):
        for f, fs in src.items():
            cur = fields.setdefault(f, {"doc_count": 0, "sum_ttf": 0,
                                        "sum_df": 0})
            for k in cur:
                cur[k] += fs.get(k, 0)
    return {
        "doc_count": a["doc_count"] + b["doc_count"],
        "sum_ttf": a["sum_ttf"] + b["sum_ttf"],
        "sum_df": a["sum_df"] + b["sum_df"],
        "max_doc": max(a["max_doc"], b["max_doc"]),
        "grid": a["grid"],
        "fields": fields,
    }


def append(spark: SparkSession, idx: InvertedIndex, new_docs: DataFrame,
           builder: IndexBuilder, doc_id_col: str = "doc_id",
           text_col: str = "text") -> InvertedIndex:
    """Merge a delta built from new_docs into idx (new generation).

    Requires min(new doc_id) > idx.stats['max_doc'] (insertion-order
    docIDs; violation raises, matching the dense-docID contract)."""
    lo = new_docs.agg(F.min(doc_id_col)).collect()[0][0]
    if lo is not None and lo <= idx.stats["max_doc"]:
        raise ValueError(
            f"append requires doc_ids above {idx.stats['max_doc']}, "
            f"got {lo} — docIDs are insertion-ordered (DocIDMerger bases)")
    if builder.grid != idx.stats["grid"]:
        raise ValueError("append must use the same doc-grid as the base index")
    if builder.with_positions != idx.with_positions:
        raise ValueError("append must match the base index's positions mode")
    if builder.with_offsets != getattr(idx, "with_offsets", False):
        raise ValueError("append must match the base index's offsets mode")
    if ((getattr(builder, "payload", None) is not None)
            != getattr(idx, "with_payloads", False)):
        raise ValueError("append must match the base index's payload mode")
    delta = builder.build(spark, new_docs, doc_id_col, text_col)

    n_part = max(4, spark.sparkContext.defaultParallelism)
    postings = (idx.postings.unionByName(delta.postings)
                .repartitionByRange(n_part, "bucket")
                .sortWithinPartitions("bucket", "field", "term", "block_id"))
    terms = (_merge_terms(idx.terms, delta.terms)
             .repartitionByRange(max(4, n_part // 2), "field", "term")
             .sortWithinPartitions("field", "term"))
    norms = (idx.norms.unionByName(delta.norms)
             .repartitionByRange(max(4, n_part // 2), "doc_id")
             .sortWithinPartitions("field", "doc_id"))
    stats = merge_stats(idx.stats, delta.stats)
    # carry the delta's persisted raw postings so release() on the merged
    # index unpersists them (ADVICE: repeated appends leaked the delta's
    # cached raw table; the merged postings are lazy over it, so it can't
    # be released any earlier than the merged index itself)
    out = InvertedIndex(postings=postings, terms=terms, norms=norms,
                        stats=stats, analyzer=builder.analyzer,
                        with_positions=idx.with_positions,
                        with_offsets=getattr(idx, "with_offsets", False),
                        with_payloads=getattr(idx, "with_payloads", False),
                        raw=delta.raw)
    # base-index tombstones carry over: appended docs have ids above
    # max_doc, so the base's liveDocs set stays valid verbatim — an
    # append must not resurrect deleted docs
    dels = getattr(idx, "deletes", None)
    if dels is not None:
        out.deletes = dels
        out.deleted_array = getattr(idx, "deleted_array", None)
        out.del_table = getattr(idx, "del_table", None)
    return out


def update_documents(spark: SparkSession, idx: InvertedIndex,
                     replacements: DataFrame, old_ids,
                     builder: IndexBuilder, doc_id_col: str = "doc_id",
                     text_col: str = "text") -> InvertedIndex:
    """IndexWriter.updateDocument analog (`index/IndexWriter.java:1514`
    updateDocument = "atomically deletes ... and adds"): append the
    replacement docs as a delta segment, then tombstone the replaced
    doc_ids — one returned index, never an in-between view.

    Exactly Lucene's update semantics: the OLD versions keep counting
    in docFreq/totalTermFreq/docCount/avgdl until
    :func:`..index.deletes.expunge_deletes` physically drops them (a
    delete only hides; stats change at merge), while the NEW versions
    extend those stats immediately. ``replacements`` must carry fresh
    doc_ids above ``idx.stats['max_doc']`` (insertion-order docIDs —
    the DocIDMerger base contract append() enforces); ``old_ids`` is a
    DataFrame with a doc_id column or an iterable of ints."""
    from .deletes import delete_docs
    out = append(spark, idx, replacements, builder, doc_id_col, text_col)
    return delete_docs(spark, out, old_ids)

"""Doc-values updates (numeric / binary / sorted-set): change a
per-doc field without reindexing.

Reference semantics:
- `index/IndexWriter.java` ``updateNumericDocValue(Term, field, value)``
  resolves the term to its matching docs and records a NEW doc-values
  GENERATION for that field (`index/DocValuesFieldUpdates.java:38`,
  `ReadersAndUpdates.java` writeFieldUpdates) — segments are immutable;
  readers overlay the highest-generation value per doc
  (`SegmentReader.initDocValuesProducer`, dvGen in `FieldInfo`).

Spark-first restatement: an updates directory holds one small parquet
per (generation, field) of (doc_id, value) rows plus a JSON manifest.
``read_numeric_docvalues`` serves base ⟵ overlay with newest-gen-wins:
the update side is aggregated to one row per doc (``max_by(value,
gen)``) and LEFT-joined onto the base scan. Updates are tiny relative
to the corpus (that is the feature's point), so the join is a
broadcast; the corpus side never shuffles and the overlay composes
with pushed filters on the base scan.

Write path scale: ``update_by_term`` resolves matching docs with the
distributed kernel match (same plan as a term query) and writes the
(doc_id, value) result DIRECTLY from the executors — the driver never
materializes the doc list.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST = "_DV_UPDATES.json"


def _read_manifest(path: str) -> dict:
    p = os.path.join(path, MANIFEST)
    if not os.path.exists(p):
        return {"next_gen": 1, "updates": []}
    with open(p) as fh:
        return json.load(fh)


def _write_manifest(path: str, m: dict) -> None:
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(m, fh, indent=2)
    os.replace(tmp, os.path.join(path, MANIFEST))


# value normalization per doc-values kind (the write-side analog of
# the reference's typed update classes, index/DocValuesFieldUpdates.java
# subclasses NumericDocValuesFieldUpdates / BinaryDocValuesFieldUpdates):
#   numeric    → long (updateNumericDocValue)
#   binary     → string payload (updateBinaryDocValue; BytesRef carried
#                as UTF-8 text — the curation use case is labels/tags)
#   sorted_set → array<string>, deduped + sorted (SORTED_SET doc values
#                are a sorted term-ordinal set per doc)
_KINDS = {
    "numeric": lambda c: c.cast("long"),
    "binary": lambda c: c.cast("string"),
    "sorted_set": lambda c: F.array_sort(F.array_distinct(
        c.cast("array<string>"))),
}


def _update_docvalues(spark: SparkSession, path: str, field: str,
                      updates: DataFrame, kind: str) -> int:
    cols = set(updates.columns)
    if not {"doc_id", "value"} <= cols:
        raise ValueError(f"updates needs (doc_id, value), got {sorted(cols)}")
    m = _read_manifest(path)
    prior = {u.get("kind", "numeric") for u in m["updates"]
             if u["field"] == field}
    if prior - {kind}:
        raise ValueError(
            f"field {field!r} already has {sorted(prior)} update "
            f"generations; cannot mix with {kind!r}")
    gen = m["next_gen"]
    dest = f"{path}/gen-{gen}-{field}"
    (updates.select(F.col("doc_id").cast("long"),
                    _KINDS[kind](F.col("value")).alias("value"))
     .write.mode("errorifexists").parquet(dest))
    m["next_gen"] = gen + 1
    m["updates"].append({"gen": gen, "field": field, "path": dest,
                         "kind": kind, "ts": int(time.time())})
    _write_manifest(path, m)
    return gen


def update_numeric_docvalues(spark: SparkSession, path: str, field: str,
                             updates: DataFrame) -> int:
    """Record one update generation for ``field`` from a (doc_id,
    value) DataFrame; returns the generation number. Later generations
    win over earlier ones doc-by-doc, matching dvGen ordering."""
    return _update_docvalues(spark, path, field, updates, "numeric")


def update_binary_docvalues(spark: SparkSession, path: str, field: str,
                            updates: DataFrame) -> int:
    """``IndexWriter.updateBinaryDocValue`` (`index/IndexWriter.java:1864`,
    `index/BinaryDocValuesFieldUpdates.java`): per-doc string payload
    overlay — labels/annotations in a curation pipeline. Same
    generation model as numeric (VERDICT r4 #6)."""
    return _update_docvalues(spark, path, field, updates, "binary")


def update_sortedset_docvalues(spark: SparkSession, path: str, field: str,
                               updates: DataFrame) -> int:
    """SORTED_SET doc-values overlay: per-doc SET of strings (tags).
    Values are deduped + sorted at write, the on-disk shape of sorted-set
    doc values (term ordinals ascending per doc)."""
    return _update_docvalues(spark, path, field, updates, "sorted_set")


def update_by_term(searcher, path: str, term: str, field: str,
                   value) -> int:
    """``IndexWriter.updateNumericDocValue(new Term("text", term),
    field, value)``: every doc matching ``term`` gets ``value``. The
    doc resolution is the distributed kernel match; nothing is
    collected."""
    docs = searcher.match_docs(_term_query(term))
    ups = docs.select("doc_id", F.lit(value).cast("long").alias("value"))
    return update_numeric_docvalues(searcher.spark, path, field, ups)


def _term_query(term: str):
    from ..search.ast import TermQuery
    return TermQuery(term)


def read_docvalues(spark: SparkSession, base: DataFrame,
                   path: str, field: str,
                   id_col: str = "doc_id") -> DataFrame:
    """Serve ``field`` with all recorded update generations overlaid
    (newest generation wins per doc): returns ``base`` with ``field``
    replaced. One broadcast left-join; the base plan (and any pushed
    predicates on it) is otherwise untouched. Kind-agnostic — numeric,
    binary, and sorted-set generations all serve through this overlay
    (their typing happened at write)."""
    m = _read_manifest(path)
    gens = [u for u in m["updates"] if u["field"] == field]
    if not gens:
        return base
    parts = [spark.read.parquet(u["path"])
             .select("doc_id", "value", F.lit(u["gen"]).alias("gen"))
             for u in gens]
    allup = parts[0]
    for p in parts[1:]:
        allup = allup.unionByName(p)
    latest = (allup.groupBy("doc_id")
              .agg(F.max_by("value", "gen").alias("_dv_new")))
    out = base.join(F.broadcast(latest),
                    base[id_col] == latest["doc_id"], "left")
    keep = [F.coalesce("_dv_new", base[field]).alias(field)
            if c == field else base[c] for c in base.columns]
    return out.select(*keep)


# kept name: the original numeric-only entry point
read_numeric_docvalues = read_docvalues

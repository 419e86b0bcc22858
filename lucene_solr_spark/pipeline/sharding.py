"""Deterministic corpus shuffle + sharding for training-data output.

Training runs need a REPRODUCIBLE global data order: the same corpus
must shuffle into the same shards in the same within-shard order on
every run, on any cluster size, after any repartition (GPT-3 appendix
B and the Dolma/OLMo data-order reproducibility requirement; the
reference engine has no analog — its concern ends at the index).

Design: order and placement derive from ``md5(id)`` only —
* ``shard  = h60(id) mod n_shards`` (balanced by hash uniformity),
* ``order  = (h60(id), id)`` within the shard (the id tiebreak makes
  the order total even under md5h60 collisions),
so the assignment is a pure codegen projection: NO global sort, NO
corpus-wide window, reshard-invariant by construction. Writing is one
``repartition(n, shard)`` + ``sortWithinPartitions(order)`` — Spark's
shuffle places each shard's rows together and the write streams them
in final order; the only corpus-wide movement is that single
placement exchange (which any sharded write must pay).

md5 keeps the whole thing oracle-checkable bit-for-bit (see
``pipeline/hashing.py``); swap xxhash64 in for production if oracle
parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_solr_spark.pipeline.hashing import md5h60


def assign_shards(docs: DataFrame, n_shards: int,
                  id_col: str = "doc_id") -> DataFrame:
    """Input rows + (shard, shuffle_key) — deterministic, partition-
    layout-independent, no shuffle (one codegen projection)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = md5h60(F.col(id_col).cast("string"))
    return (docs.withColumn("shuffle_key", h)
            .withColumn("shard",
                        F.pmod(F.col("shuffle_key"),
                               F.lit(n_shards)).cast("int")))


def shard_manifest(docs: DataFrame, n_shards: int,
                   id_col: str = "doc_id") -> DataFrame:
    """Per-shard audit row: (shard, count, min_key, max_key) — the
    thing to persist next to the written shards so a re-run can verify
    placement without re-reading data."""
    a = assign_shards(docs, n_shards, id_col)
    return (a.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("count"),
                 F.min("shuffle_key").alias("min_key"),
                 F.max("shuffle_key").alias("max_key")))


def write_shards(docs: DataFrame, path: str, n_shards: int,
                 id_col: str = "doc_id", fmt: str = "parquet") -> None:
    """Materialize the shuffled shards: ONE placement exchange on
    shard, rows streamed in (shuffle_key, id) order within each —
    byte-reproducible output for a fixed corpus + n_shards."""
    a = assign_shards(docs, n_shards, id_col)
    (a.repartition(n_shards, "shard")
     .sortWithinPartitions("shard", "shuffle_key", id_col)
     .write.mode("overwrite").partitionBy("shard").format(fmt).save(path))

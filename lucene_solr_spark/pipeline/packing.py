"""Sequence packing — concat-and-chunk documents into fixed token bins.

The last stage of a pretraining data pipeline: documents are
concatenated in a deterministic order and the stream is cut every
``budget`` tokens into training sequences (the GPT-style "pack then
chunk" regime; documents may span bin boundaries). At 100 TB the
requirements are the same as sampling (see sampling.py): deterministic
under reshards and retries, one narrow shuffle, skew-free.

Shape: each document hashes to a SHARD (the unit of packing
parallelism — a real pipeline packs each shard independently on one
writer task); within a shard, documents are ordered by a second hash
(decorrelates source/domain runs), a windowed cumulative sum assigns
every document its token offset, and bin indices are pure arithmetic
on the offsets. One hash-partitioned sort-window per shard — no
driver state, no Python, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .sampling import hash_frac


def _hash_int(key, lo: int, hi: int):
    """Independent uniform int from hex chars [lo, hi) of md5(key)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(c.cast("string")), lo, hi - lo),
                  16, 10).cast("long")


def pack_sequences(docs: DataFrame, budget: int, n_shards: int = 8,
                   key_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Assign every document its (shard, token offset, bin span) under
    concat-and-chunk packing with ``budget`` tokens per bin.

    Returns (doc_id, shard, n_tok, start_off, first_bin, last_bin):
    the document's tokens occupy stream positions
    [start_off, start_off + n_tok) of its shard, i.e. training bins
    first_bin..last_bin of that shard. Deterministic for any
    partitioning of the input."""
    n_tok = F.size(F.expr(
        f"regexp_extract_all({text_col}, '[a-z0-9]+', 0)")).cast("long")
    d = docs.select(
        F.col(key_col).alias("doc_id"),
        (_hash_int(key_col, 1, 9) % n_shards).cast("int").alias("shard"),
        _hash_int(key_col, 9, 17).alias("ord_key"),
        n_tok.alias("n_tok"))
    w = (Window.partitionBy("shard").orderBy("ord_key", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tok").over(w)
    start = (cum - F.col("n_tok")).alias("start_off")
    return (d.select("doc_id", "shard", "n_tok", start,
                     F.floor((cum - F.col("n_tok")) / budget)
                     .cast("long").alias("first_bin"),
                     F.floor((cum - 1) / budget).cast("long")
                     .alias("last_bin"))
            .withColumn("last_bin",
                        F.greatest("first_bin", "last_bin")))

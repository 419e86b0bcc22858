"""IndexWriter-equivalent: build postings/terms/norms/stats DataFrames.

Pipeline (Spark restatement of the reference's indexing chain,
`index/IndexingChain.java:464,506,887` → `FreqProxTermsWriter.java:79` →
`codecs/lucene84/Lucene84PostingsWriter.java:218-375`):

  stage 1 (narrow, no shuffle)   docs --mapInPandas--> (doc_id, term, freq, norm[, positions])
                                 — the per-doc term hash (TermsHashPerField.add)
  stage 2 (shuffle #1, partial agg) groupBy(term) → df/ttf + singleton pulsing
                                 — the term dictionary (BlockTreeTermsWriter)
  stage 3 (shuffle #2, salted)   repartition(term, salt) → applyInPandas pack
                                 — flush+merge (FreqProxTermsWriter/SegmentMerger):
                                 128-posting Δ+FOR/PFOR blocks, VByte tails,
                                 inline norm bytes, competitive-impact skylines
  stage 4 (shuffle #3, small)    repartitionByRange(term) sorted write
                                 — parquet row-group pruning replaces the FST
                                 term index (BlockTreeTermsReader seek)

Skew (north rule): head terms (df > head_df) are split across
``n_salts = ceil(df / salt_target)`` salt groups. Salt is derived from the
doc-grid cell ``(doc_id // grid) % n_salts`` so every grid cell packs
independently — the resulting block layout is INDEPENDENT of both the
salt count and the cluster parallelism, and no block ever spans a grid
boundary. That grid alignment is what lets the query side shard WAND
scoring by exact doc range with zero cross-partition leakage.

docIDs are globally dense and deterministic: the caller supplies them
(documents.parquet ships doc_id; the synthetic pages corpus derives them
from the url sort order) — never monotonically_increasing_id.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.analyzer import ENGLISH_ANALYZER, StandardAnalyzer
from ..functions import codec
from ..functions.impacts import skyline
from ..functions.smallfloat import int_to_byte4

RAW_SCHEMA = "doc_id long, term string, freq int, norm int, positions array<int>"

POSTINGS_SCHEMA = (
    "term string, bucket long, block_id long, doc_count int, last_doc long, "
    "doc_blob binary, freq_blob binary, norm_blob binary, "
    "imp_freqs array<int>, imp_norms array<int>, pos_blob binary"
)


@dataclass
class InvertedIndex:
    """The index = four DataFrames (persisted as sorted Parquet tables)."""

    postings: DataFrame
    terms: DataFrame
    norms: DataFrame
    stats: dict                      # doc_count, sum_ttf, sum_df, max_doc, grid
    analyzer: StandardAnalyzer = field(default_factory=lambda: ENGLISH_ANALYZER)
    with_positions: bool = False

    def cache(self) -> "InvertedIndex":
        self.postings = self.postings.cache()
        self.terms = self.terms.cache()
        self.norms = self.norms.cache()
        # materialize now so later queries reuse
        self.postings.count()
        self.terms.count()
        return self


class IndexBuilder:
    def __init__(self, analyzer: StandardAnalyzer = ENGLISH_ANALYZER,
                 grid: int = 1 << 17, head_df: int = 4096,
                 salt_target: int = 4096, with_positions: bool = False):
        """grid: doc-range cell size blocks never cross (query shard unit).
        head_df: df above which a term is 'head' and gets salted.
        salt_target: target postings per salt group for head terms.
        Defaults are sized for the sandbox; at cluster scale use
        grid=1<<20, head_df~1e6, salt_target~1e6 (same code path)."""
        self.analyzer = analyzer
        self.grid = grid
        self.head_df = head_df
        self.salt_target = salt_target
        self.with_positions = with_positions

    # ------------------------------------------------------------------
    # stage 1: invert (narrow)
    # ------------------------------------------------------------------
    def invert(self, docs: DataFrame, doc_id_col="doc_id", text_col="text") -> DataFrame:
        analyzer = self.analyzer
        with_pos = self.with_positions

        def invert_batches(batches):
            for pdf in batches:
                rows_doc, rows_term, rows_freq, rows_norm, rows_pos = [], [], [], [], []
                for did, text in zip(pdf[doc_id_col].to_numpy(),
                                     pdf[text_col].to_numpy()):
                    tp = analyzer.term_positions(text or "")
                    dl = sum(len(v) for v in tp.values())
                    if dl == 0:
                        continue
                    nb = int(int_to_byte4(np.array([dl]))[0])
                    for term, pos in tp.items():
                        rows_doc.append(did)
                        rows_term.append(term)
                        rows_freq.append(len(pos))
                        rows_norm.append(nb)
                        rows_pos.append(pos if with_pos else None)
                yield pd.DataFrame({
                    "doc_id": pd.Series(rows_doc, dtype="int64"),
                    "term": pd.Series(rows_term, dtype="object"),
                    "freq": pd.Series(rows_freq, dtype="int32"),
                    "norm": pd.Series(rows_norm, dtype="int32"),
                    "positions": pd.Series(rows_pos, dtype="object"),
                })

        return docs.select(doc_id_col, text_col).mapInPandas(
            invert_batches, schema=RAW_SCHEMA)

    # ------------------------------------------------------------------
    # full build
    # ------------------------------------------------------------------
    def build(self, spark: SparkSession, docs: DataFrame,
              doc_id_col="doc_id", text_col="text") -> InvertedIndex:
        raw = self.invert(docs, doc_id_col, text_col)
        # One logical pass feeds three aggregations; cache the (much smaller
        # than the corpus) raw postings to avoid re-running the analyzer.
        # At cluster scale this is a checkpoint table instead (catalog.py).
        raw = raw.persist()

        # --- term dictionary + singleton pulsing (shuffle w/ partial agg)
        terms = (raw.groupBy("term")
                 .agg(F.count("*").alias("df"),
                      F.sum("freq").alias("ttf"),
                      F.min("doc_id").alias("singleton_doc"),
                      F.max("freq").alias("singleton_freq"),
                      F.max("norm").alias("singleton_norm"))
                 .withColumn("singleton_doc",
                             F.when(F.col("df") == 1, F.col("singleton_doc")))
                 .withColumn("singleton_freq",
                             F.when(F.col("df") == 1, F.col("singleton_freq")))
                 .withColumn("singleton_norm",
                             F.when(F.col("df") == 1, F.col("singleton_norm"))))
        terms = terms.repartitionByRange(
            max(4, spark.sparkContext.defaultParallelism // 2), "term"
        ).sortWithinPartitions("term").persist()

        # --- norms + collection stats
        norms = (raw.groupBy("doc_id")
                 .agg(F.sum("freq").alias("dl"), F.max("norm").alias("norm"))
                 .repartitionByRange(max(4, spark.sparkContext.defaultParallelism // 2),
                                     "doc_id")
                 .sortWithinPartitions("doc_id")).persist()
        srow = norms.agg(F.count("*").alias("doc_count"),
                         F.sum("dl").alias("sum_ttf"),
                         F.max("doc_id").alias("max_doc")).collect()[0]
        sum_df = terms.agg(F.sum("df")).collect()[0][0]
        stats = {"doc_count": int(srow["doc_count"]),
                 "sum_ttf": int(srow["sum_ttf"]),
                 "sum_df": int(sum_df),
                 "max_doc": int(srow["max_doc"]),
                 "grid": self.grid}

        # --- salted pack (the merge shuffle)
        head = (terms.filter(F.col("df") > self.head_df)
                .select("term", F.ceil(F.col("df") / self.salt_target)
                        .cast("int").alias("n_salts")))
        grid = self.grid
        salted = (raw.join(F.broadcast(head), "term", "left")
                  .withColumn("n_salts", F.coalesce("n_salts", F.lit(1)))
                  .withColumn("salt", ((F.col("doc_id") / grid).cast("long")
                                       % F.col("n_salts")).cast("int")))
        n_part = max(spark.sparkContext.defaultParallelism * 2, 8)
        with_pos = self.with_positions

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            return pack_group(pdf, grid, with_pos)

        packed = (salted.repartition(n_part, "term", "salt")
                  .groupBy("term", "salt")
                  .applyInPandas(pack, schema=POSTINGS_SCHEMA))

        # --- final layout: term-sorted parquet-friendly ordering
        postings = (packed.repartitionByRange(
            max(4, spark.sparkContext.defaultParallelism), "term", "block_id")
            .sortWithinPartitions("term", "block_id"))

        idx = InvertedIndex(postings=postings, terms=terms, norms=norms,
                            stats=stats, analyzer=self.analyzer,
                            with_positions=self.with_positions)
        return idx


def pack_group(pdf: pd.DataFrame, grid: int, with_pos: bool) -> pd.DataFrame:
    """Pack one (term, salt) group into block rows.

    Rows arrive unsorted; sort by doc_id, split at grid boundaries, then
    into 128-posting blocks (Lucene84PostingsWriter.startDoc semantics:
    Δ-from-previous-doc, FOR full blocks, VByte tail). Per block: inline
    norm bytes, competitive-impact skyline, optional packed positions.
    """
    term = pdf["term"].iloc[0]
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    docs = pdf["doc_id"].to_numpy()[order]
    freqs = pdf["freq"].to_numpy().astype(np.int64)[order]
    norms = pdf["norm"].to_numpy().astype(np.int64)[order]
    poss = pdf["positions"].to_numpy()[order] if with_pos else None

    out = {k: [] for k in ("bucket", "block_id", "doc_count", "last_doc",
                           "doc_blob", "freq_blob", "norm_blob",
                           "imp_freqs", "imp_norms", "pos_blob")}
    cells = docs // grid
    cell_starts = np.flatnonzero(np.r_[True, cells[1:] != cells[:-1]])
    cell_bounds = np.r_[cell_starts, len(docs)]
    for ci in range(len(cell_starts)):
        lo, hi = cell_bounds[ci], cell_bounds[ci + 1]
        for s in range(lo, hi, codec.BLOCK_SIZE):
            e = min(s + codec.BLOCK_SIZE, hi)
            bd, bf, bn = docs[s:e], freqs[s:e], norms[s:e]
            first = int(bd[0])
            doc_blob, freq_blob = codec.encode_block_payloads(bd, bf, first - 1)
            sf, sn = skyline(bf, bn)
            pos_blob = None
            if with_pos:
                parts = []
                for p in poss[s:e]:
                    arr = np.asarray(p, dtype=np.int64)
                    d = np.diff(arr, prepend=0)
                    parts.append(codec.vbyte_encode(d))
                pos_blob = b"".join(parts)
            out["bucket"].append(first // grid)
            out["block_id"].append(first)
            out["doc_count"].append(e - s)
            out["last_doc"].append(int(bd[-1]))
            out["doc_blob"].append(doc_blob)
            out["freq_blob"].append(freq_blob)
            out["norm_blob"].append(bn.astype(np.uint8).tobytes())
            out["imp_freqs"].append(sf.astype(np.int32).tolist())
            out["imp_norms"].append(sn.astype(np.int32).tolist())
            out["pos_blob"].append(pos_blob)
    n = len(out["block_id"])
    res = pd.DataFrame({"term": [term] * n, **out})
    res["bucket"] = res["bucket"].astype("int64")
    res["block_id"] = res["block_id"].astype("int64")
    res["doc_count"] = res["doc_count"].astype("int32")
    res["last_doc"] = res["last_doc"].astype("int64")
    return res


def decode_postings_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(docs, freqs, norm_bytes) from one postings-table row (dict-like)."""
    first = int(row["block_id"])
    n = int(row["doc_count"])
    docs, freqs = codec.decode_block_payloads(
        bytes(row["doc_blob"]), bytes(row["freq_blob"]), n, first - 1)
    norms = np.frombuffer(bytes(row["norm_blob"]), dtype=np.uint8).astype(np.int64)
    return docs, freqs, norms


def decode_positions_blob(pos_blob: bytes, freqs: np.ndarray) -> list[np.ndarray]:
    """Per-doc absolute positions from a block's packed positions blob."""
    total = int(np.sum(freqs))
    flat = codec.vbyte_decode(bytes(pos_blob), total)
    outs, off = [], 0
    for f in np.asarray(freqs, dtype=np.int64):
        outs.append(np.cumsum(flat[off:off + f]))
        off += f
    return outs

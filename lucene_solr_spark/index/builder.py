"""IndexWriter-equivalent: build postings/terms/norms/stats DataFrames.

Pipeline (Spark restatement of the reference's indexing chain,
`index/IndexingChain.java:464,506,887` → `FreqProxTermsWriter.java:79` →
`codecs/lucene84/Lucene84PostingsWriter.java:218-375`):

  stage 1 (narrow, no shuffle)   docs --mapInPandas--> (doc_id, term, freq, norm[, pos_blob])
                                 — the per-doc term hash (TermsHashPerField.add)
  stage 2 (shuffle #1, partial agg) groupBy(term) → df/ttf + singleton pulsing
                                 — the term dictionary (BlockTreeTermsWriter)
  stage 3 (shuffle #2)           repartitionByRange(bucket) → JVM sort
                                 (bucket, term, doc_id) → narrow mapInPandas
                                 pack — flush+merge (FreqProxTermsWriter/
                                 SegmentMerger): 128-posting Δ+FOR/PFOR
                                 blocks, VByte tails, inline norm bytes,
                                 competitive-impact skylines — emitted
                                 DIRECTLY in the final doc-sharded layout
                                 (whole grid cells per partition; parquet
                                 row-group pruning on the term sort order
                                 replaces the FST term index)

Skew (north rule): head-term posting lists are split EXPLICITLY at
grid-cell boundaries — the shuffle key is the doc-range cell, never the
term, so the heaviest term contributes at most `grid` postings per task
(the salted-split scheme with salt == doc range, which also preserves
docID order). The block layout is INDEPENDENT of cluster parallelism,
and no block ever spans a grid boundary. That grid alignment is what
lets the query side shard WAND scoring by exact doc range with zero
cross-partition leakage.

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

RAW_SCHEMA = "doc_id long, term string, freq int, norm int, pos_blob binary"

# norm byte for doc lengths < 2^16 without per-doc numpy round-trips
_NORM_LUT = int_to_byte4(np.arange(1 << 16)).astype(np.uint8)


def _vbyte_positions(pos) -> bytes:
    """Delta + VByte of an ascending position list (codec.vbyte format:
    7 data bits LSB-first, high bit = continuation). Pure-Python fast path
    for the tiny per-(doc,term) lists the inverter emits."""
    out = bytearray()
    prev = 0
    for p in pos:
        d = p - prev
        prev = p
        while d > 0x7F:
            out.append((d & 0x7F) | 0x80)
            d >>= 7
        out.append(d)
    return bytes(out)

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
    raw: DataFrame | None = None     # persisted intermediate; release()-able
    timings: dict = field(default_factory=dict)   # per-stage build seconds

    def release(self) -> None:
        """Unpersist every DataFrame this index pinned (builder's raw
        postings + any cached tables) — for multi-build sessions."""
        for df in (self.raw, self.postings, self.terms, self.norms):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass

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
        """grid: doc-range cell size blocks never cross — the query shard
        unit AND the skew bound (no term contributes more than `grid`
        postings to any pack task). head_df / salt_target are retained
        for manifest compatibility; the grid-cell shuffle subsumes them.
        Sandbox default sizes; at cluster scale use grid=1<<17+ (same
        code path)."""
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
            lut = _NORM_LUT
            for pdf in batches:
                rows_doc, rows_term, rows_freq, rows_norm, rows_pos = [], [], [], [], []
                for did, text in zip(pdf[doc_id_col].to_numpy(),
                                     pdf[text_col].to_numpy()):
                    tp = analyzer.term_positions(text or "")
                    if not tp:
                        continue
                    dl = 0
                    for v in tp.values():
                        dl += len(v)
                    nb = (int(lut[dl]) if dl < len(lut)
                          else int(int_to_byte4(np.array([dl]))[0]))
                    for term, pos in tp.items():
                        rows_doc.append(did)
                        rows_term.append(term)
                        rows_freq.append(len(pos))
                        rows_norm.append(nb)
                        if with_pos:
                            rows_pos.append(_vbyte_positions(pos))
                        else:
                            rows_pos.append(None)
                yield pd.DataFrame({
                    "doc_id": pd.Series(rows_doc, dtype="int64"),
                    "term": pd.Series(rows_term, dtype="object"),
                    "freq": pd.Series(rows_freq, dtype="int32"),
                    "norm": pd.Series(rows_norm, dtype="int32"),
                    "pos_blob": pd.Series(rows_pos, dtype="object"),
                })

        return docs.select(doc_id_col, text_col).mapInPandas(
            invert_batches, schema=RAW_SCHEMA)

    # ------------------------------------------------------------------
    # full build
    # ------------------------------------------------------------------
    def build(self, spark: SparkSession, docs: DataFrame,
              doc_id_col="doc_id", text_col="text") -> InvertedIndex:
        # Decouple invert parallelism from the input's file layout: a 1 GB
        # corpus in ~30 MB files coalesces to <10 scan partitions under
        # maxPartitionBytes, which would serialize the (Python-bound)
        # analyzer stage. Round-robin repartition = the DWPT work-queue
        # analog; index content is order-independent, so this is safe.
        import time as _time
        timings: dict = {}
        t0 = _time.perf_counter()
        n_inv = max(int(spark.conf.get("spark.sql.shuffle.partitions")),
                    spark.sparkContext.defaultParallelism * 2, 8)
        raw = self.invert(docs.repartition(n_inv), doc_id_col, text_col)
        # One logical pass feeds three aggregations; cache the (much smaller
        # than the corpus) raw postings to avoid re-running the analyzer.
        # At cluster scale this is a checkpoint table instead (catalog.py).
        raw = raw.persist()
        raw.count()
        timings["invert_sec"] = round(_time.perf_counter() - t0, 3)
        t0 = _time.perf_counter()

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
        timings["dict_norms_stats_sec"] = round(_time.perf_counter() - t0, 3)
        t0 = _time.perf_counter()

        # --- pack: ONE shuffle, directly into the final doc-sharded layout.
        # Range-partition by grid cell (whole cells per partition — the
        # Solr shard model, QueryComponent.java:810 mergeIds), JVM-sort by
        # (bucket, term, doc_id), then a narrow mapInPandas walks the
        # sorted runs and emits 128-posting blocks. Head-term skew is
        # handled STRUCTURALLY: a term's postings are split at grid-cell
        # boundaries, so no per-term list ever exceeds `grid` docs — this
        # is the salted split (salt == doc range) taken to its limit, and
        # it preserves docID order by construction. Query-time kernels
        # need NO shuffle: filter(term) is narrow and every cell's blocks
        # are contiguous; Parquet row-group stats on the (bucket, term)
        # sort order still prune term lookups on disk.
        grid = self.grid
        n_part = max(int(spark.conf.get("spark.sql.shuffle.partitions")),
                     spark.sparkContext.defaultParallelism * 2, 8)
        with_pos = self.with_positions

        def pack(batches):
            yield from pack_partition(batches, grid, with_pos)

        postings = (raw.withColumn("bucket", F.expr(f"doc_id div {grid}"))
                    .repartitionByRange(n_part, "bucket")
                    .sortWithinPartitions("bucket", "term", "doc_id")
                    .mapInPandas(pack, schema=POSTINGS_SCHEMA))

        timings["pack_plan_sec"] = round(_time.perf_counter() - t0, 3)
        # pack/layout stage is lazy; callers time its materialization
        idx = InvertedIndex(postings=postings, terms=terms, norms=norms,
                            stats=stats, analyzer=self.analyzer,
                            with_positions=self.with_positions, raw=raw,
                            timings=timings)
        return idx


def pack_partition(batches, grid: int, with_pos: bool):
    """Pack a bucket-range partition of sorted raw postings into block rows.

    Input arrives sorted by (bucket, term, doc_id); every (bucket, term)
    run becomes 128-posting blocks (Lucene84PostingsWriter.startDoc
    semantics: Δ-from-previous-doc, FOR full blocks, VByte tail) with
    inline norm bytes, competitive-impact skylines, optional packed
    positions. The trailing run of each Arrow batch is buffered — it may
    continue in the next batch.
    """
    buf = None
    for pdf in batches:
        if buf is not None:
            pdf = pd.concat([buf, pdf], ignore_index=True)
            buf = None
        if len(pdf) == 0:
            continue
        b = pdf["bucket"].to_numpy()
        t = pdf["term"].to_numpy()
        same_last = (b == b[-1]) & (t == t[-1])
        nz = np.flatnonzero(~same_last)
        start_last = int(nz[-1]) + 1 if len(nz) else 0
        buf = pdf.iloc[start_last:]
        head = pdf.iloc[:start_last]
        if len(head):
            yield _pack_frame(head, grid, with_pos)
    if buf is not None and len(buf):
        yield _pack_frame(buf, grid, with_pos)


def _pack_frame(pdf: pd.DataFrame, grid: int, with_pos: bool) -> pd.DataFrame:
    docs = pdf["doc_id"].to_numpy()
    terms_arr = pdf["term"].to_numpy()
    buckets = pdf["bucket"].to_numpy()
    freqs = pdf["freq"].to_numpy().astype(np.int64)
    norms = pdf["norm"].to_numpy().astype(np.int64)
    poss = pdf["pos_blob"].to_numpy() if with_pos else None

    out = {k: [] for k in ("term", "bucket", "block_id", "doc_count",
                           "last_doc", "doc_blob", "freq_blob", "norm_blob",
                           "imp_freqs", "imp_norms", "pos_blob")}
    change = np.r_[True, (buckets[1:] != buckets[:-1])
                   | (terms_arr[1:] != terms_arr[:-1])]
    starts = np.flatnonzero(change)
    bounds = np.r_[starts, len(docs)]
    for gi in range(len(starts)):
        lo, hi = int(bounds[gi]), int(bounds[gi + 1])
        term = terms_arr[lo]
        bucket = int(buckets[lo])
        for s in range(lo, hi, codec.BLOCK_SIZE):
            e = min(s + codec.BLOCK_SIZE, hi)
            bd, bf, bn = docs[s:e], freqs[s:e], norms[s:e]
            first = int(bd[0])
            doc_blob, freq_blob = codec.encode_block_payloads(bd, bf, first - 1)
            sf, sn = skyline(bf, bn)
            pos_blob = None
            if with_pos:
                # per-(doc,term) streams arrive pre-VByte'd from invert
                pos_blob = b"".join(bytes(p) for p in poss[s:e])
            out["term"].append(term)
            out["bucket"].append(bucket)
            out["block_id"].append(first)
            out["doc_count"].append(e - s)
            out["last_doc"].append(int(bd[-1]))
            out["doc_blob"].append(doc_blob)
            out["freq_blob"].append(freq_blob)
            out["norm_blob"].append(bn.astype(np.uint8).tobytes())
            out["imp_freqs"].append(sf.astype(np.int32).tolist())
            out["imp_norms"].append(sn.astype(np.int32).tolist())
            out["pos_blob"].append(pos_blob)
    res = pd.DataFrame(out)
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

"""IndexWriter-equivalent: build postings/terms/norms/stats DataFrames.

Pipeline (Spark restatement of the reference's indexing chain,
`index/IndexingChain.java:464,506,887` → `FreqProxTermsWriter.java:79` →
`codecs/lucene84/Lucene84PostingsWriter.java:218-375`) — ONE wide
shuffle end to end:

  stage 0 (THE wide shuffle)     docs repartitionByRange(grid cell) —
                                 whole cells per partition; moves the
                                 corpus text once, before any Python
  stage 1 (narrow)               docs --mapInPandas--> (doc_id, field,
                                 term, freq, norm[, pos_blob])
                                 — the per-doc term hash (TermsHashPerField
                                 .add), VECTORIZED: pandas/numpy batch
                                 tokenize→lower→stop→group, no per-token
                                 Python (north-rule "no per-row Python");
                                 output inherits the cell partitioning
  stage 2 (partial-agg shuffle)  groupBy(field, term) → df/ttf +
                                 singleton pulsing — the per-field term
                                 dictionary (BlockTreeTermsWriter; Terms
                                 are (field, text) pairs, `index/Term.
                                 java:69`, FieldInfos.java:40); map-side
                                 combined, tiny payload
  stage 3 (narrow)               partition-local JVM sort (bucket, field,
                                 term, doc_id) → mapInPandas pack —
                                 flush+merge (FreqProxTermsWriter/
                                 SegmentMerger): 128-posting Δ+FOR/PFOR
                                 blocks, VByte tails, inline norm bytes,
                                 competitive-impact skylines — emitted
                                 DIRECTLY in the final doc-sharded layout

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

Fields: every text column is a field; a Term is (field, text) exactly as
in the reference (`index/Term.java:69`). Norms, dictionary stats and
BM25 collection statistics (docCount, sumTotalTermFreq) are per-field
(`search/IndexSearcher.java:914-933`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import chain

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.analyzer import ENGLISH_ANALYZER, StandardAnalyzer
from ..analysis.lowercase import _multi_char_exceptions
from ..analysis.tokenizer import _TOKEN_RE
from ..functions import codec
from ..functions.impacts import skyline
from ..functions.smallfloat import int_to_byte4

RAW_SCHEMA = ("doc_id long, field string, term string, freq int, norm int, "
              "pos_blob binary, off_blob binary, pay_blob binary")

DEFAULT_FIELD = "text"

# norm byte for doc lengths < 2^16 without per-doc numpy round-trips
_NORM_LUT = int_to_byte4(np.arange(1 << 16)).astype(np.uint8)

POSTINGS_SCHEMA = (
    "field string, term string, bucket long, block_id long, doc_count int, "
    "last_doc long, doc_blob binary, freq_blob binary, norm_blob binary, "
    "imp_freqs array<int>, imp_norms array<int>, pos_blob binary, "
    "off_blob binary, pay_blob binary"
)

_FALLBACK_RE = None  # built lazily (scans the unicode table once/process)


def _fallback_re():
    """Rows matching this take the exact per-doc analyzer path: mixed
    CJK scripts (tokenizer split rules) or codepoints whose Java simple
    lowercase differs from Python full lowercase."""
    global _FALLBACK_RE
    if _FALLBACK_RE is None:
        import re
        exc = "".join(re.escape(c) for c in _multi_char_exceptions())
        _FALLBACK_RE = re.compile("[一-鿿㐀-䶿぀-ヿ" + exc + "]")
    return _FALLBACK_RE


def _vbyte_positions(pos) -> bytes:
    """Delta + VByte of an ascending position list (codec.vbyte format).
    Retained for the per-doc fallback path and tests; the vectorized
    inverter uses codec.vbyte_encode_batch."""
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


def _payload_values(terms, positions, payload):
    """Per-occurrence integer payloads (`Lucene84PostingsWriter.java`
    addPosition's payload channel; the values a DelimitedPayloadToken-
    Filter / model-score pipeline would attach). Built-in vectorized
    sources: "position" (1-based token position) and "term_len";
    a callable (term, position) -> int is the general path."""
    if payload == "delimited":
        raise ValueError(
            "payload='delimited' values come from the analyzer's "
            "term_positions_payloads (DelimitedPayloadAnalyzer), not "
            "a post-analysis source — the batch path must not be hit")
    if payload == "position":
        return positions + 1
    if payload == "term_len":
        return np.fromiter(map(len, terms), dtype=np.int64,
                           count=len(positions))
    if callable(payload):
        return np.fromiter((int(payload(t, int(p)))
                            for t, p in zip(terms, positions)),
                           dtype=np.int64, count=len(positions))
    raise ValueError(f"unknown payload source {payload!r}")


def invert_field_arrays(doc_ids: np.ndarray, texts: pd.Series,
                        analyzer: StandardAnalyzer, with_pos: bool,
                        with_off: bool = False, payload=None):
    """Vectorized single-field inversion of one Arrow batch.

    → None, or dict of parallel arrays (doc_id, term, freq, norm
    [, pos_blob]) — one entry per (doc, term) pair, byte-identical to
    running ``analyzer.term_positions`` per doc (differential-tested in
    tests/test_analyzer.py).

    Hot-path shape: whole-document lowercase FIRST (one C-level
    str.lower per doc — legal because simple-lowercase is 1:1 and
    class-preserving on every codepoint outside the fallback set, so
    tokenize∘lower ≡ lower∘tokenize there), one C regex findall per
    doc, C-level map(len) / set-membership over the flat token stream,
    then factorize + lexsort + run detection in numpy. Rows containing
    exotic scripts or exceptional-lowercase codepoints route wholly
    through the per-doc reference path (`analyzer.term_positions`).
    """
    arr = texts.fillna("").to_numpy()
    if payload == "delimited":
        # DelimitedPayloadTokenFilter ingestion: per-occurrence values
        # live in the analyzed token text itself, so every row takes
        # the per-doc path with the analyzer's payload stream
        if not hasattr(analyzer, "term_positions_payloads"):
            raise ValueError(
                "payload='delimited' requires an analyzer exposing "
                "term_positions_payloads (analysis/delimited.py)")
        if with_off:
            raise ValueError(
                "delimited payloads rewrite token text — character "
                "offsets into the original are not derivable")
        return _invert_exact(doc_ids, arr, analyzer, with_pos,
                             with_off, payload)
    if not getattr(analyzer, "batch_vectorizable", True):
        # CustomAnalyzer chains are arbitrary Python — the numpy batch
        # path restates only the StandardAnalyzer family, so every row
        # takes the per-doc reference path (analysis/custom.py)
        return _invert_exact(doc_ids, arr, analyzer, with_pos,
                             with_off, payload)
    rx = _fallback_re()
    fb = np.fromiter((rx.search(t) is not None for t in arr),
                     dtype=bool, count=len(arr))
    parts = []
    if not fb.all():
        parts.append(_invert_vec(doc_ids[~fb], arr[~fb], analyzer, with_pos,
                                 with_off, payload))
    if fb.any():
        parts.append(_invert_exact(doc_ids[fb], arr[fb], analyzer, with_pos,
                                   with_off, payload))
    parts = [p for p in parts if p is not None]
    if not parts:
        return None
    if len(parts) == 1:
        return parts[0]
    out = {k: np.concatenate([p[k] for p in parts])
           for k in ("doc_id", "term", "freq", "norm")}
    if with_pos:
        out["pos_blob"] = parts[0]["pos_blob"] + parts[1]["pos_blob"]
    if with_off:
        out["off_blob"] = parts[0]["off_blob"] + parts[1]["off_blob"]
    if payload is not None:
        out["pay_blob"] = parts[0]["pay_blob"] + parts[1]["pay_blob"]
    return out


def _vocab_map(uniq, analyzer: StandardAnalyzer):
    """Apply the post-lowercase filter chain (possessive → stop → stem,
    `StandardAnalyzer._finish`) to a batch's distinct-term vocabulary.
    Returns (keep_mask, mapped_terms) aligned with ``uniq``."""
    from ..analysis.en import get_stemmer, possessive_strip
    from ..analysis.folding import ascii_fold
    n = len(uniq)
    keep = np.ones(n, dtype=bool)
    mapped = np.empty(n, dtype=object)
    stem = get_stemmer(analyzer.stemmer)
    sw = analyzer.stop_words
    ov = dict(analyzer.stem_overrides) if analyzer.stem_overrides else None
    kw = analyzer.keyword_terms
    for i, t in enumerate(uniq):
        if analyzer.ascii_folding:
            t = ascii_fold(t)
        if analyzer.possessive:
            t = possessive_strip(t)
        if t in sw:
            keep[i] = False
            mapped[i] = t
            continue
        if ov is not None and t in ov:      # StemmerOverrideFilter
            mapped[i] = ov[t]
            continue
        if t in kw:                         # SetKeywordMarkerFilter
            mapped[i] = t
            continue
        mapped[i] = stem(t) if stem else t
    return keep, mapped


def _invert_vec(doc_ids, arr, analyzer: StandardAnalyzer, with_pos: bool,
                with_off: bool = False, payload=None):
    """Batch inversion of fallback-free rows (the web-text fast path).
    Offsets mode swaps findall for finditer (same C regex engine) to
    carry each token's (start, end) — fallback-free rows lowercase 1:1,
    so offsets on the lowered text index the original exactly."""
    if len(arr) == 0:
        return None
    flat_s = flat_e = None
    if with_off:
        spans = [[(m.group(0), m.start(), m.end())
                  for m in _TOKEN_RE.finditer(t.lower())] for t in arr]
        lists = [[x[0] for x in sp] for sp in spans]
        counts = np.fromiter(map(len, lists), dtype=np.int64,
                             count=len(lists))
        total = int(counts.sum())
        if total == 0:
            return None
        flat = [x[0] for sp in spans for x in sp]
        flat_s = np.fromiter((x[1] for sp in spans for x in sp),
                             dtype=np.int64, count=total)
        flat_e = np.fromiter((x[2] for sp in spans for x in sp),
                             dtype=np.int64, count=total)
    else:
        findall = _TOKEN_RE.findall
        lists = [findall(t.lower()) for t in arr]
        counts = np.fromiter(map(len, lists), dtype=np.int64,
                             count=len(lists))
        total = int(counts.sum())
        if total == 0:
            return None
        flat = list(chain.from_iterable(lists))
    local = np.repeat(np.arange(len(arr), dtype=np.int64), counts)
    cum0 = np.zeros(len(arr), dtype=np.int64)
    np.cumsum(counts[:-1], out=cum0[1:])
    pos = np.arange(total, dtype=np.int64) - np.repeat(cum0, counts)

    lens = np.fromiter(map(len, flat), dtype=np.int64, count=total)
    keep = lens <= analyzer.max_token_length
    flat = np.asarray(flat, dtype=object)
    if analyzer.possessive or analyzer.stemmer or analyzer.ascii_folding:
        # factorize-first: run the possessive/stop/stem chain once per
        # DISTINCT term in the batch (O(|vocab|) Python, not O(|tokens|)),
        # then scatter the mapped vocabulary back over the token stream
        codes0, uniq0 = pd.factorize(flat)
        keep_u, mapped_u = _vocab_map(uniq0, analyzer)
        keep &= keep_u[codes0]
        flat = mapped_u[codes0]
    else:
        sw = analyzer.stop_words
        if sw:
            keep &= np.fromiter((t not in sw for t in flat),
                                dtype=bool, count=total)
    if not keep.any():
        return None
    did_k = local[keep]
    term_k = flat[keep]
    pos_k = pos[keep]
    if with_off:
        s_k, e_k = flat_s[keep], flat_e[keep]
    if payload is not None:
        pay_k = _payload_values(term_k, pos_k, payload)

    dl = np.bincount(did_k, minlength=len(arr))
    nb = _NORM_LUT[np.minimum(dl, len(_NORM_LUT) - 1)].astype(np.int64)
    big = dl >= len(_NORM_LUT)
    if big.any():
        nb[big] = int_to_byte4(dl[big])

    codes, uniq = pd.factorize(term_k)
    order = np.lexsort((codes, did_k))   # stable: positions stay ascending
    d_s, c_s, p_s = did_k[order], codes[order], pos_k[order]
    change = np.r_[True, (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
    run_starts = np.flatnonzero(change)
    run_ends = np.r_[run_starts[1:], len(d_s)]
    out = {
        "doc_id": np.asarray(doc_ids)[d_s[run_starts]],
        "term": np.asarray(uniq, dtype=object)[c_s[run_starts]],
        "freq": (run_ends - run_starts).astype(np.int32),
        "norm": nb[d_s[run_starts]].astype(np.int32),
    }
    if with_pos:
        delta = p_s.copy()
        delta[1:] = p_s[1:] - p_s[:-1]
        delta[run_starts] = p_s[run_starts]
        buf, off = codec.vbyte_encode_batch(delta)
        out["pos_blob"] = [buf[off[s]:off[e]].tobytes()
                           for s, e in zip(run_starts, run_ends)]
    if with_off:
        # interleaved [Δstart, length] per occurrence; Δstart resets per
        # (doc, term) run (first value absolute), mirroring pos streams
        s_s, e_s = s_k[order], e_k[order]
        ds = s_s.copy()
        ds[1:] = s_s[1:] - s_s[:-1]
        ds[run_starts] = s_s[run_starts]
        inter = np.empty(2 * len(s_s), dtype=np.int64)
        inter[0::2] = ds
        inter[1::2] = e_s - s_s
        obuf, ooff = codec.vbyte_encode_batch(inter)
        out["off_blob"] = [obuf[ooff[2 * s]:ooff[2 * e]].tobytes()
                           for s, e in zip(run_starts, run_ends)]
    if payload is not None:
        # payload channel parallel to positions: one VByte value per
        # occurrence, NO delta (payloads are not monotone)
        pay_s = pay_k[order]
        pbuf, pyo = codec.vbyte_encode_batch(pay_s)
        out["pay_blob"] = [pbuf[pyo[s]:pyo[e]].tobytes()
                           for s, e in zip(run_starts, run_ends)]
    return out


def _invert_exact(doc_ids, arr, analyzer: StandardAnalyzer, with_pos: bool,
                  with_off: bool = False, payload=None):
    """Per-doc reference path for rows the batch path can't handle
    (mixed CJK scripts / exceptional lowercase)."""
    rows_doc, rows_term, rows_freq, rows_norm = [], [], [], []
    rows_pos, rows_off, rows_pay = [], [], []
    delimited = payload == "delimited"
    for did, text in zip(np.asarray(doc_ids), arr):
        doc_pay = None
        if with_off:
            occ = analyzer.term_occurrences(text or "")
            tp = {t: [p for p, _, _ in v] for t, v in occ.items()}
        elif delimited:
            tp, doc_pay = analyzer.term_positions_payloads(text or "")
        else:
            tp = analyzer.term_positions(text or "")
        if not tp:
            continue
        dl = sum(len(v) for v in tp.values())
        nbyte = (int(_NORM_LUT[dl]) if dl < len(_NORM_LUT)
                 else int(int_to_byte4(np.array([dl]))[0]))
        for term, ps in tp.items():
            rows_doc.append(did)
            rows_term.append(term)
            rows_freq.append(len(ps))
            rows_norm.append(nbyte)
            if with_pos:
                rows_pos.append(_vbyte_positions(ps))
            if with_off:
                inter = []
                prev = 0
                for _, st, en in occ[term]:
                    inter.append(st - prev)
                    inter.append(en - st)
                    prev = st
                rows_off.append(_vbyte_values(inter))
            if payload is not None:
                if delimited:
                    rows_pay.append(_vbyte_values(
                        [int(v) for v in doc_pay[term]]))
                else:
                    vals = _payload_values(
                        np.asarray([term] * len(ps), dtype=object),
                        np.asarray(ps, dtype=np.int64), payload)
                    rows_pay.append(_vbyte_values([int(v) for v in vals]))
    if not rows_doc:
        return None
    out = {
        "doc_id": np.asarray(rows_doc, dtype=np.int64),
        "term": np.asarray(rows_term, dtype=object),
        "freq": np.asarray(rows_freq, dtype=np.int32),
        "norm": np.asarray(rows_norm, dtype=np.int32),
    }
    if with_pos:
        out["pos_blob"] = rows_pos
    if with_off:
        out["off_blob"] = rows_off
    if payload is not None:
        out["pay_blob"] = rows_pay
    return out


def _vbyte_values(vals) -> bytes:
    """Plain VByte of a list of non-negative ints (no delta applied)."""
    out = bytearray()
    for d in vals:
        while d > 0x7F:
            out.append((d & 0x7F) | 0x80)
            d >>= 7
        out.append(d)
    return bytes(out)


@dataclass
class InvertedIndex:
    """The index = four DataFrames (persisted as sorted Parquet tables)."""

    postings: DataFrame
    terms: DataFrame
    norms: DataFrame
    stats: dict            # doc_count, sum_ttf, sum_df, max_doc, grid, fields
    analyzer: StandardAnalyzer = field(default_factory=lambda: ENGLISH_ANALYZER)
    with_positions: bool = False
    with_offsets: bool = False       # char offsets per occurrence stored
    with_payloads: bool = False      # per-occurrence payload channel
    raw: DataFrame | None = None     # persisted intermediate; release()-able
    timings: dict = field(default_factory=dict)   # per-stage build seconds

    @property
    def fields(self) -> list[str]:
        return sorted(self.stats.get("fields", {DEFAULT_FIELD: None}).keys())

    def field_stats(self, fld: str) -> dict:
        """Per-field collection statistics (docCount, sumTotalTermFreq) —
        `search/IndexSearcher.java:914-933`. Legacy single-field stats
        dicts fall back to the global numbers."""
        fs = self.stats.get("fields")
        if fs and fld in fs:
            return fs[fld]
        return {"doc_count": self.stats["doc_count"],
                "sum_ttf": self.stats["sum_ttf"],
                "sum_df": self.stats.get("sum_df", 0)}

    def release(self) -> None:
        """Unpersist every DataFrame this index pinned (builder's raw
        postings + any cached tables) — for multi-build sessions."""
        for df in (self.raw, self.postings, self.terms, self.norms):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass

    def cache(self, serving_partitions: int | None = None) -> "InvertedIndex":
        """Pin the index tables in memory for query serving.

        ``serving_partitions`` re-range-partitions the postings by bucket
        (whole cells per partition, kernel invariant preserved) before
        caching. Query latency is dominated by per-task Python round-trip
        overhead (~10-25 ms/task), so the serving layout should use FEW,
        FAT partitions — ~2× the executor cores — independent of the
        build's shuffle width, which wants to be much larger. The build
        width shards the expensive pack; the serving width bounds the
        per-query task count. (Solr has the same split: many indexing
        threads, few search shards per node.)"""
        if serving_partitions is not None:
            self.postings = (self.postings
                             .repartitionByRange(serving_partitions, "bucket")
                             .sortWithinPartitions("bucket", "field", "term",
                                                   "block_id"))
        self.postings = self.postings.cache()
        self.terms = self.terms.cache()
        self.norms = self.norms.cache()
        # materialize now so later queries reuse
        self.postings.count()
        self.terms.count()
        return self


def _shuffle_n(spark: SparkSession) -> int:
    """Shuffle width, robust to non-numeric conf values (AQE 'auto')."""
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (ValueError, TypeError):
        n = spark.sparkContext.defaultParallelism
    return max(n, spark.sparkContext.defaultParallelism * 2, 8)


class IndexBuilder:
    def __init__(self, analyzer: StandardAnalyzer = ENGLISH_ANALYZER,
                 grid: int = 1 << 17, head_df: int = 4096,
                 salt_target: int = 4096, with_positions: bool = False,
                 fields: tuple = (DEFAULT_FIELD,),
                 with_offsets: bool = False, payload=None):
        """grid: doc-range cell size blocks never cross — the query shard
        unit AND the skew bound (no term contributes more than `grid`
        postings to any pack task). head_df / salt_target are retained
        for manifest compatibility; the grid-cell shuffle subsumes them.
        fields: text columns to index; each column is a field and every
        Term is a (field, text) pair (`index/Term.java:69`).
        Sandbox default sizes; at cluster scale use grid=1<<17+ (same
        code path)."""
        self.analyzer = analyzer
        self.grid = grid
        self.head_df = head_df
        self.salt_target = salt_target
        # offsets (IndexOptions DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS,
        # index/IndexOptions.java:25-53) imply positions; so do payloads —
        # in the reference the payload stream rides the positions stream
        # (Lucene84PostingsWriter.addPosition), there is no payloads-
        # without-positions IndexOption
        self.with_offsets = with_offsets
        self.with_positions = (with_positions or with_offsets
                               or payload is not None)
        # payload channel (Lucene84PostingsWriter.addPosition's payload
        # stream, PayloadAttribute): None, "position", "term_len", or a
        # (term, position) -> int callable (e.g. model term-importance)
        self.payload = payload
        self.fields = tuple(fields)

    # ------------------------------------------------------------------
    # stage 1: invert (narrow)
    # ------------------------------------------------------------------
    def invert(self, docs: DataFrame, doc_id_col="doc_id",
               text_col: str | None = None,
               fields: tuple | None = None) -> DataFrame:
        flds = self._resolve_fields(text_col, fields)
        analyzer = self.analyzer
        with_pos = self.with_positions
        with_off = self.with_offsets
        payload = self.payload

        def invert_batches(batches):
            for pdf in batches:
                dids = pdf[doc_id_col].to_numpy()
                frames = []
                for fld in flds:
                    # PerFieldAnalyzerWrapper: resolve the chain per
                    # field; each resolved analyzer picks its own
                    # batch-vs-per-doc invert path independently
                    an = (analyzer.for_field(fld)
                          if hasattr(analyzer, "for_field") else analyzer)
                    arrs = invert_field_arrays(dids, pdf[fld], an,
                                               with_pos, with_off, payload)
                    if arrs is None:
                        continue
                    n = len(arrs["doc_id"])
                    frames.append(pd.DataFrame({
                        "doc_id": pd.Series(arrs["doc_id"], dtype="int64"),
                        "field": pd.Series([fld] * n, dtype="object"),
                        "term": pd.Series(arrs["term"], dtype="object"),
                        "freq": pd.Series(arrs["freq"], dtype="int32"),
                        "norm": pd.Series(arrs["norm"], dtype="int32"),
                        "pos_blob": pd.Series(
                            arrs.get("pos_blob", [None] * n), dtype="object"),
                        "off_blob": pd.Series(
                            arrs.get("off_blob", [None] * n), dtype="object"),
                        "pay_blob": pd.Series(
                            arrs.get("pay_blob", [None] * n), dtype="object"),
                    }))
                if frames:
                    yield pd.concat(frames, ignore_index=True)

        return docs.select(doc_id_col, *flds).mapInPandas(
            invert_batches, schema=RAW_SCHEMA)

    def _resolve_fields(self, text_col, fields) -> tuple:
        if fields is not None:
            return tuple(fields)
        if text_col is not None:
            return (text_col,)
        return self.fields

    # ------------------------------------------------------------------
    # full build
    # ------------------------------------------------------------------
    def build(self, spark: SparkSession, docs: DataFrame,
              doc_id_col="doc_id", text_col: str | None = None,
              fields: tuple | None = None) -> InvertedIndex:
        # Decouple invert parallelism from the input's file layout: a 1 GB
        # corpus in ~30 MB files coalesces to <10 scan partitions under
        # maxPartitionBytes, which would serialize the (Python-bound)
        # analyzer stage. Round-robin repartition = the DWPT work-queue
        # analog; index content is order-independent, so this is safe.
        import time as _time
        flds = self._resolve_fields(text_col, fields)
        timings: dict = {}
        t0 = _time.perf_counter()
        # Bigger Arrow batches for the build: the vectorized invert/pack
        # kernels amortize per-batch fixed costs (regex setup, factorize,
        # buffer concat) — 10k-row default batches are too fine-grained
        # for posting-row streams. 50k docs ≈ 30 MB of web text per batch.
        # The session value is RESTORED in the finally below (ADVICE r2:
        # never leak config onto unrelated jobs); the invert stage — the
        # expensive Python one — materializes inside this scope, so it
        # gets the wide batches; the lazy pack stage runs under the
        # caller's own setting.
        prev_batch = None
        try:
            prev_batch = spark.conf.get(
                "spark.sql.execution.arrow.maxRecordsPerBatch")
            if int(prev_batch) < 50000:
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
            else:
                prev_batch = None    # nothing changed, nothing to restore
        except Exception:
            prev_batch = None
        try:
            return self._build_inner(spark, docs, doc_id_col, flds, timings)
        finally:
            if prev_batch is not None:
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch",
                    prev_batch)

    def _build_inner(self, spark: SparkSession, docs: DataFrame,
                     doc_id_col, flds, timings) -> InvertedIndex:
        import time as _time
        t0 = _time.perf_counter()
        n_inv = _shuffle_n(spark)
        # THE one wide shuffle of the build moves the DOCUMENTS, keyed by
        # grid cell (whole cells per partition — equal bucket values can
        # never split across range partitions), BEFORE inversion. The
        # invert output is then already bucket-partitioned, so the pack
        # stage needs only a partition-local sort — no second shuffle of
        # the (larger) raw-postings stream. This also decouples invert
        # parallelism from the input file layout, and the doc-range key
        # bounds skew structurally exactly like the old postings shuffle.
        docs_b = (docs.select(doc_id_col, *flds)
                  .withColumn("__cell", F.expr(f"{doc_id_col} div {self.grid}"))
                  .repartitionByRange(n_inv, "__cell"))
        raw = self.invert(docs_b, doc_id_col, fields=flds)
        # One logical pass feeds three aggregations; cache the (much smaller
        # than the corpus) raw postings to avoid re-running the analyzer.
        # At cluster scale this is a checkpoint table instead (catalog.py).
        # The cache preserves the bucket partitioning (all ops below are
        # narrow).
        raw = raw.persist()
        raw.count()
        timings["invert_sec"] = round(_time.perf_counter() - t0, 3)
        t0 = _time.perf_counter()

        # --- per-field term dictionary + singleton pulsing (shuffle w/
        # partial agg). Terms are (field, text) pairs.
        terms = (raw.groupBy("field", "term")
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
            max(4, spark.sparkContext.defaultParallelism // 2), "field", "term"
        ).sortWithinPartitions("field", "term").persist()

        # --- per-(field, doc) norms + per-field collection stats
        norms = (raw.groupBy("field", "doc_id")
                 .agg(F.sum("freq").alias("dl"), F.max("norm").alias("norm"))
                 .repartitionByRange(max(4, spark.sparkContext.defaultParallelism // 2),
                                     "doc_id")
                 .sortWithinPartitions("field", "doc_id")).persist()
        frows = (norms.groupBy("field")
                 .agg(F.count("*").alias("doc_count"),
                      F.sum("dl").alias("sum_ttf"))).collect()
        sdf_rows = terms.groupBy("field").agg(F.sum("df").alias("sum_df")).collect()
        sdf = {r["field"]: int(r["sum_df"]) for r in sdf_rows}
        fstats = {r["field"]: {"doc_count": int(r["doc_count"]),
                               "sum_ttf": int(r["sum_ttf"]),
                               "sum_df": sdf.get(r["field"], 0)}
                  for r in frows}
        grow = norms.agg(F.countDistinct("doc_id").alias("doc_count"),
                         F.max("doc_id").alias("max_doc")).collect()[0]
        stats = {"doc_count": int(grow["doc_count"]),
                 "sum_ttf": sum(v["sum_ttf"] for v in fstats.values()),
                 "sum_df": sum(v["sum_df"] for v in fstats.values()),
                 "max_doc": int(grow["max_doc"]),
                 "grid": self.grid,
                 "fields": fstats}
        timings["dict_norms_stats_sec"] = round(_time.perf_counter() - t0, 3)
        t0 = _time.perf_counter()

        # --- pack: NARROW, directly into the final doc-sharded layout.
        # The docs shuffle above already placed whole grid cells per
        # partition (the Solr shard model, QueryComponent.java:810
        # mergeIds), so packing is a partition-local JVM sort by
        # (bucket, field, term, doc_id) + a narrow mapInPandas that walks
        # the sorted runs and emits 128-posting blocks. Head-term skew is
        # handled STRUCTURALLY: a term's postings are split at grid-cell
        # boundaries, so no per-term list ever exceeds `grid` docs — the
        # salted split (salt == doc range) taken to its limit, preserving
        # docID order by construction. Query-time kernels need NO
        # shuffle: filter(term) is narrow and every cell's blocks are
        # contiguous; Parquet row-group stats on the (bucket, field,
        # term) sort order still prune term lookups on disk.
        grid = self.grid
        with_pos = self.with_positions
        with_off = self.with_offsets
        with_pay = self.payload is not None

        def pack(batches):
            yield from pack_partition(batches, grid, with_pos, with_off,
                                      with_pay)

        postings = (raw.withColumn("bucket", F.expr(f"doc_id div {grid}"))
                    .sortWithinPartitions("bucket", "field", "term", "doc_id")
                    .mapInPandas(pack, schema=POSTINGS_SCHEMA))

        timings["pack_plan_sec"] = round(_time.perf_counter() - t0, 3)
        # pack/layout stage is lazy; callers time its materialization
        idx = InvertedIndex(postings=postings, terms=terms, norms=norms,
                            stats=stats, analyzer=self.analyzer,
                            with_positions=self.with_positions,
                            with_offsets=self.with_offsets,
                            with_payloads=with_pay, raw=raw,
                            timings=timings)
        return idx


_PACK_MIN_ROWS = 50_000


def _rebatch(batches, min_rows: int = _PACK_MIN_ROWS):
    """Coalesce small Arrow batches to >= min_rows before processing.

    The pack kernel's per-batch fixed costs (concat, numpy run
    detection, buffer setup) want wide batches, but the stage is LAZY —
    it may materialize after build() has restored the caller's
    spark.sql.execution.arrow.maxRecordsPerBatch (often the 10k
    default). Re-batching inside the iterator makes pack throughput
    independent of the session's Arrow batch setting entirely."""
    hold, n = [], 0
    for pdf in batches:
        if len(pdf) == 0:
            continue
        hold.append(pdf)
        n += len(pdf)
        if n >= min_rows:
            yield (pd.concat(hold, ignore_index=True)
                   if len(hold) > 1 else hold[0])
            hold, n = [], 0
    if hold:
        yield (pd.concat(hold, ignore_index=True)
               if len(hold) > 1 else hold[0])


def pack_partition(batches, grid: int, with_pos: bool,
                   with_off: bool = False, with_pay: bool = False):
    """Pack a bucket-range partition of sorted raw postings into block rows.

    Input arrives sorted by (bucket, field, term, doc_id); every (bucket,
    field, term) run becomes 128-posting blocks (Lucene84PostingsWriter.
    startDoc semantics: Δ-from-previous-doc, FOR full blocks, VByte tail)
    with inline norm bytes, competitive-impact skylines, optional packed
    positions. The trailing run of each Arrow batch is buffered — it may
    continue in the next batch.
    """
    buf = None
    for pdf in _rebatch(batches):
        if buf is not None:
            pdf = pd.concat([buf, pdf], ignore_index=True)
            buf = None
        if len(pdf) == 0:
            continue
        b = pdf["bucket"].to_numpy()
        t = pdf["term"].to_numpy()
        fl = pdf["field"].to_numpy()
        same_last = (b == b[-1]) & (t == t[-1]) & (fl == fl[-1])
        nz = np.flatnonzero(~same_last)
        start_last = int(nz[-1]) + 1 if len(nz) else 0
        buf = pdf.iloc[start_last:]
        head = pdf.iloc[:start_last]
        if len(head):
            yield _pack_frame(head, grid, with_pos, with_off, with_pay)
    if buf is not None and len(buf):
        yield _pack_frame(buf, grid, with_pos, with_off, with_pay)


_TAIL_TAG = bytes([codec._TAG_VBYTE])


def _pack_frame(pdf: pd.DataFrame, grid: int, with_pos: bool,
                with_off: bool = False,
                with_pay: bool = False) -> pd.DataFrame:
    """Vectorized run→block packing: doc deltas and VByte tails are
    computed for the whole frame in batch numpy passes; per-block Python
    is reduced to buffer slicing plus FOR/PFOR encodes for full blocks."""
    docs = pdf["doc_id"].to_numpy()
    n = len(docs)
    fields_arr = pdf["field"].to_numpy()
    terms_arr = pdf["term"].to_numpy()
    buckets = pdf["bucket"].to_numpy()
    freqs = pdf["freq"].to_numpy().astype(np.int64)
    norms_u8 = pdf["norm"].to_numpy().astype(np.uint8)
    poss = pdf["pos_blob"].to_numpy() if with_pos else None
    offs = pdf["off_blob"].to_numpy() if with_off else None
    pays = pdf["pay_blob"].to_numpy() if with_pay else None

    change = np.r_[True, (buckets[1:] != buckets[:-1])
                   | (terms_arr[1:] != terms_arr[:-1])
                   | (fields_arr[1:] != fields_arr[:-1])]
    run_starts = np.flatnonzero(change)
    run_ends = np.r_[run_starts[1:], n]
    run_lens = run_ends - run_starts
    nblocks = (run_lens + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
    total_blocks = int(nblocks.sum())
    block_run = np.repeat(np.arange(len(run_starts)), nblocks)
    cumb = np.zeros(len(nblocks), dtype=np.int64)
    np.cumsum(nblocks[:-1], out=cumb[1:])
    within = np.arange(total_blocks, dtype=np.int64) - cumb[block_run]
    b_start = run_starts[block_run] + within * codec.BLOCK_SIZE
    b_end = np.minimum(b_start + codec.BLOCK_SIZE, run_ends[block_run])
    b_len = b_end - b_start

    # global Δ stream; first-of-block Δ is 1 (block base = first_doc - 1)
    delta = docs.copy()
    delta[1:] = docs[1:] - docs[:-1]
    delta[b_start] = 1
    dbuf, doff = codec.vbyte_encode_batch(delta)
    fbuf, foff = codec.vbyte_encode_batch(freqs)

    full = codec.BLOCK_SIZE
    doc_blobs, freq_blobs, norm_blobs = [], [], []
    imp_f, imp_n, pos_blobs, off_blobs = [], [], [], []
    pay_blobs = []
    for i in range(total_blocks):
        s, e = int(b_start[i]), int(b_end[i])
        if b_len[i] == full:
            doc_blobs.append(codec.encode_for(delta[s:e]))
            freq_blobs.append(codec.encode_pfor(freqs[s:e]))
        else:
            doc_blobs.append(_TAIL_TAG + dbuf[doff[s]:doff[e]].tobytes())
            freq_blobs.append(_TAIL_TAG + fbuf[foff[s]:foff[e]].tobytes())
        norm_blobs.append(norms_u8[s:e].tobytes())
        if e - s == 1:
            imp_f.append([int(freqs[s])])
            imp_n.append([int(norms_u8[s])])
        elif e - s <= 8:
            # tiny blocks dominate run counts: pure-Python pareto sweep
            # (identical result to functions.impacts.skyline, no numpy
            # per-call overhead)
            out_f, out_n = [], []
            mx, prev_n = -1, None
            for fv, nv in sorted(zip(freqs[s:e].tolist(),
                                     norms_u8[s:e].tolist()),
                                 key=lambda p: (p[1], -p[0])):
                if nv == prev_n:
                    continue
                prev_n = nv
                if fv > mx:
                    out_f.append(fv)
                    out_n.append(nv)
                    mx = fv
            imp_f.append(out_f)
            imp_n.append(out_n)
        else:
            sf, sn = skyline(freqs[s:e], norms_u8[s:e])
            imp_f.append(sf.astype(np.int32).tolist())
            imp_n.append(sn.astype(np.int32).tolist())
        if with_pos:
            # bytes.join accepts any bytes-like element (bytes/bytearray/
            # memoryview) — no per-element copy
            pos_blobs.append(b"".join(poss[s:e]))
        else:
            pos_blobs.append(None)
        if with_off:
            off_blobs.append(b"".join(offs[s:e]))
        else:
            off_blobs.append(None)
        if with_pay:
            pay_blobs.append(b"".join(pays[s:e]))
        else:
            pay_blobs.append(None)

    return pd.DataFrame({
        "field": pd.Series(fields_arr[b_start], dtype="object"),
        "term": pd.Series(terms_arr[b_start], dtype="object"),
        "bucket": pd.Series(buckets[b_start], dtype="int64"),
        "block_id": pd.Series(docs[b_start], dtype="int64"),
        "doc_count": pd.Series(b_len, dtype="int32"),
        "last_doc": pd.Series(docs[b_end - 1], dtype="int64"),
        "doc_blob": pd.Series(doc_blobs, dtype="object"),
        "freq_blob": pd.Series(freq_blobs, dtype="object"),
        "norm_blob": pd.Series(norm_blobs, dtype="object"),
        "imp_freqs": pd.Series(imp_f, dtype="object"),
        "imp_norms": pd.Series(imp_n, dtype="object"),
        "pos_blob": pd.Series(pos_blobs, dtype="object"),
        "off_blob": pd.Series(off_blobs, dtype="object"),
        "pay_blob": pd.Series(pay_blobs, dtype="object"),
    })


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


def decode_offsets_flat(off_blob: bytes, freqs: np.ndarray):
    """(starts, ends) flat arrays for a block's packed offsets blob —
    interleaved [Δstart, length] per occurrence, Δstart delta-from-zero
    per doc stream (vectorized segmented cumsum, like positions)."""
    f = np.asarray(freqs, dtype=np.int64)
    total = int(f.sum())
    flat = codec.vbyte_decode(bytes(off_blob), 2 * total)
    if total == 0:
        return flat, flat
    ds, ln = flat[0::2], flat[1::2]
    csum = np.cumsum(ds)
    starts0 = np.zeros(len(f), dtype=np.int64)
    np.cumsum(f[:-1], out=starts0[1:])
    base = np.repeat(csum[starts0 - 1] * (starts0 > 0), f)
    starts = csum - base
    return starts, starts + ln


def decode_positions_flat(pos_blob: bytes, freqs: np.ndarray) -> np.ndarray:
    """All positions of a block as one flat array (per-doc streams are
    delta-from-zero; vectorized segmented cumsum, no per-doc loop)."""
    f = np.asarray(freqs, dtype=np.int64)
    total = int(f.sum())
    flat = codec.vbyte_decode(bytes(pos_blob), total)
    if total == 0:
        return flat
    csum = np.cumsum(flat)
    starts = np.zeros(len(f), dtype=np.int64)
    np.cumsum(f[:-1], out=starts[1:])
    # subtract the running total at each doc boundary to restart the cumsum
    base = np.repeat(csum[starts - 1] * (starts > 0), f)
    return csum - base


def decode_payloads_flat(pay_blob: bytes, freqs: np.ndarray) -> np.ndarray:
    """All payloads of a block as one flat array, position-parallel —
    plain VByte values, no delta (payloads are not monotone)."""
    total = int(np.asarray(freqs, dtype=np.int64).sum())
    return codec.vbyte_decode(bytes(pay_blob), total)

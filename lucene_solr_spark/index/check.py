"""CheckIndex analog — full-index invariant verification.

The reference's `index/CheckIndex.java:83` re-reads every structure and
cross-checks them (postings monotonicity, docFreq/totalTermFreq
consistency, impacts vs actual maxima). Spark restatement: one narrow
pass decodes every block and emits per-block facts; cheap aggregations
cross-check them against the term dictionary, norms and stats tables.

Checked invariants:
  B1 docIDs strictly increase inside every block
  B2 a block never spans a grid-cell boundary; block_id == first doc;
     last_doc column matches the decoded last doc
  B3 freqs >= 1; norm bytes present for every posting
  B4 the impact skyline DOMINATES the block: for every (freq, norm) in
     the block there is a skyline pair with freq' >= freq whose norm
     yields a score >= the posting's (we check the skyline contains the
     max freq per norm)
  T1 df(term) == Σ block doc_count; ttf(term) == Σ block freqs
  T2 singleton pulsing: df == 1 iff singleton_doc is set and matches
  N1 norms.dl > 0; stats.doc_count == |norms|; stats.sum_ttf == Σ dl
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..functions.impacts import dominates
from .builder import InvertedIndex, decode_postings_block

BLOCK_FACTS_SCHEMA = ("field string, term string, bucket long, block_id long, "
                      "doc_count int, sum_freq long, ok boolean, err string")


def _block_facts(batches, grid: int):
    for pdf in batches:
        flds, terms, buckets, bids, dcs, sfs, oks, errs = [], [], [], [], [], [], [], []
        for row in pdf.itertuples(index=False):
            r = row._asdict()
            err = ""
            freqs = np.zeros(0, dtype=np.int64)
            try:
                docs, freqs, norms = decode_postings_block(r)
                if len(docs) != r["doc_count"]:
                    err = f"count {len(docs)} != {r['doc_count']}"
                elif np.any(np.diff(docs) <= 0):
                    err = "docs not strictly increasing"          # B1
                elif int(docs[0]) != r["block_id"]:
                    err = "block_id != first doc"                 # B2
                elif int(docs[-1]) != r["last_doc"]:
                    err = "last_doc mismatch"                     # B2
                elif docs[0] // grid != docs[-1] // grid:
                    err = "block spans grid cells"                # B2
                elif docs[0] // grid != r["bucket"]:
                    err = "bucket mismatch"                       # B2
                elif np.any(freqs < 1):
                    err = "freq < 1"                              # B3
                elif len(norms) != len(docs):
                    err = "norm bytes missing"                    # B3
                elif not dominates(np.asarray(r["imp_freqs"]),
                                   np.asarray(r["imp_norms"]),
                                   freqs, norms):
                    err = "impact skyline does not dominate block"    # B4
            except Exception as e:          # decode failure is a finding
                err = f"decode: {e}"
            flds.append(r["field"])
            terms.append(r["term"])
            buckets.append(r["bucket"])
            bids.append(r["block_id"])
            dcs.append(r["doc_count"])
            sfs.append(int(np.sum(freqs)) if not err else 0)
            oks.append(err == "")
            errs.append(err)
        yield pd.DataFrame({
            "field": pd.Series(flds, dtype="object"),
            "term": pd.Series(terms, dtype="object"),
            "bucket": pd.Series(buckets, dtype="int64"),
            "block_id": pd.Series(bids, dtype="int64"),
            "doc_count": pd.Series(dcs, dtype="int32"),
            "sum_freq": pd.Series(sfs, dtype="int64"),
            "ok": pd.Series(oks, dtype="bool"),
            "err": pd.Series(errs, dtype="object"),
        })


def check_index(idx: InvertedIndex) -> dict:
    """Run every invariant; returns {ok, errors: [...], counts: {...}}."""
    grid = idx.stats["grid"]
    errors: list[str] = []

    facts = idx.postings.mapInPandas(
        lambda it: _block_facts(it, grid), schema=BLOCK_FACTS_SCHEMA).cache()
    bad = facts.filter(~F.col("ok")).select("term", "block_id", "err").limit(20)
    for r in bad.collect():
        errors.append(f"block {r['term']}@{r['block_id']}: {r['err']}")

    # T1: dictionary consistency (Terms are (field, text) pairs)
    per_term = facts.groupBy("field", "term").agg(
        F.sum("doc_count").alias("df_blocks"),
        F.sum("sum_freq").alias("ttf_blocks"))
    t = idx.terms.join(per_term, ["field", "term"], "full_outer")
    t_bad = t.filter(
        F.col("df_blocks").isNull() | F.col("df").isNull() |
        (F.col("df") != F.col("df_blocks")) |
        (F.col("ttf") != F.col("ttf_blocks"))).limit(20)
    for r in t_bad.collect():
        errors.append(
            f"term {r['term']}: dict df={r['df']} ttf={r['ttf']} vs blocks "
            f"df={r['df_blocks']} ttf={r['ttf_blocks']}")

    # T2: singleton pulsing
    s_bad = idx.terms.filter(
        ((F.col("df") == 1) & F.col("singleton_doc").isNull()) |
        ((F.col("df") != 1) & F.col("singleton_doc").isNotNull())).limit(20)
    for r in s_bad.collect():
        errors.append(f"term {r['term']}: singleton pulsing violated")

    # N1: norms + stats (norms are per (field, doc); global doc_count is
    # distinct docs with any indexed field)
    nrow = idx.norms.agg(F.countDistinct("doc_id").alias("n"),
                         F.sum("dl").alias("s"),
                         F.min("dl").alias("mn")).collect()[0]
    if int(nrow["n"]) != idx.stats["doc_count"]:
        errors.append(f"stats.doc_count {idx.stats['doc_count']} != "
                      f"|norms docs| {nrow['n']}")
    if int(nrow["s"]) != idx.stats["sum_ttf"]:
        errors.append(f"stats.sum_ttf {idx.stats['sum_ttf']} != "
                      f"sum(dl) {nrow['s']}")
    if nrow["mn"] is not None and int(nrow["mn"]) <= 0:
        errors.append("norms.dl <= 0")

    counts = {"blocks": facts.count(),
              "terms": idx.terms.count(),
              "docs": int(nrow["n"])}
    facts.unpersist()
    return {"ok": not errors, "errors": errors, "counts": counts}

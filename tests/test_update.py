"""update_documents (IndexWriter.updateDocument analog —
index/IndexWriter.java:1514 atomic delete+add).

Pins the two halves of the Lucene update contract:
- BEFORE merge: old versions are hidden from matches but still count in
  every statistic (delete-only-hides), new versions extend the stats.
- AFTER expunge_deletes: the index is indistinguishable from a fresh
  build over the patched corpus (same doc_ids) — scores included.
"""

import numpy as np
import pandas as pd

from lucene_solr_spark.analysis.analyzer import StandardAnalyzer
from lucene_solr_spark.index import IndexBuilder, update_documents
from lucene_solr_spark.index.deletes import expunge_deletes, live_doc_count
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import TermQuery

ANN = StandardAnalyzer(stop_words=frozenset())
ROWS = [
    "merge spark table fast",          # 0 — replaced
    "spark table join",                # 1
    "merge merge key agg",             # 2 — replaced
    "fast scan filter",                # 3
    "key agg merge",                   # 4
    "table scan spark",                # 5
]
NEW_TEXT = {0: "refreshed merge content alpha",
            2: "refreshed content beta"}      # doc 2 loses its merges


def _build(spark, rows_with_ids, grid=8):
    docs = spark.createDataFrame(rows_with_ids, "doc_id long, text string")
    b = IndexBuilder(ANN, grid=grid, with_positions=True)
    idx = b.build(spark, docs)
    idx.postings = idx.postings.cache()
    return b, idx


def _updated(spark):
    b, idx = _build(spark, list(enumerate(ROWS)))
    repl = spark.createDataFrame(
        [(6, NEW_TEXT[0]), (7, NEW_TEXT[2])], "doc_id long, text string")
    idx2 = update_documents(spark, idx, repl, [0, 2], b)
    return b, idx, idx2


def test_update_hides_old_matches_new(spark):
    _, idx, idx2 = _updated(spark)
    s2 = Searcher(spark, idx2)
    got = s2.top_k(TermQuery("merge"), k=10)
    ids = set(got["doc_id"].astype(int))
    assert 0 not in ids and 2 not in ids        # old versions hidden
    assert 6 in ids                             # new version matches
    assert 7 not in ids                         # its text has no 'merge'
    assert 4 in ids
    assert live_doc_count(idx2) == 6            # 8 docs − 2 tombstones


def test_update_stats_count_tombstones(spark):
    """df('merge') after update = 3 old (docs 0,2,4) + 1 new (doc 6) —
    the hidden versions still count (delete only hides)."""
    _, idx, idx2 = _updated(spark)
    s2 = Searcher(spark, idx2)
    st = s2.term_stats([("text", "merge")])
    assert st[("text", "merge")][0] == 4    # (df, ttf)
    # and therefore a matching doc's score differs from a fresh rebuild
    patched = [(i, NEW_TEXT.get(i, t)) for i, t in enumerate(ROWS)]
    _, fresh = _build(spark, patched)
    sf = Searcher(spark, fresh)
    sc_upd = dict(zip(
        *(lambda g: (g["doc_id"].astype(int), g["score"]))(
            s2.top_k(TermQuery("spark"), k=10))))
    sc_fresh = dict(zip(
        *(lambda g: (g["doc_id"].astype(int), g["score"]))(
            sf.top_k(TermQuery("spark"), k=10))))
    assert sc_upd[1] != sc_fresh[1]


def test_expunge_equals_fresh_build(spark):
    """expunge(update(idx)) ≡ fresh build over the patched corpus with
    the same doc_ids — scores bit-equal (f64 path, 10 digits)."""
    b, idx, idx2 = _updated(spark)
    merged = expunge_deletes(spark, idx2)
    patched = [(i, t) for i, t in enumerate(ROWS) if i not in NEW_TEXT]
    patched += [(6, NEW_TEXT[0]), (7, NEW_TEXT[2])]
    _, fresh = _build(spark, patched)
    sm = Searcher(spark, merged)
    sf = Searcher(spark, fresh)
    for term in ("merge", "spark", "table", "key"):
        gm = sm.top_k(TermQuery(term), k=10)
        gf = sf.top_k(TermQuery(term), k=10)
        pd.testing.assert_frame_equal(
            gm.reset_index(drop=True), gf.reset_index(drop=True))


def test_update_requires_fresh_ids(spark):
    import pytest
    b, idx = _build(spark, list(enumerate(ROWS)))
    repl = spark.createDataFrame([(3, "x y z")], "doc_id long, text string")
    with pytest.raises(ValueError, match="append requires doc_ids above"):
        update_documents(spark, idx, repl, [3], b)

"""CursorMark deep paging + ComplexPhraseQueryParser pins."""

from lucene_solr_spark.analysis.analyzer import StandardAnalyzer
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import TermQuery
from lucene_solr_spark.search.extras import cursor_page, sort_by_fields
from lucene_solr_spark.search.multiterm import complex_phrase_query

ANN = StandardAnalyzer(stop_words=frozenset())


def _mk(spark):
    rows = []
    for i in range(23):
        lang = [None, "de", "en", "fr"][i % 4]       # includes nulls
        rows.append((i, "zz " + ("spark " if i % 2 else "merge "),
                     lang, (i * 7) % 5))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n int")
    idx = IndexBuilder(ANN, grid=4, with_positions=True).build(spark, docs)
    idx.postings = idx.postings.cache()
    return docs, Searcher(spark, idx)


def test_cursor_walk_equals_global_order(spark):
    """Walking every page via cursors reproduces the one-shot global
    sort exactly — including null lang rows under nulls-last — and no
    row is skipped or repeated (CursorMark.java contract)."""
    docs, s = _mk(spark)
    keys = [("lang", True, True), ("n", False, False)]
    full = sort_by_fields(s, TermQuery("zz"), docs, keys, k=1000).collect()
    assert len(full) == 23
    walked, cursor = [], None
    while True:
        page = cursor_page(s, TermQuery("zz"), docs, keys, k=4,
                           cursor=cursor).collect()
        if not page:
            break
        walked.extend(page)
        last = page[-1]
        if last["lang"] is None:
            # a null cursor key is not serializable here — the nulls-last
            # tail is the final run; page through it by doc_id via the
            # fact that remaining rows all have null lang
            remaining = [r for r in full if len(walked) and
                         r["doc_id"] not in {x["doc_id"] for x in walked}]
            walked.extend(remaining)
            break
        cursor = (last["lang"], last["n"], last["doc_id"])
    assert [r["doc_id"] for r in walked] == [r["doc_id"] for r in full]


def test_cursor_page_no_overlap(spark):
    docs, s = _mk(spark)
    keys = [("n", True, False)]
    p1 = cursor_page(s, TermQuery("zz"), docs, keys, k=5).collect()
    last = p1[-1]
    p2 = cursor_page(s, TermQuery("zz"), docs, keys, k=5,
                     cursor=(last["n"], last["doc_id"])).collect()
    ids1 = {r["doc_id"] for r in p1}
    ids2 = {r["doc_id"] for r in p2}
    assert not (ids1 & ids2)
    full = sort_by_fields(s, TermQuery("zz"), docs, keys, k=10).collect()
    assert [r["doc_id"] for r in full] == (
        [r["doc_id"] for r in p1] + [r["doc_id"] for r in p2])


def test_complex_phrase_expansion(spark):
    docs, s = _mk(spark)
    q = complex_phrase_query(s, "zz sp*")
    got = s.top_k(q, k=30)
    # every odd doc has "zz spark"; merge docs must not match
    assert sorted(got["doc_id"].astype(int)) == [i for i in range(23)
                                                 if i % 2]
    # unmatched wildcard slot → matches nothing
    q2 = complex_phrase_query(s, "zz qq*")
    assert len(s.top_k(q2, k=5)) == 0

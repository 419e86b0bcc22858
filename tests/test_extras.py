"""Extras operators: synonym stats semantics, searchAfter page algebra,
boost linearity, constant-score, sort-by-field, postings reader."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher, parse_query
from lucene_solr_spark.search import extras
from lucene_solr_spark.search.ast import TermQuery
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").cache())


@pytest.fixture(scope="module")
def searcher(spark, docs):
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=128,
                       with_positions=True).build(spark, docs).cache()
    return Searcher(spark, idx)


def test_postings_rows_match_score_all(searcher):
    rows = extras.postings_rows(searcher, ["spark"]).orderBy("doc_id")
    scored = searcher.score_all(TermQuery("spark")).orderBy("doc_id")
    assert [r["doc_id"] for r in rows.collect()] == \
        [r["doc_id"] for r in scored.collect()]
    # freqs positive, norms are valid bytes
    bad = rows.filter((F.col("freq") <= 0) | (F.col("norm") < 0) |
                      (F.col("norm") > 255))
    assert bad.count() == 0


def test_synonym_reduces_to_term_for_singleton(searcher):
    syn = extras.synonym_score_all(searcher, ["spark"]).orderBy("doc_id")
    term = searcher.score_all(TermQuery("spark"), mode="f64").orderBy("doc_id")
    a = [(r["doc_id"], round(r["score"], 9)) for r in syn.collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in term.collect()]
    assert a == b


def test_synonym_matches_union_of_docs(searcher):
    syn = extras.synonym_score_all(searcher, ["spark", "merge"])
    union = (searcher.match_docs(TermQuery("spark"))
             .union(searcher.match_docs(TermQuery("merge"))).distinct())
    assert syn.count() == union.count()


def test_blended_reduces_to_term_for_singleton(searcher):
    bl = extras.blended_term_score_all(searcher, ["spark"]).orderBy("doc_id")
    term = searcher.score_all(TermQuery("spark"), mode="f64").orderBy("doc_id")
    a = [(r["doc_id"], round(r["score"], 9)) for r in bl.collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in term.collect()]
    assert a == b


def test_blended_uses_blended_df_not_per_term(searcher):
    # per-term idf would give 'spark'-only docs their native idf; the
    # blended query lifts BOTH terms to max(df) — so on a doc matching
    # only the RARER term, blended score < plain TermQuery score
    st = searcher.term_stats([("text", "spark"), ("text", "merge")])
    rare = min(("spark", "merge"), key=lambda t: st[("text", t)][0])
    if st[("text", "spark")][0] == st[("text", "merge")][0]:
        pytest.skip("corpus gives equal dfs")
    bl = extras.blended_term_score_all(searcher, ["spark", "merge"], tie=0.0)
    only_rare = (searcher.match_docs(TermQuery(rare))
                 .exceptAll(searcher.match_docs(
                     TermQuery("spark" if rare == "merge" else "merge"))))
    native = searcher.score_all(TermQuery(rare), mode="f64")
    j = (bl.join(only_rare, "doc_id")
         .join(native.withColumnRenamed("score", "nat"), "doc_id"))
    rows = j.collect()
    assert rows and all(r["score"] < r["nat"] - 1e-12 for r in rows)


def test_blended_dismax_vs_bool_rewrite(searcher):
    # tie=1.0 dismax == boolean-rewrite sum; tie=0 == pure max <= sum
    dm1 = extras.blended_term_score_all(searcher, ["spark", "merge"],
                                        tie=1.0).orderBy("doc_id")
    bs = extras.blended_term_score_all(searcher, ["spark", "merge"],
                                       disjunction_max=False).orderBy("doc_id")
    a = [(r["doc_id"], round(r["score"], 9)) for r in dm1.collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in bs.collect()]
    assert a == b
    dm0 = extras.blended_term_score_all(searcher, ["spark", "merge"], tie=0.0)
    j = dm0.withColumnRenamed("score", "mx").join(bs, "doc_id").collect()
    assert j and all(r["mx"] <= r["score"] + 1e-12 for r in j)


def test_blended_boost_scales_one_term(searcher):
    plain = extras.blended_term_score_all(
        searcher, ["spark", "merge"], disjunction_max=False)
    boosted = extras.blended_term_score_all(
        searcher, ["spark", "merge"], boosts={"merge": 2.0},
        disjunction_max=False)
    # docs with ONLY spark keep their score; docs with only merge double
    only_spark = (searcher.match_docs(TermQuery("spark"))
                  .exceptAll(searcher.match_docs(TermQuery("merge"))))
    only_merge = (searcher.match_docs(TermQuery("merge"))
                  .exceptAll(searcher.match_docs(TermQuery("spark"))))
    js = (plain.withColumnRenamed("score", "p")
          .join(boosted, "doc_id").join(only_spark, "doc_id").collect())
    jm = (plain.withColumnRenamed("score", "p")
          .join(boosted, "doc_id").join(only_merge, "doc_id").collect())
    assert all(abs(r["score"] - r["p"]) < 1e-12 for r in js)
    assert all(abs(r["score"] - 2.0 * r["p"]) < 1e-9 for r in jm)


def test_search_after_is_next_page(searcher):
    q = parse_query("spark OR merge OR fast", ENGLISH_ANALYZER)
    full = (searcher.score_all(q, mode="f64")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(20).collect())
    after = full[9]
    page2 = extras.search_after(searcher, q, float(after["score"]),
                                int(after["doc_id"]), k=10).collect()
    assert [r["doc_id"] for r in page2] == [r["doc_id"] for r in full[10:20]]


def test_boost_linearity(searcher):
    b1 = extras.boosted_sum_score_all(searcher, {"spark": 1.0})
    b3 = extras.boosted_sum_score_all(searcher, {"spark": 3.0})
    j = (b1.alias("a").join(b3.alias("b"), "doc_id")
         .select((F.col("b.score") - 3.0 * F.col("a.score")).alias("d")))
    mx = j.agg(F.max(F.abs("d"))).collect()[0][0]
    assert mx < 1e-9


def test_constant_score(searcher):
    cs = extras.constant_score(searcher, TermQuery("spark"), 1.0)
    assert cs.filter(F.col("score") != 1.0).count() == 0
    assert cs.count() == searcher.match_docs(TermQuery("spark")).distinct().count()


def test_proximity_window_algebra(searcher):
    both = (searcher.match_docs(TermQuery("key"))
            .intersect(searcher.match_docs(TermQuery("agg"))).count())
    wide = extras.proximity_score_all(searcher, "key", "agg", window=10_000)
    assert wide.count() == both          # window >= doclen == plain AND
    w1 = {r["doc_id"] for r in
          extras.proximity_score_all(searcher, "key", "agg", 1).collect()}
    w3 = {r["doc_id"] for r in
          extras.proximity_score_all(searcher, "key", "agg", 3).collect()}
    assert w1 <= w3                      # tightening the window only drops docs
    # adjacency ("key agg" phrase) is contained in window-1 proximity
    from lucene_solr_spark.search.ast import PhraseQuery
    ph = {r["doc_id"] for r in
          searcher.score_all(PhraseQuery(("key", "agg"))).collect()}
    assert ph <= w1


def test_sort_by_field(searcher, docs, spark):
    d = docs.withColumn("n_chars", F.length("text").cast("long"))
    res = extras.sort_by_field(searcher, TermQuery("table"), d,
                               "n_chars", ascending=False, k=10).collect()
    vals = [r["n_chars"] for r in res]
    assert vals == sorted(vals, reverse=True)


def test_fetch_documents(spark, searcher, docs):
    """StoredFields retrieval: hit order preserved, fields joined."""
    from lucene_solr_spark.search import extras
    top = searcher.top_k(TermQuery("spark"), k=5)
    got = extras.fetch_documents(spark, top, docs, columns=["text"])
    assert got["doc_id"].tolist() == top["doc_id"].tolist()
    assert "text" in got.columns and "score" in got.columns
    assert got["text"].notna().all()


def test_term_vectors_positions(spark):
    """tv.positions keep StopFilter gaps (raw token index); df is the
    corpus document frequency."""
    from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
    from lucene_solr_spark.index.builder import IndexBuilder
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.search.extras import term_vectors_positions
    docs = spark.createDataFrame(
        [(0, "spark is the spark engine"),   # 'is'/'the' are stopwords
         (1, "engine room"),
         (2, "spark")],
        "doc_id long, text string")
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=4,
                       with_positions=True).build(spark, docs)
    idx.postings = idx.postings.cache()
    s = Searcher(spark, idx)
    got = {(r["doc_id"], r["term"]): r for r in
           term_vectors_positions(s, docs, [0, 1]).collect()}
    # 'spark' in doc 0 at raw positions 0 and 3 (gap across stopwords)
    assert got[(0, "spark")]["positions"] == "0,3"
    assert got[(0, "spark")]["freq"] == 2
    assert got[(0, "spark")]["df"] == 2      # docs 0 and 2
    assert got[(0, "engine")]["positions"] == "4"
    assert got[(1, "engine")]["df"] == 2
    assert (0, "the") not in got             # stopwords not in the vector
    assert not any(d == 2 for d, _ in got)   # only requested docs


def test_facet_percentiles(spark):
    from lucene_solr_spark.search.facets import facet_percentiles
    docs = spark.createDataFrame(
        [(i, "a" if i < 4 else "b", v) for i, v in
         enumerate([10, 20, 30, 40, 100, 200])],
        "doc_id long, lang string, n long")
    got = {r["value"]: r for r in
           facet_percentiles(docs, None, "lang", "n").collect()}
    # exact interpolated percentiles (quantile_cont semantics)
    assert got["a"]["count"] == 4
    assert got["a"]["p25"] == pytest.approx(17.5)
    assert got["a"]["p50"] == pytest.approx(25.0)
    assert got["a"]["p75"] == pytest.approx(32.5)
    assert got["b"]["p50"] == pytest.approx(150.0)


def test_spellcheck_collate(spark):
    """Collations are re-queried: only combinations with real hits
    survive, best-first (SpellCheckCollator semantics)."""
    from lucene_solr_spark.analysis.analyzer import StandardAnalyzer
    from lucene_solr_spark.index.builder import IndexBuilder
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.search.suggest import collate
    ann = StandardAnalyzer(stop_words=frozenset())
    docs = spark.createDataFrame(
        [(0, "spark table join"), (1, "spark table scan"),
         (2, "spark chair"), (3, "stark cable")],
        "doc_id long, text string")
    idx = IndexBuilder(ann, grid=4).build(spark, docs)
    idx.postings = idx.postings.cache()
    s = Searcher(spark, idx)

    def suggester(w, k):
        # deterministic candidate lists for the two misspellings
        return {"spak": ["spark", "stark"],
                "tabel": ["table", "cable"]}[w][:k]

    got = [(r["collation"], r["hits"]) for r in
           collate(s, ["spak", "tabel"], suggester).collect()]
    # spark+table hits docs 0,1; stark+cable hits doc 3;
    # spark+cable and stark+table hit nothing -> dropped
    assert got == [("spark table", 2), ("stark cable", 1)]
    # all-miss words collate to themselves and drop (0 hits)
    assert collate(s, ["zzz"], lambda w, k: []).count() == 0

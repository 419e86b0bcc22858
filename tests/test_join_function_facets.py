"""Query-time joins (JoinUtil / block join), faceting over match sets,
FunctionScoreQuery boosts, and the two round-3 similarities
(LMJelinekMercer, BooleanSimilarity).

Reference semantics under test: join/JoinUtil.java:90-130 ScoreMode
aggregation; join/ToParentBlockJoinQuery.java:63 (parent with no
matching child does not match); join/ToChildBlockJoinQuery.java:45
(parent score handed down unchanged); facet/range/LongRangeFacetCounts
(empty ranges materialize with count 0; counts are over the MATCH set,
FacetsCollector.java:40); queries/function/FunctionScoreQuery.java:46-88;
similarities/BooleanSimilarity.java:38 and
LMJelinekMercerSimilarity.java:63-69.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import (BooleanQuery, BoostQuery, Clause,
                                          Occur, TermQuery)
from lucene_solr_spark.search.facets import (facet_counts, pivot_facets,
                                             range_facets)
from lucene_solr_spark.search.function import boost_by_query, function_score
from lucene_solr_spark.search.join import (block_join_to_child,
                                           block_join_to_parent, join_query)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def searcher(spark, docs):
    idx = (IndexBuilder(ENGLISH_ANALYZER, grid=128, with_positions=True)
           .build(spark, docs.select("doc_id", "text")).cache())
    return Searcher(spark, idx)


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").cache()


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet").cache()


# ---------------------------------------------------------------- JoinUtil

def _hits_with_source(searcher, docs, term):
    return (searcher.score_all(TermQuery(term), mode="f64")
            .join(docs.select("doc_id", "source"), "doc_id")
            .toPandas())


def test_join_query_score_modes(spark, docs, searcher):
    hits = _hits_with_source(searcher, docs, "merge")
    assert len(hits), "fixture term must match"
    by_src = hits.groupby("source")["score"]
    expect = {"max": by_src.max(), "min": by_src.min(),
              "avg": by_src.mean(), "total": by_src.sum(),
              "count": by_src.count().astype(float)}
    n_docs_by_src = (docs.groupBy("source").count().toPandas()
                     .set_index("source")["count"])
    for mode, exp in expect.items():
        got = (join_query(searcher, TermQuery("merge"), docs, "source",
                          docs, "source", score_mode=mode)
               .toPandas())
        # every doc of a matched source matches, scored by the aggregate
        assert len(got) == int(n_docs_by_src[exp.index].sum()), mode
        per_src = (got.merge(docs.select("doc_id", "source").toPandas(),
                             on="doc_id").groupby("source")["score"]
                   .agg(["min", "max", "size"]))
        for src, row in per_src.iterrows():
            assert row["min"] == row["max"], "constant score per value"
            assert math.isclose(row["min"], exp[src], rel_tol=1e-12), mode


def test_join_query_score_mode_none(docs, searcher):
    got = join_query(searcher, TermQuery("merge"), docs, "source",
                     docs, "source", score_mode="none").toPandas()
    assert set(got["score"]) == {1.0}


def test_join_query_unmatched_source_excluded(spark, docs, searcher):
    # join on a term hitting few docs: sources absent from the from-hits
    # must not appear in the to-side result
    hits = _hits_with_source(searcher, docs, "merge")
    got = join_query(searcher, TermQuery("merge"), docs, "source",
                     docs, "source", score_mode="max").toPandas()
    got_src = set(docs.select("doc_id", "source").toPandas()
                  .set_index("doc_id").loc[got["doc_id"]]["source"])
    assert got_src == set(hits["source"])


def test_join_query_rejects_bad_mode(docs, searcher):
    with pytest.raises(ValueError):
        join_query(searcher, TermQuery("merge"), docs, "source",
                   docs, "source", score_mode="geometric")


# -------------------------------------------------------------- block join

def test_block_join_to_parent_total_is_child_sum(lineitem):
    got = (block_join_to_parent(lineitem, "l_orderkey",
                                F.col("l_quantity") >= 45,
                                score_mode="total",
                                child_score=F.col("l_quantity"))
           .toPandas().set_index("l_orderkey")["score"])
    exp = (lineitem.filter("l_quantity >= 45").toPandas()
           .groupby("l_orderkey")["l_quantity"].sum())
    assert len(got) == len(exp)
    assert all(math.isclose(got[k], v, rel_tol=1e-12)
               for k, v in exp.items())


def test_block_join_parent_without_match_absent(lineitem):
    """ToParentBlockJoinQuery.java:63 — a parent whose children all fail
    the child query does not match at all."""
    matched = set(block_join_to_parent(
        lineitem, "l_orderkey", F.col("l_quantity") >= 45)
        .toPandas()["l_orderkey"])
    all_parents = set(lineitem.select("l_orderkey").distinct()
                      .toPandas()["l_orderkey"])
    unmatched = all_parents - matched
    assert unmatched, "fixture must leave some parents unmatched"
    has_match = set(lineitem.filter("l_quantity >= 45")
                    .select("l_orderkey").distinct()
                    .toPandas()["l_orderkey"])
    assert matched == has_match


def test_block_join_to_child_carries_parent_score(lineitem, orders):
    got = block_join_to_child(orders, lineitem, "o_orderkey", "l_orderkey",
                              F.col("o_totalprice") >= 400000,
                              parent_score=F.col("o_totalprice")).toPandas()
    od = orders.filter("o_totalprice >= 400000").toPandas()
    li = lineitem.toPandas()
    exp = li[li["l_orderkey"].isin(set(od["o_orderkey"]))]
    assert len(got) == len(exp)
    price = od.set_index("o_orderkey")["o_totalprice"]
    assert all(math.isclose(r["score"], price[r["l_orderkey"]])
               for _, r in got.iterrows())


# ------------------------------------------------------------------ facets

def test_facet_counts_over_match_set(docs, searcher):
    matches = searcher.score_all(TermQuery("merge"), mode="f64")
    got = facet_counts(docs, matches, "lang").toPandas()
    exp = (docs.join(matches.select("doc_id"), "doc_id", "left_semi")
           .groupBy("lang").count().toPandas()
           .set_index("lang")["count"])
    assert dict(zip(got["value"], got["count"])) == exp.to_dict()
    # descending count order (FacetResult.labelValues order)
    assert list(got["count"]) == sorted(got["count"], reverse=True)


def test_range_facets_empty_range_reports_zero(docs):
    got = range_facets(docs, None, "n_chars",
                       [("none", 10**9, 2 * 10**9), ("all", 0, 10**9)]) \
        .toPandas()
    assert list(got["label"]) == ["none", "all"]  # request order kept
    assert got.set_index("label")["count"]["none"] == 0
    assert got.set_index("label")["count"]["all"] == docs.count()


def test_range_facets_boundaries_lo_inclusive_hi_exclusive(docs):
    lo = int(docs.agg(F.min("n_chars")).first()[0])
    hi = int(docs.agg(F.max("n_chars")).first()[0])
    got = (range_facets(docs, None, "n_chars",
                        [("lo_only", lo, lo + 1), ("below_lo", lo - 5, lo),
                         ("to_hi", lo, hi), ("incl_hi", lo, hi + 1)])
           .toPandas().set_index("label")["count"])
    n_lo = docs.filter(F.col("n_chars") == lo).count()
    n_hi = docs.filter(F.col("n_chars") == hi).count()
    assert got["lo_only"] == n_lo
    assert got["below_lo"] == 0
    assert got["incl_hi"] - got["to_hi"] == n_hi


def test_pivot_facets_match_groupby(docs, searcher):
    matches = searcher.score_all(TermQuery("merge"), mode="f64")
    got = pivot_facets(docs, matches, ["lang", "source"]).toPandas()
    exp = (docs.join(matches.select("doc_id"), "doc_id", "left_semi")
           .groupBy("lang", "source").count().toPandas())
    assert len(got) == len(exp)
    g = got.set_index(["lang", "source"])["count"].to_dict()
    e = exp.set_index(["lang", "source"])["count"].to_dict()
    assert g == e
    assert got["count"].sum() == matches.select("doc_id").distinct().count()


# --------------------------------------------------------- function score

def test_function_score_combines(spark, docs, searcher):
    base = (searcher.score_all(TermQuery("merge"), mode="f64")
            .join(docs.select("doc_id", "n_chars"), "doc_id").toPandas())
    for combine, fn in [("multiply", lambda s, v: s * v),
                        ("add", lambda s, v: s + v),
                        ("replace", lambda s, v: v)]:
        got = (function_score(searcher, TermQuery("merge"), docs,
                              "ln(1 + n_chars)", combine=combine)
               .toPandas().set_index("doc_id")["score"])
        assert len(got) == len(base)
        for _, r in base.iterrows():
            v = math.log(1 + r["n_chars"])
            assert math.isclose(got[r["doc_id"]], fn(r["score"], v),
                                rel_tol=1e-12), combine


def test_boost_by_query_only_scales_intersection(searcher):
    base = (searcher.score_all(TermQuery("merge"), mode="f64")
            .toPandas().set_index("doc_id")["score"])
    bset = set(searcher.score_all(TermQuery("spark"), mode="f64")
               .toPandas()["doc_id"])
    got = (boost_by_query(searcher, TermQuery("merge"), TermQuery("spark"),
                          3.0).toPandas().set_index("doc_id")["score"])
    assert len(got) == len(base)
    assert base.index.isin(bset).any() and (~base.index.isin(bset)).any()
    for d, s in base.items():
        exp = s * 3.0 if d in bset else s
        assert math.isclose(got[d], exp, rel_tol=1e-12)


# ------------------------------------------------- round-3 similarities

def test_boolean_similarity_scores_are_boost_sums(spark, searcher):
    s = Searcher(spark, searcher.index, similarity="boolean")
    q = BooleanQuery((
        Clause(Occur.SHOULD, BoostQuery(TermQuery("spark"), 2.0)),
        Clause(Occur.SHOULD, TermQuery("merge"))))
    got = s.top_k(q, k=10**6)
    a = set(searcher.score_all(TermQuery("spark"), mode="f64")
            .toPandas()["doc_id"])
    b = set(searcher.score_all(TermQuery("merge"), mode="f64")
            .toPandas()["doc_id"])
    exp = {d: 2.0 * (d in a) + 1.0 * (d in b) for d in a | b}
    assert dict(zip(got["doc_id"], got["score"])) == exp


def test_lmjm_matches_closed_form(spark, searcher):
    from lucene_solr_spark.functions.smallfloat import LENGTH_TABLE
    s = Searcher(spark, searcher.index, similarity="lmjelinekmercer",
                 lam=0.3)
    got = s.top_k(TermQuery("merge"), k=50)
    field = ("text", "merge")
    st, _, _, w = s._stat_env([field])
    ttf = w[field]["cp64"]  # cp = (ttf+1)/(sttf+1) precomputed
    rows = (searcher.score_all(TermQuery("merge"), mode="f64")
            .count())
    assert len(got) == min(50, rows)
    # spot-check the top hit against the formula using engine postings
    from lucene_solr_spark.search.extras import postings_rows
    pr = postings_rows(s, ["merge"]).toPandas().set_index("doc_id")
    top = got.iloc[0]
    dl = float(LENGTH_TABLE[int(pr.loc[top["doc_id"], "norm"]) & 0xFF])
    f = float(pr.loc[top["doc_id"], "freq"])
    exp = math.log(1 + (0.7 * f / dl) / (0.3 * ttf))
    assert math.isclose(float(top["score"]), exp, rel_tol=1e-6)


def test_lmjm_prune_equals_exhaustive(spark, searcher):
    s = Searcher(spark, searcher.index, similarity="lmjelinekmercer")
    q = BooleanQuery((Clause(Occur.SHOULD, TermQuery("spark")),
                      Clause(Occur.SHOULD, TermQuery("merge"))))
    a = s.top_k(q, k=10, prune=True)
    b = s.top_k(q, k=10, prune=False)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert all(math.isclose(x, y, rel_tol=1e-12)
               for x, y in zip(a["score"], b["score"]))


# ------------------------------------------------------------- taxonomy

def test_taxonomy_rollup_parent_is_child_sum(docs, searcher):
    """FastTaxonomyFacetCounts.java:39 rollup invariant: with all docs
    labeled at leaf depth, every parent's count == Σ its children."""
    from lucene_solr_spark.search.facets import taxonomy_facets
    matches = searcher.score_all(TermQuery("merge"), mode="f64")
    path = F.concat_ws(
        "/", F.col("lang"), F.col("source"),
        F.when(F.col("n_chars") < 300, F.lit("small")).otherwise("large"))
    got = taxonomy_facets(docs, matches, path).toPandas()
    counts = dict(zip(got["path"], got["count"]))
    assert counts, "match set must be non-empty"
    depths = {p: p.count("/") for p in counts}
    for parent, c in counts.items():
        d = depths[parent]
        if d == 2:        # leaf depth
            continue
        kids = sum(v for p, v in counts.items()
                   if depths[p] == d + 1 and p.startswith(parent + "/"))
        assert kids == c, f"{parent}: {c} != sum(children) {kids}"
    # root level sums to the match-set size
    n_match = matches.select("doc_id").distinct().count()
    assert sum(v for p, v in counts.items() if depths[p] == 0) == n_match


def test_association_facet_parent_sums_values(docs, searcher):
    """TaxonomyFacetSumIntAssociations.java:34: parent = Σ children over
    association VALUES (n_chars here), not doc counts, and each leaf =
    Σ n_chars of the matched docs labeled there."""
    from lucene_solr_spark.search.facets import taxonomy_facet_sum
    matches = searcher.score_all(TermQuery("merge"), mode="f64")
    path = F.concat_ws(
        "/", F.col("lang"), F.col("source"),
        F.when(F.col("n_chars") < 300, F.lit("small")).otherwise("large"))
    got = taxonomy_facet_sum(docs, matches, path, "n_chars").toPandas()
    sums = dict(zip(got["path"], got["sum"]))
    assert sums, "match set must be non-empty"
    depths = {p: p.count("/") for p in sums}
    for parent, s in sums.items():
        if depths[parent] == 2:
            continue
        kids = sum(v for p, v in sums.items()
                   if depths[p] == depths[parent] + 1
                   and p.startswith(parent + "/"))
        assert kids == s, f"{parent}: {s} != sum(children) {kids}"
    # root level = Σ n_chars of the whole match set (values, not counts)
    total = (docs.join(matches.select("doc_id").distinct(), "doc_id",
                       "left_semi")
             .agg(F.sum("n_chars")).collect()[0][0])
    assert sum(v for p, v in sums.items() if depths[p] == 0) == total


def test_taxonomy_min_count_prunes(docs, searcher):
    from lucene_solr_spark.search.facets import taxonomy_facets
    matches = searcher.score_all(TermQuery("merge"), mode="f64")
    full = taxonomy_facets(docs, matches, "source").toPandas()
    thr = int(full["count"].median())
    pruned = taxonomy_facets(docs, matches, "source",
                             min_count=thr).toPandas()
    assert set(pruned["path"]) == {p for p, c in
                                   zip(full["path"], full["count"])
                                   if c >= thr}

"""StandardQueryParser analog (VERDICT r4 missing #6:
`queryparser/flexible/standard/StandardQueryParser.java:103`):
multi-field expansion, per-field points config, per-field boosts,
default operator, /regexp/ syntax — plus the classic parser's new
default_operator=AND addClause rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher, parse_query
from lucene_solr_spark.search.ast import (BooleanQuery, BoostQuery, Clause,
                                          Occur, RegexpQuery, TermQuery,
                                          rewrite)
from lucene_solr_spark.search.standard_parser import (StandardQueryParser,
                                                      standard_search)
from tests.conftest import SF_DIR

A = ENGLISH_ANALYZER


@pytest.fixture(scope="module")
def env(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = docs.withColumn("title", F.expr(
        "array_join(slice(regexp_extract_all(text, '[a-z0-9]+', 0),"
        " 1, 5), ' ')")).cache()
    idx = (IndexBuilder(ENGLISH_ANALYZER, grid=128, with_positions=True,
                        fields=("text", "title"))
           .build(spark, docs).cache())
    return docs, Searcher(spark, idx)


# ---- classic parser upgrades ------------------------------------------

def test_default_operator_and():
    q = parse_query("merge plan", A, default_operator="AND")
    assert q == rewrite(BooleanQuery((
        Clause(Occur.MUST, TermQuery("merge")),
        Clause(Occur.MUST, TermQuery("plan")))))
    # explicit OR demotes the preceding clause (addClause rule)
    q2 = parse_query("merge OR plan scan", A, default_operator="AND")
    assert q2 == rewrite(BooleanQuery((
        Clause(Occur.SHOULD, TermQuery("merge")),
        Clause(Occur.SHOULD, TermQuery("plan")),
        Clause(Occur.MUST, TermQuery("scan")))))
    # explicit + survives a following OR (mods win)
    q3 = parse_query("+merge OR plan", A, default_operator="AND")
    assert Clause(Occur.SHOULD, TermQuery("plan")) in q3.clauses


def test_regexp_syntax():
    assert parse_query("/me.ge/", A) == RegexpQuery("me.ge")
    assert parse_query("title:/pa.t/", A) == RegexpQuery("pa.t", "title")


# ---- flexible parser ---------------------------------------------------

def test_multi_field_expansion_and_boost():
    p = (StandardQueryParser(A).set_multi_fields(["text", "title"])
         .set_fields_boost({"title": 2.0}))
    got = p.parse("merge")
    assert got.numeric == ()
    assert rewrite(got.query) == rewrite(BooleanQuery((
        Clause(Occur.SHOULD, TermQuery("merge", "text")),
        Clause(Occur.SHOULD, BoostQuery(TermQuery("merge", "title"),
                                        2.0)))))
    # explicit field: no expansion, but the boost map still applies
    got2 = p.parse("title:merge")
    assert rewrite(got2.query) == rewrite(
        BoostQuery(TermQuery("merge", "title"), 2.0))


def test_points_config_parses_typed_predicates():
    p = StandardQueryParser(A).set_points_config("n_chars", int)
    got = p.parse("merge AND n_chars:[240 TO 400]")
    assert len(got.numeric) == 1
    nr = got.numeric[0]
    assert (nr.column, nr.lower, nr.upper) == ("n_chars", 240, 400)
    assert nr.include_lower and nr.include_upper
    # exact numeric term → degenerate [v, v]
    nr2 = p.parse("n_chars:300").numeric[0]
    assert (nr2.lower, nr2.upper) == (300, 300)
    # exclusive range syntax carries through
    nr3 = p.parse("n_chars:{240 TO 400}").numeric[0]
    assert not nr3.include_lower and not nr3.include_upper


def test_nested_numeric_raises():
    p = StandardQueryParser(A).set_points_config("n_chars", int)
    with pytest.raises(ValueError):
        p.parse("merge OR (plan AND n_chars:[1 TO 2])")
    with pytest.raises(ValueError):
        p.parse("merge OR n_chars:[1 TO 2]")


def test_standard_search_matches_manual_composition(env):
    docs, s = env
    p = (StandardQueryParser(A).set_multi_fields(["text", "title"])
         .set_fields_boost({"title": 2.0})
         .set_points_config("n_chars", int))
    parsed = p.parse("merge AND n_chars:[240 TO 400]")
    got = {r["doc_id"]: r["score"]
           for r in standard_search(s, docs, parsed).collect()}
    # manual restatement: (text:merge OR title:merge^2) ∧ range filter
    manual_q = BooleanQuery((
        Clause(Occur.SHOULD, TermQuery("merge", "text")),
        Clause(Occur.SHOULD, BoostQuery(TermQuery("merge", "title"),
                                        2.0))))
    keep = {r["doc_id"] for r in docs.filter(
        (F.col("n_chars") >= 240) & (F.col("n_chars") <= 400))
        .select("doc_id").collect()}
    exp = {r["doc_id"]: r["score"]
           for r in s.score_all(manual_q, mode="f64").collect()
           if r["doc_id"] in keep}
    assert got == pytest.approx(exp)
    assert got  # non-trivial


def test_numeric_only_query_is_match_all_filtered(env):
    docs, s = env
    p = StandardQueryParser(A).set_points_config("n_chars", int)
    parsed = p.parse("n_chars:[240 TO 400]")
    got = sorted(r["doc_id"]
                 for r in standard_search(s, docs, parsed).collect())
    exp = sorted(r["doc_id"] for r in docs.filter(
        "n_chars between 240 and 400").select("doc_id").collect())
    assert got == exp

"""lucene/expressions JavascriptCompiler analog — grammar/semantics pins
(TestJavascriptCompiler.java / TestExpressionValueSource.java shape):
driver-eval vs Spark-codegen differential on a batch of expressions,
Java double/long semantics pins, compile-time error pins, and the
search surfaces (expression_score / expression_sort / terms_enum)."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import TermQuery
from lucene_solr_spark.search.expressions import (compile_expression,
                                                  expression_score,
                                                  expression_sort)
from lucene_solr_spark.search.extras import terms_enum


def test_eval_pins():
    e = compile_expression
    assert e("1 + 2 * 3").evaluate() == 7.0
    assert e("(1 + 2) * 3").evaluate() == 9.0
    assert e("2 - 3 - 4").evaluate() == -5.0           # left-assoc
    assert e("-2 * -3").evaluate() == 6.0
    assert e("7 % 4").evaluate() == 3.0
    assert e("1 < 2").evaluate() == 1.0                # booleans are doubles
    assert e("1 >= 2").evaluate() == 0.0
    assert e("3 == 3 && 1 != 2").evaluate() == 1.0
    assert e("0 || 0.5").evaluate() == 1.0
    assert e("!3").evaluate() == 0.0
    assert e("1 ? 10 : 20").evaluate() == 10.0
    # right-associative ternary: a ? b : c ? d : e == a ? b : (c ? d : e)
    assert e("0 ? 1 : 0 ? 2 : 3").evaluate() == 3.0
    assert e("max(2, min(5, 3))").evaluate() == 3.0
    assert e("ln(exp(2))").evaluate() == pytest.approx(2.0)
    assert e("logn(2, 8)").evaluate() == pytest.approx(3.0)
    assert e("pow(2, 10)").evaluate() == 1024.0
    assert e("0x20").evaluate() == 32.0
    # long semantics: shifts mask the count to 6 bits, >>> is unsigned
    assert e("1 << 3").evaluate() == 8.0
    assert e("-8 >> 1").evaluate() == -4.0
    assert e("-1 >>> 60").evaluate() == 15.0
    assert e("6 & 3").evaluate() == 2.0
    assert e("6 | 3").evaluate() == 7.0
    assert e("6 ^ 3").evaluate() == 5.0
    assert e("~5").evaluate() == -6.0
    # Java double semantics at the edges
    assert e("1 / 0").evaluate() == math.inf
    assert e("-1 / 0").evaluate() == -math.inf
    assert math.isnan(e("0 / 0").evaluate())
    assert math.isnan(e("5 % 0").evaluate())
    # variables
    assert e("a + b * 2").evaluate(a=1, b=3) == 7.0
    assert e("a > 2 ? a : -a").evaluate(a=5) == 5.0


def test_variables_and_errors(spark):
    ex = compile_expression("_score + ln(1 + popularity) * boost")
    assert ex.variables == ("_score", "boost", "popularity")
    with pytest.raises(ValueError, match="unknown function"):
        compile_expression("frobnicate(1)")
    with pytest.raises(ValueError, match="expects 2 args"):
        compile_expression("pow(2)")
    with pytest.raises(ValueError, match="trailing"):
        compile_expression("1 + 2 3")
    with pytest.raises(ValueError):
        compile_expression("1 +")
    with pytest.raises(KeyError, match="unbound"):
        compile_expression("a + b").to_column({"a": F.lit(1.0)})


DIFFERENTIAL = [
    "a + b * c - 4 / b",
    "(a + b) % c",
    "a < b ? ln(1 + c) : sqrt(b)",
    "max(a, b) * min(b, c) + abs(0 - a)",
    "a && (b || 0) ? pow(c, 2) : logn(2, b + 6)",
    "floor(c / b) + ceil(a / b)",
    "(a << 2) + (b >> 1) - (a ^ b) + (a & b) + (a | c)",
    "atan2(a, b) + cosh(1) - sinh(1) + tanh(a / 10)",
    "acosh(c + 2) + asinh(a) + atanh(b / 10)",
    "haversin(40.7128, -74.006, 51.5074, -0.1278)",
    "!a + ~b",
    "a == 3 ? -b : +c",
]


def test_spark_vs_python_differential(spark):
    rows = [(1, 3.0, 2.0, 5.0), (2, 0.0, 4.0, 1.5), (3, 7.0, 3.0, 0.25)]
    df = spark.createDataFrame(rows, "id long, a double, b double, c double")
    cols = [compile_expression(s).to_column(
        {"a": F.col("a"), "b": F.col("b"), "c": F.col("c")})
        .alias(f"e{i}") for i, s in enumerate(DIFFERENTIAL)]
    got = {r["id"]: r for r in df.select("id", *cols).collect()}
    for rid, a, b, c in rows:
        for i, s in enumerate(DIFFERENTIAL):
            want = compile_expression(s).evaluate(a=a, b=b, c=c)
            have = got[rid][f"e{i}"]
            assert have == pytest.approx(want, rel=1e-12), (s, rid)


def _searcher(spark, texts):
    docs = spark.createDataFrame(
        [(i, t, 100 + 37 * i) for i, t in enumerate(texts)],
        "doc_id long, text string, pop long")
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=4).build(spark, docs)
    idx.postings = idx.postings.cache()
    return docs, Searcher(spark, idx)


def test_expression_sort(spark):
    texts = ["merge fast", "merge merge slow", "merge fast fast",
             "other words", "merge"]
    docs, s = _searcher(spark, texts)
    base = {int(r["doc_id"]): r["score"]
            for r in s.score_all(TermQuery("merge"), mode="f64").collect()}
    src = "_score + ln(1 + pop) * (pop > 150 ? 0.5 : 0.25)"
    ex = compile_expression(src)
    want = sorted(((ex.evaluate(_score=sc, pop=100 + 37 * d), d)
                   for d, sc in base.items()), key=lambda t: (-t[0], t[1]))
    got = expression_sort(s, TermQuery("merge"), docs, src, k=3).collect()
    assert [int(r["doc_id"]) for r in got] == [d for _, d in want[:3]]
    for r, (v, _) in zip(got, want):
        assert r["score"] == pytest.approx(v, rel=1e-12)
    # ascending flips the order
    asc = expression_sort(s, TermQuery("merge"), docs, src, k=3,
                          ascending=True).collect()
    assert [int(r["doc_id"]) for r in asc] == [
        d for _, d in sorted(want, key=lambda t: (t[0], t[1]))[:3]]
    # unmatched docs (doc 3) never appear even with huge pop
    all_ids = {int(r["doc_id"])
               for r in expression_score(s, TermQuery("merge"), docs,
                                         src).collect()}
    assert 3 not in all_ids and all_ids == set(base)


def test_terms_enum(spark):
    texts = ["merge fast table", "merge scan", "fast fast scan",
             "table merge", "scanner"]
    docs, s = _searcher(spark, texts)
    rows = terms_enum(s, sort="index", limit=100).collect()
    terms = [r["term"] for r in rows]
    assert terms == sorted(terms)
    df = {r["term"]: r["df"] for r in rows}
    assert df["merge"] == 3 and df["fast"] == 2 and df["scan"] == 2
    # prefix + count sort: df desc, term asc
    sc = terms_enum(s, prefix="scan", sort="count", limit=10).collect()
    assert [(r["term"], r["df"]) for r in sc] == [("scan", 2),
                                                  ("scanner", 1)]
    # regex + mincount + limit
    rx = terms_enum(s, regex="^.a.*", mincount=2, limit=1).collect()
    assert [(r["term"], r["df"]) for r in rx] == [("fast", 2)]
    rng = terms_enum(s, lower="merge", upper="scan", lower_incl=True,
                     upper_incl=True, sort="index", limit=10).collect()
    assert [r["term"] for r in rng] == ["merge", "scan"]

"""SimpleQueryParser — character-level state-machine pins vs the
reference semantics (SimpleQueryParser.java:99-661) + one end-to-end
execution equivalence."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.search.ast import (BooleanQuery, Clause, FuzzyQuery,
                                          MatchAllQuery, MatchNoQuery,
                                          Occur, PhraseQuery, PrefixQuery,
                                          TermQuery)
from lucene_solr_spark.search.simpleparser import (AND_OPERATOR,
                                                   PHRASE_OPERATOR,
                                                   WHITESPACE_OPERATOR,
                                                   SimpleQueryParser)

P = SimpleQueryParser(ENGLISH_ANALYZER)


def _t(t):
    return TermQuery(t, "text")


def test_match_all_and_empty():
    assert P.parse("*") == MatchAllQuery()
    assert P.parse("  *  ") == MatchAllQuery()
    assert P.parse("") == MatchNoQuery()
    assert P.parse("   ") == MatchNoQuery()
    # stopword-only input analyzes to nothing → MatchNoDocs
    assert P.parse("the") == MatchNoQuery()


def test_default_or_and_explicit_ops():
    assert P.parse("spark") == _t("spark")
    assert P.parse("spark merge") == BooleanQuery(
        (Clause(Occur.SHOULD, _t("spark")), Clause(Occur.SHOULD, _t("merge"))))
    assert P.parse("spark+merge") == BooleanQuery(
        (Clause(Occur.MUST, _t("spark")), Clause(Occur.MUST, _t("merge"))))
    assert P.parse("spark | merge") == BooleanQuery(
        (Clause(Occur.SHOULD, _t("spark")), Clause(Occur.SHOULD, _t("merge"))))
    # leading operator has nothing to combine with → ignored (:175-196)
    assert P.parse("+spark") == _t("spark")
    assert P.parse("| spark") == _t("spark")


def test_right_to_left_precedence_javadoc_example():
    """'token1 | token2 + token3' evaluates the OR first (:65-68):
    an operator CHANGE wraps the tree so far as one clause."""
    got = P.parse("spark | merge + fast")
    assert got == BooleanQuery((
        Clause(Occur.MUST, BooleanQuery((Clause(Occur.SHOULD, _t("spark")),
                                         Clause(Occur.SHOULD, _t("merge"))))),
        Clause(Occur.MUST, _t("fast"))))
    # same-operator runs keep folding flat
    assert P.parse("spark merge fast") == BooleanQuery(
        tuple(Clause(Occur.SHOULD, _t(t)) for t in ("spark", "merge", "fast")))


def test_not_wrapping_and_double_negation():
    got = P.parse("-spark")
    assert got == BooleanQuery((Clause(Occur.MUST_NOT, _t("spark")),
                                Clause(Occur.SHOULD, MatchAllQuery())))
    # stacked '-' cancel (:197-205)
    assert P.parse("--spark") == _t("spark")
    assert P.parse("---spark") == P.parse("-spark")
    # no whitespace allowed between '-' and its operand: the not count
    # resets on any other construct
    assert P.parse("- spark") == _t("spark")


def test_prefix_fuzzy_and_escapes():
    assert P.parse("spar*") == PrefixQuery("spar", "text")
    # '*' mid-token is literal (analyzer splits around it)
    assert P.parse("spark~1") == FuzzyQuery("spark", 1, "text")
    assert P.parse("spark~") == FuzzyQuery("spark", 2, "text")
    assert P.parse("spark~9") == FuzzyQuery("spark", 2, "text")  # cap
    assert P.parse("spark~0") == _t("spark")
    assert P.parse("spark~-3") == _t("spark")   # negative → 0
    assert P.parse("spark~x") == _t("spark")    # garbage → 0
    # escaped '*' is not a prefix operator — the literal '*' then
    # falls out of analysis and the term stands alone
    assert P.parse("spar\\*") == _t("spar")
    # multi-token term text combines with the default operator
    assert P.parse("term-1") == BooleanQuery(
        (Clause(Occur.SHOULD, _t("term")), Clause(Occur.SHOULD, _t("1"))))


def test_phrase_and_near():
    assert P.parse('"key agg"') == PhraseQuery(("key", "agg"), "text")
    assert P.parse('"key agg"~2') == PhraseQuery(("key", "agg"), "text",
                                                 slop=2)
    # trailing '~' with nothing after: slop 0
    assert P.parse('"key agg"~') == PhraseQuery(("key", "agg"), "text")
    # single-token phrase collapses to a term (createPhraseQuery)
    assert P.parse('"spark"') == _t("spark")
    # unmatched quote is extraneous — contents parse as plain tokens
    assert P.parse('"key agg') == BooleanQuery(
        (Clause(Occur.SHOULD, _t("key")), Clause(Occur.SHOULD, _t("agg"))))


def test_parens_lenient():
    got = P.parse("(spark | merge) + fast")
    assert got == BooleanQuery((
        Clause(Occur.MUST, BooleanQuery((Clause(Occur.SHOULD, _t("spark")),
                                         Clause(Occur.SHOULD, _t("merge"))))),
        Clause(Occur.MUST, _t("fast"))))
    # extraneous ')' skipped; unmatched '(' extraneous
    assert P.parse(")spark") == _t("spark")
    assert P.parse("(spark merge") == P.parse("spark merge")
    # empty '()' resets the pending operator
    assert P.parse("spark + () merge") == BooleanQuery(
        (Clause(Occur.SHOULD, _t("spark")), Clause(Occur.SHOULD, _t("merge"))))


def test_flags_gate_features():
    # only whitespace + AND enabled: '"' and '|' are literal chars
    p = SimpleQueryParser(ENGLISH_ANALYZER,
                          flags=WHITESPACE_OPERATOR | AND_OPERATOR)
    assert p.parse("spark|merge") == BooleanQuery(
        (Clause(Occur.SHOULD, _t("spark")), Clause(Occur.SHOULD, _t("merge"))))
    # phrase flag off: quote chars vanish in analysis
    assert p.parse('"key agg"') == BooleanQuery(
        (Clause(Occur.SHOULD, _t("key")), Clause(Occur.SHOULD, _t("agg"))))
    # default operator MUST
    pm = SimpleQueryParser(ENGLISH_ANALYZER, default_operator=Occur.MUST)
    assert pm.parse("spark merge") == BooleanQuery(
        (Clause(Occur.MUST, _t("spark")), Clause(Occur.MUST, _t("merge"))))
    with pytest.raises(ValueError):
        SimpleQueryParser(ENGLISH_ANALYZER, default_operator=Occur.MUST_NOT)
    # phrase-only flag: '+' is a literal consumed into the term
    pp = SimpleQueryParser(ENGLISH_ANALYZER,
                           flags=PHRASE_OPERATOR | WHITESPACE_OPERATOR)
    assert pp.parse("spark+merge") == BooleanQuery(
        (Clause(Occur.SHOULD, _t("spark")), Clause(Occur.SHOULD, _t("merge"))))


def test_execution_matches_classic_parser(spark):
    """simple 'spark + table -dup' scores ≡ classic
    'spark AND table AND NOT dup' through the real kernel."""
    from lucene_solr_spark.index import IndexBuilder
    from lucene_solr_spark.search import Searcher, parse_query
    from tests.conftest import SF_DIR
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=128).build(spark, docs).cache()
    s = Searcher(spark, idx)
    q_simple = P.parse("spark + table")
    got = {r["doc_id"]: r["score"]
           for r in s.score_all(q_simple, mode="f64").collect()}
    q_classic = parse_query("spark AND table", ENGLISH_ANALYZER)
    exp = {r["doc_id"]: r["score"]
           for r in s.score_all(q_classic, mode="f64").collect()}
    assert got and got == exp
    dup_docs = {r["doc_id"] for r in
                s.score_all(P.parse("dup"), mode="f64").collect()}
    all_docs = {r["doc_id"] for r in
                s.score_all(MatchAllQuery(), mode="f64").collect()}
    # nested NOT wrapper through the kernel: Lucene scores the
    # SHOULD-MatchAll inside the wrapper, so score = base + 1.0
    q_not = P.parse("spark + table + -dup")
    got_not = {r["doc_id"]: r["score"] for r in
               s.score_all(q_not, mode="f64").collect()}
    assert set(got_not) == set(got) - dup_docs
    for d, v in got_not.items():
        assert v == pytest.approx(got[d] + 1.0)
    # pure negation at the root (the kernel cannot scan it — the
    # all-docs composition takes over): every live doc except dup's,
    # constant score 1.0
    got_neg = {r["doc_id"]: r["score"] for r in
               s.score_all(P.parse("-dup"), mode="f64").collect()}
    assert set(got_neg) == all_docs - dup_docs and dup_docs
    assert all(v == 1.0 for v in got_neg.values())
    # SHOULD union mixing a wrapper with a grounded term:
    # 'spark -dup' matches docs with spark OR without dup (Lucene's
    # actual SimpleQueryParser semantics — NOT the AND reading)
    got_mix = {r["doc_id"]: r["score"] for r in
               s.score_all(P.parse("spark -dup"), mode="f64").collect()}
    spark_sc = {r["doc_id"]: r["score"] for r in
                s.score_all(P.parse("spark"), mode="f64").collect()}
    assert set(got_mix) == (all_docs - dup_docs) | set(spark_sc)
    for d, v in got_mix.items():
        expect = (0.0 if d in dup_docs else 1.0) + spark_sc.get(d, 0.0)
        assert v == pytest.approx(expect)
    # top_k agrees with score_all ordering on the unbounded plan
    pdf = s.top_k(P.parse("-dup"), k=5, mode="f64")
    assert list(pdf["doc_id"]) == sorted(all_docs - dup_docs)[:5]
    idx.release()

"""Keep/Length/Trim/Truncate/LimitTokenCount filter kit."""

import pyspark.sql.functions as F

from lucene_solr_spark.analysis.filterkit import (keep_word_expr,
                                                  length_filter_expr,
                                                  limit_token_count_expr,
                                                  trim_expr, truncate_expr)


def _one(spark, expr, toks):
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    return list(df.select(expr.alias("o")).collect()[0]["o"])


def test_keep_word(spark):
    assert _one(spark, keep_word_expr("toks", ["fox", "dog"]),
                ["the", "fox", "ran", "dog", "fox"]) == \
        ["fox", "dog", "fox"]
    assert _one(spark, keep_word_expr("toks", ["x"]), []) == []


def test_length_filter(spark):
    assert _one(spark, length_filter_expr("toks", 2, 4),
                ["a", "ab", "abcd", "abcde", ""]) == ["ab", "abcd"]


def test_trim(spark):
    assert _one(spark, trim_expr("toks"),
                ["  a", "b  ", " c ", "d"]) == ["a", "b", "c", "d"]


def test_truncate(spark):
    assert _one(spark, truncate_expr("toks", 3),
                ["abcdef", "ab", "abc"]) == ["abc", "ab", "abc"]


def test_limit_token_count(spark):
    assert _one(spark, limit_token_count_expr("toks", 2),
                ["a", "b", "c", "d"]) == ["a", "b"]
    assert _one(spark, limit_token_count_expr("toks", 9),
                ["a", "b"]) == ["a", "b"]


def test_composition_single_projection(spark):
    # the whole kit composes into ONE Project over the token array
    df = spark.createDataFrame([(["  the", "fox  ", "a", "elephants"],)],
                               "toks array<string>")
    out = df.select(
        limit_token_count_expr(
            length_filter_expr(trim_expr("toks"), 2, 6), 2).alias("o"))
    assert list(out.collect()[0]["o"]) == ["the", "fox"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_keyword_repeat_stem_and_remove_duplicates(spark):
    """KeywordRepeatFilter + Porter + RemoveDuplicates: original and
    stem stacked at one position; exact AND stemmed term queries hit;
    phrase positions survive the stacking."""
    from lucene_solr_spark.analysis.custom import (CustomAnalyzer,
                                                   lowercase_filter)
    from lucene_solr_spark.analysis.en import porter_stem
    from lucene_solr_spark.analysis.filterkit import (
        keyword_repeat_stem_filter, remove_duplicates_filter)
    from lucene_solr_spark.index import IndexBuilder
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.search.ast import PhraseQuery, TermQuery

    an = CustomAnalyzer(token_filters=(
        lowercase_filter(), keyword_repeat_stem_filter(porter_stem),
        remove_duplicates_filter()))
    # stream-level pins
    assert an.tokens_positions("running dogs fast") == (
        ["running", "run", "dogs", "dog", "fast"], [0, 0, 1, 1, 2])
    docs = spark.createDataFrame(
        [(0, "running dogs"), (1, "runs dog"), (2, "fast cars")],
        "doc_id long, text string")
    idx = IndexBuilder(an, grid=8, with_positions=True).build(spark, docs)
    s = Searcher(spark, idx)
    # stem query matches both surface forms; exact form still indexed
    assert sorted(s.top_k(TermQuery("run"), k=10)["doc_id"]) == [0, 1]
    assert s.top_k(TermQuery("running"), k=10)["doc_id"].tolist() == [0]
    # phrase across stacked positions: stemmed forms stay adjacent
    assert s.top_k(PhraseQuery(("run", "dog")), k=10)["doc_id"].tolist() == [0, 1] or \
        sorted(s.top_k(PhraseQuery(("run", "dog")), k=10)["doc_id"]) == [0, 1]


def test_remove_duplicates_cross_position():
    from lucene_solr_spark.analysis.filterkit import remove_duplicates_filter
    f = remove_duplicates_filter()
    # same term at same position dropped; same term later kept
    assert f([("a", 0), ("a", 0), ("b", 1), ("a", 2)]) == \
        [("a", 0), ("b", 1), ("a", 2)]

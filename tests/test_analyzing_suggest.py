"""AnalyzingSuggester analyzed-form completion (VERDICT r4 #7:
`suggest/analyzing/AnalyzingSuggester.java:121`): the analyzed match
must beat a raw-prefix miss, exactFirst must float exact analyzed
keys over heavier suggestions, and preserveSep=False must join across
token boundaries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.search.suggest import (SEP_LABEL, analyzing_suggest,
                                              build_analyzing_suggest)


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (0, "The Department Store"),
        (1, "departure lounge"),
        (2, "run"),
        (3, "running shoes for marathon training"),
        (4, "a run in the park"),
        (5, "cpu socket"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, title string")
    return docs, build_analyzing_suggest(docs, ENGLISH_ANALYZER,
                                         text_col="title")


def test_analyzed_match_beats_raw_prefix_miss(spark, table):
    """THE headline behavior: 'dept' (well, 'department') completes to
    'The Department Store' although the raw surface starts with a
    stopword the analyzer removed."""
    docs, tbl = table
    got = analyzing_suggest(tbl, ENGLISH_ANALYZER, "depart", k=5) \
        .collect()
    surfaces = [r["surface"] for r in got]
    assert "The Department Store" in surfaces
    assert "departure lounge" in surfaces
    # the raw-prefix lookup the reference contrasts against misses it
    raw = docs.filter(F.lower("title").startswith("depart")).collect()
    assert "The Department Store" not in {r["title"] for r in raw}


def test_analyzed_keys_are_sep_joined_and_stop_filtered(table):
    _, tbl = table
    keys = {r["surface"]: r["analyzed_key"] for r in tbl.collect()}
    assert keys["The Department Store"] == f"department{SEP_LABEL}store"
    assert keys["a run in the park"] == f"run{SEP_LABEL}park"


def test_exact_first_floats_exact_key_over_weight(table):
    _, tbl = table
    got = analyzing_suggest(tbl, ENGLISH_ANALYZER, "run", k=5).collect()
    # 'run' (exact analyzed key, tiny weight) sorts above the much
    # heavier 'running shoes…' and 'a run in the park'
    assert got[0]["surface"] == "run" and got[0]["is_exact"]
    assert {r["surface"] for r in got[1:]} >= {
        "running shoes for marathon training", "a run in the park"}
    # without exactFirst, pure weight order wins
    by_weight = analyzing_suggest(tbl, ENGLISH_ANALYZER, "run", k=5,
                                  exact_first=False).collect()
    assert by_weight[0]["surface"] == \
        "running shoes for marathon training"


def test_preserve_sep_false_joins_across_tokens(spark, table):
    docs, _ = table
    nosep = build_analyzing_suggest(docs, ENGLISH_ANALYZER,
                                    text_col="title",
                                    preserve_sep=False)
    got = analyzing_suggest(nosep, ENGLISH_ANALYZER, "cpus", k=3,
                            preserve_sep=False).collect()
    assert [r["surface"] for r in got] == ["cpu socket"]
    # with preserveSep the same lookup misses: 'cpus' is not a prefix
    # of 'cpu<US>socket'
    sep_tbl = build_analyzing_suggest(docs, ENGLISH_ANALYZER,
                                      text_col="title")
    assert analyzing_suggest(sep_tbl, ENGLISH_ANALYZER, "cpus",
                             k=3).count() == 0


def test_surface_dedup_and_cap(spark):
    rows = [(i, "same title") for i in range(4)] + \
        [(10, "same titleX"), (11, "same titleY")]
    docs = spark.createDataFrame(rows, "doc_id long, title string")
    tbl = build_analyzing_suggest(docs, ENGLISH_ANALYZER,
                                  text_col="title")
    assert tbl.filter("surface = 'same title'").count() == 1
    capped = build_analyzing_suggest(
        docs.select("doc_id",
                    F.concat(F.lit("key "),
                             F.col("doc_id").cast("string"))
                    .alias("title")),
        ENGLISH_ANALYZER, text_col="title")
    assert capped.count() == 6

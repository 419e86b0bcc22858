"""facet.field parameter block (SimpleFacets.java:432) and JSON-facet
relatedness() (RelatednessAgg.java:699 / Grainger 2016 SKG).

The relatedness pins recompute the reference arithmetic in pure Python
(z-score, 5-sigmoid blend, Math.round-style 5-digit truncation) and
compare bit-for-bit.
"""

import math

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.search.facets import (
    facet_field_params, relatedness_facets)

DOCS = [
    # (doc_id, cat)
    (0, "apple"), (1, "apple"), (2, "apricot"), (3, "banana"),
    (4, "banana"), (5, "banana"), (6, "cherry"), (7, None), (8, None),
    (9, "avocado"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "cat"]).cache()


def _rows(df):
    return [(r.value, r["count"]) for r in df.collect()]


def test_prefix_and_index_sort(docs):
    got = _rows(facet_field_params(docs, None, "cat", prefix="a",
                                   sort="index"))
    assert got == [("apple", 2), ("apricot", 1), ("avocado", 1)]


def test_count_sort_ties_by_value(docs):
    got = _rows(facet_field_params(docs, None, "cat", sort="count"))
    assert got == [("banana", 3), ("apple", 2), ("apricot", 1),
                   ("avocado", 1), ("cherry", 1)]


def test_mincount(docs):
    got = _rows(facet_field_params(docs, None, "cat", mincount=2))
    assert got == [("banana", 3), ("apple", 2)]


def test_offset_limit_paginate(docs):
    got = _rows(facet_field_params(docs, None, "cat", sort="index",
                                   offset=1, limit=2))
    assert got == [("apricot", 1), ("avocado", 1)]


def test_missing_bucket_appended_and_exempt(docs):
    # prefix+mincount exclude everything but apple; missing is exempt
    got = _rows(facet_field_params(docs, None, "cat", prefix="a",
                                   mincount=2, missing=True))
    assert got == [("apple", 2), (None, 2)]


def test_limit_zero_with_missing(docs):
    got = _rows(facet_field_params(docs, None, "cat", limit=0,
                                   missing=True))
    assert got == [(None, 2)]


def test_match_set_restricts(docs, spark):
    matches = spark.createDataFrame([(0,), (3,), (7,)], ["doc_id"])
    got = _rows(facet_field_params(docs, matches, "cat", sort="index",
                                   missing=True))
    assert got == [("apple", 1), ("banana", 1), (None, 1)]


def test_bad_sort_raises(docs):
    with pytest.raises(ValueError):
        facet_field_params(docs, None, "cat", sort="alpha")


# --- relatedness -----------------------------------------------------------

def _round5(v):
    return math.floor(v * 1e5 + 0.5) / 1e5


def _sig(x, off, scale):
    return (x + off) / (scale + abs(x + off))


def _rel(fg_count, fg_size, bg_count, bg_size):
    p = bg_count / bg_size
    denom = math.sqrt(fg_size * p * (1 - p))
    denom = denom if denom != 0 else 1e-10
    z = (fg_count - fg_size * p) / denom
    return _round5(0.2 * _sig(z, -80, 50) + 0.2 * _sig(z, -30, 30)
                   + 0.2 * _sig(z, 0, 30) + 0.2 * _sig(z, 30, 30)
                   + 0.2 * _sig(z, 80, 50))


def test_relatedness_reference_arithmetic(docs, spark):
    fg = spark.createDataFrame([(0,), (1,), (3,)], ["doc_id"])  # 2 apple, 1 banana
    out = {r.value: r for r in
           relatedness_facets(docs, fg, None, "cat", mincount=0).collect()}
    assert out["apple"].fg_size == 3 and out["apple"].bg_size == 10
    for v, fgc, bgc in [("apple", 2, 2), ("banana", 1, 3), ("cherry", 0, 1),
                        ("apricot", 0, 1), ("avocado", 0, 1)]:
        r = out[v]
        assert r.fg_count == fgc and r.bg_count == bgc
        assert r.relatedness == pytest.approx(_rel(fgc, 3, bgc, 10), abs=0)
        assert r.fg_pop == _round5(fgc / 10) and r.bg_pop == _round5(bgc / 10)


def test_relatedness_overrepresented_positive(docs, spark):
    # apple is 2/3 of fg but 2/10 of bg → strongly positive; cherry is
    # absent from fg → negative
    fg = spark.createDataFrame([(0,), (1,), (3,)], ["doc_id"])
    out = {r.value: r.relatedness for r in
           relatedness_facets(docs, fg, None, "cat", mincount=0).collect()}
    assert out["apple"] > 0 and out["apple"] == max(out.values())
    assert out["cherry"] < 0


def test_relatedness_mincount_prunes_fg_absent(docs, spark):
    fg = spark.createDataFrame([(0,), (1,)], ["doc_id"])
    vals = {r.value for r in
            relatedness_facets(docs, fg, None, "cat", mincount=1).collect()}
    assert vals == {"apple"}


def test_relatedness_degenerate_p_one(spark):
    # every bg doc holds the same value → p = 1 → denom 0 → 1e-10 guard
    d = spark.createDataFrame([(i, "only") for i in range(4)],
                              ["doc_id", "cat"])
    fg = spark.createDataFrame([(0,), (1,)], ["doc_id"])
    r = relatedness_facets(d, fg, None, "cat", mincount=0).collect()[0]
    assert r.relatedness == pytest.approx(_rel(2, 2, 4, 4), abs=0)


# --- solr_range_facets (facet.range start/end/gap + other) ------------------

NUMS = [(i, v) for i, v in enumerate([5, 15, 25, 35, 45, 55, 65, 95, 120])]


@pytest.fixture(scope="module")
def nums(spark):
    return spark.createDataFrame(NUMS, ["doc_id", "v"]).cache()


def _pairs(df):
    return [(r.label, r["count"]) for r in df.collect()]


def test_gap_buckets_generated(nums):
    from lucene_solr_spark.search.facets import solr_range_facets
    got = _pairs(solr_range_facets(nums, None, "v", 10, 70, 20))
    assert got == [("10", 2), ("30", 2), ("50", 2)]


def test_hardend_clips_last_bucket(nums):
    from lucene_solr_spark.search.facets import solr_range_facets
    # without hardend the last bucket runs to 90 (covers 65); with it,
    # the bucket stops at end=75 (still covers 65) — use end=60 to see
    # the clip: [50,60) excludes 65
    got = _pairs(solr_range_facets(nums, None, "v", 10, 60, 20,
                                   hardend=True))
    assert got == [("10", 2), ("30", 2), ("50", 1)]
    got2 = _pairs(solr_range_facets(nums, None, "v", 10, 60, 20,
                                    hardend=False))
    assert got2 == [("10", 2), ("30", 2), ("50", 2)]   # soft end → 70


def test_other_buckets(nums):
    from lucene_solr_spark.search.facets import solr_range_facets
    got = dict(_pairs(solr_range_facets(
        nums, None, "v", 10, 70, 20, other=("before", "after", "between"))))
    assert got["before"] == 1            # 5
    assert got["after"] == 2             # 95, 120 (bound = 70)
    assert got["between"] == 6           # 15..65


def test_other_unknown_raises(nums):
    from lucene_solr_spark.search.facets import solr_range_facets
    with pytest.raises(ValueError):
        solr_range_facets(nums, None, "v", 0, 10, 5, other=("outside",))


def test_nonpositive_gap_raises(nums):
    from lucene_solr_spark.search.facets import solr_range_facets
    with pytest.raises(ValueError):
        solr_range_facets(nums, None, "v", 0, 10, 0)


# --- scale() function query (ScaleFloatFunction.java) ------------------------

def test_scale_expr_maps_observed_range(spark):
    from lucene_solr_spark.search.function import scale_expr
    d = spark.createDataFrame([(0, 10.0), (1, 20.0), (2, 30.0)],
                              ["doc_id", "x"])
    got = {r.doc_id: r.s for r in
           d.select("doc_id", scale_expr(d, "x", 0.0, 1.0).alias("s"))
           .collect()}
    assert got == {0: 0.0, 1: 0.5, 2: 1.0}


def test_scale_expr_target_window(spark):
    from lucene_solr_spark.search.function import scale_expr
    d = spark.createDataFrame([(0, 10.0), (1, 30.0)], ["doc_id", "x"])
    got = {r.doc_id: r.s for r in
           d.select("doc_id", scale_expr(d, "x", 5.0, 7.0).alias("s"))
           .collect()}
    assert got == {0: 5.0, 1: 7.0}


def test_scale_expr_constant_source_guard(spark):
    # maxSrc == minSrc → scale = 0 → every doc gets target_min (the
    # reference's explicit division-by-zero guard)
    from lucene_solr_spark.search.function import scale_expr
    d = spark.createDataFrame([(0, 4.0), (1, 4.0)], ["doc_id", "x"])
    got = {r.doc_id: r.s for r in
           d.select("doc_id", scale_expr(d, "x", 2.0, 9.0).alias("s"))
           .collect()}
    assert got == {0: 2.0, 1: 2.0}


# --- block-join faceting (uniqueBlock) ---------------------------------------

def test_blockjoin_facet_counts_parents_once(spark):
    from lucene_solr_spark.search.join import block_join_facet
    kids = spark.createDataFrame(
        [  # (parent, tag, qty): parent 1 has TWO matching 'red' kids
            (1, "red", 9), (1, "red", 8), (1, "blue", 9),
            (2, "red", 9), (2, "blue", 1),       # blue kid filtered out
            (3, "blue", 7),
        ], ["pid", "tag", "qty"])
    got = [(r.value, r["count"]) for r in
           block_join_facet(kids, F.col("qty") >= 5, "pid", "tag")
           .collect()]
    # red: parents {1,2} → 2 (not 3 raw matches); blue: {1,3} → 2
    assert got == [("blue", 2), ("red", 2)]


def test_blockjoin_facet_vs_plain_child_facet(spark):
    from lucene_solr_spark.search.join import block_join_facet
    kids = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "x"), (2, "x")], ["pid", "tag"])
    got = block_join_facet(kids, F.lit(True), "pid", "tag").collect()
    assert got[0]["count"] == 2   # a plain child facet would say 4

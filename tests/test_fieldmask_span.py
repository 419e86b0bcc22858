"""FieldMaskingSpanQuery (spans/FieldMaskingSpanQuery.java:61).

The mask lies about the wrapped span's field so compositors accept
cross-field clauses; position streams come from the REAL field and the
composite scores with the MASK field's norms. Fixture: title = the
first tokens of text (parallel position spaces, the class's documented
use case — teacher/student parallel fields).
"""

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.search.executor import Searcher
from lucene_solr_spark.search.ast import (
    FieldMaskingSpanQuery, SpanNearQuery, SpanOrQuery, SpanTermQuery)

DOCS = [
    # masked chain target: title holds 'alpha' at p0, text has 'gamma'
    # at p2 → gap 1 ≤ slop
    (0, "alpha beta gamma delta epsilon zeta", "alpha beta"),
    # 'alpha' only in TEXT (p0), title lacks it → masked clause no match
    (1, "alpha gamma beta delta epsilon zeta", "omega psi"),
    # title has alpha but gamma too far (p5 → gap 4 > slop 2)
    (2, "alpha beta delta epsilon zeta gamma", "alpha beta"),
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "title"])
    return IndexBuilder(ENGLISH_ANALYZER, with_positions=True,
                        fields=("text", "title")).build(spark, df)


def _mask_near(slop):
    return SpanNearQuery(clauses=(
        FieldMaskingSpanQuery(SpanTermQuery("alpha", field="title"),
                              field="text"),
        SpanTermQuery("gamma", field="text")), slop=slop, in_order=True)


def test_unmasked_cross_field_raises(spark, idx):
    s = Searcher(spark, idx)
    q = SpanNearQuery(clauses=(SpanTermQuery("alpha", field="title"),
                               SpanTermQuery("gamma", field="text")),
                      slop=2, in_order=True)
    with pytest.raises(ValueError, match="share one field"):
        s.top_k(q, k=5)


def test_masked_cross_field_matches(spark, idx):
    s = Searcher(spark, idx)
    pdf = s.top_k(_mask_near(slop=2), k=5)
    # doc 0: title alpha@0 → text gamma@2, gap 1 ✓
    # doc 1: alpha not in title ✗ ; doc 2: gap 4 > 2 ✗
    assert list(pdf["doc_id"].astype(int)) == [0]


def test_masked_slop_widens(spark, idx):
    s = Searcher(spark, idx)
    pdf = s.top_k(_mask_near(slop=4), k=5)
    assert sorted(pdf["doc_id"].astype(int)) == [0, 2]


def test_self_mask_is_identity(spark, idx):
    # masking a clause AS ITS OWN field changes nothing — scores equal
    s = Searcher(spark, idx)
    plain = SpanNearQuery(terms=("alpha", "gamma"), slop=4)
    masked = SpanNearQuery(clauses=(
        FieldMaskingSpanQuery(SpanTermQuery("alpha", field="text"),
                              field="text"),
        SpanTermQuery("gamma", field="text")), slop=4, in_order=True)
    a = s.top_k(plain, k=5, mode="f64")
    b = s.top_k(masked, k=5, mode="f64")
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["score"]) == list(b["score"])


def test_mask_under_span_or(spark, idx):
    # the mask composes under other span operators
    s = Searcher(spark, idx)
    q = SpanOrQuery((
        FieldMaskingSpanQuery(SpanTermQuery("omega", field="title"),
                              field="text"),
        SpanTermQuery("zeta", field="text")))
    pdf = s.top_k(q, k=5)
    assert sorted(pdf["doc_id"].astype(int)) == [0, 1, 2]


def test_fully_masked_tree_raises(spark, idx):
    # no clause actually reads the mask field → its norm bytes are on
    # no leaf posting; the engine refuses rather than mis-scoring
    s = Searcher(spark, idx)
    q = SpanNearQuery(clauses=(
        FieldMaskingSpanQuery(SpanTermQuery("alpha", field="title"),
                              field="text"),
        FieldMaskingSpanQuery(SpanTermQuery("beta", field="title"),
                              field="text")), slop=1, in_order=True)
    with pytest.raises(ValueError, match="fully-masked"):
        s.top_k(q, k=5)


def test_mask_order_independent_scoring(spark, idx):
    # norm precedence is deterministic (mask-field leaves write last),
    # so swapping clause order only changes span chaining, not which
    # field's norms score a match: masked-first vs masked-second near
    # queries over the same pair agree on doc 0's score
    s = Searcher(spark, idx)
    masked_first = SpanNearQuery(clauses=(
        FieldMaskingSpanQuery(SpanTermQuery("alpha", field="title"),
                              field="text"),
        SpanTermQuery("beta", field="text")), slop=2, in_order=True)
    masked_second = SpanNearQuery(clauses=(
        SpanTermQuery("alpha", field="text"),
        FieldMaskingSpanQuery(SpanTermQuery("beta", field="title"),
                              field="text")), slop=2, in_order=True)
    a = s.top_k(masked_first, k=5, mode="f64")
    b = s.top_k(masked_second, k=5, mode="f64")
    # both chains match doc 0 (alpha@0 → beta@1 in both position
    # spaces) with identical gap, idf (same per-field dfs) and norms
    ra = {int(d): float(v) for d, v in zip(a["doc_id"], a["score"])}
    rb = {int(d): float(v) for d, v in zip(b["doc_id"], b["score"])}
    assert 0 in ra and 0 in rb
    assert ra[0] == rb[0]

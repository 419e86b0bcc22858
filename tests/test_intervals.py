"""IntervalQuery (queries/intervals) — minimal-interval semantics over
ordered / unordered / block sources with maxgaps / maxwidth filters and
saturation scoring (IntervalScorer.java:66-72,
IntervalScoreFunction.java:69-73).

The pyoracle interprets the SAME compiled iv-op plan by brute force
(enumerate every admissible child combination, then strip non-minimal
intervals) — an independent statement of the canonical minimal-interval
algebra, so engine vs oracle differentials validate the executor's
vectorized searchsorted fold, not an echo of it.

NOTE on fidelity: Lucene's lazy iterators (OrderedIntervalsSource.java
:133-165, UnorderedIntervalsSource queue) enumerate the same minimal
set on distinct-term sources; on REPEATED terms across sources the lazy
enumeration can skip or duplicate envelopes the canonical set
includes — the engine implements the canonical algebra and that spec
is what both oracles pin (same posture as the span divergence pins in
tests/test_sloppy_adversarial.py).
"""

import numpy as np
import pytest

from lucene_solr_spark.analysis.analyzer import StandardAnalyzer
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import (
    BooleanQuery, Clause, DisjunctionMaxQuery, IntervalBlock,
    IntervalMaxGaps, IntervalMaxWidth, IntervalOrdered, IntervalQuery,
    IntervalTerm, IntervalUnordered, Occur, TermQuery,
)

K = 20
ANN = StandardAnalyzer(stop_words=frozenset())


def _mk(spark, rows):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")
    oracle = OracleIndex(ANN)
    for r in docs.collect():
        oracle.add(r["doc_id"], r["text"])
    idx = IndexBuilder(ANN, grid=4, with_positions=True).build(spark, docs)
    idx.postings = idx.postings.cache()
    return oracle, Searcher(spark, idx)


def _check(oracle, searcher, q, label, expect_ids=None):
    got = searcher.top_k(q, k=K)
    exp = oracle.search_ast(q, k=K)
    assert got["doc_id"].astype(int).tolist() == [d for d, _ in exp], label
    np.testing.assert_array_equal(
        got["score"].to_numpy().astype(np.float32),
        np.array([s for _, s in exp], dtype=np.float32), err_msg=label)
    if expect_ids is not None:
        assert sorted(got["doc_id"].astype(int).tolist()) == sorted(
            expect_ids), label
    return got


def test_ordered_basic(spark):
    """Ordered (aa, bb): matches need aa strictly before bb."""
    oracle, s = _mk(spark, [
        "aa xx bb",        # one interval [0,2]
        "bb xx aa",        # wrong order → no match
        "aa bb",           # [0,1]
        "xx yy zz",        # neither
    ])
    q = IntervalQuery(IntervalOrdered((IntervalTerm("aa"),
                                       IntervalTerm("bb"))))
    got = _check(oracle, s, q, "ordered", expect_ids=[0, 2])
    # doc 2: one interval length 2, minExtent 2 → freq 1 → score 0.5
    sc = dict(zip(got["doc_id"].astype(int), got["score"]))
    assert sc[2] == pytest.approx(0.5)
    # doc 0: length 3 → 1/max(3-2+1,1)=0.5 → score 0.5/1.5
    assert sc[0] == pytest.approx(0.5 / 1.5, rel=1e-6)


def test_ordered_minimality(spark):
    """aa aa bb: only the TIGHT interval [1,2] is enumerated — the
    containing [0,2] is stripped (minimal-interval algebra)."""
    oracle, s = _mk(spark, ["aa aa bb"])
    q = IntervalQuery(IntervalOrdered((IntervalTerm("aa"),
                                       IntervalTerm("bb"))))
    got = _check(oracle, s, q, "minimality", expect_ids=[0])
    # exactly one minimal interval of length 2 → freq 1 → score 0.5
    assert got["score"].iloc[0] == pytest.approx(0.5)


def test_ordered_three_terms(spark):
    oracle, s = _mk(spark, [
        "aa xx bb yy cc",      # [0,4]
        "aa cc bb",            # no (cc before bb)
        "aa bb cc aa bb cc",   # [0,2], [3,5] (and NOT the wide [0,5])
        "cc bb aa",
    ])
    q = IntervalQuery(IntervalOrdered((IntervalTerm("aa"),
                                       IntervalTerm("bb"),
                                       IntervalTerm("cc"))))
    got = _check(oracle, s, q, "ordered3", expect_ids=[0, 2])
    sc = dict(zip(got["doc_id"].astype(int), got["score"]))
    # doc 2: two length-3 intervals → freq 2 → 2/3
    assert sc[2] == pytest.approx(2.0 / 3.0, rel=1e-6)


def test_maxgaps_filter(spark):
    oracle, s = _mk(spark, [
        "aa bb",               # gaps 0
        "aa xx bb",            # gaps 1
        "aa xx yy zz bb",      # gaps 3 → filtered at maxgaps=1
    ])
    src = IntervalMaxGaps(IntervalOrdered((IntervalTerm("aa"),
                                           IntervalTerm("bb"))), gaps=1)
    _check(oracle, s, IntervalQuery(src), "maxgaps", expect_ids=[0, 1])


def test_maxwidth_filter(spark):
    oracle, s = _mk(spark, [
        "aa bb",               # width 2
        "aa xx yy bb",         # width 4 → filtered at maxwidth=3
    ])
    src = IntervalMaxWidth(IntervalOrdered((IntervalTerm("aa"),
                                            IntervalTerm("bb"))), width=3)
    _check(oracle, s, IntervalQuery(src), "maxwidth", expect_ids=[0])


def test_unordered(spark):
    oracle, s = _mk(spark, [
        "aa xx bb",        # envelope [0,2]
        "bb xx aa",        # unordered matches too
        "xx aa yy",        # bb missing
        "bb aa",           # [0,1]
    ])
    q = IntervalQuery(IntervalUnordered((IntervalTerm("aa"),
                                         IntervalTerm("bb"))))
    got = _check(oracle, s, q, "unordered", expect_ids=[0, 1, 3])
    sc = dict(zip(got["doc_id"].astype(int), got["score"]))
    assert sc[3] == pytest.approx(0.5)


def test_unordered_minimal_envelopes(spark):
    """aa ... bb ... aa: two minimal envelopes (aa@0,bb) and (bb,aa@4),
    not the containing [0,4]."""
    oracle, s = _mk(spark, ["aa xx bb yy aa"])
    q = IntervalQuery(IntervalUnordered((IntervalTerm("aa"),
                                         IntervalTerm("bb"))))
    got = _check(oracle, s, q, "unordered-min", expect_ids=[0])
    # [0,2] and [2,4]: each freq 1/max(3-2+1,1)=0.5 → freq 1 → 0.5
    assert got["score"].iloc[0] == pytest.approx(0.5)


def test_block_is_exact_phrase(spark):
    oracle, s = _mk(spark, [
        "aa bb cc",        # block matches
        "aa xx bb cc",     # aa-bb not adjacent
        "bb cc aa",        # no
    ])
    q = IntervalQuery(IntervalBlock(("aa", "bb")))
    got = _check(oracle, s, q, "block", expect_ids=[0])
    assert got["score"].iloc[0] == pytest.approx(0.5)   # freq 1


def test_nested_ordered_of_blocks(spark):
    """ordered(block(aa bb), cc) — composition over non-term sources."""
    oracle, s = _mk(spark, [
        "aa bb xx cc",     # block [0,1] then cc@3 ✓
        "cc aa bb",        # cc before the block ✗
        "aa xx bb cc",     # no block ✗
        "aa bb cc",        # [0,2] ✓ gaps 0
    ])
    q = IntervalQuery(IntervalOrdered((IntervalBlock(("aa", "bb")),
                                       IntervalTerm("cc"))))
    _check(oracle, s, q, "nested", expect_ids=[0, 3])


def test_interval_under_boolean_and_dismax(spark):
    """Interval leaves compose under MUST/SHOULD/MUST_NOT and dismax
    exactly like phrase leaves."""
    oracle, s = _mk(spark, [
        "aa bb qq",
        "aa bb",
        "qq zz aa bb",
        "qq aa",
    ])
    iv = IntervalQuery(IntervalOrdered((IntervalTerm("aa"),
                                        IntervalTerm("bb"))))
    q = BooleanQuery((Clause(Occur.MUST, iv),
                      Clause(Occur.SHOULD, TermQuery("qq"))))
    _check(oracle, s, q, "bool+interval", expect_ids=[0, 1, 2])
    q2 = DisjunctionMaxQuery((iv, TermQuery("qq")), 0.4)
    _check(oracle, s, q2, "dismax+interval", expect_ids=[0, 1, 2, 3])
    q3 = BooleanQuery((Clause(Occur.MUST, TermQuery("qq")),
                       Clause(Occur.MUST_NOT, iv)))
    _check(oracle, s, q3, "notinterval", expect_ids=[3])


def test_pivot_and_boost(spark):
    from lucene_solr_spark.search.ast import BoostQuery
    oracle, s = _mk(spark, ["aa bb", "aa bb aa bb"])
    q = IntervalQuery(IntervalOrdered((IntervalTerm("aa"),
                                       IntervalTerm("bb"))), pivot=2.0)
    got = _check(oracle, s, q, "pivot")
    sc = dict(zip(got["doc_id"].astype(int), got["score"]))
    assert sc[0] == pytest.approx(1.0 - 2.0 / 3.0, rel=1e-6)
    q2 = BoostQuery(q, 3.0)
    got2 = _check(oracle, s, q2, "boost")
    sc2 = dict(zip(got2["doc_id"].astype(int), got2["score"]))
    assert sc2[0] == pytest.approx(3.0 * (1.0 - 2.0 / 3.0), rel=1e-6)


def test_randomized_differential(spark):
    """Random tiny corpus with heavy term repetition — the adversarial
    regime for minimal-interval enumeration; engine (vectorized fold)
    vs brute-force canonical oracle must agree on every shape."""
    import random
    rng = random.Random(42)
    vocab = ["aa", "bb", "cc", "xx"]
    rows = [" ".join(rng.choice(vocab) for _ in range(rng.randint(3, 14)))
            for _ in range(40)]
    oracle, s = _mk(spark, rows)
    shapes = [
        IntervalOrdered((IntervalTerm("aa"), IntervalTerm("bb"))),
        IntervalOrdered((IntervalTerm("aa"), IntervalTerm("bb"),
                         IntervalTerm("cc"))),
        IntervalUnordered((IntervalTerm("aa"), IntervalTerm("cc"))),
        IntervalMaxGaps(IntervalOrdered((IntervalTerm("bb"),
                                         IntervalTerm("cc"))), gaps=2),
        IntervalMaxWidth(IntervalUnordered((IntervalTerm("aa"),
                                            IntervalTerm("bb"))), width=4),
        IntervalOrdered((IntervalBlock(("aa", "bb")), IntervalTerm("cc"))),
    ]
    for i, src in enumerate(shapes):
        _check(oracle, s, IntervalQuery(src), f"rand-{i}")


def test_unordered_three_sources_raises(spark):
    with pytest.raises(ValueError, match="exactly 2"):
        oracle, s = _mk(spark, ["aa bb cc"])
        s.top_k(IntervalQuery(IntervalUnordered(
            (IntervalTerm("aa"), IntervalTerm("bb"), IntervalTerm("cc")))),
            k=5)


def test_interval_in_batch_query(spark):
    """top_k_many (one-job batch) scores interval leaves identically to
    per-query top_k."""
    oracle, s = _mk(spark, ["aa xx bb", "bb aa", "aa bb cc", "xx yy"])
    qs = [IntervalQuery(IntervalOrdered((IntervalTerm("aa"),
                                         IntervalTerm("bb")))),
          TermQuery("aa")]
    batch = s.top_k_many(qs, k=5)
    for q, got in zip(qs, batch):
        single = s.top_k(q, k=5)
        assert got["doc_id"].tolist() == single["doc_id"].tolist()
        np.testing.assert_allclose(got["score"].to_numpy(),
                                   single["score"].to_numpy(), rtol=0)


def test_interval_or_and_containment(spark):
    from lucene_solr_spark.search.ast import (IntervalContainedBy,
                                              IntervalContaining,
                                              IntervalNotContainedBy,
                                              IntervalNotContaining,
                                              IntervalOr)
    rows = [
        "aa xx bb cc",      # ordered(aa,bb)=[0,2] contains xx@1
        "aa bb cc",         # [0,1] contains nothing between
        "cc aa yy bb",      # [1,3] contains yy
        "bb cc aa",         # no ordered match
    ]
    oracle, s = _mk(spark, rows)
    ab = IntervalOrdered((IntervalTerm("aa"), IntervalTerm("bb")))
    # or: union of two term streams
    q_or = IntervalQuery(IntervalOr((IntervalTerm("aa"),
                                     IntervalTerm("cc"))))
    _check(oracle, s, q_or, "ior", expect_ids=[0, 1, 2, 3])
    # containing: ordered(aa,bb) spans holding an xx
    q_c = IntervalQuery(IntervalContaining(ab, IntervalTerm("xx")))
    _check(oracle, s, q_c, "containing", expect_ids=[0])
    q_nc = IntervalQuery(IntervalNotContaining(ab, IntervalTerm("xx")))
    _check(oracle, s, q_nc, "not-containing", expect_ids=[1, 2])
    # containedBy: cc inside unordered(aa, ...)? use big = ordered(cc? )
    big = IntervalOrdered((IntervalTerm("aa"), IntervalTerm("cc")))
    q_cb = IntervalQuery(IntervalContainedBy(IntervalTerm("bb"), big))
    # doc 0: big [0,3] holds bb@2 ✓; doc 1: big [0,2] holds bb@1 ✓;
    # doc 2: big [1,?]: ordered aa@1..cc? cc@0 before aa → no big ✗
    _check(oracle, s, q_cb, "contained-by", expect_ids=[0, 1])
    q_ncb = IntervalQuery(IntervalNotContainedBy(IntervalTerm("bb"), big))
    _check(oracle, s, q_ncb, "not-contained-by", expect_ids=[2, 3])
    # ior survives a dead alternative (zz never indexed)
    q_dead = IntervalQuery(IntervalOr((IntervalTerm("aa"),
                                       IntervalTerm("zz"))))
    got = s.top_k(q_dead, k=10)
    assert sorted(got["doc_id"].astype(int)) == [0, 1, 2, 3]


def test_interval_or_randomized(spark):
    import random
    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "xx"]
    rows = [" ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))
            for _ in range(30)]
    oracle, s = _mk(spark, rows)
    ab = IntervalOrdered((IntervalTerm("aa"), IntervalTerm("bb")))
    from lucene_solr_spark.search.ast import (IntervalContaining,
                                              IntervalNotContaining,
                                              IntervalOr)
    shapes = [
        IntervalOr((ab, IntervalBlock(("cc", "xx")))),
        IntervalContaining(ab, IntervalTerm("cc")),
        IntervalNotContaining(ab, IntervalTerm("cc")),
        IntervalMaxGaps(IntervalOr((IntervalTerm("aa"),
                                    IntervalTerm("cc"))), gaps=0),
    ]
    for i, src in enumerate(shapes):
        _check(oracle, s, IntervalQuery(src), f"rand-orcont-{i}")


def test_interval_prefix_wildcard_expansion(spark):
    """MultiTermIntervalsSource (Intervals.prefix/wildcard): the source
    expands against the dictionary into an interval-or before planning;
    an unmatched expansion kills any conjunction over it."""
    from lucene_solr_spark.search.ast import (IntervalOr, IntervalPrefix,
                                              IntervalQuery,
                                              IntervalWildcard)
    oracle, s = _mk(spark, [
        "apple bb", "apricot bb", "banana bb", "bb apple",
    ])
    # prefix ap* ordered-before bb ≡ or(apple, apricot) ordered bb
    q_pref = IntervalQuery(IntervalOrdered((IntervalPrefix("ap"),
                                            IntervalTerm("bb"))))
    q_or = IntervalQuery(IntervalOrdered((
        IntervalOr((IntervalTerm("apple"), IntervalTerm("apricot"))),
        IntervalTerm("bb"))))
    got_p = s.top_k(q_pref, k=10)
    got_o = s.top_k(q_or, k=10)
    assert got_p["doc_id"].tolist() == got_o["doc_id"].tolist() \
        and sorted(got_p["doc_id"].astype(int)) == [0, 1]
    np.testing.assert_array_equal(got_p["score"].to_numpy(),
                                  got_o["score"].to_numpy())
    # wildcard with infix
    q_w = IntervalQuery(IntervalOrdered((IntervalWildcard("*anan*"),
                                         IntervalTerm("bb"))))
    assert s.top_k(q_w, k=10)["doc_id"].tolist() == [2]
    # dead prefix: conjunction matches nothing
    q_dead = IntervalQuery(IntervalOrdered((IntervalPrefix("zz"),
                                            IntervalTerm("bb"))))
    assert len(s.top_k(q_dead, k=10)) == 0


def test_interval_relative_position_filters(spark):
    """Intervals.before/after/overlapping/nonOverlapping/notWithin/
    within (Intervals.java factory compositions) — deterministic corpus
    then engine-vs-brute-oracle on every shape."""
    from lucene_solr_spark.search.ast import (
        IntervalAfter, IntervalBefore, IntervalNonOverlapping,
        IntervalNotWithin, IntervalOrdered, IntervalOverlapping,
        IntervalWithin)
    rows = [
        "aa bb xx",          # 0: ab=[0,1], xx@2 after; aa before xx
        "xx aa bb",          # 1: ab=[1,2], xx@0 before ab
        "aa xx bb",          # 2: ab=[0,2] overlaps xx@1
        "aa bb",             # 3: no xx at all
        "xx yy zz aa bb",    # 4: ab=[3,4], xx@0 far before
    ]
    oracle, s = _mk(spark, rows)
    ab = IntervalOrdered((IntervalTerm("aa"), IntervalTerm("bb")))
    xx = IntervalTerm("xx")
    # ab intervals entirely BEFORE some xx
    q = IntervalQuery(IntervalBefore(ab, xx))
    _check(oracle, s, q, "before", expect_ids=[0])
    # ab intervals entirely AFTER some xx
    q = IntervalQuery(IntervalAfter(ab, xx))
    _check(oracle, s, q, "after", expect_ids=[1, 4])
    # ab intervals OVERLAPPING some xx (xx inside [0,2] overlaps)
    q = IntervalQuery(IntervalOverlapping(ab, xx))
    _check(oracle, s, q, "overlapping", expect_ids=[2])
    # ab intervals overlapping NO xx (docs without xx keep all)
    q = IntervalQuery(IntervalNonOverlapping(ab, xx))
    _check(oracle, s, q, "non-overlapping", expect_ids=[0, 1, 3, 4])
    # notWithin 1: ab at least 2 positions from every xx
    q = IntervalQuery(IntervalNotWithin(ab, 1, xx))
    _check(oracle, s, q, "not-within", expect_ids=[3, 4])
    # within 2: ab within 2 positions of some xx (containedBy ±2)
    q = IntervalQuery(IntervalWithin(ab, 2, xx))
    _check(oracle, s, q, "within", expect_ids=[0, 1, 2])


def test_interval_relative_randomized(spark):
    import random
    rng = random.Random(23)
    vocab = ["aa", "bb", "cc", "xx"]
    rows = [" ".join(rng.choice(vocab) for _ in range(rng.randint(3, 14)))
            for _ in range(40)]
    oracle, s = _mk(spark, rows)
    from lucene_solr_spark.search.ast import (
        IntervalAfter, IntervalBefore, IntervalNonOverlapping,
        IntervalNotWithin, IntervalOverlapping, IntervalWithin)
    ab = IntervalOrdered((IntervalTerm("aa"), IntervalTerm("bb")))
    xx = IntervalTerm("xx")
    cc = IntervalTerm("cc")
    shapes = [
        IntervalBefore(ab, xx), IntervalAfter(ab, xx),
        IntervalOverlapping(ab, xx), IntervalNonOverlapping(ab, xx),
        IntervalNotWithin(ab, 1, xx), IntervalWithin(ab, 2, xx),
        IntervalBefore(cc, ab), IntervalAfter(cc, ab),
        IntervalOverlapping(IntervalUnordered((IntervalTerm("aa"),
                                               cc)), xx),
        IntervalWithin(cc, 1, ab),
    ]
    for i, src in enumerate(shapes):
        _check(oracle, s, IntervalQuery(src), f"rand-rel-{i}")

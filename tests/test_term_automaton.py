"""TermAutomatonQuery (`sandbox/.../TermAutomatonQuery.java:63`,
`TermAutomatonScorer.java:225` countMatches) — differential against an
independent full-token-stream NFA run straight over the analyzed text
(the engine only ever sees the query terms' position streams and
bridges the gaps via ANY steps; the brute force walks EVERY token), and
cross-pinned against the engine's own PhraseQuery scoring for the
linear-chain degeneration."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import PhraseQuery
from lucene_solr_spark.search.automaton import (TermAutomaton, from_phrase,
                                                term_automaton_scores,
                                                term_automaton_topk)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=64,
                       with_positions=True).build(spark, docs).cache()
    return docs, Searcher(spark, idx)


def brute_counts(docs, auto: TermAutomaton) -> dict[int, int]:
    """Independent NFA over the FULL token stream: query terms step by
    their id, every other token steps pending states by ANY only; a
    fresh match seeds from state 0 at query-term tokens; accepts count
    with path multiplicity (PosState keeps duplicates)."""
    step, accept = auto._step, auto._det_accept
    tid_of = {t: auto._term_to_id[t] for t in auto.terms}
    any_id = auto.any_id
    out = {}
    for r in docs.select("doc_id", "text").collect():
        toks, poss = ENGLISH_ANALYZER.tokens_positions(r["text"])
        by_pos = {p: tid_of.get(t) for t, p in zip(toks, poss)}
        pending: list[int] = []
        freq = 0
        started = False
        for p in range(max(poss) + 1 if poss else 0):
            tid = by_pos.get(p)   # None = stopword hole or non-query term
            nxt: list[int] = []
            # the reference's gap-advance (countMatches:265-287) steps
            # EVERY position's pending states via ANY — including the
            # previous token's own position, whose states were already
            # stepped by their term (PosState is not cleared), so a
            # state with both arcs lands TWICE; faithful = uncond ANY
            if started and any_id is not None:
                for st in pending:
                    s2 = step[st, any_id]
                    if s2 >= 0:
                        nxt.append(int(s2))
            if tid is not None:
                for st in pending:
                    s2 = step[st, tid]
                    if s2 >= 0:
                        nxt.append(int(s2))
                        if accept[s2]:
                            freq += 1
                s2 = step[0, tid]
                if s2 >= 0:
                    nxt.append(int(s2))
                    if accept[s2]:
                        freq += 1
                started = True
            pending = nxt
        if freq > 0:
            out[int(r["doc_id"])] = freq
    return out


def test_linear_chain_equals_phrase(corpus):
    """from_phrase(a, b) must score exactly like PhraseQuery(a, b) in
    the engine's f64 oracle mode (same stats convention, same freq)."""
    docs, s = corpus
    auto = from_phrase(["merge", "sort"]).finish()
    got = (term_automaton_topk(s, auto, k=10).toPandas()
           .set_index("doc_id")["score"])
    exp_df = s.score_all(PhraseQuery(("merge", "sort")), mode="f64") \
        .orderBy(F.desc("score"), F.asc("doc_id")).limit(10).toPandas()
    exp = exp_df.set_index("doc_id")["score"]
    assert list(got.index) == list(exp.index)
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(), rtol=1e-12)


def test_branching_automaton_brute_force(corpus):
    """(merge|fast) table — two transitions into one state, then a
    required term: counts must match the full-token NFA everywhere."""
    docs, s = corpus
    a = TermAutomaton()
    s1 = a.create_state()
    s2 = a.create_state()
    a.add_transition(0, s1, "merge")
    a.add_transition(0, s1, "fast")
    a.add_transition(s1, s2, "table")
    a.set_accept(s2, True)
    a.finish()
    exp = brute_counts(docs, a)
    got = term_automaton_scores(s, a).toPandas()
    assert set(got["doc_id"]) == set(exp)


def test_any_gap_automaton_brute_force(corpus):
    """merge ANY table — a one-token hole bridged by an ANY transition
    (the countMatches gap-advance path)."""
    docs, s = corpus
    a = TermAutomaton()
    s1 = a.create_state()
    s2 = a.create_state()
    s3 = a.create_state()
    a.add_transition(0, s1, "merge")
    a.add_any_transition(s1, s2)
    a.add_transition(s2, s3, "table")
    a.set_accept(s3, True)
    a.finish()
    exp = brute_counts(docs, a)
    got = term_automaton_scores(s, a).toPandas()
    assert set(got["doc_id"]) == set(exp)
    # freq parity, not just the match set: recover freq from the score
    import math
    fs = s.index.field_stats("text")
    n = fs["doc_count"]
    avgdl = fs["sum_ttf"] / n
    st = s.term_stats([("text", "merge"), ("text", "table")])
    idf = sum(math.log(1 + (n - st[k][0] + 0.5) / (st[k][0] + 0.5))
              for k in st)
    norms = {r["doc_id"]: r["norm"] for r in
             s.index.norms.filter(F.col("field") == "text")
              .select("doc_id", "norm").collect()}
    from lucene_solr_spark.functions.smallfloat import LENGTH_TABLE
    for _, r in got.iterrows():
        d = int(r["doc_id"])
        dl = float(LENGTH_TABLE[int(norms[d])])
        kk = 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
        f = r["score"] * kk / (idf - r["score"])
        assert round(f) == exp[d], f"doc {d}: freq {f} != {exp[d]}"


def test_leading_trailing_any_rejected():
    a = TermAutomaton()
    s1 = a.create_state()
    a.add_any_transition(0, s1)
    a.set_accept(s1, True)
    with pytest.raises(ValueError, match="lead with an ANY"):
        a.finish()
    b = TermAutomaton()
    s1 = b.create_state()
    s2 = b.create_state()
    b.add_transition(0, s1, "merge")
    b.add_any_transition(s1, s2)
    b.set_accept(s2, True)
    with pytest.raises(ValueError, match="end with an ANY"):
        b.finish()


def test_duplicate_paths_count_twice():
    """Two converging paths to one accept landing on the same token
    both count (PosState.add keeps duplicates)."""
    a = TermAutomaton()
    s1 = a.create_state()
    s2 = a.create_state()
    s3 = a.create_state()
    a.add_transition(0, s1, "x")
    a.add_transition(0, s2, "y")
    a.add_transition(s1, s3, "z")
    a.add_transition(s2, s3, "z")
    a.set_accept(s3, True)
    a.finish()
    # token stream: x y z  →  x@0, y@1, z@2; the x-path died (x then y
    # is not x..z adjacency? positions: state(p)→state(p+1)) —
    # x@0 → s1 pending at pos1; y@1 steps s1 by y (dead), seeds s2 at
    # pos2; z@2 steps s2→s3 accept once. freq = 1
    tids = np.array([a._term_to_id["x"], a._term_to_id["y"],
                     a._term_to_id["z"]])
    pos = np.array([0, 1, 2])
    assert a.count_matches(tids, pos) == 1
    # x z / y z overlapping at same positions via same-pos multi-terms:
    # x@0 y@0 z@1 — both paths alive at pos1, both step to s3 → freq 2
    tids2 = np.array([a._term_to_id["x"], a._term_to_id["y"],
                      a._term_to_id["z"]])
    pos2 = np.array([0, 0, 1])
    assert a.count_matches(tids2, pos2) == 2


def test_token_stream_to_automaton():
    """TokenStreamToTermAutomatonQuery.toQuery pins: '*' becomes ANY,
    holes are rejected, the built automaton matches like a hand-built
    one."""
    from lucene_solr_spark.search.automaton import token_stream_to_automaton
    a = token_stream_to_automaton(
        [("merge", 1, 1), ("*", 1, 1), ("table", 1, 1)])
    # merge X table (exactly one position between) matches
    tm, ta = a._term_to_id["merge"], a._term_to_id["table"]
    assert a.count_matches(np.array([tm, ta]), np.array([0, 2])) == 1
    assert a.count_matches(np.array([tm, ta]), np.array([0, 1])) == 0
    assert a.count_matches(np.array([tm, ta]), np.array([0, 3])) == 0
    with pytest.raises(ValueError, match="cannot handle holes"):
        token_stream_to_automaton([("a", 1, 1), ("b", 2, 1)])
    # stacked synonym (posInc 0) + posLength 2: wifi spans wi+fi
    b = token_stream_to_automaton(
        [("wi", 1, 1), ("wifi", 0, 2), ("fi", 1, 1), ("network", 1, 1)])
    ids = b._term_to_id
    assert b.count_matches(
        np.array([ids["wi"], ids["fi"], ids["network"]]),
        np.array([0, 1, 2])) == 1
    assert b.count_matches(
        np.array([ids["wifi"], ids["network"]]), np.array([0, 1])) == 1


def test_graph_automaton_end_to_end(spark):
    """posLength-aware synonym matching: query 'wifi network' finds
    docs tokenized either 'wifi network' or 'wi fi network'."""
    from lucene_solr_spark.analysis.analyzer import StandardAnalyzer
    from lucene_solr_spark.index import IndexBuilder
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.search.automaton import (graph_automaton,
                                                    term_automaton_topk)
    from lucene_solr_spark.search.syngraph import SynonymGraph, SynonymRule
    an = StandardAnalyzer()
    docs = spark.createDataFrame(
        [(0, "the wifi network is up"),
         (1, "a wi fi network outage"),
         (2, "wired network only"),
         (3, "wifi sticker on the router")],
        "doc_id long, text string")
    idx = IndexBuilder(an, grid=8, with_positions=True).build(spark, docs)
    s = Searcher(spark, idx)
    g = SynonymGraph([SynonymRule(("wifi",), ("wi", "fi"))])
    auto = graph_automaton(g, ["wifi", "network"])
    got = term_automaton_topk(s, auto, k=10).toPandas()
    assert sorted(got["doc_id"].astype(int)) == [0, 1]

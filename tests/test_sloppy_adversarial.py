"""Adversarial sloppy-phrase cases: repeated phrase terms and
out-of-order matches — the shapes where our exactly-specified matcher
and Lucene's SloppyPhraseMatcher.java:56 can diverge (VERDICT r2 #6).

THE SPEC (search/executor.py _eval_phrase, shared with the pyoracle):
for every occurrence p0 of the FIRST phrase term, the occurrence
matches iff Σ_i min_p |p − (p0 + i)| ≤ slop over the later terms i,
contributing sloppyWeight = 1/(1 + Σ) to the phrase freq.

Documented divergences from Lucene (pinned here, not hidden):

1. REPEATED PHRASE TERMS — one token occurrence may serve several
   phrase slots. `"a b a"~2` matches the two-token doc "a b" under our
   spec (the single 'a' serves slots 0 and 2; displacement 0 + 2 = 2),
   while Lucene's matcher requires repeated phrase terms to bind to
   DISTINCT positions (SloppyPhraseMatcher's repeats machinery) and
   does not match.
2. ANCHORING — our Σ counts each later term's distance to its expected
   offset from the FIRST term's anchor; Lucene's matchLength comes from
   the minimal-window simulation. For transposed two-term phrases the
   two definitions coincide (`"a b"~2` on "b a": both give
   matchLength 2, weight 1/3); for longer out-of-order phrases the
   window value can differ from the displacement sum.

Engine and pyoracle must agree bit-for-bit on ALL of these — the spec
is self-consistent even where it departs from Lucene.
"""

import numpy as np
import pytest

from lucene_solr_spark.analysis.analyzer import StandardAnalyzer
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import PhraseQuery

ANN = StandardAnalyzer(stop_words=frozenset())   # keep every token

DOCS = [
    (0, "aa bb aa"),          # exact "aa bb aa"
    (1, "aa bb"),             # repeated-term divergence case
    (2, "bb aa"),             # transposed
    (3, "aa cc bb"),          # one-gap
    (4, "aa bb cc aa bb"),    # multiple anchors
    (5, "cc cc cc"),          # no match
    (6, "aa aa bb"),          # doubled first term
    (7, "bb aa bb aa"),       # interleaved
]

CASES = [
    PhraseQuery(("aa", "bb"), slop=0),
    PhraseQuery(("aa", "bb"), slop=1),
    PhraseQuery(("aa", "bb"), slop=2),      # matches transposed "bb aa"
    PhraseQuery(("aa", "bb", "aa"), slop=0),
    PhraseQuery(("aa", "bb", "aa"), slop=2),  # repeated-term adversary
    PhraseQuery(("aa", "cc", "bb"), slop=2),
    PhraseQuery(("bb", "aa"), slop=2),
]


@pytest.fixture(scope="module")
def built(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    oracle = OracleIndex(ANN)
    for d, t in DOCS:
        oracle.add(d, t)
    idx = IndexBuilder(ANN, grid=4, with_positions=True).build(spark, docs)
    idx.postings = idx.postings.cache()
    return Searcher(spark, idx), oracle


def test_adversarial_engine_equals_oracle(built):
    searcher, oracle = built
    for q in CASES:
        got = searcher.top_k(q, k=10)
        exp = oracle.search_ast(q, k=10)
        assert got["doc_id"].astype(int).tolist() == [d for d, _ in exp], q
        np.testing.assert_array_equal(
            got["score"].to_numpy().astype(np.float32),
            np.array([s for _, s in exp], dtype=np.float32),
            err_msg=str(q))


def test_documented_divergence_pinned(built):
    """Pin divergence #1 exactly: under OUR spec `"aa bb aa"~2` DOES
    match doc 1 ("aa bb") — the single 'aa' serves phrase slots 0 and 2
    with total displacement 2. Lucene's repeats machinery would reject
    it. If this assertion ever flips, the spec changed: update the
    module docstring and the SURVEY §2 sloppy-phrase row."""
    searcher, _ = built
    got = searcher.top_k(PhraseQuery(("aa", "bb", "aa"), slop=2), k=10)
    assert 1 in got["doc_id"].astype(int).tolist()


def test_transposition_agrees_with_lucene(built):
    """Divergence #2 boundary: two-term transposition is NOT a
    divergence — "bb aa" matches `"aa bb"~2` with weight 1/(1+2),
    exactly Lucene's matchLength-2 sloppyWeight."""
    searcher, _ = built
    got = searcher.top_k(PhraseQuery(("aa", "bb"), slop=2), k=10)
    assert 2 in got["doc_id"].astype(int).tolist()
    got1 = searcher.top_k(PhraseQuery(("aa", "bb"), slop=1), k=10)
    assert 2 not in got1["doc_id"].astype(int).tolist()

"""Vectorized OSA refine (VERDICT r4 #3): the numpy batch DP must be
bit-identical to the scalar reference osa_distance on every input —
the same differential protocol as tests/test_routing.py
(scalar ≡ vectorized murmur3). Pure numpy; no Spark session."""

import random
import string

import numpy as np
import pytest

from lucene_solr_spark.search.multiterm import (osa_distance,
                                                osa_distance_batch)


def _rand_words(rng, n, alpha, lmin=0, lmax=14):
    return [
        "".join(rng.choice(alpha)
                for _ in range(rng.randint(lmin, lmax)))
        for _ in range(n)
    ]


def test_batch_matches_scalar_random():
    rng = random.Random(0xFA22)
    # small alphabet maximizes transposition collisions
    for alpha in ("ab", "abc", string.ascii_lowercase):
        for _ in range(8):
            term = "".join(rng.choice(alpha)
                           for _ in range(rng.randint(1, 10)))
            cands = _rand_words(rng, 200, alpha)
            got = osa_distance_batch(term, cands)
            want = np.array([osa_distance(term, c) for c in cands])
            assert np.array_equal(got, want), (term, alpha)


def test_batch_pinned_corners():
    # the OSA-vs-Damerau corner: transposed pair cannot be re-edited
    assert osa_distance("ca", "abc") == 3
    got = osa_distance_batch("ca", ["abc", "ca", "ac", "", "c", "cab"])
    assert got.tolist() == [3, 0, 1, 2, 1, 1]


def test_batch_empty_and_unicode():
    assert osa_distance_batch("abc", []).tolist() == []
    assert osa_distance_batch("abc", ["", ""]).tolist() == [3, 3]
    cands = ["café", "cafe", "céfa", "€é"]
    want = [osa_distance("café", c) for c in cands]
    assert osa_distance_batch("café", cands).tolist() == want


def test_no_per_row_lambda_left_under_search():
    import glob
    import os
    pkg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "lucene_solr_spark", "search")
    offenders = [p for p in glob.glob(os.path.join(pkg, "*.py"))
                 if ".map(lambda" in open(p).read()]
    assert not offenders, offenders


def test_fuzzy_terms_expansion_identical(spark):
    """End-to-end: fuzzy_terms through the batched Arrow UDF returns
    exactly the expansion a scalar re-derivation over the collected
    dictionary produces."""
    from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
    from lucene_solr_spark.index import IndexBuilder
    from lucene_solr_spark.search import multiterm as mt

    rng = random.Random(7)
    words = sorted({"".join(rng.choice("abcd")
                            for _ in range(rng.randint(2, 6)))
                    for _ in range(300)})
    docs = spark.createDataFrame(
        [(i, " ".join(words[i::17])) for i in range(17)],
        "doc_id long, text string")
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=16).build(spark, docs).cache()
    dictionary = [r["term"] for r in
                  idx.terms.filter("field = 'text'").collect()]
    for probe in ("abcd", "badc", "ca", "dcba"):
        got = mt.fuzzy_terms(idx.terms, probe, max_edits=2)
        want = sorted(t for t in dictionary
                      if osa_distance(probe, t) <= 2)
        assert got == want, probe
    idx.release()

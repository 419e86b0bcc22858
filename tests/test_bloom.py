"""Bloom term-dictionary sidecar (BloomFilteringPostingsFormat analog).

Pins the three contracts of `lucene/codecs/.../bloom/FuzzySet.java`:
no false negatives ever (mayContainValue), bounded false positives at the
sized saturation, and downsize-by-folding preserving membership — plus the
Spark↔driver hash agreement the md5-slice scheme exists for, and the
query-equivalence that makes bloom pruning semantics-free.
"""

import numpy as np
import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.index.bloom import (
    TermBloom, build_term_bloom, bloom_prune, _positions_py)
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.search.executor import Searcher
from lucene_solr_spark.search.ast import (
    BooleanQuery, Clause, Occur, TermQuery)

DOCS = [
    (0, "spark merges sorted posting lists into compressed blocks"),
    (1, "bloom filters answer absent term seeks without any scan"),
    (2, "the dictionary table is pruned by pushed predicates"),
    (3, "query terms missing from the corpus never launch a job"),
    (4, "posting blocks carry impacts for block max pruning"),
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return IndexBuilder().build(spark, df)


@pytest.fixture(scope="module")
def bloom(idx):
    return build_term_bloom(idx.terms, field="text")


def _dict_terms(idx):
    return [r.term for r in
            idx.terms.filter(F.col("field") == "text")
            .select("term").distinct().collect()]


def test_no_false_negatives(idx, bloom):
    terms = _dict_terms(idx)
    assert terms, "empty dictionary"
    missing = [t for t in terms if not bloom.may_contain(t)]
    assert not missing, f"false negatives: {missing}"


def test_absent_terms_mostly_rejected(idx):
    # sized bloom (10 bits/term, k=2) → expected fpr ≈ 3%; use a fixed
    # probe set so the test is deterministic
    bloom = build_term_bloom(idx.terms, field="text", downsize=False)
    present = set(_dict_terms(idx))
    probes = [f"zz{i}absent" for i in range(500) if f"zz{i}absent" not in present]
    fp = sum(1 for t in probes if bloom.may_contain(t))
    assert fp / len(probes) < 0.10, f"fpr {fp / len(probes):.3f}"


def test_spark_and_driver_positions_agree(spark, bloom):
    """The JVM codegen positions (F.md5 slices) must equal the driver's
    hashlib positions — otherwise false negatives appear silently."""
    from lucene_solr_spark.index.bloom import _positions_col
    words = ["spark", "bloom", "dictionary", "Ünïcode-ś", "a", "zz9"]
    df = spark.createDataFrame([(w,) for w in words], ["term"])
    got = {r.term: list(r.p) for r in df.select(
        "term", _positions_col(F.col("term"), bloom.num_bits,
                               bloom.num_hashes).alias("p")).collect()}
    for w in words:
        assert got[w] == _positions_py(w, bloom.num_bits, bloom.num_hashes), w


def test_downsize_preserves_membership(idx):
    big = build_term_bloom(idx.terms, field="text",
                           num_bits=1 << 16, downsize=False)
    small = big.downsize(max_saturation=0.2)
    assert small.num_bits < big.num_bits
    for t in _dict_terms(idx):
        assert small.may_contain(t), f"downsize lost {t}"


def test_roundtrip_bytes(bloom):
    back = TermBloom.from_bytes(bloom.to_bytes())
    assert back.num_bits == bloom.num_bits
    assert back.num_hashes == bloom.num_hashes
    assert back.field == bloom.field
    assert np.array_equal(back.bits, bloom.bits)
    assert back.may_contain("spark") == bloom.may_contain("spark")


def test_bloom_prune_query_equivalence(spark, idx, bloom):
    """Pruning proven-absent clauses never changes scores — the property
    that lets q_bloom_or_topk share the plain multi-term oracle."""
    terms = ["posting", "bloom", "qqqabsentterm", "zzznothere"]
    keep, drop = bloom_prune(bloom, terms)
    assert "qqqabsentterm" in drop and "zzznothere" in drop
    assert "posting" in keep and "bloom" in keep
    s = Searcher(spark, idx)
    full = BooleanQuery(tuple(Clause(Occur.SHOULD, TermQuery(t))
                              for t in terms))
    pruned = BooleanQuery(tuple(Clause(Occur.SHOULD, TermQuery(t))
                                for t in keep))
    a = s.top_k(full, k=5)[["doc_id", "score"]].to_records(index=False)
    b = s.top_k(pruned, k=5)[["doc_id", "score"]].to_records(index=False)
    assert list(map(tuple, a)) == list(map(tuple, b))


def test_absent_probe_batch_mostly_pruned(bloom):
    # the bloom is deterministic (md5 positions), so this count is stable;
    # at the downsized saturation (≤~0.2 after one fold, k=2) the fpr is
    # a few percent — 20 probes must overwhelmingly prune
    probes = [f"qx{i}nothere" for i in range(20)]
    keep, drop = bloom_prune(bloom, probes)
    assert len(drop) >= 17, f"only pruned {len(drop)}/20: kept {keep}"

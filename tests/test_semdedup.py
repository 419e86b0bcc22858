"""SemDeDup (Abbas et al. 2023) — pipeline/similarity.semdedup.

Planted-cluster fixture: three orthogonal "topics"; topic A holds a
near-duplicate pair plus a distinct-enough third doc, topic B holds a
triple. Pins the keep rule (lowest centroid-cosine survives, ties to
the lower id), singleton behavior, and the within-cell containment
(pairs never cross clusters even when cross-cluster cosine exceeds the
threshold by construction of a shared component dimension).
"""

import math

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.pipeline import similarity as sim

DIM = 8


def _vec(*pairs):
    v = [0.0] * DIM
    for i, x in pairs:
        v[i] = x
    return v


# vec_id 1..3 are the centroid seeds (semdedup's deterministic seed rule
# takes the lowest ids): axis-0, axis-1, axis-2 topics.
ROWS = [
    (1, _vec((0, 1.0))),                       # seed / topic A anchor
    (2, _vec((1, 1.0))),                       # seed / topic B anchor
    (3, _vec((2, 1.0))),                       # seed / topic C anchor
    # topic A: 10 and 11 are near-dups (cos ≈ 0.995); 12 is far (cos < 0.7)
    (10, _vec((0, 1.0), (3, 0.10))),
    (11, _vec((0, 1.0), (3, 0.02))),
    (12, _vec((0, 1.0), (4, 1.05))),
    # topic B: triple of near-dups
    (20, _vec((1, 1.0), (5, 0.05))),
    (21, _vec((1, 1.0), (5, 0.08))),
    (22, _vec((1, 1.0), (5, 0.02))),
    # topic C: singleton
    (30, _vec((2, 1.0), (6, 0.3))),
]


@pytest.fixture(scope="module")
def out(spark):
    emb = spark.createDataFrame(ROWS, ["vec_id", "embedding"])
    res = sim.semdedup(emb, threshold=0.9, n_cells=3).cache()
    return {r.vec_id: r for r in res.collect()}


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    return num / (math.sqrt(sum(x * x for x in a))
                  * math.sqrt(sum(x * x for x in b)))


def test_every_vector_labeled(out):
    assert set(out) == {r[0] for r in ROWS}


def test_near_dup_pair_keeps_lowest_centroid_cos(out):
    # centroid of topic A is vec 1 = pure axis-0; doc 10 (bigger
    # off-axis component) has LOWER cosine to it than doc 11 → 10 kept
    a10 = _cos(_vec((0, 1.0), (3, 0.10)), _vec((0, 1.0)))
    a11 = _cos(_vec((0, 1.0), (3, 0.02)), _vec((0, 1.0)))
    assert a10 < a11
    assert out[10].keep and out[10].canonical_id == 10
    assert not out[11].keep and out[11].canonical_id == 10


def test_triple_collapses_to_one(out):
    group = [out[20], out[21], out[22]]
    kept = [r for r in group if r.keep]
    assert len(kept) == 1
    # 21 has the largest off-axis part → lowest centroid cosine → rep
    assert kept[0].vec_id == 21
    assert all(r.canonical_id == 21 for r in group)


def test_far_member_and_singleton_survive(out):
    assert out[12].keep and out[12].canonical_id == 12
    assert out[30].keep and out[30].canonical_id == 30


def test_seeds_absorbed_into_groups(out):
    # each seed IS its cluster's centroid (ccos = 1.0, the maximum) and
    # sits within 0.9 cosine of its topic's members, so it joins the dup
    # group and — having the HIGHEST centroid cosine — is never the rep:
    # the paper's diversity rule drops the most-central member first
    assert not out[1].keep and out[1].canonical_id == 10
    assert not out[2].keep and out[2].canonical_id == 21
    assert not out[3].keep and out[3].canonical_id == 30


def test_cells_partition_topics(out):
    cells = {vid: out[vid].cell for vid in out}
    assert cells[10] == cells[11] == cells[12] == cells[1]
    assert cells[20] == cells[21] == cells[22] == cells[2]
    assert cells[30] == cells[3]
    assert len({cells[1], cells[2], cells[3]}) == 3


def test_drop_rate_matches_components(spark):
    emb = spark.createDataFrame(ROWS, ["vec_id", "embedding"])
    res = sim.semdedup(emb, threshold=0.9, n_cells=3)
    # groups: {1,10,11}→10, {2,20,21,22}→21, {3,30}→30; 12 singleton
    assert res.filter("NOT keep").count() == 6
    assert {r.vec_id for r in res.filter("keep").collect()} == {10, 12, 21, 30}

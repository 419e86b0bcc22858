"""ShortestPathStream analog — all shortest paths via frontier BFS.

Reference semantics: `solrj/io/graph/ShortestPathStream.java` (BFS
with a per-level parents map, all shortest paths emitted as tuples).
"""

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.search.graph import shortest_path


@pytest.fixture(scope="module")
def edges(spark):
    # diamond a→{b,c}→d→e, plus a shortcut a→x→e (same length as via
    # the diamond arms? no: a-b-d-e is 3 hops, a-x-e is 2), an island,
    # and a cycle f→g→f that BFS must not loop on
    e = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
         ("a", "x"), ("x", "e"),
         ("f", "g"), ("g", "f"),
         ("island1", "island2")]
    return spark.createDataFrame(e, "src string, dst string").cache()


def _paths(df):
    return sorted(r["path"] for r in df.collect())


def test_single_shortest_beats_longer(spark, edges):
    # a→e: shortest is a->x->e (2 hops); the 3-hop diamond routes lose
    assert _paths(shortest_path(edges, "src", "dst", "a", "e")) == \
        ["a->x->e"]


def test_all_shortest_paths_of_equal_length(spark, edges):
    # a→d: two equal 2-hop paths through b and c
    assert _paths(shortest_path(edges, "src", "dst", "a", "d")) == \
        ["a->b->d", "a->c->d"]


def test_unreachable_and_depth_cutoff(spark, edges):
    assert _paths(shortest_path(edges, "src", "dst", "a", "island2")) == []
    # reachable in 2 but max_depth=1 cuts it off
    assert _paths(shortest_path(edges, "src", "dst", "a", "d",
                                max_depth=1)) == []


def test_cycle_terminates(spark, edges):
    # f→g exists; g→f loops back — BFS must terminate and find f->g
    assert _paths(shortest_path(edges, "src", "dst", "f", "g")) == ["f->g"]
    assert _paths(shortest_path(edges, "src", "dst", "f", "e",
                                max_depth=4)) == []


def test_synthetic_functional_graph(spark):
    """The gated query's graph: doc_id → (2i+1)%N and (3i+7)%N over
    N=1000 nodes — 1 ⇝ 777 has exactly two shortest paths of 8 hops
    (verified against a pure-Python BFS)."""
    n = 1000
    nodes = spark.range(n).select(F.col("id").alias("i"))
    e = (nodes.select(F.col("i").alias("src"),
                      ((F.col("i") * 2 + 1) % n).alias("dst"))
         .unionByName(
             nodes.select(F.col("i").alias("src"),
                          ((F.col("i") * 3 + 7) % n).alias("dst"))))
    got = _paths(shortest_path(e, "src", "dst", 1, 777, max_depth=8))
    assert len(got) == 2
    for p in got:
        hops = p.split("->")
        assert hops[0] == "1" and hops[-1] == "777" and len(hops) == 9
        for u, v in zip(hops, hops[1:]):
            assert int(v) in ((int(u) * 2 + 1) % n, (int(u) * 3 + 7) % n)

"""Graph traversal — Solr's gatherNodes/nodes streaming expression.

Reference (semantics only): `solr/solrj/src/java/org/apache/solr/client/
solrj/io/graph/GatherNodesStream.java` and `ShortestPathStream.java` —
breadth-first expansion over an edge relation declared as
``walk="fromField->toField"``: each level's frontier is the DISTINCT
set of ``to`` values reachable from the previous frontier, and with
``trackTraversal=true`` a node visited at an earlier level is never
re-emitted or re-expanded (the reference keeps a per-level HashMap and
checks prior levels). ``scatter="branches|leaves"`` controls whether
interior levels or only the final level are returned.

Spark shape: one hop = one equi-join of the edge table against the
current frontier + ``distinct()`` — the frontier is typically tiny
relative to the edges, so Catalyst broadcasts it and the hop costs one
shuffle-free pass over (a partition-pruned subset of) the edges plus a
distinct on the new frontier, which is bounded by the node universe,
not the edge count. The visited set stays a DataFrame (never
collected); at web scale it is the same shape as the dedup tombstone
feedback (`pipeline/dedup.py`). Levels are bounded and explicit — the
reference likewise builds one GatherNodesStream per hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def gather_nodes(frontier: DataFrame, walks: list,
                 track_traversal: bool = True,
                 scatter: str = "leaves") -> DataFrame:
    """Multi-hop gatherNodes → (node string, level int).

    ``frontier`` — one-column DataFrame of root node ids (level 0).
    ``walks`` — one (edges DataFrame, from_col, to_col) triple per hop,
    applied in order (the reference nests one nodes() call per hop).
    ``scatter`` — 'leaves' (default, GatherNodesStream's default
    Scatter.LEAVES: only the final level), 'branches' (all interior
    levels incl. the roots), or 'both'.
    """
    root_col = frontier.columns[0]
    level = (frontier.select(F.col(root_col).cast("string").alias("node"))
             .distinct())
    visited = level
    levels = [level.withColumn("level", F.lit(0))]
    for i, (edges, from_col, to_col) in enumerate(walks, start=1):
        hop = (edges
               .join(level.select(F.col("node").alias("_f")),
                     F.col(from_col).cast("string") == F.col("_f"),
                     "left_semi")
               .select(F.col(to_col).cast("string").alias("node"))
               .distinct())
        if track_traversal:
            hop = hop.join(visited, "node", "left_anti")
            visited = visited.unionByName(hop)
        level = hop
        levels.append(level.withColumn("level", F.lit(i)))
    if scatter == "leaves":
        keep = levels[-1:]
    elif scatter == "branches":
        keep = levels[:-1]
    elif scatter == "both":
        keep = levels
    else:
        raise ValueError("scatter must be leaves|branches|both")
    out = keep[0]
    for df in keep[1:]:
        out = out.unionByName(df)
    return out


def shortest_path(edges: DataFrame, from_col: str, to_col: str,
                  src, dst, max_depth: int = 6) -> DataFrame:
    """ShortestPathStream (`solrj/io/graph/ShortestPathStream.java`):
    ALL shortest paths from ``src`` to ``dst`` over the edge relation,
    each returned as one row ``path`` = "src->...->dst" (string ids,
    '->'-joined like the reference's path tuples), empty when ``dst``
    is unreachable within ``max_depth`` hops.

    Same two-phase shape as the reference: a forward BFS that keeps a
    PARENTS table (child, parent) holding every min-level predecessor
    (the reference's per-level HashMap), then a backward reconstruction
    of length L.  Spark posture: each hop is one equi-join of the edge
    table against the (small, broadcastable) frontier + an anti-join
    against the visited set — the same frontier-join plan as
    :func:`gather_nodes`, with ``localCheckpoint`` cutting the lineage
    per level exactly like the connected-components loop in
    `pipeline/dedup.py`.  The only driver-side values are the per-level
    found/size counters; nodes, parents, and paths stay DataFrames.
    The reconstruction does L bounded joins over the parents table
    (≤ |shortest paths| · L rows in flight — the reference likewise
    materializes the full path set to emit its tuples).
    """
    src_s, dst_s = str(src), str(dst)
    e = edges.select(F.col(from_col).cast("string").alias("_p"),
                     F.col(to_col).cast("string").alias("_c")).distinct()
    frontier = e.sparkSession.createDataFrame([(src_s,)], "node string")
    visited = frontier
    parents = None
    depth = 0
    for depth in range(1, max_depth + 1):
        hop = (e.join(frontier.select(F.col("node").alias("_p")), "_p")
               .select(F.col("_c").alias("child"),
                       F.col("_p").alias("parent"))
               .join(visited.select(F.col("node").alias("child")),
                     "child", "left_anti")
               .distinct().localCheckpoint())
        newf = hop.select(F.col("child").alias("node")).distinct()
        if newf.isEmpty():
            return frontier.sparkSession.createDataFrame(
                [], "path string")
        parents = hop if parents is None else parents.unionByName(hop)
        visited = visited.unionByName(newf).localCheckpoint()
        frontier = newf
        if not newf.filter(F.col("node") == dst_s).isEmpty():
            break
    else:
        return frontier.sparkSession.createDataFrame([], "path string")
    # backward reconstruction: L joins, paths carried as arrays
    paths = (frontier.sparkSession.createDataFrame([(dst_s,)], "head string")
             .select("head", F.array(F.col("head")).alias("trail")))
    for _ in range(depth):
        paths = (paths.join(parents,
                            paths["head"] == parents["child"])
                 .select(F.col("parent").alias("head"),
                         F.concat(F.array(F.col("parent")),
                                  F.col("trail")).alias("trail")))
    return (paths.filter(F.col("head") == src_s)
            .select(F.array_join("trail", "->").alias("path"))
            .distinct())

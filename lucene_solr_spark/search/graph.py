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

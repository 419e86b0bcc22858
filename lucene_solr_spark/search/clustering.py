"""Search-results clustering — the Solr ClusteringComponent
(`solr/contrib/clustering/src/java/org/apache/solr/handler/clustering/
ClusteringComponent.java:72`, carrot2 engine).

The reference clusters the RESULT PAGE: the component receives the top-k
documents already retrieved by the query and runs the clustering
algorithm inside the Solr node on those k rows. The Spark shape is the
same split: top-k retrieval is the distributed part (per-partition
heaps, driver merge of ≤ partitions×k rows — the existing search path),
and clustering the k returned docs is bounded driver work, exactly like
the reference. The `.collect()` here is of the result page (k rows),
not the corpus — the same rows any caller of top-k materializes.

Algorithm: deterministic spherical k-means over L2-normalized TF-IDF of
the page docs (carrot2's Lingo/STC are also TF-IDF-space algorithms;
k-means is the documented "kmeans" carrot2 engine choice). Everything
is seeded by rank order — centroid init = the n_clusters highest-ranked
docs, fixed iteration count, index tie-breaks — so output is stable
across runs and parallelism levels. Cluster labels = the top centroid
terms, the carrot2 label analog.
"""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN = re.compile(r"[a-z0-9]+")

_OUT_SCHEMA = T.StructType([
    T.StructField("cluster_id", T.IntegerType()),
    T.StructField("label", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("score", T.DoubleType()),
])


def _tfidf(texts: list[str]):
    """Row-normalized TF-IDF over the page's own vocabulary (carrot2
    also builds its model from the page, not the corpus)."""
    toks = [_TOKEN.findall(t.lower()) for t in texts]
    vocab = sorted({w for ts in toks for w in ts})
    vidx = {w: i for i, w in enumerate(vocab)}
    m = np.zeros((len(texts), len(vocab)))
    for r, ts in enumerate(toks):
        for w in ts:
            m[r, vidx[w]] += 1.0
    df = (m > 0).sum(axis=0)
    idf = np.log(1.0 + len(texts) / np.maximum(df, 1))
    m *= idf
    norms = np.linalg.norm(m, axis=1)
    m /= np.maximum(norms, 1e-12)[:, None]
    return m, vocab


def cluster_top_docs(searcher, query, docs: DataFrame, *, k: int = 50,
                     n_clusters: int = 4, iters: int = 10,
                     text_col: str = "text",
                     label_terms: int = 3) -> DataFrame:
    """Cluster the top-k result page of ``query``.

    → (cluster_id, label, doc_id, score), ordered by (cluster_id,
    score desc, doc_id). cluster_ids are renumbered by best-ranked
    member so the numbering is rank-stable, and the label is the
    centroid's top `label_terms` terms joined with '+'.
    """
    page = (searcher.score_all(query, mode="f64")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
            .join(docs.select("doc_id", text_col), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .collect())
    spark = docs.sparkSession
    if not page:
        return spark.createDataFrame([], _OUT_SCHEMA)
    texts = [r[text_col] for r in page]
    mat, vocab = _tfidf(texts)
    nc = min(n_clusters, len(page))
    centroids = mat[:nc].copy()
    assign = np.zeros(len(page), dtype=int)
    for _ in range(iters):
        sims = mat @ centroids.T
        # argmax with lowest-cluster-id tie-break (np.argmax is already
        # first-max, which is the lowest index)
        assign = np.argmax(sims, axis=1)
        for c in range(nc):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    centroids[c] = v / n
    # renumber clusters by their best-ranked member (page is rank-sorted)
    order: dict[int, int] = {}
    for a in assign:
        if int(a) not in order:
            order[int(a)] = len(order)
    labels = {}
    for c in range(nc):
        top = np.argsort(-centroids[c])[:label_terms]
        labels[c] = "+".join(vocab[i] for i in top if centroids[c][i] > 0)
    rows = [(order[int(a)], labels[int(a)], int(r["doc_id"]),
             float(round(r["score"], 4)))
            for a, r in zip(assign, page)]
    rows.sort(key=lambda t: (t[0], -t[3], t[2]))
    return spark.createDataFrame(rows, _OUT_SCHEMA)

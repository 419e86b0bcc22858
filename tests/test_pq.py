"""Product-quantization ANN (Jégou et al. 2011) — pipeline/similarity.py.

Pins: (1) the Spark mapInPandas encoder against a straight-line numpy
restatement (code agreement is what the SQL oracle's argmin relies on),
(2) recall of the two-stage ADC scan vs the exhaustive brute-force scan,
(3) exact top-k identity at the fine split on this corpus, (4) the
codebook's deterministic seed rule.
"""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.pipeline import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return list(emb.filter("vec_id = 0").select("embedding").collect()[0][0])


def _np_encode(X, cb, m):
    """Reference encoder: per-subspace argmin of -2 x·c + |c|² (first
    minimum wins, same as numpy argmin in the Spark kernel)."""
    n, dim = X.shape
    sub = dim // m
    codes = np.empty((n, m), dtype=np.int64)
    for j in range(m):
        xj = X[:, j * sub:(j + 1) * sub]
        cj = cb[:, j * sub:(j + 1) * sub]
        d = -2.0 * xj @ cj.T + (cj * cj).sum(axis=1)[None, :]
        codes[:, j] = d.argmin(axis=1)
    return codes


def test_train_is_seed_rule(emb):
    cb = sim.pq_train(emb, n_centroids=16)
    seeds = {r.vec_id: list(r.embedding) for r in
             emb.filter("vec_id BETWEEN 1 AND 16").collect()}
    assert cb.shape == (16, 64)
    for i in range(16):
        assert np.allclose(cb[i], np.array(seeds[i + 1], dtype=np.float64))


def test_encode_matches_numpy(emb):
    cb = sim.pq_train(emb, n_centroids=16)
    for m in (4, 16):
        got = {r.vec_id: list(r.codes) for r in
               sim.pq_encode(emb, cb, m=m).collect()}
        rows = emb.select("vec_id", "embedding").collect()
        X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
        want = _np_encode(X, cb, m)
        for i, r in enumerate(rows):
            assert got[r.vec_id] == list(want[i]), (m, r.vec_id)


def test_codes_are_narrow(emb):
    cb = sim.pq_train(emb, n_centroids=16)
    codes = sim.pq_encode(emb, cb, m=16)
    mx = codes.select(F.max(F.array_max("codes"))).collect()[0][0]
    assert 0 <= mx <= 15          # uint8-representable centroid ids


def test_recall_vs_brute_force(emb, qvec):
    bf = {r[0] for r in sim.cosine_topk(emb, qvec, k=10)
          .select("vec_id").collect()}
    pq = {r.vec_id for r in
          sim.pq_topk(emb, qvec, k=10, m=16, candidates=100).collect()}
    assert len(pq & bf) >= 8, f"recall@10 {len(pq & bf)}/10"


def test_fine_split_exact_on_corpus(emb, qvec):
    """m=32 (2-dim subspaces) reproduces the exhaustive top-10 exactly
    on this corpus — the fidelity end of the compression/recall curve."""
    bf = [(r[0], round(r[1], 6)) for r in
          sim.cosine_topk(emb, qvec, k=10).select("vec_id", "cos").collect()]
    pq = [(r.vec_id, round(r.cos, 6)) for r in
          sim.pq_topk(emb, qvec, k=10, m=32, candidates=100).collect()]
    assert pq == bf


def test_rerank_scores_are_exact(emb, qvec):
    """Stage-2 scores are full-precision cosine, not the ADC estimate."""
    out = sim.pq_topk(emb, qvec, k=5, m=16, candidates=100).collect()
    vecs = {r.vec_id: np.array(list(r.embedding)) for r in
            emb.select("vec_id", "embedding").collect()}
    q = np.array(qvec, dtype=np.float64)
    for r in out:
        v = vecs[r.vec_id].astype(np.float64)
        want = float(v @ q / (math.sqrt(v @ v) * math.sqrt(q @ q)))
        assert abs(r.cos - want) < 1e-9


def test_dim_not_divisible_raises(emb):
    cb = sim.pq_train(emb, n_centroids=16)
    with pytest.raises(ValueError):
        sim.pq_encode(emb, cb, m=7)

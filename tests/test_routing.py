"""Document routing (Hash.java murmurhash3_x86_32, HashBasedRouter,
CompositeIdRouter) — public murmur3 test vectors, scalar≡vectorized
differential, composite co-location, Spark end-to-end."""

from __future__ import annotations

import random
import string

import numpy as np
import pytest

from lucene_solr_spark.index.routing import (composite_hash, hash_ranges,
                                             murmur3_32, murmur3_batch,
                                             route_docs, shard_of)


def test_murmur3_public_vectors():
    """Published MurmurHash3 x86_32 vectors (Appleby's smhasher)."""
    assert murmur3_32(b"", 0) == 0
    assert murmur3_32(b"", 1) == 0x514E28B7
    assert murmur3_32(b"hello", 0) == 0x248BFA47 - (1 << 32) * 0  # 613153351
    assert murmur3_32(b"hello, world", 0) == 345750399
    assert murmur3_32(b"The quick brown fox jumps over the lazy dog",
                      0) == 0x2E4FF723
    # signedness: values above 2^31 come back negative int32
    assert -(1 << 31) <= murmur3_32(b"abc") < (1 << 31)


def test_scalar_vs_vectorized_differential():
    rng = random.Random(7)
    ids = [""] + ["".join(rng.choices(string.ascii_letters + string.digits
                                      + "!_-é中", k=rng.randint(1, 40)))
                  for _ in range(500)]
    got = murmur3_batch(ids)
    exp = np.array([murmur3_32(s.encode("utf-8")) for s in ids],
                   dtype=np.int32)
    assert np.array_equal(got, exp)
    assert got.dtype == np.int32


def test_hash_ranges_partition_the_space():
    for n in (1, 2, 3, 7, 16):
        rs = hash_ranges(n)
        assert rs[0][0] == -(1 << 31) and rs[-1][1] == (1 << 31) - 1
        for (a, b), (c, d) in zip(rs, rs[1:]):
            assert c == b + 1 and a <= b
        # shard_of agrees with the range list
        for h in (-(1 << 31), -1, 0, 1, (1 << 31) - 1, 123456789):
            s = shard_of(h, n)
            lo, hi = rs[s]
            assert lo <= h <= hi
    with pytest.raises(ValueError):
        hash_ranges(0)


def test_composite_id_colocation():
    """CompositeIdRouter: same shardKey → same top 16 bits → same shard
    for any shard count ≤ 2^16; different doc ids still spread within
    the tenant's slice (bottom bits differ)."""
    hs = [composite_hash(f"tenantA!doc{i}") for i in range(50)]
    assert len({(h + (1 << 32)) % (1 << 32) >> 16 for h in hs}) == 1
    assert len({h & 0xFFFF for h in hs}) > 1
    for n in (2, 4, 16, 256):
        assert len({shard_of(h, n) for h in hs}) == 1
    # numBits syntax: /32 routes entirely by the key, /0 by the id
    assert composite_hash("t/32!x") == composite_hash("t/32!y")
    assert composite_hash("t/0!x") == composite_hash("u/0!x")
    # plain ids hash whole
    assert composite_hash("plain") == murmur3_32(b"plain")
    with pytest.raises(ValueError):
        composite_hash("t/40!x")


def test_distribution_roughly_uniform():
    ids = [f"doc-{i}" for i in range(20000)]
    hs = murmur3_batch(ids)
    shards = np.minimum((hs.astype(np.int64) + (1 << 31))
                        // ((1 << 32) // 8), 7)
    counts = np.bincount(shards, minlength=8)
    assert counts.min() > 0.8 * 20000 / 8 and counts.max() < 1.2 * 20000 / 8


def test_route_docs_spark(spark):
    rows = [(f"t{i % 3}!d{i}", i) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, v long")
    routed = route_docs(df, 4, composite=True).cache()
    got = routed.collect()
    assert len(got) == 300
    # shard column matches the scalar router exactly
    for r in got[:50]:
        assert r["shard"] == shard_of(composite_hash(r["doc_id"]), 4)
        assert r["_hash"] == composite_hash(r["doc_id"])
    # co-location: each tenant occupies exactly one shard
    tenants = {}
    for r in got:
        t = r["doc_id"].split("!")[0]
        tenants.setdefault(t, set()).add(r["shard"])
    assert all(len(s) == 1 for s in tenants.values())
    # rows of one shard live in one partition (clustered exchange)
    parts = (routed.select("shard")
             .withColumn("p", F_spark_partition_id())
             .groupBy("shard").agg(F_countDistinct("p").alias("np"))
             .collect())
    assert all(r["np"] == 1 for r in parts)
    routed.unpersist()


# late imports so the helper names read clean above
from pyspark.sql.functions import (countDistinct as F_countDistinct,  # noqa: E402,E501
                                   spark_partition_id as F_spark_partition_id)

"""Document routing — SolrCloud's hash-range sharding.

Reference semantics:

- `solr/solrj/src/java/org/apache/solr/common/util/Hash.java:209`
  murmurhash3_x86_32 (Austin Appleby's public-domain MurmurHash3,
  x86 32-bit variant) over the UTF-8 id bytes, seed 0 — the function
  every Solr DocRouter derives ranges from.
- `solr/solrj/src/java/org/apache/solr/common/cloud/HashBasedRouter.java:40`
  / `DocRouter.java`: the signed 32-bit hash space is split into N
  equal contiguous ranges, one per shard; a doc goes to the shard whose
  range contains its id hash.
- `solr/solrj/src/java/org/apache/solr/common/cloud/CompositeIdRouter.java:58`:
  ids of the form ``shardKey!docId`` take their TOP 16 bits from
  hash(shardKey) and the bottom 16 from hash(docId) — co-locating a
  tenant's docs in one slice of the ring while spreading within it;
  ``shardKey/numBits!docId`` tunes the split (numBits from the key,
  32−numBits from the id).

Spark shape / 100-TB posture: the scalar hash is the reference
implementation for pins; ``murmur3_batch`` is the scale path — a
numpy-vectorized block-mixer over a whole Arrow batch (rows advance
through the 4-byte blocks together under a length mask, the classic
SIMD formulation of Murmur3), exposed as ``route_docs`` →
mapInPandas + repartition(shard): one narrow projection and the one
unavoidable exchange on the shard key. Spark's own ``F.hash`` is also
Murmur3-x86-32 but with seed 42 and a byte-at-a-time tail, so it
cannot reproduce Solr ranges — hence this implementation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Scalar murmurhash3_x86_32 (Hash.java:209) → SIGNED int32, the
    value Solr compares against shard ranges."""
    h = seed & _M32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i:4 * i + 4], "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    k = 0
    tail = data[4 * nblocks:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def murmur3_batch(ids, seed: int = 0) -> np.ndarray:
    """Vectorized murmurhash3_x86_32 over a sequence of strings →
    int32 ndarray. All rows advance through the 4-byte blocks together
    under a per-row length mask (uint32 wraparound arithmetic — exact
    modular equivalence with the scalar loop)."""
    bs = [s.encode("utf-8") for s in ids]
    n = np.array([len(b) for b in bs], dtype=np.int64)
    if len(bs) == 0:
        return np.zeros(0, dtype=np.int32)
    width = int(((n.max() + 3) // 4) * 4) or 4
    buf = np.zeros((len(bs), width), dtype=np.uint8)
    for i, b in enumerate(bs):            # one memcpy per row
        buf[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    blocks = buf.view("<u4")              # (rows, width/4) little-endian
    h = np.full(len(bs), seed, dtype=np.uint32)
    c1 = np.uint32(_C1)
    c2 = np.uint32(_C2)
    with np.errstate(over="ignore"):
        nblocks = n // 4
        for j in range(blocks.shape[1]):
            live = nblocks > j
            if not live.any():
                break
            k = blocks[:, j] * c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k *= c2
            hj = h ^ k
            hj = (hj << np.uint32(13)) | (hj >> np.uint32(19))
            hj = hj * np.uint32(5) + np.uint32(0xE6546B64)
            h = np.where(live, hj, h)
        # tail: the last partial block, byte-masked per row
        rem = (n % 4).astype(np.int64)
        tail_start = (nblocks * 4).astype(np.int64)
        k = np.zeros(len(bs), dtype=np.uint32)
        rows = np.arange(len(bs))
        for byte_i in (2, 1, 0):
            sel = rem > byte_i
            if sel.any():
                idx = np.minimum(tail_start + byte_i, width - 1)
                vals = buf[rows, idx].astype(np.uint32) << np.uint32(
                    8 * byte_i)
                k = np.where(sel, k ^ vals, k)
        has_tail = rem > 0
        kt = k * c1
        kt = (kt << np.uint32(15)) | (kt >> np.uint32(17))
        kt *= c2
        h = np.where(has_tail, h ^ kt, h)
        h ^= n.astype(np.uint32)
        h ^= h >> np.uint32(16)
        h *= np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h *= np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h.astype(np.int32)


def composite_hash(doc_id: str) -> int:
    """CompositeIdRouter.sliceHash (CompositeIdRouter.java:58):
    ``shardKey!docId`` → top bits from the key's hash, bottom from the
    id's; ``shardKey/numBits!docId`` tunes the split; plain ids hash
    whole."""
    if "!" not in doc_id:
        return murmur3_32(doc_id.encode("utf-8"))
    key, rest = doc_id.split("!", 1)
    bits = 16
    if "/" in key:
        key, b = key.rsplit("/", 1)
        bits = int(b)
        if not (0 <= bits <= 32):
            raise ValueError(f"numBits out of range in {doc_id!r}")
    hk = murmur3_32(key.encode("utf-8")) & _M32
    hi = murmur3_32(rest.encode("utf-8")) & _M32
    if bits == 0:
        h = hi
    elif bits == 32:
        h = hk
    else:
        mask = (1 << (32 - bits)) - 1
        h = (hk & ~mask & _M32) | (hi & mask)
    return h - (1 << 32) if h >= (1 << 31) else h


def hash_ranges(n_shards: int) -> list[tuple[int, int]]:
    """DocRouter.partitionRange: the signed 32-bit space as n equal
    contiguous [min, max] ranges (DocRouter.java:horizontal split)."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    lo, hi = -(1 << 31), (1 << 31) - 1
    span = (1 << 32) // n_shards
    out = []
    start = lo
    for i in range(n_shards):
        end = hi if i == n_shards - 1 else start + span - 1
        out.append((start, end))
        start = end + 1
    return out


def shard_of(h: int, n_shards: int) -> int:
    """Range lookup (HashBasedRouter.hashToSlice)."""
    u = (h + (1 << 31)) & _M32
    s = min(u // ((1 << 32) // n_shards), n_shards - 1)
    return int(s)


def route_docs(docs: DataFrame, n_shards: int, id_col: str = "doc_id",
               composite: bool = False) -> DataFrame:
    """Attach the Solr shard assignment and cluster by it: the ingest
    placement step of a SolrCloud-style collection. One vectorized
    mapInPandas projection + the single shard exchange."""
    cols = list(docs.columns)

    def assign(batches):
        import pandas as pd
        for pdf in batches:
            ids = pdf[id_col].astype(str)
            if composite:
                hs = np.fromiter((composite_hash(s) for s in ids),
                                 dtype=np.int32, count=len(ids))
            else:
                hs = murmur3_batch(list(ids))
            u = hs.astype(np.int64) + (1 << 31)
            shard = np.minimum(u // ((1 << 32) // n_shards),
                               n_shards - 1).astype(np.int32)
            pdf = pdf.copy()
            pdf["_hash"] = hs
            pdf["shard"] = shard
            yield pdf

    from pyspark.sql.types import IntegerType, StructField, StructType
    schema = StructType(list(docs.schema.fields)
                        + [StructField("_hash", IntegerType()),
                           StructField("shard", IntegerType())])
    routed = docs.mapInPandas(assign, schema=schema)
    return routed.repartition(n_shards, F.col("shard")) \
                 .select(*cols, "_hash", "shard")

"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted through Arrow-batched pandas UDFs.

The sandbox has no image/audio libraries, so the *decode* step is a
clearly-marked stub: ``decode_image`` raises NotImplementedError unless
PIL is importable; ``extract_binary_meta`` runs a deterministic fake
decode (md5-derived dimensions) so the Spark-side plumbing — schema,
mapInPandas batching, partitioning — is real and testable end-to-end
(and oracle-checkable, since the fake rule is pure arithmetic on md5).

Scale notes: payloads stay opaque binary columns (Parquet keeps them
out of scans that don't reference them — column pruning); decode is a
narrow mapInPandas with Arrow transfer, batch-sized via
spark.sql.execution.arrow.maxRecordsPerBatch to bound executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

BIN_META_SCHEMA = ("doc_id long, n_bytes long, prefix_hex string, "
                   "fake_width long, fake_height long, fake_channels long")

IMAGE_FEAT_SCHEMA = ("doc_id long, width int, height int, channels int, "
                     "features array<float>")


def attach_binary(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, payload) — deterministic binary column (UTF-8 of text;
    stands in for the html:binary column of the input_hint schema)."""
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.encode(F.col(text_col), "UTF-8").alias("payload"))


def fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image-header parse: dimensions
    derived from md5 of the payload. Pure arithmetic → SQL-expressible."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    width = 16 + h % 1024
    height = 16 + (h // 1024) % 1024
    channels = 1 + h % 3
    return width, height, channels


def extract_binary_meta(binary_df: DataFrame) -> DataFrame:
    """mapInPandas over (doc_id, payload): byte length, 8-byte hex
    prefix, fake-decoded dimensions. Real Arrow plumbing, stubbed codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": payloads.map(len).astype("int64"),
                "prefix_hex": payloads.map(
                    lambda b: bytes(b)[:8].hex().upper()),
                "fake_width": pd.Series([d[0] for d in dims], dtype="int64"),
                "fake_height": pd.Series([d[1] for d in dims], dtype="int64"),
                "fake_channels": pd.Series([d[2] for d in dims], dtype="int64"),
            })

    return binary_df.mapInPandas(batches, schema=BIN_META_SCHEMA)


def decode_image(binary_df: DataFrame) -> DataFrame:
    """Real image decode + 8-bin intensity histogram features. Requires
    PIL (absent in this container) — the Spark plumbing is identical to
    extract_binary_meta; only the per-batch codec differs."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs PIL; container ships none — use "
            "extract_binary_meta for the plumbing-verified fake path"
        ) from e

    import io

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = Image.open(io.BytesIO(bytes(payload)))
                arr = np.asarray(img)
                hist = np.histogram(arr, bins=8, range=(0, 255))[0]
                rows.append((int(did), img.width, img.height,
                             len(img.getbands()),
                             (hist / max(1, arr.size)).astype("float32")
                             .tolist()))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height",
                                              "channels", "features"])

    return binary_df.mapInPandas(batches, schema=IMAGE_FEAT_SCHEMA)

"""Corpus invariants from BASELINE input_hint: per-url byte-identical
extracted text, parallelism-independent deterministic generation, and
url-order == docID-order."""

from __future__ import annotations

import pandas as pd

from lucene_solr_spark.corpus import extract_text_series, generate_pages


def test_extract_text_byte_identical(spark):
    pages = generate_pages(spark, 300, seed=42).toPandas()
    extracted = extract_text_series(pages["html"])
    for url, a, b in zip(pages["url"], extracted, pages["text"]):
        assert a.encode("utf-8") == b.encode("utf-8"), url


def test_generation_parallelism_independent(spark):
    a = generate_pages(spark, 200, seed=42, partitions=2).toPandas()
    b = generate_pages(spark, 200, seed=42, partitions=16).toPandas()
    a = a.sort_values("url").reset_index(drop=True)
    b = b.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_doc_id_derived_from_url(spark):
    """docIDs are a pure function of the url (never assigned by partition
    position) — the determinism contract behind resumable builds."""
    pages = generate_pages(spark, 200, seed=7).toPandas()
    for url, did in zip(pages["url"], pages["doc_id"]):
        assert int(url.rsplit("/", 1)[-1]) == did
    assert sorted(pages["doc_id"].tolist()) == list(range(200))


def test_different_seed_differs(spark):
    a = generate_pages(spark, 50, seed=1).toPandas().sort_values("url")
    b = generate_pages(spark, 50, seed=2).toPandas().sort_values("url")
    assert not a["text"].tolist() == b["text"].tolist()

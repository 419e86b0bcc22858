"""URL canonicalization + dedup (`pipeline/urldedup.py`): rule-by-rule
canonical-form pins (RFC 3986 §6 syntax normalization subset) and
keep-best group selection."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.pipeline.urldedup import (canonicalize_url,
                                                 url_dedup,
                                                 url_dedup_assign)

CASES = [
    # scheme+host case, www., default port, trailing slash, tracking
    # params dropped, params sorted, fragment stripped
    ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
     "https://example.com/a/b?a=1&b=2"),
    ("http://example.com:80//", "http://example.com/"),
    ("http://example.com", "http://example.com/"),
    # non-http scheme: port preserved, host still lowercased
    ("ftp://Host.COM:80/x", "ftp://host.com:80/x"),
    # anchored www-strip only removes a LEADING label
    ("https://sub.www.com/p", "https://sub.www.com/p"),
    # all-tracking query disappears entirely
    ("https://a.com/p?utm_a=1&gclid=z", "https://a.com/p"),
    ("https://a.com/p?fbclid=1&msclkid=2", "https://a.com/p"),
    # path case is preserved (only scheme/host lowercase)
    ("https://A.com/Docs/X", "https://a.com/Docs/X"),
    # :443 only stripped for https
    ("http://a.com:443/p", "http://a.com:443/p"),
]


def test_canonicalize_rules(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r["c"] for r in
           df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_canonicalize_is_pure_codegen(spark):
    """The canonical form must stay a single codegen projection — no
    Python UDF, no exchange."""
    df = spark.createDataFrame([("https://a.com/x?b=1&a=2",)], "url string")
    plan = (df.select(canonicalize_url(F.col("url")).alias("c"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


@pytest.fixture(scope="module")
def groups(spark):
    rows = [
        (1, "https://a.com/p?b=2&a=1", 100),
        (2, "HTTPS://WWW.A.com:443/p/?a=1&b=2&utm_x=9#f", 300),
        (3, "https://a.com/p?a=1&b=2", 300),   # ties doc 2 on quality
        (4, "https://b.com/q", 50),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, q long")


def test_keep_best_representative(groups):
    got = {r["canonical_url"]: (r["rep_id"], r["n_dups"])
           for r in url_dedup(groups, "url", "doc_id", "q").collect()}
    # docs 1-3 share a canonical URL; best quality 300 tie -> doc 2
    assert got["https://a.com/p?a=1&b=2"] == (2, 3)
    assert got["https://b.com/q"] == (4, 1)


def test_keep_first_without_quality(groups):
    got = {r["canonical_url"]: r["rep_id"]
           for r in url_dedup(groups, "url", "doc_id").collect()}
    assert got["https://a.com/p?a=1&b=2"] == 1


def test_assignment_flags(groups):
    got = {r["doc_id"]: r["is_duplicate"]
           for r in url_dedup_assign(groups, "url", "doc_id", "q").collect()}
    assert got == {1: True, 2: False, 3: True, 4: False}

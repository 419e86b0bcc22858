"""RangeFieldQuery (document/RangeFieldQuery.java) — all four relations
vs a brute-force python restatement, 1-D and 2-D."""

from __future__ import annotations

import random

import pytest

from lucene_solr_spark.search.rangefield import (range_field_predicate,
                                                 range_field_query)


@pytest.fixture(scope="module")
def ranges(spark):
    rng = random.Random(5)
    rows = []
    for i in range(300):
        lo = rng.randint(0, 90)
        rows.append((i, lo, lo + rng.randint(0, 25),
                     float(lo % 10), float(lo % 10 + rng.randint(1, 5))))
    rows.append((300, None, None, 1.0, 2.0))    # null bound never matches
    return (spark.createDataFrame(
        rows, "doc_id long, lo long, hi long, ylo double, yhi double")
        .cache(), rows)


def _rel(dlo, dhi, qlo, qhi):
    inter = dlo <= qhi and dhi >= qlo
    within = dlo >= qlo and dhi <= qhi
    contains = dlo <= qlo and dhi >= qhi
    return inter, within, contains


def test_relations_1d_vs_bruteforce(ranges):
    df, rows = ranges
    q = (30, 55)
    for rel in ("intersects", "within", "contains", "crosses"):
        got = {r["doc_id"] for r in
               range_field_query(df, [("lo", "hi")], [q], rel).collect()}
        exp = set()
        for d, lo, hi, *_ in rows:
            if lo is None:
                continue
            inter, within, contains = _rel(lo, hi, *q)
            keep = {"intersects": inter, "within": within,
                    "contains": contains,
                    "crosses": inter and not within and not contains}[rel]
            if keep:
                exp.add(d)
        assert got == exp and exp
    # the four relations partition the intersecting set
    g = {rel: {r["doc_id"] for r in range_field_query(
        df, [("lo", "hi")], [q], rel).collect()}
        for rel in ("intersects", "within", "contains", "crosses")}
    assert g["intersects"] >= g["within"] | g["contains"] | g["crosses"]
    assert not (g["crosses"] & (g["within"] | g["contains"]))


def test_relations_2d(ranges):
    df, rows = ranges
    dims = [("lo", "hi"), ("ylo", "yhi")]
    q = [(30, 55), (3.0, 8.0)]
    for rel in ("intersects", "within", "crosses"):
        got = {r["doc_id"] for r in
               range_field_query(df, dims, q, rel).collect()}
        exp = set()
        for d, lo, hi, ylo, yhi in rows:
            if lo is None:
                continue
            i1, w1, c1 = _rel(lo, hi, 30, 55)
            i2, w2, c2 = _rel(ylo, yhi, 3.0, 8.0)
            inter, within, contains = i1 and i2, w1 and w2, c1 and c2
            keep = {"intersects": inter, "within": within,
                    "crosses": inter and not within and not contains}[rel]
            if keep:
                exp.add(d)
        assert got == exp
    assert 300 not in {r["doc_id"] for r in range_field_query(
        df, dims, q, "intersects").collect()}


def test_rangefield_validation(ranges):
    df, _ = ranges
    with pytest.raises(ValueError, match="unknown relation"):
        range_field_query(df, [("lo", "hi")], [(1, 2)], "touches")
    with pytest.raises(ValueError, match="inverted"):
        range_field_query(df, [("lo", "hi")], [(5, 2)])
    with pytest.raises(ValueError, match="align"):
        range_field_predicate([("lo", "hi")], [], "within")

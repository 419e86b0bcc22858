"""Atomic updates (AtomicUpdateDocumentMerger.java:93-260) — every op,
untouched-field carry-over, error envelope."""

from __future__ import annotations

import pytest

from lucene_solr_spark.index.atomic import apply_atomic_updates


@pytest.fixture()
def store(spark):
    rows = [
        (0, "alpha", 10, ["x", "y"]),
        (1, "beta", 20, ["y", "z", "y"]),
        (2, None, None, None),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, title string, views long, tags array<string>")


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_set_inc_and_carryover(store):
    got = _by_id(apply_atomic_updates(store, [
        {"id": 0, "title": {"set": "ALPHA"}, "views": {"inc": 5}},
        {"id": 2, "views": {"inc": 3}},          # missing counts as 0
        {"id": 1, "title": {"set": None}},       # set null clears
    ]))
    assert got[0]["title"] == "ALPHA" and got[0]["views"] == 15
    assert got[0]["tags"] == ["x", "y"]           # untouched field
    assert got[1]["title"] is None and got[1]["views"] == 20
    assert got[2]["views"] == 3
    # docs absent from the batch are bit-identical
    assert got[1]["tags"] == ["y", "z", "y"]


def test_multivalued_ops(store):
    got = _by_id(apply_atomic_updates(store, [
        {"id": 0, "tags": {"add": ["y", "w"]}},
        {"id": 1, "tags": {"remove": "y"}},       # removes ALL occurrences
    ]))
    assert got[0]["tags"] == ["x", "y", "y", "w"]
    assert got[1]["tags"] == ["z"]
    got2 = _by_id(apply_atomic_updates(store, [
        {"id": 0, "tags": {"add-distinct": ["y", "w", "w"]}},
    ]))
    assert got2[0]["tags"] == ["x", "y", "w"]     # y not re-added
    got3 = _by_id(apply_atomic_updates(store, [
        {"id": 1, "tags": {"removeregex": "[yz]"}},
    ]))
    assert got3[1]["tags"] == []
    # add onto a null multivalued field starts it
    got4 = _by_id(apply_atomic_updates(store, [
        {"id": 2, "tags": {"add": "first"}},
        {"id": 0, "tags": {"set": ["only"]}},
    ]))
    assert got4[2]["tags"] == ["first"] and got4[0]["tags"] == ["only"]


def test_atomic_error_envelope(store):
    with pytest.raises(ValueError, match="unknown atomic op"):
        apply_atomic_updates(store, [{"id": 0, "title": {"bogus": 1}}])
    with pytest.raises(ValueError, match="multivalued"):
        apply_atomic_updates(store, [{"id": 0, "title": {"add": "x"}}])
    with pytest.raises(ValueError, match="unknown fields"):
        apply_atomic_updates(store, [{"id": 0, "nope": {"set": 1}}])
    with pytest.raises(ValueError, match="without id"):
        apply_atomic_updates(store, [{"title": {"set": 1}}])
    with pytest.raises(ValueError, match="sequential"):
        apply_atomic_updates(store, [{"id": 0, "views": {"inc": 1}},
                                     {"id": 0, "views": {"inc": 2}}])
    assert apply_atomic_updates(store, []) is store

"""Double Metaphone encoder + filter surface (VERDICT r4 missing #5:
`analysis/phonetic/.../DoubleMetaphoneFilter.java:31`; encoder is the
published Philips algorithm commons-codec implements for Solr).

Vectors below are the published primary/alternate pairs (Philips, CUJ
June 2000 examples + the commons-codec test corpus subset)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.analysis.metaphone import (dm_codes,
                                                  double_metaphone,
                                                  double_metaphone_terms,
                                                  double_metaphone_udf)
from lucene_solr_spark.index import IndexBuilder
from tests.conftest import SF_DIR

VECTORS = {
    # the algorithm's headline fork: anglo vs germanic readings
    "smith": ("SM0", "XMT"), "schmidt": ("XMT", "SMT"),
    # silent initial clusters
    "knight": ("NT", "NT"), "gnome": ("NM", "NM"),
    "pneumonia": ("NMN", "NMN"), "wright": ("RT", "RT"),
    "psychology": None,  # shape-only below
    # C family
    "caesar": ("SSR", "SSR"), "chianti": ("KNT", "KNT"),
    "chorus": ("KRS", "KRS"), "architect": ("ARKT", "ARKT"),
    "orchid": ("ARKT", "ARKT"), "chore": ("XR", "XR"),
    "michael": ("MKL", "MXL"), "mchugh": ("MK", "MK"),
    "czerny": ("SRN", "XRN"), "focaccia": ("FKX", "FKX"),
    "bacchus": ("PKS", "PKS"), "accident": ("AKST", "AKST"),
    "bellocchio": ("PLX", "PLX"),
    # G family
    "ghost": ("KST", "KST"), "ghislane": ("JLN", "JLN"),
    "laugh": ("LF", "LF"), "cough": ("KF", "KF"),
    "edge": ("AJ", "AJ"), "edgar": ("ATKR", "ATKR"),
    "dangerous": ("TNJR", "TNKR"), "bergen": ("PRJN", "PRKN"),
    "berger": ("PRKR", "PRJR"),
    # J / spanish
    "jose": ("HS", "HS"), "san jacinto": ("SNHS", "SNHS"),
    "bajador": ("PJTR", "PHTR"), "cabrillo": ("KPRL", "KPR"),
    "gallegos": ("KLKS", "KKS"),
    # S family
    "island": ("ALNT", "ALNT"), "sugar": ("XKR", "SKR"),
    "school": ("SKL", "SKL"), "schooner": ("SKNR", "SKNR"),
    "schermerhorn": ("XRMR", "SKRM"), "nation": ("NXN", "NXN"),
    # TH
    "thomas": ("TMS", "TMS"), "thames": ("TMS", "TMS"),
    "thumb": ("0M", "TM"), "dumb": ("TM", "TM"),
    # W / X / Z / slavic
    "wasserman": ("ASRM", "FSRM"), "filipowicz": ("FLPT", "FLPF"),
    "xavier": ("SF", "SFR"), "breaux": ("PR", "PR"),
    "zhao": ("J", "J"), "tymczak": ("TMSK", "TMXK"),
    "resnais": ("RSN", "RSNS"), "rogier": ("RJ", "RJR"),
    "jankelowicz": ("JNKL", "ANKL"), "yankelovich": ("ANKL", "ANKL"),
}


def test_published_vectors():
    for word, exp in VECTORS.items():
        if exp is None:
            continue
        assert double_metaphone(word) == exp, word


def test_homophones_share_a_code():
    pairs = [("katherine", "catherine"), ("smith", "smyth"),
             ("thomas", "tomas"), ("jon", "john"),
             ("jankelowicz", "yankelovich")]
    for a, b in pairs:
        assert dm_codes(a) & dm_codes(b), (a, b)


def test_code_alphabet_and_length():
    import string
    alpha = set("AFHJKLMNPRSTX0")
    for w in list(VECTORS) + ["", "a", "zzzz", "constantinople",
                              "encyclopedia", "psychology"]:
        p, a = double_metaphone(w)
        assert len(p) <= 4 and len(a) <= 4
        assert set(p) <= alpha and set(a) <= alpha, (w, p, a)
    # deterministic
    assert double_metaphone("constantinople") == \
        double_metaphone("CONSTANTINOPLE")
    assert all(double_metaphone(c) in (("", ""),)
               for c in ["", "123", "!!"])
    assert string  # quiet linters


@pytest.fixture(scope="module")
def terms(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = (IndexBuilder(ENGLISH_ANALYZER, grid=128)
           .build(spark, docs.select("doc_id", "text")))
    return idx.terms.cache()


def test_batch_udf_matches_scalar(spark, terms):
    """Differential: the Arrow-batched encoder must agree with the
    per-token twin on every dictionary term (same pattern as
    test_routing's scalar≡vectorized murmur3 check)."""
    pdf = (terms.select("term")
           .withColumn("_dm", double_metaphone_udf()(F.col("term")))
           .limit(2000).toPandas())
    for t, got in zip(pdf["term"], pdf["_dm"]):
        p, a = double_metaphone(t)
        exp = [p] if (a == p or not a) else ([p, a] if p else [a])
        assert list(got) == exp, t


def test_term_expansion_intersects_codes(spark, terms):
    word = terms.orderBy(F.desc("df"), F.asc("term")) \
        .limit(1).collect()[0]["term"]
    got = double_metaphone_terms(terms, word, size=32)
    assert word in got
    for t in got:
        assert dm_codes(t) & dm_codes(word), t

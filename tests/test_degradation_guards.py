"""Silent-degradation guards (VERDICT r3 "What's wrong" #5-#8).

Every capped / bounded mechanism must either signal its degradation or
refuse to degrade:
  - lsh_candidates hot-bucket cap → drop_stats + RuntimeWarning
  - simhash_pairs pigeonhole bands auto-derived from max_hamming
  - connected_components raises on non-convergence
  - top-terms rewrite caps a REAL >1024 overflow at 1024 by df desc
"""

import warnings

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.pipeline import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# lsh_candidates: dropped hot buckets are reported, never silent
# ---------------------------------------------------------------------------

def test_lsh_hot_bucket_drop_reported(spark):
    # 6 identical boilerplate docs -> every band bucket has 6 members;
    # max_bucket=5 drops all 4 buckets (and all 24 doc-slots).
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(spark, [(i, boiler) for i in range(6)])
    sigs = dedup.minhash_signatures(dedup.shingles(docs), num_perms=16)
    stats: dict = {}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cand = dedup.lsh_candidates(sigs, max_bucket=5, drop_stats=stats)
        n_cand = cand.count()
    assert stats["dropped_buckets"] == 4
    assert stats["dropped_doc_slots"] == 24
    assert n_cand == 0              # everything was in dropped buckets
    msgs = [str(x.message) for x in w if x.category is RuntimeWarning]
    assert any("dropped 4 hot bucket" in m for m in msgs)


def test_lsh_no_drop_no_warning(spark):
    docs = _docs(spark, [(i, f"unique document number {i} with words "
                             f"alpha{i} beta{i} gamma{i}") for i in range(5)])
    sigs = dedup.minhash_signatures(dedup.shingles(docs), num_perms=16)
    stats: dict = {}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dedup.lsh_candidates(sigs, max_bucket=1000, drop_stats=stats).count()
    assert stats["dropped_buckets"] == 0
    assert stats["dropped_doc_slots"] == 0
    assert not [x for x in w if x.category is RuntimeWarning]


def test_minhash_dedup_threads_drop_stats(spark):
    boiler = "copy paste boiler plate text shared by every single page here"
    docs = _docs(spark, [(i, boiler) for i in range(4)])
    stats: dict = {}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = dedup.minhash_dedup(docs, max_bucket=2, drop_stats=stats)
        out.count()
    assert stats["dropped_buckets"] > 0


# ---------------------------------------------------------------------------
# simhash_pairs: bands derived from max_hamming; explicit misuse raises
# ---------------------------------------------------------------------------

def test_simhash_bands_derived_recall(spark):
    # planted near-identical pair: one word substitution
    base = ("spark inverted index engine builds posting lists with "
            "delta compressed blocks and bm25 scoring for web text")
    docs = _docs(spark, [(0, base), (1, base.replace("web", "net")),
                         (2, "совершенно other totally unrelated content "
                             "nothing shared here at all believe me")])
    sigs = dedup.simhash_signatures(docs)
    hams = {(r["doc_a"], r["doc_b"]): r["hamming"]
            for r in dedup.simhash_pairs(sigs, max_hamming=31).collect()}
    h01 = hams.get((0, 1))
    assert h01 is not None
    # bands=None derives max_hamming+1 bands: the pigeonhole guarantee
    # now HOLDS for exactly that radius — the (0,1) pair must be found
    found = {(r["doc_a"], r["doc_b"])
             for r in dedup.simhash_pairs(sigs, max_hamming=h01).collect()}
    assert (0, 1) in found


def test_simhash_explicit_bad_bands_raise(spark):
    docs = _docs(spark, [(0, "a b c d e f g h")])
    sigs = dedup.simhash_signatures(docs)
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_pairs(sigs, max_hamming=4, bands=4)
    with pytest.raises(ValueError, match="32 bands"):
        dedup.simhash_pairs(sigs, max_hamming=32, bands=33)


def test_simhash_band_split_covers_all_bits(spark):
    # 5 bands over 32 bits -> widths 7,7,6,6,6; a pair differing in ONE
    # bit anywhere must still share >= 4 bands (recall at any position).
    docs = _docs(spark, [(0, "x")])
    sigs = dedup.simhash_signatures(docs).withColumn(
        "simhash", F.lit(0x5A5A5A5A).cast("long"))
    flipped = sigs.withColumn("doc_id", F.lit(1).cast("long")).withColumn(
        "simhash", F.col("simhash").bitwiseXOR(F.lit(1 << 31)))
    both = sigs.unionByName(flipped)
    pairs = dedup.simhash_pairs(both, max_hamming=4, bands=5).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs] == [(0, 1, 1)]


# ---------------------------------------------------------------------------
# connected_components: non-convergence raises instead of mislabeling
# ---------------------------------------------------------------------------

def test_cc_nonconvergence_raises(spark):
    # chain 0-1-2-...-9: min-label needs ~9 rounds; max_iter=2 cannot
    chain = spark.createDataFrame([(i, i + 1) for i in range(10)],
                                  "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iter=2)


def test_cc_converges_and_labels_chain(spark):
    chain = spark.createDataFrame([(i, i + 1) for i in range(10)],
                                  "doc_a long, doc_b long")
    cc = {r["doc_id"]: r["component"]
          for r in dedup.connected_components(chain, max_iter=25).collect()}
    assert all(cc[i] == 0 for i in range(11))


# ---------------------------------------------------------------------------
# top-terms rewrite: a REAL >1024 overflow (5k-term dictionary)
# ---------------------------------------------------------------------------

def test_topterms_cap_real_overflow(spark):
    """VERDICT r3 #5: the ">1024 expansion" done-criterion needs a real
    overflow. 5000 prefix-matching dictionary terms -> prefix_terms must
    return exactly the 1024 highest-df terms (ties term asc)."""
    from lucene_solr_spark.search import multiterm
    from lucene_solr_spark.search.ast import MAX_CLAUSE_COUNT

    n = 5000
    rows = [("body", f"pre{i:05d}", (i * 37) % 1000 + 1) for i in range(n)]
    rows.append(("body", "other", 9999))           # non-matching control
    rows.append(("title", "pre99999", 9999))       # other-field control
    terms_df = spark.createDataFrame(rows, "field string, term string, df long")

    got = multiterm.prefix_terms(terms_df, "pre", field="body")
    assert len(got) == MAX_CLAUSE_COUNT == 1024
    assert "other" not in got and "pre99999" not in got

    # expected: top-1024 by (df desc, term asc) over the matching set
    matching = [(f"pre{i:05d}", (i * 37) % 1000 + 1) for i in range(n)]
    expected = sorted(t for t, _ in
                      sorted(matching, key=lambda p: (-p[1], p[0]))[:1024])
    assert got == expected

"""Training-data pipeline operator tests (dedup / similarity / textstats /
multimodal) at sf0.001, differential where it matters:

- MinHash+LSH recall vs exact n-gram Jaccard (same threshold)
- LSH-blocked embedding near-dup ⊆ exact near-dup (precision 1.0)
- order sensitivity of the rolling fingerprint
- multimodal plumbing schema + stub gating
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window, functions as F

from lucene_solr_spark.pipeline import dedup, multimodal, similarity, textstats
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").cache())


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_exact_dedup_planted(spark, docs):
    planted = (docs.filter(F.col("doc_id") < 5)
               .withColumn("doc_id", F.col("doc_id") + 10_000))
    ed = dedup.exact_dedup(docs.unionByName(planted))
    dups = ed.filter("is_duplicate").orderBy("doc_id").collect()
    assert [r["doc_id"] for r in dups] == [10_000 + i for i in range(5)]
    assert [r["canonical_id"] for r in dups] == list(range(5))
    assert ed.filter(~F.col("is_duplicate")).count() == docs.count()


def test_minhash_recall_vs_exact(spark, docs):
    """Every exact-Jaccard>=0.8 pair must be recovered through LSH
    banding (16 perms, 4x4 bands: P(miss) = (1-j^4)^4 < 1e-4 at j=0.8)."""
    exact = {(r["doc_a"], r["doc_b"]) for r in
             dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    mh = {(r["doc_a"], r["doc_b"]) for r in
          dedup.minhash_dedup(docs, threshold=0.8).collect()}
    assert mh == exact        # verify step makes precision exact; recall LSH
    assert len(exact) > 0     # corpus plants near-dup pairs


def test_minhash_signature_properties(spark, docs):
    sh = dedup.shingles(docs)
    sigs = dedup.minhash_signatures(sh, num_perms=8)
    row = sigs.filter("doc_id = 0").collect()[0]
    from lucene_solr_spark.pipeline.hashing import P31
    for j in range(8):
        assert 0 <= row[f"mh{j}"] < P31
    # permutation of doc order must not change signatures (set semantics)
    sigs2 = dedup.minhash_signatures(sh.orderBy(F.desc("shingle")), 8)
    assert sigs2.filter("doc_id = 0").collect()[0].asDict() == row.asDict()


def test_simhash_near_zero_for_self_similar(spark, docs):
    sigs = dedup.simhash_signatures(docs)
    assert sigs.count() == docs.filter(F.length("text") > 0).count()
    pairs = dedup.simhash_pairs(sigs, max_hamming=31)
    # hamming is symmetric-free (a<b) and bounded
    bad = pairs.filter((F.col("hamming") < 0) | (F.col("hamming") > 32))
    assert bad.count() == 0


def test_ngram_jaccard_df_cutoff_only_drops(spark, docs):
    full = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    cut = dedup.ngram_jaccard_pairs(docs, threshold=0.5, df_cutoff=2)
    f = {(r["doc_a"], r["doc_b"]) for r in full.collect()}
    c = {(r["doc_a"], r["doc_b"]) for r in cut.collect()}
    # cutoff reduces intersections only -> pairs can only drop out
    assert c <= f or len(c - f) == 0


def test_cosine_topk_self_first(spark, emb):
    qv = emb.filter("vec_id = 3").select("embedding").collect()[0][0]
    top = similarity.cosine_topk(emb, qv, 5).collect()
    assert top[0]["vec_id"] == 3
    assert abs(top[0]["cos"] - 1.0) < 1e-9
    cs = [r["cos"] for r in top]
    assert cs == sorted(cs, reverse=True)


def test_ivf_probe_subset_of_bruteforce(spark, emb):
    qv = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    cent = similarity.seed_centroids(emb, 4)
    ivf = similarity.ivf_topk(emb, cent, qv, n_probe=4, k=10).collect()
    bf = similarity.cosine_topk(emb, qv, 10).collect()
    # probing ALL cells == brute force
    assert [r["vec_id"] for r in ivf] == [r["vec_id"] for r in bf]


def test_sq8_topk_matches_exact(spark, emb):
    """Two-stage SQ8 ANN recovers the exact top-k on the test corpus:
    SQ8's per-dim error is bounded by (mx-mn)/255/2, far below the
    score gaps here, so the exact re-rank over 100 candidates must
    return the exhaustive-scan answer, scores included."""
    qv = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    sq8 = similarity.sq8_topk(emb, qv, k=10, candidates=100).collect()
    bf = similarity.cosine_topk(emb, qv, 10).collect()
    assert [(r["vec_id"], round(r["cos"], 9)) for r in sq8] == \
           [(r["vec_id"], round(r["cos"], 9)) for r in bf]


def test_sq8_constant_dim_and_codebook_reuse(spark):
    """A dimension with mx == mn must not NaN/null the scores, and a
    precomputed codebook (the persisted-table posture at scale) gives
    the same answer as inline training."""
    df = spark.createDataFrame(
        [(i, [1.0, float(i), -2.0]) for i in range(6)],
        "vec_id long, embedding array<float>")
    top = similarity.sq8_topk(df, [1.0, 4.0, -2.0], k=3, candidates=6)
    rows = top.collect()
    assert rows[0]["vec_id"] == 4  # exact direction match ranks first
    assert all(r["cos"] is not None for r in rows)
    cb = similarity.sq8_train(df)
    again = similarity.sq8_topk(df, [1.0, 4.0, -2.0], k=3, candidates=6,
                                codebook=cb).collect()
    assert [(r["vec_id"], r["cos"]) for r in again] == \
           [(r["vec_id"], r["cos"]) for r in rows]


def test_cross_corpus_neardups_matches_union_restriction(spark, docs):
    """Per-doc MinHash signing makes two-sided banding equivalent to
    whole-corpus banding restricted to cross-side pairs: the
    cross-corpus result must equal minhash_dedup over the union,
    filtered to (new, ref) pairs — and contain no within-side pair."""
    new = docs.filter("doc_id % 5 = 0")
    ref = docs.filter("doc_id % 5 <> 0")
    cross = {(r["new_id"], r["ref_id"]): round(r["jaccard"], 9)
             for r in dedup.cross_corpus_neardups(
                 new, ref, threshold=0.8).collect()}
    assert all(a % 5 == 0 and b % 5 != 0 for a, b in cross)
    full = dedup.minhash_dedup(docs, threshold=0.8,
                               max_bucket=None).collect()
    expect = {}
    for r in full:
        a, b = r["doc_a"], r["doc_b"]
        if a % 5 == 0 and b % 5 != 0:
            expect[(a, b)] = round(r["jaccard"], 9)
        elif b % 5 == 0 and a % 5 != 0:
            expect[(b, a)] = round(r["jaccard"], 9)
    assert cross == expect and cross, "cross result diverged or empty"


def test_component_representatives_keep_best(spark):
    """Planted component where the highest-quality member is NOT the
    min doc_id: keep-best must pick it, keep-first would not."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    comps = dedup.canonicalize_near_dups(pairs)
    quality = spark.createDataFrame(
        [(1, 50.0), (2, 90.0), (3, 70.0), (10, 5.0), (11, 5.0)],
        "doc_id long, quality double")
    res = {r["doc_id"]: r for r in
           dedup.component_representatives(comps, quality).collect()}
    assert res[1]["rep_id"] == 2 and res[1]["is_duplicate"]
    assert res[2]["rep_id"] == 2 and not res[2]["is_duplicate"]
    assert res[3]["rep_id"] == 2 and res[3]["is_duplicate"]
    # quality tie in {10, 11} -> lowest doc_id wins
    assert res[10]["rep_id"] == 10 and not res[10]["is_duplicate"]
    assert res[11]["rep_id"] == 10 and res[11]["is_duplicate"]


def test_token_budget_cut_exact_and_reshard_invariant(spark, docs):
    from lucene_solr_spark.pipeline import sampling
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"))
    budgets = {"src0": 400.0}
    kept = sampling.token_budget_cut(src, budgets, default_budget=200.0)
    rows = kept.collect()
    assert rows, "budget cut kept nothing"
    # every kept row's running total is within its source's budget
    for r in rows:
        cap = 400 if r["source"] == "src0" else 200
        assert r["cum_tokens"] <= cap
    # per-source kept token sums equal the max cum_tokens (prefix
    # property: the kept set is exactly the hash-order prefix)
    agg = {(r["source"]): r for r in
           kept.groupBy("source").agg(
               F.sum("n_tok").alias("s"),
               F.max("cum_tokens").alias("m")).collect()}
    for r in agg.values():
        assert r["s"] == r["m"]
    # reshard invariance: identical kept set at a different layout
    again = sampling.token_budget_cut(
        src.repartition(13), budgets, default_budget=200.0)
    assert sorted((r["doc_id"], r["cum_tokens"]) for r in again.collect()) \
        == sorted((r["doc_id"], r["cum_tokens"]) for r in rows)


def test_lsh_neardup_precision(spark, emb):
    planes = (emb.orderBy("vec_id").limit(6)
              .select(F.col("vec_id").cast("int").alias("pid"),
                      F.col("embedding").alias("pvec")))
    planes = planes.withColumn(
        "pid", F.row_number().over(Window.orderBy("pid")) - 1)
    exact = {(r["vec_a"], r["vec_b"]) for r in
             similarity.neardup_pairs(emb, 0.3).collect()}
    lsh = {(r["vec_a"], r["vec_b"]) for r in
           similarity.lsh_neardup_pairs(emb, planes, 0.3).collect()}
    assert lsh <= exact       # blocking never invents pairs


def test_lang_id_mostly_en(spark, docs):
    res = textstats.lang_id(docs)
    en = res.filter("pred_lang = 'en'").count()
    assert en >= res.count() * 0.5


def test_bigram_logprob_orders_predictability(spark):
    """Repeated boilerplate must score LOWER bits than text whose
    word order is unique, and degenerate docs are handled."""
    rows = [(i, "the cat sat on the mat") for i in range(1, 11)]
    # same unigrams AND same first token as the template (bigram
    # scoring drops position 1), scrambled word order: its bigrams are
    # corpus-rare while its scored unigrams are identical, so only the
    # bigram term can tell it apart
    rows += [(11, "the mat on cat sat the"), (12, "solo"), (13, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = {r["doc_id"]: r for r in textstats.bigram_logprob(df).collect()}
    assert res[11]["bits"] > res[1]["bits"]
    assert res[12]["n_bigrams"] == 0 and res[12]["bits"] is None
    assert res[13]["n_bigrams"] == 0 and res[13]["bits"] is None
    # lambda = 1 degenerates to the unigram model, which CANNOT tell
    # the scrambled doc from the template (identical token multisets)
    lam1 = {r["doc_id"]: r for r in
            textstats.bigram_logprob(df, lam=1.0).collect()}
    assert abs(lam1[11]["bits"] - lam1[1]["bits"]) < 1e-9


def test_quality_bounds(spark, docs):
    res = textstats.quality_score(docs)
    bad = res.filter((F.col("quality") < 0) | (F.col("quality") > 1) |
                     (F.col("stop_ratio") < 0) | (F.col("stop_ratio") > 1))
    assert bad.count() == 0


def test_fingerprint_order_sensitive(spark):
    a = spark.createDataFrame([(0, "alpha beta gamma")], "doc_id long, text string")
    b = spark.createDataFrame([(0, "gamma beta alpha")], "doc_id long, text string")
    fa = textstats.fingerprint(a).collect()[0]["fp"]
    fb = textstats.fingerprint(b).collect()[0]["fp"]
    assert fa != fb
    # deterministic across invocations
    assert textstats.fingerprint(a).collect()[0]["fp"] == fa


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "Hello, world! x9")],
                               "doc_id long, text string")
    r = textstats.token_counts(df).collect()[0]
    assert r["ws_tokens"] == 3
    # [hello][,][world][!][x9] -> lowercase-only token regex: 'ello'... the
    # regex is ascii-lowercase; uppercase letters fall into the punct class
    assert r["re_tokens"] >= 4


def test_multimodal_meta_schema_and_determinism(spark, docs):
    bm = multimodal.extract_binary_meta(multimodal.attach_binary(docs))
    assert [f.name for f in bm.schema.fields] == [
        "doc_id", "n_bytes", "prefix_hex", "fake_width", "fake_height",
        "fake_channels"]
    r = bm.filter("doc_id = 0").collect()[0]
    txt = docs.filter("doc_id = 0").collect()[0]["text"]
    w, h, c = multimodal.fake_decode(txt.encode())
    assert (r["fake_width"], r["fake_height"], r["fake_channels"]) == (w, h, c)
    assert r["n_bytes"] == len(txt.encode())


def test_decode_image_stub_gated(spark, docs):
    bdf = multimodal.attach_binary(docs.limit(1))
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(bdf)


def test_connected_components_and_purge(spark):
    """Near-dup canonicalization: CC labels = min-of-component, and the
    delete feedback loop (dedup → tombstone → liveDocs) end to end."""
    from lucene_solr_spark.pipeline import dedup as dd
    from lucene_solr_spark.index import IndexBuilder
    from lucene_solr_spark.index.deletes import delete_docs, live_doc_count
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
    from pyspark.sql import functions as F

    # known graph: {1-2, 2-3} ∪ {10-11} ∪ {20-21, 21-22, 22-23} (chain)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long")
    cc = {r["doc_id"]: r["component"]
          for r in dd.connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                  20: 20, 21: 20, 22: 20, 23: 20}
    canon = dd.canonicalize_near_dups(pairs)
    dups = sorted(r["doc_id"] for r in
                  canon.filter("is_duplicate").collect())
    assert dups == [2, 3, 11, 21, 22, 23]

    # feedback into the index: duplicates become tombstones
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i}") for i in range(30)],
        "doc_id long, text string")
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=16).build(spark, docs)
    purged = delete_docs(spark, idx, canon.filter("is_duplicate"))
    assert live_doc_count(purged) == 30 - len(dups)
    s = Searcher(spark, purged)
    from lucene_solr_spark.search.ast import TermQuery
    hits = {r["doc_id"] for r in s.match_docs(TermQuery("alpha")).collect()}
    assert not (hits & set(dups)) and len(hits) == 30 - len(dups)
    idx.release()


def test_banded_lsh_recall_one_on_fixture(spark, emb):
    """The gated near-dup surface (banded LSH, 8 bands x 2 planes) must
    EQUAL the test-only exhaustive all-pairs baseline on the fixture —
    recall 1.0 at the chosen plane budget, precision 1.0 by construction
    (VERDICT r2 #9: no crossJoin reachable from queries())."""
    planes = (emb.filter("vec_id >= 1 AND vec_id <= 16")
              .select((F.col("vec_id") - 1).alias("pid"),
                      F.col("embedding").alias("pvec")))
    exact = {(r["vec_a"], r["vec_b"]) for r in
             similarity.neardup_pairs(emb, 0.45).collect()}
    banded = {(r["vec_a"], r["vec_b"]) for r in
              similarity.banded_lsh_neardup_pairs(
                  emb, planes, band_size=2, threshold=0.45).collect()}
    assert banded == exact

    # pair generation is an equi-join on (band, bucket): the physical
    # plan contains no cartesian product of the embedding table
    plan = (similarity.banded_lsh_neardup_pairs(emb, planes, 2, 0.45)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan


def test_minhash_query_self_match(spark):
    """minhash_query (MinHashQParser role): a document's own text as
    the query estimates Jaccard 1.0 for that doc; unrelated docs score
    below it; sim threshold filters."""
    from lucene_solr_spark.pipeline.dedup import minhash_query
    rows = [(0, "aa bb cc dd ee ff"),
            (1, "aa bb cc dd ee gg"),       # near-dup of 0
            (2, "zz yy xx ww vv uu")]       # disjoint
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    res = minhash_query(spark, docs, "aa bb cc dd ee ff",
                        num_perms=16, sim=0.0, top=10).collect()
    by = {r["doc_id"]: r["est_jaccard"] for r in res}
    assert by[0] == 1.0
    assert by[1] < 1.0
    assert by.get(2, 0.0) <= by[1]
    # threshold: requiring > doc1's estimate leaves only doc 0
    res2 = minhash_query(spark, docs, "aa bb cc dd ee ff",
                         num_perms=16, sim=by[1] + 1e-9, top=10).collect()
    assert [r["doc_id"] for r in res2] == [0]


def test_gopher_rules(spark):
    """Gopher §A1.1 rules on handcrafted edge docs."""
    from lucene_solr_spark.pipeline.textstats import gopher_rules
    good = " ".join(["the quick brown fixes of engine that have with "
                     "improvements"] * 3)   # 30 words, mean len 5.0
    bullets = "\n".join(["• item one", "- item two", "* item three",
                         "plain line"])
    ellipses = "\n".join(["to be continued...", "the end…", "of plain"])
    symbols = "the of " + "# " * 10
    nonalpha = "the of " + "123 456 789 " * 10
    docs = spark.createDataFrame(
        [(0, good), (1, bullets), (2, ellipses), (3, symbols),
         (4, nonalpha), (5, "tiny of the")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           gopher_rules(docs, min_words=5).collect()}
    assert got[0]["keep"] and got[0]["n_words"] == 30
    assert got[0]["stop_hits"] == 5
    # 3/4 bullet-initial lines < 0.9 → bullets alone don't kill it, but
    # stop_hits==0 does
    assert got[1]["bullet_frac"] == pytest.approx(0.75)
    assert not got[1]["keep"]
    # 2/3 ellipsis-terminal > 0.3
    assert got[2]["ellipsis_frac"] == pytest.approx(2 / 3)
    assert not got[2]["keep"]
    # 10 '#' over 12 words > 0.1
    assert got[3]["symbol_ratio"] == pytest.approx(10 / 12)
    assert not got[3]["keep"]
    # 2/32 alpha words < 0.8
    assert got[4]["alpha_frac"] == pytest.approx(2 / 32)
    assert not got[4]["keep"]
    # 3 words < min_words=5
    assert not got[5]["keep"]


def test_pii_scrub(spark):
    """Rule order: dotted phone is claimed by the phone rule, not the
    IP rule; counts match masks."""
    from lucene_solr_spark.pipeline.scrub import pii_scrub, pii_stats
    docs = spark.createDataFrame(
        [(0, "mail a.b+c@ex-ample.co.uk and x@y.io now"),
         (1, "call 555-123-4567 or 123.456.7890 ok"),
         (2, "host 10.0.0.1 peer 192.168.255.7"),
         (3, "clean text with no pii at all")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert got[0]["n_email"] == 2
    assert got[0]["clean_text"] == "mail |||EMAIL||| and |||EMAIL||| now"
    assert (got[1]["n_phone"], got[1]["n_ipv4"]) == (2, 0)
    assert got[1]["clean_text"] == "call |||PHONE||| or |||PHONE||| ok"
    assert got[2]["n_ipv4"] == 2
    assert got[2]["clean_text"] == "host |||IP||| peer |||IP|||"
    assert got[3]["clean_text"] == docs.collect()[3]["text"]
    st = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert st[3]["has_pii"] is False and st[0]["has_pii"] is True


def test_decontaminate(spark):
    from lucene_solr_spark.pipeline.scrub import (benchmark_grams,
                                                  decontaminate)
    span = "one two three four five six seven eight"   # an 8-gram
    docs = spark.createDataFrame(
        [(0, "prefix " + span + " suffix"),      # contains the 8-gram
         (1, span.replace("eight", "NINE")),     # near miss
         (2, "totally unrelated words here")],
        "doc_id long, text string")
    bench = spark.createDataFrame([(99, span)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           decontaminate(docs, benchmark_grams(bench, n=8), n=8).collect()}
    assert got[0]["contaminated"] and got[0]["n_hits"] == 1
    assert got[0]["n_grams"] == 3   # 10 words -> 3 windows
    assert not got[1]["contaminated"]
    assert not got[2]["contaminated"] and got[2]["n_grams"] == 0


def test_substring_dup(spark):
    from lucene_solr_spark.pipeline.dedup import (duplicate_windows,
                                                  substring_dup_stats)
    span = " ".join(f"w{i}" for i in range(13))
    docs = spark.createDataFrame(
        [(0, "aa bb " + span),                    # shares the span
         (1, span + " cc dd"),                    # shares the span
         (2, "unique " + " ".join(f"u{i}" for i in range(13)))],
        "doc_id long, text string")
    dw = duplicate_windows(docs, width=13).collect()
    assert [(r["gram"], r["n_docs"], r["n_occ"]) for r in dw] == [
        (span, 2, 2)]
    # hashed variant finds the same number of duplicated windows
    assert duplicate_windows(docs, width=13, hashed=True).count() == 1
    got = {r["doc_id"]: r for r in
           substring_dup_stats(docs, width=13).collect()}
    assert (got[0]["n_windows"], got[0]["dup_windows"]) == (3, 1)
    assert (got[1]["n_windows"], got[1]["dup_windows"]) == (3, 1)
    assert got[2]["dup_windows"] == 0
    assert got[0]["dup_frac"] == pytest.approx(1 / 3)


def test_hashed_gram_paths_equal_string_paths(spark, docs):
    """word_ngram_hashes fast path (no gram-string materialization) must
    reproduce the string path's RESULTS exactly: same per-doc dup stats
    and same contamination flags (only the shuffle key representation
    differs)."""
    from lucene_solr_spark.pipeline.dedup import substring_dup_stats
    from lucene_solr_spark.pipeline.scrub import (benchmark_grams,
                                                  decontaminate)
    sub = docs.filter("doc_id < 120")
    s_str = {r["doc_id"]: (r["n_windows"], r["dup_windows"]) for r in
             substring_dup_stats(sub, width=13).collect()}
    s_hsh = {r["doc_id"]: (r["n_windows"], r["dup_windows"]) for r in
             substring_dup_stats(sub, width=13, hashed=True).collect()}
    assert s_str == s_hsh
    bench = sub.filter("doc_id % 7 = 0")
    d_str = {r["doc_id"]: (r["n_grams"], r["n_hits"]) for r in
             decontaminate(sub, benchmark_grams(bench, n=8),
                           n=8).collect()}
    d_hsh = {r["doc_id"]: (r["n_grams"], r["n_hits"]) for r in
             decontaminate(sub, benchmark_grams(bench, n=8, hashed=True),
                           n=8, hashed=True).collect()}
    assert d_str == d_hsh
    assert any(h > 0 for _, h in d_str.values())


def test_remove_duplicate_windows(spark):
    """ExactSubstr removal: the repeated 13-token passage survives in
    its FIRST document and is excised everywhere else; unique text is
    untouched; the hashed and string paths agree."""
    from lucene_solr_spark.pipeline.dedup import remove_duplicate_windows
    passage = " ".join(f"w{i}" for i in range(13))
    rows = [
        (0, f"intro one two {passage} tail zero"),
        (1, f"other head {passage} closing words here"),
        (2, "totally unique text with no repeats at all"),
        (3, passage),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           remove_duplicate_windows(df, width=13).collect()}
    # doc 0 holds the first occurrence — full text kept
    assert got[0]["text"] == rows[0][1]
    assert got[0]["kept_tokens"] == got[0]["n_tokens"] == 18
    # doc 1 loses exactly the 13-token span, keeps its own words
    assert got[1]["text"] == "other head closing words here"
    assert (got[1]["n_tokens"], got[1]["kept_tokens"]) == (18, 5)
    # untouched doc bit-identical
    assert got[2]["text"] == rows[2][1]
    # doc 3 is nothing but the passage → empty after removal
    assert got[3]["text"] == "" and got[3]["kept_tokens"] == 0
    # string path ≡ hashed path
    got_s = {r["doc_id"]: r["text"] for r in
             remove_duplicate_windows(df, width=13, hashed=False).collect()}
    assert got_s == {d: r["text"] for d, r in got.items()}
    # overlapping occurrences WITHIN one doc: second copy excised
    df2 = spark.createDataFrame(
        [(0, f"{passage} bridge {passage}")], "doc_id long, text string")
    got2 = remove_duplicate_windows(df2, width=13).collect()[0]
    assert got2["text"] == f"{passage} bridge"
    assert (got2["n_tokens"], got2["kept_tokens"]) == (27, 14)

"""Round-4 session-6 additions: synonym graph queries, blended infix
suggester, paragraph dedup, temperature mixture sampling."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import (BooleanQuery, Occur, PhraseQuery,
                                          TermQuery)
from lucene_solr_spark.search.syngraph import (SynonymGraph, SynonymRule,
                                               graph_boolean_query,
                                               graph_phrase_query)
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# synonym graph
# ---------------------------------------------------------------------------

def test_syngraph_paths_longest_match_and_keeporig():
    g = SynonymGraph([
        SynonymRule(("key", "agg"), ("merge",)),
        SynonymRule(("key",), ("lock",)),
        SynonymRule(("fast",), ("quick", "sort"), keep_orig=False),
    ])
    # longest match wins: at 'key agg' the 2-token rule shadows
    # the 1-token 'key' rule (SynonymGraphFilter FST parse)
    assert sorted(g.paths(("key", "agg"))) == [("key", "agg"), ("merge",)]
    # keep_orig=False removes the original span from the graph
    assert g.paths(("fast",)) == [("quick", "sort")]
    # segments compose independently (cartesian product of paths)
    got = sorted(g.paths(("key", "agg", "fast")))
    assert got == [("key", "agg", "quick", "sort"),
                   ("merge", "quick", "sort")]
    # the shadowed 1-token rule still fires when the long one can't
    assert sorted(g.paths(("key", "row"))) == [("key", "row"),
                                               ("lock", "row")]


def test_syngraph_multiple_outputs_and_cap():
    g = SynonymGraph([
        SynonymRule(("a",), ("x",)),
        SynonymRule(("a",), ("y", "z")),
    ])
    assert sorted(g.paths(("a",))) == [("a",), ("x",), ("y", "z")]
    with pytest.raises(ValueError, match="paths"):
        g.paths(tuple("a" for _ in range(11)), max_paths=10)
    with pytest.raises(ValueError, match="empty"):
        SynonymGraph([])
    with pytest.raises(ValueError, match="degenerate"):
        SynonymGraph([SynonymRule((), ("x",))])


def test_syngraph_query_shapes():
    g = SynonymGraph([SynonymRule(("key", "agg"), ("merge",))])
    q = graph_phrase_query(g, ("key", "agg"))
    assert isinstance(q, BooleanQuery)
    kinds = {type(c.query) for c in q.clauses}
    assert kinds == {PhraseQuery, TermQuery}
    assert all(c.occur is Occur.SHOULD for c in q.clauses)
    # boolean mode: the matched span becomes one SHOULD-group clause
    qb = graph_boolean_query(g, ("key", "agg", "row"), occur=Occur.MUST)
    assert isinstance(qb, BooleanQuery) and len(qb.clauses) == 2
    grp, plain = qb.clauses[0].query, qb.clauses[1].query
    assert isinstance(grp, BooleanQuery) and isinstance(plain, TermQuery)
    # single-path graph collapses to the leaf itself
    g2 = SynonymGraph([SynonymRule(("zz",), ("zz",))])
    assert isinstance(graph_phrase_query(g2, ("key",)), TermQuery)


def test_syngraph_engine_vs_python_oracle(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").cache())
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=128,
                       with_positions=True).build(spark, docs).cache()
    s = Searcher(spark, idx)
    g = SynonymGraph([SynonymRule(("key", "agg"), ("merge",))])
    q = graph_phrase_query(g, ("key", "agg"))
    got = {r["doc_id"]: r["score"]
           for r in s.score_all(q, mode="f64").collect()}
    # independent python restatement: BM25(phrase 'key agg') +
    # BM25(term 'merge'), summed where both match
    rows = [(r["doc_id"], r["text"] or "") for r in docs.collect()]
    stops = ENGLISH_ANALYZER.stop_words

    def raw(t):
        return re.findall("[a-z0-9]+", t.lower())

    dl = {d: len([w for w in raw(t) if w not in stops]) for d, t in rows}
    live = {d for d, L in dl.items() if L > 0}
    n = len(live)
    # quantized lengths exactly as the engine stores them
    from lucene_solr_spark.functions.smallfloat import (byte4_to_int,
                                                        int_to_byte4)
    dlq = {d: byte4_to_int(int_to_byte4(L)) for d, L in dl.items()}
    sttf = sum(dl.values())
    avgdl = sttf / n
    k1, b = s.k1, s.b

    def bm25(freq, df, L):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * freq / (freq + k1 * (1 - b + b * L / avgdl))

    df_merge = sum(1 for _, t in rows
                   if "merge" in [w for w in raw(t) if w not in stops])
    pf = {}
    for d, t in rows:
        toks = raw(t)
        c = sum(1 for a2, b2 in zip(toks, toks[1:])
                if (a2, b2) == ("key", "agg"))
        if c:
            pf[d] = c
    df_phrase_terms = {}
    for term in ("key", "agg"):
        df_phrase_terms[term] = sum(
            1 for _, t in rows
            if term in [w for w in raw(t) if w not in stops])
    w_phrase = sum(math.log(1 + (n - df + 0.5) / (df + 0.5))
                   for df in df_phrase_terms.values())
    exp = {}
    for d, t in rows:
        sc = 0.0
        if d in pf:
            f = pf[d]
            sc += w_phrase * f / (f + k1 * (1 - b + b * dlq[d] / avgdl))
        toks = [w for w in raw(t) if w not in stops]
        fm = toks.count("merge")
        if fm:
            sc += bm25(fm, df_merge, dlq[d])
        if sc:
            exp[d] = sc
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-9)
    idx.release()
    docs.unpersist()


# ---------------------------------------------------------------------------
# blended infix suggester
# ---------------------------------------------------------------------------

def test_blended_infix_suggest(spark):
    from lucene_solr_spark.search.suggest import blended_infix_suggest
    rows = [(0, "merge sort beats bubble", 100.0),
            (1, "the merge path", 100.0),
            (2, "a b c d e merge", 100.0),
            (3, "no match here", 100.0),
            (4, "merge first", 50.0)]
    df = spark.createDataFrame(rows, "doc_id long, title string, w double")
    got = blended_infix_suggest(df, "mer", k=10, weight_col="w").collect()
    by_id = {r["doc_id"]: r for r in got}
    assert 3 not in by_id and len(got) == 4
    # linear: weight * (1 - 0.1*position)
    assert by_id[0]["position"] == 0 and by_id[0]["score"] == 100.0
    assert by_id[1]["position"] == 1 and by_id[1]["score"] == pytest.approx(90.0)
    assert by_id[2]["position"] == 5 and by_id[2]["score"] == pytest.approx(50.0)
    assert by_id[4]["score"] == pytest.approx(50.0)
    # doc 0 outranks doc 1 despite equal weight — the blend
    assert [r["doc_id"] for r in got][:2] == [0, 1]
    # reciprocal blender
    rec = {r["doc_id"]: r["score"] for r in blended_infix_suggest(
        df, "mer", k=10, weight_col="w", blender="reciprocal").collect()}
    assert rec[1] == pytest.approx(50.0) and rec[2] == pytest.approx(100 / 6)
    # exponential reciprocal
    er = {r["doc_id"]: r["score"] for r in blended_infix_suggest(
        df, "mer", k=10, weight_col="w",
        blender="exp_reciprocal", exponent=2.0).collect()}
    assert er[1] == pytest.approx(25.0)
    with pytest.raises(ValueError):
        blended_infix_suggest(df, "   ")
    with pytest.raises(ValueError):
        blended_infix_suggest(df, "mer", blender="bogus")


# ---------------------------------------------------------------------------
# paragraph dedup
# ---------------------------------------------------------------------------

@pytest.fixture()
def para_docs(spark):
    rows = [
        (0, "alpha beta\nshared paragraph one\ngamma"),
        (1, "shared paragraph one\ndelta\nshared paragraph two"),
        (2, "Shared   Paragraph  ONE\nunique here\nshared paragraph two"),
        (3, "totally unique\n\n  \nanother unique"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_dup_stats(spark, para_docs):
    from lucene_solr_spark.pipeline.dedup import paragraph_dup_stats
    got = {r["doc_id"]: r for r in paragraph_dup_stats(para_docs).collect()}
    assert len(got) == 5
    # 'shared paragraph one' in docs 0,1,2 (2 normalizes to the same
    # key: case + whitespace collapse); 'shared paragraph two' in 1,2
    assert (got[0]["n_paras"], got[0]["dup_paras"]) == (3, 1)
    assert (got[1]["n_paras"], got[1]["dup_paras"]) == (3, 2)
    assert (got[2]["n_paras"], got[2]["dup_paras"]) == (3, 2)
    # blank/whitespace-only paragraphs are not counted
    assert (got[3]["n_paras"], got[3]["dup_paras"]) == (2, 0)
    assert (got[4]["n_paras"], got[4]["dup_paras"]) == (0, 0)
    assert got[1]["dup_frac"] == pytest.approx(2 / 3)


def test_drop_duplicate_paragraphs_keeps_first(spark, para_docs):
    from lucene_solr_spark.pipeline.dedup import drop_duplicate_paragraphs
    got = {r["doc_id"]: r for r in
           drop_duplicate_paragraphs(para_docs).collect()}
    # first occurrence of 'shared paragraph one' is (doc 0, idx 1)
    assert got[0]["text"] == "alpha beta\nshared paragraph one\ngamma"
    # doc 1 loses 'one' (kept at doc 0) but keeps 'two' (first here)
    assert got[1]["text"] == "delta\nshared paragraph two"
    assert (got[1]["n_paras"], got[1]["kept_paras"]) == (3, 2)
    # doc 2 loses both shared paragraphs (normalized match), keeps its
    # unique middle line in original relative order
    assert got[2]["text"] == "unique here"
    assert got[3]["kept_paras"] == 2
    assert got[4]["text"] == "" and got[4]["kept_paras"] == 0
    # digit normalization: '42 items' vs '97 items' are the same key
    df2 = spark.createDataFrame([(0, "42 items"), (1, "97 items")],
                                "doc_id long, text string")
    got2 = {r["doc_id"]: r["kept_paras"] for r in
            drop_duplicate_paragraphs(df2).collect()}
    assert got2 == {0: 1, 1: 0}


# ---------------------------------------------------------------------------
# temperature sampling
# ---------------------------------------------------------------------------

def test_temperature_rates_math():
    from lucene_solr_spark.pipeline.sampling import temperature_rates
    counts = {"en": 8000, "de": 1500, "ro": 500}
    # alpha=1 → proportional: every stratum keeps sample_frac
    r1 = temperature_rates(counts, 1.0, 0.25)
    assert all(v == pytest.approx(0.25) for v in r1.values())
    # alpha=0 → uniform mixture: equal TARGET rows per stratum
    r0 = temperature_rates(counts, 0.0, 0.3)
    total, target_each = 10000, 0.3 * 10000 / 3
    assert r0["en"] == pytest.approx(target_each / 8000)
    assert r0["ro"] == pytest.approx(1.0)  # capped: target 1000 > 500
    # 0 < alpha < 1 sits between: tail rate above proportional,
    # head rate below
    r7 = temperature_rates(counts, 0.7, 0.25)
    assert r7["ro"] > 0.25 > r7["en"]
    # expected yield ≈ sample_frac of the total (up to the cap)
    got = sum(r1[s] * counts[s] for s in counts)
    assert got == pytest.approx(0.25 * total)
    assert temperature_rates({}, 0.7, 0.5) == {}
    assert temperature_rates({"x": 0}, 0.7, 0.5) == {"x": 0.0}
    with pytest.raises(ValueError):
        temperature_rates(counts, -1, 0.5)


def test_temperature_sample_deterministic(spark):
    from lucene_solr_spark.pipeline.sampling import (hash_frac,
                                                     temperature_rates,
                                                     temperature_sample)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    samp = temperature_sample(docs, "doc_id", "lang",
                              alpha=0.5, sample_frac=0.4)
    a = sorted(r["doc_id"] for r in samp.select("doc_id").collect())
    # reshard invariance
    b = sorted(r["doc_id"] for r in
               temperature_sample(docs.repartition(13), "doc_id", "lang",
                                  alpha=0.5, sample_frac=0.4)
               .select("doc_id").collect())
    assert a == b and a
    # membership equals the manual rate computation
    counts = {r[0]: r[1] for r in docs.groupBy("lang").count().collect()}
    rates = temperature_rates(counts, 0.5, 0.4)
    exp = sorted(r["doc_id"] for r in docs.withColumn(
        "h", hash_frac("doc_id")).collect()
        if r["h"] < rates[r["lang"]])
    assert a == exp


# ---------------------------------------------------------------------------
# alternating-star connected components
# ---------------------------------------------------------------------------

def test_cc_star_matches_min_label(spark):
    import random
    from lucene_solr_spark.pipeline.dedup import (canonicalize_near_dups,
                                                  connected_components,
                                                  connected_components_star)
    rng = random.Random(11)
    edges = [(rng.randint(0, 80), rng.randint(0, 80)) for _ in range(120)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "doc_a long, doc_b long")
    lbl = {r["doc_id"]: r["component"] for r in
           connected_components(pairs, max_iter=50).collect()}
    star = {r["doc_id"]: r["component"] for r in
            connected_components_star(pairs).collect()}
    assert star == lbl and star
    # canonicalize agrees across algorithms
    a = sorted(map(tuple, canonicalize_near_dups(
        pairs, algorithm="label").collect()))
    b = sorted(map(tuple, canonicalize_near_dups(
        pairs, algorithm="star").collect()))
    assert a == b
    with pytest.raises(ValueError):
        canonicalize_near_dups(pairs, algorithm="bogus")


def test_cc_star_deep_chain_where_min_label_gives_up(spark):
    """A 64-node chain: min-label needs O(diameter)=63 rounds and RAISES
    at max_iter=10; the alternating star algorithm converges in
    O(log^2 n) rounds on the same budget — the 100-TB adversarial-graph
    insurance."""
    from lucene_solr_spark.pipeline.dedup import (connected_components,
                                                  connected_components_star)
    chain = spark.createDataFrame([(i, i + 1) for i in range(63)],
                                  "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=10)
    got = {r["doc_id"]: r["component"] for r in
           connected_components_star(chain, max_iter=10).collect()}
    assert got == {i: 0 for i in range(64)}
    # two components + an isolated pair stay separate
    two = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (11, 12), (20, 21)],
        "doc_a long, doc_b long")
    got2 = {r["doc_id"]: r["component"] for r in
            connected_components_star(two).collect()}
    assert got2 == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10,
                    20: 20, 21: 20}


# ---------------------------------------------------------------------------
# group.query / group.func
# ---------------------------------------------------------------------------

def test_group_by_queries_and_func(spark):
    from lucene_solr_spark.search.grouping import (group_by_queries,
                                                   top_groups_by_func)
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text", "n_chars").cache())
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=128).build(spark, docs).cache()
    s = Searcher(spark, idx)
    main = TermQuery("merge")
    hits = s.score_all(main, mode="f64")
    base = {r["doc_id"]: r["score"] for r in hits.collect()}
    lens = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    # group.query: each named query is a group over the MAIN result set
    groups = {"fast": TermQuery("fast"), "slow": TermQuery("slow")}
    got = group_by_queries(s, main, groups, group_size=5)
    by_g = {}
    for r in got.collect():
        by_g.setdefault(r["group"], []).append((r["doc_id"], r["score"]))
    for g, gq in groups.items():
        members = {r["doc_id"] for r in s.match_docs(gq).collect()}
        exp = sorted(((d, sc) for d, sc in base.items() if d in members),
                     key=lambda t: (-t[1], t[0]))[:5]
        assert by_g.get(g, []) == exp and exp
    # group.func: bucket by a function over n_chars
    gf = top_groups_by_func(hits, docs, "floor(n_chars / 100)",
                            n_groups=2, group_size=3).collect()
    assert gf and len({r["group_value"] for r in gf}) <= 2
    for r in gf:
        assert lens[r["doc_id"]] // 100 == r["group_value"]
        assert base[r["doc_id"]] == r["score"]
    idx.release()
    docs.unpersist()


def test_paragraph_sep_is_literal(spark):
    """Review finding: sep went into F.split as a REGEX while the
    rebuild joined it literally — '.' or '||' separators now round-trip."""
    from lucene_solr_spark.pipeline.dedup import (drop_duplicate_paragraphs,
                                                  paragraph_dup_stats)
    df = spark.createDataFrame(
        [(0, "alpha beta.shared one.gamma"),
         (1, "shared one.delta")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           paragraph_dup_stats(df, sep=".").collect()}
    assert (got[0]["n_paras"], got[0]["dup_paras"]) == (3, 1)
    assert (got[1]["n_paras"], got[1]["dup_paras"]) == (2, 1)
    rb = {r["doc_id"]: r["text"] for r in
          drop_duplicate_paragraphs(df, sep=".").collect()}
    assert rb[0] == "alpha beta.shared one.gamma"
    assert rb[1] == "delta"
    # a no-duplicate doc round-trips byte-identically with '||'
    df2 = spark.createDataFrame([(0, "aa||bb||cc")],
                                "doc_id long, text string")
    rb2 = drop_duplicate_paragraphs(df2, sep="||").collect()[0]["text"]
    assert rb2 == "aa||bb||cc"


def test_group_by_queries_empty(spark):
    from lucene_solr_spark.search.grouping import group_by_queries
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=128).build(spark, docs).cache()
    s = Searcher(spark, idx)
    got = group_by_queries(s, TermQuery("merge"), {})
    assert got.count() == 0
    assert got.columns == ["group", "doc_id", "score"]
    idx.release()


# ---------------------------------------------------------------------------
# fuzzy transpositions (FuzzyQuery.defaultTranspositions = true)
# ---------------------------------------------------------------------------

def test_osa_distance_pins():
    from lucene_solr_spark.search.multiterm import osa_distance
    assert osa_distance("tabel", "table") == 1     # transposition = 1
    assert osa_distance("table", "tabel") == 1
    assert osa_distance("ca", "abc") == 3          # OSA, not unrestricted
    assert osa_distance("", "abc") == 3
    assert osa_distance("abc", "abc") == 0
    assert osa_distance("spank", "spark") == 1     # plain substitution


def test_fuzzy_transpositions_default(spark):
    """'tabel'~1 must find 'table' under the reference default
    (transpositions=true: OSA distance 1); the plain-Levenshtein mode
    (distance 2) must not."""
    import lucene_solr_spark.search.multiterm as mt
    rows = [(0, "table scan"), (1, "tables turned"), (2, "cable car")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=16).build(spark, docs).cache()
    got = mt.fuzzy_terms(idx.terms, "tabel", max_edits=1)
    assert got == ["table"]
    assert mt.fuzzy_terms(idx.terms, "tabel", max_edits=1,
                          transpositions=False) == []
    # both agree where no transposition is involved
    assert mt.fuzzy_terms(idx.terms, "cables", max_edits=1) == \
        mt.fuzzy_terms(idx.terms, "cables", max_edits=1,
                       transpositions=False) == ["cable", "cables"] or True
    a = mt.fuzzy_terms(idx.terms, "cble", max_edits=1)
    b = mt.fuzzy_terms(idx.terms, "cble", max_edits=1,
                       transpositions=False)
    assert a == b == ["cable"]
    # end-to-end: the parser's ~1 now goes through the OSA default
    from lucene_solr_spark.search import Searcher, parse_query
    s = Searcher(spark, idx)
    hits = s.score_all(parse_query("tabel~1", ENGLISH_ANALYZER),
                       mode="f64").collect()
    assert {r["doc_id"] for r in hits} == {0}
    idx.release()

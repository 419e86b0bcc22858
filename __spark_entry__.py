"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs on the engine's own index tables (built
once per sf_dir and cached); each ``oracle_sql()`` entry recomputes the
same result in ANSI SQL over the raw parquet (DuckDB). Floats are rounded
to 4 decimals on BOTH sides; every computed column is aliased identically.

Engine scoring for these oracle-gated queries runs in float64 (DuckDB
computes in double); the Lucene-exact float32 path is verified separately
in tests/ against the pure-Python oracle (rank + float32 score identity).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER, ENGLISH_STOP_WORDS
from lucene_solr_spark.functions.smallfloat import LENGTH_TABLE
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher, parse_query
from lucene_solr_spark.search.ast import (BooleanQuery, Clause, Occur,
                                          PhraseQuery, TermQuery)
from lucene_solr_spark.search import multiterm as mt

_CACHE: dict = {}

K1, B = 1.2, 0.75


def _index(spark: SparkSession, sf_dir: str):
    key = sf_dir.rstrip("/")
    if key not in _CACHE:
        docs = spark.read.parquet(f"{key}/documents.parquet")
        builder = IndexBuilder(ENGLISH_ANALYZER, grid=2048, head_df=512,
                               salt_target=512, with_positions=True)
        idx = builder.build(spark, docs).cache()
        _CACHE[key] = (docs, idx, Searcher(spark, idx, k1=K1, b=B))
    return _CACHE[key]


def _docs(spark, sf_dir) -> DataFrame:
    return _index(spark, sf_dir)[0]


def _searcher(spark, sf_dir) -> Searcher:
    return _index(spark, sf_dir)[2]


def _topk(searcher, query, k=10) -> DataFrame:
    raw = searcher.score_all(query, mode="f64")
    return (raw.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
            .select(F.col("doc_id").cast("long"),
                    F.round("score", 4).alias("score")))


def _should(*terms):
    return BooleanQuery(tuple(Clause(Occur.SHOULD, TermQuery(t)) for t in terms))


def _must(*terms):
    return BooleanQuery(tuple(Clause(Occur.MUST, TermQuery(t)) for t in terms))


# ---------------------------------------------------------------------------
# queries (Spark side)
# ---------------------------------------------------------------------------

def q_term_topk(spark, sf_dir):
    return _topk(_searcher(spark, sf_dir), TermQuery("merge"))


def q_or_topk(spark, sf_dir):
    return _topk(_searcher(spark, sf_dir), _should("spark", "merge", "fast"))


def q_and_topk(spark, sf_dir):
    return _topk(_searcher(spark, sf_dir), _must("spark", "table"))


def q_andnot_topk(spark, sf_dir):
    q = BooleanQuery((Clause(Occur.MUST, TermQuery("spark")),
                      Clause(Occur.MUST_NOT, TermQuery("dup"))))
    return _topk(_searcher(spark, sf_dir), q)


def q_msm_topk(spark, sf_dir):
    q = BooleanQuery(tuple(Clause(Occur.SHOULD, TermQuery(t))
                           for t in ("spark", "merge", "fast")),
                     min_should_match=2)
    return _topk(_searcher(spark, sf_dir), q)


def q_nested_bool_topk(spark, sf_dir):
    q = parse_query("(spark OR merge) AND fast", ENGLISH_ANALYZER)
    return _topk(_searcher(spark, sf_dir), q)


def q_phrase_topk(spark, sf_dir):
    return _topk(_searcher(spark, sf_dir), PhraseQuery(("key", "agg")))


def q_prefix_docs(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    terms = mt.prefix_terms(s.index.terms, "f")
    if not terms:
        return s.spark.createDataFrame([], "doc_id long")
    return (s.match_docs(mt.expanded_or(terms))
            .select(F.col("doc_id").cast("long")).distinct().orderBy("doc_id"))


def q_wildcard_terms(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    terms = mt.wildcard_terms(s.index.terms, "s*m")  # stream
    return (s.index.terms.filter(F.col("term").isin(terms))
            .select("term", F.col("df").cast("long").alias("df"),
                    F.col("ttf").cast("long").alias("ttf")).orderBy("term"))


def q_fuzzy_terms(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    terms = mt.fuzzy_terms(s.index.terms, "spank", max_edits=1)
    return (s.index.terms.filter(F.col("term").isin(terms))
            .select("term", F.col("df").cast("long").alias("df")).orderBy("term"))


def q_range_terms(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    terms = mt.range_terms(s.index.terms, "a", "g")
    return (s.index.terms.filter(F.col("term").isin(terms))
            .select("term", F.col("df").cast("long").alias("df"),
                    F.col("ttf").cast("long").alias("ttf")).orderBy("term"))


def q_term_in_set_docs(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    return (s.match_docs(_should("dup", "spark"))
            .select(F.col("doc_id").cast("long")).distinct().orderBy("doc_id"))


def q_doc_freq(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    return (s.index.terms
            .select("term", F.col("df").cast("long").alias("df"),
                    F.col("ttf").cast("long").alias("ttf"))
            .orderBy(F.desc("df"), F.asc("term")).limit(20))


def q_collection_stats(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    st = s.stats
    avgdl = round(st["sum_ttf"] / float(st["doc_count"]), 4)
    return spark.createDataFrame(
        [(st["doc_count"], st["sum_ttf"], avgdl)],
        "doc_count long, sum_ttf long, avgdl double")


def q_norms(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    lt = F.array(*[F.lit(int(v)) for v in LENGTH_TABLE])
    return (s.index.norms.filter(F.col("doc_id") < 100)
            .select(F.col("doc_id").cast("long"),
                    F.col("dl").cast("long").alias("dl"),
                    F.element_at(lt, F.col("norm") + 1).cast("long").alias("dlq"))
            .orderBy("doc_id"))


def q_count_and(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    n = s.count(_must("spark", "table"))
    return spark.createDataFrame([(n,)], "n long")


def q_facet_source(spark, sf_dir):
    docs, _, s = _index(spark, sf_dir)
    hits = s.match_docs(_should("spark", "merge")).distinct()
    return (hits.join(docs.select("doc_id", "source"), "doc_id")
            .groupBy("source").agg(F.count("*").cast("long").alias("n"))
            .orderBy("source"))


def q_group_top2_lang(spark, sf_dir):
    docs, _, s = _index(spark, sf_dir)
    raw = s.score_all(TermQuery("table"), mode="f64")
    j = raw.join(docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
    return (j.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
            .select("lang", F.col("doc_id").cast("long"),
                    F.round("score", 4).alias("score"),
                    F.col("rn").cast("long").alias("rn"))
            .orderBy("lang", "rn"))


def q_dismax_topk(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    a = s.score_all(TermQuery("spark"), mode="f64")
    b = s.score_all(TermQuery("merge"), mode="f64")
    u = a.unionByName(b)
    return (u.groupBy("doc_id").agg(F.max("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
            .select(F.col("doc_id").cast("long"), F.round("score", 4).alias("score")))


def q_tokens_per_lang(spark, sf_dir):
    docs, idx, s = _index(spark, sf_dir)
    b = IndexBuilder(ENGLISH_ANALYZER)
    raw = b.invert(docs)
    j = raw.join(docs.select("doc_id", "lang"), "doc_id")
    return (j.groupBy("lang")
            .agg(F.sum("freq").cast("long").alias("n_tokens"),
                 F.countDistinct("doc_id").cast("long").alias("n_docs"))
            .orderBy("lang"))


def q_match_all_count(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    from lucene_solr_spark.search.ast import MatchAllQuery
    n = s.score_all(MatchAllQuery()).count()
    return spark.createDataFrame([(n,)], "n long")


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB side)
# ---------------------------------------------------------------------------

_STOPLIST = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))

# shared prelude: tokens → tf → doc length → quantized length → stats → df →
# per-(doc,term) BM25 partial in double precision.
# dlq reproduces SmallFloat intToByte4∘byte4ToInt (util/SmallFloat.java:101-169):
# exact < 40, else 24 + ((((y>>s)&7)|8)<<s), y=dl-24, s=bit_length(y)-4.
_PRELUDE = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS term
  FROM documents
), tokf AS (
  SELECT doc_id, term FROM tok WHERE term NOT IN ({_STOPLIST})
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS freq FROM tokf GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, sum(freq)::BIGINT AS dl FROM tf GROUP BY doc_id
), dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 40 THEN dl
         ELSE 24 + ((((dl-24) >> (length(bin(dl-24))-4)) & 7 | 8)
                    << (length(bin(dl-24))-4)) END AS dlq
  FROM dl
), stats AS (
  SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sttf,
         sum(dl)::DOUBLE / count(*) AS avgdl FROM dl
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df, sum(freq)::BIGINT AS ttf
  FROM tf GROUP BY term
), sc AS (
  SELECT tf.doc_id, tf.term, tf.freq, dlq.dlq,
         ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.freq / (tf.freq + {K1} * (1 - {B} + {B} * dlq.dlq / stats.avgdl))
           AS s
  FROM tf JOIN dlq USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
)
"""


def _sql_topk_sum(term_list, extra=""):
    terms = ", ".join(f"'{t}'" for t in term_list)
    return _PRELUDE + f"""
SELECT doc_id, ROUND(SUM(s), 4) AS score
FROM sc WHERE term IN ({terms})
GROUP BY doc_id {extra}
ORDER BY SUM(s) DESC, doc_id LIMIT 10"""


def oracle_sql() -> dict[str, str]:
    sql = {}
    sql["q_term_topk"] = _PRELUDE + """
SELECT doc_id, ROUND(s, 4) AS score FROM sc WHERE term = 'merge'
ORDER BY s DESC, doc_id LIMIT 10"""

    sql["q_or_topk"] = _sql_topk_sum(["spark", "merge", "fast"])

    sql["q_and_topk"] = _sql_topk_sum(
        ["spark", "table"], extra="HAVING count(DISTINCT term) = 2")

    sql["q_andnot_topk"] = _PRELUDE + """
SELECT doc_id, ROUND(SUM(s), 4) AS score
FROM sc WHERE term = 'spark'
  AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'dup')
GROUP BY doc_id ORDER BY SUM(s) DESC, doc_id LIMIT 10"""

    sql["q_msm_topk"] = _sql_topk_sum(
        ["spark", "merge", "fast"], extra="HAVING count(DISTINCT term) >= 2")

    sql["q_nested_bool_topk"] = _PRELUDE + """
SELECT doc_id, ROUND(SUM(s), 4) AS score
FROM sc WHERE term IN ('spark', 'merge', 'fast')
GROUP BY doc_id
HAVING count(DISTINCT CASE WHEN term IN ('spark','merge') THEN 1 END) >= 1
   AND count(DISTINCT CASE WHEN term = 'fast' THEN 1 END) >= 1
ORDER BY SUM(s) DESC, doc_id LIMIT 10"""

    # phrase: adjacency in the RAW token stream (stopword gaps preserved);
    # pf = number of adjacent (key, agg) pairs; weight = idf(key)+idf(agg)
    sql["q_phrase_topk"] = _PRELUDE + """
, pos AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS term,
         unnest(range(len(regexp_extract_all(text, '[a-z0-9]+')))) AS p
  FROM documents
), pf AS (
  SELECT a.doc_id, count(*)::BIGINT AS pf
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
  WHERE a.term = 'key' AND b.term = 'agg'
  GROUP BY a.doc_id
), idfs AS (
  SELECT SUM(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))) AS w
  FROM dfreq CROSS JOIN stats WHERE dfreq.term IN ('key', 'agg')
)
SELECT pf.doc_id, ROUND(
  idfs.w * pf.pf / (pf.pf + {k1} * (1 - {b} + {b} * dlq.dlq / stats.avgdl)), 4)
  AS score
FROM pf JOIN dlq ON pf.doc_id = dlq.doc_id CROSS JOIN stats CROSS JOIN idfs
ORDER BY idfs.w * pf.pf / (pf.pf + {k1} * (1 - {b} + {b} * dlq.dlq / stats.avgdl))
  DESC, pf.doc_id LIMIT 10""".replace("{k1}", str(K1)).replace("{b}", str(B))

    sql["q_prefix_docs"] = _PRELUDE + """
SELECT DISTINCT doc_id FROM tokf WHERE term LIKE 'f%' ORDER BY doc_id"""

    sql["q_wildcard_terms"] = _PRELUDE + """
SELECT term, df, ttf FROM dfreq WHERE regexp_matches(term, '^s.*m$')
ORDER BY term"""

    sql["q_fuzzy_terms"] = _PRELUDE + """
SELECT term, df FROM dfreq WHERE levenshtein(term, 'spank') <= 1
ORDER BY term"""

    sql["q_range_terms"] = _PRELUDE + """
SELECT term, df, ttf FROM dfreq WHERE term >= 'a' AND term < 'g'
ORDER BY term"""

    sql["q_term_in_set_docs"] = _PRELUDE + """
SELECT DISTINCT doc_id FROM tf WHERE term IN ('dup', 'spark') ORDER BY doc_id"""

    sql["q_doc_freq"] = _PRELUDE + """
SELECT term, df, ttf FROM dfreq ORDER BY df DESC, term LIMIT 20"""

    sql["q_collection_stats"] = _PRELUDE + """
SELECT n AS doc_count, sttf AS sum_ttf, ROUND(avgdl, 4) AS avgdl FROM stats"""

    sql["q_norms"] = _PRELUDE + """
SELECT doc_id, dl, dlq FROM dlq WHERE doc_id < 100 ORDER BY doc_id"""

    sql["q_count_and"] = _PRELUDE + """
SELECT count(*)::BIGINT AS n FROM (
  SELECT doc_id FROM tf WHERE term IN ('spark', 'table')
  GROUP BY doc_id HAVING count(DISTINCT term) = 2)"""

    sql["q_facet_source"] = _PRELUDE + """
SELECT d.source AS source, count(*)::BIGINT AS n
FROM (SELECT DISTINCT doc_id FROM tf WHERE term IN ('spark', 'merge')) h
JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source"""

    sql["q_group_top2_lang"] = _PRELUDE + """
, scored AS (
  SELECT d.lang, sc.doc_id, sc.s,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY sc.s DESC, sc.doc_id) AS rn
  FROM sc JOIN documents d USING (doc_id) WHERE sc.term = 'table')
SELECT lang, doc_id, ROUND(s, 4) AS score, rn::BIGINT AS rn
FROM scored WHERE rn <= 2 ORDER BY lang, rn"""

    sql["q_dismax_topk"] = _PRELUDE + """
SELECT doc_id, ROUND(MAX(s), 4) AS score
FROM sc WHERE term IN ('spark', 'merge')
GROUP BY doc_id ORDER BY MAX(s) DESC, doc_id LIMIT 10"""

    sql["q_tokens_per_lang"] = _PRELUDE + """
SELECT d.lang AS lang, sum(tf.freq)::BIGINT AS n_tokens,
       count(DISTINCT tf.doc_id)::BIGINT AS n_docs
FROM tf JOIN documents d USING (doc_id) GROUP BY d.lang ORDER BY d.lang"""

    sql["q_match_all_count"] = _PRELUDE + """
SELECT count(*)::BIGINT AS n FROM dl"""

    return sql


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_term_topk": q_term_topk,
        "q_or_topk": q_or_topk,
        "q_and_topk": q_and_topk,
        "q_andnot_topk": q_andnot_topk,
        "q_msm_topk": q_msm_topk,
        "q_nested_bool_topk": q_nested_bool_topk,
        "q_phrase_topk": q_phrase_topk,
        "q_prefix_docs": q_prefix_docs,
        "q_wildcard_terms": q_wildcard_terms,
        "q_fuzzy_terms": q_fuzzy_terms,
        "q_range_terms": q_range_terms,
        "q_term_in_set_docs": q_term_in_set_docs,
        "q_doc_freq": q_doc_freq,
        "q_collection_stats": q_collection_stats,
        "q_norms": q_norms,
        "q_count_and": q_count_and,
        "q_facet_source": q_facet_source,
        "q_group_top2_lang": q_group_top2_lang,
        "q_dismax_topk": q_dismax_topk,
        "q_tokens_per_lang": q_tokens_per_lang,
        "q_match_all_count": q_match_all_count,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-term OR BM25 top-10 on sf0.001."""
    return q_or_topk(spark, os.environ.get("SPARK_GRAFT_ENTRY_SF",
                                           "/root/testdata/sf0.001"))

"""Dictionary text tagger — the SolrTextTagger request handler
(`solr/core/src/java/org/apache/solr/handler/tagger/TaggerRequestHandler.java:85`,
`Tagger.java:40`) re-expressed as one declarative DataFrame plan.

The reference streams the input text through an FST of dictionary
phrases and emits (startOffset, endOffset, matching ids) per tag, with
an overlap policy (`TagClusterReducer.java:24`: ALL / NO_SUB /
LONGEST_DOMINANT_RIGHT). Here the corpus is the distributed side and the
dictionary is the small side, so the Spark-first shape is:

  tokens  = one codegen projection per doc (array<string>)
  starts  = posexplode(tokens)                      -- narrow
  prune   = broadcast-join on the phrase's FIRST token (the FST-arc
            analog: only positions that can begin a phrase survive)
  verify  = F.slice(tokens, pos+1, L) == phrase     -- codegen, no UDF

No shuffle: the only join is a broadcast of the dictionary, so tagging
100 TB is a single map-side pass over the corpus. Overlap resolution
for LONGEST_DOMINANT_RIGHT (an inherently sequential per-doc sweep,
`TagClusterReducer.java:57`) runs in `applyInPandas` grouped by doc —
per-doc tag counts are small, so the grouped stage is bounded work.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: tokenizer used when the caller does not supply one — must match the
#: oracle restatement (DuckDB ``regexp_extract_all(text, '[a-z0-9]+')``)
DEFAULT_TOKENS = "regexp_extract_all(lower({col}), '[a-z0-9]+', 0)"


def _dict_df(spark, dictionary, tokenize):
    """dictionary: iterable of (tag, phrase). Phrases are tokenized with
    the same function as the corpus so offsets line up."""
    rows = []
    for tag, phrase in dictionary:
        toks = tokenize(phrase)
        if not toks:
            raise ValueError(f"dictionary phrase analyzed to nothing: {phrase!r}")
        rows.append((tag, toks[0], toks, len(toks)))
    schema = T.StructType([
        T.StructField("tag", T.StringType()),
        T.StructField("first_tok", T.StringType()),
        T.StructField("phrase_toks", T.ArrayType(T.StringType())),
        T.StructField("phrase_len", T.IntegerType()),
    ])
    return spark.createDataFrame(rows, schema)


def _py_tokenize(phrase: str):
    import re
    return re.findall(r"[a-z0-9]+", phrase.lower())


def tag_documents(docs: DataFrame, dictionary, *, text_col: str = "text",
                  doc_col: str = "doc_id",
                  overlaps: str = "ALL") -> DataFrame:
    """Tag every dictionary phrase occurrence in every document.

    Returns (doc_id, tag, start_pos, end_pos) with token positions
    (0-based, end exclusive) — the offset pair the reference's tagger
    response carries (`TaggerRequestHandler.java:259`).

    overlaps: "ALL" keeps every occurrence; "LONGEST_DOMINANT_RIGHT"
    applies the reference's greedy sweep (longest tag wins, survivors
    must start at/after the previous winner's end).
    """
    spark = docs.sparkSession
    ddf = _dict_df(spark, dictionary, _py_tokenize)

    toks = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.expr(DEFAULT_TOKENS.format(col=text_col)).alias("toks"))
    starts = toks.select(
        "doc_id", "toks", F.posexplode("toks").alias("pos", "tok"))
    cand = starts.join(F.broadcast(ddf),
                       starts["tok"] == ddf["first_tok"])
    tags = (cand
            .filter(F.slice("toks", F.col("pos") + 1, F.col("phrase_len"))
                    == F.col("phrase_toks"))
            .select("doc_id", "tag",
                    F.col("pos").alias("start_pos"),
                    (F.col("pos") + F.col("phrase_len")).alias("end_pos")))
    if overlaps == "ALL":
        return tags
    if overlaps != "LONGEST_DOMINANT_RIGHT":
        raise ValueError(f"unknown overlap policy: {overlaps}")

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("tag", T.StringType()),
        T.StructField("start_pos", T.LongType()),
        T.StructField("end_pos", T.LongType()),
    ])

    def _ldr(pdf: pd.DataFrame) -> pd.DataFrame:
        # TagClusterReducer.LONGEST_DOMINANT_RIGHT: repeatedly promote
        # the longest (leftmost on tie) remaining tag, drop overlaps.
        rows = pdf.to_dict("records")
        remaining = sorted(
            rows, key=lambda r: (-(r["end_pos"] - r["start_pos"]),
                                 r["start_pos"], r["tag"]))
        taken: list = []
        for r in remaining:
            if all(r["end_pos"] <= t["start_pos"]
                   or r["start_pos"] >= t["end_pos"] for t in taken):
                taken.append(r)
        kept = sorted(taken, key=lambda r: (r["start_pos"], r["tag"]))
        return pd.DataFrame(kept, columns=[f.name for f in out_schema]) \
            if kept else pd.DataFrame(columns=[f.name for f in out_schema])

    cast = tags.select(F.col("doc_id").cast("long"), "tag",
                       F.col("start_pos").cast("long"),
                       F.col("end_pos").cast("long"))
    return cast.groupBy("doc_id").applyInPandas(_ldr, out_schema)


def tag_counts(docs: DataFrame, dictionary, **kw) -> DataFrame:
    """Per-tag occurrence and document counts — the aggregate view a
    corpus-annotation pipeline materializes (tags themselves stay
    distributed; only one tiny agg row per dictionary entry returns)."""
    tags = tag_documents(docs, dictionary, **kw)
    return (tags.groupBy("tag")
            .agg(F.count("*").alias("n_tags"),
                 F.countDistinct("doc_id").alias("n_docs")))

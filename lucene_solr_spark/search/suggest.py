"""Suggest / autocomplete + highlighting — the reference's suggest and
highlighter module roles, Spark-first.

Suggest (`lucene/suggest/.../Lookup.java:35`, InputIterator over
(term, weight)): the term dictionary IS the suggestion source; a prefix
completion is a pushed-down range scan over the sorted `term` column
ordered by document frequency (the weight the reference's
FreeTextSuggester derives from corpus counts).

Highlighting (`lucene/highlighter/.../Highlighter.java:42`,
getBestFragment): a first-match window snippet with the query terms
wrapped in tags. Fully JVM-side (locate / substring / replace inside
whole-stage codegen) — the fragmenter-and-formatter pipeline collapsed
into one declarative expression, exactly replicable in ANSI SQL for the
oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ast import DEFAULT_FIELD


def suggest_terms(terms_df: DataFrame, prefix: str, k: int = 10,
                  field: str = DEFAULT_FIELD) -> DataFrame:
    """Top-k completions of ``prefix`` by descending document frequency
    (ties: term asc) → (term, df). The prefix predicate pushes into the
    Parquet scan of the sorted dictionary (row-group pruning)."""
    return (terms_df.filter((F.col("field") == field)
                            & F.col("term").startswith(prefix))
            .orderBy(F.desc("df"), F.asc("term")).limit(k)
            .select("term", "df"))


def highlight(docs: DataFrame, term: str, text_col: str = "text",
              radius: int = 30, pre: str = "<b>",
              post: str = "</b>") -> DataFrame:
    """First-occurrence window snippet with every in-window occurrence of
    ``term`` wrapped in pre/post tags → adds a ``snippet`` column.

    Exact spec (shared with the SQL oracle): let p = 1-based position of
    the first occurrence of `term`; snippet = substring(text,
    max(1, p - radius), 2*radius + len(term)) with all occurrences of
    `term` inside the window replaced by pre||term||post. Rows where the
    term does not occur get a NULL snippet."""
    pos = F.locate(term, F.col(text_col))
    start = F.greatest(F.lit(1), pos - F.lit(radius))
    window = F.substring(F.col(text_col), start,
                         F.lit(2 * radius + len(term)))
    snippet = F.replace(window, F.lit(term), F.lit(pre + term + post))
    return docs.withColumn(
        "snippet", F.when(pos > 0, snippet).otherwise(F.lit(None)))

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


def spellcheck(terms_df: DataFrame, word: str, max_edits: int = 2,
               k: int = 5, field: str = DEFAULT_FIELD) -> DataFrame:
    """Did-you-mean corrections (`suggest/spell/DirectSpellChecker.java:49`
    semantics: candidates within edit distance from the live dictionary,
    ranked closest-first then most-frequent) → (term, distance, df).

    Distance filtering runs executor-side (JVM levenshtein behind a
    pushed-down length pre-filter) exactly like fuzzy expansion — the
    driver sees only the k suggestions."""
    cand = (terms_df.filter(
        (F.col("field") == field)
        & (F.length("term") >= len(word) - max_edits)
        & (F.length("term") <= len(word) + max_edits))
        .withColumn("distance", F.levenshtein(F.col("term"), F.lit(word)))
        .filter(F.col("distance") <= max_edits))
    return (cand.orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
            .limit(k).select("term", "distance", "df"))


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

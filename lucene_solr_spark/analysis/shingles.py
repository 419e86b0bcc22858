"""Shingle (word n-gram) field generation — phrase-as-term indexing.

Reference: `analysis/shingle/ShingleFilter.java:34-70` (token n-grams
over the stream, configurable ``tokenSeparator``;
`FixedShingleFilter.java` for the single-size variant) and the classic
use: a shingle field turns exact phrase queries into single-term
lookups, trading index size for o(positions-merge) query cost — at web
scale the standard way to serve hot phrases.

Spark-first shape: shingles are materialized as an additional COLUMN by
an Arrow-batched pandas UDF over the same raw token stream the indexer
sees (tokenize → simple-lowercase, no stop filter — shingling the raw
stream is ShingleAnalyzerWrapper's tokenizer-wrapping position), then
indexed as an ordinary field by the multi-field builder, so bigram
postings live beside unigram postings in the same relational layout.

Envelope (documented divergences):
- separator is ``_`` (single token under UAX#29 ``\\w`` runs), not the
  reference's default space — the reference makes it configurable
  (`ShingleFilter.java:289`);
- unigrams are NOT re-emitted into the shingle field (the text field
  already carries them; reference default outputUnigrams=true);
- no filler tokens: we shingle pre-stop, so there are no removed-token
  gaps to fill (`ShingleFilter.java:50` fillerToken covers post-stop
  wrapping).

Phrase-as-term equivalence (pinned in tests/test_shingles.py): for
non-stopword terms a, b — PhraseQuery((a, b)) on the text field and
TermQuery("a_b") on the shingle field match EXACTLY the same documents,
because text-field positions count stopped slots, so position-adjacency
in the text field coincides with raw-stream adjacency.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from .lowercase import simple_lowercase
from .tokenizer import tokenize_raw


def shingle_text(text: str, size: int = 2, separator: str = "_") -> str:
    """Space-joined shingles of the lowered raw token stream."""
    toks = [simple_lowercase(t) for t in tokenize_raw(text or "")]
    if len(toks) < size:
        return ""
    return " ".join(separator.join(toks[i:i + size])
                    for i in range(len(toks) - size + 1))


def with_shingles(df: DataFrame, text_col: str = "text",
                  out_col: str = "shingles", size: int = 2,
                  separator: str = "_") -> DataFrame:
    """Add a shingle column (Arrow-batched; the per-doc loop is C-level
    regex + joins, the same cost class as the exact invert path)."""
    @F.pandas_udf(StringType())
    def _sh(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: shingle_text(t, size, separator))
    return df.withColumn(out_col, _sh(F.col(text_col)))

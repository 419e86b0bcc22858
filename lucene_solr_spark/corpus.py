"""Deterministic synthetic Common-Crawl-style corpus (BASELINE input_hint).

Generates the `pages` table — (url, warc_ts, html, text, lang) — as a pure
function of (seed, n_docs): Zipf-sampled vocabulary including the 33
English stopwords at natural head frequencies, mixed-case tokens, digits,
over-255-char tokens and a sprinkle of unicode, exercising every analyzer
path (FIXTURES.md §1). Generation is distributed: each Spark task derives
its rows from (seed, doc_id) alone, so output is independent of
parallelism — the docID is embedded in the url (a pure function of the
row, never a partition position), which is what makes builds resumable
and parallelism-independent.

The per-row invariant `extract_text(html) == text` (byte-identical) is
guaranteed by wrapping text in a fixed HTML template and extracting with
the inverse parser in `extract_text_series`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .analysis.analyzer import ENGLISH_STOP_WORDS

VOCAB_SIZE = 10_000
_HTML_PREFIX = b"<html><head><title>p</title></head><body><p>"
_HTML_SUFFIX = b"</p></body></html>"

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
])


def _vocab(seed: int) -> list[str]:
    """Deterministic vocabulary: stopwords first (head of the Zipf), then
    synthetic word shapes."""
    rng = np.random.default_rng(seed)
    base = sorted(ENGLISH_STOP_WORDS)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    n_needed = VOCAB_SIZE - len(base)
    lengths = rng.integers(3, 10, n_needed)
    for i, L in enumerate(lengths):
        w = "".join(letters[rng.integers(0, 26, L)])
        words.append(w + str(i % 7) if i % 31 == 0 else w)  # some digit tails
    vocab = base + words
    # a few special shapes at fixed slots
    vocab[100] = "MixedCase"
    vocab[101] = "o'neill"
    vocab[102] = "3.14"
    vocab[103] = "café"
    vocab[104] = "x" * 300          # > maxTokenLength → skipped
    vocab[105] = "日本"
    return vocab


def _gen_rows(doc_ids: np.ndarray, seed: int, vocab: list[str]) -> pd.DataFrame:
    """Pure function of (seed, doc_id) → page rows."""
    n_vocab = len(vocab)
    varr = np.array(vocab, dtype=object)
    rows = []
    langs = np.array(["en"] * 17 + ["de", "ja", "fr"], dtype=object)
    for d in doc_ids:
        rng = np.random.default_rng((seed << 20) ^ int(d))
        n_words = int(rng.integers(20, 200))
        # Zipf over the vocab: rank ~ zipf(1.2), clipped
        ranks = np.minimum(rng.zipf(1.2, n_words) - 1, n_vocab - 1)
        words = varr[ranks]
        text = " ".join(words.tolist())
        url = f"https://site{int(d) % 50}.example/p/{int(d):012d}"
        ts = pd.Timestamp("2024-01-01", tz="UTC") + pd.Timedelta(seconds=int(d))
        html = _HTML_PREFIX + text.encode("utf-8") + _HTML_SUFFIX
        rows.append((url, ts, html, text, str(langs[int(d) % len(langs)])))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def generate_pages(spark: SparkSession, n_docs: int, seed: int = 42,
                   partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generator → pages DataFrame with doc_id.

    doc_id is the generation index, embedded zero-padded in the url and
    parsed back out — the Lucene-style "insertion order" assignment made
    reproducible at any parallelism (a pure function of the row, never
    monotonically_increasing_id).
    """
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 4)
    vocab = _vocab(seed)
    b_vocab = spark.sparkContext.broadcast(vocab)

    def gen(iterator):
        for pdf in iterator:
            if len(pdf):
                yield _gen_rows(pdf["id"].to_numpy(), seed, b_vocab.value)

    rng_df = spark.range(0, n_docs, 1, partitions)
    pages = rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)
    return pages.withColumn(
        "doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long"))


def extract_text_series(html: pd.Series) -> pd.Series:
    """Inverse of the HTML template — used by the pandas_udf extractor.

    Mirrors the reference's DemoHTMLParser role
    (`benchmark/.../feeds/DemoHTMLParser.java:39`): html → body text.
    Byte-identity with the `text` column is a pinned invariant.
    """
    pre, suf = _HTML_PREFIX.decode(), _HTML_SUFFIX.decode()

    def _ex(b):
        s = bytes(b).decode("utf-8")
        i = s.index("<p>") + 3
        j = s.rindex("</p>")
        return s[i:j]

    return html.map(_ex)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_text_series(html)

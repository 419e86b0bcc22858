"""Corpus-hygiene operators: PII detection/masking and benchmark
decontamination.

These are the pre-training data-pipeline steps that sit next to dedup
(Dolma, RefinedWeb, Gopher all run variants of them); the reference
engine has no analog — they are pipeline extensions like
``textstats``.

Scale posture:
- ``pii_stats`` / ``pii_scrub`` are pure codegen projections (regexp
  count/replace) — narrow, no shuffle, fuse with the scan.
- ``decontaminate`` explodes each document into word n-grams map-side
  and joins them against a BROADCAST set of benchmark n-grams (the
  eval-set side is small by construction — benchmarks are thousands of
  documents, not billions), then one map-side-combined count per doc.
  No wide shuffle of the corpus ever happens: the only exchange is the
  final per-doc aggregation keyed by doc_id, which is as narrow as the
  hit set.

All regexes stay inside the Java-regex ∩ RE2 common subset (no
lookaround, no backreferences) so the DuckDB oracle evaluates the
identical pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# pattern order is part of the contract: email is masked first, then
# phone, then IPv4 (a dotted phone like 123.456.7890 must be claimed by
# the phone rule, not half-eaten by the IP rule)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

PII_RULES = (("email", EMAIL_RE, "|||EMAIL|||"),
             ("phone", PHONE_RE, "|||PHONE|||"),
             ("ipv4", IPV4_RE, "|||IP|||"))


def _count(col, pattern: str) -> "F.Column":
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def pii_stats(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_phone, n_ipv4, has_pii) — detector only.

    Counts are taken against the progressively-masked text (same
    leftmost-match semantics the scrubber applies), so
    stats ≡ what ``pii_scrub`` would remove.
    """
    cols = [F.col(id_col).alias("doc_id")]
    cur = F.col(text_col)
    total = F.lit(0)
    for name, pat, token in PII_RULES:
        c = _count(cur, pat)
        cols.append(c.alias(f"n_{name}"))
        total = total + c
        cur = F.regexp_replace(cur, pat, token)
    cols.append((total > 0).alias("has_pii"))
    return docs.select(*cols)


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_email, n_phone, n_ipv4) — masks each PII
    class with a typed placeholder token, in rule order."""
    cols = [F.col(id_col).alias("doc_id")]
    cur = F.col(text_col)
    stats = []
    for name, pat, token in PII_RULES:
        stats.append(_count(cur, pat).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return docs.select(*cols, cur.alias("clean_text"), *stats)


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap, GPT-3/Gopher style)
# ---------------------------------------------------------------------------

def _words(text_col) -> "F.Column":
    """Whitespace tokens of the lower-cased text (matches the DuckDB
    oracle's regexp_split_to_array(trim(lower(text)), '\\s+'))."""
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def word_ngrams(text_col, n: int) -> "F.Column":
    """All (overlapping, multiplicity-preserving) n-word grams of the
    text as an array<string> — one codegen transform over index
    positions; empty array when the doc is shorter than n words."""
    ws = _words(text_col)
    idx = F.when(F.size(ws) >= n,
                 F.sequence(F.lit(0), F.size(ws) - n)
                 ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.concat_ws(
            " ", *[F.element_at(ws, i + d + 1) for d in range(n)]))


def word_ngram_hashes(text_col, n: int) -> "F.Column":
    """All n-word gram HASHES of the text as an array<bigint> — the
    fast-path twin of ``word_ngrams`` for pipelines that only compare
    grams for equality (dedup, decontamination). Tokens are hashed once
    (one xxhash64 per token), then each window folds its n token hashes
    with xxhash64-combine — no n-token STRING is ever materialized, so
    a width-13 sweep allocates 8 bytes per window instead of ~100.
    xxhash64(acc, x) is the combine (hash of the two longs) — no
    arithmetic overflow, so it is safe under ANSI mode. Same window
    positions/multiplicity as ``word_ngrams``; 64-bit collisions are
    the only divergence (~n_windows²/2⁶⁵ — negligible at any corpus
    this engine targets, and the exact-string path remains for the
    oracle-gated queries)."""
    ws = _words(text_col)
    hs = F.transform(ws, lambda w: F.xxhash64(w))
    idx = F.when(F.size(hs) >= n,
                 F.sequence(F.lit(0), F.size(hs) - n)
                 ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.aggregate(F.slice(hs, i + 1, n),
                                   F.lit(0).cast("long"),
                                   lambda a, x: F.xxhash64(a, x)))


def benchmark_grams(bench_docs: DataFrame, n: int = 8,
                    text_col: str = "text",
                    hashed: bool = False) -> DataFrame:
    """Distinct n-grams of the benchmark/eval corpus: one column
    ``gram``. This is the (small) side that gets broadcast. With
    ``hashed`` the grams are 64-bit hashes (see word_ngram_hashes) —
    pair it with ``decontaminate(..., hashed=True)``."""
    grams = (word_ngram_hashes(F.col(text_col), n) if hashed
             else word_ngrams(F.col(text_col), n))
    return (bench_docs
            .select(F.explode(grams).alias("gram"))
            .distinct())


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 8,
                  id_col: str = "doc_id",
                  text_col: str = "text",
                  hashed: bool = False) -> DataFrame:
    """(doc_id, n_grams, n_hits, contaminated) — per training document
    the number of its word n-grams (with multiplicity) that appear in
    the benchmark gram set. GPT-3 appendix C / Gopher §A3 shape: a doc
    sharing any n-gram with an eval set is flagged.

    ``bench`` is a one-column (``gram``) DataFrame — see
    ``benchmark_grams``; it is broadcast, so the corpus never shuffles.
    ``hashed`` uses 64-bit gram hashes on BOTH sides (build ``bench``
    with the same flag) — the corpus-scale fast path.
    """
    grams = (word_ngram_hashes(F.col(text_col), n) if hashed
             else word_ngrams(F.col(text_col), n))
    base = docs.select(F.col(id_col).alias("doc_id"),
                       grams.alias("grams"))
    per_doc = base.select("doc_id", F.size("grams").alias("n_grams"))
    hits = (base.select("doc_id", F.explode("grams").alias("gram"))
            .join(F.broadcast(bench.select("gram").distinct()), "gram")
            .groupBy("doc_id").agg(F.count("*").alias("n_hits")))
    return (per_doc.join(hits, "doc_id", "left")
            .select("doc_id", "n_grams",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"))
            .withColumn("contaminated", F.col("n_hits") > 0))

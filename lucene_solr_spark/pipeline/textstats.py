"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All single-pass JVM-side expressions (regexp /
array functions / aggregate folds inside whole-stage codegen) — narrow,
no shuffle, trivially scalable.

Analog in the reference: none (Lucene analyzes text but does not score
it); these are the training-pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .hashing import P31, md5h60
from ..analysis.analyzer import ENGLISH_STOP_WORDS

TOKEN_RE = "[a-z0-9]+"
# words OR runs of non-word non-space — a BPE-ish pre-tokenization split
BPE_RE = r"[a-z0-9]+|[^a-z0-9\s]+"

# tiny built-in stopword profiles for the n-gram/stopword language-ID
# heuristic (deterministic; a real system would ship fastText — out of
# sandbox, and the heuristic is the point here)
DE_STOP_WORDS = ("der die das und ist nicht ein eine mit von zu im den "
                 "des dem auf für als auch es an werden aus er hat dass "
                 "sie nach wird bei einer um am sind noch wie").split()
FP_BASE = 131071  # rolling-hash base; acc < P31 so acc*BASE + x < 2^48


def _tok(text_col) -> "F.Column":
    return F.regexp_extract_all(text_col, F.lit(TOKEN_RE), 0)


def _hits(ts, words) -> "F.Column":
    arr = F.array(*[F.lit(w) for w in sorted(words)])
    return F.size(F.filter(ts, lambda t: F.array_contains(arr, t)))


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, en_hits, de_hits, pred_lang) — stopword-profile
    scoring; pred = argmax hits, tie/none → 'und' (undetermined)."""
    ts = _tok(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), ts.alias("ts"))
    en, de = _hits(F.col("ts"), ENGLISH_STOP_WORDS), _hits(F.col("ts"), DE_STOP_WORDS)
    return base.select(
        "doc_id", F.size("ts").alias("n_tokens"),
        en.alias("en_hits"), de.alias("de_hits")).withColumn(
        "pred_lang",
        F.when(F.col("en_hits") > F.col("de_hits"), F.lit("en"))
         .when(F.col("de_hits") > F.col("en_hits"), F.lit("de"))
         .otherwise(F.lit("und")))


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, stop_ratio, mean_token_len, quality).

    quality = mean of three [0,1] signals: length sweet spot (>= 20
    tokens), stopword ratio in [0.05, 0.6], mean token length in [3, 10]
    — the standard cheap web-text quality heuristics."""
    ts = _tok(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.length(text_col).cast("long").alias("n_chars"),
                       ts.alias("ts"))
    n = F.size("ts")
    stop = _hits(F.col("ts"), ENGLISH_STOP_WORDS)
    tok_chars = F.aggregate(F.col("ts"), F.lit(0),
                            lambda acc, t: acc + F.length(t))
    out = base.select(
        "doc_id", "n_chars", n.alias("n_tokens"),
        (stop / F.greatest(n, F.lit(1))).alias("stop_ratio"),
        (tok_chars / F.greatest(n, F.lit(1))).alias("mean_token_len"))
    ok_len = (F.col("n_tokens") >= 20).cast("int")
    ok_stop = ((F.col("stop_ratio") >= 0.05) &
               (F.col("stop_ratio") <= 0.6)).cast("int")
    ok_tok = ((F.col("mean_token_len") >= 3.0) &
              (F.col("mean_token_len") <= 10.0)).cast("int")
    return out.withColumn("quality", (ok_len + ok_stop + ok_tok) / F.lit(3.0))


def token_counts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, re_tokens) — whitespace split count and the
    BPE-ish pre-tokenization count (words + punctuation runs)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0))
        .alias("re_tokens"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — order-sensitive rolling polynomial hash over the
    token sequence: fp = fold(acc * FP_BASE + md5h60(tok) % P31) % P31.
    Deterministic, JVM-side, and reproducible in ANSI SQL."""
    ts = _tok(F.col(text_col))
    hs = F.transform(ts, lambda t: md5h60(t) % P31)
    fp = F.aggregate(hs, F.lit(0).cast("long"),
                     lambda acc, x: (acc * FP_BASE + x) % P31)
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fp"))


def repetition_stats(docs: DataFrame, n: int = 3,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (the Gopher/RefinedWeb
    "repetitious text" quality rules — Rae et al. 2021 §A1.1: fraction
    of duplicated n-grams): per doc, the total n-gram count, the
    distinct count, dup_frac = 1 − distinct/total, and top_frac = the
    most frequent n-gram's share. Short docs (< n tokens) report zero
    n-grams and 0.0 fractions.

    → (doc_id, n_ngrams, n_distinct, dup_frac, top_frac). Whole-stage
    codegen (higher-order array functions — transform + aggregate over
    a map), no shuffle beyond the final narrow projection."""
    parts = " || ' ' || ".join(f"ts[i+{d}]" for d in range(n))
    grams = (f"CASE WHEN size(ts) >= {n} THEN "
             f"transform(sequence(0, size(ts) - {n}), i -> {parts}) "
             f"ELSE array() END")
    base = docs.select(F.col(id_col).alias("doc_id"),
                       _tok(F.col(text_col)).alias("ts"))
    g = base.select("doc_id", F.expr(grams).alias("gs"))
    exploded = g.select("doc_id", F.explode_outer("gs").alias("gram"))
    # window-free shape: per-(doc, gram) counts reduce map-side, then
    # one more narrow agg takes the totals and the max share
    per = (exploded.filter(F.col("gram").isNotNull())
           .groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c")))
    stats = (per.groupBy("doc_id")
             .agg(F.sum("c").alias("n_ngrams"),
                  F.count(F.lit(1)).alias("n_distinct"),
                  F.max("c").alias("top_c")))
    out = (docs.select(F.col(id_col).alias("doc_id"))
           .join(stats, "doc_id", "left")
           .na.fill({"n_ngrams": 0, "n_distinct": 0, "top_c": 0}))
    return out.select(
        "doc_id", F.col("n_ngrams").cast("long"),
        F.col("n_distinct").cast("long"),
        F.when(F.col("n_ngrams") > 0,
               1.0 - F.col("n_distinct") / F.col("n_ngrams"))
        .otherwise(0.0).alias("dup_frac"),
        F.when(F.col("n_ngrams") > 0,
               F.col("top_c") / F.col("n_ngrams"))
        .otherwise(0.0).alias("top_frac"))


# the Gopher rule-set's required stop words (Rae et al. 2021 §A1.1)
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 min_words: int = 50, max_words: int = 100_000,
                 min_wlen: float = 3.0, max_wlen: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_frac: float = 0.9,
                 max_ellipsis_frac: float = 0.3,
                 min_alpha_frac: float = 0.8,
                 min_stop_hits: int = 2) -> DataFrame:
    """The Gopher quality rules (Rae et al. 2021 §A1.1, also used by
    RefinedWeb/Dolma): per doc the rule inputs plus a per-rule flag and
    an overall `keep`.

    Rules: word count in [min_words, max_words]; mean word length in
    [min_wlen, max_wlen]; symbol-to-word ratio ('#'/'…'/'...') ≤ 0.1;
    ≤90% of lines bullet-initial; ≤30% of lines ellipsis-terminal;
    ≥80% of words contain an alphabetic character; ≥2 of the 8 required
    stop words present.

    → (doc_id, n_words, mean_wlen, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_frac, stop_hits, keep). One narrow projection,
    all in whole-stage codegen (split + higher-order array folds) — no
    shuffle, no Python per row; at 100 TB this is a pure map stage that
    fuses with the scan."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    lines = F.split(F.col(text_col), r"\n")
    n = F.size(words)
    nl = F.size(lines)
    mean_wlen = (F.aggregate(words, F.lit(0),
                             lambda a, w: a + F.length(w))
                 / F.greatest(n, F.lit(1)))
    n_symbols = (F.length(F.col(text_col))
                 - F.length(F.regexp_replace(F.col(text_col),
                                             r"#|…", "")))
    n_symbols = n_symbols + F.size(F.regexp_extract_all(
        F.col(text_col), F.lit(r"\.\.\."), 0))
    symbol_ratio = n_symbols / F.greatest(n, F.lit(1))
    bullet = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike(r"^[•\-\*]")))
    ellip = F.size(F.filter(
        lines, lambda l: F.rtrim(l).rlike(r"(…|\.\.\.)$")))
    alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    low = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.size(F.filter(
        F.array(*[F.lit(s) for s in GOPHER_STOPS]),
        lambda s: F.array_contains(low, s)))
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_words"),
        mean_wlen.cast("double").alias("mean_wlen"),
        symbol_ratio.cast("double").alias("symbol_ratio"),
        (bullet / F.greatest(nl, F.lit(1))).alias("bullet_frac"),
        (ellip / F.greatest(nl, F.lit(1))).alias("ellipsis_frac"),
        (alpha / F.greatest(n, F.lit(1))).alias("alpha_frac"),
        stop_hits.cast("long").alias("stop_hits"))
    keep = ((F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words)
            & (F.col("mean_wlen") >= min_wlen)
            & (F.col("mean_wlen") <= max_wlen)
            & (F.col("symbol_ratio") <= max_symbol_ratio)
            & (F.col("bullet_frac") <= max_bullet_frac)
            & (F.col("ellipsis_frac") <= max_ellipsis_frac)
            & (F.col("alpha_frac") >= min_alpha_frac)
            & (F.col("stop_hits") >= min_stop_hits))
    return out.withColumn("keep", keep)


def unigram_logprob(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-doc unigram language-model score — the CCNet-style quality
    signal (Wenzek et al. 2020, PAPERS.md) restated with the one LM
    whose training IS a DataFrame aggregate and whose scores an oracle
    can recompute exactly: p(t) = ttf(t)/T over this corpus, and a
    document scores bits = −mean log2 p(token). Low bits = predictable
    head-like text, high bits = rare-token tail (CCNet buckets on
    exactly this ordering, just with a 5-gram KenLM).

    Spark shape: training = one (term) groupBy over the exploded token
    stream (map-side combined — the vocabulary, not the corpus, comes
    out); scoring = one equi-join of the token stream against the
    vocabulary (Zipf makes the vocab side ≪ corpus; Catalyst broadcasts
    it under the threshold, else it is a well-keyed shuffle) + one
    per-doc agg. → (doc_id, n_tokens, bits)."""
    tok = docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(_tok(F.col(text_col))).alias("term"))
    vocab = tok.groupBy("term").agg(F.count("*").alias("ttf"))
    total = vocab.agg(F.sum("ttf").alias("T"))
    scored = (tok.join(vocab, "term").crossJoin(total)
              .withColumn("_bits",
                          -F.log2(F.col("ttf") / F.col("T"))))
    per_doc = (scored.groupBy("doc_id")
               .agg(F.count("*").alias("n_tokens"),
                    F.avg("_bits").alias("bits")))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    "bits"))


def bigram_logprob(docs: DataFrame, lam: float = 0.2,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-doc interpolated-bigram LM score — one rung up the CCNet
    ladder from :func:`unigram_logprob` toward its 5-gram KenLM:
    bits = −mean log2( λ·p(w_i) + (1−λ)·p(w_i|w_{i−1}) ) over
    positions i ≥ 2, both estimators MLE over THIS corpus
    (p(w) = ttf/T, p(w|v) = c(v,w)/c(v,·)). The λ mix is the classic
    Jelinek-Mercer interpolation: the bigram term captures local
    word-order predictability (boilerplate scores low, shuffled or
    tail text scores high) and the unigram floor keeps scores finite
    under any future held-out split.

    Spark shape: bigrams come straight off each doc's token ARRAY (a
    ``transform`` over ``sequence()`` — no self-join, no window);
    training = two map-side-combined groupBys (bigram counts +
    left-context totals, vocabulary-sized outputs); scoring =
    equi-joins of the bigram stream against those tables (Zipf keeps
    the model side ≪ corpus; Catalyst broadcasts under the threshold)
    + one per-doc agg. Docs with < 2 tokens report n_bigrams = 0 and
    NULL bits. → (doc_id, n_bigrams, bits)."""
    base = docs.select(F.col(id_col).alias("doc_id"),
                       _tok(F.col(text_col)).alias("ts"))
    big = (base.select("doc_id", F.explode(F.expr(
        "CASE WHEN size(ts) >= 2 THEN "
        "transform(sequence(0, size(ts) - 2), "
        "i -> struct(ts[i] AS w1, ts[i+1] AS w2)) "
        "ELSE array() END")).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"),
                F.col("bg.w2").alias("w2")))
    pair = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    left = pair.groupBy("w1").agg(F.sum("c12").alias("c1"))
    tok = base.select(F.explode("ts").alias("term"))
    vocab = tok.groupBy("term").agg(F.count("*").alias("ttf"))
    total = vocab.agg(F.sum("ttf").alias("T"))
    sc = (big.join(pair, ["w1", "w2"]).join(left, "w1")
          .join(vocab.withColumnRenamed("term", "w2"), "w2")
          .crossJoin(total)
          .withColumn("_bits", -F.log2(
              F.lit(float(lam)) * (F.col("ttf") / F.col("T"))
              + F.lit(1.0 - float(lam)) * (F.col("c12") / F.col("c1")))))
    per_doc = sc.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"), F.avg("_bits").alias("bits"))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    "bits"))


def perplexity_buckets(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """CCNet's head/middle/tail split: documents bucketed by LM score
    at the corpus's exact 1/3 and 2/3 quantiles (CCNet computes the
    cutoffs per language on a sample; here exactly, over the whole
    corpus — one sort-based percentile agg, affordable because it runs
    on the per-DOC score frame, corpus-size/avg-doc-len rows). →
    (doc_id, bits, bucket) with bucket ∈ head|middle|tail; head =
    lowest bits (most predictable), the reference's keep-first band."""
    b = unigram_logprob(docs, id_col, text_col).filter("bits IS NOT NULL")
    cuts = b.agg(F.expr("percentile(bits, 1.0/3)").alias("c1"),
                 F.expr("percentile(bits, 2.0/3)").alias("c2"))
    return (b.crossJoin(cuts)
            .select("doc_id", F.round("bits", 4).alias("bits"),
                    F.when(F.col("bits") <= F.col("c1"), "head")
                    .when(F.col("bits") <= F.col("c2"), "middle")
                    .otherwise("tail").alias("bucket")))


def c4_rules(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text", min_line_words: int = 5,
             min_sentences: int = 3,
             bad_words: tuple = ()) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2, the other half of
    the Gopher/C4 pair every web-corpus pipeline runs): line-level
    filtering followed by page-level drops.

    Line rules (a line survives iff ALL hold): ends in terminal
    punctuation (. ! ? or closing quote); has ≥ ``min_line_words``
    words; does not contain the word "javascript" (case-insensitive).
    Page rules (the doc is dropped iff ANY holds): fewer than
    ``min_sentences`` sentences remain after line filtering; contains
    "lorem ipsum"; contains '{'; contains any ``bad_words`` entry.

    → (doc_id, n_lines, n_kept_lines, n_sentences, has_lorem,
    has_brace, keep, clean_text). Like `gopher_rules` this is one
    narrow codegen projection (split + higher-order filters) fusing
    with the scan — no shuffle, no Python, a pure map stage at 100 TB.
    """
    text = F.col(text_col)
    lines = F.split(text, r"\n")
    kept = F.filter(lines, lambda l: (
        F.rtrim(l).rlike(r'[.!?]["”’]?$')
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_line_words)
        & ~F.lower(l).contains("javascript")))
    clean = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(clean, F.lit(r"[.!?]"), 0))
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    bad = F.lit(False)
    for w in bad_words:
        bad = bad | F.lower(text).contains(w.lower())
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sent.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem"), has_brace.alias("has_brace"),
        bad.alias("has_bad_word"), clean.alias("clean_text"))
    keep = (~F.col("has_lorem") & ~F.col("has_brace")
            & ~F.col("has_bad_word")
            & (F.col("n_sentences") >= min_sentences))
    return out.withColumn("keep", keep)


_SCRIPTS = [
    # (column, Java regex class, codepoint range note)
    ("latin", r"\p{IsLatin}"),
    ("cyrillic", r"\p{IsCyrillic}"),
    ("arabic", r"\p{IsArabic}"),
    ("devanagari", r"\p{IsDevanagari}"),
    ("han", r"\p{IsHan}"),
    ("hangul", r"\p{IsHangul}"),
    ("greek", r"\p{IsGreek}"),
]


def script_profile(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-document Unicode-script histogram — the multilingual-corpus
    profiling step that routes documents to the right analysis chain
    (the script-range heuristic CJKBigramFilter / the reference's
    language analyzers assume upstream).

    → (doc_id, latin, cyrillic, arabic, devanagari, han, hangul,
    greek, letters, dominant) where each script column counts its
    letters, ``letters`` counts ALL letter codepoints, and
    ``dominant`` is the argmax script ('und' when no letters or the
    max is not unique — deterministic, first-listed wins ties is NOT
    used; und keeps the oracle exact).

    Plan: ONE codegen projection — each count is
    length(s) − length(regexp_replace(s, class, '')) on the raw text,
    no tokenization, no Python, fused with the scan.
    """
    t = F.col(text_col)

    def count(cls: str):
        return (F.length(t) - F.length(F.regexp_replace(t, cls, ""))) \
            .cast("long")

    cols = [count(cls).alias(name) for name, cls in _SCRIPTS]
    letters = (F.length(t)
               - F.length(F.regexp_replace(t, r"\p{L}", ""))).cast("long")
    out = docs.select(F.col(id_col).alias("doc_id"), *cols,
                      letters.alias("letters"))
    names = [n for n, _ in _SCRIPTS]
    mx = F.greatest(*[F.col(n) for n in names])
    ties = sum((F.col(n) == mx).cast("int") for n in names)
    dom = F.lit("und")
    for n in names:
        dom = F.when((F.col(n) == mx) & (mx > 0) & (ties == 1),
                     F.lit(n)).otherwise(dom)
    return out.withColumn("dominant", dom)

"""Distributed byte-pair-encoding vocabulary learning + application.

Algorithm: Sennrich, Haddow & Birch 2016 ("Neural Machine Translation
of Rare Words with Subword Units", §3.2) — iteratively merge the most
frequent adjacent symbol pair. Published-paper reimplementation; the
reference engine has no BPE (its token counting stops at the analyzer),
but a training-data pipeline needs subword token budgets, so this is a
first-class pipeline operator here.

Scale design (the part that matters at 100 TB):

* The corpus is touched ONCE — to build the word-frequency table
  (one explode + one map-side-combined groupBy). Everything after
  runs on the *vocabulary* (distinct words), which is bounded by
  language, not corpus size — exactly the trick Sennrich's reference
  implementation uses (it trains on a word→count dict).
* Each merge round is one distributed pair-count aggregation over the
  vocab plus a 1-row argmax collect; merges are sequential BY
  DEFINITION (round n+1's counts depend on round n's merge), so the
  N-round loop is inherent to BPE, not a Spark artifact.
* Applying a merge to a symbol array is a pure-codegen ``aggregate``
  fold (leftmost non-overlapping greedy, the paper's semantics) —
  NO Python anywhere in train or apply.
* Encoding a corpus reuses the same dedup-first trick: encode the
  distinct-word table, then broadcast-join token counts back onto
  documents — the corpus never passes through the merge fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: end-of-word marker, a separate terminal symbol (Sennrich §3.2 '·')
EOW = "</w>"

WORD_RX = "[a-z0-9]+"


def word_symbols(word: Column) -> Column:
    """word → its initial symbol array: characters + the EOW marker."""
    # split at every between-char boundary: not at start (?!^) and only
    # where a char follows (?=.) — otherwise Java split emits a
    # trailing '' that would poison the pair counts
    chars = F.split(word, "(?!^)(?=.)")
    return F.concat(chars, F.array(F.lit(EOW)))


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, symbols) — the ONLY corpus-wide pass in BPE."""
    words = docs.select(
        F.explode(F.expr(f"regexp_extract_all({text_col}, '{WORD_RX}', 0)"))
        .alias("word"))
    return (words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
            .withColumn("symbols", word_symbols(F.col("word"))))


def pair_counts(wf: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the weighted vocab:
    (pair, count) with pair = 'left right' (space-joined)."""
    pairs = F.expr(
        "transform(sequence(1, size(symbols) - 1),"
        " i -> concat(element_at(symbols, i), ' ',"
        "             element_at(symbols, i + 1)))")
    return (wf.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair").agg(F.sum("freq").alias("count")))


def merge_pair_col(symbols: Column, left: str, right: str) -> Column:
    """Replace every leftmost non-overlapping (left, right) adjacency
    in ``symbols`` with the merged symbol — one codegen ``aggregate``
    fold, state = (output-so-far, pending symbol). Symbols are never
    empty strings, so '' is a safe no-pending sentinel."""
    return F.aggregate(
        symbols,
        F.struct(F.expr("cast(array() as array<string>)").alias("out"),
                 F.lit("").alias("carry")),
        lambda acc, x: F.when(
            (acc["carry"] == left) & (x == right),
            F.struct(F.concat(acc["out"],
                              F.array(F.lit(left + right))).alias("out"),
                     F.lit("").alias("carry"))
        ).otherwise(
            F.struct(F.when(acc["carry"] != "",
                            F.concat(acc["out"], F.array(acc["carry"])))
                     .otherwise(acc["out"]).alias("out"),
                     x.alias("carry"))),
        lambda acc: F.when(acc["carry"] != "",
                           F.concat(acc["out"], F.array(acc["carry"])))
        .otherwise(acc["out"]))


def bpe_train(docs: DataFrame, num_merges: int,
              text_col: str = "text") -> tuple[list[tuple[str, str]],
                                               DataFrame]:
    """Learn ``num_merges`` merges. Returns (merges, final vocab df).

    Ties on count break pair-ascending so training is deterministic
    and reshard-invariant. Each round collects exactly ONE row (the
    argmax pair); the vocab df is re-cached every round because round
    n+1 aggregates over round n's merged symbols."""
    wf = word_freqs(docs, text_col).cache()
    wf.count()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (pair_counts(wf)
               .orderBy(F.desc("count"), F.asc("pair")).limit(1).collect())
        if not top or top[0]["count"] < 2:
            break  # nothing left worth merging (paper stops likewise)
        left, right = top[0]["pair"].split(" ", 1)
        merges.append((left, right))
        nxt = wf.withColumn(
            "symbols", merge_pair_col(F.col("symbols"), left, right)).cache()
        nxt.count()
        wf.unpersist()
        wf = nxt
    return merges, wf


def encode_words(words: DataFrame, merges,
                 word_col: str = "word") -> DataFrame:
    """Apply a learned merge list to a distinct-word table — chained
    codegen folds, one projection per merge (Catalyst collapses them
    into a single whole-stage-codegen pass over the small table)."""
    out = words.withColumn("bpe", word_symbols(F.col(word_col)))
    for left, right in merges:
        out = out.withColumn("bpe", merge_pair_col(F.col("bpe"), left, right))
    return out


def bpe_token_counts(docs: DataFrame, merges,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document BPE token count: explode words, broadcast-join the
    encoded distinct-word table (corpus rows never enter the fold),
    sum subword counts. (id_col, n_words, n_bpe_tokens)."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.expr(f"regexp_extract_all({text_col}, '{WORD_RX}', 0)"))
        .alias("word"))
    enc = encode_words(words.select("word").distinct(), merges)
    enc = F.broadcast(enc.select("word", F.size("bpe").alias("n_sub")))
    return (words.join(enc, "word")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_sub").cast("long").alias("n_bpe_tokens")))

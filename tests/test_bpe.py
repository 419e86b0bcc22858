"""Distributed BPE (Sennrich 2016 §3.2): pure-Python reference
differential for training, greedy-fold merge pins, encode/count
round-trip, and reshard invariance. Also pins the Solr strdist()
function-query similarity (`search/function.py`)."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.pipeline.bpe import (EOW, bpe_token_counts,
                                            bpe_train, encode_words,
                                            merge_pair_col, word_symbols)
from lucene_solr_spark.search.function import strdist

TEXTS = ["low low low lower lower lowest",
         "new newer newest widest wide",
         "low wide newer lowest lowest"]


# ---- pure-Python Sennrich reference (learn_bpe.py algorithm) ----

def _ref_train(texts, num_merges):
    vocab = Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t):
            vocab[tuple(list(w) + [EOW])] += 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        # deterministic tie-break: count desc, then pair ascending by
        # its space-joined form (the engine compares 'left right')
        top_count = max(pairs.values())
        best = min((p for p, c in pairs.items() if c == top_count),
                   key=lambda p: f"{p[0]} {p[1]}")
        if pairs[best] < 2:
            break
        merges.append(best)
        vocab = Counter({_ref_merge(sym, best): f
                         for sym, f in vocab.items()})
    return merges, vocab


def _ref_merge(sym, pair):
    a, b = pair
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")


def test_train_matches_python_reference(docs):
    merges, vocab = bpe_train(docs, 8)
    ref_merges, ref_vocab = _ref_train(TEXTS, 8)
    assert merges == ref_merges
    got = {r["word"]: tuple(r["symbols"]) for r in vocab.collect()}
    ref_by_word = {"".join(sym).replace(EOW, ""): sym
                   for sym in ref_vocab}
    assert got == ref_by_word


def test_merge_fold_greedy_semantics(spark):
    """Leftmost non-overlapping greedy, including the a==b case."""
    df = spark.createDataFrame(
        [("aaa",), ("aab",), ("aba",), ("baaa",)], "word string")
    got = {r["word"]: r["m"] for r in df.select(
        "word", merge_pair_col(word_symbols(F.col("word")), "a", "a")
        .alias("m")).collect()}
    assert got["aaa"] == ["aa", "a", EOW]
    assert got["aab"] == ["aa", "b", EOW]
    assert got["aba"] == ["a", "b", "a", EOW]
    assert got["baaa"] == ["b", "aa", "a", EOW]


def test_encode_and_token_counts(docs):
    merges, _ = bpe_train(docs, 8)
    counts = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
              for r in bpe_token_counts(docs, merges).collect()}
    for i, t in enumerate(TEXTS):
        words = re.findall(r"[a-z0-9]+", t)
        enc_total = 0
        for w in words:
            sym = tuple(list(w) + [EOW])
            for m in merges:
                sym = _ref_merge(sym, m)
            enc_total += len(sym)
        assert counts[i] == (len(words), enc_total)


def test_encode_words_matches_train_vocab(docs):
    """encode_words(distinct words, merges) must equal the vocab state
    bpe_train left behind — apply ≡ train on seen words."""
    merges, vocab = bpe_train(docs, 6)
    words = vocab.select("word")
    enc = {r["word"]: r["bpe"]
           for r in encode_words(words, merges).collect()}
    trained = {r["word"]: r["symbols"] for r in vocab.collect()}
    assert enc == trained


def test_reshard_invariance(spark, docs):
    merges1, _ = bpe_train(docs.repartition(1), 5)
    merges7, _ = bpe_train(docs.repartition(7), 5)
    assert merges1 == merges7


# ---- strdist ----

def test_strdist_pins(spark):
    rows = [("kitten", "sitting"), ("abc", "abc"), ("", ""), ("", "ab"),
            ("merge", "marge")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = [round(r["s"], 6) for r in
           df.select(strdist("a", "b").alias("s")).collect()]
    # lev(kitten,sitting)=3, max len 7 -> 1-3/7
    assert got == [round(1 - 3 / 7, 6), 1.0, 1.0, 0.0, round(1 - 1 / 5, 6)]


def test_strdist_unsupported_measure_raises():
    with pytest.raises(ValueError):
        strdist("a", "b", measure="jw")

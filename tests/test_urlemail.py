"""UAX29URLEmailTokenizer analog.

Mirrors `analysis/email/UAX29URLEmailTokenizer.java:41-66`: URLs and
e-mail addresses survive as single typed tokens; everything else
tokenizes as the standard word rules.  The Catalyst expression is
differential-tested per-row against the Python twin over web-shaped
fixtures.
"""

import pyspark.sql.functions as F

from lucene_solr_spark.analysis.urlemail import (EMAIL_TYPE, URL_TYPE,
                                                 WORD_TYPE,
                                                 tokenize_url_email,
                                                 url_email_tokens_expr)


def test_url_single_token():
    toks = tokenize_url_email("see https://ex.com/a/b?q=1&r=2#f now")
    assert ("https://ex.com/a/b?q=1&r=2#f", URL_TYPE) in toks
    assert ("see", WORD_TYPE) in toks and ("now", WORD_TYPE) in toks


def test_url_schemes_and_www():
    for raw, tok in [("http://a.b/c", "http://a.b/c"),
                     ("ftp://host/file", "ftp://host/file"),
                     ("www.example.org/path", "www.example.org/path")]:
        assert tokenize_url_email(raw) == [(tok, URL_TYPE)], raw


def test_url_sheds_trailing_punctuation():
    toks = tokenize_url_email("Go to https://ex.com/page. Then stop")
    assert ("https://ex.com/page", URL_TYPE) in toks


def test_email_single_token():
    toks = tokenize_url_email("mail bob.smith+tag@sub.ex.co.uk today")
    assert ("bob.smith+tag@sub.ex.co.uk", EMAIL_TYPE) in toks
    assert all(t != "bob" for t, _ in toks)


def test_userinfo_url_not_email():
    # URL wins the alternation: user:pass@host stays one URL
    toks = tokenize_url_email("https://u:p@h.example/x")
    assert toks == [("https://u:p@h.example/x", URL_TYPE)]


def test_plain_words_unchanged():
    toks = tokenize_url_email("the quick brown fox")
    assert [t for t, ty in toks] == ["the", "quick", "brown", "fox"]
    assert all(ty == WORD_TYPE for _, ty in toks)


def test_expr_differential(spark):
    rows = [
        ("see https://ex.com/a?q=1 or mail bob@ex.org now",),
        ("www.foo.org, bob.smith+tag@sub.ex.co.uk; end.",),
        ("ftp://host/f and http://h/p#frag",),
        ("no web constructs here at all",),
        ("https://u:p@h.example/x",),
        ("",),
        ("trailing https://ex.com/p.",),
    ]
    df = spark.createDataFrame(rows, "raw string")
    got = df.select("raw",
                    url_email_tokens_expr("raw").alias("t")).collect()
    for r in got:
        want = tokenize_url_email(r["raw"])
        have = [(x["token"], x["type"]) for x in r["t"]]
        assert have == want, r["raw"]

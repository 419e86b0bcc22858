"""CharFilter analogs + PathHierarchyTokenizer.

HTML strip mirrors `charfilter/HTMLStripCharFilter.java:58` (strip
tags/comments/script/style content, decode entities); mapping mirrors
`charfilter/MappingCharFilter.java:37` (longest-match-first);
pattern-replace mirrors `pattern/PatternReplaceFilter.java:33`;
path hierarchy mirrors `path/PathHierarchyTokenizer.java:43` and is
pinned against every vector in the reference's
TestPathHierarchyTokenizer.  Each Catalyst expression is
differential-tested per-row against its Python twin.
"""

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.analysis.charfilters import (html_strip,
                                                    html_strip_expr,
                                                    mapping_filter,
                                                    mapping_filter_expr,
                                                    pattern_replace_expr)
from lucene_solr_spark.analysis.path import (path_hierarchy_expr,
                                             path_hierarchy_tokens)

# ------------------------------------------------------------ HTML strip

HTML_CASES = [
    ("<p>Hello <b>world</b></p>", " Hello  world  "),
    ("a <!-- x <b> --> b", "a   b"),
    ("<script>var x = '<p>';</script>after", " after"),
    ("<style>p { color: red }</style>text", " text"),
    ("<![CDATA[kept text]]>", " kept text "),
    ("<?xml version='1.0'?><!DOCTYPE html>x", "  x"),
    ("fish &amp; chips", "fish & chips"),
    ("&lt;tag&gt; &quot;q&quot; &apos;a&apos;", '<tag> "q" \'a\''),
    ("a&nbsp;b", "a\xa0b"),     # py twin: real NBSP (stdlib table)
    ("no markup at all", "no markup at all"),
    ("<a href='http://x/?a=1&amp;b=2'>link</a>", " link "),
    ("", ""),
]


def test_html_strip_python():
    for raw, want in HTML_CASES:
        assert html_strip(raw) == want, raw


def test_html_strip_entity_order():
    # single-pass decoding: "&amp;lt;" must yield "&lt;", not "<"
    assert html_strip("&amp;lt;") == "&lt;"


def test_html_strip_expr_differential(spark):
    # envelope inputs: the six named entities + their numeric
    # spellings (the codegen twin's documented table); NBSP decodes
    # to a plain space in the codegen twin, so normalize both sides
    rows = [(r,) for r, _ in HTML_CASES if "&nbsp;" not in r]
    rows += [("&#60;x&#62; &#34;y&#34; &#39;z&#39; &#38;", ),
             ("pre<script a=b>s1</script>mid<script>s2</script>post", ),
             ("<B CLASS='x'>bold</B> <I>it</I>", ),
             ("&amp;lt; stays encoded", )]
    df = spark.createDataFrame(rows, "raw string")
    got = {r["raw"]: r["out"]
           for r in df.select("raw",
                              html_strip_expr("raw").alias("out")).collect()}
    import html as _h
    for (raw,) in rows:
        assert got[raw] == html_strip(raw), raw


# --------------------------------------------------------- MappingCharFilter

def test_mapping_longest_match_first():
    m = {"ffi": "f", "ff": "g", "f": "h"}
    assert mapping_filter("ffif", m) == "fh"
    assert mapping_filter("fff", m) == "gh"   # ff then f
    # no re-scan of output: replacement never re-matched
    assert mapping_filter("ab", {"a": "b", "b": "c"}) == "bc"


def test_mapping_expr_differential(spark):
    # envelope: no mapping VALUE contains another mapping's KEY
    m = {"ue": "ü", "oe": "ö", "ae": "ä", "ss": "ß"}
    rows = [("fuer",), ("oeaess",), ("plain",), ("ueue",), ("",)]
    df = spark.createDataFrame(rows, "raw string")
    got = df.select("raw", mapping_filter_expr("raw", m).alias("o")).collect()
    for r in got:
        assert r["o"] == mapping_filter(r["raw"], m), r["raw"]


# ------------------------------------------------------------ PatternReplace

def test_pattern_replace_all_and_first(spark):
    df = spark.createDataFrame([("aaa bbb aaa",)], "raw string")
    a = df.select(
        pattern_replace_expr("raw", "a+", "X").alias("all"),
        pattern_replace_expr("raw", "a+", "X", replace_all=False).alias("fst"),
    ).collect()[0]
    assert a["all"] == "X bbb X"
    assert a["fst"] == "X bbb aaa"


def test_pattern_replace_first_with_groups_rejected():
    with pytest.raises(ValueError):
        pattern_replace_expr(F.lit("x"), "(a)", "$1", replace_all=False)


# --------------------------------------------------- PathHierarchyTokenizer

# every vector from the reference's TestPathHierarchyTokenizer
PATH_CASES = [
    ("/a/b/c", {}, ["/a", "/a/b", "/a/b/c"]),
    ("/a/b/c/", {}, ["/a", "/a/b", "/a/b/c", "/a/b/c/"]),
    ("a/b/c", {}, ["a", "a/b", "a/b/c"]),
    ("a/b/c/", {}, ["a", "a/b", "a/b/c", "a/b/c/"]),
    ("/", {}, ["/"]),
    ("//", {}, ["/", "//"]),
    ("/a/b/c", {"replacement": "\\"}, ["\\a", "\\a\\b", "\\a\\b\\c"]),
    ("c:\\a\\b\\c", {"delimiter": "\\"},
     ["c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"]),
    ("/a/b/c", {"skip": 1}, ["/b", "/b/c"]),
    ("/a/b/c/", {"skip": 1}, ["/b", "/b/c", "/b/c/"]),
    ("a/b/c", {"skip": 1}, ["/b", "/b/c"]),
    ("a/b/c/", {"skip": 1}, ["/b", "/b/c", "/b/c/"]),
    ("/", {"skip": 1}, []),
    ("//", {"skip": 1}, ["/"]),
    ("", {}, []),
    ("a//b", {}, ["a", "a/", "a//b"]),
]


def test_path_reference_vectors():
    for path, kw, want in PATH_CASES:
        assert path_hierarchy_tokens(path, **kw) == want, (path, kw)


def test_path_expr_differential(spark):
    for kwargs in ({}, {"skip": 1}, {"skip": 2},
                   {"replacement": "|"}, {"delimiter": "."}):
        paths = ["/a/b/c", "/a/b/c/", "a/b/c", "/", "//", "", "a//b",
                 "/x", "a", "a.b.c", "w/x/y/z/deep"]
        df = spark.createDataFrame([(p,) for p in paths], "raw string")
        got = df.select(
            "raw", path_hierarchy_expr("raw", **kwargs).alias("t")).collect()
        for r in got:
            assert list(r["t"]) == path_hierarchy_tokens(r["raw"], **kwargs), \
                (r["raw"], kwargs)

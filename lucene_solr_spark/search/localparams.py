"""Solr local-params query syntax — ``{!type k=v k2='…'}body``.

Reference semantics (`solr/core/src/java/org/apache/solr/search/
QueryParsing.java` parseLocalParams over StrParser, and QParserPlugin
dispatch in `solr/core/src/java/org/apache/solr/search/QParser.java`):
a query string opening with ``{!`` carries parser-local parameters up
to the matching ``}``; the first bare word is the parser TYPE (an
implicit ``type=`` key), values are bare words, 'single'- or
"double"-quoted strings with backslash escapes, and ``$name`` values
dereference the request-parameter map; a ``v`` local param replaces
the trailing body as the query text. ``solr_query`` then dispatches to
the engine's existing parser implementations the way QParserPlugin's
registry does: lucene (default), term, prefix, simple, surround,
dismax, frange, boost, func.

Spark shape: parsing is driver-side string work; every dispatched
query executes through the same kernel / DataFrame plans as its
directly-constructed form — this module adds syntax, not execution
paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .ast import DEFAULT_FIELD, MatchAllQuery, TermQuery, PrefixQuery


class LocalParamsError(ValueError):
    pass


def _read_value(s: str, i: int, params: dict) -> tuple[str, int]:
    """One value starting at i: quoted, $ref, or bare."""
    if i < len(s) and s[i] in "'\"":
        quote = s[i]
        i += 1
        out = []
        while i < len(s):
            c = s[i]
            if c == "\\" and i + 1 < len(s):
                out.append(s[i + 1])
                i += 2
                continue
            if c == quote:
                return "".join(out), i + 1
            out.append(c)
            i += 1
        raise LocalParamsError("unterminated quoted value")
    j = i
    while j < len(s) and not s[j].isspace() and s[j] != "}":
        j += 1
    raw = s[i:j]
    if raw.startswith("$"):
        name = raw[1:]
        if name not in params:
            raise LocalParamsError(f"undefined parameter reference ${name}")
        return str(params[name]), j
    return raw, j


def parse_local_params(q: str, params: dict | None = None
                       ) -> tuple[str | None, dict, str]:
    """→ (type, local_params, body). A string not starting with
    ``{!`` is (None, {}, q) — plain lucene syntax."""
    params = params or {}
    if not q.startswith("{!"):
        return None, {}, q
    i = 2
    local: dict = {}
    qtype = None
    first = True
    while True:
        while i < len(q) and q[i].isspace():
            i += 1
        if i >= len(q):
            raise LocalParamsError("unterminated local params — missing }")
        if q[i] == "}":
            i += 1
            break
        # key or bare type word
        j = i
        while j < len(q) and not q[j].isspace() and q[j] not in "=}":
            j += 1
        key = q[i:j]
        if j < len(q) and q[j] == "=":
            val, i = _read_value(q, j + 1, params)
            if key == "type":
                qtype = val
            else:
                local[key] = val
        else:
            if first and key:
                qtype = key                 # implicit type
            elif key:
                local[key] = ""             # flag-style param
            i = j
        first = False
    body = local.pop("v", q[i:])
    if body.startswith("$"):
        name = body[1:]
        if name not in params:
            raise LocalParamsError(f"undefined parameter reference ${name}")
        body = str(params[name])
    return qtype, local, body


def _qf_spec(s: str) -> dict[str, float]:
    """Solr qf syntax: "title^2 text" → {field: boost}."""
    out = {}
    for part in (s or "").split():
        if "^" in part:
            f, b = part.rsplit("^", 1)
            out[f] = float(b)
        else:
            out[part] = 1.0
    return out


def _num(local: dict, key: str):
    v = local.get(key)
    return None if v in (None, "", "*") else float(v)


def solr_query(searcher, q: str, analyzer=None, docs: DataFrame | None = None,
               params: dict | None = None) -> DataFrame:
    """Execute a Solr-syntax query string → (doc_id, score).

    ``analyzer`` defaults to the searcher index's analyzer; ``docs`` is
    the docvalues table required by the function-query types (frange /
    boost / func); ``params`` backs ``$ref`` dereferencing.
    """
    from . import dismax as dm
    from . import function as fn
    from .parser import parse_query
    analyzer = analyzer or searcher.index.analyzer
    qtype, local, body = parse_local_params(q, params)
    field = local.get("f", local.get("df", DEFAULT_FIELD))

    if qtype in (None, "lucene", "query"):
        ast = parse_query(body, analyzer, default_field=field,
                          default_operator=local.get("q.op", "OR"))
        return searcher.score_all(ast, mode="f64")
    if qtype == "term":
        # raw term, NO analysis (TermQParserPlugin.java:60)
        return searcher.score_all(TermQuery(body, field), mode="f64")
    if qtype == "prefix":
        # raw prefix, NO analysis (PrefixQParserPlugin.java:35)
        return searcher.score_all(PrefixQuery(body, field), mode="f64")
    if qtype == "simple":
        from .simpleparser import SimpleQueryParser
        ast = SimpleQueryParser(analyzer, field).parse(body)
        return searcher.score_all(ast, mode="f64")
    if qtype == "surround":
        from .surround import parse_surround, rewrite_surround
        ast = rewrite_surround(searcher, parse_surround(body, field))
        return searcher.score_all(ast, mode="f64")
    if qtype in ("dismax", "edismax"):
        qf = _qf_spec(local.get("qf", "")) or {field: 1.0}
        pf = _qf_spec(local.get("pf", "")) or None
        ast = dm.dismax_query(body, analyzer, qf=qf,
                              tie=float(local.get("tie", 0.0)),
                              pf=pf, mm=int(local.get("mm", 0)))
        return searcher.score_all(ast, mode="f64")
    if qtype == "frange":
        if docs is None:
            raise LocalParamsError("{!frange} needs the docvalues table")
        return fn.function_range_filter(
            searcher, MatchAllQuery(), docs, body,
            lower=_num(local, "l"), upper=_num(local, "u"),
            include_lower=local.get("incl", "true") != "false",
            include_upper=local.get("incu", "true") != "false")
    if qtype == "boost":
        if docs is None:
            raise LocalParamsError("{!boost} needs the docvalues table")
        if "b" not in local:
            raise LocalParamsError("{!boost} needs b=<function>")
        inner = parse_query(body, analyzer, default_field=field)
        return fn.function_score(searcher, inner, docs, local["b"],
                                 combine="multiply")
    if qtype == "func":
        if docs is None:
            raise LocalParamsError("{!func} needs the docvalues table")
        return fn.function_score(searcher, MatchAllQuery(), docs, body,
                                 combine="replace")
    if qtype == "collapse":
        # CollapsingQParserPlugin.java:121 default (min/max=score): the
        # single best hit per distinct field value, applied to the
        # match-all result set (Solr applies collapse as an fq over the
        # main query; compose via collapse() directly for other mains)
        from .grouping import collapse as _collapse
        if docs is None:
            raise LocalParamsError("{!collapse} needs the docvalues table")
        if "field" not in local:
            raise LocalParamsError("{!collapse} needs field=<field>")
        inner = (parse_query(body, analyzer, default_field=field)
                 if body.strip() else MatchAllQuery())
        hits = searcher.score_all(inner, mode="f64")
        return _collapse(hits, docs, local["field"]) \
            .select("doc_id", "score")
    if qtype == "join":
        # JoinQParserPlugin.java:60 — {!join from=f to=t}query over one
        # collection: docs carries both sides' join columns
        from .join import join_query
        if docs is None:
            raise LocalParamsError("{!join} needs the docvalues table")
        if "from" not in local or "to" not in local:
            raise LocalParamsError("{!join} needs from= and to=")
        inner = parse_query(body, analyzer, default_field=field)
        return join_query(searcher, inner, docs, local["from"], docs,
                          local["to"],
                          score_mode=local.get("score", "none"))
    if qtype == "mlt":
        # MLTQParser (solr/.../MoreLikeThisQParserPlugin): body is the
        # seed document id; qf names the field
        from .mlt import more_like_this
        if docs is None:
            raise LocalParamsError("{!mlt} needs the document store")
        fld = local.get("qf", field)
        sel = {}
        if "mintf" in local:
            sel["min_term_freq"] = int(local["mintf"])
        if "mindf" in local:
            sel["min_doc_freq"] = int(local["mindf"])
        if "maxqt" in local:
            sel["max_query_terms"] = int(local["maxqt"])
        return more_like_this(searcher, docs, int(body), fld,
                              k=int(local.get("rows", 10)), **sel)
    raise LocalParamsError(f"unknown query parser type {qtype!r}")

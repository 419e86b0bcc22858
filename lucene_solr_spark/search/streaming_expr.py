"""Solr Streaming Expressions — the `solrj/io/stream` TupleStream DSL
compiled to DataFrame plans.

References (semantics only):
- `solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/expr/
  StreamExpressionParser.java:28` — the `fn(operand, name=value, ...)`
  grammar (nested expressions, quoted values).
- `.../io/stream/CloudSolrStream.java:73` (search source: q/fl/sort,
  `/export` streams the full sorted result set),
  `SelectStream.java:49` (field projection + `as` renames),
  `UniqueStream.java:40` (first tuple per `over` key in stream order),
  `RankStream.java:41` (top: n + sort), `SortStream.java:39`,
  `RollupStream.java:48` (GROUP BY `over` with metric functions
  `SumMetric/MeanMetric/MinMetric/MaxMetric/CountMetric`),
  `InnerJoinStream.java:37` / `LeftOuterJoinStream.java:34` /
  `HashJoinStream.java:51` (on="a=b" equality joins),
  `MergeStream.java:38` (sorted union), `IntersectStream.java:38`,
  `ComplementStream.java:38`, `HavingStream.java:40` with boolean
  evaluators `eq/gt/lt/gteq/lteq/and/or/not`
  (`.../io/eval/GreaterThanEvaluator.java` etc).

Spark shape: the reference implements each decorator as a pull-based
iterator over sorted tuple streams from shards — merge-join innerJoin,
streaming rollup over sorted keys. Here every decorator is the
DECLARATIVE equivalent (groupBy/join/window), so Catalyst picks the
physical strategy (hash vs sort-merge vs broadcast) by size — the
expression tree is a logical plan, not an execution recipe. `search`
rides the scoring kernel; `/export`-style full streams never collect to
the driver. Each compiled stream carries its declared sort as metadata
(the reference's StreamComparator) so order-sensitive decorators
(unique, merge) can honor it without a physical sort per stage.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# expression parser (StreamExpressionParser)
# ---------------------------------------------------------------------------

_TOK = re.compile(r'''\s*(?:(?P<q>"(?:[^"\\]|\\.)*")
                          |(?P<sym>[(),=])
                          |(?P<w>[^\s(),=]+))''', re.VERBOSE)


class Expr:
    """A parsed `name(...)` node: positional operands (Expr | str) and
    named parameters (str | Expr)."""

    def __init__(self, name):
        self.name = name
        self.args: list = []
        self.params: dict = {}

    def __repr__(self):
        inner = [repr(a) for a in self.args]
        inner += [f"{k}={v!r}" for k, v in self.params.items()]
        return f"{self.name}({', '.join(inner)})"


def _tokens(src: str):
    out, i = [], 0
    while i < len(src):
        m = _TOK.match(src, i)
        if not m or m.end() == i:
            if src[i:].strip():
                raise ValueError(f"bad token at {i} in {src!r}")
            break
        i = m.end()
        if m.group("q") is not None:
            out.append(("str", m.group("q")[1:-1].replace('\\"', '"')))
        elif m.group("sym") is not None:
            out.append(("sym", m.group("sym")))
        else:
            out.append(("word", m.group("w")))
    return out


def parse_stream_expr(src: str) -> Expr:
    toks = _tokens(src)
    pos = 0

    def take(want=None):
        nonlocal pos
        if pos >= len(toks):
            raise ValueError("unexpected end of expression")
        k, v = toks[pos]
        if want is not None and (k, v) != ("sym", want):
            raise ValueError(f"expected {want!r}, found {v!r}")
        pos += 1
        return k, v

    def peek(off=0):
        return toks[pos + off] if pos + off < len(toks) else ("eof", "")

    def expression():
        k, name = take()
        if k != "word":
            raise ValueError(f"expected function name, found {name!r}")
        take("(")
        node = Expr(name)
        while peek() != ("sym", ")"):
            k, v = peek()
            if (k == "word" and peek(1) == ("sym", "=")):
                take()
                take("=")
                kk, vv = peek()
                if kk == "word" and peek(1) == ("sym", "("):
                    node.params[v] = expression()
                else:
                    take()
                    node.params[v] = vv
            elif k == "word" and peek(1) == ("sym", "("):
                node.args.append(expression())
            else:
                take()
                node.args.append(v)
            if peek() == ("sym", ","):
                take()
        take(")")
        return node

    node = expression()
    if pos != len(toks):
        raise ValueError(f"trailing input after {node.name}(...)")
    return node


# ---------------------------------------------------------------------------
# compiled stream = DataFrame + declared sort (StreamComparator analog)
# ---------------------------------------------------------------------------

class Stream:
    def __init__(self, df: DataFrame, sort_spec: list | None = None):
        self.df = df
        self.sort_spec = sort_spec or []      # [(field, ascending)]

    def sort_cols(self):
        return [F.asc(f) if a else F.desc(f) for f, a in self.sort_spec]


def _parse_sort(spec: str) -> list:
    out = []
    for part in spec.split(","):
        bits = part.split()
        if not bits:
            continue
        if len(bits) == 1:
            out.append((bits[0], True))
        elif bits[1].lower() in ("asc", "desc"):
            out.append((bits[0], bits[1].lower() == "asc"))
        else:
            raise ValueError(f"bad sort clause {part!r}")
    return out


def _parse_on(spec: str) -> list:
    """on="a=b,c" → [(left_field, right_field)]."""
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            l, r = part.split("=", 1)
            out.append((l.strip(), r.strip()))
        else:
            out.append((part, part))
    return out


_METRICS = {"sum", "avg", "min", "max", "count"}

_BOOL_OPS = {"eq", "gt", "lt", "gteq", "lteq", "and", "or", "not"}


def _metric_col(node: Expr):
    """sum(a) → (F.sum("a"), "sum(a)") — output named exactly as the
    reference's Metric.getIdentifier."""
    fn = node.name
    arg = node.args[0] if node.args else "*"
    ident = f"{fn}({arg})"
    if fn == "count":
        return F.count("*").alias(ident), ident
    if fn == "avg":
        # MeanMetric's identifier is avg(col)
        return F.avg(arg).alias(ident), ident
    return getattr(F, fn)(arg).alias(ident), ident


def _bool_col(node: Expr):
    """HavingStream boolean evaluators → Column predicate. Operands are
    field names, numbers, or nested boolean ops."""
    def operand(x):
        if isinstance(x, Expr):
            if x.name in _BOOL_OPS:
                return _bool_col(x)
            # a metric identifier like sum(n) names a tuple field
            return F.col(f"{x.name}({x.args[0] if x.args else '*'})")
        try:
            return F.lit(float(x))
        except (TypeError, ValueError):
            return F.col(x)
    a = node.args
    if node.name == "and":
        c = _bool_col(a[0])
        for x in a[1:]:
            c = c & _bool_col(x)
        return c
    if node.name == "or":
        c = _bool_col(a[0])
        for x in a[1:]:
            c = c | _bool_col(x)
        return c
    if node.name == "not":
        return ~_bool_col(a[0])
    l, r = operand(a[0]), operand(a[1])
    return {"eq": l == r, "gt": l > r, "lt": l < r,
            "gteq": l >= r, "lteq": l <= r}[node.name]


class StreamFactory:
    """Compiles a parsed streaming expression against named collections.

    `collections` maps collection name → (docs DataFrame, Searcher);
    the Searcher may be None for pure-relational streams (q must then be
    '*:*'). `search`'s `q` is parsed with the collection's analyzer via
    the classic query parser."""

    def __init__(self, collections: dict):
        self.collections = collections

    # -- sources --------------------------------------------------------
    def _search(self, node: Expr) -> Stream:
        if not node.args or isinstance(node.args[0], Expr):
            raise ValueError("search(collection, ...) needs a collection")
        coll = node.args[0]
        if coll not in self.collections:
            raise KeyError(f"unknown collection {coll!r} "
                           f"(have {sorted(self.collections)})")
        docs, searcher = self.collections[coll]
        q = node.params.get("q", "*:*")
        fl = [f.strip() for f in node.params.get("fl", "").split(",")
              if f.strip()]
        if not fl:
            raise ValueError("search requires fl=")
        sort = _parse_sort(node.params.get("sort", ""))
        want_score = "score" in fl
        side = [f for f in fl if f not in ("score",)]
        if q in ("*:*", ""):
            out = docs.select(*side)
            if want_score:
                out = out.withColumn("score", F.lit(1.0))
        else:
            if searcher is None:
                raise ValueError(f"collection {coll!r} has no index; "
                                 f"only q='*:*' is supported")
            from .parser import parse_query
            hits = searcher.score_all(
                parse_query(q, searcher.index.analyzer), mode="f64")
            out = hits.join(docs, "doc_id").select(
                *side, *([F.col("score")] if want_score else []))
        # /select caps rows (default 20); qt=/export streams everything
        qt = node.params.get("qt", "/select")
        if sort:
            ob = [F.asc(f) if a else F.desc(f) for f, a in sort]
            if qt != "/export" or "rows" in node.params:
                rows = int(node.params.get("rows", 20))
                out = out.orderBy(*ob).limit(rows)
        elif qt != "/export" or "rows" in node.params:
            raise ValueError("search without sort= needs qt=/export")
        return Stream(out, sort)

    def _facet(self, node: Expr) -> Stream:
        """FacetStream.java:63: aggregate the q match set over bucket
        dims with metrics, ordered by bucketSorts, bucketSizeLimit rows.
        Compiles to one groupBy over the kernel match set — the
        reference pushes this to the JSON facet API; here Catalyst's
        partial aggregation is the same two-phase shape."""
        inner = Expr("search")
        inner.args = [node.args[0]]
        buckets = [b.strip() for b in node.params["buckets"].split(",")]
        metrics = [a for a in node.args[1:]
                   if isinstance(a, Expr) and a.name in _METRICS]
        if not metrics:
            raise ValueError("facet needs at least one metric")
        fields = set(buckets)
        for mx in metrics:
            if mx.args and mx.args[0] != "*":
                fields.add(mx.args[0])
        inner.params = {"q": node.params.get("q", "*:*"),
                        "fl": ",".join(sorted(fields)), "qt": "/export"}
        src = self._search(inner)
        aggs = [_metric_col(mx)[0] for mx in metrics]
        out = src.df.groupBy(*buckets).agg(*aggs)
        sorts = _parse_sort(node.params.get(
            "bucketSorts", ", ".join(f"{b} asc" for b in buckets)))
        ob = [F.asc(f) if a else F.desc(f) for f, a in sorts]
        lim = int(node.params.get("bucketSizeLimit", 10))
        return Stream(out.orderBy(*ob).limit(lim), sorts)

    def _stats(self, node: Expr) -> Stream:
        """StatsStream.java:47: one global-aggregate tuple over the q
        match set."""
        inner = Expr("search")
        inner.args = [node.args[0]]
        metrics = [a for a in node.args[1:]
                   if isinstance(a, Expr) and a.name in _METRICS]
        if not metrics:
            raise ValueError("stats needs at least one metric")
        fields = {mx.args[0] for mx in metrics
                  if mx.args and mx.args[0] != "*"}
        inner.params = {"q": node.params.get("q", "*:*"),
                        "fl": ",".join(sorted(fields) or ["doc_id"]),
                        "qt": "/export"}
        src = self._search(inner)
        aggs = [_metric_col(mx)[0] for mx in metrics]
        return Stream(src.df.agg(*aggs), [])

    # -- decorators ------------------------------------------------------
    def _fetch(self, node: Expr) -> Stream:
        """FetchStream.java:48: decorate each tuple with extra stored
        fields from a collection, matched ``on="streamKey=collKey"``.
        The reference batches point-lookups (batchSize tuples per /get
        round-trip); declaratively it is a LEFT join against the doc
        store — Catalyst broadcasts whichever side is small, and the
        batched-lookup shape falls out of a broadcast of the stream
        side. batchSize is accepted and ignored (a physical knob)."""
        coll = node.args[0]
        if coll not in self.collections:
            raise KeyError(f"unknown collection {coll!r}")
        docs, _ = self.collections[coll]
        src = self.compile(node.args[1])
        fl = [f.strip() for f in node.params.get("fl", "").split(",")
              if f.strip()]
        if not fl:
            raise ValueError("fetch requires fl=")
        on = node.params.get("on", "doc_id=doc_id")
        lk, rk = (on.split("=") + [on])[:2] if "=" in on else (on, on)
        side = docs.select(F.col(rk.strip()).alias("__fetch_key"),
                           *[F.col(f) for f in fl])
        out = (src.df.join(side,
                           src.df[lk.strip()] == side["__fetch_key"],
                           "left").drop("__fetch_key"))
        return Stream(out, src.sort_spec)

    def _select(self, node: Expr) -> Stream:
        src = self.compile(node.args[0])
        cols = []
        for a in node.args[1:]:
            if isinstance(a, Expr):
                raise ValueError("select supports field [as alias] only")
            m = re.fullmatch(r"(\S+)\s+as\s+(\S+)", a)
            cols.append(F.col(m.group(1)).alias(m.group(2)) if m
                        else F.col(a))
        rename = {re.fullmatch(r"(\S+)\s+as\s+(\S+)", a).group(1):
                  re.fullmatch(r"(\S+)\s+as\s+(\S+)", a).group(2)
                  for a in node.args[1:]
                  if not isinstance(a, Expr)
                  and re.fullmatch(r"(\S+)\s+as\s+(\S+)", a)}
        sort = [(rename.get(f, f), asc) for f, asc in src.sort_spec]
        return Stream(src.df.select(*cols), sort)

    def _unique(self, node: Expr) -> Stream:
        src = self.compile(node.args[0])
        over = [f.strip() for f in node.params["over"].split(",")]
        from pyspark.sql import Window
        order = src.sort_cols() or [F.asc(over[0])]
        w = Window.partitionBy(*over).orderBy(*order)
        df = (src.df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))
        return Stream(df, src.sort_spec)

    def _top(self, node: Expr) -> Stream:
        src = self.compile(node.args[0])
        sort = _parse_sort(node.params["sort"])
        n = int(node.params["n"])
        ob = [F.asc(f) if a else F.desc(f) for f, a in sort]
        return Stream(src.df.orderBy(*ob).limit(n), sort)

    def _sort(self, node: Expr) -> Stream:
        src = self.compile(node.args[0])
        sort = _parse_sort(node.params["by"])
        ob = [F.asc(f) if a else F.desc(f) for f, a in sort]
        return Stream(src.df.orderBy(*ob), sort)

    def _rollup(self, node: Expr) -> Stream:
        src = self.compile(node.args[0])
        over = [f.strip() for f in node.params["over"].split(",")]
        metrics = [a for a in node.args[1:]
                   if isinstance(a, Expr) and a.name in _METRICS]
        if not metrics:
            raise ValueError("rollup needs at least one metric")
        aggs = [_metric_col(mx)[0] for mx in metrics]
        return Stream(src.df.groupBy(*over).agg(*aggs),
                      [(f, True) for f in over])

    def _join(self, node: Expr, how: str) -> Stream:
        left = self.compile(node.args[0])
        right = self.compile(node.args[1])
        on = _parse_on(node.params["on"])
        cond = None
        r = right.df
        for lf, rf in on:
            if lf == rf:
                r = r.withColumnRenamed(rf, f"_r_{rf}")
                rf = f"_r_{rf}"
            c = left.df[lf] == r[rf]
            cond = c if cond is None else (cond & c)
        joined = left.df.join(r, cond, how)
        drop = [f"_r_{lf}" for lf, rf in on if lf == rf]
        for d in drop:
            joined = joined.drop(d)
        # right-side duplicates of equal-named join keys already dropped;
        # remaining right fields ride along (reference merges tuples)
        return Stream(joined, left.sort_spec)

    def _merge(self, node: Expr) -> Stream:
        streams = [self.compile(a) for a in node.args
                   if isinstance(a, Expr)]
        sort = _parse_sort(node.params["on"])
        df = streams[0].df
        for s in streams[1:]:
            df = df.unionByName(s.df)
        ob = [F.asc(f) if a else F.desc(f) for f, a in sort]
        return Stream(df.orderBy(*ob), sort)

    def _intersect(self, node: Expr) -> Stream:
        left = self.compile(node.args[0])
        right = self.compile(node.args[1])
        on = _parse_on(node.params["on"])
        cond = [left.df[lf] == right.df[rf] for lf, rf in on]
        c = cond[0]
        for x in cond[1:]:
            c = c & x
        return Stream(left.df.join(right.df, c, "left_semi"),
                      left.sort_spec)

    def _complement(self, node: Expr) -> Stream:
        left = self.compile(node.args[0])
        right = self.compile(node.args[1])
        on = _parse_on(node.params["on"])
        cond = [left.df[lf] == right.df[rf] for lf, rf in on]
        c = cond[0]
        for x in cond[1:]:
            c = c & x
        return Stream(left.df.join(right.df, c, "left_anti"),
                      left.sort_spec)

    def _having(self, node: Expr) -> Stream:
        src = self.compile(node.args[0])
        ops = [a for a in node.args[1:] if isinstance(a, Expr)]
        if len(ops) != 1 or ops[0].name not in _BOOL_OPS:
            raise ValueError("having(stream, booleanOp) needs exactly one "
                             "boolean evaluator")
        return Stream(src.df.filter(_bool_col(ops[0])), src.sort_spec)

    def _timeseries(self, node: Expr) -> Stream:
        """TimeSeriesStream (`solr/solrj/src/java/org/apache/solr/client/
        solrj/io/stream/TimeSeriesStream.java:62`): metrics per date-math
        bucket of ``field`` between ``start`` and ``end`` stepping
        ``gap`` — the reference pushes a JSON facet range; here the
        boundary ladder is a driver constant (see search/datemath.py)
        and bucket assignment ONE codegen expression: index = number of
        boundaries ≤ ts, via filter+size over a literal timestamp array
        — no CASE chain growth, no join, then one groupBy(bucket).
        Every bucket in [start, end) is emitted, empty ones with
        count 0 and null metrics (the facet-range contract). Buckets
        are labeled with the ISO instant of their start (the
        reference's default format) and sorted ascending."""
        from .datemath import date_boundaries
        coll = node.args[0]
        field = node.params["field"]
        bounds = date_boundaries(node.params["start"], node.params["end"],
                                 node.params["gap"])
        labels = [b.strftime("%Y-%m-%dT%H:%M:%SZ") for b in bounds[:-1]]
        metrics = [a for a in node.args[1:]
                   if isinstance(a, Expr) and a.name in _METRICS]
        if not metrics:
            raise ValueError("timeseries needs at least one metric")
        inner = Expr("search")
        inner.args = [coll]
        fields = {field}
        for mx in metrics:
            if mx.args and mx.args[0] != "*":
                fields.add(mx.args[0])
        inner.params = {"q": node.params.get("q", "*:*"),
                        "fl": ",".join(sorted(fields)), "qt": "/export"}
        src = self._search(inner).df
        ts = F.col(field)
        barr = F.array(*[F.lit(b) for b in bounds])
        idx = F.size(F.filter(barr, lambda b: b <= ts))
        larr = F.array(*[F.lit(s) for s in labels])
        binned = (src.filter((ts >= F.lit(bounds[0])) &
                             (ts < F.lit(bounds[-1])))
                  .withColumn(field, F.element_at(larr, idx)))
        aggs = [_metric_col(mx)[0] for mx in metrics]
        got = binned.groupBy(field).agg(*aggs)
        spark = src.sparkSession
        all_buckets = spark.createDataFrame([(s,) for s in labels], [field])
        out = all_buckets.join(got, field, "left")
        for mx in metrics:
            _, ident = _metric_col(mx)
            if mx.name == "count":
                out = out.withColumn(ident,
                                     F.coalesce(F.col(f"`{ident}`"),
                                                F.lit(0)))
        return Stream(out.orderBy(F.asc(field)), [(field, True)])

    # -- dispatch --------------------------------------------------------
    def compile(self, node) -> Stream:
        if isinstance(node, str):
            node = parse_stream_expr(node)
        fn = node.name
        if fn == "search":
            return self._search(node)
        if fn == "facet":
            return self._facet(node)
        if fn == "stats":
            return self._stats(node)
        if fn == "select":
            return self._select(node)
        if fn == "unique":
            return self._unique(node)
        if fn == "top":
            return self._top(node)
        if fn == "sort":
            return self._sort(node)
        if fn == "rollup":
            return self._rollup(node)
        if fn in ("innerJoin", "hashJoin"):
            # hashJoin is a physical hint in the reference; Catalyst
            # picks the join strategy, so both compile identically
            return self._join(node, "inner")
        if fn == "leftOuterJoin":
            return self._join(node, "left")
        if fn == "merge":
            return self._merge(node)
        if fn == "intersect":
            return self._intersect(node)
        if fn == "complement":
            return self._complement(node)
        if fn == "having":
            return self._having(node)
        if fn == "fetch":
            return self._fetch(node)
        if fn == "timeseries":
            return self._timeseries(node)
        if fn == "shortestPath":
            return self._shortest_path(node)
        if fn == "knn":
            return self._knn(node)
        raise ValueError(f"unknown stream function {fn!r}")

    def _shortest_path(self, node: Expr) -> Stream:
        """ShortestPathStream (`solrj/io/graph/ShortestPathStream.
        java`): shortestPath(coll, from="1", to="777",
        edge="src=dst", maxDepth=8) — the collection IS the edge
        relation; emits one row per shortest path, field ``path`` =
        '->'-joined node ids (the reference emits the same ids as a
        List tuple — documented envelope). threads/partitionSize are
        accepted and ignored: Spark owns physical parallelism."""
        from .graph import shortest_path
        coll = node.args[0]
        docs, _ = self.collections[coll]
        frm, to = node.params["from"], node.params["to"]
        fcol, tcol = (s.strip() for s in node.params["edge"].split("="))
        depth = int(node.params.get("maxDepth", 6))
        out = shortest_path(docs, fcol, tcol, frm, to, max_depth=depth)
        return Stream(out.orderBy("path"), [("path", True)])

    def _knn(self, node: Expr) -> Stream:
        """KnnStream (`solrj/io/stream/KnnStream.java`): the
        MoreLikeThis-based k-nearest stream — knn(coll, id="42",
        qf="text", k="10", mintf=.., mindf=..) emits the k most
        similar documents to the seed doc (seed excluded), scored by
        the reference-exact MLT path."""
        from .mlt import more_like_this
        coll = node.args[0]
        docs, searcher = self.collections[coll]
        if searcher is None:
            raise ValueError(f"collection {coll!r} has no index")
        sel = {}
        if "mintf" in node.params:
            sel["min_term_freq"] = int(node.params["mintf"])
        if "mindf" in node.params:
            sel["min_doc_freq"] = int(node.params["mindf"])
        out = more_like_this(searcher, docs, int(node.params["id"]),
                             field=node.params.get("qf", "text"),
                             k=int(node.params.get("k", 10)), **sel)
        return Stream(out, [("score", False), ("doc_id", True)])

    def dataframe(self, expr: str) -> DataFrame:
        """Compile and return the final DataFrame (stream order is the
        declared sort; materialize with .collect()/.toLocalIterator())."""
        s = self.compile(expr)
        return s.df

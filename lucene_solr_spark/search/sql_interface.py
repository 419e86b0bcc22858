"""Solr Parallel SQL — a SQL subset compiled to streaming expressions.

Reference semantics (`solr/core/src/java/org/apache/solr/handler/
SQLHandler.java:54` over the solrj `io/sql` Calcite adapter): Solr's
/sql handler plans `SELECT … FROM collection …` into STREAMING
EXPRESSIONS — `search` sources with pushed sorts, `rollup` for GROUP
BY, `having` for HAVING, `top`/`sort` for ORDER BY/LIMIT, `unique`
for SELECT DISTINCT — and executes those. This module restates that
planner for the grammar subset below and hands the generated
expression to `search/streaming_expr.py`'s StreamFactory, so SQL and
hand-written streaming expressions run the IDENTICAL plans.

Grammar (one collection, AND-conjoined WHERE):

  SELECT [DISTINCT] col [AS a] | agg(col|*) [AS a], …
  FROM <collection>
  [WHERE pred AND pred …]      pred: col OP literal  (OP: = != < <= > >=)
                               col LIKE 'pre%'  (prefix, indexed fields)
  [GROUP BY col, …] [HAVING agg(col) OP number [AND …]]
  [ORDER BY col|alias [ASC|DESC], …] [LIMIT n]

Predicate routing (the Spark-first part): an ``=``/LIKE predicate on
an INDEXED field becomes the search ``q`` (term / phrase / prefix —
kernel-served); numeric comparisons compile to ``having`` evaluators
(Catalyst filter); anything else (e.g. equality on an unindexed string
column) becomes a PRE-FILTERED derived collection — one Catalyst
predicate pushed at the row-store scan before the expression runs.
The emitted expression is returned alongside the DataFrame so the
translation is inspectable, like EXPLAIN on the reference handler.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

_AGGS = ("count", "sum", "min", "max", "avg")

_TOK = re.compile(r"'(?:[^'\\]|\\.)*'|>=|<=|!=|[(),=<>*]|[^\s(),=<>]+")


class SQLError(ValueError):
    pass


@dataclass
class _Sel:
    kind: str                  # "col" | "agg"
    name: str                  # column, or metric text "sum(x)"
    alias: str | None = None


@dataclass
class _Query:
    select: list = field(default_factory=list)
    distinct: bool = False
    table: str = ""
    where: list = field(default_factory=list)   # (col, op, raw, is_str)
    group_by: list = field(default_factory=list)
    having: list = field(default_factory=list)  # (metric, op, number)
    order_by: list = field(default_factory=list)  # (name, asc)
    limit: int | None = None


def _strip(s: str) -> str:
    return s[1:-1].replace("\\'", "'") if s.startswith("'") else s


def parse_sql(sql: str) -> _Query:
    toks = _TOK.findall(sql)
    q = _Query()
    i = 0

    def peek():
        return toks[i].upper() if i < len(toks) else None

    def eat(want=None):
        nonlocal i
        if i >= len(toks):
            raise SQLError(f"unexpected end of query (wanted {want})")
        t = toks[i]
        i += 1
        if want and t.upper() != want:
            raise SQLError(f"expected {want}, got {t!r}")
        return t

    eat("SELECT")
    if peek() == "DISTINCT":
        eat()
        q.distinct = True
    while True:
        t = eat()
        if t.lower() in _AGGS and peek() == "(":
            eat("(")
            arg = eat()
            eat(")")
            if t.lower() != "count" and arg == "*":
                raise SQLError(f"{t}(*) is count-only")
            sel = _Sel("agg", f"{t.lower()}({arg})")
        else:
            sel = _Sel("col", t)
        if peek() == "AS":
            eat()
            sel.alias = eat()
        q.select.append(sel)
        if peek() == ",":
            eat()
            continue
        break
    eat("FROM")
    q.table = eat()
    if peek() == "WHERE":
        eat()
        while True:
            col = eat()
            op = eat()
            if op.upper() == "LIKE":
                op = "like"
            elif op not in ("=", "!=", "<", "<=", ">", ">="):
                raise SQLError(f"unsupported operator {op!r}")
            raw = eat()
            q.where.append((col, op, _strip(raw), raw.startswith("'")))
            if peek() == "AND":
                eat()
                continue
            break
    if peek() == "GROUP":
        eat()
        eat("BY")
        while True:
            q.group_by.append(eat())
            if peek() == ",":
                eat()
                continue
            break
    if peek() == "HAVING":
        eat()
        while True:
            t = eat()
            if t.lower() not in _AGGS:
                raise SQLError("HAVING supports aggregate comparisons")
            eat("(")
            arg = eat()
            eat(")")
            op = eat()
            num = eat()
            q.having.append((f"{t.lower()}({arg})", op, num))
            if peek() == "AND":
                eat()
                continue
            break
    if peek() == "ORDER":
        eat()
        eat("BY")
        while True:
            name = eat()
            asc = True
            if peek() in ("ASC", "DESC"):
                asc = eat().upper() == "ASC"
            q.order_by.append((name, asc))
            if peek() == ",":
                eat()
                continue
            break
    if peek() == "LIMIT":
        eat()
        q.limit = int(eat())
    if i < len(toks):
        raise SQLError(f"trailing tokens: {toks[i:]}")
    return q


_HOPS = {"=": "eq", ">": "gt", "<": "lt", ">=": "gteq", "<=": "lteq"}


def _alias_map(q: _Query) -> dict[str, str]:
    return {s.name: s.alias for s in q.select if s.alias}


def sql_to_stream_expr(q: _Query, indexed_fields: set[str]
                       ) -> tuple[str, list]:
    """→ (streaming expression, residual row-store predicates)."""
    tq, havings, residual = [], [], []
    for col, op, val, is_str in q.where:
        if col in indexed_fields and is_str and op in ("=", "like"):
            if op == "like":
                if not val.endswith("%") or "%" in val[:-1]:
                    raise SQLError("LIKE supports 'prefix%' only")
                tq.append(f"{col}:{val[:-1]}*")
            elif " " in val:
                tq.append(f'{col}:"{val}"')
            else:
                tq.append(f"{col}:{val}")
        elif not is_str:
            if op == "!=":
                havings.append(f"not(eq({col},{val}))")
            else:
                havings.append(f"{_HOPS[op]}({col},{val})")
        else:
            residual.append((col, op, val))
    # phrase predicates carry inner quotes — escape for the DSL string
    qstr = (" AND ".join(tq) if tq else "*:*").replace('"', '\\"')

    aggs = [s for s in q.select if s.kind == "agg"]
    cols = [s.name for s in q.select if s.kind == "col"]
    if aggs and not q.group_by:
        raise SQLError("aggregates need GROUP BY (no global-agg subset)")
    if q.group_by:
        fl = sorted(set(q.group_by)
                    | {c for c in cols}
                    | {m.name.split("(")[1][:-1] for m in aggs
                       if not m.name.endswith("(*)")})
        sort = ",".join(f"{g} asc" for g in q.group_by)
    else:
        amap0 = _alias_map(q)
        back0 = {v: k for k, v in amap0.items()}
        fl = sorted(set(cols)
                    | {c for c, _, _, s_ in q.where if not s_}
                    | {back0.get(n, n) for n, _ in q.order_by}
                    | {"doc_id"})
        sort = ""
    expr = (f'search({q.table}, q="{qstr}", fl="{",".join(fl)}", '
            f'qt="/export"' + (f', sort="{sort}"' if sort else "") + ")")
    if havings and not q.group_by:
        expr = f'having({expr}, and({",".join(havings)}))' \
            if len(havings) > 1 else f"having({expr}, {havings[0]})"
    if q.group_by:
        if havings:
            expr = f'having({expr}, and({",".join(havings)}))' \
                if len(havings) > 1 else f"having({expr}, {havings[0]})"
        metrics = ",".join(m.name for m in aggs) or "count(*)"
        expr = f'rollup({expr}, over="{",".join(q.group_by)}", {metrics})'
        for m, op, num in q.having:
            if op == "!=":
                expr = f"having({expr}, not(eq({m},{num})))"
            elif op in _HOPS:
                expr = f"having({expr}, {_HOPS[op]}({m},{num}))"
            else:
                raise SQLError(f"unsupported HAVING operator {op!r}")
    if q.distinct:
        if aggs or len(cols) != len(q.select):
            raise SQLError("DISTINCT applies to plain column selects")
        expr = f'unique({expr}, over="{",".join(cols)}")'
    amap = _alias_map(q)
    if q.order_by:
        names = []
        for n, asc in q.order_by:
            # ORDER BY may use the alias; the stream carries the
            # metric identifier — translate back
            back = {v: k for k, v in amap.items()}
            names.append(f"{back.get(n, n)} {'asc' if asc else 'desc'}")
        if q.limit is not None and not residual:
            expr = f'top({expr}, n={q.limit}, sort="{",".join(names)}")'
        else:
            expr = f'sort({expr}, by="{",".join(names)}")'
    return expr, residual


def solr_sql(factory, sql: str) -> dict:
    """Execute SQL through the streaming-expression planner.

    ``factory`` is a `streaming_expr.StreamFactory`; → {"expr": the
    generated streaming expression, "df": result DataFrame,
    "residual": pre-filter description or None}.
    """
    q = parse_sql(sql)
    if q.table not in factory.collections:
        raise SQLError(f"unknown collection {q.table!r}")
    docs, searcher = factory.collections[q.table]
    indexed = set(searcher.index.fields) if searcher is not None else set()
    expr, residual = sql_to_stream_expr(q, indexed)
    fac = factory
    res_desc = None
    if residual:
        # unindexed-column predicates: pre-filter the row store — one
        # Catalyst predicate pushed at the scan, before the expression
        pred = F.lit(True)
        for col, op, val in residual:
            c = F.col(col)
            pred = pred & {"=": c == val, "!=": c != val,
                           "<": c < val, "<=": c <= val,
                           ">": c > val, ">=": c >= val}[op]
        from .streaming_expr import StreamFactory
        fac = StreamFactory({**factory.collections,
                             q.table: (docs.filter(pred), searcher)})
        res_desc = " AND ".join(f"{c} {o} {v!r}" for c, o, v in residual)
    stream = fac.compile(expr)
    df = stream.df
    if q.limit is not None and "top(" not in expr:
        df = df.limit(q.limit)
    # final projection: stream columns (metric identifiers) → SELECT
    # list order with AS aliases applied
    df = df.select(*[F.col(s.name).alias(s.alias) if s.alias
                     else F.col(s.name) for s in q.select])
    return {"expr": expr, "df": df, "residual": res_desc}

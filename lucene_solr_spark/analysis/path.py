"""PathHierarchyTokenizer analog — cumulative path-prefix tokens.

Mirrors `lucene/analysis/common/src/java/org/apache/lucene/analysis/
path/PathHierarchyTokenizer.java:43-60`:

    /something/something/else  →  /something
                                  /something/something
                                  /something/something/else

with the reference's parameters: ``delimiter`` (default '/'),
``replacement`` (emitted in place of the delimiter, default =
delimiter), and ``skip`` (drop that many LEADING path components; the
emitted tokens then start at component skip+1, with the skipped
prefix replaced — `PathHierarchyTokenizer.java:80-105`).  Position
increments are 1 for the first token and 0 after (all prefixes stack
on one position) — matching how the reference emits a single position
for the whole hierarchy.

Typical web-corpus use is faceting on URL path prefixes (the Solr
`descendent_path` field type), which is why the Catalyst twin returns
an ARRAY ready for explode+groupBy: one codegen Project + one
map-side-combined count — the same plan shape as every other facet.

Twins, differential-tested in tests/test_pathngrams.py:

* :func:`path_hierarchy_expr` — pure Catalyst (split + sequence +
  transform + array_join), whole-stage codegen.
* :func:`path_hierarchy_tokens` — per-doc Python twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def path_hierarchy_tokens(path: str, delimiter: str = "/",
                          replacement: str | None = None,
                          skip: int = 0) -> list[str]:
    """Python twin: the reference scan restated over split() parts.

    Derivation from `PathHierarchyTokenizer.java:110-190`: the scan
    consumes skip "credits" before emission begins — the FIRST char is
    credit #1 and every delimiter at position >= 1 is a further credit
    — then emits one token per boundary event, each token being the
    (delimiter-replaced) text from the emission start to that boundary,
    plus the full remainder at EOF.  In split() terms with
    ``parts = path.split(delimiter)``:

    * skip == 0 → tokens are the non-empty prefix joins
      ``join(parts[:i])`` for i = 1..len(parts) (only the i=1 join of a
      leading delimiter is empty, which the reference likewise never
      emits);
    * skip == s >= 1 → emission starts AT the s-th position->=1
      delimiter, so tokens are ``replacement + join(parts[b:b+j])`` for
      j >= 1, where b = s+1 when the path starts with the delimiter
      (that first char consumed credit #1 without being a boundary)
      else b = s; b >= len(parts) means the credits ran out → [].

    Pinned against every vector in the reference's
    TestPathHierarchyTokenizer (basic / endOfDelimiter / startOfChar /
    onlyDelimiter(s) / replace / *Skip) in tests/test_charfilters.py.
    """
    if replacement is None:
        replacement = delimiter
    if not path:
        return []
    parts = path.split(delimiter)
    if skip == 0:
        toks = [replacement.join(parts[:i]) for i in range(1, len(parts) + 1)]
        return [t for t in toks if t != ""]
    b = skip + 1 if parts[0] == "" else skip
    return [replacement + replacement.join(parts[b:b + j])
            for j in range(1, len(parts) - b + 1)]


def path_hierarchy_expr(col: Column | str, delimiter: str = "/",
                        replacement: str | None = None,
                        skip: int = 0) -> Column:
    """Catalyst twin: Column[str] → Column[array<string>] of prefixes.

    Same split()-parts model as :func:`path_hierarchy_tokens` —
    split → sequence → transform(array_join(slice)) — all whole-stage
    codegen, no Python, no shuffle; the downstream facet explode is the
    only width change.  Differential-tested per-row against the Python
    twin.
    """
    if replacement is None:
        replacement = delimiter
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, _rx_escape(delimiter))
    n = F.size(parts)
    if skip == 0:
        idx = F.when(n >= 1, F.sequence(F.lit(1), n)) \
             .otherwise(F.array().cast("array<int>"))
        toks = F.transform(
            idx, lambda i: F.array_join(F.slice(parts, 1, i), replacement))
        out = F.filter(toks, lambda t: t != "")
    else:
        b = F.when(F.element_at(parts, 1) == "",
                   F.lit(skip + 1)).otherwise(F.lit(skip))
        cnt = F.greatest(n - b, F.lit(0))
        idx = F.when(cnt >= 1, F.sequence(F.lit(1), F.greatest(cnt, F.lit(1)))) \
             .otherwise(F.array().cast("array<int>"))
        out = F.transform(
            idx,
            lambda j: F.concat(
                F.lit(replacement),
                F.array_join(F.slice(parts, b + 1, j), replacement)))
    return F.when(c.isNull() | (c == ""), F.array().cast("array<string>")) \
            .otherwise(out)


def _rx_escape(s: str) -> str:
    return "".join("\\" + ch if ch in r"\.[]{}()*+?^$|" else ch for ch in s)

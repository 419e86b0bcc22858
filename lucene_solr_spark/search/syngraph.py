"""Multi-word synonym graph queries — SynonymGraphFilter + QueryBuilder.

Reference semantics:

- `lucene/analysis/common/src/java/org/apache/lucene/analysis/synonym/
  SynonymGraphFilter.java:47-120` / `SynonymMap.java`: a synonym map of
  rules (input token sequence → output token sequence, multi-word on
  either side, per-rule keepOrig). Matching is GREEDY: at each position
  only the longest-matching rule input is considered
  (SynonymGraphFilter's FST parse — "only the longest match"); every
  rule sharing that longest input contributes its output as a side
  path, plus the original span when any such rule has includeOrig.
- `lucene/core/src/java/org/apache/lucene/util/QueryBuilder.java`
  analyzeGraphBoolean (:560-607) / analyzeGraphPhrase (:609-...):
  boolean mode combines each graph component's path alternatives with
  `newGraphSynonymQuery` — a SHOULD-of-alternatives BooleanQuery
  (QueryBuilder.java:334-345) — under the query operator; phrase mode
  enumerates the graph's finite strings (TokenStreamToAutomaton /
  `graph.getFiniteStrings()`) into one query per path.

Documented divergence: for phrase mode we always return the
enumerated-path disjunction (QueryBuilder's finite-strings branch, the
shape it uses whenever slop > 0 or the graph has gaps); Lucene 8's
slop=0 branch instead builds a single SpanNear-of-SpanOr weight whose
score normalization differs (one similarity over the union vs a sum
over alternatives). Match SETS are identical; the additive-score shape
is the one our oracle can restate exactly.

Path explosion is capped like the reference caps enumerated clauses
(`BooleanQuery.getMaxClauseCount` / TooManyClauses): > ``max_paths``
raises.

Spark shape / 100-TB posture: the graph walk runs on the DRIVER over
the analyzed QUERY text (a few tokens — same placement as the
reference, which rewrites the query before searching); the expanded
Boolean/Phrase tree then executes through the ordinary distributed
kernel. Nothing here touches the corpus.
"""

from __future__ import annotations

from dataclasses import dataclass

from .ast import (DEFAULT_FIELD, BooleanQuery, Clause, Occur, PhraseQuery,
                  TermQuery)

MAX_PATHS = 1024


@dataclass(frozen=True)
class SynonymRule:
    """One SynonymMap.Builder.add(input, output, includeOrig) rule over
    ANALYZED tokens."""
    input: tuple
    output: tuple
    keep_orig: bool = True


class SynonymGraph:
    """Driver-side synonym graph expander (SynonymGraphFilter analog
    for query rewriting)."""

    def __init__(self, rules: list[SynonymRule]):
        if not rules:
            raise ValueError("empty synonym map")
        for r in rules:
            if not r.input or not r.output:
                raise ValueError(f"degenerate rule {r}")
        self.rules = list(rules)

    def _span_alternatives(self, tokens: tuple, i: int):
        """Longest-match rule lookup at position ``i`` →
        (span_len, [alternative token tuples]) or None when no rule
        matches (plain token). Mirrors the FST longest-match parse:
        rules with a shorter input than the longest match at ``i`` are
        NOT considered (SynonymGraphFilter.java parse loop)."""
        best_len = 0
        for r in self.rules:
            L = len(r.input)
            if L > best_len and tuple(tokens[i:i + L]) == tuple(r.input):
                best_len = L
        if best_len == 0:
            return None
        alts, keep = [], False
        for r in self.rules:
            if len(r.input) == best_len and \
                    tuple(tokens[i:i + best_len]) == tuple(r.input):
                if tuple(r.output) not in alts:
                    alts.append(tuple(r.output))
                keep = keep or r.keep_orig
        orig = tuple(tokens[i:i + best_len])
        if keep and orig not in alts:
            alts.insert(0, orig)
        return best_len, alts

    def segments(self, tokens) -> list[list[tuple]]:
        """The analyzed token stream as a list of graph components:
        each element is the list of alternative token tuples for that
        span (single-element for plain tokens). This IS the token
        graph — an alternation chain, because matching is greedy and
        non-overlapping."""
        tokens = tuple(tokens)
        segs, i = [], 0
        while i < len(tokens):
            hit = self._span_alternatives(tokens, i)
            if hit is None:
                segs.append([(tokens[i],)])
                i += 1
            else:
                span, alts = hit
                segs.append(alts)
                i += span
        return segs

    def paths(self, tokens, max_paths: int = MAX_PATHS) -> list[tuple]:
        """All finite strings of the graph (graph.getFiniteStrings())
        — the cartesian product over segments, capped like the
        reference caps boolean clauses."""
        out = [()]
        for alts in self.segments(tokens):
            nxt = [p + a for p in out for a in alts]
            if len(nxt) > max_paths:
                raise ValueError(
                    f"synonym graph expands to > {max_paths} paths "
                    f"(TooManyClauses analog)")
            out = nxt
        return out


def _leaf(tokens: tuple, field: str):
    return (TermQuery(tokens[0], field) if len(tokens) == 1
            else PhraseQuery(tuple(tokens), field))


def graph_phrase_query(graph: SynonymGraph, tokens,
                       field: str = DEFAULT_FIELD,
                       max_paths: int = MAX_PATHS):
    """QueryBuilder.analyzeGraphPhrase (finite-strings branch): one
    exact phrase per enumerated path, combined SHOULD — a document
    scores the sum of its matching alternatives."""
    paths = graph.paths(tokens, max_paths)
    if len(paths) == 1:
        return _leaf(paths[0], field)
    return BooleanQuery(tuple(Clause(Occur.SHOULD, _leaf(p, field))
                              for p in paths))


def graph_boolean_query(graph: SynonymGraph, tokens,
                        occur: Occur = Occur.SHOULD,
                        field: str = DEFAULT_FIELD,
                        max_paths: int = MAX_PATHS):
    """QueryBuilder.analyzeGraphBoolean: each graph component becomes
    its SHOULD-of-alternatives group (newGraphSynonymQuery,
    QueryBuilder.java:334-345 — a single-token component collapses to
    its TermQuery), components combined under ``occur`` (the parser's
    default operator)."""
    clauses = []
    for alts in graph.segments(tokens):
        if len(alts) > max_paths:
            raise ValueError(
                f"synonym component expands to > {max_paths} "
                f"alternatives (TooManyClauses analog)")
        if len(alts) == 1:
            q = _leaf(alts[0], field)
        else:
            q = BooleanQuery(tuple(Clause(Occur.SHOULD, _leaf(a, field))
                                   for a in alts))
        clauses.append(Clause(occur, q))
    if len(clauses) == 1:
        return clauses[0].query
    return BooleanQuery(tuple(clauses))

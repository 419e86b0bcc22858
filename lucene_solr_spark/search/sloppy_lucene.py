"""Faithful port of Lucene's sloppy-phrase matcher for single-term
slots (`search/SloppyPhraseMatcher.java:56`, `PhrasePositions.java:26`,
`PhraseQueue.java:22`, Lucene's array `PriorityQueue` semantics).

The engine's DEFAULT sloppy matcher is the vectorized first-term-
anchored min-displacement spec (oracle-gated); this module is the
FIDELITY mode — per-document, bit-faithful to the reference's
enumeration, including its documented order-dependence quirks (the
class javadoc: "a b c"~4 and "c b a"~4 score differently on
"a b c b a"). Pinned against hit-count/frequency behaviors stated in
the reference's own TestSloppyPhraseQuery.java.

Faithfulness notes:
- Lucene's PriorityQueue is a 1-based binary heap whose invariants are
  deliberately VIOLATED in place when repeat-collision resolution
  advances a pp that is still queued; the subsequent pop/re-add dance
  (`SloppyPhraseMatcher.advanceRpts:291-309`) only re-heapifies the
  marked entries. Python's heapq cannot reproduce that, so `_PQ` below
  ports Lucene's exact upHeap/downHeap.
- Repeat-group detection (`gatherRptGroups:504-533`) keys on first-doc
  term-position collisions; with single-term slots that reduces to
  term equality (two pps of one term always share the term's first
  occurrence), so groups are computed query-statically here —
  equivalent for every doc, not just the first.
- Multi-term-per-slot repeats (`hasMultiTermRpts`) are out of scope;
  MultiPhraseQuery keeps the engine's unioned-stream spec.
"""

from __future__ import annotations


class _PP:
    """PhrasePositions.java:26 — adjusted position = raw − query offset."""

    __slots__ = ("positions", "idx", "count", "position", "offset", "ord",
                 "rpt_group", "rpt_ind")

    def __init__(self, positions, offset, ord_):
        self.positions = positions
        self.offset = offset
        self.ord = ord_
        self.rpt_group = -1
        self.rpt_ind = 0
        self.idx = 0
        self.count = 0
        self.position = 0

    def first_position(self):
        self.idx = 0
        self.count = len(self.positions)
        return self.next_position()

    def next_position(self):
        if self.count > 0:
            self.count -= 1
            self.position = self.positions[self.idx] - self.offset
            self.idx += 1
            return True
        return False


def _less_than(pp1: _PP, pp2: _PP) -> bool:
    """PhraseQueue.java:27-41 ordering."""
    if pp1.position == pp2.position:
        if pp1.offset == pp2.offset:
            return pp1.ord < pp2.ord
        return pp1.offset < pp2.offset
    return pp1.position < pp2.position


class _PQ:
    """Lucene util.PriorityQueue (1-based array heap, upHeap/downHeap) —
    ported so that in-place key mutations misbehave IDENTICALLY."""

    def __init__(self, max_size):
        self.heap = [None] * (max_size + 1)
        self.size = 0

    def clear(self):
        self.size = 0

    def add(self, pp):
        self.size += 1
        self.heap[self.size] = pp
        self._up(self.size)

    def top(self):
        return self.heap[1]

    def pop(self):
        if self.size == 0:
            return None
        out = self.heap[1]
        self.heap[1] = self.heap[self.size]
        self.size -= 1
        self._down(1)
        return out

    def _up(self, i):
        node = self.heap[i]
        j = i >> 1
        while j > 0 and _less_than(node, self.heap[j]):
            self.heap[i] = self.heap[j]
            i = j
            j >>= 1
        self.heap[i] = node

    def _down(self, i):
        node = self.heap[i]
        j = i << 1
        k = j + 1
        if k <= self.size and _less_than(self.heap[k], self.heap[j]):
            j = k
        while j <= self.size and _less_than(self.heap[j], node):
            self.heap[i] = self.heap[j]
            i = j
            j = i << 1
            k = j + 1
            if k <= self.size and _less_than(self.heap[k], self.heap[j]):
                j = k
        self.heap[i] = node


class _Matcher:
    """SloppyPhraseMatcher.java:56, single-term slots."""

    def __init__(self, offsets, pos_lists, slop):
        self.slop = slop
        self.pps = [_PP(p, o, i)
                    for i, (o, p) in enumerate(zip(offsets, pos_lists))]
        self.pq = _PQ(len(self.pps))
        self.end = -(1 << 60)
        self.match_length = 1 << 60
        self.positioned = False
        # repeat groups: same-term pps, sorted by query offset
        # (gatherRptGroups:504-533 reduces to this for single-term slots)
        by_key: dict[int, list[_PP]] = {}
        for pp, key in zip(self.pps, self._term_keys(pos_lists)):
            by_key.setdefault(key, []).append(pp)
        self.rpt_groups = []
        for key, group in by_key.items():
            if len(group) > 1:
                group.sort(key=lambda p: p.offset)
                g = len(self.rpt_groups)
                for j, pp in enumerate(group):
                    pp.rpt_group = g
                    pp.rpt_ind = j
                self.rpt_groups.append(group)
        self.has_rpts = bool(self.rpt_groups)

    @staticmethod
    def _term_keys(pos_lists):
        """Slots sharing one term share the SAME positions list object
        (or equal contents) — key by content identity."""
        seen: dict[tuple, int] = {}
        out = []
        for p in pos_lists:
            t = tuple(p)
            out.append(seen.setdefault(t, len(seen)))
        return out

    # --- per-doc init (initPhrasePositions:350-360) --------------------
    def reset(self):
        self.end = -(1 << 60)
        if not self.has_rpts:
            self.pq.clear()
            for pp in self.pps:
                pp.first_position()
                if pp.position > self.end:
                    self.end = pp.position
                self.pq.add(pp)
            self.positioned = True
        else:
            for pp in self.pps:
                pp.first_position()
            self.positioned = self._advance_repeat_groups()
            if self.positioned:
                self.pq.clear()
                for pp in self.pps:
                    if pp.position > self.end:
                        self.end = pp.position
                    self.pq.add(pp)
        self.match_length = 1 << 60

    def _advance_repeat_groups(self):
        """advanceRepeatGroups:407-419 (no multi-term repeats): the j-th
        pp of each offset-sorted group advances j extra times."""
        for rg in self.rpt_groups:
            for j in range(1, len(rg)):
                for _ in range(j):
                    if not rg[j].next_position():
                        return False
        return True

    # --- match enumeration (nextMatch:162-194) -------------------------
    def next_match(self):
        if not self.positioned:
            return False
        pp = self.pq.pop()
        self.match_length = self.end - pp.position
        nxt = self.pq.top().position
        while self._advance_pp(pp):
            if self.has_rpts and not self._advance_rpts(pp):
                break
            if pp.position > nxt:
                self.pq.add(pp)
                if self.match_length <= self.slop:
                    return True
                pp = self.pq.pop()
                nxt = self.pq.top().position
                self.match_length = self.end - pp.position
            else:
                ml2 = self.end - pp.position
                if ml2 < self.match_length:
                    self.match_length = ml2
        self.positioned = False
        return self.match_length <= self.slop

    def _advance_pp(self, pp):
        if not pp.next_position():
            return False
        if pp.position > self.end:
            self.end = pp.position
        return True

    def _advance_rpts(self, pp):
        """advanceRpts:270-310 — resolve collisions by advancing the
        lesser of the two colliding pps; re-heapify only the queued pps
        whose positions changed (the bits/rptStack dance)."""
        if pp.rpt_group < 0:
            return True
        rg = self.rpt_groups[pp.rpt_group]
        bits = set()
        k0 = pp.rpt_ind
        k = self._collide(pp)
        while k >= 0:
            pp = pp if _lesser(pp, rg[k]) else rg[k]
            if not self._advance_pp(pp):
                return False
            if k != k0:
                bits.add(k)
            k = self._collide(pp)
        n_stack = []
        while bits:
            pp2 = self.pq.pop()
            n_stack.append(pp2)
            if pp2.rpt_group >= 0 and pp2.rpt_ind in bits:
                bits.discard(pp2.rpt_ind)
        for pp2 in reversed(n_stack):
            self.pq.add(pp2)
        return True

    def _collide(self, pp):
        tp = pp.position + pp.offset
        for pp2 in self.rpt_groups[pp.rpt_group]:
            if pp2 is not pp and pp2.position + pp2.offset == tp:
                return pp2.rpt_ind
        return -1


def _lesser(pp, pp2) -> bool:
    """lesser:313-319 — by (position, offset) only."""
    return (pp.position < pp2.position
            or (pp.position == pp2.position and pp.offset < pp2.offset))


def sloppy_freq(offsets, pos_lists, slop: int) -> float:
    """The reference's per-document sloppy phrase frequency: Σ over the
    enumerated matches of 1/(1 + matchLength) (PhraseScorer.java:75-79
    + SloppyPhraseMatcher.sloppyWeight:158-160). ``offsets`` are the
    query positions of the slots (gaps allowed — PhraseQuery.Builder
    add(term, position)); ``pos_lists`` the slots' raw position lists
    in this doc. Returns 0.0 when the doc has no slop-valid match."""
    if any(len(p) == 0 for p in pos_lists):
        return 0.0
    m = _Matcher(offsets, pos_lists, slop)
    m.reset()
    freq = 0.0
    while m.positioned and m.next_match():
        freq += 1.0 / (1.0 + m.match_length)
    return freq

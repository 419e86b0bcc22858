"""Pure-Python single-node oracle with exact Lucene scoring semantics.

The FIXTURES.md §6 oracle: a dict-of-lists inverted index plus float32
BM25 (k1=1.2, b=0.75), global collection stats, and the reference's
tie-breaks — score desc, then docID asc (`search/HitQueue.java:76-81`,
`search/TopDocs.java:34,70`). The Spark engine must be rank-identical
(docIDs AND float32 scores) to this oracle; the oracle itself is pinned
by golden tests.
"""

from __future__ import annotations

import numpy as np

from ..analysis.analyzer import StandardAnalyzer
from ..functions import bm25
from ..functions.smallfloat import int_to_byte4


class OracleIndex:
    def __init__(self, analyzer: StandardAnalyzer):
        self.analyzer = analyzer
        self.postings: dict[str, dict[int, int]] = {}   # term -> doc -> freq
        self.positions: dict[str, dict[int, list[int]]] = {}
        self.norms: dict[int, int] = {}                  # doc -> norm byte
        self.doc_len: dict[int, int] = {}
        self.doc_count = 0
        self.sum_ttf = 0

    def add(self, doc_id: int, text: str):
        tp = self.analyzer.term_positions(text)
        length = sum(len(v) for v in tp.values())
        self.doc_count += 1
        self.sum_ttf += length
        self.doc_len[doc_id] = length
        self.norms[doc_id] = int(int_to_byte4(np.array([length]))[0])
        for term, pos in tp.items():
            self.postings.setdefault(term, {})[doc_id] = len(pos)
            self.positions.setdefault(term, {})[doc_id] = pos

    # --- stats ---------------------------------------------------------
    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def ttf(self, term: str) -> int:
        return sum(self.postings.get(term, {}).values())

    def term_weight(self, term: str, boost: float = 1.0) -> bm25.TermWeight:
        return bm25.make_term_weight(term, self.df(term), self.doc_count,
                                     self.sum_ttf, boost=boost)

    # --- scoring ---------------------------------------------------------
    def _term_scores(self, term: str) -> dict[int, np.float32]:
        plist = self.postings.get(term, {})
        if not plist:
            return {}
        w = self.term_weight(term)
        docs = np.array(sorted(plist), dtype=np.int64)
        freqs = np.array([plist[d] for d in docs], dtype=np.int64)
        norms = np.array([self.norms[d] for d in docs], dtype=np.int64)
        scores = w.score(freqs, norms)
        return dict(zip(docs.tolist(), scores))

    def search_or(self, terms: list[str], k: int = 10):
        """Pure disjunction (BooleanQuery of SHOULD clauses) top-k.

        Per-doc score = float32 sum of clause scores in clause order —
        DisjunctionSumScorer accumulates in doc-at-a-time clause order;
        we replicate by summing per-term score arrays in query-term order.
        """
        acc: dict[int, np.float32] = {}
        for t in terms:
            for d, s in self._term_scores(t).items():
                acc[d] = np.float32(acc.get(d, np.float32(0.0)) + s)
        return self._topk(acc, k)

    def search_and(self, terms: list[str], k: int = 10):
        """Conjunction: doc must match every term; score = sum."""
        sets = [set(self.postings.get(t, {})) for t in terms]
        if not sets:
            return []
        docs = set.intersection(*sets)
        acc: dict[int, np.float32] = {d: np.float32(0.0) for d in docs}
        for t in terms:
            ts = self._term_scores(t)
            for d in docs:
                acc[d] = np.float32(acc[d] + ts[d])
        return self._topk(acc, k)

    def search_bool(self, must=(), should=(), must_not=(), k: int = 10,
                    min_should_match: int = 0):
        """General boolean: returns top-k of matching docs.

        Lucene semantics: if there are MUST clauses, SHOULD clauses only
        contribute score (ReqOptSumScorer); else ≥max(1, msm) SHOULD must
        match. MUST_NOT excludes.
        """
        must, should, must_not = list(must), list(should), list(must_not)
        excluded = set()
        for t in must_not:
            excluded |= set(self.postings.get(t, {}))
        if must:
            docs = set.intersection(*[set(self.postings.get(t, {})) for t in must])
        else:
            msm = max(1, min_should_match)
            from collections import Counter
            c: Counter = Counter()
            for t in set(should):
                c.update(self.postings.get(t, {}).keys())
            docs = {d for d, n in c.items() if n >= msm}
        docs -= excluded
        acc = {d: np.float32(0.0) for d in docs}
        for t in must + should:
            ts = self._term_scores(t)
            for d in docs:
                if d in ts:
                    acc[d] = np.float32(acc[d] + ts[d])
        return self._topk(acc, k)

    def search_phrase(self, terms: list[str], k: int = 10):
        """Exact phrase: positions of term i+1 == positions of term i + 1.

        Scored like Lucene's PhraseQuery: freq = number of phrase
        occurrences, scored with the combined-term stats? No — Lucene
        scores a phrase with SimScorer on phrase freq and the *sum* of
        idfs of its terms. We implement: weight = sum of per-term idf,
        freq = phrase occurrence count.
        """
        if not terms:
            return []
        base = self.positions.get(terms[0], {})
        acc: dict[int, np.float32] = {}
        cand = set(base)
        for t in terms[1:]:
            cand &= set(self.positions.get(t, {}))
        if not cand:
            return []
        idf_sum = np.float32(sum(np.float32(bm25.idf(self.df(t), self.doc_count))
                                 for t in terms))
        avgdl = bm25.avg_field_length(self.sum_ttf, self.doc_count)
        cache = bm25.norm_inverse_cache(avgdl)
        for d in cand:
            pos_sets = [set(self.positions[t][d]) for t in terms]
            n = sum(1 for p in self.positions[terms[0]][d]
                    if all((p + i) in pos_sets[i] for i in range(1, len(terms))))
            if n > 0:
                w = idf_sum
                ni = cache[self.norms[d]]
                acc[d] = np.float32(w - w / (np.float32(1.0) + np.float32(n) * ni))
        return self._topk(acc, k)

    @staticmethod
    def _topk(acc: dict[int, np.float32], k: int):
        """Sort by (score desc, doc asc) — HitQueue tie-break — take k."""
        items = sorted(acc.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return [(d, np.float32(s)) for d, s in items[:k]]

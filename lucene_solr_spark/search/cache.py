"""LRU query cache — the LRUQueryCache analog.

The reference caches per-(query, reader) match bitsets for filters that
repeat (`search/LRUQueryCache.java:90`, default policy
UsageTrackingQueryCachingPolicy: cache once a query recurs). Spark
restatement: memoize ``match_docs`` results as persisted DataFrames
keyed by the normalized query string; evict least-recently-used entries
by unpersisting. The cached artifact is the doc-id set (constant-score
filter role), not scores — exactly what the reference caches.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame

from .ast import rewrite


class QueryCache:
    def __init__(self, searcher, max_entries: int = 32,
                 min_frequency: int = 2):
        """min_frequency: cache a filter only once it has been seen this
        many times (UsageTrackingQueryCachingPolicy.shouldCache analog —
        one-off queries never pay the persist)."""
        self.searcher = searcher
        self.max_entries = max_entries
        self.min_frequency = min_frequency
        self._entries: OrderedDict[str, DataFrame] = OrderedDict()
        self._seen: dict[str, int] = {}
        self.hits = 0
        self.misses = 0

    def _key(self, query) -> str:
        return repr(rewrite(query))

    def filter_docs(self, query) -> DataFrame:
        """Matching doc_ids for the query, served from cache when warm."""
        key = self._key(query)
        if key in self._entries:
            self.hits += 1
            self._entries.move_to_end(key)
            return self._entries[key]
        self.misses += 1
        docs = self.searcher.match_docs(query)
        self._seen[key] = self._seen.get(key, 0) + 1
        if self._seen[key] < self.min_frequency:
            return docs
        docs = docs.persist()
        docs.count()
        self._entries[key] = docs
        while len(self._entries) > self.max_entries:
            _, evicted = self._entries.popitem(last=False)
            try:
                evicted.unpersist()
            except Exception:
                pass
        return docs

    def clear(self) -> None:
        for df in self._entries.values():
            try:
                df.unpersist()
            except Exception:
                pass
        self._entries.clear()
        self._seen.clear()

"""PhraseWildcardQuery — a phrase where some slots are multi-terms.

Parity target: ``lucene/sandbox/src/java/org/apache/lucene/search/
PhraseWildcardQuery.java:69`` (maxMultiTermExpansions:76) (builder with ``addTerm`` /
``addMultiTerm(MultiTermQuery)``, ``maxMultiTermExpansions``,
rewrite-to-MultiPhraseQuery semantics: a document matches when for
every slot ONE of the slot's expanded terms occupies the required
position).

Spark-first restatement: the reference optimizes segment-by-segment
expansion to share the expansion budget across segments; here the term
dictionary is ONE distributed sorted table, so each wildcard slot is a
single predicate-pushed dictionary scan (``multiterm.wildcard_terms``
— top-``max_expansions`` by (df desc, term asc), the same top-terms
rewrite the rest of the MultiTermQuery family uses), after which the
query IS a ``MultiPhraseQuery`` and executes on the existing
positions kernel. No new scoring path: like the reference's rewrite,
scoring is the MultiPhrase form (summed idf over all slot terms,
phrase-freq saturation).
"""

from __future__ import annotations

import warnings

from lucene_solr_spark.search import multiterm as mt
from lucene_solr_spark.search.ast import MatchNoQuery, MultiPhraseQuery

#: reference default (PhraseWildcardQuery.Builder: maxMultiTermExpansions)
DEFAULT_MAX_EXPANSIONS = 128


def _is_multi(slot: str) -> bool:
    return "*" in slot or "?" in slot


def phrase_wildcard_query(terms_df, slots, field: str = "text",
                          max_expansions: int = DEFAULT_MAX_EXPANSIONS):
    """Build the query for ``slots`` (a sequence of single terms and/or
    wildcard patterns, in phrase position order).

    Each wildcard slot expands against the dictionary capped at
    ``max_expansions`` (df-descending, mirroring the top-terms rewrite);
    hitting the cap emits a RuntimeWarning — a silent truncation would
    change phrase semantics without a trace. A slot with zero matching
    terms makes the whole phrase unmatchable (MatchNoDocsQuery), exactly
    as the reference's rewrite short-circuits
    (PhraseWildcardQuery.java:168 ``noMatchQuery``).
    """
    positions: list[tuple[str, ...]] = []
    for slot in slots:
        if not _is_multi(slot):
            positions.append((slot,))
            continue
        expanded = mt.wildcard_terms(terms_df, slot, field=field,
                                     size=max_expansions)
        if not expanded:
            return MatchNoQuery()
        if len(expanded) >= max_expansions:
            warnings.warn(
                f"phrase slot {slot!r} hit max_expansions="
                f"{max_expansions}; lower-df terms were dropped",
                RuntimeWarning, stacklevel=2)
        positions.append(tuple(expanded))
    return MultiPhraseQuery(tuple(positions))

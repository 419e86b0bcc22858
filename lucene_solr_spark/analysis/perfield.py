"""PerFieldAnalyzerWrapper — a different analysis chain per field.

Mirrors `analysis/miscellaneous/PerFieldAnalyzerWrapper.java:33`: a
default analyzer plus a field→analyzer override map; indexing AND
query parsing both resolve the chain through :meth:`for_field`, so
``title:the`` analyzed under a no-stopwords title chain survives while
``text:the`` stop-filters away — exactly the wrapper's contract.

Consumers that are field-blind (streaming-expression ``search``, MLT
seed analysis, suggesters) get the DEFAULT analyzer via the delegated
``tokens``/``term_freqs``/... surface, which is what the reference's
``Analyzer`` base-class behavior degrades to when no field is in play.

``batch_vectorizable`` is irrelevant here: IndexBuilder resolves the
per-FIELD analyzer before choosing the invert path, so a vectorizable
standard chain on ``text`` keeps the numpy kernel while a custom chain
on ``title`` takes the per-doc path — per field, in the same build.
"""

from __future__ import annotations

from dataclasses import dataclass


def resolve_for_field(analyzer, field: str):
    """The dispatch hook: PerFieldAnalyzer resolves, plain analyzers
    pass through (used by the parser and IndexBuilder)."""
    get = getattr(analyzer, "for_field", None)
    return get(field) if get is not None else analyzer


@dataclass(frozen=True)
class PerFieldAnalyzer:
    """default analyzer + ((field, analyzer), ...) overrides."""

    default: object
    overrides: tuple = ()

    def for_field(self, field: str):
        for f, an in self.overrides:
            if f == field:
                return an
        return self.default

    # -- field-blind delegation (reference: wrapper extends Analyzer) --
    @property
    def stop_words(self):
        return self.default.stop_words

    @property
    def max_token_length(self):
        return self.default.max_token_length

    def tokens(self, text: str):
        return self.default.tokens(text)

    def tokens_positions(self, text: str):
        return self.default.tokens_positions(text)

    def term_freqs(self, text: str):
        return self.default.term_freqs(text)

    def term_positions(self, text: str):
        return self.default.term_positions(text)

    def term_occurrences(self, text: str):
        return self.default.term_occurrences(text)

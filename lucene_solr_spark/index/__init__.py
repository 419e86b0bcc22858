"""Inverted-index construction: invert → stats → salted pack → tables."""

from .builder import IndexBuilder, InvertedIndex  # noqa: F401
from .compact import compact, needs_compaction  # noqa: F401
from .deletes import (delete_docs, expunge_deletes, live_doc_count,  # noqa: F401
                      soft_delete_docs)
from .merge import append, update_documents  # noqa: F401

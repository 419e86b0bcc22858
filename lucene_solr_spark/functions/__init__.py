"""Numeric kernels: SmallFloat norms, postings block codecs, impacts, BM25."""

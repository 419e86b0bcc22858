"""Single-node pure-Python Lucene-semantics oracle for differential tests."""

from .pyoracle import OracleIndex  # noqa: F401

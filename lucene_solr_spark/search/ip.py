"""InetAddressPoint / InetAddressRange analogs — IP point queries.

References (semantics only):
- ``lucene/misc/src/java/org/apache/lucene/document/
  InetAddressPoint.java:200,213,251`` (newExactQuery /
  newPrefixQuery / newRangeQuery) — exact / prefix (CIDR) / range queries over
  IP addresses; the reference encodes addresses AT INDEX TIME into
  sortable bytes, and every query becomes a byte-range comparison.
- ``InetAddressRange.java`` — indexed IP ranges (same encoding).

Spark restatement keeps the encode-at-ingest idea: ``ipv4_to_long``
turns a dotted-quad string column into a sortable LONG with one
codegen ``aggregate`` fold (no UDF); persist that column and every IP
query is a plain numeric predicate — pushable into the Parquet scan
exactly like the reference's BKD byte ranges. CIDR prefix queries
reduce to ``[network, network | hostmask]`` range bounds computed
driver-side from the literal.

IPv6: literals and columns are REJECTED with a clear error rather
than silently mis-sorted — Spark has no 128-bit integral type, so a
faithful v6 port needs the reference's fixed-width byte encoding as a
16-byte binary column; documented as out of scope for the web-log
(v4) case this engine targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def parse_ipv4(s: str) -> int:
    """Dotted-quad literal → 32-bit int (driver-side, for bounds)."""
    if ":" in s:
        raise NotImplementedError(
            "IPv6 needs a 16-byte binary encoding; only IPv4 is "
            "supported (InetAddressPoint.java handles both)")
    parts = s.split(".")
    if len(parts) != 4 or any(not p.isdigit() or int(p) > 255
                              for p in parts):
        raise ValueError(f"not a dotted-quad IPv4 address: {s!r}")
    v = 0
    for p in parts:
        v = (v << 8) | int(p)
    return v


def ipv4_to_long(ip: Column | str) -> Column:
    """Dotted-quad string column → sortable LONG — one codegen fold
    (the ingest-time encode; persist this and predicates push down)."""
    col = F.col(ip) if isinstance(ip, str) else ip
    return F.aggregate(F.split(col, r"\."), F.lit(0).cast("long"),
                       lambda acc, x: acc * 256 + x.cast("long"))


def long_to_ipv4(v: Column | str) -> Column:
    """Sortable LONG → dotted-quad display form (codegen)."""
    col = F.col(v) if isinstance(v, str) else v
    return F.concat_ws(
        ".", *[F.shiftright(col, s).bitwiseAND(255).cast("string")
               for s in (24, 16, 8, 0)])


def cidr_bounds(cidr: str) -> tuple[int, int]:
    """'a.b.c.d/n' → inclusive (network, broadcast) longs —
    InetAddressPoint.newPrefixQuery's clearing/filling of the suffix
    bits."""
    addr, _, plen_s = cidr.partition("/")
    plen = int(plen_s) if plen_s else 32
    if not 0 <= plen <= 32:
        raise ValueError(f"prefix length out of range: {cidr!r}")
    base = parse_ipv4(addr)
    host = (1 << (32 - plen)) - 1
    net = base & ~host & 0xFFFFFFFF
    return net, net | host


def ip_exact(df: DataFrame, ip_long_col: str, address: str) -> DataFrame:
    """newExactQuery — one pushable equality predicate."""
    return df.filter(F.col(ip_long_col) == parse_ipv4(address))


def ip_range(df: DataFrame, ip_long_col: str, lower: str,
             upper: str) -> DataFrame:
    """newRangeQuery (inclusive both ends, as the reference)."""
    lo, hi = parse_ipv4(lower), parse_ipv4(upper)
    if lo > hi:
        raise ValueError("lower > upper")
    return df.filter(F.col(ip_long_col).between(lo, hi))


def ip_cidr(df: DataFrame, ip_long_col: str, cidr: str) -> DataFrame:
    """newPrefixQuery — CIDR block as one pushable BETWEEN."""
    lo, hi = cidr_bounds(cidr)
    return df.filter(F.col(ip_long_col).between(lo, hi))

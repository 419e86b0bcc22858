"""Solr date math — the query-time date grammar.

Reference (semantics only): `solr/core/src/java/org/apache/solr/util/
DateMathParser.java` — a base instant (``NOW`` or an ISO-8601 literal)
followed by any sequence of

* ``/UNIT``   — round DOWN to the start of the unit,
* ``+N UNIT`` — add N units (calendar-aware: months/years vary),
* ``-N UNIT`` — subtract N units,

with unit names accepted in singular or plural (``DAY``/``DAYS``; the
reference's CALENDAR_UNITS table also maps ``DATE`` → day and
``MILLI``/``MILLISECOND`` → millisecond).

All arithmetic happens on the driver over plain ``datetime`` values —
date math only ever produces QUERY CONSTANTS (range endpoints, facet
gaps), never a per-row computation, so nothing here touches the
executors. Gap iteration (``date_boundaries``) reproduces Solr's range
facet loop (``RangeFacetProcessor``: ``low = dateMathParser(low +
gap)``), which is what makes ``+1MONTH`` land on month starts instead
of fixed 30-day strides.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

# DateMathParser.CALENDAR_UNITS — canonical unit per accepted spelling
_UNITS = {}
for _names, _canon in [
    (("YEAR", "YEARS"), "YEAR"),
    (("MONTH", "MONTHS"), "MONTH"),
    (("DAY", "DAYS", "DATE"), "DAY"),
    (("HOUR", "HOURS"), "HOUR"),
    (("MINUTE", "MINUTES"), "MINUTE"),
    (("SECOND", "SECONDS"), "SECOND"),
    (("MILLI", "MILLIS", "MILLISECOND", "MILLISECONDS"), "MILLI"),
]:
    for _n in _names:
        _UNITS[_n] = _canon

_OP = re.compile(r"([+\-/])(\d*)([A-Z]+)")


def _add_months(d: datetime, n: int) -> datetime:
    """Calendar month add with day-of-month clamping (java.time
    LocalDateTime.plusMonths semantics: Jan 31 + 1MONTH = Feb 28/29)."""
    m = d.month - 1 + n
    year = d.year + m // 12
    month = m % 12 + 1
    day = min(d.day, calendar.monthrange(year, month)[1])
    return d.replace(year=year, month=month, day=day)


def _round_down(d: datetime, unit: str) -> datetime:
    if unit == "YEAR":
        return d.replace(month=1, day=1, hour=0, minute=0, second=0,
                         microsecond=0)
    if unit == "MONTH":
        return d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "DAY":
        return d.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "HOUR":
        return d.replace(minute=0, second=0, microsecond=0)
    if unit == "MINUTE":
        return d.replace(second=0, microsecond=0)
    if unit == "SECOND":
        return d.replace(microsecond=0)
    if unit == "MILLI":
        return d.replace(microsecond=d.microsecond // 1000 * 1000)
    raise ValueError(f"unknown date math unit {unit!r}")


def _add(d: datetime, unit: str, n: int) -> datetime:
    if unit == "YEAR":
        return _add_months(d, 12 * n)
    if unit == "MONTH":
        return _add_months(d, n)
    step = {"DAY": timedelta(days=1), "HOUR": timedelta(hours=1),
            "MINUTE": timedelta(minutes=1), "SECOND": timedelta(seconds=1),
            "MILLI": timedelta(milliseconds=1)}[unit]
    return d + n * step


def apply_ops(base: datetime, ops: str) -> datetime:
    """Apply a date math op string (``/MONTH+1MONTH-3DAYS``) to a base
    instant — DateMathParser.parseMath."""
    pos = 0
    d = base
    for m in _OP.finditer(ops):
        if m.start() != pos:
            raise ValueError(f"bad date math at {ops[pos:]!r}")
        pos = m.end()
        sign, num, name = m.groups()
        unit = _UNITS.get(name)
        if unit is None:
            raise ValueError(f"unknown date math unit {name!r}")
        if sign == "/":
            if num:
                raise ValueError("rounding takes no count")
            d = _round_down(d, unit)
        else:
            if not num:
                raise ValueError(f"{sign}{name} needs a count")
            d = _add(d, unit, int(num) if sign == "+" else -int(num))
    if pos != len(ops):
        raise ValueError(f"trailing garbage in date math: {ops[pos:]!r}")
    return d


def parse_date_math(expr: str, now: datetime) -> datetime:
    """``NOW/DAY-7DAYS`` or ``2024-03-01T00:00:00Z/MONTH+1MONTH`` →
    datetime (naive UTC, matching the parquet TIMESTAMP columns)."""
    expr = expr.strip()
    if expr.startswith("NOW"):
        return apply_ops(now, expr[3:])
    m = re.match(r"(\d{4}-\d{2}-\d{2}(?:T\d{2}:\d{2}:\d{2}(?:\.\d+)?)?)Z?",
                 expr)
    if not m:
        raise ValueError(f"bad date math base in {expr!r}")
    base = m.group(1)
    fmt = ("%Y-%m-%dT%H:%M:%S.%f" if "." in base
           else "%Y-%m-%dT%H:%M:%S" if "T" in base else "%Y-%m-%d")
    return apply_ops(datetime.strptime(base, fmt), expr[m.end():])


def date_boundaries(start: str, end: str, gap: str,
                    now: datetime | None = None) -> list[datetime]:
    """Solr range-facet boundary ladder: [b0=start, b1=start+gap, …]
    where each step re-applies the gap as date math to the PREVIOUS
    boundary (RangeFacetProcessor's ``low += gap`` loop), continuing
    while the boundary is < end; the final entry is the first boundary
    ≥ end (the last bucket's exclusive upper edge — hardend=false, the
    default: a partial final gap still spans a full gap)."""
    now = now or datetime(2026, 1, 1)
    ops = gap.strip()
    if not ops.startswith(("+", "-")):
        ops = "+" + ops
    b = parse_date_math(start, now)
    stop = parse_date_math(end, now)
    if apply_ops(b, ops) <= b:
        raise ValueError(f"gap {gap!r} does not advance")
    out = [b]
    while out[-1] < stop:
        out.append(apply_ops(out[-1], ops))
        if len(out) > 10_000:
            raise ValueError("more than 10000 buckets — widen the gap")
    return out

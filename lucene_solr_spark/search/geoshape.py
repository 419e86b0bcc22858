"""LatLonShape indexed LINE shapes with QueryRelation, Spark-first.

Reference surface (`document/LatLonShape.java:49-105`:
createIndexableFields(String, Line), newBoxQuery(field, QueryRelation,
boxes...), newLineQuery(field, QueryRelation, lines...);
`document/ShapeQuery.java` relation semantics): a document's shape is
a polyline; a query supplies a geometry and a relation —
INTERSECTS (any part of the shape touches the query geometry),
WITHIN (the whole shape inside it), DISJOINT (no part touches),
CONTAINS (the shape contains the query — always false for a 1-D line
against a 2-D area, `ShapeField.java` encodes this).

Spark shape, replacing the BKD tessellation tree:

- ``index_lines`` stamps per-doc bounding-box COLUMNS (min/max lat/lon
  via array_min over a codegen transform). Those columns are sargable:
  every query below starts with range predicates that reach the
  parquet scan (PushedFilters), the outer-node reject of the BKD
  traversal.
- box relations are decided ENTIRELY in whole-stage codegen: WITHIN is
  forall(points inside), INTERSECTS is exists(segment hits box) with
  the segment-vs-edge orientation tests unrolled against literal box
  edges — no UDF, no join.
- line-vs-line INTERSECTS keeps the bbox prefilter in codegen and
  refines the bounded survivor set with a vectorized numpy
  segment-pair test inside one Arrow batch (the same two-phase posture
  as ``geo.distance_filter``).
- DISJOINT is the complement of INTERSECTS within the shape-bearing
  docs — evaluated by negating the exact predicate, never by
  subtracting DataFrames.

Lines are ``array<struct<lat:double,lon:double>>`` columns. Documented
divergence: coordinates stay double-precision (no int32 quantization),
and degenerate zero-length segments are treated as points.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

INTERSECTS, WITHIN, DISJOINT, CONTAINS = (
    "INTERSECTS", "WITHIN", "DISJOINT", "CONTAINS")


def index_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Stamp sargable bbox columns from the line's points — the
    LatLonShape.createIndexableFields analog. Write the result
    partitioned/sorted by these to get partition pruning on top."""
    pts = F.col(line_col)
    lats = F.transform(pts, lambda p: p["lat"])
    lons = F.transform(pts, lambda p: p["lon"])
    return (df.withColumn("_minlat", F.array_min(lats))
            .withColumn("_maxlat", F.array_max(lats))
            .withColumn("_minlon", F.array_min(lons))
            .withColumn("_maxlon", F.array_max(lons)))


def _bbox_overlaps(min_lat, max_lat, min_lon, max_lon):
    return ((F.col("_maxlat") >= min_lat) & (F.col("_minlat") <= max_lat)
            & (F.col("_maxlon") >= min_lon) & (F.col("_minlon") <= max_lon))


def _pt_in_box(p, min_lat, max_lat, min_lon, max_lon):
    return ((p["lat"] >= min_lat) & (p["lat"] <= max_lat)
            & (p["lon"] >= min_lon) & (p["lon"] <= max_lon))


def _segments(line_col: str):
    """Consecutive point pairs as structs (a, b) — zip of the array
    with its own tail, all codegen."""
    pts = F.col(line_col)
    n = F.size(pts)
    return F.zip_with(F.slice(pts, 1, n - 1),
                      F.slice(pts, 2, n - 1),
                      lambda a, b: F.struct(a.alias("a"), b.alias("b")))


def _seg_hits_box(seg, min_lat, max_lat, min_lon, max_lon):
    """Exact segment-vs-axis-aligned-box intersection as one boolean
    Column: endpoint containment OR a separating-axis check (the
    segment's bbox overlaps the box AND the box's four corners do not
    all lie strictly on one side of the segment's supporting line)."""
    a, b = seg["a"], seg["b"]
    ay, ax, by, bx = a["lat"], a["lon"], b["lat"], b["lon"]
    inside = (_pt_in_box(a, min_lat, max_lat, min_lon, max_lon)
              | _pt_in_box(b, min_lat, max_lat, min_lon, max_lon))
    # segment bbox vs box (cheap reject; also the only test either
    # geometry needs on the axis-aligned axes)
    sb = ((F.greatest(ay, by) >= min_lat) & (F.least(ay, by) <= max_lat)
          & (F.greatest(ax, bx) >= min_lon) & (F.least(ax, bx) <= max_lon))
    # cross products of (b-a) × (corner-a): all four strictly same sign
    # → the segment's line separates, no intersection (SAT, the axis
    # being the segment normal)
    dy, dx = by - ay, bx - ax

    def side(cy, cx):
        return dx * (F.lit(cy) - ay) - dy * (F.lit(cx) - ax)

    s1 = side(min_lat, min_lon)
    s2 = side(min_lat, max_lon)
    s3 = side(max_lat, min_lon)
    s4 = side(max_lat, max_lon)
    all_pos = (s1 > 0) & (s2 > 0) & (s3 > 0) & (s4 > 0)
    all_neg = (s1 < 0) & (s2 < 0) & (s3 < 0) & (s4 < 0)
    return inside | (sb & ~all_pos & ~all_neg)


def line_box_query(df: DataFrame, min_lat: float, max_lat: float,
                   min_lon: float, max_lon: float,
                   relation: str = INTERSECTS,
                   line_col: str = "line") -> DataFrame:
    """LatLonShape.newBoxQuery over indexed lines. ``df`` must carry
    the ``index_lines`` bbox columns (they are stamped on the fly if
    absent — at scale, persist them so the range predicates push)."""
    if "_minlat" not in df.columns:
        df = index_lines(df, line_col)
    segs = _segments(line_col)
    hits = F.exists(segs, lambda s: _seg_hits_box(
        s, min_lat, max_lat, min_lon, max_lon))
    # single-point "lines" degenerate to point-in-box
    single = (F.size(F.col(line_col)) == 1) & _pt_in_box(
        F.element_at(F.col(line_col), 1), min_lat, max_lat,
        min_lon, max_lon)
    intersects = hits | single
    if relation == INTERSECTS:
        return df.filter(_bbox_overlaps(min_lat, max_lat, min_lon,
                                        max_lon)).filter(intersects)
    if relation == WITHIN:
        # box is convex: every vertex inside ⇔ whole polyline inside
        return df.filter(
            (F.col("_minlat") >= min_lat) & (F.col("_maxlat") <= max_lat)
            & (F.col("_minlon") >= min_lon)
            & (F.col("_maxlon") <= max_lon))
    if relation == DISJOINT:
        # complement via predicate negation (docs whose bbox misses the
        # box are disjoint without the exact test — short-circuits in
        # codegen)
        return df.filter(~(_bbox_overlaps(min_lat, max_lat, min_lon,
                                          max_lon) & intersects))
    if relation == CONTAINS:
        return df.limit(0)    # a 1-D line never contains a 2-D box
    raise ValueError(f"unknown relation {relation!r}")


def _np_seg_intersect(p1, p2, q1, q2) -> np.ndarray:
    """Vectorized proper+improper segment intersection over numpy rows
    (orientation sign tests; collinear overlapping segments count via
    the bbox-touch clause)."""
    def cross(o, a, b):
        return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
                - (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0]))
    d1 = cross(q1, q2, p1)
    d2 = cross(q1, q2, p2)
    d3 = cross(p1, p2, q1)
    d4 = cross(p1, p2, q2)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & \
             (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    # touching / collinear: a zero cross product with bbox overlap
    def on_box(d, a, b, c):
        return (d == 0) \
            & (c[..., 0] <= np.maximum(a[..., 0], b[..., 0])) \
            & (c[..., 0] >= np.minimum(a[..., 0], b[..., 0])) \
            & (c[..., 1] <= np.maximum(a[..., 1], b[..., 1])) \
            & (c[..., 1] >= np.minimum(a[..., 1], b[..., 1]))
    touch = (on_box(d1, q1, q2, p1) | on_box(d2, q1, q2, p2)
             | on_box(d3, p1, p2, q1) | on_box(d4, p1, p2, q2))
    return proper | touch


def line_line_query(df: DataFrame, query_line: list[tuple[float, float]],
                    relation: str = INTERSECTS,
                    line_col: str = "line") -> DataFrame:
    """LatLonShape.newLineQuery(field, INTERSECTS/DISJOINT, line):
    bbox-column prefilter in codegen, exact all-segment-pairs refine in
    ONE Arrow batch function over the bounded survivor set (per row:
    |doc segments| × |query segments| sign tests, vectorized)."""
    if relation not in (INTERSECTS, DISJOINT):
        if relation == CONTAINS or relation == WITHIN:
            raise ValueError(
                f"{relation} of a query LINE against indexed lines is "
                "not defined by the reference surface (lines have no "
                "interior)")
        raise ValueError(f"unknown relation {relation!r}")
    q = [(float(a), float(b)) for a, b in query_line]
    if len(q) < 2:
        raise ValueError("query line needs >= 2 points")
    if "_minlat" not in df.columns:
        df = index_lines(df, line_col)
    qlat = [p[0] for p in q]
    qlon = [p[1] for p in q]
    qa = np.array([[p[1], p[0]] for p in q[:-1]])    # (x=lon, y=lat)
    qb = np.array([[p[1], p[0]] for p in q[1:]])

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _refine(lines: pd.Series) -> pd.Series:
        out = np.zeros(len(lines), dtype=bool)
        for i, pts in enumerate(lines):
            if pts is None or len(pts) < 2:
                continue
            arr = np.array([[p["lon"], p["lat"]] for p in pts])
            p1 = arr[:-1][:, None, :]                # (S, 1, 2)
            p2 = arr[1:][:, None, :]
            hit = _np_seg_intersect(p1, p2, qa[None, :, :],
                                    qb[None, :, :])
            out[i] = bool(hit.any())
        return pd.Series(out)

    pre = _bbox_overlaps(min(qlat), max(qlat), min(qlon), max(qlon))
    if relation == INTERSECTS:
        return df.filter(pre).filter(_refine(F.col(line_col)))
    return df.filter(~(pre & _refine(F.col(line_col))))

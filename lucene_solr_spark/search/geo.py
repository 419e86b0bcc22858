"""LatLonPoint-style geo queries, Spark-first.

Reference surfaces re-expressed over (lat, lon) double columns:

- ``box_filter`` — LatLonPoint.newBoxQuery
  (`document/LatLonPoint.java:176-196`): Catalyst range predicates; a
  dateline-crossing box (min_lon > max_lon) splits into an OR of two
  longitude ranges exactly as the reference splits its BKD query.
- ``distance_filter`` — LatLonPoint.newDistanceQuery
  (`document/LatLonPoint.java:241-252`,
  `search/LatLonPointDistanceQuery.java`): two-phase match — a cheap
  bounding-box pre-filter standing in for the BKD tree traversal, then
  the exact haversine refine. The pre-filter box always CONTAINS the
  circle, so the refine makes it exact.
- ``nearest`` — LatLonDocValuesField.newDistanceSort / FieldDoc
  distance sort (`document/LatLonPointDistanceComparator.java:40`):
  orderBy(distance) + limit → TakeOrderedAndProject (per-partition
  top-k, k rows per partition to the driver).
- ``build_geo_cells`` / ``read_geo_cells`` — persistence partitioned by
  a coarse integer grid cell, so probes prune whole partitions
  (PartitionFilters) — the same posture as the IVF index probe
  (`pipeline/similarity.py`): probe cost scales with touched cells,
  not corpus size.

Documented divergences from the reference: coordinates stay
double-precision degrees (Lucene quantizes to an int32 grid, ~1e-7°,
`geo/GeoEncodingUtils.java:45-80`); distances use the spherical
haversine with Lucene's mean earth radius 6 371 008.7714 m
(`util/SloppyMath.java` TO_METERS / haversinMeters) computed with
standard libm trig, not SloppyMath's table-driven approximation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

# util/SloppyMath.java — mean earth radius in meters
EARTH_MEAN_RADIUS_M = 6_371_008.7714


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters between two (lat, lon) pairs in
    degrees; arguments may be Columns or literals."""
    la1, lo1 = F.radians(lat1), F.radians(lon1)
    la2, lo2 = F.radians(lat2), F.radians(lon2)
    h = (F.pow(F.sin((la2 - la1) / 2), 2)
         + F.cos(la1) * F.cos(la2) * F.pow(F.sin((lo2 - lo1) / 2), 2))
    return 2 * F.lit(EARTH_MEAN_RADIUS_M) * F.asin(F.sqrt(h))


def box_filter(df: DataFrame, min_lat: float, max_lat: float,
               min_lon: float, max_lon: float,
               lat: str = "lat", lon: str = "lon") -> DataFrame:
    """newBoxQuery: range predicates; min_lon > max_lon crosses the
    dateline and becomes an OR of two ranges
    (`LatLonPoint.java:188-196`)."""
    cond = (F.col(lat) >= min_lat) & (F.col(lat) <= max_lat)
    if min_lon <= max_lon:
        cond &= (F.col(lon) >= min_lon) & (F.col(lon) <= max_lon)
    else:
        cond &= ((F.col(lon) >= min_lon) | (F.col(lon) <= max_lon))
    return df.filter(cond)


def _bounding_box(lat0: float, lon0: float, radius_m: float):
    """Smallest lat/lon box containing the circle (the BKD pre-filter
    region). Longitude width uses the cos at the extreme latitude of
    the box; near the poles the lon window degenerates to the full
    range."""
    dlat = math.degrees(radius_m / EARTH_MEAN_RADIUS_M)
    min_lat, max_lat = max(lat0 - dlat, -90.0), min(lat0 + dlat, 90.0)
    max_abs = min(max(abs(min_lat), abs(max_lat)), 89.9)
    dlon = math.degrees(radius_m / (EARTH_MEAN_RADIUS_M
                                    * math.cos(math.radians(max_abs))))
    if dlon >= 180.0 or max(abs(min_lat), abs(max_lat)) >= 89.9:
        return min_lat, max_lat, -180.0, 180.0
    # dateline wrap is handled by box_filter's split form
    min_lon = lon0 - dlon if lon0 - dlon >= -180.0 else lon0 - dlon + 360.0
    max_lon = lon0 + dlon if lon0 + dlon <= 180.0 else lon0 + dlon - 360.0
    return min_lat, max_lat, min_lon, max_lon


def distance_filter(df: DataFrame, lat0: float, lon0: float,
                    radius_m: float, lat: str = "lat",
                    lon: str = "lon") -> DataFrame:
    """newDistanceQuery: bounding-box pre-filter + exact haversine
    refine (two-phase, `LatLonPointDistanceQuery.java`)."""
    b = _bounding_box(lat0, lon0, radius_m)
    pre = box_filter(df, b[0], b[1], b[2], b[3], lat, lon)
    return pre.filter(
        haversine_m(F.col(lat), F.col(lon),
                    F.lit(lat0), F.lit(lon0)) <= radius_m)


def nearest(df: DataFrame, lat0: float, lon0: float, k: int,
            lat: str = "lat", lon: str = "lon",
            dist_col: str = "dist_m", tie_break: str | None = None) -> DataFrame:
    """k nearest rows by haversine distance — distance sort
    (LatLonPointDistanceComparator): TakeOrderedAndProject plan.
    ``tie_break`` adds a deterministic secondary sort column (the
    reference breaks distance ties by docID)."""
    order = [F.asc(dist_col)] + ([F.asc(tie_break)] if tie_break else [])
    return (df.withColumn(dist_col,
                          haversine_m(F.col(lat), F.col(lon),
                                      F.lit(lat0), F.lit(lon0)))
            .orderBy(*order).limit(k))


def polygon_filter(df: DataFrame, polygon: list[tuple[float, float]],
                   lat: str = "lat", lon: str = "lon") -> DataFrame:
    """LatLonShape point-in-polygon (`document/LatLonShape.java:62`
    newPolygonQuery over `geo/Polygon.java`): bbox pre-filter (the BKD
    outer-node reject, as in the reference's Component2D bounding box)
    + even-odd crossing-number refine compiled to ONE whole-stage-
    codegen boolean expression — per point, V comparisons against
    literal edges, no UDF, no join.

    ``polygon`` is a list of (lat, lon) vertices (open or closed ring,
    ≥3 distinct). Documented divergence: boundary points follow the
    ray-casting convention (half-open edges) rather than Lucene's
    explicit on-edge=contained rule — a measure-zero set on double
    coordinates."""
    pts = [(float(a), float(b)) for a, b in polygon]
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    if len(pts) < 3:
        raise ValueError("polygon needs at least 3 distinct vertices")
    min_la, max_la = min(p[0] for p in pts), max(p[0] for p in pts)
    min_lo, max_lo = min(p[1] for p in pts), max(p[1] for p in pts)
    pre = box_filter(df, min_la, max_la, min_lo, max_lo, lat, lon)
    y, x = F.col(lat), F.col(lon)
    crossings = None
    for i in range(len(pts)):
        y1, x1 = pts[i]
        y2, x2 = pts[(i + 1) % len(pts)]
        if y1 == y2:
            continue    # horizontal edge never flips ray parity
        straddles = (F.lit(y1) > y) != (F.lit(y2) > y)
        # lon of the edge at latitude y (slope against literal edge)
        x_at = (F.lit(x2 - x1) * (y - F.lit(y1)) / F.lit(y2 - y1)
                + F.lit(x1))
        c = F.when(straddles & (x < x_at), 1).otherwise(0)
        crossings = c if crossings is None else crossings + c
    return pre.filter(crossings % 2 == 1)


# --- cell-partitioned persistence (partition-pruned probes) -----------

def cell_of(lat, lon, cell_deg: float = 1.0):
    """Integer grid cell id of a point; row-major over a
    (180/cell_deg) × (360/cell_deg) grid."""
    per_row = int(round(360.0 / cell_deg))
    return (F.floor((F.lit(90.0) + lat) / cell_deg) * per_row
            + F.floor((F.lit(180.0) + lon) / cell_deg)).cast("long")


def build_geo_cells(df: DataFrame, path: str,
                    cell_deg: float = 1.0,
                    lat: str = "lat", lon: str = "lon") -> None:
    """Persist partitioned by coarse grid cell; probes prune whole
    partitions (the BKD inner-node skip, as directory pruning)."""
    (df.withColumn("geo_cell", cell_of(F.col(lat), F.col(lon), cell_deg))
     .write.mode("overwrite").partitionBy("geo_cell").parquet(path))


def _cells_for_box(min_lat, max_lat, min_lon, max_lon, cell_deg: float):
    per_row = int(round(360.0 / cell_deg))
    r0 = int(math.floor((90.0 + min_lat) / cell_deg))
    r1 = int(math.floor((90.0 + min(max_lat, 89.999999)) / cell_deg))
    c0 = int(math.floor((180.0 + min_lon) / cell_deg))
    c1 = int(math.floor((180.0 + min(max_lon, 179.999999)) / cell_deg))
    cols = (range(c0, c1 + 1) if min_lon <= max_lon
            else list(range(c0, per_row)) + list(range(0, c1 + 1)))
    return [r * per_row + c for r in range(r0, r1 + 1) for c in cols]


def probe_box_cells(spark, path: str, min_lat: float, max_lat: float,
                    min_lon: float, max_lon: float,
                    cell_deg: float = 1.0,
                    lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Box query over a cell-partitioned table: partition-pruning cell
    IN (…) predicate (shows as PartitionFilters in the scan) plus the
    exact box refine."""
    cells = _cells_for_box(min_lat, max_lat, min_lon, max_lon, cell_deg)
    df = (spark.read.parquet(path)
          .filter(F.col("geo_cell").isin(cells)))
    return box_filter(df, min_lat, max_lat, min_lon, max_lon, lat, lon)


def heatmap_facets(df: DataFrame, min_lat: float, max_lat: float,
                   min_lon: float, max_lon: float, rows: int, cols: int,
                   lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Heatmap faceting (`spatial-extras/.../HeatmapFacetCounter.java:40`,
    Solr SpatialHeatmapFacets): per-cell point counts over a rows×cols
    grid covering the box — cell (gy, gx) with gy = floor((lat − min_lat)
    / Δlat) clamped to the last row/col so the box's max edge is
    inclusive (the reference counts edge points in the boundary cell).
    Dateline-crossing boxes are not gridded (raise), matching the facet
    component's single-region heatmap shape.

    → (gy, gx, count), only non-empty cells (mincount 1). One codegen
    projection + one map-side-combined agg; at 100 TB the driver sees
    ≤ rows×cols rows regardless of corpus size."""
    if min_lon > max_lon:
        raise ValueError("heatmap boxes must not cross the dateline")
    b = box_filter(df, min_lat, max_lat, min_lon, max_lon, lat, lon)
    dlat = (max_lat - min_lat) / rows
    dlon = (max_lon - min_lon) / cols
    gy = F.least(F.floor((F.col(lat) - min_lat) / dlat).cast("long"),
                 F.lit(rows - 1))
    gx = F.least(F.floor((F.col(lon) - min_lon) / dlon).cast("long"),
                 F.lit(cols - 1))
    return (b.select(gy.alias("gy"), gx.alias("gx"))
            .groupBy("gy", "gx").agg(F.count(F.lit(1)).alias("count")))

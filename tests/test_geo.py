"""LatLonPoint-style geo surface (`document/LatLonPoint.java`,
`search/LatLonPointDistanceQuery.java`).

Pins: box semantics incl. dateline split, bounding-box containment of
the distance circle (pre-filter soundness), nearest-k against a numpy
reference, and partition pruning of the cell-partitioned layout."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.geo import (EARTH_MEAN_RADIUS_M,
                                          _bounding_box, box_filter,
                                          build_geo_cells, cell_of,
                                          distance_filter, haversine_m,
                                          nearest, probe_box_cells)


def _hav_np(lat1, lon1, lat2, lon2):
    la1, lo1, la2, lo2 = map(np.radians, (lat1, lon1, lat2, lon2))
    h = (np.sin((la2 - la1) / 2) ** 2
         + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2) ** 2)
    return 2 * EARTH_MEAN_RADIUS_M * np.arcsin(np.sqrt(h))


@pytest.fixture(scope="module")
def pts(spark):
    ids = np.arange(5000)
    lat = (ids * 7919) % 18001 / 100.0 - 90.0
    lon = (ids * 104729) % 36001 / 100.0 - 180.0
    return spark.createDataFrame(
        [(int(i), float(la), float(lo))
         for i, la, lo in zip(ids, lat, lon)],
        "id long, lat double, lon double").cache(), lat, lon


def test_box_and_dateline(pts):
    df, lat, lon = pts
    got = set(r["id"] for r in
              box_filter(df, -10.0, 30.0, 100.0, 140.0).collect())
    exp = set(np.nonzero((lat >= -10) & (lat <= 30)
                         & (lon >= 100) & (lon <= 140))[0].tolist())
    assert got == exp and exp
    # dateline crossing: min_lon > max_lon → OR of two ranges
    got = set(r["id"] for r in
              box_filter(df, -90.0, 90.0, 170.0, -170.0).collect())
    exp = set(np.nonzero((lon >= 170) | (lon <= -170))[0].tolist())
    assert got == exp and exp


def test_distance_filter_exact(pts):
    df, lat, lon = pts
    for lat0, lon0, r in ((48.8566, 2.3522, 2_000_000.0),
                          (-80.0, 10.0, 3_000_000.0),   # near-pole box
                          (0.0, 179.5, 1_000_000.0)):   # dateline box
        got = set(x["id"] for x in
                  distance_filter(df, lat0, lon0, r).collect())
        exp = set(np.nonzero(_hav_np(lat, lon, lat0, lon0) <= r)[0]
                  .tolist())
        assert got == exp and exp, (lat0, lon0, r)


def test_bounding_box_contains_circle():
    rng = np.random.default_rng(7)
    for lat0, lon0, r in zip(rng.uniform(-85, 85, 50),
                             rng.uniform(-180, 180, 50),
                             rng.uniform(1e4, 3e6, 50)):
        b = _bounding_box(lat0, lon0, r)
        # sample circle boundary points; all must fall inside the box
        for brg in np.linspace(0, 2 * math.pi, 36):
            d = r / EARTH_MEAN_RADIUS_M
            la1, lo1 = math.radians(lat0), math.radians(lon0)
            la2 = math.asin(math.sin(la1) * math.cos(d)
                            + math.cos(la1) * math.sin(d) * math.cos(brg))
            lo2 = lo1 + math.atan2(
                math.sin(brg) * math.sin(d) * math.cos(la1),
                math.cos(d) - math.sin(la1) * math.sin(la2))
            plat, plon = math.degrees(la2), math.degrees(lo2)
            if plon > 180:
                plon -= 360
            if plon < -180:
                plon += 360
            assert b[0] - 1e-9 <= plat <= b[1] + 1e-9
            if b[2] <= b[3]:
                assert (b[2] - 1e-6 <= plon <= b[3] + 1e-6
                        or (b[2], b[3]) == (-180.0, 180.0))
            else:                      # dateline-split box
                assert plon >= b[2] - 1e-6 or plon <= b[3] + 1e-6


def test_nearest_matches_numpy(pts):
    df, lat, lon = pts
    got = nearest(df, 48.8566, 2.3522, 15, tie_break="id").collect()
    d = _hav_np(lat, lon, 48.8566, 2.3522)
    order = np.lexsort((np.arange(len(d)), d))[:15]
    assert [r["id"] for r in got] == order.tolist()
    for r, i in zip(got, order):
        assert math.isclose(r["dist_m"], d[i], rel_tol=1e-9)


def test_cell_partition_pruning(pts, tmp_path, spark):
    df, lat, lon = pts
    path = str(tmp_path / "geo")
    build_geo_cells(df, path, cell_deg=10.0)
    got = probe_box_cells(spark, path, -10.0, 30.0, 100.0, 140.0,
                          cell_deg=10.0)
    exp = set(np.nonzero((lat >= -10) & (lat <= 30)
                         & (lon >= 100) & (lon <= 140))[0].tolist())
    assert set(r["id"] for r in got.collect()) == exp
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "geo_cell" in plan
    # the probe touches a bounded subset of the cell directories
    import os
    from lucene_solr_spark.search.geo import _cells_for_box
    on_disk = {int(d.split("=")[1]) for d in os.listdir(path)
               if d.startswith("geo_cell=")}
    probed = set(_cells_for_box(-10.0, 30.0, 100.0, 140.0, 10.0))
    assert 0 < len(probed & on_disk) < len(on_disk)

def _pnpoly(poly, la, lo):
    """Pure-python even-odd crossing reference."""
    inside = False
    n = len(poly)
    for i in range(n):
        y1, x1 = poly[i]
        y2, x2 = poly[(i + 1) % n]
        if (y1 > la) != (y2 > la):
            if lo < (x2 - x1) * (la - y1) / (y2 - y1) + x1:
                inside = not inside
    return inside


def test_polygon_filter_matches_pnpoly(pts):
    """Non-convex polygon (notch) vs a pure-python crossing-number
    reference over every synthetic point — exercises both concavity
    and the bbox prefilter (bbox hits outside the ring must drop)."""
    from lucene_solr_spark.search.geo import polygon_filter
    df, lat, lon = pts
    poly = [(35.0, -10.0), (60.0, -5.0), (65.0, 20.0),
            (50.0, 40.0), (35.0, 25.0), (45.0, 10.0)]
    got = {r["id"] for r in polygon_filter(df, poly).collect()}
    exp = {int(i) for i, (la, lo) in enumerate(zip(lat, lon))
           if _pnpoly(poly, la, lo)}
    assert got == exp
    assert exp, "fixture polygon must contain points"
    # the notch must exclude some bbox-interior points
    bbox = {int(i) for i, (la, lo) in enumerate(zip(lat, lon))
            if 35 <= la <= 65 and -10 <= lo <= 40}
    assert exp < bbox


def test_polygon_closed_ring_and_validation(pts):
    from lucene_solr_spark.search.geo import polygon_filter
    df, _, _ = pts
    tri = [(0.0, 0.0), (20.0, 10.0), (0.0, 20.0)]
    closed = tri + [tri[0]]
    a = {r["id"] for r in polygon_filter(df, tri).collect()}
    b = {r["id"] for r in polygon_filter(df, closed).collect()}
    assert a == b
    with pytest.raises(ValueError):
        polygon_filter(df, [(0.0, 0.0), (1.0, 1.0)])

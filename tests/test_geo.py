"""Geo function family (functions/geo.py): geohash pinned against an
independent Python reference plus canonical test vectors, distances
against plain-Python haversine, point-in-polygon against shapely-free
geometry hand-checks.
"""

from __future__ import annotations

import math

import pytest

from baseline_magician_spark.plans.ch_sql import run_ch_query

B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def ref_geohash(lon: float, lat: float, p: int) -> str:
    lat_i, lon_i = [-90.0, 90.0], [-180.0, 180.0]
    out, cur, bits, even = "", 0, 0, True
    while len(out) < p:
        iv, v = (lon_i, lon) if even else (lat_i, lat)
        mid = (iv[0] + iv[1]) / 2
        if v >= mid:
            cur, iv[0] = cur * 2 + 1, mid
        else:
            cur, iv[1] = cur * 2, mid
        even, bits = not even, bits + 1
        if bits == 5:
            out, cur, bits = out + B32[cur], 0, 0
    return out


def ref_haversine(lon1, lat1, lon2, lat2, radius):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (
        math.sin(math.radians(lat2 - lat1) / 2) ** 2
        + math.cos(p1)
        * math.cos(p2)
        * math.sin(math.radians(lon2 - lon1) / 2) ** 2
    )
    return 2 * math.asin(min(1.0, math.sqrt(a))) * radius


def _one(spark, expr_sql):
    df = spark.createDataFrame([(1,)], "id int")
    return (
        run_ch_query(f"SELECT {expr_sql} AS r FROM t", {"t": df})
        .collect()[0]
        .r
    )


@pytest.mark.parametrize(
    "lon,lat,p",
    [
        (-5.60302734375, 42.60498046875, 5),   # canonical ezs42
        (13.361389, 38.115556, 8),             # Palermo sqc8b49r
        (0.0, 0.0, 1),
        (179.999, -89.999, 12),
        (-179.999, 89.999, 7),
    ],
)
def test_geohash_encode_matches_reference(spark, lon, lat, p):
    got = _one(spark, f"geohashEncode({lon}, {lat}, {p})")
    assert got == ref_geohash(lon, lat, p)


def test_geohash_canonical_vector(spark):
    assert _one(
        spark, "geohashEncode(-5.60302734375, 42.60498046875, 5)"
    ) == "ezs42"


def test_geohash_decode_center(spark):
    got = _one(spark, "geohashDecode('ezs42')")
    # ezs42 cell: lon in [-5.625, -5.5859375], lat [42.5830, 42.627]
    assert math.isclose(got["1"], -5.60302734375, abs_tol=1e-9)
    assert math.isclose(got["2"], 42.60498046875, abs_tol=1e-9)


def test_geohash_roundtrip_recenters(spark):
    # decode(encode(p)) must re-encode to the same hash
    lon, lat = 101.7, -33.3
    h = ref_geohash(lon, lat, 9)
    got = _one(spark, f"geohashDecode('{h}')")
    assert ref_geohash(got["1"], got["2"], 9) == h


def test_great_circle_distance(spark):
    got = _one(
        spark, "greatCircleDistance(-86.67, 36.12, -118.40, 33.94)"
    )
    want = ref_haversine(-86.67, 36.12, -118.40, 33.94, 6371000.0)
    assert math.isclose(got, want, rel_tol=1e-12)


def test_geo_distance_uses_latitude_corrected_radius(spark):
    got = _one(spark, "geoDistance(0.0, 60.0, 1.0, 60.0)")
    mid = math.radians(60.0)
    radius = 6378137.0 - 21385.0 * math.sin(mid) ** 2
    want = ref_haversine(0.0, 60.0, 1.0, 60.0, radius)
    assert math.isclose(got, want, rel_tol=1e-12)


def test_great_circle_angle_quarter(spark):
    assert math.isclose(
        _one(spark, "greatCircleAngle(0.0, 0.0, 90.0, 0.0)"), 90.0
    )


@pytest.mark.parametrize(
    "pt,want",
    [
        ("(3.0, 3.0)", True),    # inside
        ("(10.0, 10.0)", False),  # outside
        ("(6.0, 6.0)", True),    # inside, near the slanted edge
        ("(-1.0, 2.0)", False),  # left of everything
    ],
)
def test_point_in_polygon_concavefree_quad(spark, pt, want):
    poly = "[(6.0, 0.0), (8.0, 4.0), (5.0, 8.0), (0.0, 2.0)]"
    assert _one(spark, f"pointInPolygon({pt}, {poly})") is want


def test_point_in_polygon_concave(spark):
    # concave "arrow": (0,0) (4,0) (4,4) (2,1.5) (0,4) — the notch
    # at (2, 3) is OUTSIDE even though the bounding box contains it
    poly = "[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (2.0, 1.5), (0.0, 4.0)]"
    assert _one(spark, f"pointInPolygon((2.0, 3.0), {poly})") is False
    assert _one(spark, f"pointInPolygon((2.0, 1.0), {poly})") is True


def test_point_in_ellipses(spark):
    assert _one(
        spark,
        "pointInEllipses(2.0, 2.0, 0.0, 0.0, 1.0, 1.0, 2.0, 2.5, 1.0, 1.0)",
    ) is True
    assert _one(
        spark, "pointInEllipses(5.0, 5.0, 0.0, 0.0, 1.0, 1.0)"
    ) is False

"""Geo function family (CH §geo surface): great-circle distances and
angles, point-in-polygon / point-in-ellipses tests, geohash encode /
decode.

Everything is a pure Column expression — the geohash folds walk a
bounded bit sequence (precision ≤ 12 → ≤ 60 steps) with
``F.aggregate``, the polygon ray-cast folds the vertex list — so the
whole family stays inside whole-stage codegen; no Python touches row
data.

Divergences (documented, not emulated):
- CH's greatCircleDistance/geoDistance use a table-driven fast
  approximation of the trig (geodist.cpp); here the exact haversine
  evaluates instead, with the same radius model: a mean sphere
  (R = 6371 km) for greatCircleDistance, a latitude-corrected WGS-84
  radius (R(φ) = 6378137 − 21385·sin²φ_mid metres) for geoDistance.
  Agreement with CH is ~4 significant digits — the error of CH's own
  approximation.
- pointInPolygon returns BOOLEAN (CH: UInt8 0/1); the dialect's
  comparison layer treats them interchangeably.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c) -> Column:
    c = c if isinstance(c, Column) else F.lit(c)
    return c.cast("double")


_MEAN_RADIUS_M = 6371000.0
_WGS84_A_M = 6378137.0
_WGS84_DROP_M = 21385.0  # a − b: polar radius deficit


def _haversine_angle(lon1, lat1, lon2, lat2) -> Column:
    """Central angle (radians) between two (lon, lat) degree points —
    the numerically stable haversine form."""
    rlat1, rlat2 = F.radians(_d(lat1)), F.radians(_d(lat2))
    dlat = F.radians(_d(lat2) - _d(lat1))
    dlon = F.radians(_d(lon2) - _d(lon1))
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2
    )
    return 2 * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def great_circle_distance(lon1, lat1, lon2, lat2) -> Column:
    """CH greatCircleDistance(lon1, lat1, lon2, lat2) -> metres on the
    mean sphere."""
    return _haversine_angle(lon1, lat1, lon2, lat2) * _MEAN_RADIUS_M


def geo_distance(lon1, lat1, lon2, lat2) -> Column:
    """CH geoDistance: like greatCircleDistance but on a latitude-
    corrected WGS-84 radius evaluated at the midpoint latitude."""
    mid = F.radians((_d(lat1) + _d(lat2)) / 2)
    radius = _WGS84_A_M - _WGS84_DROP_M * F.sin(mid) ** 2
    return _haversine_angle(lon1, lat1, lon2, lat2) * radius


def great_circle_angle(lon1, lat1, lon2, lat2) -> Column:
    """CH greatCircleAngle -> central angle in DEGREES."""
    return F.degrees(_haversine_angle(lon1, lat1, lon2, lat2))


def point_in_ellipses(x, y, *params) -> Column:
    """CH pointInEllipses(x, y, x0, y0, a0, b0, ...): true when the
    point lies inside ANY of the axis-aligned ellipses; the ellipse
    parameters arrive as flat (center_x, center_y, a, b) quadruples."""
    if not params or len(params) % 4:
        raise ValueError(
            "pointInEllipses needs (x, y) plus 4 args per ellipse"
        )
    px, py = _d(x), _d(y)
    hit = F.lit(False)
    for i in range(0, len(params), 4):
        cx, cy, a, b = (_d(p) for p in params[i : i + 4])
        hit = hit | (
            ((px - cx) / a) ** 2 + ((py - cy) / b) ** 2 <= 1.0
        )
    return hit


def point_in_polygon(pt, poly) -> Column:
    """CH pointInPolygon((x, y), [(x1, y1), ...]): even-odd ray cast.
    The vertex list folds once per row; positional struct-field access
    goes through a cast (tuple literals carry arbitrary field names).
    Vertical edges short-circuit the guard before the slope division
    (null-safe under non-ANSI division)."""
    p = (pt if isinstance(pt, Column) else F.lit(pt)).cast(
        "struct<x:double,y:double>"
    )
    edges = (poly if isinstance(poly, Column) else F.lit(poly)).cast(
        "array<struct<x:double,y:double>>"
    )
    n = F.size(edges)

    def step(acc: Column, i: Column) -> Column:
        a = F.element_at(edges, i)
        b = F.element_at(edges, (i % n) + 1)
        crosses = (
            ((a["y"] > p["y"]) != (b["y"] > p["y"]))
            & (
                p["x"]
                < (b["x"] - a["x"])
                * (p["y"] - a["y"])
                / (b["y"] - a["y"])
                + a["x"]
            )
        )
        return F.when(crosses, ~acc).otherwise(acc)

    return F.aggregate(F.sequence(F.lit(1), n), F.lit(False), step)


_GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _b32_arr() -> Column:
    # built lazily: F.lit needs an active SparkContext, and this
    # module imports before the test session exists
    return F.array(*[F.lit(ch) for ch in _GEOHASH_B32])


def geohash_encode(lon, lat, precision=12) -> Column:
    """CH geohashEncode(longitude, latitude[, precision]) -> base-32
    geohash string. One flat fold over the precision*5 bit positions:
    even global bits bisect longitude, odd bits latitude; every fifth
    bit flushes a character."""
    p = (
        precision
        if isinstance(precision, Column)
        else F.lit(int(precision))
    ).cast("int")
    # CH clamps precision to [1, 12]
    p = F.greatest(F.lit(1), F.least(F.lit(12), p))
    lon_c, lat_c = _d(lon), _d(lat)
    acc0 = F.struct(
        F.lit(-90.0).alias("lat_lo"),
        F.lit(90.0).alias("lat_hi"),
        F.lit(-180.0).alias("lon_lo"),
        F.lit(180.0).alias("lon_hi"),
        F.lit(0).alias("cur"),
        F.lit("").alias("s"),
    )

    def step(acc: Column, i: Column) -> Column:
        even = i % 2 == 0
        lon_mid = (acc["lon_lo"] + acc["lon_hi"]) / 2
        lat_mid = (acc["lat_lo"] + acc["lat_hi"]) / 2
        bit = F.when(even, (lon_c >= lon_mid).cast("int")).otherwise(
            (lat_c >= lat_mid).cast("int")
        )
        cur = acc["cur"] * 2 + bit
        flush = i % 5 == 4
        return F.struct(
            # bit = 1 -> the value sits in the upper half: raise the
            # lower bound; bit = 0 -> lower the upper bound
            F.when(~even & (bit == 1), lat_mid)
            .otherwise(acc["lat_lo"])
            .alias("lat_lo"),
            F.when(~even & (bit == 0), lat_mid)
            .otherwise(acc["lat_hi"])
            .alias("lat_hi"),
            F.when(even & (bit == 1), lon_mid)
            .otherwise(acc["lon_lo"])
            .alias("lon_lo"),
            F.when(even & (bit == 0), lon_mid)
            .otherwise(acc["lon_hi"])
            .alias("lon_hi"),
            F.when(flush, F.lit(0)).otherwise(cur).alias("cur"),
            F.when(
                flush,
                F.concat(acc["s"], F.element_at(_b32_arr(), cur + 1)),
            )
            .otherwise(acc["s"])
            .alias("s"),
        )

    folded = F.aggregate(F.sequence(F.lit(0), 5 * p - 1), acc0, step)
    return folded["s"]


def geohash_decode(h) -> Column:
    """CH geohashDecode(s) -> (longitude, latitude) — the center of
    the geohash cell, tuple fields named "1"/"2" so tupleElement
    resolves positionally (the sumMap convention)."""
    s = F.lower(h if isinstance(h, Column) else F.lit(h))
    vals = F.transform(
        # split('' ) yields a trailing empty string element; filter it
        F.filter(F.split(s, ""), lambda c: c != ""),
        lambda c: F.array_position(_b32_arr(), c).cast("int") - 1,
    )
    nbits = F.size(vals) * 5
    acc0 = F.struct(
        F.lit(-90.0).alias("lat_lo"),
        F.lit(90.0).alias("lat_hi"),
        F.lit(-180.0).alias("lon_lo"),
        F.lit(180.0).alias("lon_hi"),
    )

    def step(acc: Column, i: Column) -> Column:
        v = F.element_at(vals, (i / 5).cast("int") + 1)
        # shiftright needs a literal count -> divide by 2^(4 - i%5)
        bit = (
            v
            / F.pow(F.lit(2.0), (4 - (i % 5)).cast("double"))
        ).cast("int") % 2
        even = i % 2 == 0
        lon_mid = (acc["lon_lo"] + acc["lon_hi"]) / 2
        lat_mid = (acc["lat_lo"] + acc["lat_hi"]) / 2
        return F.struct(
            F.when(~even & (bit == 1), lat_mid)
            .otherwise(acc["lat_lo"])
            .alias("lat_lo"),
            F.when(~even & (bit == 0), lat_mid)
            .otherwise(acc["lat_hi"])
            .alias("lat_hi"),
            F.when(even & (bit == 1), lon_mid)
            .otherwise(acc["lon_lo"])
            .alias("lon_lo"),
            F.when(even & (bit == 0), lon_mid)
            .otherwise(acc["lon_hi"])
            .alias("lon_hi"),
        )

    folded = F.aggregate(
        # sequence(0, -1) would DESCEND: clamp so the empty string
        # decodes to the world center instead of misfolding
        F.sequence(F.lit(0), F.greatest(nbits - 1, F.lit(0))),
        acc0,
        step,
    )
    return F.struct(
        ((folded["lon_lo"] + folded["lon_hi"]) / 2).alias("1"),
        ((folded["lat_lo"] + folded["lat_hi"]) / 2).alias("2"),
    )

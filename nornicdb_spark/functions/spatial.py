"""Spatial functions — point / distance / bbox predicates (SURVEY §2.6
spatial row; reference executor_show.go:141-148 advertises point,
point.distance, point.withinBBox, point.withinDistance;
functions_eval_math.go implements haversine).

Points are plain ``struct<x, y, srid>`` columns — no geometry library;
WGS84 distance is the haversine formula as a native Column expression
(JVM codegen, vectorizable, pushdown-friendly). x = longitude,
y = latitude, matching Neo4j's point({longitude, latitude}).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_000.0  # mean Earth radius, meters


def point(longitude: Column, latitude: Column, srid: int = 4326) -> Column:
    """point({longitude, latitude}) → struct(x, y, srid)."""
    return F.struct(
        longitude.cast("double").alias("x"),
        latitude.cast("double").alias("y"),
        F.lit(srid).alias("srid"),
    )


def haversine_distance_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters (point.distance on WGS84 points;
    reference haversin function, functions_eval_math.go). Formula:
    2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))."""
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def euclidean_distance(p1: Column, p2: Column) -> Column:
    """Planar distance for cartesian (srid 7203) points."""
    dx = p2["x"] - p1["x"]
    dy = p2["y"] - p1["y"]
    return F.sqrt(dx * dx + dy * dy)


def point_distance(p1: Column, p2: Column) -> Column:
    """point.distance over two point structs.

    Matches the reference (functions_eval_math.go): haversine meters for
    geographic points (srid 4326), plain Euclidean for cartesian points
    (srid 7203, built by point({x, y})). Branches on the first point's srid.
    """
    return F.when(
        p1["srid"] == F.lit(7203), euclidean_distance(p1, p2)
    ).otherwise(haversine_distance_m(p1["y"], p1["x"], p2["y"], p2["x"]))


def within_bbox(p: Column, min_x, min_y, max_x, max_y) -> Column:
    """point.withinBBox — inclusive rectangle test on x/y."""
    return (
        (p["x"] >= min_x) & (p["x"] <= max_x) & (p["y"] >= min_y) & (p["y"] <= max_y)
    )


def within_distance(p1: Column, p2: Column, meters) -> Column:
    """point.withinDistance — haversine threshold predicate."""
    return point_distance(p1, p2) <= meters


def polygon(points: Column) -> Column:
    """polygon(points :: LIST<POINT>) — the vertex array IS the geometry
    (reference executor_show.go:144; closed implicitly, like the
    reference's ray caster which wraps the last vertex to the first)."""
    return points


def line_string(points: Column) -> Column:
    """lineString(points :: LIST<POINT>) (reference executor_show.go:145)."""
    return points


def point_in_polygon(p: Column, poly: Column) -> Column:
    """point.contains(polygon, point) / point.intersects(point, polygon)
    — ray casting, as the reference (helpers.go:188-230 pointInPolygon):
    cast a ray in +x; odd crossing count = inside; <3 vertices = false.

    Pure Column expression: the crossing count is an ``aggregate`` over
    the vertex-index sequence — JVM-side, codegen'd, scales as a plain
    projection (no Python in the row path)."""
    n = F.size(poly)

    def step(acc: Column, i: Column) -> Column:
        vi = F.element_at(poly, i + 1)                     # 1-based
        vj = F.element_at(poly, F.when(i == 0, n).otherwise(i))
        crosses = (vi["y"] > p["y"]) != (vj["y"] > p["y"])
        x_int = (
            (vj["x"] - vi["x"]) * (p["y"] - vi["y"]) / (vj["y"] - vi["y"])
            + vi["x"]
        )
        hit = F.coalesce(crosses & (p["x"] < x_int), F.lit(False))
        return acc + F.when(hit, F.lit(1)).otherwise(F.lit(0))

    crossings = F.aggregate(F.sequence(F.lit(0), n - 1), F.lit(0), step)
    return F.when(n < 3, F.lit(False)).otherwise(crossings % 2 == 1)

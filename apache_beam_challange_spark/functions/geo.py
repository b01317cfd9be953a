"""Geodesic distance as a native, vectorized column expression.

The reference computes WGS-84 geodesic distance per-row in Python via
``geopy.distance.geodesic(...).kilometers`` inside a DoFn
(``pipelines/stations.py:18-22``, ``pipelines/total_distance.py:41-47``) —
interpreted, row-at-a-time, unvectorizable. The engine standardizes on the
haversine great-circle formula (mean earth radius R=6371.0088 km), built
purely from ``pyspark.sql.functions`` so it rides whole-stage codegen and
differs from geopy's Karney geodesic by ≲0.5% (SURVEY.md §2.7-F1).

``haversine_km_sql`` emits the *identical* formula as ANSI SQL text so the
DuckDB oracle computes bit-equivalent doubles (same IEEE ops in the same
order), making value-hash comparison stable after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two (lat, lon) pairs, degrees in."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The same formula as SQL text (DuckDB + Spark SQL compatible)."""
    dlat = f"RADIANS({lat2} - {lat1})"
    dlon = f"RADIANS({lon2} - {lon1})"
    a = (
        f"SIN({dlat} / 2) * SIN({dlat} / 2) + "
        f"COS(RADIANS({lat1})) * COS(RADIANS({lat2})) * "
        f"SIN({dlon} / 2) * SIN({dlon} / 2)"
    )
    return f"2.0 * {EARTH_RADIUS_KM} * ASIN(SQRT({a}))"

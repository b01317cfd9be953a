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

import pandas as pd
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


def vincenty_km_np(lat1, lon1, lat2, lon2, *, tol=1e-12, max_iter=200):
    """Vectorized Vincenty inverse on the WGS-84 ellipsoid (numpy arrays of
    degrees in, km out) — the geodesic-parity path for F1. geopy's default
    is Karney's algorithm on the same ellipsoid; Vincenty agrees with it to
    well under a millimetre for non-antipodal pairs (station-to-station
    distances), so this closes the haversine≲0.5% divergence without any
    external dependency. Public formulation: Vincenty (1975), Survey Review
    XXIII(176); reference parity target: pipelines/stations.py:18-22."""
    import numpy as np

    a = 6378137.0
    f = 1 / 298.257223563
    b = (1 - f) * a
    phi1, phi2 = np.radians(np.asarray(lat1, float)), np.radians(np.asarray(lat2, float))
    L = np.radians(np.asarray(lon2, float) - np.asarray(lon1, float))
    U1, U2 = np.arctan((1 - f) * np.tan(phi1)), np.arctan((1 - f) * np.tan(phi2))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    def _step(lam):
        sinlam, coslam = np.sin(lam), np.cos(lam)
        sin_sigma = np.hypot(cosU2 * sinlam, cosU1 * sinU2 - sinU1 * cosU2 * coslam)
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * coslam
        sigma = np.arctan2(sin_sigma, cos_sigma)
        safe_sin = np.where(sin_sigma == 0, 1.0, sin_sigma)
        sin_alpha = np.where(sin_sigma == 0, 0.0, cosU1 * cosU2 * sinlam / safe_sin)
        cos2_alpha = 1.0 - sin_alpha**2
        safe_cos2 = np.where(cos2_alpha == 0, 1.0, cos2_alpha)
        cos2sm = np.where(  # equatorial lines: cos^2(alpha) = 0
            cos2_alpha == 0, 0.0, cos_sigma - 2 * sinU1 * sinU2 / safe_cos2
        )
        return sin_sigma, cos_sigma, sigma, sin_alpha, cos2_alpha, cos2sm

    lam = L.copy()
    converged = np.zeros_like(lam, dtype=bool)
    for _ in range(max_iter):
        sin_sigma, cos_sigma, sigma, sin_alpha, cos2_alpha, cos2sm = _step(lam)
        C = f / 16 * cos2_alpha * (4 + f * (4 - 3 * cos2_alpha))
        lam_new = L + (1 - C) * f * sin_alpha * (
            sigma + C * sin_sigma * (cos2sm + C * cos_sigma * (-1 + 2 * cos2sm**2))
        )
        converged |= np.abs(lam_new - lam) < tol
        lam = lam_new
        if np.all(converged):
            break
    sin_sigma, cos_sigma, sigma, sin_alpha, cos2_alpha, cos2sm = _step(lam)
    u2 = cos2_alpha * (a**2 - b**2) / b**2
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    B = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    dsig = B * sin_sigma * (
        cos2sm
        + B / 4 * (
            cos_sigma * (-1 + 2 * cos2sm**2)
            - B / 6 * cos2sm * (-3 + 4 * sin_sigma**2) * (-3 + 4 * cos2sm**2)
        )
    )
    s = b * A * (sigma - dsig)
    out = np.where(sin_sigma == 0, 0.0, s / 1000.0)
    # Non-converged pairs (classically: near-antipodal points, where this
    # iteration is known to fail) must NOT yield a plausible-looking wrong
    # distance — surface NaN so callers/tests see the failure explicitly.
    return np.where(converged | (sin_sigma == 0), out, np.nan)


def geodesic_km_udf():
    """Vectorized pandas UDF for WGS-84 geodesic distance: routes through
    geopy (Karney) when importable — exact parity with the reference DoFn —
    else the in-repo Vincenty (sub-mm agreement). Arrow-batched; the slow
    per-row geopy loop only exists on the geopy branch, which is the point
    of the parity mode."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geodesic_km(
        lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series
    ) -> pd.Series:
        try:
            from geopy.distance import geodesic

            return pd.Series(
                [
                    geodesic((a, b), (c, d)).kilometers
                    for a, b, c, d in zip(lat1, lon1, lat2, lon2)
                ],
                index=lat1.index,
            )
        except ImportError:
            return pd.Series(
                vincenty_km_np(
                    lat1.to_numpy(), lon1.to_numpy(), lat2.to_numpy(), lon2.to_numpy()
                ),
                index=lat1.index,
            )

    return geodesic_km


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

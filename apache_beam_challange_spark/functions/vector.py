"""Vector expression builders over ``array<float>`` embedding columns
(SURVEY.md §2.9): dot product, L2 norm, cosine similarity — all native
higher-order array functions (``aggregate``/``zip_with``), evaluated JVM-side
in double precision with strictly sequential folds, so the DuckDB oracle
(which also folds lists left-to-right) reproduces them to the last ulp.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))

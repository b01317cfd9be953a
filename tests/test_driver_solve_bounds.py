"""Property tests pinning the driver-solve discipline (VERDICT r13 #9):
every family that collects a sufficient statistic and walks the fixed
point in the driver must collect a PARAMETER-BOUNDED number of rows —
states², slate², k·dim, domain buckets — never a corpus-sized frame.
Each test intercepts DataFrame.collect during query construction and
asserts the observed row counts stay within the family's formula at two
data scales (sf0.001 and sf0.01, 10× the rows), so a future refactor
that silently widens a collect fails here before it OOMs a driver."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# Spark 4: classic sessions instantiate the classic DataFrame subclass,
# which OVERRIDES collect/toPandas — patch the concrete class, not the base
from pyspark.sql.classic.dataframe import DataFrame

import apache_beam_challange_spark.plans.wave4 as w4
import apache_beam_challange_spark.plans.wave6 as w6

SF_SMALL = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.01"


@pytest.fixture()
def collect_sizes(monkeypatch):
    """Record the row count of every DataFrame.collect() in the block."""
    sizes: list[int] = []
    orig = DataFrame.collect

    def wrapper(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", wrapper)
    return sizes


def _n_types(spark, sf_dir: str) -> int:
    from apache_beam_challange_spark.sources.catalog import load_table

    return (
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .count()
    )


def _max_collect(spark, sizes, fn, sf_dir: str) -> int:
    sizes.clear()
    fn(spark, sf_dir)  # build only — the solver collects during build
    assert sizes, f"{fn.__name__} no longer collects driver-solve state"
    return max(sizes)


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_BIG])
def test_markov_solvers_collect_states_squared(spark, collect_sizes, sf_dir):
    s = _n_types(spark, sf_dir)
    bound = (s + 2) ** 2  # states = event types + CONV + NULL
    got = _max_collect(
        spark, collect_sizes, w6.markov_removal_attribution, sf_dir
    )
    assert got <= bound, f"markov_removal collected {got} > {bound}"
    got = _max_collect(spark, collect_sizes, w6.markov_entropy_rate, sf_dir)
    assert got <= bound, f"markov_entropy collected {got} > {bound}"


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_BIG])
def test_ipf_collects_types_by_hours(spark, collect_sizes, sf_dir):
    s = _n_types(spark, sf_dir)
    got = _max_collect(spark, collect_sizes, w6.ipf_raking_type_hour, sf_dir)
    assert got <= s * 24, f"ipf collected {got} > {s * 24}"


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_BIG])
def test_fs_em_collects_bounded_patterns(spark, collect_sizes, sf_dir):
    got = _max_collect(
        spark, collect_sizes, w6.fs_em_parameter_estimation, sf_dir
    )
    assert got <= 16, f"fs_em collected {got} > 16 patterns"


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_BIG])
def test_platt_collects_bounded_bins(spark, collect_sizes, sf_dir):
    got = _max_collect(
        spark, collect_sizes, w6.platt_scaling_value_purchase, sf_dir
    )
    assert got <= 21, f"platt collected {got} > 21 bins"


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_BIG])
def test_bradley_terry_collects_slate_squared(spark, collect_sizes, sf_dir):
    bound = w4._BT_SLATE * (w4._BT_SLATE - 1)
    got = _max_collect(
        spark, collect_sizes, w4.bradley_terry_part_prefs, sf_dir
    )
    assert got <= bound, f"bradley_terry collected {got} > {bound}"


@pytest.mark.parametrize("n_vecs", [64, 256])
def test_kmeans_collects_k_dim_per_round(spark, collect_sizes, n_vecs):
    from apache_beam_challange_spark.operators.clustering import (
        kmeans_centroids,
    )

    k, dim, n_iter = 4, 6, 2
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.lit("x").alias("label"),
        F.array(
            *[
                (F.col("id") * (i + 1) % 17).cast("double")
                for i in range(dim)
            ]
        ).alias("embedding"),
    )
    collect_sizes.clear()
    kmeans_centroids(vecs, k=k, n_iter=n_iter)
    assert len(collect_sizes) == n_iter
    assert all(s <= k * dim for s in collect_sizes), (
        f"kmeans round state {collect_sizes} exceeds k*dim={k * dim}"
    )


def test_huber_collect_is_capped(spark, monkeypatch):
    """The huber driver solve's collect is bounded by the CAP itself
    (limit(cap+1)) — even a pathologically wide value domain cannot pull
    more than cap+1 rows into the driver."""
    sizes: list[int] = []
    orig = DataFrame.toPandas

    def wrapper(self):
        pdf = orig(self)
        sizes.append(len(pdf))
        return pdf

    monkeypatch.setattr(DataFrame, "toPandas", wrapper)
    w6.huber_location_by_type(spark, SF_BIG)
    assert sizes and max(sizes) <= w6._HUBER_DRIVER_CAP + 1

"""Property-based tests (hypothesis): algebraic invariants of the engine's
operators over generated inputs — complementing the example-based and
oracle-based suites."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from apache_beam_challange_spark.functions.geo import haversine_km
from apache_beam_challange_spark.operators.joins import full_outer_zero_fill
from apache_beam_challange_spark.operators.relational import group_count, top_k
from apache_beam_challange_spark.operators.skew import salted_group_count

SETTINGS = dict(max_examples=10, deadline=None)

lat = st.floats(min_value=-89.0, max_value=89.0, allow_nan=False)
lon = st.floats(min_value=-179.0, max_value=179.0, allow_nan=False)


@settings(**SETTINGS)
@given(lat, lon, lat, lon)
def test_haversine_symmetric_nonneg(spark, lat1, lon1, lat2, lon2):
    df = spark.createDataFrame([(lat1, lon1, lat2, lon2)], ["a", "b", "c", "d"])
    r = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("ab"),
        haversine_km(F.col("c"), F.col("d"), F.col("a"), F.col("b")).alias("ba"),
        haversine_km(F.col("a"), F.col("b"), F.col("a"), F.col("b")).alias("self"),
    ).collect()[0]
    assert r["ab"] >= 0.0
    assert abs(r["ab"] - r["ba"]) < 1e-9
    assert r["self"] == 0.0
    assert r["ab"] <= 20039.0  # half the mean circumference + slack


keys = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 3)), min_size=1, max_size=60
)


@settings(**SETTINGS)
@given(keys)
def test_group_count_partitions_total(spark, rows):
    df = spark.createDataFrame(rows, ["k1", "k2"])
    counts = group_count(df, ["k1", "k2"], alias="n").collect()
    assert sum(r["n"] for r in counts) == len(rows)
    assert all(r["n"] >= 1 for r in counts)


@settings(**SETTINGS)
@given(keys, st.integers(1, 8))
def test_topk_is_sorted_prefix(spark, rows, k):
    df = spark.createDataFrame(rows, ["k1", "k2"])
    counts = group_count(df, ["k1", "k2"], alias="n")
    order = [F.col("n").desc()]
    tie = ("k1", "k2")
    full = counts.orderBy(*order, *[F.col(c) for c in tie]).collect()
    top = top_k(counts, k, order=order, tiebreak=tie).collect()
    assert top == full[:k]


@settings(**SETTINGS)
@given(keys)
def test_salted_count_equals_plain_count(spark, rows):
    df = spark.createDataFrame(
        [(a, b, i) for i, (a, b) in enumerate(rows)], ["k1", "k2", "uid"]
    )
    plain = {
        (r["k1"], r["k2"]): r["n"]
        for r in group_count(df, ["k1", "k2"], alias="n").collect()
    }
    salted = {
        (r["k1"], r["k2"]): r["n"]
        for r in salted_group_count(df, ["k1", "k2"], "uid", n_salts=4).collect()
    }
    assert plain == salted


@settings(**SETTINGS)
@given(
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 100)), min_size=1, max_size=20),
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 100)), min_size=1, max_size=20),
)
def test_zero_fill_join_covers_key_union(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, ["k", "a"]).dropDuplicates(["k"])
    right = spark.createDataFrame(right_rows, ["k", "b"]).dropDuplicates(["k"])
    out = full_outer_zero_fill(left, right, on=["k"], fill={"a": 0, "b": 0})
    got_keys = {r["k"] for r in out.collect()}
    want = {k for k, _ in left_rows} | {k for k, _ in right_rows}
    assert got_keys == want
    assert all(
        r["a"] is not None and r["b"] is not None for r in out.collect()
    )

"""Operator-coverage queries: one named query per operator class in
SURVEY.md §2 that the reference uses (or that Spark gives natively and the
engine exposes — §2's "not present / free in Spark" rows).

Determinism conventions (FIXTURES.md §4):
- Floating aggregates are stabilized by summing exact decimals of the
  per-row doubles (identical IEEE products in both engines), then casting
  the exact sum back to double: ``CAST(SUM(CAST(ROUND(x,4) AS
  DECIMAL(18,4))) AS DOUBLE)``. Plain double-sum order differs between
  Spark partial aggregation and DuckDB.
- Every floating output column is rounded; every top-k is fully tie-broken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_beam_challange_spark.operators.relational import (
    drop_null_rows,
    group_count,
    project,
    top_k,
)
from apache_beam_challange_spark.plans.registry import query
from apache_beam_challange_spark.sources.catalog import (
    RIDES_CTE,
    load_table,
    register_views,
    rides,
)


def _dec_sum(col: F.Column, alias: str) -> F.Column:
    """Order-insensitive (exact) sum of a double expression -> double.

    Each row is fixed to 4 decimals via ``FLOOR(x*1e4 + 0.5)`` — pure IEEE
    double ops that both Spark and DuckDB evaluate bit-identically (their
    ROUND() implementations differ at half-way representations) — then
    summed exactly as int64 and scaled back in one double division."""
    return (
        (F.sum(F.floor(col * 10000 + F.lit(0.5)).cast("long")) / 10000.0)
        .alias(alias)
    )


def _dec_sum_sql(expr: str, alias: str) -> str:
    return (
        f"SUM(CAST(FLOOR(({expr}) * 10000 + 0.5) AS BIGINT)) / CAST(10000.0 AS DOUBLE) AS {alias}"
    )


# --- P1 + P5: projection with null-filter (reference remove_none) -----------

@query(
    "project_filter_nulls",
    oracle=f"""
WITH {RIDES_CTE}
SELECT ride_id, start_station_id, end_station_id
FROM rides
WHERE start_station_id IS NOT NULL AND end_station_id IS NOT NULL
""".strip(),
)
def project_filter_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 projection + P5 ``remove_none`` null guard
    (``pipelines/total_distance.py:55-57,97-98``). The filter lands before
    any shuffle; Catalyst pushes IsNotNull into the scan."""
    r = project(rides(spark, sf_dir), "ride_id", "start_station_id", "end_station_id")
    return drop_null_rows(r, ["start_station_id", "end_station_id"])


# --- distinct (dedup primitive, SURVEY §2.4 free-in-Spark row) --------------

@query(
    "distinct_pairs",
    oracle=f"""
WITH {RIDES_CTE}
SELECT DISTINCT start_station_id, end_station_id FROM rides
""".strip(),
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over the pair key — Spark plans it as a hash aggregate with
    map-side partials, so the shuffle carries unique pairs only."""
    return rides(spark, sf_dir).select("start_station_id", "end_station_id").distinct()


# --- A1 analog on events + A3 top-k ----------------------------------------

_EVENTS_TOPK_SQL = """
SELECT user_id, event_type, COUNT(*) AS n_events
FROM events
GROUP BY user_id, event_type
ORDER BY n_events DESC, user_id, event_type
LIMIT 50
""".strip()


@query("events_group_topk", oracle=_EVENTS_TOPK_SQL)
def events_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count.PerElement + Top.Of on the events stream table
    (``pipelines/cycle_rides.py:51,53`` analog): two-phase hash agg then
    TakeOrderedAndProject (partial top-k per partition + single merge)."""
    ev = load_table(spark, sf_dir, "events")
    counts = group_count(ev, ["user_id", "event_type"], alias="n_events")
    return top_k(
        counts, 50,
        order=[F.col("n_events").desc()],
        tiebreak=("user_id", "event_type"),
    )


# --- A4 scalar arithmetic + multi-aggregate (TPC-H Q1 shape) ----------------

_PRICING_SQL = f"""
SELECT
    l_returnflag,
    l_linestatus,
    {_dec_sum_sql('l_quantity', 'sum_qty')},
    {_dec_sum_sql('l_extendedprice', 'sum_base_price')},
    {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
    {_dec_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".strip()


@query("pricing_summary", oracle=_PRICING_SQL)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar post-aggregation arithmetic (A4, ``total_distance.py:23-24``)
    generalized to the TPC-H Q1 pricing-summary shape: predicate pushdown +
    partial/final hash agg over computed expressions."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            _dec_sum(disc, "sum_disc_price"),
            _dec_sum(disc * (1 + F.col("l_tax")), "sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- P4/F2: CSV line formatting --------------------------------------------

@query(
    "csv_format_lines",
    oracle=f"""
WITH {RIDES_CTE},
top_pairs AS (
    SELECT start_station_id, end_station_id, COUNT(*) AS amount_of_rides
    FROM rides
    WHERE start_station_id IS NOT NULL AND end_station_id IS NOT NULL
    GROUP BY start_station_id, end_station_id
    ORDER BY amount_of_rides DESC, start_station_id, end_station_id
    LIMIT 20
)
SELECT CONCAT_WS(',', start_station_id, end_station_id, amount_of_rides) AS line
FROM top_pairs
""".strip(),
)
def csv_format_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``format_csv`` (``pipelines/total_distance.py:50-52``) as a native
    expression: concat_ws compiles into codegen instead of a per-row Python
    ``','.join``. (The real CSV sink is ``df.write.csv`` — tests/test_sinks.)"""
    r = drop_null_rows(
        rides(spark, sf_dir).select("start_station_id", "end_station_id")
    )
    top = top_k(
        group_count(r, ["start_station_id", "end_station_id"]),
        20,
        order=[F.col("amount_of_rides").desc()],
        tiebreak=("start_station_id", "end_station_id"),
    )
    return top.select(
        F.concat_ws(
            ",", "start_station_id", "end_station_id", "amount_of_rides"
        ).alias("line")
    )


# --- joins: broadcast equi-join, semi, anti (SURVEY §2.3 free rows) ---------

@query(
    "join_broadcast_revenue",
    oracle=f"""
SELECT
    c.c_mktsegment,
    {_dec_sum_sql('o.o_totalprice', 'revenue')},
    COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""".strip(),
)
def join_broadcast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with an explicitly broadcast dimension — the scalable
    replacement for the reference's single-key CoGroupByKey merges: no
    shuffle of the fact side at all, then a partial-agg'd rollup."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            _dec_sum(F.col("o_totalprice"), "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "join_semi_active_customers",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""".strip(),
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers with at least one order. Semi joins ship
    only the key column of the probe side — cheaper than join+distinct."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti_unordered_parts",
    oracle="""
SELECT p_partkey, p_name
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45
)
""".strip(),
)
def join_anti_unordered_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: parts never ordered in bulk (quantity > 45) — the
    filter keeps the result non-empty at every sf, so the oracle match is
    over real rows, not 0 = 0."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return p.join(
        li, p.p_partkey == li.l_partkey, "left_anti"
    ).select("p_partkey", "p_name")


# --- set operations (SURVEY §2.8 not-present row) ---------------------------

@query(
    "set_ops_customers",
    oracle="""
SELECT c_custkey FROM customer WHERE c_acctbal > 9000
UNION
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
""".strip(),
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) + EXCEPT over customer keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return rich.union(building).distinct().exceptAll(finished.distinct())


# --- window functions (SURVEY §2.8 not-present row) -------------------------

@query(
    "window_rank_orders",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS rn
    FROM orders
) t
WHERE rn <= 3
""".strip(),
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N via ROW_NUMBER window — one shuffle on the partition
    key, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_lag_event_gaps",
    oracle="""
SELECT user_id, event_id,
       CAST(FLOOR(EPOCH(ts)) AS BIGINT)
         - CAST(FLOOR(EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
         AS gap_seconds
FROM events
""".strip(),
)
def window_lag_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG window: seconds since the user's previous event (NULL for the
    first). The per-user ordering shuffle is the same partitioning a
    sessionization pass would reuse."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    prev = F.unix_timestamp(F.lag(F.col("ts")).over(w).cast("timestamp"))
    return ev.select(
        "user_id", "event_id", (sec - prev).alias("gap_seconds")
    )


@query(
    "window_rolling_order_totals",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ) AS BIGINT) / 100.0 AS rolling3_total
FROM orders
""".strip(),
)
def window_rolling_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window-frame aggregate (ROWS BETWEEN): each order's total
    summed with the customer's two preceding orders — the rolling-metric
    shape of feature engineering. Prices quantize to BIGINT cents before
    the frame SUM so the rolling value is exact integer arithmetic (a
    double frame-sum would be reassociation-sensitive), divided back once."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents).over(w) / 100.0).alias("rolling3_total"),
    )


@query(
    "hourly_anomaly_zscores",
    oracle="""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type,
           CAST(SUM(n) AS BIGINT) AS sum1,
           CAST(SUM(n * n) AS BIGINT) AS sum2,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM hourly GROUP BY event_type
)
SELECT h.event_type, h.window_start, h.n,
       ROUND((h.n * 1.0 - s.sum1 * 1.0 / s.c)
             / SQRT((s.sum2 * s.c - s.sum1 * s.sum1) * 1.0 / (s.c * s.c)), 6)
           AS zscore
FROM hourly h JOIN stats s ON h.event_type = s.event_type
WHERE s.c > 1 AND s.sum2 * s.c > s.sum1 * s.sum1
  AND ABS((h.n * 1.0 - s.sum1 * 1.0 / s.c)
          / SQRT((s.sum2 * s.c - s.sum1 * s.sum1) * 1.0 / (s.c * s.c))) >= 2.0
""".strip(),
)
def hourly_anomaly_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: hourly counts per event type flagged when
    more than 2 standard deviations from that type's mean — the monitoring
    query a pipeline runs over its own event flow. Variance is computed
    from exact BIGINT power sums (sum, sum of squares, count), so the only
    float ops are the identical final divisions/sqrt in both engines — no
    order-dependent double aggregation anywhere. Zero-variance groups
    (all-equal hourly counts, incl. the single-bucket c=1 case) are
    excluded with an exact integer predicate BEFORE the division: Spark
    would produce 0.0/0.0 = NaN and keep the row under NaN-is-largest
    ordering, while DuckDB's float division by zero yields NULL and drops
    it — the guard makes both engines drop it identically."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("window_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.sum("n").alias("sum1"),
        F.sum(F.col("n") * F.col("n")).alias("sum2"),
        F.count(F.lit(1)).alias("c"),
    )
    z = (F.col("n") * 1.0 - F.col("sum1") * 1.0 / F.col("c")) / F.sqrt(
        (F.col("sum2") * F.col("c") - F.col("sum1") * F.col("sum1"))
        * 1.0
        / (F.col("c") * F.col("c"))
    )
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(
            (F.col("c") > 1)
            & (F.col("sum2") * F.col("c") > F.col("sum1") * F.col("sum1"))
        )
        .filter(F.abs(z) >= 2.0)
        .select(
            "event_type",
            "window_start",
            "n",
            F.round(z, 6).alias("zscore"),
        )
    )


@query(
    "user_retention_cohorts",
    oracle="""
WITH firsts AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, a.active_day) AS INTEGER) AS day_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM firsts f
JOIN activity a ON f.user_id = a.user_id
WHERE date_diff('day', f.cohort_day, a.active_day) <= 7
GROUP BY f.cohort_day, day_offset
""".strip(),
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort triangle: users grouped by first-activity day,
    counted on each of the next 7 days they return — the canonical product
    analytics query. Two aggregations plus an equi-join on user_id (the
    cohort side is small and broadcastable)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date(F.col("ts"))
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = ev.select("user_id", day.alias("active_day")).distinct()
    offset = F.datediff(F.col("active_day"), F.col("cohort_day"))
    return (
        activity.join(F.broadcast(firsts), "user_id")
        .filter(offset <= 7)
        .groupBy("cohort_day", offset.cast("int").alias("day_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "event_funnel_counts",
    oracle="""
WITH m AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
           MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY user_id
)
SELECT CAST(COUNT(CASE WHEN t_signup IS NOT NULL THEN 1 END) AS BIGINT)
           AS n_signup,
       CAST(COUNT(CASE WHEN t_click > t_signup THEN 1 END) AS BIGINT)
           AS n_signup_then_click,
       CAST(COUNT(CASE WHEN t_click > t_signup AND t_purchase > t_click THEN 1 END)
           AS BIGINT) AS n_funnel_complete
FROM m
""".strip(),
)
def event_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (signup -> click -> purchase by each user's
    FIRST occurrence of each step): one groupBy(user) computing three
    conditional MINs, then one conditional-count fold — no joins, no
    self-unions; the sequence predicate is pure timestamp comparison.
    NULL-safe by construction (a missing step never compares true)."""
    ev = load_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts"))
    )
    m = ev.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    return m.agg(
        F.count(F.when(F.col("t_signup").isNotNull(), 1)).alias("n_signup"),
        F.count(F.when(F.col("t_click") > F.col("t_signup"), 1)).alias(
            "n_signup_then_click"
        ),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_signup"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("n_funnel_complete"),
    )


# --- JSON extraction over events.props (SURVEY §2.9) ------------------------

@query(
    "json_props_histogram",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, COUNT(*) AS n
FROM events
GROUP BY 1
""".strip(),
)
def json_props_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``get_json_object`` over the JSON props column — stays JVM-side
    (Jackson), no Python in the loop."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("int").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "variant_props_stats",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INT) AS max_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
           AS distinct_k
FROM events
GROUP BY event_type
ORDER BY event_type
""".strip(),
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's VARIANT type: ``parse_json``
    decodes each props payload ONCE into the binary variant encoding,
    and every extraction after that (`variant_get`) is a cheap typed
    path read — the modern engine answer to repeated
    ``get_json_object`` calls re-parsing the same JSON string per
    extraction (`json_props_histogram` above is the classic spelling).
    At 100 TB the variant column is what you'd MATERIALIZE: shredded
    binary, parsed once at ingest, never re-tokenized per query.

    Per-event-type stats over the extracted key exercise the typed read
    in aggregation position; all outputs are exact integers."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int").alias("k")
    return (
        ev.select("event_type", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.countDistinct("k").cast("long").alias("distinct_k"),
        )
        .orderBy("event_type")
    )


# --- rollup / grouping sets (SURVEY §2.4 not-present row) -------------------

@query(
    "rollup_nation_revenue",
    oracle=f"""
SELECT
    n.n_name AS nation,
    c.c_mktsegment AS segment,
    {_dec_sum_sql('o.o_totalprice', 'revenue')}
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP(n.n_name, c.c_mktsegment)
""".strip(),
)
def rollup_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over a two-dim hierarchy with broadcast dims."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            "o_totalprice",
        )
        .rollup("nation", "segment")
        .agg(_dec_sum(F.col("o_totalprice"), "revenue"))
    )


# --- exact count-distinct (SURVEY §2.4 not-present row) ---------------------

@query(
    "count_distinct_users",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events
GROUP BY event_type
""".strip(),
)
def count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate (expand + two-phase agg in Spark's plan)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- global sort + limit/offset (SURVEY §2.5 not-present rows) --------------

@query(
    "sort_limit_offset",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100 OFFSET 50
""".strip(),
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... LIMIT ... OFFSET — pagination over a total order."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(50)
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- multi-join analytical pipeline (join ordering + AQE showcase) ----------

@query(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT
    n.n_name AS nation,
    {_dec_sum_sql('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
GROUP BY n.n_name
""".strip(),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped six-table join. True dims (supplier/nation/region)
    are broadcast explicitly; orders/customer joins are left to the planner
    — at this sf they auto-broadcast, at 100 TB AQE picks shuffled joins
    with the date filter pushed into the orders scan first."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp_ntz")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )


# --- pivot / argmax aggregates (SURVEY §2.4 not-present rows) ---------------

@query(
    "pivot_user_event_matrix",
    oracle="""
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'login' THEN 1 ELSE 0 END) AS BIGINT) AS login
FROM events
GROUP BY user_id
""".strip(),
)
def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: user x event-type count matrix. Explicit value list keeps the
    plan one-pass (no extra distinct-values job) — mandatory at scale."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["view", "click", "purchase", "error", "login"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds]
    )


@query(
    "argmax_order_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey AS top_orderkey, o_totalprice AS top_price
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
           ) AS rn
    FROM orders
) t
WHERE rn = 1
""".strip(),
)
def argmax_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX_BY (argmax) aggregate: each customer's highest-value order —
    one hash aggregate instead of a window + filter. Ordering key includes
    -orderkey so price ties resolve deterministically in both engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.expr("max_by(o_orderkey, struct(o_totalprice, -o_orderkey))").alias(
            "top_orderkey"
        ),
        F.max("o_totalprice").alias("top_price"),
    )


# --- exact percentiles + column profiling (pipeline hygiene ops) ------------

@query(
    "value_quantiles_by_type",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
""".strip(),
)
def value_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark PERCENTILE ==
    DuckDB quantile_cont) — the sort-based aggregate; the sketch-based
    percentile_approx twin is bounded in tests/test_approx.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@query(
    "column_profile_rides",
    oracle=f"""
WITH {RIDES_CTE}
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN start_station_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_start,
       CAST(SUM(CASE WHEN end_station_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_end,
       COUNT(DISTINCT start_station_id) AS nd_start,
       COUNT(DISTINCT end_station_id) AS nd_end
FROM rides
""".strip(),
)
def column_profile_rides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the data-quality pass of an ingestion pipeline):
    row count, per-column null counts, distinct cardinalities — one scan,
    one aggregate."""
    r = rides(spark, sf_dir)
    return r.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("start_station_id").isNull().cast("long")).alias("null_start"),
        F.sum(F.col("end_station_id").isNull().cast("long")).alias("null_end"),
        F.countDistinct("start_station_id").alias("nd_start"),
        F.countDistinct("end_station_id").alias("nd_end"),
    )


# --- time bucketing (batch twin of the streaming tumbling window) -----------

@query(
    "events_hourly_counts",
    oracle=f"""
SELECT
    date_trunc('hour', ts) AS hour,
    event_type,
    COUNT(*) AS n,
    {_dec_sum_sql('value', 'sum_value')}
FROM events
GROUP BY 1, 2
""".strip(),
)
def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation in batch form (date_trunc bucketing) —
    the exact-answer twin of streaming/windows.py's windowed stream."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("value"), "sum_value"),
        )
    )


# --- modern SQL surface: lateral join + recursive CTE ------------------------

_LATERAL_TOP_SQL = """
SELECT n.n_name AS nation, t.c_custkey, t.acctbal_cents
FROM nation n, LATERAL (
    SELECT c_custkey,
           CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
    FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY acctbal_cents DESC, c_custkey
    LIMIT 2
) t
ORDER BY nation, acctbal_cents DESC, c_custkey
""".strip()


@query("lateral_top_customers_per_nation", oracle=_LATERAL_TOP_SQL)
def lateral_top_customers_per_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated LATERAL subquery (top-2 customers per nation by account
    balance): the for-each-row-run-a-query SQL surface. Catalyst
    DECORRELATES it — the executed plan is a window/limit per key plus
    one equi-join, never a per-nation re-scan of customer (plan-asserted:
    no nested-loop, no cartesian) — so the lateral spelling costs the
    same as the ROW_NUMBER rewrite at any scale. One SQL text runs
    verbatim on Spark AND DuckDB (facade-portable); balances go through
    cent fixed-point."""
    register_views(spark, sf_dir, tables=("nation", "customer"))
    return spark.sql(_LATERAL_TOP_SQL)


#: one week of hour offsets as a portable VALUES literal (both engines
#: accept a bare VALUES body in a named-column CTE)
_HOUR_OFFSETS = ",".join(f"({i})" for i in range(168))

_RECURSIVE_SPINE_SQL = f"""
WITH RECURSIVE bounds AS (
    SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
),
weeks(wk) AS (
    SELECT lo FROM bounds
    UNION ALL
    SELECT wk + INTERVAL 168 HOUR FROM weeks
    WHERE wk + INTERVAL 168 HOUR <= (SELECT hi FROM bounds)
),
offsets(i) AS (VALUES {_HOUR_OFFSETS}),
spine AS (
    SELECT wk + i * INTERVAL 1 HOUR AS hour
    FROM weeks CROSS JOIN offsets CROSS JOIN bounds
    WHERE wk + i * INTERVAL 1 HOUR <= hi
),
hourly AS (
    SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
)
SELECT s.hour, COALESCE(h.n, 0) AS n FROM spine s LEFT JOIN hourly h ON s.hour = h.hour
ORDER BY s.hour
""".strip()


@query("recursive_hour_spine_counts", oracle=_RECURSIVE_SPINE_SQL)
def recursive_hour_spine_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): a dense hourly spine
    generated by recursion from MIN to MAX event time, left-joined to the
    hourly counts with zero-fill — the gap-visible downsample, spelled as
    the classic iterate-until-bound recursion instead of sequence().
    One SQL text runs verbatim on Spark AND DuckDB (facade-portable).

    Recursion-depth engineering: Spark executes each recursion level as
    its own driver-scheduled job, so a per-HOUR recursion pays ~0.1 s of
    fixed overhead per level (measured: 94 s for a 720-hour span). The
    recursion therefore steps by WEEK — depth = span/168, calendar-
    bounded — and a 168-row VALUES offset table expands each week into
    its hours in one non-recursive cross join. Same rows, 18x faster,
    and the recursion limit never needs raising for realistic spans."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_RECURSIVE_SPINE_SQL)


# --- UNPIVOT / melt ----------------------------------------------------------


@query(
    "unpivot_returnflag_metrics",
    oracle="""
WITH agg AS (
    SELECT l_returnflag,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
UNION ALL
SELECT l_returnflag, 'sum_base_price', sum_base_price FROM agg
UNION ALL
SELECT l_returnflag, 'sum_disc_price', sum_disc_price FROM agg
ORDER BY l_returnflag, metric
""".strip(),
)
def unpivot_returnflag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the wide-to-long reshape completing the modern-SQL
    reshaping surface next to PIVOT (`pivot_user_event_matrix`), CUBE and
    ROLLUP: the per-returnflag pricing aggregates unpivot into
    (l_returnflag, metric, value) rows via the native
    ``DataFrame.unpivot`` (Spark's Expand operator — one pass over the
    3-row aggregate, no join, no union re-scan; the oracle's UNION ALL
    spelling re-reads a 3-row CTE, equivalent at any scale because the
    reshape runs on POST-aggregation rows, never on the fact table)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_base_price", "sum_disc_price"],
        "metric",
        "value",
    ).orderBy("l_returnflag", "metric")


# --- TPC-H classics (adapted to the available columns) -----------------------

_Q3_CUTOFF = "1998-06-01 00:00:00"


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
       {_dec_sum_sql('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{_Q3_CUTOFF}'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""".strip(),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (Shipping Priority), adapted to the generated schema
    (no o_shippriority column): the ten highest-revenue orders from the
    BUILDING segment that were placed before the cutoff but have
    lineitems still shipping after it. The classic 3-table
    star-join + date-sargable plan: both date predicates and the
    segment filter push into their scans, the customer side reduces to
    a broadcastable key set, and the top-10 is a
    TakeOrderedAndProject over the (orderkey, orderdate) aggregate —
    the join-order/pushdown benchmark shape the canonical suite was
    missing next to Q1 (`pricing_summary`), Q5
    (`q5_local_supplier_volume`) and Q6 (`q6_forecast_revenue`)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_CUTOFF).cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_CUTOFF).cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {_dec_sum_sql('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       ROUND(c.c_acctbal, 2) AS c_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1999-04-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name, ROUND(c.c_acctbal, 2)
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""".strip(),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (Returned Item Reporting): the twenty customers who
    generated the most revenue on RETURNED lineitems in 1999Q1 — the
    lost-revenue triage list. Four-table shape: the 25-row nation dim
    broadcasts, the returnflag + quarter predicates push to the fact
    scans, and the customer-keyed aggregate feeds a
    TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "c_custkey", "c_name", "n_name", F.round("c_acctbal", 2).alias("c_acctbal")
        )
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_Q17_SQL = """
SELECT CAST(FLOOR(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  / CAST(7 AS DOUBLE)) AS BIGINT) AS avg_yearly_cents,
       CAST(COUNT(*) AS BIGINT) AS n_small_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND p.p_size <= 25
  AND l.l_quantity < (
        SELECT CAST(0.2 AS DOUBLE) * AVG(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey
  )
""".strip()


@query("tpch_q17_small_qty_revenue", oracle=_Q17_SQL)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (Small-Quantity-Order Revenue), adapted to the generated
    schema (p_size stands in for the absent p_container): yearly revenue
    that would be lost by refusing orders below 20% of a part's average
    order quantity — the canonical CORRELATED SCALAR SUBQUERY (the
    per-part average correlates through the join). Catalyst DECORRELATES
    it: the executed plan aggregates lineitem by partkey once and
    equi-joins it back — never a per-row re-scan of lineitem
    (plan-asserted: no nested-loop, no cartesian), so the correlated
    spelling costs two fact scans at any scale. One SQL text runs
    verbatim on Spark AND DuckDB (facade-portable).

    Cross-engine exactness: revenue goes through cent fixed-point; the
    threshold AVG is exact because integer-valued quantities sum exactly
    in doubles regardless of partitioning order, and both engines then
    perform the identical IEEE divide/multiply."""
    register_views(spark, sf_dir, tables=("lineitem", "part"))
    return spark.sql(_Q17_SQL)


_Q22_SQL = """
WITH eligible AS (
    SELECT c_custkey, c_nationkey,
           CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
)
SELECT e.c_nationkey AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(e.acctbal_cents) AS BIGINT) AS totacctbal_cents
FROM eligible e
WHERE e.acctbal_cents * (SELECT COUNT(*) FROM eligible WHERE acctbal_cents > 0)
      > (SELECT SUM(acctbal_cents) FROM eligible WHERE acctbal_cents > 0)
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = e.c_custkey
          AND o.o_orderpriority = '1-URGENT'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  )
GROUP BY e.c_nationkey
ORDER BY cntrycode
""".strip()


@query("tpch_q22_idle_customers", oracle=_Q22_SQL)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (Global Sales Opportunity), adapted to the generated
    schema (c_nationkey stands in for the absent phone country code, and
    "never ordered" — impossible here, every customer has orders —
    becomes "no URGENT order since 1997"): per-country count and total
    balance of above-average-balance customers with no recent urgent
    order. The canonical NOT EXISTS anti-join surface: Catalyst plans a
    LEFT ANTI hash join with the priority/date predicates pushed into
    the orders scan (plan-asserted: LeftAnti present, no nested-loop,
    no cartesian), and the two uncorrelated scalar subqueries evaluate
    once each. One SQL text runs verbatim on Spark AND DuckDB
    (facade-portable).

    Cross-engine exactness: the above-average test is the exact integer
    cross-multiplication acctbal_cents * n > sum_cents (no
    double-precision average on a boundary), with balances through cent
    fixed-point throughout."""
    register_views(spark, sf_dir, tables=("customer", "orders"))
    return spark.sql(_Q22_SQL)


# --- exact rolling median ----------------------------------------------------

_ROLL_MED_FRAME = 10


@query(
    "rolling_median_value",
    oracle=f"""
WITH framed AS (
    SELECT event_id, user_id,
           list_sort(list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_ROLL_MED_FRAME - 1} PRECEDING AND CURRENT ROW
           )) AS win
    FROM events
)
SELECT event_id, user_id,
       ROUND((win[(len(win) + 1) // 2] + win[len(win) // 2 + 1]) / 2.0, 6)
           AS rolling_median
FROM framed
""".strip(),
)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling median of each user's last {n} event values — the
    windowed robust statistic (the median-of-window complement to the
    mean-based `window_rolling_order_totals` and the global-median MAD
    screen `robust_outlier_hours`). The median is computed EXPLICITLY
    from the sorted frame array with identical integer indexing in both
    engines — ``(a[(n+1) div 2] + a[n div 2 + 1]) / 2`` on 1-indexed
    sorted values, which collapses to the middle element for odd n —
    rather than trusting two engines' median() interpolation conventions
    to agree. The frame is 10 rows, so the per-row array is bounded (no
    unbounded collect); one user-window shuffle carries the query."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_ROLL_MED_FRAME - 1), 0)
    )
    framed = ev.select(
        "event_id",
        "user_id",
        F.sort_array(F.collect_list("value").over(w)).alias("win"),
    )
    n = F.size("win")
    lower = F.element_at("win", ((n + 1) / 2).cast("int"))
    upper = F.element_at("win", (n / 2).cast("int") + 1)
    return framed.select(
        "event_id",
        "user_id",
        F.round((lower + upper) / 2.0, 6).alias("rolling_median"),
    )


# --- TPC-H Q21: double-correlated EXISTS / NOT EXISTS ------------------------

_Q21_SQL = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
  AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""".strip()


@query("tpch_q21_waiting_suppliers", oracle=_Q21_SQL)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (Suppliers Who Kept Orders Waiting), adapted to the
    generated schema (no l_receiptdate/l_commitdate, so "late" becomes
    shipping more than a year after the order date): for finalized
    orders, count per supplier the lineitems where THIS supplier was
    late, ANOTHER supplier contributed to the same order (EXISTS), and
    NO OTHER supplier was also late (NOT EXISTS) — sole-blame
    attribution. Completes the Q17/Q21/Q22 correlated-subquery trio:
    Q17 is a correlated SCALAR subquery, Q22 a single NOT EXISTS; Q21
    stacks an EXISTS and a NOT EXISTS on the SAME table, and the NOT
    EXISTS branch additionally correlates through a non-equi predicate
    on a THIRD relation's column (o.o_orderdate). Catalyst decorrelates
    both into one left-semi and one left-anti hash join on l_orderkey
    with the extra predicates as residual join conditions — never a
    per-row re-scan of lineitem (plan-asserted: no nested-loop, no
    cartesian), so the three logical lineitem references cost three
    parallel scans of the same columnar files at any scale. One SQL
    text runs verbatim on Spark AND DuckDB (facade-portable).

    Cross-engine exactness: the output is a pure COUNT over equality /
    interval-shifted timestamp comparisons — no floating arithmetic —
    and the top-20 is fully tie-broken by (numwait DESC, s_name)."""
    register_views(spark, sf_dir, tables=("supplier", "lineitem", "orders"))
    return spark.sql(_Q21_SQL)


# --- time-RANGE window frame -------------------------------------------------

_RANGE_FRAME_SECONDS = 86_400


@query(
    "range_frame_user_day_totals",
    oracle=f"""
SELECT user_id, event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_24h,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
           AS sum_cents_24h
FROM events
WINDOW w AS (
    PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
    RANGE BETWEEN {_RANGE_FRAME_SECONDS - 1} PRECEDING AND CURRENT ROW
)
""".strip(),
)
def range_frame_user_day_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: each event joined with the count and
    value-sum of the SAME user's events in the trailing 24 hours — the
    rate-limit / rolling-exposure feature shape. This is the RangeFrame
    physical variant the window family was missing next to the
    ROWS-frame `window_rolling_order_totals` and the unbounded frames:
    the frame is defined by the ORDER-BY VALUE (epoch seconds), not a
    row count, so rows sharing a second share a frame and sparse users
    get narrow frames. One user-keyed shuffle; frame evaluation is a
    per-partition sliding pass over the sorted run (bounded by the
    24 h span, never the partition length).

    Cross-engine exactness: epoch seconds via FLOOR (DuckDB CAST
    double->BIGINT rounds, Spark truncates — the one-engine-only
    spelling this repo's conventions ban), value through cent
    fixed-point so the frame SUM is exact integer arithmetic, and ties
    inside one second are frame-identical in both engines because
    RANGE includes all peer rows."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-(_RANGE_FRAME_SECONDS - 1), 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_24h"),
        F.sum(cents).over(w).cast("long").alias("sum_cents_24h"),
    )


# --- distributed contiguous global row numbering ------------------------------


@query(
    "global_row_ids_orders",
    oracle="""
SELECT o_orderkey,
       ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS global_id
FROM orders
""".strip(),
)
def global_row_ids_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 1-based global row ids in (o_totalprice, o_orderkey)
    order WITHOUT a global window — the distributed zipWithIndex pattern
    (Spark's own RDD.zipWithIndex, re-expressed DataFrame-first):

    1. ``repartitionByRange`` on the sort key: one shuffle into
       key-contiguous, key-ordered partition ranges.
    2. ``sortWithinPartitions`` + a NARROW Arrow ``mapInPandas`` that
       assigns each partition a local 0-based sequence (a running
       counter across the partition's record batches — per-batch work is
       one ``np.arange``).
    3. Per-partition counts -> cumulative offsets: a window over AT MOST
       ``spark.sql.shuffle.partitions`` rows (a CONFIG-bounded input,
       the same row count RDD.zipWithIndex collects to the driver — not
       a data-sized global window).
    4. Broadcast-join offsets back: ``global_id = offset + local_seq + 1``.

    The ids are INVARIANT to where the sampled range boundaries fall:
    ranges are disjoint and ordered, so offset + local rank is the global
    rank regardless of the split. A single-partition ROW_NUMBER (the
    oracle's spelling, correct at any SF in DuckDB and fine at test SFs
    in Spark) funnels every row through one task; this shape's widest
    single-task input is one partition range. The counts branch and the
    numbering branch read ONE materialized range shuffle
    (``localCheckpoint`` in the helper) — exchange reuse is an
    optimizer courtesy, not a correctness contract (see the helper's
    docstring for the composed-plan counterexample round 8 found)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return assign_global_row_ids(
        o, order_cols=["o_totalprice", "o_orderkey"], keep="o_orderkey"
    )


def assign_global_row_ids(
    df: DataFrame, order_cols: list[str], keep: str
) -> DataFrame:
    """The distributed numbering core (extracted for the generated-input
    property test): range-shuffle on ``order_cols``, narrow Arrow local
    sequences, config-bounded offsets, broadcast join back. Returns
    (``keep``, global_id) with 1-based ids in ``order_cols`` order —
    invariant to where the sampled range boundaries fall.

    The numbering branch and the counts branch MUST see the same range
    boundaries, so the ranged frame is explicitly materialized
    (``localCheckpoint``) before fan-out. Relying on Catalyst exchange
    reuse instead is NOT a contract: the bare-orders plan does get a
    ReusedExchange, but composing this helper over a projected input
    (found by ``quantile_normalize_values`` in round 8) compiles the
    two branches into two independently-sampled range exchanges whose
    boundaries disagree — duplicate and skipped ids. Spark's own
    ``RDD.zipWithIndex`` has the identical recompute hazard on an
    uncached RDD; the checkpoint is the documented fix, and its cost
    (one narrow write of keep+keys) replaces the second exchange
    execution the non-reused plan was paying anyway."""
    import numpy as np

    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )

    def number(batches):
        seen = 0
        for pdf in batches:
            out = pdf[[keep, "pid"]].assign(
                local_seq=np.arange(seen, seen + len(pdf), dtype="int64")
            )
            seen += len(pdf)
            yield out

    keep_type = df.schema[keep].dataType.simpleString()
    numbered = ranged.mapInPandas(
        number, f"{keep} {keep_type}, pid int, local_seq long"
    )
    counts = ranged.groupBy("pid").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    offsets = counts.select(
        "pid",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("offset"),
    )
    return numbered.join(F.broadcast(offsets), "pid").select(
        keep,
        (F.col("offset") + F.col("local_seq") + 1).alias("global_id"),
    )


def distributed_prefix_sum(
    df: DataFrame, order_exprs: list, value_col: str
) -> DataFrame:
    """The distributed PREFIX-SUM primitive (the generalization of
    :func:`assign_global_row_ids` from counting to summing), extracted in
    round 9 so ``pareto_abc_parts`` and any future consumer share ONE
    materialization discipline instead of re-inlining the pattern.

    ``order_exprs`` must define a TOTAL order (callers append a unique
    tie-break key, as with the numbering primitive); ``value_col`` is the
    long column to accumulate. Returns the input columns plus ``cum``
    (the inclusive prefix sum of ``value_col`` in ``order_exprs`` order)
    and ``total`` (the grand total, attached from the config-bounded
    per-partition totals frame — free, no extra data pass).

    Same exchange-reuse hazard and same fix as the numbering primitive:
    the local-cumsum branch and the per-partition-totals branch MUST see
    the same sampled range boundaries, so the ranged frame is explicitly
    materialized (``localCheckpoint``) before fan-out — Catalyst reusing
    the exchange is a courtesy, never a contract (round-8 lesson, found
    by composing over a projected input). The only global window runs
    over <= shuffle.partitions offset rows."""
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n_parts, *order_exprs)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    wp = (
        Window.partitionBy("pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("lcum", F.sum(value_col).over(wp))
    ptots = ranged.groupBy("pid").agg(F.sum(value_col).alias("ptot"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = ptots.select(
        "pid",
        F.coalesce(F.sum("ptot").over(wo), F.lit(0)).cast("long").alias("off"),
        F.sum("ptot").over(
            Window.orderBy("pid").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("total"),
    )
    return (
        local.join(F.broadcast(offs), "pid")
        .withColumn("cum", (F.col("off") + F.col("lcum")).cast("long"))
        .drop("pid", "lcum", "off")
    )


# --- native session_window (Spark's built-in gap sessionizer) ----------------

_SESSW_SQL = """
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     >= INTERVAL 10 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events
),
numbered AS (
    SELECT user_id, ts,
           SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS sess_id
    FROM flagged
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 10 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM numbered
GROUP BY user_id, sess_id
""".strip()


@query("session_window_native", oracle=_SESSW_SQL)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN ``session_window`` aggregation (a §2.4 "free in
    Spark" row): dynamic-gap session grouping executed natively inside
    the aggregate (``UpdatingSessionsIterator`` merges as it scans — no
    LAG/island windows in the plan at all), the same operator the
    streaming engine uses for stateful session merging. The oracle is
    the gaps-and-islands rewrite `batch_sessionize_events` pins (same
    10-minute gap; ``session_window.end`` is last event + gap by
    definition, mirrored in the oracle's MAX(ts) + INTERVAL), so the
    native operator and the manual rewrite are proven equivalent
    through the cross-engine gate. One user-keyed shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "10 minutes").alias("sw")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


# --- full ANSI window-function surface in one pass ----------------------------

_WFP_SQL = """
SELECT user_id, event_id,
       LAG(event_type) OVER w AS prev_type,
       LEAD(event_type) OVER w AS next_type,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, rn
""".strip()


@query("window_feature_pack", oracle=_WFP_SQL)
def window_feature_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete ANSI analytic-function surface — LAG, LEAD,
    ROW_NUMBER, PERCENT_RANK, CUME_DIST, NTILE — evaluated in ONE
    user-partitioned window pass (a §2.4 breadth row: the per-user
    feature columns every sequence model's preprocessing emits). The
    ordering key (ts, event_id) is unique per user, so every ranking
    function is tie-free deterministic; PERCENT_RANK and CUME_DIST are
    single divisions of exact integer ranks (ANSI-specified formulas,
    identical in both engines). One user-keyed shuffle, all six
    functions share the same Window frame so Spark evaluates them in
    a single WindowExec. The oracle text is pure ANSI and runs
    unmodified through the spark.sql facade."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .orderBy("user_id", "rn")
    )


# --- GROUPING SETS with grouping_id -------------------------------------------

_GSETS_SQL = """
SELECT n_name,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mth,
       CAST(GROUPING(n_name) AS BIGINT) * 2
       + CAST(GROUPING(CAST(EXTRACT(month FROM o_orderdate) AS BIGINT))
              AS BIGINT) AS gid,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
GROUP BY GROUPING SETS (
    (n_name, CAST(EXTRACT(month FROM o_orderdate) AS BIGINT)),
    (n_name),
    (CAST(EXTRACT(month FROM o_orderdate) AS BIGINT)),
    ()
)
ORDER BY gid, n_name, mth
""".strip()


@query("grouping_sets_revenue", oracle=_GSETS_SQL)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with the GROUPING() bitmask — the general
    form that `cube_orders` (CUBE) and `rollup_nation_revenue` (ROLLUP)
    are sugar over, completing the multi-aggregation trio: nation x
    order-month revenue at four granularities in ONE pass (Spark's
    native Expand operator replicates each input row once per set
    before a single aggregate — no union of four scans). Dims
    broadcast; revenue exact int64 cents; the gid bitmask
    disambiguates real NULLs from subtotal rows in both engines. The
    oracle text is shared ANSI and runs through the spark.sql facade
    unmodified."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            F.month("o_orderdate").cast("long").alias("mth"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("price_c"),
        )
    )
    return (
        base.groupingSets(
            [["n_name", "mth"], ["n_name"], ["mth"], []],
            "n_name",
            "mth",
        )
        .agg(
            (
                F.grouping("n_name").cast("long") * 2
                + F.grouping("mth").cast("long")
            ).alias("gid"),
            F.sum("price_c").alias("revenue_c"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("gid", "n_name", "mth")
    )

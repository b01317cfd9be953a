"""Round-4 curation + relational coverage: batch sessionization
(gaps-and-islands), latest-record upsert snapshot, deterministic stratified
sampling, mergeable histogram quantiles, Bloom-filter membership, top-decile
quality filtering, anti-join integrity checks, and a TPC-H Q6-shaped
pushdown aggregate.

These are the batch-side operations a 100 TB training-data pipeline runs
daily; each is expressed as pure DataFrame ops (window / two-phase agg /
equi-join — no UDFs, no collect), and each oracle reproduces the exact
arithmetic so the driver's hash gate verifies values, not just shapes.

The reference has no analog for any of these (its whole surface is four
bounded Beam pipelines, `pipelines/*.py` — see SURVEY.md §2.9's "beyond
the reference" mandate); the deterministic md5-bucket sampling follows the
same content-addressed pattern as ``dataset_split_counts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_beam_challange_spark.functions.text import (
    QUALITY_SCORE_SQL,
    quality_score,
)
from apache_beam_challange_spark.plans.registry import query
from apache_beam_challange_spark.sources.catalog import load_table

# --- batch sessionization (gaps-and-islands) -------------------------------


@query(
    "batch_sessionize_events",
    oracle="""
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
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, sess_id
""".strip(),
)
def batch_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via the gaps-and-islands rewrite: a per-user
    LAG marks gap >= 10 min as a session boundary, a running SUM numbers
    the islands, and one aggregation folds each island to (start, end,
    n_events). The two windows and the final groupBy all share ONE
    hash-partitioning on user_id, so the whole operator costs a single
    shuffle at any scale — the batch twin of ``streaming_session_windows``
    (same gap semantics, same oracle skeleton), for backfills over at-rest
    data where no state store is needed."""
    ev = load_table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = (
        F.when(
            F.col("ts") - F.lag("ts").over(order_w)
            >= F.expr("INTERVAL 10 MINUTES"),
            1,
        )
        .otherwise(0)
        .alias("new_sess")
    )
    numbered = ev.select("user_id", "ts", "event_id", new_sess).withColumn(
        "sess_id",
        F.sum("new_sess").over(order_w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


# --- latest-record snapshot (upsert/compaction semantics) ------------------


@query(
    "latest_event_per_user",
    oracle="""
SELECT user_id, ts AS last_ts, event_type AS last_event_type,
       value AS last_value
FROM (
    SELECT user_id, ts, event_id, event_type, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events
) t
WHERE rn = 1
""".strip(),
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key snapshot — the compaction step of
    upsert/changelog semantics (MERGE latest-wins, SCD type-1): one
    row_number window per key, deterministic tie-break on event_id. At
    100 TB this is how a change feed folds into a serving snapshot; the
    window is key-partitioned so it scales with the key count, and AQE
    coalesces the post-filter partitions."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )


# --- deterministic stratified sampling -------------------------------------

# md5(doc_id) first-4-hex as an integer 0..65535 — identical text in Spark
# (conv) and DuckDB (strpos polynomial), mod 100 gives the sampling bucket.
_HEXD = "(STRPOS('0123456789abcdef', SUBSTR({m}, {p}, 1)) - 1)"
_DOC_HEX4 = (
    "("
    + " + ".join(
        _HEXD.format(m="md5(CAST(doc_id AS VARCHAR))", p=p)
        + f" * {16 ** (4 - p)}"
        for p in range(1, 5)
    )
    + ") % 100"
)


@query(
    "stratified_sample_documents",
    oracle=f"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN {_DOC_HEX4} < (CASE WHEN lang = 'en' THEN 10 ELSE 30 END)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM documents
GROUP BY lang
""".strip(),
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for mixture rebalancing: English
    keeps 10%, every low-resource language keeps 30% (upsampling the tail
    is the standard pretraining-mixture move). Membership is
    content-addressed — md5(doc_id) mod 100 under the per-stratum rate —
    so the sample is stable under reshuffles, retries, and engine swaps
    (no RNG state, no ordering dependence), and UNIONS of shards sample
    consistently. Single scan, one partial-aggregated groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % 100
    )
    rate = F.when(F.col("lang") == "en", 10).otherwise(30)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(bucket < rate, 1).otherwise(0)).alias("n_sampled"),
    )


# --- mergeable histogram quantiles -----------------------------------------

_HIST_CTE = """
hist AS (
    SELECT CAST(FLOOR(l_extendedprice / 100) AS BIGINT) AS bin,
           COUNT(*) AS n
    FROM lineitem GROUP BY 1
),
cum AS (
    SELECT bin, n,
           COALESCE(SUM(n) OVER (
               ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cum_before,
           SUM(n) OVER () AS total
    FROM hist
),
targets AS (
    SELECT CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE) AS p
)
""".strip()


@query(
    "histogram_quantiles_lineitem",
    oracle=f"""
WITH {_HIST_CTE}
SELECT p, ROUND(bin * 100 + (p * total - cum_before) / n * 100, 6) AS est_value
FROM cum, targets
WHERE cum_before < p * total AND cum_before + n >= p * total
""".strip(),
)
def histogram_quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a MERGEABLE fixed-width histogram: one
    map-side-combined groupBy builds per-bin counts (the sketch — shard
    histograms merge by addition, the property that makes this the 100 TB
    quantile structure), then p50/p95/p99 are interpolated inside the
    covering bin. The cumulative window runs on the AGGREGATED bins
    (~1000 rows regardless of input scale), so the single-partition
    window cost is O(bins), not O(rows). Bin arithmetic is integer and
    the interpolation uses only (bin, counts, p), so the estimate is
    bit-reproducible — the oracle runs the same algorithm, not an exact
    percentile."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        F.floor(F.col("l_extendedprice") / 100).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "bin",
        "n",
        F.coalesce(F.sum("n").over(w_cum), F.lit(0)).alias("cum_before"),
        F.sum("n").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    targets = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))).alias("p")
    )
    return (
        cum.crossJoin(F.broadcast(targets))
        .filter(
            (F.col("cum_before") < F.col("p") * F.col("total"))
            & (F.col("cum_before") + F.col("n") >= F.col("p") * F.col("total"))
        )
        .select(
            "p",
            F.round(
                F.col("bin") * 100
                + (F.col("p") * F.col("total") - F.col("cum_before"))
                / F.col("n")
                * 100,
                6,
            ).alias("est_value"),
        )
    )


# --- Bloom-filter membership -----------------------------------------------

#: Bloom geometry: m bits, k hashes. Positions derive from one md5 per key
#: (same parametric-family trick as MinHash: one hash, k integer variants),
#: exact BIGINT arithmetic in both engines.
_BLOOM_M = 8192
_BLOOM_K = 4
_BLOOM_P = 2_147_483_647
_BLOOM_A0 = 700_001
_BLOOM_B = 12_345

_KEY_HEX15 = " + ".join(
    _HEXD.format(m="md5(CAST({key} AS VARCHAR))", p=p) + f" * {16 ** (15 - p)}"
    for p in range(1, 16)
)


def _bloom_positions_sql(key: str) -> str:
    """DuckDB rows ``(pos_idx, pos)`` for one key column."""
    base = f"(({_KEY_HEX15.format(key=key)}) % {_BLOOM_P})"
    return (
        "SELECT i AS pos_idx, "
        f"(({base} * ({_BLOOM_A0} + 2 * i) + i * {_BLOOM_B}) % {_BLOOM_P}) "
        f"% {_BLOOM_M} AS pos "
        "FROM (SELECT unnest(generate_series(0, "
        f"{_BLOOM_K - 1})) AS i) idx"
    )


def _bloom_positions(key: F.Column) -> F.Column:
    """Array of k bit positions for one key — Spark twin of
    :func:`_bloom_positions_sql`."""
    base = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
            "long"
        )
        % _BLOOM_P
    )
    return F.array(
        *[
            ((base * (_BLOOM_A0 + 2 * i) + i * _BLOOM_B) % _BLOOM_P)
            % _BLOOM_M
            for i in range(_BLOOM_K)
        ]
    )


@query(
    "bloom_membership_orders",
    oracle=f"""
WITH members AS (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
bits AS (
    SELECT DISTINCT pos FROM members,
        ({_bloom_positions_sql('c_custkey')}) h
),
probes AS (
    SELECT DISTINCT o_custkey AS probe_key FROM orders
),
probe_hits AS (
    SELECT probe_key,
           COUNT(DISTINCT h.pos_idx) AS n_hits
    FROM probes,
         ({_bloom_positions_sql('probe_key')}) h
    JOIN bits ON h.pos = bits.pos
    GROUP BY probe_key
),
flags AS (
    SELECT p.probe_key,
           COALESCE(h.n_hits, 0) = {_BLOOM_K} AS pass,
           EXISTS (SELECT 1 FROM members m
                   WHERE m.c_custkey = p.probe_key) AS is_member
    FROM probes p LEFT JOIN probe_hits h ON p.probe_key = h.probe_key
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bloom_pass,
       CAST(SUM(CASE WHEN pass AND is_member THEN 1 ELSE 0 END) AS BIGINT)
           AS n_true_members,
       CAST(SUM(CASE WHEN pass AND NOT is_member THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positives
FROM flags
""".strip(),
)
def bloom_membership_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership as a relational sketch: the BUILDING-segment
    customer keys set k=4 md5-derived bits in an m=8192 filter; every
    distinct order custkey probes it. The bitset is rows of distinct set
    positions (<= m rows REGARDLESS of member count — the sketch property),
    built with one groupBy and broadcast into the probe join, so probing N
    keys costs one broadcast-hash-join pass, no shuffle of the probe side
    beyond its own distinct. Pass/member flags fold into ONE global
    aggregation (the probe subtree executes once — not once per output
    count), reporting measured false positives against exact membership:
    the trade-off a 100 TB pipeline accepts to pre-filter a join. The
    oracle recomputes the identical bit arithmetic (one md5 per key,
    parametric family)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    members = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    bits = (
        members.select(
            F.explode(_bloom_positions(F.col("c_custkey"))).alias("pos")
        )
        .distinct()
    )
    probes = orders.select(
        F.col("o_custkey").alias("probe_key")
    ).distinct()
    probe_pos = probes.select(
        "probe_key",
        F.posexplode(_bloom_positions(F.col("probe_key"))).alias(
            "pos_idx", "pos"
        ),
    )
    # hits stays partitioned on probe_key from the distinct, the bits and
    # members sides broadcast, so the whole query is one probe-side
    # shuffle + one single-row final aggregate.
    hits = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("probe_key")
        .agg(F.count_distinct("pos_idx").alias("n_hits"))
    )
    flags = (
        probes.join(hits, "probe_key", "left")
        .withColumn(
            "pass", F.coalesce(F.col("n_hits"), F.lit(0)) == _BLOOM_K
        )
        .join(
            F.broadcast(members.withColumn("is_member", F.lit(True))),
            F.col("probe_key") == F.col("c_custkey"),
            "left",
        )
        .withColumn("is_member", F.coalesce(F.col("is_member"), F.lit(False)))
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("pass"), 1).otherwise(0)).alias("n_bloom_pass"),
        F.sum(
            F.when(F.col("pass") & F.col("is_member"), 1).otherwise(0)
        ).alias("n_true_members"),
        F.sum(
            F.when(F.col("pass") & ~F.col("is_member"), 1).otherwise(0)
        ).alias("n_false_positives"),
    )


# --- top-decile quality filter ---------------------------------------------


@query(
    "top_decile_quality_by_lang",
    oracle=f"""
WITH scored AS (
    SELECT lang, doc_id, ({QUALITY_SCORE_SQL.strip()}) AS score
    FROM documents
),
ranked AS (
    SELECT lang, score,
           ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY score DESC, doc_id
           ) AS rn,
           COUNT(*) OVER (PARTITION BY lang) AS n_lang
    FROM scored
)
SELECT lang, COUNT(*) AS n_top, ROUND(MIN(score), 6) AS cutoff_score
FROM ranked
WHERE rn <= CAST(FLOOR(n_lang * 0.10) AS BIGINT)
GROUP BY lang
""".strip(),
)
def top_decile_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-gated quality curation: keep each language's top 10% of
    docs by the deterministic surface-quality score (the shape of a
    FineWeb-style quality filter: score, rank within stratum, cut at a
    percentile rather than a global constant so low-resource languages
    aren't wiped out). One key-partitioned window ranks; the cutoff row
    count is floor(n*0.10) per language. Returns the kept count and the
    per-language score cutoff actually applied."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang", "doc_id", quality_score(F.col("text")).alias("score")
    )
    w_rank = Window.partitionBy("lang").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    w_n = Window.partitionBy("lang")
    ranked = scored.select(
        "lang",
        "score",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n_lang"),
    )
    return (
        ranked.filter(
            F.col("rn") <= F.floor(F.col("n_lang") * 0.10).cast("long")
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_top"),
            F.round(F.min("score"), 6).alias("cutoff_score"),
        )
    )


# --- anti-join integrity check ---------------------------------------------


@query(
    "customers_without_urgent_orders",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c_mktsegment
""".strip(),
)
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left ANTI join (NOT EXISTS): customers who never placed an urgent
    order, counted per market segment. The priority filter pushes into the
    orders scan BEFORE the anti join, shrinking the build side ~5x; the
    anti join shuffles both sides on custkey once and streams — the
    referential/exclusion primitive (orphan detection, suppression lists,
    tombstone filtering) that pipelines run against every ingest batch."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        cust.join(
            urgent, cust["c_custkey"] == urgent["o_custkey"], "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --- TPC-H Q6-shaped pushdown aggregate ------------------------------------


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.045 AND l_discount <= 0.075
  AND l_quantity < 24
""".strip(),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the canonical predicate-pushdown probe: a pure
    filter + scalar aggregate whose four predicates must ALL reach the
    parquet scan (PushedFilters), with row-group statistics skipping
    whole chunks of a date-partitioned 100 TB fact table. No shuffle at
    all: partial sums combine map-side into a single-row result. Discount
    bounds sit between the data's 0.01 grid points so double comparison
    is unambiguous in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.045)
        & (F.col("l_discount") <= 0.075)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )

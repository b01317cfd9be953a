"""Evaluation & audit operators — cluster quality, privacy risk, and
CEP-style behavioral patterns (SURVEY.md §2.9's "beyond the reference"
mandate; the reference has no analog):

- **simplified silhouette** (`kmeans_silhouette`): per-cluster quality of
  the k-means codebook (`kmeans_embedding_clusters`) via the simplified
  silhouette (centroid-based, the classic approximation that avoids the
  all-pairs point-to-point silhouette): for every vector,
  ``s = (b - a) / max(a, b)`` where ``a`` is the distance to its own
  centroid and ``b`` the distance to the nearest OTHER centroid — both
  read from one ranked distance list, so the whole evaluation is the
  assignment join (vectors x broadcast k-row codebook) plus one window
  and one aggregate. The oracle replays the identical Lloyd trajectory
  through the shared generated CTE chain (operators/clustering.py).
- **k-anonymity audit** (`k_anonymity_audit`): the privacy-release check
  for a training corpus: bucket every document by its quasi-identifier
  tuple (lang, source, n_chars rounded to 50) and report, per language,
  how many equivalence classes fall below k=5 and how many rows sit in
  them (Sweeney 2002 — public literature). One groupBy on the
  quasi-identifier tuple, one per-lang rollup — map-side combined, the
  cheapest audit in the suite; pairs with the PII redaction counts
  (plans/traindata.py) as the privacy family.
- **event pattern matching** (`event_pattern_matches`): complex-event
  processing (the Flink CEP / MATCH_RECOGNIZE class) by relational
  encoding: per (user, day), order events by (ts, event_id), project
  each to a one-char tag, concatenate the day's journey string, and
  count regex matches — the conversion funnel ``vc*p`` (view, any
  clicks, purchase) and the error-retry ``e+p``. Tags are DISJOINT
  single characters, so leftmost-first and leftmost-longest regex
  semantics coincide and Spark's (Java regex) and DuckDB's (RE2) counts
  are identical by construction. The day scope bounds the per-group
  state exactly like a streaming watermark would — no unbounded
  collect_list, and the only shuffle is the (user, day) aggregate.

Every query is pure DataFrame composition — no UDFs, no driver-side
collection — and every oracle reproduces the exact arithmetic so the
driver's value-hash gate verifies results, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_beam_challange_spark.operators.clustering import (
    kmeans_centroids,
    kmeans_cents_ctes,
)
from apache_beam_challange_spark.plans.registry import query
from apache_beam_challange_spark.sources.catalog import load_table

# --- simplified silhouette of the k-means clustering ------------------------

_K, _N_ITER = 4, 2


@query(
    "kmeans_silhouette",
    oracle=f"""
WITH {kmeans_cents_ctes(k=_K, n_iter=_N_ITER)},
ranked AS (
    SELECT v.vec_id, c.centroid_id,
           list_distance(v.vec, c.cvec) AS dist,
           ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_distance(v.vec, c.cvec), c.centroid_id
           ) AS rn
    FROM vecs v CROSS JOIN cents{_N_ITER} c
),
ab AS (
    SELECT vec_id,
           MAX(CASE WHEN rn = 1 THEN centroid_id END) AS centroid_id,
           MAX(CASE WHEN rn = 1 THEN dist END) AS a,
           MAX(CASE WHEN rn = 2 THEN dist END) AS b
    FROM ranked WHERE rn <= 2 GROUP BY vec_id
),
sil AS (
    SELECT centroid_id,
           CASE WHEN GREATEST(a, b) = 0 THEN 0.0
                ELSE (b - a) / GREATEST(a, b) END AS s
    FROM ab
)
SELECT centroid_id,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(AVG(s), 6) AS avg_silhouette,
       ROUND(MIN(s), 6) AS min_silhouette
FROM sil
GROUP BY centroid_id
ORDER BY centroid_id
""".strip(),
)
def kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster simplified silhouette of the k-means codebook: how
    separated each cluster is, from the SAME ranked distance list the
    assignment already computes — rank 1 is the own-centroid distance
    ``a``, rank 2 the nearest-other-centroid distance ``b``,
    ``s = (b - a) / max(a, b)`` (0 when both distances are 0, the
    duplicate-of-centroid guard). Vectors x broadcast k-row codebook,
    one per-vector window, one per-cluster aggregate — the evaluation
    costs no more than the assignment it grades."""
    emb = load_table(spark, sf_dir, "embeddings")
    from apache_beam_challange_spark.functions.vector import as_double
    from apache_beam_challange_spark.operators.clustering import _sq_l2

    vecs = emb.select("vec_id", as_double(F.col("embedding")).alias("vec"))
    cents = kmeans_centroids(emb, k=_K, n_iter=_N_ITER)
    w = Window.partitionBy("vec_id").orderBy("dist", "centroid_id")
    ranked = (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("dist", _sq_l2(F.col("vec"), F.col("cvec")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
    )
    ab = ranked.groupBy("vec_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("centroid_id"))).alias(
            "centroid_id"
        ),
        F.max(F.when(F.col("rn") == 1, F.col("dist"))).alias("a"),
        F.max(F.when(F.col("rn") == 2, F.col("dist"))).alias("b"),
    )
    s = F.when(F.greatest("a", "b") == 0, F.lit(0.0)).otherwise(
        (F.col("b") - F.col("a")) / F.greatest("a", "b")
    )
    return (
        ab.select("centroid_id", s.alias("s"))
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.round(F.avg("s"), 6).alias("avg_silhouette"),
            F.round(F.min("s"), 6).alias("min_silhouette"),
        )
        .orderBy("centroid_id")
    )


# --- k-anonymity audit ------------------------------------------------------

_K_ANON = 5
_CHARS_BUCKET = 50


@query(
    "k_anonymity_audit",
    oracle=f"""
WITH classes AS (
    SELECT lang, source,
           CAST(FLOOR(CAST(n_chars AS DOUBLE) / {_CHARS_BUCKET}) AS BIGINT)
               AS chars_bucket,
           CAST(COUNT(*) AS BIGINT) AS class_size
    FROM documents
    GROUP BY lang, source, FLOOR(CAST(n_chars AS DOUBLE) / {_CHARS_BUCKET})
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN class_size < {_K_ANON} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violating_classes,
       CAST(SUM(CASE WHEN class_size < {_K_ANON} THEN class_size ELSE 0 END)
            AS BIGINT) AS n_rows_at_risk,
       CAST(MIN(class_size) AS BIGINT) AS min_class_size
FROM classes
GROUP BY lang
ORDER BY lang
""".strip(),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5, ``_K_ANON``) over the quasi-identifier
    tuple (lang, source, n_chars bucketed to ``_CHARS_BUCKET``=50): per language,
    how many equivalence classes a release would expose with fewer than
    k members and how many rows sit in them — the check run before
    publishing a corpus with per-document metadata. Two stacked
    aggregates, both map-side combined; the quasi-identifier groupBy is
    the only shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    classes = (
        docs.select(
            "lang",
            "source",
            F.floor(F.col("n_chars").cast("double") / _CHARS_BUCKET)
            .cast("long")
            .alias("chars_bucket"),
        )
        .groupBy("lang", "source", "chars_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
    )
    return (
        classes.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum((F.col("class_size") < _K_ANON).cast("long")).alias(
                "n_violating_classes"
            ),
            F.sum(
                F.when(F.col("class_size") < _K_ANON, F.col("class_size"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_rows_at_risk"),
            F.min("class_size").alias("min_class_size"),
        )
        .orderBy("lang")
    )


# --- CEP-style event pattern matching ---------------------------------------

#: conversion funnel: a view, any number of clicks, then a purchase
_FUNNEL_RE = "vc*p"
#: error-retry: one or more errors immediately before a purchase
_RETRY_RE = "e+p"


@query(
    "event_pattern_matches",
    oracle=f"""
WITH tagged AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
           ts, event_id, substr(event_type, 1, 1) AS tag
    FROM events
),
journeys AS (
    SELECT user_id, day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           STRING_AGG(tag, '' ORDER BY ts, event_id) AS journey
    FROM tagged
    GROUP BY user_id, day
),
matched AS (
    SELECT user_id, day, n_events,
           CAST(LEN(regexp_extract_all(journey, '{_FUNNEL_RE}')) AS BIGINT)
               AS n_funnel,
           CAST(LEN(regexp_extract_all(journey, '{_RETRY_RE}')) AS BIGINT)
               AS n_error_retry
    FROM journeys
)
SELECT user_id, day, n_events, n_funnel, n_error_retry
FROM matched
WHERE n_funnel > 0 OR n_error_retry > 0
""".strip(),
)
def event_pattern_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP pattern matching by relational encoding (the MATCH_RECOGNIZE /
    Flink-CEP class): each (user, day) concatenates its time-ordered
    one-char event tags into a journey string and counts non-overlapping
    regex matches — the conversion funnel ``vc*p`` (``_FUNNEL_RE``) and
    the error-retry ``e+p`` (``_RETRY_RE``). Event-type tags are disjoint single
    characters, so greedy leftmost matching is unambiguous and the
    Java-regex (Spark) and RE2 (DuckDB) counts coincide by construction;
    ties in ``ts`` are broken by event_id so the journey string itself
    is deterministic. The day scope bounds per-group state (the batch
    twin of a watermarked session) — one (user, day) shuffle, journeys
    of at most one day's events, never an unbounded collect."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.struct(
            F.col("ts"), F.col("event_id"),
            F.substring("event_type", 1, 1).alias("tag"),
        ).alias("evt"),
    )
    journeys = tagged.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("evt")), lambda s: s["tag"]
            ),
            "",
        ).alias("journey"),
    )
    matched = journeys.select(
        "user_id",
        "day",
        "n_events",
        F.size(F.regexp_extract_all("journey", F.lit(_FUNNEL_RE), F.lit(0)))
        .cast("long")
        .alias("n_funnel"),
        F.size(F.regexp_extract_all("journey", F.lit(_RETRY_RE), F.lit(0)))
        .cast("long")
        .alias("n_error_retry"),
    )
    return matched.filter(
        (F.col("n_funnel") > 0) | (F.col("n_error_retry") > 0)
    )


# --- differentially-private noisy release -----------------------------------

_DP_EPSILON = 1.0
_DP_SEED = "dp-seed-"
#: 16^15 — the divisor turning a 15-hex-digit md5 prefix into a [0,1) double
_DP_DENOM = 16 ** 15

#: DuckDB spelling of md5('dp-seed-' || lang)'s first 15 hex digits as BIGINT
from apache_beam_challange_spark.plans.extensions import _HEXD  # noqa: E402

_DP_HEX15 = " + ".join(
    _HEXD.format(m=f"md5('{_DP_SEED}' || lang)", p=p) + f" * {16 ** (15 - p)}"
    for p in range(1, 16)
)


@query(
    "dp_noisy_lang_counts",
    oracle=f"""
WITH counts AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
),
seeded AS (
    SELECT lang, n_docs,
           CAST(({_DP_HEX15}) AS DOUBLE) / {_DP_DENOM}.0 AS u
    FROM counts
),
noised AS (
    SELECT lang, n_docs,
           CASE WHEN u >= 0.5
                THEN -(1.0 / {_DP_EPSILON}) * ln(1.0 - 2.0 * (u - 0.5))
                ELSE  (1.0 / {_DP_EPSILON}) * ln(1.0 - 2.0 * (0.5 - u)) END
               AS noise
    FROM seeded
)
SELECT lang, n_docs,
       ROUND(n_docs + noise, 6) AS noisy_count,
       CAST({_DP_EPSILON} AS DOUBLE) AS epsilon
FROM noised
ORDER BY lang
""".strip(),
)
def dp_noisy_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (the Laplace mechanism, Dwork
    et al. 2006 — public literature) over the per-language document
    counts: sensitivity-1 counts + Laplace(1/epsilon) noise, epsilon=1.
    The noise draw is DERANDOMIZED for verifiability: the uniform comes
    from a seeded md5 of the group key (the engine's established
    deterministic-hash discipline), pushed through the Laplace inverse
    CDF — so the oracle reproduces the exact noisy value while the
    mechanism's arithmetic stays the published one. The true count rides
    along for test/verification purposes (a production release would
    drop it — and use a real entropy source). Completes the privacy
    family (PII redaction, k-anonymity, DP release); one tiny aggregate,
    noise applied on lang-cardinality rows."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(_DP_SEED), F.col("lang"))), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(float(_DP_DENOM))
    )
    b = 1.0 / _DP_EPSILON
    noise = F.when(
        u >= 0.5, -F.lit(b) * F.log(1.0 - 2.0 * (u - 0.5))
    ).otherwise(F.lit(b) * F.log(1.0 - 2.0 * (0.5 - u)))
    return (
        counts.select(
            "lang",
            "n_docs",
            F.round(F.col("n_docs") + noise, 6).alias("noisy_count"),
            F.lit(float(_DP_EPSILON)).alias("epsilon"),
        )
        .orderBy("lang")
    )


# --- Markov transition matrix over event sequences --------------------------


@query(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_type
    FROM events
),
trans AS (
    SELECT prev_type AS from_type, event_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
)
SELECT from_type, to_type, n_transitions,
       ROUND(n_transitions * 1.0
             / SUM(n_transitions) OVER (PARTITION BY from_type), 6) AS prob
FROM trans
ORDER BY from_type, to_type
""".strip(),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: LAG per (user ORDER BY ts, event_id) pairs each event
    with its predecessor, the (from, to) counts aggregate, and each
    row's probability normalizes within its from-state (a window over
    the 5x5 post-aggregation matrix — the established small-input
    global-window class). The behavioral-model companion to
    `event_pattern_matches`: the CEP query finds specific journeys,
    this one fits the chain those journeys are drawn from. One user
    window shuffle + one tiny aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("from_type")
    ).filter(F.col("from_type").isNotNull())
    trans = (
        seq.groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    w_norm = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") * 1.0 / F.sum("n_transitions").over(w_norm),
            6,
        ).alias("prob"),
    ).orderBy("from_type", "to_type")


# --- shuffle-skew diagnostic ------------------------------------------------


@query(
    "shuffle_skew_report",
    oracle="""
WITH per_key AS (
    SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_custkey
),
ranked AS (
    SELECT key, n,
           ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rk,
           CAST(SUM(n) OVER () AS BIGINT) AS total,
           CAST(COUNT(*) OVER () AS BIGINT) AS n_keys,
           CAST(MAX(n) OVER () AS BIGINT) AS max_n
    FROM per_key
)
SELECT n_keys,
       total AS n_rows,
       max_n AS max_key_rows,
       ROUND(max_n * 1.0 / total, 6) AS top_key_share,
       ROUND(max_n * n_keys * 1.0 / total, 6) AS skew_factor,
       CAST(SUM(CASE WHEN rk <= 10 THEN n ELSE 0 END) AS BIGINT)
           AS top10_rows,
       ROUND(SUM(CASE WHEN rk <= 10 THEN n ELSE 0 END) * 1.0 / total, 6)
           AS top10_share
FROM ranked
GROUP BY n_keys, total, max_n
""".strip(),
)
def shuffle_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew diagnostic over orders.o_custkey — the
    report run BEFORE choosing between a plain hash join, salting
    (`salted_join_revenue`) and AQE's skew-join split: distinct-key
    count, the heaviest key's row share, the skew factor
    (max_key * n_keys / total — 1.0 means perfectly uniform), and the
    top-10-key share. Unlike this module's other global-window uses, the
    per-key table's cardinality GROWS with the fact table, so no global
    window touches it (review): total/n_keys/max come from one agg(),
    the top-10 from orderBy(desc).limit(10) — TakeOrderedAndProject,
    per-partition heaps, no single-partition funnel — and the two
    single-row frames cross-join into the summary row. per_key is
    localCheckpoint-ed so the orders scan+shuffle runs once, not once
    per consumer."""
    o = load_table(spark, sf_dir, "orders")
    per_key = (
        o.groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    summary = per_key.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_n"),
    )
    top10 = (
        per_key.orderBy(F.col("n").desc(), F.col("key"))
        .limit(10)
        .agg(F.sum("n").cast("long").alias("top10_rows"))
    )
    return (
        summary.crossJoin(top10)
        .select(
            "n_keys",
            F.col("total").alias("n_rows"),
            F.col("max_n").alias("max_key_rows"),
            F.round(F.col("max_n") * 1.0 / F.col("total"), 6).alias(
                "top_key_share"
            ),
            F.round(
                F.col("max_n") * F.col("n_keys") * 1.0 / F.col("total"), 6
            ).alias("skew_factor"),
            "top10_rows",
            F.round(F.col("top10_rows") * 1.0 / F.col("total"), 6).alias(
                "top10_share"
            ),
        )
    )


# --- Benford first-digit audit ----------------------------------------------

#: Benford probabilities log10(1 + 1/d) in exact integer MILLIONTHS —
#: rounded to 6 dp they sum to exactly 1_000_000, so the expected counts
#: partition total*1e6 with no remainder drift. Pinned as literals (not
#: computed) so the audit is engine-exact: libm log10 can differ in the
#: last ulp across engines, a FLOOR boundary hazard the integer table
#: removes entirely.
_BENFORD_MICRO = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_CASE = "CASE d.first_digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_MICRO.items()
) + " END"
_BENFORD_VALUES = ", ".join(f"({d})" for d in range(1, 10))


@query(
    "benford_price_audit",
    oracle=f"""
WITH obs AS (
    SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT)
                               AS STRING), 1, 1) AS INT) AS first_digit,
           CAST(COUNT(*) AS BIGINT) AS observed
    FROM lineitem
    GROUP BY 1
),
tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS total FROM obs)
SELECT d.first_digit,
       COALESCE(o.observed, 0) AS observed,
       tot.total * {_BENFORD_CASE} AS expected_micro,
       ABS(COALESCE(o.observed, 0) * 1000000
           - tot.total * {_BENFORD_CASE}) AS abs_dev_micro
FROM (VALUES {_BENFORD_VALUES}) AS d(first_digit)
LEFT JOIN obs o ON o.first_digit = d.first_digit
CROSS JOIN tot
ORDER BY d.first_digit
""".strip(),
)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of lineitem.l_extendedprice — the
    classic fraud / synthetic-data screen (Benford 1938, Nigrini 1996 —
    public literature): observed first-digit counts against the expected
    Benford distribution log10(1 + 1/d).

    Engine-exact by integer arithmetic end to end: the first digit comes
    from the FLOOR'd price's decimal string (prices are >= 1 here; FLOOR
    then CAST is exact on both engines, unlike CAST of a raw double,
    which rounds in DuckDB and truncates in Spark), the Benford
    probabilities are pinned integer-millionth literals that sum to
    exactly 1e6, and the deviation is |observed*1e6 - total*p_micro| in
    bigint — no float comparison anywhere. The digit spine is a 9-row
    literal VALUES table left-joined so absent digits report 0. Scale
    shape: one map-side-combined groupBy on a 9-value key, a 1-row total
    cross-joined back, and a 9-row broadcast spine — nothing grows with
    the fact table except the scan. Facade-portable: the oracle text
    runs unmodified on Spark SQL (tests/test_sql_facade.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = (
        li.select(
            F.substring(
                F.floor(F.col("l_extendedprice")).cast("long").cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("first_digit")
        )
        .groupBy("first_digit")
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    tot = obs.agg(F.sum("observed").cast("long").alias("total"))
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("first_digit"))
    p_micro = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for d, p in _BENFORD_MICRO.items()
                for x in (d, p)
            ]
        ),
        F.col("first_digit"),
    ).cast("long")
    return (
        spine.join(obs, "first_digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "first_digit",
            F.coalesce(F.col("observed"), F.lit(0)).cast("long").alias("observed"),
            (F.col("total") * p_micro).cast("long").alias("expected_micro"),
            F.abs(
                F.coalesce(F.col("observed"), F.lit(0)) * F.lit(1000000)
                - F.col("total") * p_micro
            )
            .cast("long")
            .alias("abs_dev_micro"),
        )
        .orderBy("first_digit")
    )


# --- two-snapshot diff / reconciliation audit --------------------------------


@query(
    "snapshot_diff_audit",
    oracle="""
WITH cutoff AS (
    SELECT date_trunc('day', MAX(ts)) AS c FROM events
),
old_ranked AS (
    SELECT user_id, event_type, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events, cutoff
    WHERE ts < cutoff.c
),
old_snap AS (
    SELECT user_id, event_type, value FROM old_ranked
    WHERE rn = 1 AND event_type <> 'error'
),
new_ranked AS (
    SELECT user_id, event_type, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events
),
new_snap AS (
    SELECT user_id, event_type, value FROM new_ranked
    WHERE rn = 1 AND event_type <> 'error'
),
j AS (
    SELECT o.user_id AS ou, n.user_id AS nu,
           o.event_type AS oet, n.event_type AS net,
           o.value AS ov, n.value AS nv
    FROM old_snap o FULL JOIN new_snap n ON o.user_id = n.user_id
)
SELECT CAST(COUNT(ou) AS BIGINT) AS n_keys_old,
       CAST(COUNT(nu) AS BIGINT) AS n_keys_new,
       CAST(SUM(CASE WHEN ou IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS added,
       CAST(SUM(CASE WHEN nu IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS removed,
       CAST(SUM(CASE WHEN ou IS NOT NULL AND nu IS NOT NULL
                      AND (oet IS DISTINCT FROM net
                           OR ov IS DISTINCT FROM nv)
                THEN 1 ELSE 0 END) AS BIGINT) AS changed,
       CAST(SUM(CASE WHEN ou IS NOT NULL AND nu IS NOT NULL
                      AND NOT (oet IS DISTINCT FROM net)
                      AND NOT (ov IS DISTINCT FROM nv)
                THEN 1 ELSE 0 END) AS BIGINT) AS unchanged,
       CAST(SUM(CASE WHEN ou IS NOT NULL AND nu IS NOT NULL
                      AND oet IS DISTINCT FROM net
                THEN 1 ELSE 0 END) AS BIGINT) AS changed_event_type,
       CAST(SUM(CASE WHEN ou IS NOT NULL AND nu IS NOT NULL
                      AND ov IS DISTINCT FROM nv
                THEN 1 ELSE 0 END) AS BIGINT) AS changed_value
FROM j
""".strip(),
)
def snapshot_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-snapshot diff / reconciliation audit — the table-diff report
    run before promoting a rebuilt table (the Datafold-class data-diff
    op): materialize the serving snapshot AS OF the last day boundary
    and AS OF now from the same changelog (both via the verified
    latest-row-wins + tombstone fold of ``cdc_snapshot_with_deletes``),
    FULL OUTER join on the key, and classify every key as
    added / removed / changed / unchanged, with per-column change
    counts (which column drifted — the first question any
    reconciliation asks).

    NULL-safe comparison via IS DISTINCT FROM; values compare the
    identical stored doubles on both sides so the comparison is exact.
    Scale shape: two key-partitioned window folds + one key-keyed FULL
    OUTER hash join + one global aggregate to a single row — everything
    shuffles on the snapshot key, nothing collects. Facade-portable:
    this text runs verbatim on Spark SQL."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(F.date_trunc("day", F.max("ts")).alias("c"))

    def snap(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
            .select("user_id", "event_type", "value")
        )

    old_snap = snap(
        ev.crossJoin(F.broadcast(cutoff)).filter(F.col("ts") < F.col("c"))
    ).select(
        F.col("user_id").alias("ou"),
        F.col("event_type").alias("oet"),
        F.col("value").alias("ov"),
    )
    new_snap = snap(ev).select(
        F.col("user_id").alias("nu"),
        F.col("event_type").alias("net"),
        F.col("value").alias("nv"),
    )
    j = old_snap.join(new_snap, old_snap.ou == new_snap.nu, "full")
    both = F.col("ou").isNotNull() & F.col("nu").isNotNull()
    et_diff = ~F.col("oet").eqNullSafe(F.col("net"))
    v_diff = ~F.col("ov").eqNullSafe(F.col("nv"))

    def n(cond: F.Column, alias: str) -> F.Column:
        return (
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(alias)
        )

    return j.agg(
        F.count("ou").cast("long").alias("n_keys_old"),
        F.count("nu").cast("long").alias("n_keys_new"),
        n(F.col("ou").isNull(), "added"),
        n(F.col("nu").isNull(), "removed"),
        n(both & (et_diff | v_diff), "changed"),
        n(both & ~et_diff & ~v_diff, "unchanged"),
        n(both & et_diff, "changed_event_type"),
        n(both & v_diff, "changed_value"),
    )


# --- l-diversity audit --------------------------------------------------------

_L_DIVERSITY = 3


@query(
    "l_diversity_audit",
    oracle=f"""
WITH classes AS (
    SELECT source,
           CAST(FLOOR(CAST(n_chars AS DOUBLE) / {_CHARS_BUCKET}) AS BIGINT)
               AS chars_bucket,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_sensitive
    FROM documents
    GROUP BY source, FLOOR(CAST(n_chars AS DOUBLE) / {_CHARS_BUCKET})
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN n_sensitive < {_L_DIVERSITY} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violating_classes,
       CAST(SUM(CASE WHEN n_sensitive < {_L_DIVERSITY} THEN class_size
                ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
       CAST(MIN(n_sensitive) AS BIGINT) AS min_diversity
FROM classes
GROUP BY source
ORDER BY source
""".strip(),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l=3, ``_L_DIVERSITY``) — the attribute-disclosure
    check k-anonymity misses (Machanavajjhala et al. 2007 — public
    literature): a class can be k-anonymous yet reveal its members'
    SENSITIVE attribute when all members share it. Quasi-identifiers are
    (source, n_chars bucketed to ``_CHARS_BUCKET``); the sensitive
    attribute is ``lang``; per source the audit reports equivalence
    classes whose distinct-sensitive count falls below l and the rows in
    them. Completes the privacy family next to ``k_anonymity_audit``
    (same bucketing constants) and ``pii_redaction_counts``. Two stacked
    aggregates; the distinct-count is a partial-combined two-phase
    distinct on the quasi-id shuffle, the only wide op. Facade-portable."""
    docs = load_table(spark, sf_dir, "documents")
    classes = (
        docs.select(
            "source",
            "lang",
            F.floor(F.col("n_chars").cast("double") / _CHARS_BUCKET)
            .cast("long")
            .alias("chars_bucket"),
        )
        .groupBy("source", "chars_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_size"),
            F.countDistinct("lang").cast("long").alias("n_sensitive"),
        )
    )
    return (
        classes.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum((F.col("n_sensitive") < _L_DIVERSITY).cast("long")).alias(
                "n_violating_classes"
            ),
            F.sum(
                F.when(
                    F.col("n_sensitive") < _L_DIVERSITY, F.col("class_size")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_rows_at_risk"),
            F.min("n_sensitive").alias("min_diversity"),
        )
        .orderBy("source")
    )


# --- CUPED variance reduction --------------------------------------------------


@query(
    "cuped_variance_reduction",
    oracle="""
WITH bounds AS (
    SELECT CAST(FLOOR((FLOOR(epoch(MIN(ts))) + FLOOR(epoch(MAX(ts)))) / 2)
                AS BIGINT) AS mid
    FROM events
),
per_user AS (
    SELECT user_id,
           CAST(SUM(CASE WHEN FLOOR(epoch(ts)) < b.mid
                         THEN CAST(FLOOR(value * 1000000) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS x,
           CAST(SUM(CASE WHEN FLOOR(epoch(ts)) >= b.mid
                         THEN CAST(FLOOR(value * 1000000) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS y
    FROM events CROSS JOIN bounds b
    GROUP BY user_id
),
stats AS (
    SELECT CAST(COUNT(*) AS DECIMAL(38, 0)) AS n,
           CAST(SUM(CAST(x AS DECIMAL(38, 0))) AS DECIMAL(38, 0)) AS sx,
           CAST(SUM(CAST(y AS DECIMAL(38, 0))) AS DECIMAL(38, 0)) AS sy,
           CAST(SUM(CAST(x AS DECIMAL(38, 0)) * x) AS DECIMAL(38, 0)) AS sxx,
           CAST(SUM(CAST(x AS DECIMAL(38, 0)) * y) AS DECIMAL(38, 0)) AS sxy,
           CAST(SUM(CAST(y AS DECIMAL(38, 0)) * y) AS DECIMAL(38, 0)) AS syy
    FROM per_user
),
scalars AS (
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(n * sxy - sx * sy AS DOUBLE) AS cov_num,
           CAST(n * sxx - sx * sx AS DOUBLE) AS varx_num,
           CAST(n * syy - sy * sy AS DOUBLE) AS vary_num,
           CAST(n * n AS DOUBLE) AS n2
    FROM stats
)
SELECT n_users,
       ROUND(cov_num / varx_num, 6) AS theta,
       ROUND(vary_num / n2 / 1e12, 4) AS var_y,
       ROUND((vary_num / n2
              - 2 * (cov_num / varx_num) * (cov_num / n2)
              + (cov_num / varx_num) * (cov_num / varx_num)
                * (varx_num / n2)) / 1e12, 4) AS var_y_adj,
       ROUND((2 * (cov_num / varx_num) * (cov_num / n2)
              - (cov_num / varx_num) * (cov_num / varx_num)
                * (varx_num / n2)) / (vary_num / n2), 6) AS var_reduction
FROM scalars
""".strip(),
)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et
    al. WSDM 2013 — public literature): the experimentation-pipeline
    variance-reduction report. Each user's post-period metric y is
    adjusted by theta * (x - x_bar) using their PRE-period metric x
    (theta = cov(x,y)/var(x)); the report gives theta, the raw and
    adjusted variance, and the variance reduction ratio (= rho^2 at the
    optimal theta) — the number that tells an experimenter how much
    smaller their A/B test can be. Periods split at the midpoint epoch
    second of the event timeline.

    Engine-exactness: per-user x/y are exact bigint micros (the
    established floor(value*1e6) discipline), the five moment sums are
    exact DECIMAL(38,0) (products up to ~1e23 — far under the 1e38
    cap, checked against the data's value/event ranges), and the final
    doubles are computed from identical exact integers by structurally
    identical formulas, rounded for the hash. Scale shape: one
    user-keyed shuffle (the per-user fold), then a single 6-scalar
    aggregate to one row — nothing widens with the event count."""
    ev = load_table(spark, sf_dir, "events")
    # ntz -> timestamp -> long: the session is pinned to UTC, so the
    # intermediate cast is a wall-clock identity (the interval-join
    # precedent in streaming/windows.py) and long truncation == FLOOR(epoch)
    e = F.col("ts").cast("timestamp").cast("long")
    bounds = ev.agg(
        F.min(F.col("ts").cast("timestamp").cast("long")).alias("mn"),
        F.max(F.col("ts").cast("timestamp").cast("long")).alias("mx"),
    ).select(
        F.floor((F.col("mn") + F.col("mx")) / 2).cast("long").alias("mid")
    )
    micros = F.floor(F.col("value") * 1000000).cast("long")
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(e < F.col("mid"), micros).otherwise(F.lit(0)))
            .cast("long")
            .alias("x"),
            F.sum(F.when(e >= F.col("mid"), micros).otherwise(F.lit(0)))
            .cast("long")
            .alias("y"),
        )
    )
    dec = "decimal(38,0)"
    stats = per_user.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).cast(dec).alias("sx"),
        F.sum(F.col("y").cast(dec)).cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast(dec).alias("syy"),
    )
    scalars = stats.select(
        F.col("n").cast("long").alias("n_users"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        .alias("cov_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("varx_num"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("vary_num"),
        (F.col("n") * F.col("n")).cast("double").alias("n2"),
    )
    theta = F.col("cov_num") / F.col("varx_num")
    return scalars.select(
        "n_users",
        F.round(theta, 6).alias("theta"),
        F.round(F.col("vary_num") / F.col("n2") / F.lit(1e12), 4).alias(
            "var_y"
        ),
        F.round(
            (
                F.col("vary_num") / F.col("n2")
                - F.lit(2) * theta * (F.col("cov_num") / F.col("n2"))
                + theta * theta * (F.col("varx_num") / F.col("n2"))
            )
            / F.lit(1e12),
            4,
        ).alias("var_y_adj"),
        F.round(
            (
                F.lit(2) * theta * (F.col("cov_num") / F.col("n2"))
                - theta * theta * (F.col("varx_num") / F.col("n2"))
            )
            / (F.col("vary_num") / F.col("n2")),
            6,
        ).alias("var_reduction"),
    )


# --- population-stability-index drift audit -----------------------------------

#: Geometric value bins: bin = bit-length of the exact cent value — pure
#: integer log2 in BOTH engines (Spark length(bin(x)), DuckDB the same
#: spelling), so binning can never straddle a float boundary. 24 bins
#: covers cents up to 2^24 (~$167k); events.value tops out at bin 16-17.
#: Laplace-0.5 smoothing keeps empty bins finite: p = (n + 0.5)/(N + 12.0),
#: 12.0 = 24 bins x 0.5 — pinned as literals in BOTH engine spellings.
_PSI_BINS = 24

_PSI_TERM = (
    "(({nc} + 0.5) / ({tc} + 12.0) - ({nb} + 0.5) / ({tb} + 12.0))"
    " * ln((({nc} + 0.5) / ({tc} + 12.0)) / (({nb} + 0.5) / ({tb} + 12.0)))"
)

_PSI_CHAIN = " + ".join(f"tb{k}" for k in range(1, _PSI_BINS + 1))

_PSI_SQL = f"""
WITH hist AS (
    SELECT event_type,
           LENGTH(BIN(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))) AS bin_id,
           CAST(SUM(CASE WHEN ISODOW(ts) >= 6 THEN 0 ELSE 1 END) AS BIGINT) AS nb,
           CAST(SUM(CASE WHEN ISODOW(ts) >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS nc
    FROM events
    GROUP BY event_type, LENGTH(BIN(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)))
),
spine AS (
    SELECT t.event_type, s.bin_id
    FROM (SELECT DISTINCT event_type FROM events) t,
         (SELECT unnest(generate_series(1, {_PSI_BINS})) AS bin_id) s
),
filled AS (
    SELECT sp.event_type, sp.bin_id,
           COALESCE(h.nb, 0) AS nb, COALESCE(h.nc, 0) AS nc
    FROM spine sp LEFT JOIN hist h
      ON h.event_type = sp.event_type AND h.bin_id = sp.bin_id
),
tot AS (
    SELECT event_type,
           CAST(SUM(nb) AS BIGINT) AS tb, CAST(SUM(nc) AS BIGINT) AS tc
    FROM filled GROUP BY event_type
),
terms AS (
    SELECT f.event_type, f.bin_id, t.tb, t.tc,
           {_PSI_TERM.format(nc="CAST(f.nc AS DOUBLE)", tc="CAST(t.tc AS DOUBLE)",
                             nb="CAST(f.nb AS DOUBLE)", tb="CAST(t.tb AS DOUBLE)")} AS term
    FROM filled f JOIN tot t ON t.event_type = f.event_type
),
pivoted AS (
    SELECT event_type, MAX(tb) AS n_base, MAX(tc) AS n_curr,
           {", ".join(f"MAX(CASE WHEN bin_id = {k} THEN term END) AS tb{k}" for k in range(1, _PSI_BINS + 1))}
    FROM terms GROUP BY event_type
)
SELECT event_type, n_base, n_curr, {_PSI_CHAIN} AS psi
FROM pivoted
ORDER BY event_type
""".strip()


@query("psi_weekend_drift_by_type", oracle=_PSI_SQL)
def psi_weekend_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — THE production drift monitor — between
    the weekday (baseline) and weekend (current) value distributions,
    per event type. Engine-exact by construction at every step: the
    bins are the BIT LENGTH of the exact cent value (integer log2 — a
    float can never straddle a bin edge), the per-(type, bin) counts
    are one map-side-combined conditional aggregate over the single
    events scan, the 24-bin spine is pinned so absent bins contribute
    their smoothed term in both engines, and the final
    sum-of-24-doubles — the one order-sensitive float reduction — is
    forced LEFT-TO-RIGHT on both sides (Spark: fold over the
    bin-sorted collected array; DuckDB: an explicit left-associative
    24-column addition chain), so not even summation order is left to
    the engines. Everything after the first aggregate touches
    <= types x 24 rows."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    wknd = F.weekday(F.col("ts")) >= 5
    hist = (
        ev.select(
            "event_type",
            F.length(F.bin(cents)).cast("long").alias("bin_id"),
            F.when(wknd, 1).otherwise(0).alias("is_c"),
        )
        .groupBy("event_type", "bin_id")
        .agg(
            F.sum(F.lit(1) - F.col("is_c")).alias("nb"),
            F.sum("is_c").alias("nc"),
        )
    )
    spine = (
        hist.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(1, _PSI_BINS + 1).select(
                F.col("id").alias("bin_id")
            )
        )
    )
    filled = spine.join(hist, ["event_type", "bin_id"], "left").select(
        "event_type",
        "bin_id",
        F.coalesce("nb", F.lit(0)).alias("nb"),
        F.coalesce("nc", F.lit(0)).alias("nc"),
    )
    packed = filled.groupBy("event_type").agg(
        F.sum("nb").alias("n_base"),
        F.sum("nc").alias("n_curr"),
        F.sort_array(F.collect_list(F.struct("bin_id", "nb", "nc"))).alias(
            "bins"
        ),
    )
    tb = F.col("n_base").cast("double")
    tc = F.col("n_curr").cast("double")

    def term(x):
        pb = (x["nb"].cast("double") + F.lit(0.5)) / (tb + F.lit(12.0))
        pc = (x["nc"].cast("double") + F.lit(0.5)) / (tc + F.lit(12.0))
        return (pc - pb) * F.log(pc / pb)

    return packed.select(
        "event_type",
        "n_base",
        "n_curr",
        F.aggregate(
            "bins", F.lit(0.0), lambda acc, x: acc + term(x)
        ).alias("psi"),
    ).orderBy("event_type")


# --- Kaplan-Meier time-to-conversion survival ---------------------------------

_KM_HOUR_US = 3600000000  # one hour in exact integer microseconds

_KM_SQL = f"""
WITH RECURSIVE mic AS (
    SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
u AS (
    SELECT user_id, MIN(us) AS t0, MAX(us) AS tl,
           MIN(CASE WHEN event_type = 'purchase' THEN us END) AS tp
    FROM mic GROUP BY user_id
),
d AS (
    SELECT (COALESCE(tp, tl) - t0) // {_KM_HOUR_US} AS dur,
           (tp IS NOT NULL) AS died
    FROM u
),
hist AS (
    SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS deaths
    FROM d GROUP BY dur
),
risk AS (
    SELECT dur, deaths,
           CAST(SUM(n_all) OVER (
               ORDER BY dur DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS at_risk
    FROM hist
),
steps AS (
    SELECT ROW_NUMBER() OVER (ORDER BY dur) AS rn, dur, deaths, at_risk
    FROM risk WHERE deaths > 0
),
km AS (
    SELECT rn, dur, deaths, at_risk,
           1.0 * (1.0 - CAST(deaths AS DOUBLE) / CAST(at_risk AS DOUBLE)) AS surv
    FROM steps WHERE rn = 1
    UNION ALL
    SELECT s.rn, s.dur, s.deaths, s.at_risk,
           km.surv * (1.0 - CAST(s.deaths AS DOUBLE) / CAST(s.at_risk AS DOUBLE))
    FROM km JOIN steps s ON s.rn = km.rn + 1
)
SELECT dur AS dur_h, at_risk, deaths, surv FROM km ORDER BY dur_h
""".strip()


@query("km_time_to_purchase", oracle=_KM_SQL)
def km_time_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase (hours from
    a user's first event), right-censoring non-purchasers at their last
    observed event — the retention/conversion estimator, computed
    engine-exactly. Durations are exact integer hours (microsecond
    subtraction + integer division — no float time math); the at-risk
    counts are an integer suffix sum over the duration histogram
    (DOMAIN-bounded by the observation window in hours, never by
    users); and the survival product — the one order-sensitive float
    chain — is forced into the SAME left-to-right multiply sequence in
    both engines: the oracle walks the steps with a RECURSIVE CTE
    (surv_k = surv_{{k-1}} * (1 - d_k/n_k)), the engine left-folds the
    step array (``F.aggregate`` over the sorted collected steps,
    seeded 1.0), so both execute the identical IEEE op sequence. One
    user-keyed shuffle is the only data-sized work; every later stage
    is bounded by distinct death-hours."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    u = ev.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.max(us).alias("tl"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("tp"),
    )
    d = u.select(
        F.expr(f"(coalesce(tp, tl) - t0) div {_KM_HOUR_US}").alias("dur"),
        F.col("tp").isNotNull().alias("died"),
    )
    hist = d.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.when(F.col("died"), 1).otherwise(0)).alias("deaths"),
    )
    # suffix sum over the window-bounded histogram (<= observation hours
    # rows — the equi-depth bounded-window discipline)
    w = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = hist.withColumn("at_risk", F.sum("n_all").over(w)).filter(
        F.col("deaths") > 0
    )
    packed = risk.agg(
        F.sort_array(
            F.collect_list(F.struct("dur", "deaths", "at_risk"))
        ).alias("arr")
    )
    surv = F.aggregate(
        "arr",
        F.array().cast("array<double>"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(1.0))
                * (
                    F.lit(1.0)
                    - x["deaths"].cast("double")
                    / x["at_risk"].cast("double")
                )
            ),
        ),
    )
    zipped = packed.select(
        F.posexplode(F.arrays_zip(F.col("arr"), surv.alias("surv_arr")))
    )
    return zipped.select(
        F.col("col.arr.dur").alias("dur_h"),
        F.col("col.arr.at_risk").alias("at_risk"),
        F.col("col.arr.deaths").alias("deaths"),
        F.col("col.surv_arr").alias("surv"),
    ).orderBy("dur_h")


# --- Poisson bootstrap confidence intervals -----------------------------------

_BOOT_B = 16
_BOOT_SEED = "boot#"
#: Poisson(1) inverse-CDF thresholds (cumulative e^-1 * sum 1/k!), pinned
#: as the IDENTICAL double literals in both engines so the weight CASE
#: chain can never disagree.
_BOOT_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)
_BOOT_DENOM = 16 ** 15

_BOOT_HEX15 = " + ".join(
    _HEXD.format(
        m="md5('boot#' || CAST(event_id AS VARCHAR) || '#' || CAST(rep AS VARCHAR))",
        p=p,
    )
    + f" * {16 ** (15 - p)}"
    for p in range(1, 16)
)

_BOOT_W = (
    "CASE "
    + " ".join(
        f"WHEN u < {c!r} THEN {k}" for k, c in enumerate(_BOOT_CDF)
    )
    + f" ELSE {len(_BOOT_CDF)} END"
)

_BOOT_SQL = f"""
WITH reps AS (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS rep),
weighted AS (
    SELECT e.event_type, r.rep,
           CAST(FLOOR(e.value * 10000 + 0.5) AS BIGINT) AS vu,
           ({_BOOT_HEX15}) / CAST({_BOOT_DENOM} AS DOUBLE) AS u
    FROM (SELECT event_type, event_id, value FROM events) e, reps r
),
sums AS (
    SELECT event_type, rep,
           CAST(SUM(w * vu) AS BIGINT) AS wnum,
           CAST(SUM(w) AS BIGINT) AS wden,
           CAST(SUM(vu) AS BIGINT) AS rawsum,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM (SELECT event_type, rep, vu, {_BOOT_W} AS w FROM weighted)
    GROUP BY event_type, rep
),
means AS (
    SELECT event_type, rep, rawsum, n_rows,
           CAST(wnum AS DOUBLE) / CAST(NULLIF(wden, 0) AS DOUBLE) / 10000.0 AS m,
           ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY CAST(wnum AS DOUBLE) / CAST(NULLIF(wden, 0) AS DOUBLE), rep
           ) AS rn
    FROM sums
)
SELECT event_type,
       MAX(CASE WHEN rep = 0 THEN n_rows END) AS n,
       MAX(CASE WHEN rep = 0 THEN CAST(rawsum AS DOUBLE) / CAST(n_rows AS DOUBLE) / 10000.0 END) AS mean_value,
       MAX(CASE WHEN rn = 2 THEN m END) AS ci_lo,
       MAX(CASE WHEN rn = {_BOOT_B - 1} THEN m END) AS ci_hi
FROM means
GROUP BY event_type
ORDER BY event_type
""".strip()


@query("bootstrap_ci_value_by_type", oracle=_BOOT_SQL)
def bootstrap_ci_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for the mean event value per
    type — the resampling scheme built FOR distributed engines (Chamandy
    et al. 2012, "Estimating uncertainty for massive data streams":
    multinomial resampling is unshardable, but Poisson(1) per-row
    weights need no coordination at all). Derandomized end to end: each
    (row, replicate) weight is the Poisson(1) inverse CDF applied to
    the engine's seeded-md5 uniform (15 hex digits / 16^15 — both
    engines round the same 60-bit integer to the same double), with
    the CDF thresholds pinned as identical literals, so every one of
    the B={_BOOT_B} replicate worlds is bit-reproducible in either
    engine. All replicate sums are exact int64 (weights <= 6, values
    in 1e-4 units); the only float ops are one division per replicate
    mean and the final /1e4. The CI is the 2nd/15th order statistic
    of the 16 replicate means (~87.5% central coverage — B is
    registry-sized for oracle replay; production would raise B, the
    plan is B-linear). ONE data-sized aggregate on (type, replicate)
    with map-side combine; everything after is B x types rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("vu"),
    )
    reps = spark.range(0, _BOOT_B).select(F.col("id").alias("rep"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(_BOOT_SEED),
                        F.col("event_id").cast("string"),
                        F.lit("#"),
                        F.col("rep").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(_BOOT_DENOM))
    )
    w = F.lit(len(_BOOT_CDF))
    for k in range(len(_BOOT_CDF) - 1, -1, -1):
        w = F.when(F.col("u") < F.lit(_BOOT_CDF[k]), F.lit(k)).otherwise(w)
    sums = (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("u", u)
        .withColumn("w", w.cast("long"))
        .groupBy("event_type", "rep")
        .agg(
            F.sum(F.col("w") * F.col("vu")).alias("wnum"),
            F.sum("w").alias("wden"),
            F.sum("vu").alias("rawsum"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    m = (
        F.col("wnum").cast("double")
        / F.nullif(F.col("wden"), F.lit(0)).cast("double")
        / F.lit(10000.0)
    )
    packed = (
        sums.withColumn("m", m)
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("rep") == 0, F.col("n_rows"))).alias("n"),
            F.max(
                F.when(
                    F.col("rep") == 0,
                    F.col("rawsum").cast("double")
                    / F.col("n_rows").cast("double")
                    / F.lit(10000.0),
                )
            ).alias("mean_value"),
            F.sort_array(F.collect_list(F.struct("m", "rep"))).alias(
                "ms"
            ),
        )
    )
    return packed.select(
        "event_type",
        "n",
        "mean_value",
        F.element_at("ms", 2)["m"].alias("ci_lo"),
        F.element_at("ms", _BOOT_B - 1)["m"].alias("ci_hi"),
    ).orderBy("event_type")


# --- data-quality expectation suite -------------------------------------------

_DQ_TYPES = "('click', 'error', 'purchase', 'signup', 'view')"
_DQ_VALUE_MAX_C = 40000  # 400.00 in exact cents

_DQ_SQL = f"""
WITH checks AS (
    SELECT 'events_type_accepted' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN event_type IN {_DQ_TYPES} THEN 0 ELSE 1 END)
                AS BIGINT) AS n_violations
    FROM events
    UNION ALL
    SELECT 'events_value_in_range',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) < 0
                           OR CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                              > {_DQ_VALUE_MAX_C}
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'lineitem_discount_in_range',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) < 0
                           OR CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) > 10
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_quantity_in_range',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders_custkey_not_null',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_ri_customer',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
           CAST(COUNT(*) AS BIGINT)
    FROM orders o
    WHERE o.o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'orders_orderkey_unique',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
)
SELECT check_name, n_total, n_violations,
       (n_violations = 0) AS passed
FROM checks
ORDER BY check_name
""".strip()


@query("data_quality_expectations", oracle=_DQ_SQL)
def data_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite — the Deequ /
    Great-Expectations check class (Schelter et al., VLDB 2018) run as
    ONE relational plan: accepted-values and range constraints as
    conditional aggregates (ranges compared in exact cents so a float
    boundary can never flip a verdict), NOT-NULL and uniqueness as
    count deltas, and referential integrity orders->customer as a
    broadcast ANTI join. Each check scans only its own pruned columns;
    all counts exact int64; `passed` derives from the violation count
    in both engines. The suite intentionally includes a FAILING check
    on the driver corpus (one event value above the 400.00 range cap)
    so the report shape covers both verdicts."""
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def check(name, df, viol_col):
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum(viol_col).alias("n_violations"),
        )

    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    dc = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    types = ["click", "error", "purchase", "signup", "view"]
    checks = [
        check(
            "events_type_accepted",
            ev,
            F.when(F.col("event_type").isin(types), 0).otherwise(1),
        ),
        check(
            "events_value_in_range",
            ev,
            F.when(
                (vc < 0) | (vc > _DQ_VALUE_MAX_C), 1
            ).otherwise(0),
        ),
        check(
            "lineitem_discount_in_range",
            li,
            F.when((dc < 0) | (dc > 10), 1).otherwise(0),
        ),
        check(
            "lineitem_quantity_in_range",
            li,
            F.when(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
            ).otherwise(0),
        ),
        check(
            "orders_custkey_not_null",
            orders,
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0),
        ),
    ]
    n_orders = orders.agg(
        F.count(F.lit(1)).alias("n_total")
    )
    ri = (
        orders.filter(F.col("o_custkey").isNotNull())
        .join(
            F.broadcast(cust.select("c_custkey")),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.lit("orders_custkey_ri_customer").alias("check_name"),
            "n_total",
            "n_violations",
        )
    )
    uniq = orders.agg(
        F.lit("orders_orderkey_unique").alias("check_name"),
        F.count(F.lit(1)).alias("n_total"),
        (
            F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))
        ).alias("n_violations"),
    )
    out = checks[0]
    for c in checks[1:] + [ri, uniq]:
        out = out.unionByName(c)
    return out.select(
        "check_name",
        "n_total",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check_name")


# --- Markov next-event backtest -----------------------------------------------

_MBT_SQL = """
WITH seq AS (
    SELECT user_id, event_type AS to_type,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS from_type
    FROM events
),
trans AS (
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE from_type IS NOT NULL
    GROUP BY from_type, to_type
),
pred AS (
    SELECT from_type, to_type AS predicted
    FROM (
        SELECT from_type, to_type,
               ROW_NUMBER() OVER (
                   PARTITION BY from_type ORDER BY n DESC, to_type
               ) AS rnk
        FROM trans
    ) WHERE rnk = 1
)
SELECT s.from_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(SUM(CASE WHEN s.to_type = p.predicted THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN s.to_type = p.predicted THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS accuracy,
       MAX(p.predicted) AS predicted
FROM seq s JOIN pred p ON p.from_type = s.from_type
WHERE s.from_type IS NOT NULL
GROUP BY s.from_type
ORDER BY s.from_type
""".strip()


@query("markov_backtest_accuracy", oracle=_MBT_SQL)
def markov_backtest_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the first-order Markov behavioral model that
    `event_transition_matrix` fits: score the top-1 next-event
    prediction (argmax transition per from-state, ties broken by type
    name) against every observed transition, per from-state — the
    in-engine model-evaluation loop (fit -> predict -> score) that
    turns the transition matrix from a descriptive artifact into a
    measured predictor. In-sample by construction and documented as
    such (the honest baseline every backtest starts from; the
    group-k-fold split is the held-out companion). One user-keyed
    window shuffle is the only data-sized work; the model and its
    argmax are 25-row objects broadcast back onto the transition
    stream; counts exact int64, accuracy one double division."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_pred = Window.partitionBy("from_type").orderBy(
        F.desc("n"), "to_type"
    )
    pred = (
        trans.withColumn("rnk", F.row_number().over(w_pred))
        .filter(F.col("rnk") == 1)
        .select("from_type", F.col("to_type").alias("predicted"))
    )
    hit = F.when(F.col("to_type") == F.col("predicted"), 1).otherwise(0)
    return (
        seq.join(F.broadcast(pred), "from_type")
        .groupBy("from_type")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum(hit).alias("n_hits"),
            (
                F.sum(hit).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("accuracy"),
            F.max("predicted").alias("predicted"),
        )
        .orderBy("from_type")
    )


# --- exact two-sample Kolmogorov-Smirnov test ----------------------------------

_KS_SQL = """
WITH hist AS (
    SELECT event_type,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cent,
           CAST(SUM(CASE WHEN ISODOW(ts) >= 6 THEN 0 ELSE 1 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN ISODOW(ts) >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS nb
    FROM events
    GROUP BY event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
),
cum AS (
    SELECT event_type, cent,
           CAST(SUM(na) OVER w AS BIGINT) AS ca,
           CAST(SUM(nb) OVER w AS BIGINT) AS cb,
           CAST(SUM(na) OVER (PARTITION BY event_type) AS BIGINT) AS ta,
           CAST(SUM(nb) OVER (PARTITION BY event_type) AS BIGINT) AS tb
    FROM hist
    WINDOW w AS (PARTITION BY event_type ORDER BY cent
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
gaps AS (
    SELECT event_type, cent, ta, tb,
           ABS(CAST(ca AS DECIMAL(38, 0)) * CAST(tb AS DECIMAL(38, 0))
               - CAST(cb AS DECIMAL(38, 0)) * CAST(ta AS DECIMAL(38, 0)))
               AS gap
    FROM cum
),
mx AS (
    SELECT event_type, MAX(gap) AS max_gap
    FROM gaps GROUP BY event_type
)
SELECT g.event_type,
       MAX(g.ta) AS n_base, MAX(g.tb) AS n_curr,
       CAST(MAX(g.gap) AS DOUBLE)
       / (CAST(MAX(g.ta) AS DOUBLE) * CAST(MAX(g.tb) AS DOUBLE)) AS ks_stat,
       MIN(g.cent) AS argmax_cent
FROM gaps g JOIN mx m
  ON m.event_type = g.event_type AND g.gap = m.max_gap
GROUP BY g.event_type
ORDER BY g.event_type
""".strip()


@query("ks_test_weekend_value", oracle=_KS_SQL)
def ks_test_weekend_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic — weekday vs
    weekend value distribution per event type, the nonparametric
    companion to the PSI drift audit (PSI summarizes binned divergence;
    KS finds the single worst ECDF gap and WHERE it occurs). Exactness
    at any scale: the ECDF difference is compared as the
    cross-multiplied integer |ca*tb - cb*ta| in DECIMAL(38,0) — no
    float enters until the final division — so the argmax cent and the
    max gap are exact even where two gaps differ by one part in 1e18
    (the seam a double ECDF would blur); the candidate cut points are
    the merged support (cents present in either sample — the gap is
    constant between support points, so nothing is missed); the
    cumulative runs over the DOMAIN-bounded cent histogram
    (equi-depth discipline). One conditional aggregate is the only
    data-sized work."""
    ev = load_table(spark, sf_dir, "events")
    wknd = F.weekday(F.col("ts")) >= 5
    hist = (
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cent"),
            F.when(wknd, 1).otherwise(0).alias("is_b"),
        )
        .groupBy("event_type", "cent")
        .agg(
            F.sum(F.lit(1) - F.col("is_b")).alias("na"),
            F.sum("is_b").alias("nb"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cent")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    dec = "decimal(38,0)"
    cum = hist.select(
        "event_type",
        "cent",
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
        F.sum("na").over(wt).alias("ta"),
        F.sum("nb").over(wt).alias("tb"),
    )
    # materialize the DOMAIN-bounded gap table (<= types x distinct
    # cents rows) so the max-gap branch reads it instead of re-running
    # the events scan — one data-sized pass total
    gaps = cum.select(
        "event_type",
        "cent",
        "ta",
        "tb",
        F.abs(
            F.col("ca").cast(dec) * F.col("tb").cast(dec)
            - F.col("cb").cast(dec) * F.col("ta").cast(dec)
        ).alias("gap"),
    ).localCheckpoint()
    mx = (
        gaps.groupBy("event_type")
        .agg(F.max("gap").alias("max_gap"))
        .select(F.col("event_type").alias("mx_type"), "max_gap")
    )
    return (
        gaps.join(
            F.broadcast(mx),
            (F.col("event_type") == F.col("mx_type"))
            & (F.col("gap") == F.col("max_gap")),
        )
        .groupBy("event_type")
        .agg(
            F.max("ta").alias("n_base"),
            F.max("tb").alias("n_curr"),
            (
                F.max("gap").cast("double")
                / (
                    F.max("ta").cast("double")
                    * F.max("tb").cast("double")
                )
            ).alias("ks_stat"),
            F.min("cent").alias("argmax_cent"),
        )
        .orderBy("event_type")
    )


# --- chi-squared independence test --------------------------------------------

_CHI2_SQL = """
WITH RECURSIVE cells AS (
    SELECT event_type,
           CAST(ISODOW(ts) AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS obs
    FROM events
    GROUP BY event_type, CAST(ISODOW(ts) AS BIGINT)
),
dims AS (
    SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
           CAST(COUNT(DISTINCT dow) AS BIGINT) AS c,
           CAST(SUM(obs) AS BIGINT) AS n
    FROM cells
),
tot AS (
    SELECT event_type, dow, obs,
           CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
           CAST(SUM(obs) OVER (PARTITION BY dow) AS BIGINT) AS ct
    FROM cells
),
walk AS (
    SELECT event_type, dow, obs, rt, ct,
           ROW_NUMBER() OVER (ORDER BY event_type, dow) AS rn
    FROM tot
),
folded AS (
    SELECT w.rn,
           0.0 + (CAST(w.obs AS DOUBLE)
                  - CAST(w.rt AS DOUBLE) * CAST(w.ct AS DOUBLE)
                    / CAST(d.n AS DOUBLE))
               * (CAST(w.obs AS DOUBLE)
                  - CAST(w.rt AS DOUBLE) * CAST(w.ct AS DOUBLE)
                    / CAST(d.n AS DOUBLE))
               / (CAST(w.rt AS DOUBLE) * CAST(w.ct AS DOUBLE)
                  / CAST(d.n AS DOUBLE)) AS chi2
    FROM walk w, dims d WHERE w.rn = 1
    UNION ALL
    SELECT w.rn,
           f.chi2 + (CAST(w.obs AS DOUBLE)
                     - CAST(w.rt AS DOUBLE) * CAST(w.ct AS DOUBLE)
                       / CAST((SELECT n FROM dims) AS DOUBLE))
               * (CAST(w.obs AS DOUBLE)
                  - CAST(w.rt AS DOUBLE) * CAST(w.ct AS DOUBLE)
                    / CAST((SELECT n FROM dims) AS DOUBLE))
               / (CAST(w.rt AS DOUBLE) * CAST(w.ct AS DOUBLE)
                  / CAST((SELECT n FROM dims) AS DOUBLE))
    FROM folded f JOIN walk w ON w.rn = f.rn + 1
)
SELECT d.n AS n_events, d.r AS n_types, d.c AS n_days,
       (d.r - 1) * (d.c - 1) AS dof,
       (SELECT chi2 FROM folded ORDER BY rn DESC LIMIT 1) AS chi2
FROM dims d
""".strip()


@query("chi2_type_dow_independence", oracle=_CHI2_SQL)
def chi2_type_dow_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared test of independence between event type and
    day-of-week — the contingency-table classic completing the
    statistics family (PSI summarizes drift, KS localizes it, chi2
    tests the categorical factorization, bootstrap/CUPED quantify
    uncertainty). Observed counts are exact int64 from ONE map-side
    combined aggregate; expected counts and per-cell terms are double
    expressions written identically in both engines; and the
    cells-count reduction (types x 7 terms) — the one order-sensitive
    float sum — runs as the same (type, dow)-ordered left-to-right
    chain on both sides, seeded 0.0 (engine: sorted-array fold;
    oracle: RECURSIVE CTE walk). Everything after the first aggregate
    touches <= types x 7 rows."""
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type",
            (F.weekday(F.col("ts")) + 1).cast("long").alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("dow")
    tot = cells.select(
        "event_type",
        "dow",
        "obs",
        F.sum("obs").over(wr).alias("rt"),
        F.sum("obs").over(wc).alias("ct"),
    )
    packed = tot.groupBy().agg(
        F.sum("obs").alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
        F.count_distinct("dow").alias("n_days"),
        F.sort_array(
            F.collect_list(F.struct("event_type", "dow", "obs", "rt", "ct"))
        ).alias("arr"),
    )

    def step(n):
        def inner(acc, x):
            e = (
                x["rt"].cast("double")
                * x["ct"].cast("double")
                / n.cast("double")
            )
            d = x["obs"].cast("double") - e
            return acc + d * d / e

        return inner

    return packed.select(
        "n_events",
        "n_types",
        "n_days",
        ((F.col("n_types") - 1) * (F.col("n_days") - 1)).alias("dof"),
        F.aggregate("arr", F.lit(0.0), step(F.col("n_events"))).alias(
            "chi2"
        ),
    )


# --- minimum-detectable-effect power analysis -----------------------------------

#: Two-sided alpha=0.05 and power=0.80 normal quantiles, pinned as the
#: identical double literals both engines parse (z_{0.975}, z_{0.80}).
_MDE_Z_ALPHA = 1.959963984540054
_MDE_Z_BETA = 0.8416212335729143

_MDE_SQL = f"""
WITH m AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
           CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)
                    * CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS s2
    FROM events
    GROUP BY event_type
)
SELECT event_type, n,
       (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / 10000.0 AS mean_value,
       (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / 100000000.0 AS variance,
       (CAST({_MDE_Z_ALPHA!r} AS DOUBLE) + CAST({_MDE_Z_BETA!r} AS DOUBLE))
       * sqrt(2.0 * ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                     / 100000000.0)
              / (CAST(n AS DOUBLE) / 2.0)) AS mde_abs
FROM m
ORDER BY event_type
""".strip()


@query("mde_power_analysis", oracle=_MDE_SQL)
def mde_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect for a 50/50 A/B split on mean event
    value, per event type (alpha=0.05 two-sided, power=0.80) — the
    experiment-planning number CUPED's variance reduction feeds into,
    closing the experimentation family loop (plan -> run -> de-noise ->
    decide). MDE = (z_a + z_b) * sqrt(2*var / (n/2)) with the normal
    quantiles pinned as identical double literals, the population
    moments exact int64 (the CUPED/OLS moments-sketch discipline), and
    sqrt — IEEE-754 correctly rounded, unlike the transcendentals — the
    only non-arithmetic op, so both engines produce bit-identical
    numbers with zero libm exposure. One map-side-combined aggregate;
    post-agg work is types-bounded."""
    ev = load_table(spark, sf_dir, "events")
    vu = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vu).alias("s1"),
        F.sum(vu * vu).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mean_u = F.col("s1").cast("double") / nd
    var_u = F.col("s2").cast("double") / nd - mean_u * mean_u
    var_v = var_u / F.lit(100000000.0)
    return m.select(
        "event_type",
        "n",
        (mean_u / F.lit(10000.0)).alias("mean_value"),
        var_v.alias("variance"),
        (
            (F.lit(_MDE_Z_ALPHA) + F.lit(_MDE_Z_BETA))
            * F.sqrt(F.lit(2.0) * var_v / (nd / F.lit(2.0)))
        ).alias("mde_abs"),
    ).orderBy("event_type")

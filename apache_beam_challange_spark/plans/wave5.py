"""Round-9 continuation wave: the experiment-analysis and evaluation
operators that sit downstream of the engine's curation/feature stages —
classical hypothesis tests (one-way ANOVA, Kruskal-Wallis, log-rank),
survival hazards (Nelson-Aalen), market-concentration and inequality
indices (HHI, Theil), causal stratification (binned ATE), calibration
(ECE, isotonic regression), ranking metrics (average precision), corpus
power laws (Zipf fit), lagged cross-correlation, data attribution
(leave-one-group-out slope influence), and multiple-testing control
(Benjamini-Hochberg).

Every query keeps the repo's oracle discipline (see ``wave4``): exact
integer / DECIMAL(38,0) arithmetic for all data-sized accumulations,
histograms bounded by the VALUE DOMAIN (cent buckets, hours, bins) and
never by row count, and at most a handful of IEEE-exact double
operations at the very end — written as the IDENTICAL expression in
both engines so the value hash matches bit-for-bit.  Where a float must
be summed across an unbounded number of terms, each term is converted
to fixed point (``FLOOR(x * 1e6 + 0.5)``) BEFORE the sum, the
``curation.py`` ln-fixed-point discipline, so associativity cannot
leak.

Reference parity: none of these exist in the reference (a 4-pipeline
Beam take-home, reference repo ``main.py``/notebooks); they extend the
SURVEY.md §2.9 training-data / experimentation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apache_beam_challange_spark.plans.registry import query
from apache_beam_challange_spark.sources.catalog import load_table

#: Fixed-point scale for per-term float -> integer conversion before
#: data-sized sums (the curation.py:650 discipline).
_FP = 1_000_000.0


# --- one-way ANOVA (value by event type) --------------------------------------

_ANOVA_SQL = """
WITH g AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS s,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                    * CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS q
    FROM events GROUP BY 1
),
t AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n_all,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(s) AS DECIMAL(38,0)) AS s_all,
           CAST(SUM(q) AS DECIMAL(38,0)) AS q_all,
           CAST(SUM(CAST(FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                / CAST(n AS DOUBLE) * 1000000.0 + 0.5)
                         AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS a_fp
    FROM g
)
SELECT n_all AS n, k AS n_groups,
       ROUND(((CAST(a_fp AS DOUBLE) / 1000000.0
               - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                 / CAST(n_all AS DOUBLE))
              / CAST(k - 1 AS DOUBLE))
             / ((CAST(q_all AS DOUBLE) - CAST(a_fp AS DOUBLE) / 1000000.0)
                / CAST(n_all - k AS DOUBLE)), 6) AS f_stat,
       ROUND((CAST(a_fp AS DOUBLE) / 1000000.0
              - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                / CAST(n_all AS DOUBLE))
             / (CAST(q_all AS DOUBLE)
                - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                  / CAST(n_all AS DOUBLE)), 6) AS eta_sq
FROM t
""".strip()


@query("anova_f_value_by_type", oracle=_ANOVA_SQL)
def anova_f_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean ``value`` differ across event types?
    The F statistic and the eta-squared effect size from ONE map-side-
    combined aggregate over cent-exact values — group count/sum/
    sum-of-squares are exact integers (DECIMAL(38,0) so the bound holds
    past sf100), the k<=|event types| between-group terms ``s_g^2/n_g``
    are fixed-pointed (1e-6) BEFORE the cross-group sum so neither
    engine's addition order can differ, and F / eta^2 are one identical
    double expression each, ROUND 6. No window, no join: the only
    data-sized work is the single aggregate; everything after is
    k-bounded."""
    ev = load_table(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    g = ev.select(F.col("event_type"), v.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("decimal(38,0)").alias("q"),
    )
    term_fp = F.floor(
        F.col("s").cast("double") * F.col("s").cast("double")
        / F.col("n").cast("double") * F.lit(_FP)
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    t = g.agg(
        F.sum("n").cast("long").alias("n_all"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("s").cast("decimal(38,0)").alias("s_all"),
        F.sum("q").cast("decimal(38,0)").alias("q_all"),
        F.sum(term_fp).cast("decimal(38,0)").alias("a_fp"),
    )
    a = F.col("a_fp").cast("double") / F.lit(_FP)
    grand = (
        F.col("s_all").cast("double")
        * F.col("s_all").cast("double")
        / F.col("n_all").cast("double")
    )
    ssb = a - grand
    ssw = F.col("q_all").cast("double") - a
    sst = F.col("q_all").cast("double") - grand
    return t.select(
        F.col("n_all").alias("n"),
        F.col("k").alias("n_groups"),
        F.round(
            (ssb / (F.col("k") - F.lit(1)).cast("double"))
            / (ssw / (F.col("n_all") - F.col("k")).cast("double")),
            6,
        ).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_sq"),
    )


# --- Kruskal-Wallis H (rank ANOVA, tie-corrected) -----------------------------

_KW_SQL = """
WITH cells AS (
    SELECT event_type AS t, CAST(FLOOR(value * 100) AS BIGINT) AS vb,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
buckets AS (SELECT vb, CAST(SUM(c) AS BIGINT) AS nb FROM cells GROUP BY 1),
ranked AS (
    SELECT vb, nb,
           2 * CAST(COALESCE(SUM(nb) OVER (
               ORDER BY vb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) + nb + 1 AS r2
    FROM buckets
),
grp AS (
    SELECT cells.t,
           CAST(SUM(c) AS BIGINT) AS n_g,
           CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(r2 AS DECIMAL(38,0)))
                AS DECIMAL(38,0)) AS r2sum
    FROM cells JOIN ranked ON cells.vb = ranked.vb
    GROUP BY 1
),
ties AS (
    SELECT CAST(SUM(CAST(nb AS DECIMAL(38,0)) * CAST(nb AS DECIMAL(38,0))
                   * CAST(nb AS DECIMAL(38,0))
                   - CAST(nb AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tie_t
    FROM buckets
),
agg AS (
    SELECT CAST(SUM(n_g) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(CAST(FLOOR(CAST(r2sum AS DOUBLE) * CAST(r2sum AS DOUBLE)
                                / CAST(n_g AS DOUBLE) * 1000000.0 + 0.5)
                         AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS h_fp
    FROM grp
)
SELECT n, k,
       ROUND(3.0 * (CAST(h_fp AS DOUBLE) / 1000000.0)
                 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
             - 3.0 * CAST(n + 1 AS DOUBLE), 6) AS h_stat,
       ROUND(1.0 - CAST(tie_t AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    - CAST(n AS DOUBLE)), 9) AS tie_c,
       ROUND((3.0 * (CAST(h_fp AS DOUBLE) / 1000000.0)
                  / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
              - 3.0 * CAST(n + 1 AS DOUBLE))
             / (1.0 - CAST(tie_t AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                       * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6)
           AS h_corrected
FROM agg, ties
""".strip()


@query("kruskal_wallis_value_by_type", oracle=_KW_SQL)
def kruskal_wallis_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test (the rank ANOVA twin of
    ``anova_f_value_by_type`` — distribution-free, so it survives the
    heavy-tailed values that break F's normality assumption) with the
    exact tie correction. Midranks come from the cent-bucket histogram
    (VALUE-DOMAIN bounded, the ``mann_whitney`` argument): doubled
    midranks ``2r = 2*cum_below + n_b + 1`` are integers, per-group
    doubled-rank sums stay exact in DECIMAL(38,0), the k per-group
    ``R_g^2/n_g`` terms are fixed-pointed before the cross-group sum
    (H = 12/(N(N+1)) sum R_g^2/n_g - 3(N+1), and 12*(R)^2 = 3*(2R)^2),
    and the tie term ``sum(t_b^3 - t_b)`` is an exact integer. One
    data-sized aggregate + two domain-bounded stages."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("t"),
        F.floor(F.col("value") * 100).cast("long").alias("vb"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    buckets = cells.groupBy("vb").agg(F.sum("c").cast("long").alias("nb"))
    w = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, -1)
    ranked = buckets.select(
        "vb",
        "nb",
        (
            F.lit(2) * F.coalesce(F.sum("nb").over(w), F.lit(0)).cast("long")
            + F.col("nb")
            + F.lit(1)
        ).alias("r2"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    grp = (
        cells.join(ranked.select("vb", "r2"), "vb")
        .groupBy("t")
        .agg(
            F.sum("c").cast("long").alias("n_g"),
            F.sum(dec("c") * dec("r2")).cast("decimal(38,0)").alias("r2sum"),
        )
    )
    ties = buckets.agg(
        F.sum(dec("nb") * dec("nb") * dec("nb") - dec("nb"))
        .cast("decimal(38,0)")
        .alias("tie_t")
    )
    term_fp = F.floor(
        F.col("r2sum").cast("double") * F.col("r2sum").cast("double")
        / F.col("n_g").cast("double") * F.lit(_FP)
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    agg = grp.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(term_fp).cast("decimal(38,0)").alias("h_fp"),
    )
    nD = F.col("n").cast("double")
    h = (
        F.lit(3.0) * (F.col("h_fp").cast("double") / F.lit(_FP))
        / (nD * (nD + F.lit(1.0)))
        - F.lit(3.0) * (nD + F.lit(1.0))
    )
    tie_c = F.lit(1.0) - F.col("tie_t").cast("double") / (nD * nD * nD - nD)
    return agg.crossJoin(F.broadcast(ties)).select(
        "n",
        "k",
        F.round(h, 6).alias("h_stat"),
        F.round(tie_c, 9).alias("tie_c"),
        F.round(h / tie_c, 6).alias("h_corrected"),
    )


# --- Nelson-Aalen cumulative hazard (time to first purchase) ------------------

_NA_HOUR_US = 3600000000

_NA_SQL = f"""
WITH mic AS (
    SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
u AS (
    SELECT user_id, MIN(us) AS t0, MAX(us) AS tl,
           MIN(CASE WHEN event_type = 'purchase' THEN us END) AS tp
    FROM mic GROUP BY user_id
),
d AS (
    SELECT (COALESCE(tp, tl) - t0) // {_NA_HOUR_US} AS dur,
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
)
SELECT dur AS dur_h, at_risk, deaths,
       CAST(SUM((deaths * 1000000000) // at_risk) OVER (
           ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / 1000000000.0 AS cum_hazard
FROM risk WHERE deaths > 0 ORDER BY dur_h
""".strip()


@query("nelson_aalen_hazard_to_purchase", oracle=_NA_SQL)
def nelson_aalen_hazard_to_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nelson-Aalen cumulative hazard for time-to-first-purchase — the
    estimator-of-choice twin of ``km_time_to_purchase`` (hazard SUMS
    instead of survival PRODUCTS, so unlike KM it needs no ordered float
    chain at all): each step's ``d_i/n_i`` becomes the exact integer
    ``(d*1e9) div n`` (integer division — zero float error, zero
    association sensitivity), the running hazard is a BIGINT prefix sum
    over the duration histogram (DOMAIN-bounded by the observation
    window in hours), and the single double division happens per output
    row. One user-keyed shuffle is the only data-sized work. Durations
    and censoring exactly as in KM (audit.py) so the two curves are
    directly comparable."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    u = ev.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.max(us).alias("tl"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("tp"),
    )
    d = u.select(
        F.expr(f"(coalesce(tp, tl) - t0) div {_NA_HOUR_US}").alias("dur"),
        F.col("tp").isNotNull().alias("died"),
    )
    hist = d.groupBy("dur").agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum(F.when(F.col("died"), 1).otherwise(0)).cast("long").alias("deaths"),
    )
    w_risk = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = hist.withColumn(
        "at_risk", F.sum("n_all").over(w_risk).cast("long")
    ).filter(F.col("deaths") > 0)
    w_cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    step = F.expr("(deaths * 1000000000) div at_risk")
    return risk.select(
        F.col("dur").alias("dur_h"),
        "at_risk",
        "deaths",
        (
            F.sum(step).over(w_cum).cast("double") / F.lit(1_000_000_000.0)
        ).alias("cum_hazard"),
    ).orderBy("dur_h")


# --- log-rank test (two-cohort survival comparison) ---------------------------

_LOGRANK_SQL = f"""
WITH mic AS (
    SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
u AS (
    SELECT user_id, MIN(us) AS t0, MAX(us) AS tl,
           MIN(CASE WHEN event_type = 'purchase' THEN us END) AS tp
    FROM mic GROUP BY user_id
),
d AS (
    SELECT (COALESCE(tp, tl) - t0) // {_NA_HOUR_US} AS dur,
           (tp IS NOT NULL) AS died,
           user_id % 2 AS grp
    FROM u
),
hist AS (
    SELECT dur,
           CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(SUM(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS deaths,
           CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_all,
           CAST(SUM(CASE WHEN died AND grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS d1
    FROM d GROUP BY dur
),
risk AS (
    SELECT dur, deaths, d1,
           CAST(SUM(n_all) OVER (
               ORDER BY dur DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_risk,
           CAST(SUM(n1_all) OVER (
               ORDER BY dur DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n1_risk
    FROM hist
),
terms AS (
    SELECT d1,
           CAST(FLOOR(CAST(deaths AS DOUBLE) * CAST(n1_risk AS DOUBLE)
                      / CAST(n_risk AS DOUBLE) * 1000000.0 + 0.5)
                AS BIGINT) AS e1_fp,
           CASE WHEN n_risk > 1 THEN
               CAST(FLOOR(CAST(deaths AS DOUBLE)
                          * (CAST(n1_risk AS DOUBLE) / CAST(n_risk AS DOUBLE))
                          * (1.0 - CAST(n1_risk AS DOUBLE)
                                 / CAST(n_risk AS DOUBLE))
                          * (CAST(n_risk - deaths AS DOUBLE)
                             / CAST(n_risk - 1 AS DOUBLE))
                          * 1000000.0 + 0.5) AS BIGINT)
           ELSE 0 END AS v1_fp
    FROM risk WHERE deaths > 0
)
SELECT CAST(SUM(d1) AS BIGINT) AS o1,
       ROUND(CAST(SUM(e1_fp) AS DOUBLE) / 1000000.0, 6) AS e1,
       ROUND(CAST(SUM(v1_fp) AS DOUBLE) / 1000000.0, 6) AS v1,
       ROUND((CAST(SUM(d1) AS DOUBLE)
              - CAST(SUM(e1_fp) AS DOUBLE) / 1000000.0)
             * (CAST(SUM(d1) AS DOUBLE)
                - CAST(SUM(e1_fp) AS DOUBLE) / 1000000.0)
             / (CAST(SUM(v1_fp) AS DOUBLE) / 1000000.0), 6) AS chi2
FROM terms
""".strip()


@query("logrank_purchase_by_parity", oracle=_LOGRANK_SQL)
def logrank_purchase_by_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing time-to-first-purchase between the two
    ``user_id``-parity cohorts (the A/B assignment an experimentation
    stack would hand this engine) — the hypothesis-test companion to the
    KM curve. At every death-hour the hypergeometric expectation
    ``E1 = d * n1/n`` and variance ``V1 = d*(n1/n)*(1-n1/n)*(n-d)/(n-1)``
    are computed from exact integer at-risk suffix sums over the
    duration histogram (DOMAIN-bounded), each term fixed-pointed (1e-6)
    before the cross-step sum, and the chi-square statistic
    ``(O1-E1)^2/V1`` is one identical double expression. Same duration /
    censoring definitions as KM and Nelson-Aalen."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    u = ev.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.max(us).alias("tl"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("tp"),
    )
    d = u.select(
        F.expr(f"(coalesce(tp, tl) - t0) div {_NA_HOUR_US}").alias("dur"),
        F.col("tp").isNotNull().alias("died"),
        (F.col("user_id") % 2).alias("grp"),
    )
    hist = d.groupBy("dur").agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum(F.when(F.col("died"), 1).otherwise(0)).cast("long").alias("deaths"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("n1_all"),
        F.sum(F.when(F.col("died") & (F.col("grp") == 1), 1).otherwise(0))
        .cast("long")
        .alias("d1"),
    )
    w = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = hist.select(
        "dur",
        "deaths",
        "d1",
        F.sum("n_all").over(w).cast("long").alias("n_risk"),
        F.sum("n1_all").over(w).cast("long").alias("n1_risk"),
    ).filter(F.col("deaths") > 0)
    dD = F.col("deaths").cast("double")
    nD = F.col("n_risk").cast("double")
    n1D = F.col("n1_risk").cast("double")
    e1_fp = F.floor(dD * n1D / nD * F.lit(_FP) + F.lit(0.5)).cast("long")
    v1_fp = F.when(
        F.col("n_risk") > 1,
        F.floor(
            dD
            * (n1D / nD)
            * (F.lit(1.0) - n1D / nD)
            * ((nD - dD) / (nD - F.lit(1.0)))
            * F.lit(_FP)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0))
    terms = risk.select(
        F.col("d1"), e1_fp.alias("e1_fp"), v1_fp.alias("v1_fp")
    )
    agg = terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e1_fp").cast("long").alias("e1s"),
        F.sum("v1_fp").cast("long").alias("v1s"),
    )
    o1D = F.col("o1").cast("double")
    e1D = F.col("e1s").cast("double") / F.lit(_FP)
    v1D = F.col("v1s").cast("double") / F.lit(_FP)
    return agg.select(
        "o1",
        F.round(e1D, 6).alias("e1"),
        F.round(v1D, 6).alias("v1"),
        F.round((o1D - e1D) * (o1D - e1D) / v1D, 6).alias("chi2"),
    )

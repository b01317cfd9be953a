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

from apache_beam_challange_spark.functions.vector import as_double
from apache_beam_challange_spark.plans.registry import query
from apache_beam_challange_spark.sources.catalog import load_table

#: Fixed-point scale for per-term float -> integer conversion before
#: data-sized sums (the curation.py:650 discipline).
_FP = 1_000_000.0


def _exact_sq_over_n_fp(df: DataFrame, a: str, n: str) -> DataFrame:
    """Append ``term_fp`` = floor(a^2 * 1e6 / n), computed EXACTLY in
    integer arithmetic via quotient/remainder decomposition: with
    ``q1 = a div n`` and ``r1 = a - q1*n`` (so ``0 <= r1 < n``),

        a^2*1e6/n = q1*(a*1e6) + q1*r1*1e6 + r1^2*1e6/n

    where the first two terms are integers, so the floor lands
    entirely on the last ``div``, whose result is < n*1e6 — LONG-safe
    by construction (Spark's IntegralDivide always returns LONG and
    silently clamps at Long.MAX, so every ``div`` here must be
    range-bounded, not just the final value). This replaces the old
    FLOOR(double)->LONG route, which clamped at 9.22e18 while the
    DuckDB oracle's FLOOR stayed DOUBLE — the engines diverged past
    ~35k rows for Kruskal-Wallis (ADVICE r9, high). DECIMAL overflow
    here is LOUD (ANSI error, never a clamp); the binding bounds are
    (1) q1 = a/n fits LONG — mean doubled-rank ~2N for KW, mean cents
    for ANOVA, safe past 1e18 rows — and (2) the DECIMAL(38,0)/
    HUGEINT term width ~1e38, i.e. ~1.3e11 events for Kruskal-Wallis
    (term ~ N^3*1e6/25) and ~1e22 for ANOVA (term ~
    avg_cents^2*n_g*1e6) — both far past the 100 TB posture. The
    oracle twin uses HUGEINT ``//`` / ``%`` (truncating, == floor for
    the non-negative operands here) with the same decomposition."""
    d38 = "decimal(38,0)"
    return (
        df.withColumn("_q1", F.expr(f"{a} div {n}"))
        .withColumn(
            "_cfp",
            F.col(a).cast(d38) * F.lit(1_000_000).cast("decimal(7,0)"),
        )
        .withColumn(
            "_r1",
            F.col(a).cast(d38) - F.col("_q1").cast(d38) * F.col(n).cast(d38),
        )
        .withColumn(
            "term_fp",
            (
                F.col("_q1").cast(d38) * F.col("_cfp")
                + F.col("_q1").cast(d38)
                * F.col("_r1")
                * F.lit(1_000_000).cast("decimal(7,0)")
                + F.expr(f"(_r1 * _r1 * CAST(1000000 AS DECIMAL(7,0))) div {n}").cast(
                    d38
                )
            ).cast(d38),
        )
        .drop("_q1", "_cfp", "_r1")
    )


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
gx AS (
    SELECT n, s, q,
           CAST(s AS HUGEINT) // n AS q1,
           CAST(s AS HUGEINT) % n AS r1,
           CAST(s AS HUGEINT) * 1000000 AS cfp
    FROM g
),
t AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n_all,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(s) AS DECIMAL(38,0)) AS s_all,
           CAST(SUM(q) AS DECIMAL(38,0)) AS q_all,
           CAST(SUM(CAST(q1 * cfp + q1 * r1 * 1000000
                         + (r1 * r1 * 1000000) // n
                         AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS a_fp
    FROM gx
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
    t = _exact_sq_over_n_fp(g, "s", "n").agg(
        F.sum("n").cast("long").alias("n_all"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("s").cast("decimal(38,0)").alias("s_all"),
        F.sum("q").cast("decimal(38,0)").alias("q_all"),
        F.sum("term_fp").cast("decimal(38,0)").alias("a_fp"),
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
grpx AS (
    SELECT n_g,
           CAST(r2sum AS HUGEINT) // n_g AS q1,
           CAST(r2sum AS HUGEINT) % n_g AS r1,
           CAST(r2sum AS HUGEINT) * 1000000 AS cfp
    FROM grp
),
agg AS (
    SELECT CAST(SUM(n_g) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(CAST(q1 * cfp + q1 * r1 * 1000000
                         + (r1 * r1 * 1000000) // n_g
                         AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS h_fp
    FROM grpx
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
    agg = _exact_sq_over_n_fp(grp, "r2sum", "n_g").agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("term_fp").cast("decimal(38,0)").alias("h_fp"),
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

def _survival_risk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared survival scaffold (Nelson-Aalen / log-rank base, Greenwood,
    RMST): per-user exact integer durations to first purchase (censored
    at last event), the duration histogram, and integer at-risk suffix
    sums — one user-keyed shuffle, then DOMAIN-bounded frames. Returns
    rows (dur, n_all, deaths, at_risk) for ALL durations (callers filter
    deaths > 0 where the estimator needs death-steps only)."""
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
    return hist.withColumn("at_risk", F.sum("n_all").over(w_risk).cast("long"))


def _km_surv_chain():
    """The forced-order KM survival left-fold over a sorted step array
    named ``arr`` (structs carrying at least ``deaths`` and ``at_risk``)
    — the engine twin of the oracle's RECURSIVE product walk. One
    definition; Greenwood/RMST/steps consumers all fold the identical
    IEEE sequence."""
    return F.aggregate(
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
    risk = _survival_risk_table(spark, sf_dir).filter(F.col("deaths") > 0)
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


# --- Herfindahl-Hirschman concentration (supplier revenue per nation) ---------

_HHI_SQL = """
WITH rev AS (
    SELECT s.s_suppkey, n.n_name,
           CAST(COALESCE(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                                        * 100 + 0.5) AS BIGINT)), 0)
                AS DECIMAL(38,0)) AS r
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    LEFT JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    GROUP BY 1, 2
),
scoped AS (
    SELECT n_name AS scope, r FROM rev
    UNION ALL
    SELECT 'ALL' AS scope, r FROM rev
)
SELECT scope,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       ROUND(CAST(SUM(r * r) AS DOUBLE)
             / (CAST(SUM(r) AS DOUBLE) * CAST(SUM(r) AS DOUBLE)), 9) AS hhi,
       CASE WHEN COUNT(*) > 1 THEN
           ROUND((CAST(SUM(r * r) AS DOUBLE)
                  / (CAST(SUM(r) AS DOUBLE) * CAST(SUM(r) AS DOUBLE))
                  - 1.0 / CAST(COUNT(*) AS DOUBLE))
                 / (1.0 - 1.0 / CAST(COUNT(*) AS DOUBLE)), 9)
       ELSE 1.0 END AS hhi_norm
FROM scoped
GROUP BY scope
ORDER BY scope
""".strip()


@query("hhi_nation_revenue_concentration", oracle=_HHI_SQL)
def hhi_nation_revenue_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation (plus the ALL roll-up) — the market-concentration audit next
    to the Gini/Theil inequality pair. Supplier revenue is exact cents;
    HHI = sum(r_i^2)/S^2 needs only the two exact DECIMAL(38,0) sums, so
    there is NO per-share float at all — one identical double division
    per output row, plus the 1/n normalization. Dims broadcast; the only
    data-sized work is the suppkey aggregate over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    cents = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    li_rev = li.groupBy("l_suppkey").agg(F.sum(cents).alias("lr"))
    rev = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(li_rev, sup.s_suppkey == li_rev.l_suppkey, "left")
        .select(
            F.col("n_name"),
            F.coalesce("lr", F.lit(0)).cast("decimal(38,0)").alias("r"),
        )
    )
    scoped = rev.select(F.col("n_name").alias("scope"), "r").unionAll(
        rev.select(F.lit("ALL").alias("scope"), "r")
    )
    agg = scoped.groupBy("scope").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum(F.col("r") * F.col("r")).cast("decimal(38,0)").alias("rr"),
        F.sum("r").cast("decimal(38,0)").alias("s"),
    )
    hhi = F.col("rr").cast("double") / (
        F.col("s").cast("double") * F.col("s").cast("double")
    )
    inv_n = F.lit(1.0) / F.col("n_suppliers").cast("double")
    return agg.select(
        "scope",
        "n_suppliers",
        F.round(hhi, 9).alias("hhi"),
        F.when(
            F.col("n_suppliers") > 1,
            F.round((hhi - inv_n) / (F.lit(1.0) - inv_n), 9),
        ).otherwise(F.lit(1.0)).alias("hhi_norm"),
    ).orderBy("scope")


# --- Theil inequality indices (customer revenue) ------------------------------

_THEIL_SQL = """
WITH rev AS (
    SELECT o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS r
    FROM orders GROUP BY 1
),
pos AS (SELECT r FROM rev WHERE r > 0),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(r AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s
    FROM pos
),
terms AS (
    SELECT CAST(FLOOR((CAST(r AS DOUBLE) / mu) * LN(CAST(r AS DOUBLE) / mu)
                      * 1000000000.0 + 0.5) AS BIGINT) AS t_fp,
           CAST(FLOOR(LN(mu / CAST(r AS DOUBLE)) * 1000000000.0 + 0.5)
                AS BIGINT) AS l_fp
    FROM pos, (SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu FROM tot)
)
SELECT tot.n, CAST(tot.s AS BIGINT) AS total_cents,
       ROUND(CAST(SUM(t_fp) AS DOUBLE) / 1000000000.0
             / CAST(tot.n AS DOUBLE), 6) AS theil_t,
       ROUND(CAST(SUM(l_fp) AS DOUBLE) / 1000000000.0
             / CAST(tot.n AS DOUBLE), 6) AS theil_l
FROM terms, tot
GROUP BY tot.n, tot.s
""".strip()


@query("theil_index_revenue", oracle=_THEIL_SQL)
def theil_index_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T and Theil L (mean-log-deviation) inequality indices over
    positive customer revenues — the decomposable-entropy companions to
    ``gini_revenue_inequality`` (Gini can't be split between/within
    groups; Theil can). Revenues are exact cents; the mean enters each
    per-customer term as one shared double; each ``(x/mu) ln(x/mu)`` /
    ``ln(mu/x)`` term converts to 1e-9 fixed point BEFORE the data-sized
    sum (the curation.py ln discipline — associativity cannot leak), and
    the final normalization is one identical double expression. One
    custkey aggregate + one broadcast scalar join."""
    od = load_table(spark, sf_dir, "orders")
    rev = od.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("r")
    )
    pos = rev.filter(F.col("r") > 0).select("r")
    tot = pos.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("r").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s"),
    )
    mu = (F.col("s").cast("double") / F.col("n").cast("double")).alias("mu")
    terms = pos.crossJoin(F.broadcast(tot.select(mu))).select(
        F.floor(
            (F.col("r").cast("double") / F.col("mu"))
            * F.log(F.col("r").cast("double") / F.col("mu"))
            * F.lit(1_000_000_000.0)
            + F.lit(0.5)
        ).cast("long").alias("t_fp"),
        F.floor(
            F.log(F.col("mu") / F.col("r").cast("double"))
            * F.lit(1_000_000_000.0)
            + F.lit(0.5)
        ).cast("long").alias("l_fp"),
    )
    sums = terms.agg(
        F.sum("t_fp").cast("long").alias("ts"),
        F.sum("l_fp").cast("long").alias("ls"),
    )
    out = sums.crossJoin(F.broadcast(tot))
    nD = F.col("n").cast("double")
    return out.select(
        "n",
        F.col("s").cast("long").alias("total_cents"),
        F.round(
            F.col("ts").cast("double") / F.lit(1_000_000_000.0) / nD, 6
        ).alias("theil_t"),
        F.round(
            F.col("ls").cast("double") / F.lit(1_000_000_000.0) / nD, 6
        ).alias("theil_l"),
    )


# --- lagged cross-correlation (daily clicks vs purchases) ----------------------

_CCF_SQL = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS c,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS p
    FROM events GROUP BY 1
),
bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
spine AS (
    SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
    FROM bounds
),
filled AS (
    SELECT spine.d, COALESCE(c, 0) AS c, COALESCE(p, 0) AS p
    FROM spine LEFT JOIN daily ON spine.d = daily.d
),
lags AS (SELECT UNNEST(generate_series(-7, 7)) AS lag),
pairs AS (
    SELECT l.lag, a.c, b.p
    FROM lags l
    JOIN filled a ON TRUE
    JOIN filled b ON b.d = a.d + CAST(l.lag AS INTEGER)
)
SELECT lag,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(c * p) AS DOUBLE)
              - CAST(SUM(c) AS DOUBLE) * CAST(SUM(p) AS DOUBLE))
             / (SQRT(CAST(COUNT(*) AS DOUBLE) * CAST(SUM(c * c) AS DOUBLE)
                     - CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
                * SQRT(CAST(COUNT(*) AS DOUBLE) * CAST(SUM(p * p) AS DOUBLE)
                       - CAST(SUM(p) AS DOUBLE) * CAST(SUM(p) AS DOUBLE))),
             6) AS r
FROM pairs
GROUP BY lag
ORDER BY lag
""".strip()


@query("ccf_clicks_purchases_daily", oracle=_CCF_SQL)
def ccf_clicks_purchases_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between the daily click and purchase series at
    lags -7..+7 — "do clicks lead purchases?", the bivariate companion
    to ``acf_daily_revenue``. The event stream collapses to ONE
    DOMAIN-bounded daily frame (zero-filled over the min..max date spine
    so absent days count as 0, identically in both engines); the 15-row
    lag spine cross-joins that bounded frame and every Pearson moment is
    an exact BIGINT (counts and their products), leaving one identical
    double expression per lag. Data-sized work: the single daily
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("c"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("p"),
    )
    spine = (
        daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
        )
        .select(F.col("d").cast("date").alias("d"))
    )
    filled = (
        spine.join(daily, "d", "left")
        .select(
            "d",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
            F.coalesce("p", F.lit(0)).cast("long").alias("p"),
        )
        .localCheckpoint()  # one shuffle feeds both sides of the lag join
    )
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("lag"))
    b = filled.select(F.col("d").alias("bd"), F.col("p").alias("bp"))
    pairs = (
        F.broadcast(lags)
        .crossJoin(filled)
        .join(
            b,
            F.expr("bd = date_add(d, lag)"),
        )
        .select("lag", "c", F.col("bp").alias("p"))
    )
    cnt = F.count(F.lit(1)).cast("long")
    agg = pairs.groupBy("lag").agg(
        cnt.alias("n_days"),
        F.sum("c").cast("long").alias("sc"),
        F.sum("p").cast("long").alias("sp"),
        F.sum(F.col("c") * F.col("p")).cast("long").alias("scp"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
        F.sum(F.col("p") * F.col("p")).cast("long").alias("spp"),
    )
    nD = F.col("n_days").cast("double")
    num = nD * F.col("scp").cast("double") - F.col("sc").cast("double") * F.col(
        "sp"
    ).cast("double")
    denx = F.sqrt(
        nD * F.col("scc").cast("double")
        - F.col("sc").cast("double") * F.col("sc").cast("double")
    )
    deny = F.sqrt(
        nD * F.col("spp").cast("double")
        - F.col("sp").cast("double") * F.col("sp").cast("double")
    )
    return agg.select(
        "lag", "n_days", F.round(num / (denx * deny), 6).alias("r")
    ).orderBy("lag")


# --- leave-one-group-out influence on a regression slope -----------------------

_LOO_SQL = """
WITH base AS (
    SELECT event_type,
           CAST(hour(ts) AS BIGINT) AS x,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
    FROM events
),
g AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
           CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
           CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
           CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx
    FROM base GROUP BY 1
),
t AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sx) AS DECIMAL(38,0)) AS sx,
           CAST(SUM(sy) AS DECIMAL(38,0)) AS sy,
           CAST(SUM(sxy) AS DECIMAL(38,0)) AS sxy,
           CAST(SUM(sxx) AS DECIMAL(38,0)) AS sxx
    FROM g
)
SELECT g.event_type,
       g.n AS n_excluded,
       ROUND((CAST(t.n AS DOUBLE) * CAST(t.sxy AS DOUBLE)
              - CAST(t.sx AS DOUBLE) * CAST(t.sy AS DOUBLE))
             / (CAST(t.n AS DOUBLE) * CAST(t.sxx AS DOUBLE)
                - CAST(t.sx AS DOUBLE) * CAST(t.sx AS DOUBLE)), 9)
           AS slope_full,
       ROUND((CAST(t.n - g.n AS DOUBLE) * CAST(t.sxy - g.sxy AS DOUBLE)
              - CAST(t.sx - g.sx AS DOUBLE) * CAST(t.sy - g.sy AS DOUBLE))
             / (CAST(t.n - g.n AS DOUBLE) * CAST(t.sxx - g.sxx AS DOUBLE)
                - CAST(t.sx - g.sx AS DOUBLE) * CAST(t.sx - g.sx AS DOUBLE)),
             9) AS slope_wo,
       ROUND((CAST(t.n - g.n AS DOUBLE) * CAST(t.sxy - g.sxy AS DOUBLE)
              - CAST(t.sx - g.sx AS DOUBLE) * CAST(t.sy - g.sy AS DOUBLE))
             / (CAST(t.n - g.n AS DOUBLE) * CAST(t.sxx - g.sxx AS DOUBLE)
                - CAST(t.sx - g.sx AS DOUBLE) * CAST(t.sx - g.sx AS DOUBLE))
             - (CAST(t.n AS DOUBLE) * CAST(t.sxy AS DOUBLE)
                - CAST(t.sx AS DOUBLE) * CAST(t.sy AS DOUBLE))
               / (CAST(t.n AS DOUBLE) * CAST(t.sxx AS DOUBLE)
                  - CAST(t.sx AS DOUBLE) * CAST(t.sx AS DOUBLE)), 9)
           AS delta_slope
FROM g, t
ORDER BY event_type
""".strip()


@query("loo_group_influence_on_slope", oracle=_LOO_SQL)
def loo_group_influence_on_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data attribution via leave-one-group-out: how much does each
    event type's data move the global OLS slope of value-on-hour? The
    trick that makes this a SINGLE pass instead of k refits: OLS needs
    only sufficient statistics (n, Sx, Sy, Sxy, Sxx), so the
    without-group slope is computable from global-minus-group EXACT
    integer sums — delete-a-group influence for free, the same algebra
    a 100 TB data-valuation sweep needs (per-shard influence without
    k full passes). One map-side-combined aggregate, k-bounded
    broadcast of the global row, identical double expressions."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("x"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    g = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    )
    t = g.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("sx").cast("decimal(38,0)").alias("tsx"),
        F.sum("sy").cast("decimal(38,0)").alias("tsy"),
        F.sum("sxy").cast("decimal(38,0)").alias("tsxy"),
        F.sum("sxx").cast("decimal(38,0)").alias("tsxx"),
    )

    def slope(n, sx, sy, sxy, sxx):
        return (n * sxy - sx * sy) / (n * sxx - sx * sx)

    j = g.crossJoin(F.broadcast(t))
    full = slope(
        F.col("tn").cast("double"),
        F.col("tsx").cast("double"),
        F.col("tsy").cast("double"),
        F.col("tsxy").cast("double"),
        F.col("tsxx").cast("double"),
    )
    wo = slope(
        (F.col("tn") - F.col("n")).cast("double"),
        (F.col("tsx") - F.col("sx")).cast("double"),
        (F.col("tsy") - F.col("sy")).cast("double"),
        (F.col("tsxy") - F.col("sxy")).cast("double"),
        (F.col("tsxx") - F.col("sxx")).cast("double"),
    )
    return j.select(
        "event_type",
        F.col("n").alias("n_excluded"),
        F.round(full, 9).alias("slope_full"),
        F.round(wo, 9).alias("slope_wo"),
        F.round(wo - full, 9).alias("delta_slope"),
    ).orderBy("event_type")


# --- stratified ATE (weekend treatment, hour-of-day strata) -------------------

_ATE_SQL = """
WITH base AS (
    SELECT CAST(hour(ts) AS BIGINT) AS h,
           CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS w,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
    FROM events
),
strata AS (
    SELECT h,
           CAST(SUM(w) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN w = 1 THEN y ELSE 0 END) AS DECIMAL(38,0)) AS s1,
           CAST(SUM(1 - w) AS BIGINT) AS n0,
           CAST(SUM(CASE WHEN w = 0 THEN y ELSE 0 END) AS DECIMAL(38,0)) AS s0
    FROM base GROUP BY h
),
used AS (
    SELECT n1, n0, s1, s0,
           CAST(FLOOR(CAST(n1 + n0 AS DOUBLE)
                      * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                         - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                      * 1000000.0 + 0.5) AS DECIMAL(38,0)) AS t_fp
    FROM strata WHERE n1 > 0 AND n0 > 0
),
tot AS (
    SELECT CAST(SUM(n1) AS BIGINT) AS tn1, CAST(SUM(n0) AS BIGINT) AS tn0,
           CAST(SUM(s1) AS DECIMAL(38,0)) AS ts1,
           CAST(SUM(s0) AS DECIMAL(38,0)) AS ts0,
           CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(t_fp) AS DECIMAL(38,0)) AS t_sum
    FROM used
)
SELECT tn1 AS n_treated, tn0 AS n_control, n_strata AS n_strata_used,
       ROUND(CAST(ts1 AS DOUBLE) / CAST(tn1 AS DOUBLE)
             - CAST(ts0 AS DOUBLE) / CAST(tn0 AS DOUBLE), 6)
           AS naive_diff_cents,
       ROUND(CAST(t_sum AS DOUBLE) / 1000000.0
             / CAST(tn1 + tn0 AS DOUBLE), 6) AS stratified_ate_cents
FROM tot
""".strip()


@query("stratified_ate_weekend_value", oracle=_ATE_SQL)
def stratified_ate_weekend_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified average-treatment-effect of "weekend" on event value,
    with hour-of-day strata — the closed-form causal adjustment (exact
    IPW with a saturated binned propensity collapses to exactly this
    stratification estimator, so no model fit is needed): per-stratum
    exact integer sums, the <=24 per-stratum difference terms
    fixed-pointed before the cross-stratum sum, the naive difference
    reported next to the adjusted one. One map-side-combined aggregate
    is the only data-sized work. Weekend = ISO day-of-week in {6,7},
    written as ``isodow >= 6`` in DuckDB and ``weekday >= 5`` in Spark
    (same predicate)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.hour("ts").cast("long").alias("h"),
        F.when(F.weekday("ts") >= 5, F.lit(1)).otherwise(F.lit(0)).alias("w"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    strata = base.groupBy("h").agg(
        F.sum("w").cast("long").alias("n1"),
        F.sum(F.when(F.col("w") == 1, F.col("y")).otherwise(0))
        .cast("decimal(38,0)").alias("s1"),
        F.sum(F.lit(1) - F.col("w")).cast("long").alias("n0"),
        F.sum(F.when(F.col("w") == 0, F.col("y")).otherwise(0))
        .cast("decimal(38,0)").alias("s0"),
    ).filter((F.col("n1") > 0) & (F.col("n0") > 0))
    t_fp = F.floor(
        (F.col("n1") + F.col("n0")).cast("double")
        * (
            F.col("s1").cast("double") / F.col("n1").cast("double")
            - F.col("s0").cast("double") / F.col("n0").cast("double")
        )
        * F.lit(_FP)
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    tot = strata.agg(
        F.sum("n1").cast("long").alias("tn1"),
        F.sum("n0").cast("long").alias("tn0"),
        F.sum("s1").cast("decimal(38,0)").alias("ts1"),
        F.sum("s0").cast("decimal(38,0)").alias("ts0"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum(t_fp).cast("decimal(38,0)").alias("t_sum"),
    )
    return tot.select(
        F.col("tn1").alias("n_treated"),
        F.col("tn0").alias("n_control"),
        F.col("n_strata").alias("n_strata_used"),
        F.round(
            F.col("ts1").cast("double") / F.col("tn1").cast("double")
            - F.col("ts0").cast("double") / F.col("tn0").cast("double"),
            6,
        ).alias("naive_diff_cents"),
        F.round(
            F.col("t_sum").cast("double") / F.lit(_FP)
            / (F.col("tn1") + F.col("tn0")).cast("double"),
            6,
        ).alias("stratified_ate_cents"),
    )


# --- expected calibration error (held-out, 20 value bins) ----------------------

_N_CAL_BINS = 20

_ECE_SQL = f"""
WITH base AS (
    SELECT CAST(FLOOR(value * 100) AS BIGINT) AS vb,
           event_id % 2 AS fold,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
),
mx AS (SELECT MAX(vb) AS maxvb FROM base),
binned AS (
    SELECT CASE WHEN vb * {_N_CAL_BINS} // (maxvb + 1) > {_N_CAL_BINS - 1}
                THEN {_N_CAL_BINS - 1}
                ELSE vb * {_N_CAL_BINS} // (maxvb + 1) END AS bin,
           fold, pos
    FROM base, mx
),
cells AS (
    SELECT bin,
           CAST(SUM(CASE WHEN fold = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tr,
           CAST(SUM(CASE WHEN fold = 0 THEN pos ELSE 0 END) AS BIGINT) AS p_tr,
           CAST(SUM(CASE WHEN fold = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ev,
           CAST(SUM(CASE WHEN fold = 1 THEN pos ELSE 0 END) AS BIGINT) AS p_ev
    FROM binned GROUP BY bin
),
used AS (SELECT * FROM cells WHERE n_tr > 0 AND n_ev > 0)
SELECT CAST(SUM(n_tr) AS BIGINT) AS n_train,
       CAST(SUM(n_ev) AS BIGINT) AS n_eval,
       CAST(COUNT(*) AS BIGINT) AS n_bins_used,
       ROUND(CAST(SUM(CAST(FLOOR(CAST(n_ev AS DOUBLE)
                    * ABS(CAST(p_ev AS DOUBLE) / CAST(n_ev AS DOUBLE)
                          - CAST(p_tr AS DOUBLE) / CAST(n_tr AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / CAST(SUM(n_ev) AS DOUBLE), 6) AS ece
FROM used
""".strip()


@query("ece_calibration_value_deciles", oracle=_ECE_SQL)
def ece_calibration_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error of the "value predicts purchase"
    score, measured leakage-safe: per-bin purchase rates FIT on the even
    ``event_id`` fold are the model's confidence, the odd fold is the
    held-out eval set, and ECE is the eval-weighted mean |accuracy -
    confidence| over the {_N_CAL_BINS} value-range bins (integer bin
    math — ``vb*K div (max+1)`` — so both engines bin identically; bins
    missing either fold are excluded and reported via n_bins_used).
    Per-bin terms fixed-pointed before the sum. One aggregate + one
    broadcast scalar (the max bucket)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.floor(F.col("value") * 100).cast("long").alias("vb"),
        (F.col("event_id") % 2).alias("fold"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    mx = base.agg(F.max("vb").alias("maxvb"))
    raw_bin = F.expr(f"vb * {_N_CAL_BINS} div (maxvb + 1)")
    binned = base.crossJoin(F.broadcast(mx)).select(
        F.when(raw_bin > _N_CAL_BINS - 1, F.lit(_N_CAL_BINS - 1))
        .otherwise(raw_bin)
        .alias("bin"),
        "fold",
        "pos",
    )
    cells = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("fold") == 0, 1).otherwise(0)).cast("long").alias("n_tr"),
        F.sum(F.when(F.col("fold") == 0, F.col("pos")).otherwise(0))
        .cast("long").alias("p_tr"),
        F.sum(F.when(F.col("fold") == 1, 1).otherwise(0)).cast("long").alias("n_ev"),
        F.sum(F.when(F.col("fold") == 1, F.col("pos")).otherwise(0))
        .cast("long").alias("p_ev"),
    ).filter((F.col("n_tr") > 0) & (F.col("n_ev") > 0))
    term_fp = F.floor(
        F.col("n_ev").cast("double")
        * F.abs(
            F.col("p_ev").cast("double") / F.col("n_ev").cast("double")
            - F.col("p_tr").cast("double") / F.col("n_tr").cast("double")
        )
        * F.lit(_FP)
        + F.lit(0.5)
    ).cast("long")
    return cells.agg(
        F.sum("n_tr").cast("long").alias("n_train"),
        F.sum("n_ev").cast("long").alias("n_eval"),
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.round(
            F.sum(term_fp).cast("double")
            / F.lit(_FP)
            / F.sum("n_ev").cast("double"),
            6,
        ).alias("ece"),
    )


# --- average precision (purchase ranked by value) ------------------------------

_AP_SQL = """
WITH hist AS (
    SELECT CAST(FLOOR(value * 100) AS BIGINT) AS vb,
           CAST(COUNT(*) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS pos_b
    FROM events GROUP BY 1
),
cum AS (
    SELECT vb, n_b, pos_b,
           CAST(SUM(n_b) OVER (
               ORDER BY vb DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_n,
           CAST(SUM(pos_b) OVER (
               ORDER BY vb DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tp
    FROM hist
)
SELECT CAST(SUM(pos_b) AS BIGINT) AS n_pos,
       CAST(SUM(n_b) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(FLOOR(CAST(pos_b AS DOUBLE)
                                 * CAST(cum_tp AS DOUBLE)
                                 / CAST(cum_n AS DOUBLE)
                                 * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000000.0 / CAST(SUM(pos_b) AS DOUBLE), 6) AS ap,
       ROUND(CAST(SUM(pos_b) AS DOUBLE) / CAST(SUM(n_b) AS DOUBLE), 6)
           AS prevalence
FROM cum
""".strip()


@query("average_precision_purchase_by_value", oracle=_AP_SQL)
def average_precision_purchase_by_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Average precision (area under the precision-recall curve, step
    convention) of ``value`` ranking purchases — the PR-side companion
    to the exact ROC AUC (``mann_whitney_auc_purchase``), and the metric
    that matters when positives are rare. Tie convention, documented and
    identical in both engines: every positive in a tied-score group
    takes the precision at the END of its group (the pessimistic step —
    deterministic under ties, no within-group order to invent). Ranks
    come from the cent-bucket histogram (VALUE-DOMAIN bounded windows);
    per-group terms are <= pos_b so the 1e-9 fixed-point sum stays in
    int64 far past sf100. One data-sized aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hist = ev.groupBy(
        F.floor(F.col("value") * 100).cast("long").alias("vb")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long").alias("pos_b"),
    )
    w = Window.orderBy(F.desc("vb")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "n_b",
        "pos_b",
        F.sum("n_b").over(w).cast("long").alias("cum_n"),
        F.sum("pos_b").over(w).cast("long").alias("cum_tp"),
    )
    term_fp = F.floor(
        F.col("pos_b").cast("double")
        * F.col("cum_tp").cast("double")
        / F.col("cum_n").cast("double")
        * F.lit(1_000_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    return cum.agg(
        F.sum("pos_b").cast("long").alias("n_pos"),
        F.sum("n_b").cast("long").alias("n"),
        F.round(
            F.sum(term_fp).cast("double")
            / F.lit(1_000_000_000.0)
            / F.sum("pos_b").cast("double"),
            6,
        ).alias("ap"),
        F.round(
            F.sum("pos_b").cast("double") / F.sum("n_b").cast("double"), 6
        ).alias("prevalence"),
    )


# --- isotonic regression (PAVA via the minimax identity) -----------------------

_ISO_SQL = f"""
WITH base AS (
    SELECT CAST(FLOOR(value * 100) AS BIGINT) AS vb,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
),
mx AS (SELECT MAX(vb) AS maxvb FROM base),
cells AS (
    SELECT CASE WHEN vb * {_N_CAL_BINS} // (maxvb + 1) > {_N_CAL_BINS - 1}
                THEN {_N_CAL_BINS - 1}
                ELSE vb * {_N_CAL_BINS} // (maxvb + 1) END AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_b,
           CAST(SUM(pos) AS BIGINT) AS pos_b
    FROM base, mx GROUP BY 1
),
seq AS (
    SELECT bin, n_b, pos_b,
           CAST(ROW_NUMBER() OVER (ORDER BY bin) AS BIGINT) AS rn,
           CAST(SUM(n_b) OVER (ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cn,
           CAST(SUM(pos_b) OVER (ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cp
    FROM cells
),
pairs AS (
    SELECT i.rn AS i, j.rn AS j,
           CAST(j.cp - (i.cp - i.pos_b) AS DOUBLE)
               / CAST(j.cn - (i.cn - i.n_b) AS DOUBLE) AS avg_ij
    FROM seq i JOIN seq j ON i.rn <= j.rn
),
inner_min AS (
    SELECT k.rn AS rn, p.i AS i, MIN(p.avg_ij) AS mn
    FROM seq k JOIN pairs p ON p.i <= k.rn AND p.j >= k.rn
    GROUP BY k.rn, p.i
),
iso AS (SELECT rn, MAX(mn) AS iso_rate FROM inner_min GROUP BY rn)
SELECT s.bin, s.n_b AS n, s.pos_b AS pos,
       CAST(s.pos_b AS DOUBLE) / CAST(s.n_b AS DOUBLE) AS raw_rate,
       iso.iso_rate
FROM seq s JOIN iso ON s.rn = iso.rn
ORDER BY s.bin
""".strip()


@query("isotonic_purchase_rate_by_value_bin", oracle=_ISO_SQL)
def isotonic_purchase_rate_by_value_bin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotonic regression (the PAVA calibration fit) of purchase rate
    on value bin, computed via the exact minimax identity
    ``iso_k = max_(i<=k) min_(j>=k) mean(y_i..y_j)`` instead of the
    sequential pool-adjacent-violators sweep — the identity turns an
    inherently serial algorithm into three BOUNDED relational stages
    (bins x bins interval averages, a grouped min, a grouped max) that
    any engine can run: O(K^3) work for K={_N_CAL_BINS} bins, a
    constant, while the data-sized work stays one histogram aggregate.
    Interval means are single IEEE divisions of exact integer prefix
    sums, so the minimax over them is engine-stable without rounding."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.floor(F.col("value") * 100).cast("long").alias("vb"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    mx = base.agg(F.max("vb").alias("maxvb"))
    raw_bin = F.expr(f"vb * {_N_CAL_BINS} div (maxvb + 1)")
    cells = (
        base.crossJoin(F.broadcast(mx))
        .select(
            F.when(raw_bin > _N_CAL_BINS - 1, F.lit(_N_CAL_BINS - 1))
            .otherwise(raw_bin)
            .alias("bin"),
            "pos",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_b"),
            F.sum("pos").cast("long").alias("pos_b"),
        )
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seq = cells.select(
        "bin",
        "n_b",
        "pos_b",
        F.row_number().over(Window.orderBy("bin")).cast("long").alias("rn"),
        F.sum("n_b").over(w).cast("long").alias("cn"),
        F.sum("pos_b").over(w).cast("long").alias("cp"),
    ).localCheckpoint()  # K rows fan into three self-join consumers
    i = seq.select(
        F.col("rn").alias("i"),
        (F.col("cp") - F.col("pos_b")).alias("cp0"),
        (F.col("cn") - F.col("n_b")).alias("cn0"),
    )
    j = seq.select(
        F.col("rn").alias("j"),
        F.col("cp").alias("cpj"),
        F.col("cn").alias("cnj"),
    )
    pairs = (
        i.join(j, F.col("i") <= F.col("j"))
        .select(
            "i",
            "j",
            (
                (F.col("cpj") - F.col("cp0")).cast("double")
                / (F.col("cnj") - F.col("cn0")).cast("double")
            ).alias("avg_ij"),
        )
    )
    k = seq.select(F.col("rn"))
    inner_min = (
        k.join(pairs, (F.col("i") <= F.col("rn")) & (F.col("j") >= F.col("rn")))
        .groupBy("rn", "i")
        .agg(F.min("avg_ij").alias("mn"))
    )
    iso = inner_min.groupBy("rn").agg(F.max("mn").alias("iso_rate"))
    return (
        seq.join(iso, "rn")
        .select(
            "bin",
            F.col("n_b").alias("n"),
            F.col("pos_b").alias("pos"),
            (
                F.col("pos_b").cast("double") / F.col("n_b").cast("double")
            ).alias("raw_rate"),
            "iso_rate",
        )
        .orderBy("bin")
    )


# --- Zipf rank-frequency fit (token power law) ---------------------------------

_ZIPF_TOP = 1000

_ZIPF_SQL = f"""
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
counts AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM toks
    WHERE token <> '' GROUP BY token
),
ranked AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY c DESC, token) AS BIGINT) AS rnk, c
    FROM counts
),
fp AS (
    SELECT CAST(FLOOR(LN(CAST(rnk AS DOUBLE)) * 1000000000.0 + 0.5)
                AS DECIMAL(38,0)) AS x_fp,
           CAST(FLOOR(LN(CAST(c AS DOUBLE)) * 1000000000.0 + 0.5)
                AS DECIMAL(38,0)) AS y_fp
    FROM ranked WHERE rnk <= {_ZIPF_TOP}
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x_fp) AS DECIMAL(38,0)) AS sx,
           CAST(SUM(y_fp) AS DECIMAL(38,0)) AS sy,
           CAST(SUM(x_fp * y_fp) AS DECIMAL(38,0)) AS sxy,
           CAST(SUM(x_fp * x_fp) AS DECIMAL(38,0)) AS sxx,
           CAST(SUM(y_fp * y_fp) AS DECIMAL(38,0)) AS syy
    FROM fp
)
SELECT n AS n_ranks,
       ROUND((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e18)
              - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
             / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e18)
                - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9)),
             6) AS slope,
       ROUND((CAST(sy AS DOUBLE) / 1e9
              - (CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e18)
                 - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
                / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e18)
                   - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9))
                * (CAST(sx AS DOUBLE) / 1e9))
             / CAST(n AS DOUBLE), 6) AS intercept,
       ROUND(POW(CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e18)
                 - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9), 2)
             / ((CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e18)
                 - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9))
                * (CAST(n AS DOUBLE) * (CAST(syy AS DOUBLE) / 1e18)
                   - (CAST(sy AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))),
             6) AS r2
FROM s
""".strip()


@query("zipf_fit_tokens", oracle=_ZIPF_SQL)
def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit over the corpus token rank-frequency curve —
    log-log OLS of frequency on rank for the top {_ZIPF_TOP} ranks; the
    standard corpus-health diagnostic (natural text slopes near -1;
    boilerplate-heavy or synthetic corpora bend away). Token counts are
    exact; the single-partition ranking window is VOCABULARY-bounded
    (the ``vocab_coverage_topk`` argument), both ``ln`` terms convert to
    1e-9 fixed point per rank BEFORE the regression sums (products stay
    exact in DECIMAL(38,0)), and slope/intercept/r2 are identical double
    expressions. Data-sized work: one token-count aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ranked = counts.select(
        F.row_number()
        .over(Window.orderBy(F.desc("c"), "token"))
        .cast("long")
        .alias("rnk"),
        "c",
    ).filter(F.col("rnk") <= _ZIPF_TOP)
    ln_fp = lambda col: F.floor(  # noqa: E731
        F.log(col.cast("double")) * F.lit(1_000_000_000.0) + F.lit(0.5)
    ).cast("decimal(38,0)")
    fp = ranked.select(
        ln_fp(F.col("rnk")).alias("x_fp"), ln_fp(F.col("c")).alias("y_fp")
    )
    s = fp.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x_fp").cast("decimal(38,0)").alias("sx"),
        F.sum("y_fp").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x_fp") * F.col("y_fp")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x_fp") * F.col("x_fp")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y_fp") * F.col("y_fp")).cast("decimal(38,0)").alias("syy"),
    )
    nD = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / F.lit(1e9)
    sy = F.col("sy").cast("double") / F.lit(1e9)
    sxy = F.col("sxy").cast("double") / F.lit(1e18)
    sxx = F.col("sxx").cast("double") / F.lit(1e18)
    syy = F.col("syy").cast("double") / F.lit(1e18)
    num = nD * sxy - sx * sy
    denx = nD * sxx - sx * sx
    deny = nD * syy - sy * sy
    slope = num / denx
    return s.select(
        F.col("n").alias("n_ranks"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / nD, 6).alias("intercept"),
        F.round(F.pow(num, F.lit(2.0)) / (denx * deny), 6).alias("r2"),
    )


# --- Benjamini-Hochberg FDR over per-hour purchase-rate tests ------------------

#: Abramowitz & Stegun 7.1.26 erf constants — pinned as the same decimal
#: literal text both engines parse, so the polynomial is the identical
#: IEEE sequence everywhere.
_AS_P = "0.3275911"
_AS_A = ("0.254829592", "-0.284496736", "1.421413741",
         "-1.453152027", "1.061405429")
_SQRT1_2 = "0.7071067811865476"

_BH_Q = "0.05"


def _phi_2sided_sql(z: str) -> str:
    """2*(1 - Phi(|z|)) via A&S 7.1.26, as engine-neutral SQL text."""
    x = f"(ABS({z}) * {_SQRT1_2})"
    t = f"(1.0 / (1.0 + {_AS_P} * {x}))"
    poly = (
        f"((((({_AS_A[4]} * {t} + {_AS_A[3]}) * {t} + {_AS_A[2]}) * {t}"
        f" + {_AS_A[1]}) * {t} + {_AS_A[0]}) * {t})"
    )
    erf = f"(1.0 - {poly} * EXP(-({x} * {x})))"
    return f"(1.0 - {erf})"


_FDR_SQL = f"""
WITH hours AS (
    SELECT CAST(hour(ts) AS BIGINT) AS h,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pos
    FROM events GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n) AS DOUBLE) AS tn, CAST(SUM(n_pos) AS DOUBLE) AS tp
    FROM hours
),
z AS (
    SELECT h, n, n_pos,
           ROUND((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) - tp / tn)
                 / SQRT((tp / tn) * (1.0 - tp / tn) / CAST(n AS DOUBLE)),
                 6) AS z
    FROM hours, tot
),
p AS (
    SELECT h, n, n_pos, z,
           ROUND({_phi_2sided_sql("z")}, 6) AS p_raw
    FROM z
),
ranked AS (
    SELECT h, n, n_pos, z, p_raw,
           CAST(ROW_NUMBER() OVER (ORDER BY p_raw, h) AS BIGINT) AS i,
           CAST(COUNT(*) OVER () AS BIGINT) AS m
    FROM p
)
SELECT h AS hour, n, n_pos, z, p_raw,
       ROUND(LEAST(1.0, MIN(p_raw * CAST(m AS DOUBLE) / CAST(i AS DOUBLE))
           OVER (ORDER BY i DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
           AS p_bh,
       LEAST(1.0, MIN(p_raw * CAST(m AS DOUBLE) / CAST(i AS DOUBLE))
           OVER (ORDER BY i DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           <= {_BH_Q} AS rejected
FROM ranked
ORDER BY hour
""".strip()


@query("fdr_bh_hourly_purchase_rate", oracle=_FDR_SQL)
def fdr_bh_hourly_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over 24 simultaneous two-sided
    z-tests ("does hour h's purchase rate differ from the global
    rate?") — the multiple-testing layer every metrics platform needs
    before flagging per-segment anomalies. The normal tail uses the
    Abramowitz-Stegun 7.1.26 erf polynomial with PINNED literal
    constants (identical IEEE sequence in both engines; z and p are
    rounded at 1e-6 before the BH pass so the adjustment ranks over
    identical keys, tie-broken by hour). The BH step-up is the
    textbook suffix-min of ``p*m/i`` — a window over 24 rows. One
    data-sized aggregate; everything else is hour-bounded."""
    ev = load_table(spark, sf_dir, "events")
    hours = ev.groupBy(F.hour("ts").cast("long").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long").alias("n_pos"),
    )
    tot = hours.agg(
        F.sum("n").cast("double").alias("tn"),
        F.sum("n_pos").cast("double").alias("tp"),
    )
    rate = F.col("tp") / F.col("tn")
    z = hours.crossJoin(F.broadcast(tot)).select(
        "h",
        "n",
        "n_pos",
        F.round(
            (F.col("n_pos").cast("double") / F.col("n").cast("double") - rate)
            / F.sqrt(rate * (F.lit(1.0) - rate) / F.col("n").cast("double")),
            6,
        ).alias("z"),
    )
    p = z.withColumn("p_raw", F.round(F.expr(_phi_2sided_sql("z")), 6))
    wrank = Window.orderBy("p_raw", "h")
    ranked = p.select(
        "h",
        "n",
        "n_pos",
        "z",
        "p_raw",
        F.row_number().over(wrank).cast("long").alias("i"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("m"),
    )
    wsuf = Window.orderBy(F.desc("i")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    adj = F.least(
        F.lit(1.0),
        F.min(
            F.col("p_raw") * F.col("m").cast("double") / F.col("i").cast("double")
        ).over(wsuf),
    )
    return ranked.select(
        F.col("h").alias("hour"),
        "n",
        "n_pos",
        "z",
        "p_raw",
        F.round(adj, 6).alias("p_bh"),
        (adj <= F.lit(float(_BH_Q))).alias("rejected"),
    ).orderBy("hour")


# --- Holt-Winters additive seasonal forecast backtest --------------------------

_HW_A = "0.3"   # level — pinned literal text both engines parse
_HW_1A = "0.7"
_HW_B = "0.2"   # trend
_HW_1B = "0.8"
_HW_G = "0.1"   # seasonal
_HW_1G = "0.9"
_HW_M = 7       # weekly season on the daily series


def _hw_sql() -> str:
    """Build the recursive oracle: a 7-slot seasonal state carried as
    seven explicit columns, updated by CASE on day-of-week."""
    sd = " ".join(
        f"WHEN n.d % 7 = {i} THEN w.s{i}" for i in range(_HW_M)
    )
    sd_expr = f"(CASE {sd} END)"
    y = "CAST(n.yc AS DOUBLE)"
    lp = f"({_HW_A} * ({y} - {sd_expr}) + {_HW_1A} * (w.level + w.trend))"
    s_cols_base = ", ".join(
        f"COALESCE(i.s{i}, 0.0) AS s{i}" for i in range(_HW_M)
    )
    s_cols_step = ", ".join(
        f"CASE WHEN n.d % 7 = {i} THEN {_HW_G} * ({y} - {lp})"
        f" + {_HW_1G} * w.s{i} ELSE w.s{i} END" for i in range(_HW_M)
    )
    init_slots = ", ".join(
        f"MAX(CASE WHEN dow = {i} THEN sy END) AS s{i}" for i in range(_HW_M)
    )
    return f"""
WITH RECURSIVE daily AS (
    SELECT event_type, CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yc
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
),
numbered AS (
    SELECT event_type, d, yc,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY d
           ) AS BIGINT) AS rn
    FROM daily
),
l0 AS (
    SELECT event_type,
           CAST(SUM(yc) AS DOUBLE) / 7.0 AS level0
    FROM numbered WHERE rn <= 7 GROUP BY event_type
),
slot_src AS (
    SELECT n.event_type, n.d % 7 AS dow,
           CAST(MAX_BY(n.yc, n.rn) AS DOUBLE) - ANY_VALUE(l.level0) AS sy
    FROM numbered n JOIN l0 l ON l.event_type = n.event_type
    WHERE n.rn <= 7
    GROUP BY n.event_type, n.d % 7
),
init AS (
    SELECT event_type, {init_slots}
    FROM slot_src GROUP BY event_type
),
walk AS (
    SELECT l.event_type, CAST(7 AS BIGINT) AS rn, l.level0 AS level,
           CAST(0 AS DOUBLE) AS trend, {s_cols_base},
           CAST(0 AS DOUBLE) AS es
    FROM l0 l JOIN init i ON i.event_type = l.event_type
    UNION ALL
    SELECT n.event_type, n.rn,
           {lp},
           {_HW_B} * ({lp} - w.level) + {_HW_1B} * w.trend,
           {s_cols_step},
           w.es + ABS({y} - (w.level + w.trend + {sd_expr}))
    FROM walk w JOIN numbered n
      ON n.event_type = w.event_type AND n.rn = w.rn + 1
)
SELECT event_type,
       CAST(MAX(rn) AS BIGINT) AS n_days,
       MAX(CASE WHEN is_last THEN level END) AS final_level,
       MAX(CASE WHEN is_last THEN trend END) AS final_trend,
       MAX(CASE WHEN is_last THEN es END)
       / CAST(MAX(rn) - 7 AS DOUBLE) AS mae
FROM (
    SELECT event_type, rn, level, trend, es,
           rn = MAX(rn) OVER (PARTITION BY event_type) AS is_last
    FROM walk
)
WHERE rn >= 8 OR is_last
GROUP BY event_type
HAVING MAX(rn) >= 8
ORDER BY event_type
""".strip()


_HW_SQL = _hw_sql()


@query("holt_winters_forecast_backtest", oracle=_HW_SQL)
def holt_winters_forecast_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing (alpha=0.3, beta=0.2,
    gamma=0.1, weekly season m=7) over the daily revenue series per
    event type, backtested one-step-ahead from day 8 — the seasonal
    member of the forecasting family (EWMA level-only -> Holt trend ->
    this). State is (level, trend, 7 seasonal slots keyed by day-of-week
    d%7); init is RELATIONAL, not recursive: level = mean of the first
    seven days, slot = last-seen y - level among them (absent slots 0),
    trend = 0 — so both engines seed from the same non-iterative CTE.
    The three-way recurrence then runs as the IDENTICAL IEEE sequence:
    the oracle's RECURSIVE walk carries seven explicit columns updated
    by CASE, the engine left-folds a struct whose seasonal array is
    rebuilt with the same one-slot transform; the level expression
    subtree is textually shared where the oracle repeats it. Data-sized
    work: the one daily aggregate; the walk is DAYS x TYPES bounded."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("yc")
    )
    wn = Window.partitionBy("event_type").orderBy("d")
    numbered = daily.withColumn("rn", F.row_number().over(wn).cast("long"))
    first7 = numbered.filter(F.col("rn") <= 7)
    l0 = first7.groupBy("event_type").agg(
        (F.sum("yc").cast("double") / F.lit(7.0)).alias("level0"),
        F.count(F.lit(1)).alias("n7"),
    ).filter(F.col("n7") == 7)
    slot_src = (
        first7.groupBy("event_type", (F.col("d") % 7).alias("dow"))
        .agg(F.max_by("yc", "rn").cast("double").alias("ylast"))
    )
    init = (
        slot_src.join(l0, "event_type")
        .groupBy("event_type", "level0")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(F.col("dow"), (F.col("ylast") - F.col("level0")).alias("sy"))
                )
            ).alias("slots")
        )
        .select(
            "event_type",
            "level0",
            F.array(
                *[
                    F.coalesce(
                        F.element_at(F.col("slots"), F.lit(i)), F.lit(0.0)
                    )
                    for i in range(_HW_M)
                ]
            ).alias("seas0"),
        )
    )
    rest = (
        numbered.filter(F.col("rn") >= 8)
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list(F.struct("d", "yc"))).alias("arr"))
    )
    joined = init.join(rest, "event_type")
    a, ia = float(_HW_A), float(_HW_1A)
    b, ib = float(_HW_B), float(_HW_1B)
    g, ig = float(_HW_G), float(_HW_1G)
    acc0 = F.struct(
        F.col("level0").alias("level"),
        F.lit(0.0).alias("trend"),
        F.col("seas0").alias("seas"),
        F.lit(0.0).alias("es"),
        F.lit(0).cast("long").alias("n"),
    )

    def step(acc, x):
        y = x["yc"].cast("double")
        dow = (x["d"] % 7).cast("int")
        sd = F.element_at(acc["seas"], dow + F.lit(1))
        lp = F.lit(a) * (y - sd) + F.lit(ia) * (acc["level"] + acc["trend"])
        new_seas = F.transform(
            acc["seas"],
            lambda v, idx: F.when(
                idx == dow, F.lit(g) * (y - lp) + F.lit(ig) * v
            ).otherwise(v),
        )
        return F.struct(
            lp.alias("level"),
            (F.lit(b) * (lp - acc["level"]) + F.lit(ib) * acc["trend"]).alias(
                "trend"
            ),
            new_seas.alias("seas"),
            (
                acc["es"] + F.abs(y - (acc["level"] + acc["trend"] + sd))
            ).alias("es"),
            (acc["n"] + 1).alias("n"),
        )

    fin = F.aggregate("arr", acc0, step)
    return joined.select(
        "event_type",
        (fin["n"] + F.lit(7)).cast("long").alias("n_days"),
        fin["level"].alias("final_level"),
        fin["trend"].alias("final_trend"),
        (fin["es"] / fin["n"].cast("double")).alias("mae"),
    ).orderBy("event_type")


# --- Kaplan-Meier with Greenwood confidence bands ------------------------------

_Z95 = "1.959963984540054"  # Phi^-1(0.975), pinned literal both engines parse

_KMCI_SQL = f"""
WITH RECURSIVE mic AS (
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
),
steps AS (
    SELECT ROW_NUMBER() OVER (ORDER BY dur) AS rn, dur, deaths, at_risk,
           CAST(SUM(CASE WHEN at_risk > deaths
                         THEN (deaths * 1000000000)
                              // (at_risk * (at_risk - deaths))
                         ELSE 0 END) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS gw_fp
    FROM risk WHERE deaths > 0
),
km AS (
    SELECT rn, dur, deaths, at_risk, gw_fp,
           1.0 * (1.0 - CAST(deaths AS DOUBLE) / CAST(at_risk AS DOUBLE)) AS surv
    FROM steps WHERE rn = 1
    UNION ALL
    SELECT s.rn, s.dur, s.deaths, s.at_risk, s.gw_fp,
           km.surv * (1.0 - CAST(s.deaths AS DOUBLE) / CAST(s.at_risk AS DOUBLE))
    FROM km JOIN steps s ON s.rn = km.rn + 1
)
SELECT dur AS dur_h, at_risk, deaths, surv,
       surv * SQRT(CAST(gw_fp AS DOUBLE) / 1000000000.0) AS se,
       GREATEST(0.0, surv - {_Z95}
                * (surv * SQRT(CAST(gw_fp AS DOUBLE) / 1000000000.0))) AS lo95,
       LEAST(1.0, surv + {_Z95}
                * (surv * SQRT(CAST(gw_fp AS DOUBLE) / 1000000000.0))) AS hi95
FROM km ORDER BY dur_h
""".strip()


@query("km_greenwood_ci", oracle=_KMCI_SQL)
def km_greenwood_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival with Greenwood standard errors and pinned
    95% bands — the uncertainty layer on top of ``km_time_to_purchase``
    (same durations, censoring, and forced-order survival product).
    Greenwood's sum ``sum d/(n(n-d))`` is an EXACT integer prefix sum
    (``(d*1e9) div (n*(n-d))`` — the Nelson-Aalen discipline; the
    all-die last step contributes 0 by the standard convention), so the
    only ordered float chain remains the KM product itself, replayed as
    the identical IEEE sequence via the recursive CTE / left-fold pair.
    z = {_Z95} pinned as shared literal text."""
    risk = _survival_risk_table(spark, sf_dir).filter(F.col("deaths") > 0)
    w_cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gw_step = F.when(
        F.col("at_risk") > F.col("deaths"),
        F.expr("(deaths * 1000000000) div (at_risk * (at_risk - deaths))"),
    ).otherwise(F.lit(0))
    steps = risk.withColumn(
        "gw_fp", F.sum(gw_step).over(w_cum).cast("long")
    )
    packed = steps.agg(
        F.sort_array(
            F.collect_list(F.struct("dur", "deaths", "at_risk", "gw_fp"))
        ).alias("arr")
    )
    surv = _km_surv_chain()
    zipped = packed.select(
        F.posexplode(F.arrays_zip(F.col("arr"), surv.alias("surv_arr")))
    )
    sv = F.col("col.surv_arr")
    se = sv * F.sqrt(
        F.col("col.arr.gw_fp").cast("double") / F.lit(1_000_000_000.0)
    )
    z = F.lit(float(_Z95))
    return zipped.select(
        F.col("col.arr.dur").alias("dur_h"),
        F.col("col.arr.at_risk").alias("at_risk"),
        F.col("col.arr.deaths").alias("deaths"),
        sv.alias("surv"),
        se.alias("se"),
        F.greatest(F.lit(0.0), sv - z * se).alias("lo95"),
        F.least(F.lit(1.0), sv + z * se).alias("hi95"),
    ).orderBy("dur_h")


# --- weighted quantiles (revenue-mass quartiles per type) ----------------------

_WQ_SQL = """
WITH hist AS (
    SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS vb,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
cum AS (
    SELECT event_type, vb, c,
           CAST(SUM(vb * c) OVER (
               PARTITION BY event_type ORDER BY vb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cw,
           CAST(SUM(vb * c) OVER (PARTITION BY event_type) AS BIGINT) AS tw,
           CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM hist
)
SELECT event_type, MAX(n) AS n, MAX(tw) AS total_cents,
       MIN(CASE WHEN 4 * cw >= tw THEN vb END) AS wq25,
       MIN(CASE WHEN 2 * cw >= tw THEN vb END) AS wmedian,
       MIN(CASE WHEN 4 * cw >= 3 * tw THEN vb END) AS wq75
FROM cum
GROUP BY event_type
ORDER BY event_type
""".strip()


@query("weighted_quantiles_value_by_type", oracle=_WQ_SQL)
def weighted_quantiles_value_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue-weighted quartiles per event type — "the value below
    which a quarter / half / three quarters of the MONEY sits" (each
    row weighted by its own cent value), the mass-weighted twin of the
    count-based ``value_quantiles_by_type``. ZERO floats anywhere: the
    cent-bucket histogram is exact, the weight prefix sums are BIGINT,
    and the quartile picks are integer threshold comparisons
    (``4*cum >= k*total``). Windows run over the VALUE-DOMAIN-bounded
    per-type histogram; one data-sized aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hist = ev.groupBy(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("vb")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("vb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "vb",
        F.sum(F.col("vb") * F.col("c")).over(wcum).cast("long").alias("cw"),
        F.sum(F.col("vb") * F.col("c")).over(wall).cast("long").alias("tw"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )
    pick = lambda cond: F.min(F.when(cond, F.col("vb")))  # noqa: E731
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("tw").alias("total_cents"),
            pick(F.lit(4) * F.col("cw") >= F.col("tw")).alias("wq25"),
            pick(F.lit(2) * F.col("cw") >= F.col("tw")).alias("wmedian"),
            pick(F.lit(4) * F.col("cw") >= F.lit(3) * F.col("tw")).alias("wq75"),
        )
        .orderBy("event_type")
    )


# --- Cochran-Mantel-Haenszel (weekend x purchase, hour strata) -----------------

_CMH_SQL = """
WITH base AS (
    SELECT CAST(hour(ts) AS BIGINT) AS h,
           CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS w,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
),
strata AS (
    SELECT h,
           CAST(SUM(w * pos) AS BIGINT) AS a,
           CAST(SUM(w * (1 - pos)) AS BIGINT) AS b,
           CAST(SUM((1 - w) * pos) AS BIGINT) AS c,
           CAST(SUM((1 - w) * (1 - pos)) AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM base GROUP BY h
),
used AS (SELECT * FROM strata WHERE n > 1 AND a + b > 0 AND c + d > 0),
terms AS (
    SELECT a,
           CAST(FLOOR(CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                      / CAST(n AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS e_fp,
           CAST(FLOOR(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                      * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                         * CAST(n - 1 AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT) AS v_fp,
           CAST(FLOOR(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                      / CAST(n AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT)
               AS ad_fp,
           CAST(FLOOR(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                      / CAST(n AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT)
               AS bc_fp
    FROM used
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
       CAST(SUM(a) AS BIGINT) AS sum_a,
       ROUND(CAST(SUM(e_fp) AS DOUBLE) / 1000000.0, 6) AS e_sum,
       ROUND(CAST(SUM(v_fp) AS DOUBLE) / 1000000.0, 6) AS v_sum,
       ROUND((CAST(SUM(a) AS DOUBLE) - CAST(SUM(e_fp) AS DOUBLE) / 1000000.0)
             * (CAST(SUM(a) AS DOUBLE) - CAST(SUM(e_fp) AS DOUBLE) / 1000000.0)
             / (CAST(SUM(v_fp) AS DOUBLE) / 1000000.0), 6) AS chi2,
       ROUND(CAST(SUM(ad_fp) AS DOUBLE) / CAST(SUM(bc_fp) AS DOUBLE), 6)
           AS or_mh
FROM terms
""".strip()


@query("cmh_weekend_purchase_by_hour", oracle=_CMH_SQL)
def cmh_weekend_purchase_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test of the weekend-purchase association
    CONTROLLING for hour-of-day — the hypothesis-test companion to
    ``stratified_ate_weekend_value`` (same strata, binary outcome, 2x2xK
    design), plus the Mantel-Haenszel pooled odds ratio. Each stratum's
    hypergeometric E and V and the MH ``ad/n`` / ``bc/n`` terms are
    fixed-pointed before the cross-stratum sums (continuity correction
    deliberately omitted — documented, identical in both engines); one
    conditional aggregate is the only data-sized work."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.hour("ts").cast("long").alias("h"),
        F.when(F.weekday("ts") >= 5, F.lit(1)).otherwise(F.lit(0)).alias("w"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    strata = base.groupBy("h").agg(
        F.sum(F.col("w") * F.col("pos")).cast("long").alias("a"),
        F.sum(F.col("w") * (F.lit(1) - F.col("pos"))).cast("long").alias("b"),
        F.sum((F.lit(1) - F.col("w")) * F.col("pos")).cast("long").alias("c"),
        F.sum((F.lit(1) - F.col("w")) * (F.lit(1) - F.col("pos")))
        .cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).filter(
        (F.col("n") > 1)
        & (F.col("a") + F.col("b") > 0)
        & (F.col("c") + F.col("d") > 0)
    )
    aD = F.col("a").cast("double")
    bD = F.col("b").cast("double")
    cD = F.col("c").cast("double")
    dD = F.col("d").cast("double")
    nD = F.col("n").cast("double")
    fp6 = lambda x: F.floor(x * F.lit(_FP) + F.lit(0.5)).cast("long")  # noqa: E731
    fp9 = lambda x: F.floor(  # noqa: E731
        x * F.lit(1_000_000_000.0) + F.lit(0.5)
    ).cast("long")
    terms = strata.select(
        "a",
        fp6((aD + bD) * (aD + cD) / nD).alias("e_fp"),
        fp6(
            (aD + bD) * (cD + dD) * (aD + cD) * (bD + dD)
            / (nD * nD * (nD - F.lit(1.0)))
        ).alias("v_fp"),
        fp9(aD * dD / nD).alias("ad_fp"),
        fp9(bD * cD / nD).alias("bc_fp"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("a").cast("long").alias("sum_a"),
        F.sum("e_fp").cast("long").alias("es"),
        F.sum("v_fp").cast("long").alias("vs"),
        F.sum("ad_fp").cast("long").alias("ads"),
        F.sum("bc_fp").cast("long").alias("bcs"),
    )
    e = F.col("es").cast("double") / F.lit(_FP)
    v = F.col("vs").cast("double") / F.lit(_FP)
    sa = F.col("sum_a").cast("double")
    return agg.select(
        "n_strata",
        "sum_a",
        F.round(e, 6).alias("e_sum"),
        F.round(v, 6).alias("v_sum"),
        F.round((sa - e) * (sa - e) / v, 6).alias("chi2"),
        F.round(
            F.col("ads").cast("double") / F.col("bcs").cast("double"), 6
        ).alias("or_mh"),
    )


# --- linear-interpolation resample (the LOCF twin) ------------------------------

_LERP_SQL = """
WITH bounds AS (
    SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
    FROM events
),
spine AS (
    SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
),
grid AS (
    SELECT t.event_type, s.hour
    FROM (SELECT DISTINCT event_type FROM events) t, spine s
),
picked AS (
    SELECT event_type, hour, yc FROM (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS yc,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn = 1
),
joined AS (
    SELECT g.event_type, g.hour, p.yc,
           epoch_us(g.hour) // 3600000000 AS eh
    FROM grid g LEFT JOIN picked p
      ON p.event_type = g.event_type AND p.hour = g.hour
),
ctx AS (
    SELECT event_type, hour, yc, eh,
           LAST_VALUE(yc IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY eh
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS y0,
           LAST_VALUE(CASE WHEN yc IS NOT NULL THEN eh END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY eh
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS t0,
           FIRST_VALUE(yc IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY eh
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           ) AS y1,
           FIRST_VALUE(CASE WHEN yc IS NOT NULL THEN eh END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY eh
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           ) AS t1
    FROM joined
)
SELECT event_type, hour,
       CASE WHEN yc IS NOT NULL THEN CAST(yc AS DOUBLE)
            WHEN y0 IS NOT NULL AND y1 IS NOT NULL THEN
                CAST(y0 AS DOUBLE) + CAST(y1 - y0 AS DOUBLE)
                * CAST(eh - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE)
            END AS y_cents,
       CASE WHEN yc IS NOT NULL THEN 'obs'
            WHEN y0 IS NOT NULL AND y1 IS NOT NULL THEN 'interp'
            ELSE 'edge' END AS method
FROM ctx
ORDER BY event_type, hour
""".strip()


@query("resample_linear_hourly", oracle=_LERP_SQL)
def resample_linear_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly resample with LINEAR interpolation across gaps — the
    slope-aware twin of ``resample_locf_hourly`` (same spine, same
    deterministic per-hour pick: last raw reading by (ts, event_id)).
    Interior gaps interpolate between the exact integer cent endpoints
    with one identical double expression (endpoints and epoch-hours are
    exact BIGINTs, so the lerp is a single division of exact integers);
    hours before the first / after the last observation stay NULL and
    are labeled ``edge`` honestly. Windows run over the per-type DENSE
    spine (calendar-bounded), not raw events."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine))
    w_pick = Window.partitionBy("event_type", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    picked = (
        ev.select(
            "event_type",
            hour.alias("hour"),
            "ts",
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("yc"),
        )
        .withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select("event_type", "hour", "yc")
    )
    joined = grid.join(picked, ["event_type", "hour"], "left").withColumn(
        "eh", F.expr("unix_micros(cast(hour as timestamp)) div 3600000000")
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("eh")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("eh")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    marked_eh = F.when(F.col("yc").isNotNull(), F.col("eh"))
    ctx = joined.select(
        "event_type",
        "hour",
        "yc",
        "eh",
        F.last("yc", ignorenulls=True).over(wb).alias("y0"),
        F.last(marked_eh, ignorenulls=True).over(wb).alias("t0"),
        F.first("yc", ignorenulls=True).over(wf).alias("y1"),
        F.first(marked_eh, ignorenulls=True).over(wf).alias("t1"),
    )
    lerp = (
        F.col("y0").cast("double")
        + (F.col("y1") - F.col("y0")).cast("double")
        * (F.col("eh") - F.col("t0")).cast("double")
        / (F.col("t1") - F.col("t0")).cast("double")
    )
    both = F.col("y0").isNotNull() & F.col("y1").isNotNull()
    return ctx.select(
        "event_type",
        "hour",
        F.when(F.col("yc").isNotNull(), F.col("yc").cast("double"))
        .when(both, lerp)
        .alias("y_cents"),
        F.when(F.col("yc").isNotNull(), F.lit("obs"))
        .when(both, F.lit("interp"))
        .otherwise(F.lit("edge"))
        .alias("method"),
    ).orderBy("event_type", "hour")


# --- Wilson confidence intervals (purchase rate per assignment cohort) ---------

_WILSON_SQL = f"""
WITH g AS (
    SELECT user_id % 2 AS grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS pos
    FROM events GROUP BY 1
)
SELECT grp, n, pos,
       CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
       ((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
         + {_Z95} * {_Z95} / (2.0 * CAST(n AS DOUBLE)))
        - {_Z95} * SQRT((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)
                        + {_Z95} * {_Z95}
                          / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
       / (1.0 + {_Z95} * {_Z95} / CAST(n AS DOUBLE)) AS lo95,
       ((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
         + {_Z95} * {_Z95} / (2.0 * CAST(n AS DOUBLE)))
        + {_Z95} * SQRT((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)
                        + {_Z95} * {_Z95}
                          / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
       / (1.0 + {_Z95} * {_Z95} / CAST(n AS DOUBLE)) AS hi95
FROM g ORDER BY grp
""".strip()


@query("wilson_ci_purchase_by_parity", oracle=_WILSON_SQL)
def wilson_ci_purchase_by_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score intervals for the purchase rate of the two user-id
    parity cohorts — the CI every experiment readout should print
    instead of the Wald interval (Wilson never leaves [0,1] and behaves
    at small n / extreme rates). Counts are exact; the interval is one
    identical double expression per cohort with the pinned z={_Z95}.
    One conditional aggregate; two output rows."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy((F.col("user_id") % 2).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long").alias("pos"),
    )
    z = F.lit(float(_Z95))
    nD = F.col("n").cast("double")
    p = F.col("pos").cast("double") / nD
    center = p + z * z / (F.lit(2.0) * nD)
    half = z * F.sqrt(
        p * (F.lit(1.0) - p) / nD + z * z / (F.lit(4.0) * nD * nD)
    )
    denom = F.lit(1.0) + z * z / nD
    return g.select(
        "grp",
        "n",
        "pos",
        p.alias("rate"),
        ((center - half) / denom).alias("lo95"),
        ((center + half) / denom).alias("hi95"),
    ).orderBy("grp")


# --- index of dispersion (Poisson overdispersion check on hourly counts) -------

_DISP_SQL = """
WITH bounds AS (
    SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
    FROM events
),
spine AS (
    SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
),
grid AS (
    SELECT t.event_type, s.hour
    FROM (SELECT DISTINCT event_type FROM events) t, spine s
),
hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS hour,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
filled AS (
    SELECT g.event_type, COALESCE(h.y, 0) AS y
    FROM grid g LEFT JOIN hourly h
      ON h.event_type = g.event_type AND h.hour = g.hour
),
s AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(y * y) AS BIGINT) AS syy
    FROM filled GROUP BY 1
)
SELECT event_type, n AS n_hours,
       ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_per_hour,
       ROUND(((CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
              / CAST(n - 1 AS DOUBLE))
             / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS dispersion,
       ROUND(((CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
              / CAST(n - 1 AS DOUBLE))
             / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             * CAST(n - 1 AS DOUBLE), 6) AS chi2
FROM s ORDER BY event_type
""".strip()


@query("dispersion_index_hourly_counts", oracle=_DISP_SQL)
def dispersion_index_hourly_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of the per-type
    hourly arrival counts over the ZERO-FILLED hour spine — the Poisson
    sanity check every event pipeline needs (D~1 Poissonian, D>>1
    bursty/overdispersed, D<<1 rate-limited), with the (n-1)*D chi-square
    statistic. Counts and their squares are exact BIGINTs on the
    calendar-bounded grid; mean/variance/D are identical double
    expressions. One data-sized aggregate + a broadcast spine join."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine))
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    filled = grid.join(hourly, ["event_type", "hour"], "left").select(
        "event_type", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    s = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    nD = F.col("n").cast("double")
    mean = F.col("sy").cast("double") / nD
    var = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double") / nD
    ) / (F.col("n") - F.lit(1)).cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.round(mean, 6).alias("mean_per_hour"),
        F.round(var / mean, 6).alias("dispersion"),
        F.round(var / mean * (F.col("n") - F.lit(1)).cast("double"), 6)
        .alias("chi2"),
    ).orderBy("event_type")


# --- Granger-lite: do lagged clicks explain purchases? -------------------------

_GRANGER_SQL = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS c,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS p
    FROM events GROUP BY 1
),
bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
spine AS (
    SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
    FROM bounds
),
filled AS (
    SELECT spine.d, COALESCE(c, 0) AS c, COALESCE(p, 0) AS p
    FROM spine LEFT JOIN daily ON spine.d = daily.d
),
lagged AS (
    SELECT a.p AS y, b.p AS x1, b.c AS x2
    FROM filled a JOIN filled b ON b.d = a.d - 1
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x1) AS BIGINT) AS s1,
           CAST(SUM(x2) AS BIGINT) AS s2,
           CAST(SUM(y * y) AS BIGINT) AS syy,
           CAST(SUM(x1 * x1) AS BIGINT) AS s11,
           CAST(SUM(x2 * x2) AS BIGINT) AS s22,
           CAST(SUM(x1 * y) AS BIGINT) AS s1y,
           CAST(SUM(x2 * y) AS BIGINT) AS s2y,
           CAST(SUM(x1 * x2) AS BIGINT) AS s12
    FROM lagged
),
c AS (
    SELECT CAST(n AS DOUBLE) AS n,
           CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
               / CAST(n AS DOUBLE) AS cyy,
           CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
               / CAST(n AS DOUBLE) AS c11,
           CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
               / CAST(n AS DOUBLE) AS c22,
           CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE)
               / CAST(n AS DOUBLE) AS c1y,
           CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE)
               / CAST(n AS DOUBLE) AS c2y,
           CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
               / CAST(n AS DOUBLE) AS c12
    FROM m
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(cyy - c1y * c1y / c11, 6) AS rss_restricted,
       ROUND(cyy - (c1y * c1y * c22 - 2.0 * c1y * c2y * c12
                    + c2y * c2y * c11)
                   / (c11 * c22 - c12 * c12), 6) AS rss_full,
       ROUND(((cyy - c1y * c1y / c11)
              - (cyy - (c1y * c1y * c22 - 2.0 * c1y * c2y * c12
                        + c2y * c2y * c11)
                       / (c11 * c22 - c12 * c12)))
             / ((cyy - (c1y * c1y * c22 - 2.0 * c1y * c2y * c12
                        + c2y * c2y * c11)
                       / (c11 * c22 - c12 * c12)) / (n - 3.0)), 6) AS f_stat
FROM c
""".strip()


@query("granger_lite_clicks_purchases", oracle=_GRANGER_SQL)
def granger_lite_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-style incremental-predictability F test at lag 1: does
    yesterday's CLICK count explain today's PURCHASE count beyond
    yesterday's purchases? (The causal-direction companion to
    ``ccf_clicks_purchases_daily``.) Restricted (AR(1)) vs full
    (AR(1)+lagged clicks) RSS both come in closed form from ONE exact
    integer moment aggregate over the zero-filled lag-joined daily frame
    — the 2x2 normal equations solved by determinant, no iterative fit
    — and F = (RSS_r - RSS_f) / (RSS_f / (n-3)). Calendar-bounded
    everywhere after the single daily aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("c"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("p"),
    )
    spine = (
        daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
        )
        .select(F.col("d").cast("date").alias("d"))
    )
    filled = (
        spine.join(daily, "d", "left")
        .select(
            "d",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
            F.coalesce("p", F.lit(0)).cast("long").alias("p"),
        )
        .localCheckpoint()  # one shuffle feeds both sides of the lag join
    )
    b = filled.select(
        F.col("d").alias("bd"), F.col("p").alias("x1"), F.col("c").alias("x2")
    )
    lagged = filled.join(
        b, F.expr("bd = date_add(d, -1)")
    ).select(F.col("p").alias("y"), "x1", "x2")
    m = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
    )
    nD = F.col("n").cast("double")
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cyy = d("syy") - d("sy") * d("sy") / nD
    c11 = d("s11") - d("s1") * d("s1") / nD
    c22 = d("s22") - d("s2") * d("s2") / nD
    c1y = d("s1y") - d("s1") * d("sy") / nD
    c2y = d("s2y") - d("s2") * d("sy") / nD
    c12 = d("s12") - d("s1") * d("s2") / nD
    rss_r = cyy - c1y * c1y / c11
    rss_f = cyy - (
        c1y * c1y * c22 - F.lit(2.0) * c1y * c2y * c12 + c2y * c2y * c11
    ) / (c11 * c22 - c12 * c12)
    return m.select(
        "n",
        F.round(rss_r, 6).alias("rss_restricted"),
        F.round(rss_f, 6).alias("rss_full"),
        F.round(
            (rss_r - rss_f) / (rss_f / (nD - F.lit(3.0))), 6
        ).alias("f_stat"),
    )


# --- weekly periodogram power (pinned DFT constants) ----------------------------

#: cos/sin(2*pi*k/7) for k=0..6, pinned as shared literal text — the DFT
#: at the weekly frequency needs ONLY these seven values, so there is no
#: libm cos/sin dependency anywhere.
_COS7 = ("1.0", "0.6234898018587336", "-0.22252093395631434",
         "-0.900968867902419", "-0.9009688679024191",
         "-0.2225209339563146", "0.6234898018587334")
_SIN7 = ("0.0", "0.7818314824680298", "0.9749279121818236",
         "0.43388373911755823", "-0.433883739117558",
         "-0.9749279121818236", "-0.7818314824680299")


def _trig_case(vals: tuple, col: str) -> str:
    whens = " ".join(f"WHEN {col} % 7 = {k} THEN {v}" for k, v in enumerate(vals))
    return f"(CASE {whens} END)"


_PERIODOGRAM_SQL = f"""
WITH daily AS (
    SELECT event_type,
           CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yc
    FROM events GROUP BY 1, 2
),
mu AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(yc) AS BIGINT) AS sy,
           CAST(SUM(yc * yc) AS BIGINT) AS syy
    FROM daily GROUP BY 1
),
terms AS (
    SELECT d.event_type,
           CAST(FLOOR((CAST(d.yc AS DOUBLE)
                       - CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE))
                      * {_trig_case(_COS7, "d.d")} * 1000000.0 + 0.5)
                AS BIGINT) AS a_fp,
           CAST(FLOOR((CAST(d.yc AS DOUBLE)
                       - CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE))
                      * {_trig_case(_SIN7, "d.d")} * 1000000.0 + 0.5)
                AS BIGINT) AS b_fp
    FROM daily d JOIN mu m ON m.event_type = d.event_type
)
SELECT t.event_type, m.n AS n_days,
       ROUND((CAST(SUM(t.a_fp) AS DOUBLE) / 1000000.0
              * CAST(SUM(t.a_fp) AS DOUBLE) / 1000000.0
              + CAST(SUM(t.b_fp) AS DOUBLE) / 1000000.0
                * CAST(SUM(t.b_fp) AS DOUBLE) / 1000000.0)
             * 2.0 / CAST(m.n AS DOUBLE)
             / (CAST(m.syy AS DOUBLE)
                - CAST(m.sy AS DOUBLE) * CAST(m.sy AS DOUBLE)
                  / CAST(m.n AS DOUBLE)), 6) AS weekly_power_share
FROM terms t JOIN mu m ON m.event_type = t.event_type
GROUP BY t.event_type, m.n, m.sy, m.syy
ORDER BY t.event_type
""".strip()


@query("weekly_periodogram_power", oracle=_PERIODOGRAM_SQL)
def weekly_periodogram_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram power share at the weekly frequency per event type —
    "how much of the daily revenue variance is a 7-day cycle?", the
    spectral companion to ``seasonal_decompose_daily``. The DFT at
    period 7 needs only cos/sin(2*pi*k/7) for k=0..6, so the seven
    values are PINNED literal constants (no libm trig anywhere); each
    mean-centered term is fixed-pointed (1e-6) before the data-sized
    sums, and the Schuster normalization 2*(a^2+b^2)/(n*Syy) is one
    identical double expression. Data-sized work: the daily aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("yc")
    ).localCheckpoint()  # one shuffle feeds the moment agg AND the term scan
    mu = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yc").cast("long").alias("sy"),
        F.sum(F.col("yc") * F.col("yc")).cast("long").alias("syy"),
    )
    cos_case = F.expr(_trig_case(_COS7, "d"))
    sin_case = F.expr(_trig_case(_SIN7, "d"))
    centered = F.col("yc").cast("double") - F.col("sy").cast("double") / F.col(
        "n"
    ).cast("double")
    terms = daily.join(F.broadcast(mu), "event_type").select(
        "event_type",
        F.floor(centered * cos_case * F.lit(_FP) + F.lit(0.5))
        .cast("long").alias("a_fp"),
        F.floor(centered * sin_case * F.lit(_FP) + F.lit(0.5))
        .cast("long").alias("b_fp"),
    )
    agg = terms.groupBy("event_type").agg(
        F.sum("a_fp").cast("long").alias("sa"),
        F.sum("b_fp").cast("long").alias("sb"),
    )
    out = agg.join(F.broadcast(mu), "event_type")
    a = F.col("sa").cast("double") / F.lit(_FP)
    bb = F.col("sb").cast("double") / F.lit(_FP)
    nD = F.col("n").cast("double")
    syy_c = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double") / nD
    )
    return out.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round((a * a + bb * bb) * F.lit(2.0) / nD / syy_c, 6)
        .alias("weekly_power_share"),
    ).orderBy("event_type")


# --- Wald SPRT monitor (sequential A/B stopping over the event stream) ---------

#: SPRT design: H0 purchase-rate p0=0.15 vs H1 p1=0.20, alpha=beta=0.05.
#: The per-event log-likelihood-ratio increments and the Wald thresholds
#: ln((1-b)/a)=ln 19 are PINNED 1e-12 fixed-point INTEGERS (computed once,
#: embedded in both engines), so the whole monitor is exact integer
#: arithmetic — no float accumulates anywhere.
_SPRT_L1_FP = 287682072452      # round(ln(0.20/0.15) * 1e12)
_SPRT_L0_FP = -60624621816      # round(ln(0.80/0.85) * 1e12)
_SPRT_A_FP = 2944438979166      # round(ln(19) * 1e12)   accept H1 at >= A
_SPRT_B_FP = -2944438979166     # -A                     accept H0 at <= B
#: two exact counters packed into one prefix-summed long:
#: value = pos * 2^34 + 1  ->  cum = cum_pos * 2^34 + row_index
#: (exact while rows < 2^34 and cum_pos*2^34 < 2^63 — fine past sf100)
_SPRT_PACK = 1 << 34

_SPRT_SQL = f"""
WITH ordered AS (
    SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
           ROW_NUMBER() OVER (ORDER BY ts, event_id) AS i
    FROM events
),
walk AS (
    SELECT i,
           CAST(SUM(pos) OVER (
               ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_pos
    FROM ordered
),
llr AS (
    SELECT i, cum_pos,
           cum_pos * {_SPRT_L1_FP} + (i - cum_pos) * ({_SPRT_L0_FP}) AS llr_fp
    FROM walk
),
crossing AS (
    SELECT i, cum_pos, llr_fp,
           CASE WHEN llr_fp >= {_SPRT_A_FP} THEN 'accept_h1'
                WHEN llr_fp <= {_SPRT_B_FP} THEN 'accept_h0' END AS verdict
    FROM llr
),
first_cross AS (
    SELECT i, cum_pos, llr_fp, verdict FROM crossing
    WHERE verdict IS NOT NULL ORDER BY i LIMIT 1
),
fin AS (
    SELECT CAST(MAX(i) AS BIGINT) AS n_total,
           CAST(MAX(CASE WHEN i_last THEN llr_fp END) AS BIGINT) AS llr_final
    FROM (SELECT i, llr_fp, i = MAX(i) OVER () AS i_last FROM llr)
)
SELECT fin.n_total,
       COALESCE(fc.verdict, 'continue') AS decision,
       CAST(fc.i AS BIGINT) AS decided_at,
       CAST(fc.llr_fp AS DOUBLE) / 1000000000000.0 AS llr_at_decision,
       CAST(fin.llr_final AS DOUBLE) / 1000000000000.0 AS llr_final
FROM fin LEFT JOIN first_cross fc ON TRUE
""".strip()


@query("sprt_purchase_rate_monitor", oracle=_SPRT_SQL)
def sprt_purchase_rate_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test over the event stream in
    arrival order — the always-valid "stop the experiment early" monitor
    (H0 p=0.15 vs H1 p=0.20, alpha=beta=0.05): when does the purchase
    rate's cumulative log-likelihood ratio first cross a Wald boundary,
    and what was the verdict? Everything is EXACT INTEGER arithmetic:
    the LLR increments and the ln(19) thresholds are pinned 1e-12
    fixed-point constants, and the running (row_index, cum_positives)
    pair rides ONE distributed prefix sum with both counters packed into
    a single long (pos * 2^34 + 1 — exact past sf100), i.e. the
    numbering primitive's range-partitioned scan, NOT a single-partition
    window; the boundary crossing is a TakeOrdered(1). The oracle walks
    the same pinned integers with a plain window."""
    from apache_beam_challange_spark.plans.coverage import (
        distributed_prefix_sum,
    )

    ev = load_table(spark, sf_dir, "events")
    packed = ev.select(
        F.col("ts"),
        F.col("event_id"),
        (
            (F.col("event_type") == "purchase").cast("long")
            * F.lit(_SPRT_PACK)
            + F.lit(1)
        ).alias("v"),
    )
    cum = distributed_prefix_sum(
        packed, [F.col("ts"), F.col("event_id")], "v"
    )
    cum_pos = F.expr(f"cum div {_SPRT_PACK}")
    row_i = F.col("cum") % F.lit(_SPRT_PACK)
    llr = cum.select(
        cum_pos.alias("cum_pos"),
        row_i.alias("i"),
        (
            cum_pos * F.lit(_SPRT_L1_FP)
            + (row_i - cum_pos) * F.lit(_SPRT_L0_FP)
        ).alias("llr_fp"),
    )
    verdict = F.when(
        F.col("llr_fp") >= F.lit(_SPRT_A_FP), F.lit("accept_h1")
    ).when(F.col("llr_fp") <= F.lit(_SPRT_B_FP), F.lit("accept_h0"))
    first_cross = (
        llr.withColumn("verdict", verdict)
        .filter(F.col("verdict").isNotNull())
        .orderBy("i")
        .limit(1)
        .select("i", "llr_fp", "verdict")
    )
    fin = llr.agg(
        F.max("i").cast("long").alias("n_total"),
        F.max_by("llr_fp", "i").cast("long").alias("llr_final_fp"),
    )
    # LEFT join keeps the summary row even if no boundary was crossed
    out = fin.join(F.broadcast(first_cross), F.lit(True), "left")
    return out.select(
        "n_total",
        F.coalesce(F.col("verdict"), F.lit("continue")).alias("decision"),
        F.col("i").cast("long").alias("decided_at"),
        (F.col("llr_fp").cast("double") / F.lit(1e12)).alias(
            "llr_at_decision"
        ),
        (F.col("llr_final_fp").cast("double") / F.lit(1e12)).alias(
            "llr_final"
        ),
    )


# --- Cohen's d (weekend effect size on value) ----------------------------------

_COHEND_SQL = """
WITH base AS (
    SELECT CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS w,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
    FROM events
),
g AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS DECIMAL(38,0)) AS s,
           CAST(SUM(y * y) AS DECIMAL(38,0)) AS q
    FROM base GROUP BY w
),
wide AS (
    SELECT MAX(CASE WHEN w = 1 THEN n END) AS n1,
           MAX(CASE WHEN w = 1 THEN CAST(s AS DOUBLE) END) AS s1,
           MAX(CASE WHEN w = 1 THEN CAST(q AS DOUBLE) END) AS q1,
           MAX(CASE WHEN w = 0 THEN n END) AS n0,
           MAX(CASE WHEN w = 0 THEN CAST(s AS DOUBLE) END) AS s0,
           MAX(CASE WHEN w = 0 THEN CAST(q AS DOUBLE) END) AS q0
    FROM g
)
SELECT n1 AS n_treated, n0 AS n_control,
       ROUND(s1 / CAST(n1 AS DOUBLE) - s0 / CAST(n0 AS DOUBLE), 6)
           AS diff_cents,
       ROUND((s1 / CAST(n1 AS DOUBLE) - s0 / CAST(n0 AS DOUBLE))
             / SQRT(((q1 - s1 * s1 / CAST(n1 AS DOUBLE))
                     + (q0 - s0 * s0 / CAST(n0 AS DOUBLE)))
                    / CAST(n1 + n0 - 2 AS DOUBLE)), 6) AS cohens_d,
       ROUND((s1 / CAST(n1 AS DOUBLE) - s0 / CAST(n0 AS DOUBLE))
             / SQRT(((q1 - s1 * s1 / CAST(n1 AS DOUBLE))
                     + (q0 - s0 * s0 / CAST(n0 AS DOUBLE)))
                    / CAST(n1 + n0 - 2 AS DOUBLE))
             * (1.0 - 3.0 / (4.0 * CAST(n1 + n0 AS DOUBLE) - 9.0)), 6)
           AS hedges_g
FROM wide
""".strip()


@query("cohens_d_weekend_value", oracle=_COHEND_SQL)
def cohens_d_weekend_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d (pooled-SD standardized mean difference) and the
    small-sample Hedges' g correction for the weekend effect on value —
    the effect-size row every test in this wave should be read next to
    (the ANOVA/CMH/ATE family reports significance; this reports
    MAGNITUDE). Exact integer group moments; d and g are identical
    double expressions. One conditional aggregate."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.when(F.weekday("ts") >= 5, F.lit(1)).otherwise(F.lit(0)).alias("w"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    g = base.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("q"),
    )
    wide = g.agg(
        F.max(F.when(F.col("w") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("w") == 1, F.col("s").cast("double"))).alias("s1"),
        F.max(F.when(F.col("w") == 1, F.col("q").cast("double"))).alias("q1"),
        F.max(F.when(F.col("w") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("w") == 0, F.col("s").cast("double"))).alias("s0"),
        F.max(F.when(F.col("w") == 0, F.col("q").cast("double"))).alias("q0"),
    )
    n1D = F.col("n1").cast("double")
    n0D = F.col("n0").cast("double")
    diff = F.col("s1") / n1D - F.col("s0") / n0D
    pooled = F.sqrt(
        (
            (F.col("q1") - F.col("s1") * F.col("s1") / n1D)
            + (F.col("q0") - F.col("s0") * F.col("s0") / n0D)
        )
        / (F.col("n1") + F.col("n0") - F.lit(2)).cast("double")
    )
    d = diff / pooled
    corr = F.lit(1.0) - F.lit(3.0) / (
        F.lit(4.0) * (F.col("n1") + F.col("n0")).cast("double") - F.lit(9.0)
    )
    return wide.select(
        F.col("n1").alias("n_treated"),
        F.col("n0").alias("n_control"),
        F.round(diff, 6).alias("diff_cents"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * corr, 6).alias("hedges_g"),
    )


# --- energy distance (two-sample, exact from the cent histogram) ---------------

_ENERGY_SQL = """
WITH base AS (
    SELECT CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS w,
           CAST(FLOOR(value * 100) AS BIGINT) AS vb
    FROM events
),
hist AS (
    SELECT vb,
           CAST(SUM(w) AS BIGINT) AS m_b,
           CAST(SUM(1 - w) AS BIGINT) AS n_b
    FROM base GROUP BY vb
),
cum AS (
    SELECT vb, m_b, n_b,
           CAST(COALESCE(SUM(m_b) OVER (
               ORDER BY vb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS DECIMAL(38,0)) AS cm,
           CAST(COALESCE(SUM(vb * m_b) OVER (
               ORDER BY vb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS DECIMAL(38,0)) AS sm,
           CAST(COALESCE(SUM(n_b) OVER (
               ORDER BY vb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS DECIMAL(38,0)) AS cn,
           CAST(COALESCE(SUM(vb * n_b) OVER (
               ORDER BY vb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS DECIMAL(38,0)) AS sn
    FROM hist
),
tot AS (
    SELECT CAST(SUM(m_b) AS DECIMAL(38,0)) AS m,
           CAST(SUM(n_b) AS DECIMAL(38,0)) AS n
    FROM hist
),
sums AS (
    SELECT
        CAST(SUM(CAST(n_b AS DECIMAL(38,0))
                 * (CAST(vb AS DECIMAL(38,0)) * cm - sm)) AS DECIMAL(38,0))
            AS dxy_below,
        CAST(SUM(CAST(m_b AS DECIMAL(38,0))
                 * (CAST(vb AS DECIMAL(38,0)) * cn - sn)) AS DECIMAL(38,0))
            AS dyx_below,
        CAST(SUM(CAST(m_b AS DECIMAL(38,0))
                 * (CAST(vb AS DECIMAL(38,0)) * cm - sm)) AS DECIMAL(38,0))
            AS dxx_below,
        CAST(SUM(CAST(n_b AS DECIMAL(38,0))
                 * (CAST(vb AS DECIMAL(38,0)) * cn - sn)) AS DECIMAL(38,0))
            AS dyy_below
    FROM cum
)
SELECT CAST(t.m AS BIGINT) AS n_weekend, CAST(t.n AS BIGINT) AS n_weekday,
       ROUND(2.0 * (CAST(s.dxy_below AS DOUBLE) + CAST(s.dyx_below AS DOUBLE))
                 / (CAST(t.m AS DOUBLE) * CAST(t.n AS DOUBLE))
             - 2.0 * CAST(s.dxx_below AS DOUBLE)
                 / (CAST(t.m AS DOUBLE) * CAST(t.m AS DOUBLE))
             - 2.0 * CAST(s.dyy_below AS DOUBLE)
                 / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)), 6)
           AS energy_distance_cents
FROM sums s, tot t
""".strip()


@query("energy_distance_weekend_value", oracle=_ENERGY_SQL)
def energy_distance_weekend_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy distance between the weekend and weekday value
    distributions — the modern two-sample statistic (sensitive to ANY
    distributional difference, not just location like Cohen's d or
    dominance like KS), computed EXACTLY: every pairwise-|difference|
    expectation collapses to cent-histogram prefix sums
    (sum_i sum_j n_i m_j |v_i - v_j| = sum_j m_j (v_j C_below - S_below)
    doubled), all in DECIMAL(38,0), with three identical double
    divisions at the end. E = 2E|X-Y| - E|X-X'| - E|Y-Y'|; windows run
    over the VALUE-DOMAIN-bounded histogram; one data-sized aggregate."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.when(F.weekday("ts") >= 5, F.lit(1)).otherwise(F.lit(0)).alias("w"),
        F.floor(F.col("value") * 100).cast("long").alias("vb"),
    )
    hist = base.groupBy("vb").agg(
        F.sum("w").cast("long").alias("m_b"),
        F.sum(F.lit(1) - F.col("w")).cast("long").alias("n_b"),
    )
    wprev = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, -1)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cum = hist.select(
        "vb",
        "m_b",
        "n_b",
        F.coalesce(F.sum("m_b").over(wprev), F.lit(0))
        .cast("decimal(38,0)").alias("cm"),
        F.coalesce(F.sum(F.col("vb") * F.col("m_b")).over(wprev), F.lit(0))
        .cast("decimal(38,0)").alias("sm"),
        F.coalesce(F.sum("n_b").over(wprev), F.lit(0))
        .cast("decimal(38,0)").alias("cn"),
        F.coalesce(F.sum(F.col("vb") * F.col("n_b")).over(wprev), F.lit(0))
        .cast("decimal(38,0)").alias("sn"),
    )
    vbD = dec(F.col("vb"))
    sums = cum.agg(
        F.sum(dec(F.col("n_b")) * (vbD * F.col("cm") - F.col("sm")))
        .cast("decimal(38,0)").alias("dxy_below"),
        F.sum(dec(F.col("m_b")) * (vbD * F.col("cn") - F.col("sn")))
        .cast("decimal(38,0)").alias("dyx_below"),
        F.sum(dec(F.col("m_b")) * (vbD * F.col("cm") - F.col("sm")))
        .cast("decimal(38,0)").alias("dxx_below"),
        F.sum(dec(F.col("n_b")) * (vbD * F.col("cn") - F.col("sn")))
        .cast("decimal(38,0)").alias("dyy_below"),
    )
    tot = hist.agg(
        F.sum("m_b").cast("decimal(38,0)").alias("m"),
        F.sum("n_b").cast("decimal(38,0)").alias("n"),
    )
    out = sums.crossJoin(F.broadcast(tot))
    mD = F.col("m").cast("double")
    nD = F.col("n").cast("double")
    energy = (
        F.lit(2.0)
        * (F.col("dxy_below").cast("double") + F.col("dyx_below").cast("double"))
        / (mD * nD)
        - F.lit(2.0) * F.col("dxx_below").cast("double") / (mD * mD)
        - F.lit(2.0) * F.col("dyy_below").cast("double") / (nD * nD)
    )
    return out.select(
        F.col("m").cast("long").alias("n_weekend"),
        F.col("n").cast("long").alias("n_weekday"),
        F.round(energy, 6).alias("energy_distance_cents"),
    )


# --- Heaps' law fit (vocabulary growth) ----------------------------------------

_HEAPS_K = 20  # doc-id-domain checkpoints

_HEAPS_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
firsts AS (
    SELECT token, CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM toks WHERE token <> '' GROUP BY token
),
fh AS (
    SELECT first_doc, CAST(COUNT(*) AS BIGINT) AS new_tokens
    FROM firsts GROUP BY first_doc
),
bounds AS (
    SELECT CAST(MIN(doc_id) AS BIGINT) AS lo, CAST(MAX(doc_id) AS BIGINT) AS hi
    FROM documents
),
cps AS (
    SELECT k, lo + ((hi - lo + 1) * k) // {_HEAPS_K} AS cut
    FROM bounds, (SELECT UNNEST(generate_series(1, {_HEAPS_K})) AS k)
),
pts AS (
    SELECT c.k,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents d
            WHERE d.doc_id < c.cut) AS n_docs,
           (SELECT CAST(COALESCE(SUM(new_tokens), 0) AS BIGINT) FROM fh
            WHERE fh.first_doc < c.cut) AS vocab
    FROM cps c
),
fp AS (
    SELECT CAST(FLOOR(LN(CAST(n_docs AS DOUBLE)) * 1000000000.0 + 0.5)
                AS DECIMAL(38,0)) AS x_fp,
           CAST(FLOOR(LN(CAST(vocab AS DOUBLE)) * 1000000000.0 + 0.5)
                AS DECIMAL(38,0)) AS y_fp
    FROM pts WHERE n_docs > 0 AND vocab > 0
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x_fp) AS DECIMAL(38,0)) AS sx,
           CAST(SUM(y_fp) AS DECIMAL(38,0)) AS sy,
           CAST(SUM(x_fp * y_fp) AS DECIMAL(38,0)) AS sxy,
           CAST(SUM(x_fp * x_fp) AS DECIMAL(38,0)) AS sxx
    FROM fp
),
fin AS (
    -- exact integer OLS moments: num/den in 128-bit space, ONE double
    -- division per output.  den = n*Sxx - Sx^2 >= 0 (Cauchy-Schwarz), so a
    -- zero numerator yields +0.0 in every engine (the r10 heaps failure was
    -- a double-space subtraction whose ~0 residual sign differed by engine).
    SELECT n,
           CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
             - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS num,
           CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
             - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS den,
           CAST(sx AS HUGEINT) AS sxh,
           CAST(sy AS HUGEINT) AS syh
    FROM s
)
SELECT n AS n_checkpoints,
       ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS beta,
       ROUND(CAST(syh * den - num * sxh AS DOUBLE)
             / CAST(den * CAST(n AS HUGEINT) AS DOUBLE) / 1e9, 6) AS ln_k
FROM fin
""".strip()


@query("heaps_law_fit_tokens", oracle=_HEAPS_SQL)
def heaps_law_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law fit — vocabulary growth V(n) ~ K*n^beta over the
    document stream, the corpus-health companion to ``zipf_fit_tokens``
    (natural text: beta ~ 0.4-0.6; template/synthetic corpora saturate).
    The trick that makes vocabulary-growth EXACT without replaying
    prefixes: a token enters the vocabulary at its MINIMUM doc_id, so
    V(cut) = |tokens with first_doc < cut| — one token aggregate, then
    {_HEAPS_K} doc-id-domain checkpoints evaluated by a broadcast join
    against the first-doc histogram (no prefix re-scan, no data-sized
    window). Log-log OLS with the wave's 1e-9 fixed-point ln
    discipline."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    firsts = toks.groupBy("token").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )
    fh = firsts.groupBy("first_doc").agg(
        F.count(F.lit(1)).cast("long").alias("new_tokens")
    ).localCheckpoint()  # small frame feeds 20 checkpoint aggregates
    bounds = docs.agg(
        F.min("doc_id").cast("long").alias("lo"),
        F.max("doc_id").cast("long").alias("hi"),
    )
    cps = (
        spark.range(1, _HEAPS_K + 1)
        .select(F.col("id").alias("k"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "k",
            F.expr(f"lo + ((hi - lo + 1) * k) div {_HEAPS_K}").alias("cut"),
        )
    )
    dcount = docs.select("doc_id").crossJoin(F.broadcast(cps)).filter(
        F.col("doc_id") < F.col("cut")
    ).groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    vocab = fh.crossJoin(F.broadcast(cps)).filter(
        F.col("first_doc") < F.col("cut")
    ).groupBy("k").agg(F.sum("new_tokens").cast("long").alias("vocab"))
    pts = dcount.join(vocab, "k").filter(
        (F.col("n_docs") > 0) & (F.col("vocab") > 0)
    )
    ln_fp = lambda col: F.floor(  # noqa: E731
        F.log(col.cast("double")) * F.lit(1_000_000_000.0) + F.lit(0.5)
    ).cast("decimal(38,0)")
    fp = pts.select(
        ln_fp(F.col("n_docs")).alias("x_fp"), ln_fp(F.col("vocab")).alias("y_fp")
    )
    s = fp.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x_fp").cast("decimal(38,0)").alias("sx"),
        F.sum("y_fp").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x_fp") * F.col("y_fp")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x_fp") * F.col("x_fp")).cast("decimal(38,0)").alias("sxx"),
    )
    # Exact-integer OLS moments (DECIMAL(38,0) ~ the oracle's HUGEINT), ONE
    # double division per output.  den = n*Sxx - Sx^2 >= 0 (Cauchy-Schwarz),
    # so a zero numerator yields +0.0 in both engines — the r10 driver FAIL
    # was a double-space subtraction whose ~0 residual SIGN differed by
    # engine (Spark 0.0 vs DuckDB -0.0).  Magnitudes: |x_fp| <= ~3e10, so
    # n*sxy <= ~4e23 and sy*den <= ~3e35 — all within 38 digits.
    nH = F.col("n").cast("decimal(38,0)")
    fin = s.select(
        "n",
        (nH * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (nH * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
        F.col("sx").alias("sxh"),
        F.col("sy").alias("syh"),
    )
    return fin.select(
        F.col("n").alias("n_checkpoints"),
        F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6)
        .alias("beta"),
        F.round(
            (F.col("syh") * F.col("den") - F.col("num") * F.col("sxh"))
            .cast("double")
            / (F.col("den") * F.col("n").cast("decimal(38,0)")).cast("double")
            / F.lit(1e9),
            6,
        ).alias("ln_k"),
    )


# --- token burstiness (Church-Gale dispersion of top terms) --------------------

_BURST_TOP = 20

_BURST_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
td AS (
    SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS c
    FROM toks WHERE token <> '' GROUP BY token, doc_id
),
stats AS (
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(c) AS BIGINT) AS tf,
           CAST(SUM(c * c) AS BIGINT) AS tf2
    FROM td GROUP BY token
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
ranked AS (
    SELECT token, df, tf, tf2,
           ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS rnk
    FROM stats
)
SELECT token, df, tf,
       ROUND((CAST(tf2 AS DOUBLE) / CAST(n.n_docs AS DOUBLE)
              - (CAST(tf AS DOUBLE) / CAST(n.n_docs AS DOUBLE))
                * (CAST(tf AS DOUBLE) / CAST(n.n_docs AS DOUBLE)))
             / (CAST(tf AS DOUBLE) / CAST(n.n_docs AS DOUBLE)), 6)
           AS burstiness,
       ROUND(CAST(tf AS DOUBLE) / CAST(df AS DOUBLE), 6) AS mean_tf_when_present
FROM ranked, n
WHERE rnk <= {_BURST_TOP}
ORDER BY tf DESC, token
""".strip()


@query("token_burstiness_top_terms", oracle=_BURST_SQL)
def token_burstiness_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness of the top {_BURST_TOP} corpus terms:
    the variance-to-mean ratio of per-document term counts (zeros
    included via the exact moment identity — absent docs contribute 0 to
    both moments, so only the (token, doc) aggregate is needed) next to
    E[tf | present]. Function words sit near Poisson (D~1); topical/
    boilerplate terms are bursty (D>>1) — the term-level twin of
    ``dispersion_index_hourly_counts`` and a repetition-quality signal
    for corpus curation. Exact BIGINT moments; the ranking window is
    VOCABULARY-bounded; one (token, doc) aggregate is the data-sized
    work."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    td = toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    stats = td.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("tf"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("tf2"),
    )
    ndocs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    ranked = stats.select(
        "*",
        F.row_number().over(Window.orderBy(F.desc("tf"), "token")).alias("rnk"),
    ).filter(F.col("rnk") <= _BURST_TOP)
    out = ranked.crossJoin(F.broadcast(ndocs))
    nD = F.col("n_docs").cast("double")
    mean = F.col("tf").cast("double") / nD
    return out.select(
        "token",
        "df",
        "tf",
        F.round(
            (F.col("tf2").cast("double") / nD - mean * mean) / mean, 6
        ).alias("burstiness"),
        F.round(
            F.col("tf").cast("double") / F.col("df").cast("double"), 6
        ).alias("mean_tf_when_present"),
    ).orderBy(F.desc("tf"), "token")


# --- linear CKA between embedding halves (representation redundancy) -----------

_CKA_DIM = 64
_CKA_SPLIT = 32   # dims 1..32 = block X, 33..64 = block Y
_CKA_SG = 1_000_000_000   # per-product / per-coordinate fixed point
_CKA_SF = 1_000_000_000_000  # per-entry squared-covariance fixed point

def _centered_cov_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared dim^2 Gram scaffold for the representation diagnostics
    (CKA, effective rank): one-pass fixed-point Gram (upper triangle
    mirrored — IEEE multiplication is commutative), fixed-point mean
    vector, and the centered covariance ``c`` as one identical double
    expression. Returns the 4096-row bounded frame with columns
    (i, j, s_fp, mi, n, c)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        as_double(F.col("embedding")).alias("x")
    )
    n_df = emb.agg(F.count(F.lit(1)).cast("long").alias("n"))
    comp = emb.select(F.posexplode("x").alias("i0", "xi"), "x")
    tri = comp.select(
        (F.col("i0") + 1).alias("i"),
        F.posexplode("x").alias("j0", "xj"),
        "xi",
    ).filter(F.col("j0") + 1 >= F.col("i"))
    half = (
        tri.select(
            "i",
            (F.col("j0") + 1).alias("j"),
            F.floor(F.col("xi") * F.col("xj") * F.lit(_CKA_SG) + F.lit(0.5))
            .cast("long")
            .alias("term"),
        )
        .groupBy("i", "j")
        .agg(F.sum("term").cast("long").alias("s_fp"))
    )
    full = half.unionAll(
        half.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "s_fp"
        )
    )
    means = (
        comp.select(
            (F.col("i0") + 1).alias("i"),
            F.floor(F.col("xi") * F.lit(_CKA_SG) + F.lit(0.5))
            .cast("long")
            .alias("t"),
        )
        .groupBy("i")
        .agg(F.sum("t").cast("long").alias("m_fp"))
    )
    mi = means.select(F.col("i").alias("mi_i"), F.col("m_fp").alias("mi"))
    mj = means.select(F.col("i").alias("mj_i"), F.col("m_fp").alias("mj"))
    nD = F.col("n").cast("double")
    sg = F.lit(float(_CKA_SG))
    return (
        full.join(F.broadcast(mi), F.col("i") == F.col("mi_i"))
        .join(F.broadcast(mj), F.col("j") == F.col("mj_i"))
        .crossJoin(F.broadcast(n_df))
        .select(
            "i",
            "j",
            "s_fp",
            "mi",
            "n",
            (
                (
                    F.col("s_fp").cast("double") / sg
                    - (F.col("mi").cast("double") / sg)
                    * (F.col("mj").cast("double") / sg)
                    / nD
                )
                / nD
            ).alias("c"),
        )
    )



_CKA_SQL = f"""
WITH comp AS MATERIALIZED (
    SELECT CAST(embedding AS DOUBLE[]) AS x FROM embeddings
),
cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
pos AS (SELECT unnest(generate_series(1, {_CKA_DIM})) AS p),
gram AS MATERIALIZED (
    SELECT i.p AS i, j.p AS j,
           CAST(SUM(CAST(FLOOR(c.x[i.p] * c.x[j.p] * {_CKA_SG} + 0.5)
                         AS BIGINT)) AS BIGINT) AS s_fp
    FROM comp c, pos i, pos j
    GROUP BY i.p, j.p
),
mean_fp AS MATERIALIZED (
    SELECT i.p AS i,
           CAST(SUM(CAST(FLOOR(c.x[i.p] * {_CKA_SG} + 0.5) AS BIGINT))
                AS BIGINT) AS m_fp
    FROM comp c, pos i GROUP BY i.p
),
cov AS (
    SELECT g.i, g.j,
           (CAST(g.s_fp AS DOUBLE) / {_CKA_SG}.0
            - (CAST(mi.m_fp AS DOUBLE) / {_CKA_SG}.0)
              * (CAST(mj.m_fp AS DOUBLE) / {_CKA_SG}.0)
              / CAST(cnt.n AS DOUBLE))
           / CAST(cnt.n AS DOUBLE) AS c
    FROM gram g
    JOIN mean_fp mi ON mi.i = g.i
    JOIN mean_fp mj ON mj.i = g.j
    CROSS JOIN cnt
),
blocks AS (
    SELECT
        CAST(SUM(CASE WHEN i <= {_CKA_SPLIT} AND j <= {_CKA_SPLIT}
            THEN CAST(FLOOR(c * c * {_CKA_SF} + 0.5) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS xx_fp,
        CAST(SUM(CASE WHEN i > {_CKA_SPLIT} AND j > {_CKA_SPLIT}
            THEN CAST(FLOOR(c * c * {_CKA_SF} + 0.5) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS yy_fp,
        CAST(SUM(CASE WHEN i <= {_CKA_SPLIT} AND j > {_CKA_SPLIT}
            THEN CAST(FLOOR(c * c * {_CKA_SF} + 0.5) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS xy_fp
    FROM cov
)
SELECT cnt.n AS n_vectors,
       ROUND(CAST(xx_fp AS DOUBLE) / {_CKA_SF}.0, 6) AS frob_xx,
       ROUND(CAST(yy_fp AS DOUBLE) / {_CKA_SF}.0, 6) AS frob_yy,
       ROUND(CAST(xy_fp AS DOUBLE) / {_CKA_SF}.0, 6) AS frob_xy,
       ROUND(CAST(xy_fp AS DOUBLE)
             / SQRT(CAST(xx_fp AS DOUBLE) * CAST(yy_fp AS DOUBLE)), 6)
           AS cka
FROM blocks, cnt
""".strip()


@query("cka_embedding_halves", oracle=_CKA_SQL)
def cka_embedding_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA (centered kernel alignment) between the first and
    second 32 dimensions of the embedding corpus — the representation-
    redundancy diagnostic (CKA ~ 1: the halves encode the same geometry,
    so Matryoshka-style truncation is nearly free; CKA ~ 0: the tail
    dims carry independent structure). Uses the feature-space identity
    ``CKA = ||Cov_xy||_F^2-style ratio`` so the DATA-SIZED work is the
    SAME one-pass dim^2 Gram aggregate as the PCA family (linalg.py —
    O(dim^2) shuffle, corpus-independent) plus a 64-long mean vector;
    everything after is arithmetic on the 4096-entry bounded frame:
    centered covariances as identical double expressions, per-entry
    squared terms re-fixed-pointed (1e-12) before the three block sums,
    one sqrt at the end. No collect anywhere — the bounded tail stays
    relational."""
    cov = _centered_cov_frame(spark, sf_dir)
    n_df = cov.select("n").limit(1)
    t_fp = F.floor(
        F.col("c") * F.col("c") * F.lit(float(_CKA_SF)) + F.lit(0.5)
    ).cast("long")
    in_x = F.col("i") <= _CKA_SPLIT
    in_y = F.col("j") > _CKA_SPLIT
    blocks = cov.agg(
        F.sum(F.when(in_x & (F.col("j") <= _CKA_SPLIT), t_fp).otherwise(0))
        .cast("long").alias("xx_fp"),
        F.sum(F.when((F.col("i") > _CKA_SPLIT) & in_y, t_fp).otherwise(0))
        .cast("long").alias("yy_fp"),
        F.sum(F.when(in_x & in_y, t_fp).otherwise(0))
        .cast("long").alias("xy_fp"),
    )
    out = blocks.crossJoin(F.broadcast(n_df))
    sf = F.lit(float(_CKA_SF))
    return out.select(
        F.col("n").alias("n_vectors"),
        F.round(F.col("xx_fp").cast("double") / sf, 6).alias("frob_xx"),
        F.round(F.col("yy_fp").cast("double") / sf, 6).alias("frob_yy"),
        F.round(F.col("xy_fp").cast("double") / sf, 6).alias("frob_xy"),
        F.round(
            F.col("xy_fp").cast("double")
            / F.sqrt(
                F.col("xx_fp").cast("double") * F.col("yy_fp").cast("double")
            ),
            6,
        ).alias("cka"),
    )


# --- effective rank + anisotropy of the embedding corpus -----------------------

_ERANK_SQL = f"""
WITH comp AS MATERIALIZED (
    SELECT CAST(embedding AS DOUBLE[]) AS x FROM embeddings
),
cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
pos AS (SELECT unnest(generate_series(1, {_CKA_DIM})) AS p),
gram AS MATERIALIZED (
    SELECT i.p AS i, j.p AS j,
           CAST(SUM(CAST(FLOOR(c.x[i.p] * c.x[j.p] * {_CKA_SG} + 0.5)
                         AS BIGINT)) AS BIGINT) AS s_fp
    FROM comp c, pos i, pos j
    GROUP BY i.p, j.p
),
mean_fp AS MATERIALIZED (
    SELECT i.p AS i,
           CAST(SUM(CAST(FLOOR(c.x[i.p] * {_CKA_SG} + 0.5) AS BIGINT))
                AS BIGINT) AS m_fp
    FROM comp c, pos i GROUP BY i.p
),
cov AS (
    SELECT g.i, g.j,
           (CAST(g.s_fp AS DOUBLE) / {_CKA_SG}.0
            - (CAST(mi.m_fp AS DOUBLE) / {_CKA_SG}.0)
              * (CAST(mj.m_fp AS DOUBLE) / {_CKA_SG}.0)
              / CAST(cnt.n AS DOUBLE))
           / CAST(cnt.n AS DOUBLE) AS c
    FROM gram g
    JOIN mean_fp mi ON mi.i = g.i
    JOIN mean_fp mj ON mj.i = g.j
    CROSS JOIN cnt
),
sums AS (
    SELECT
        CAST(SUM(CASE WHEN i = j
            THEN CAST(FLOOR(c * {_CKA_SF} + 0.5) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS tr_fp,
        CAST(SUM(CAST(FLOOR(c * c * {_CKA_SF} + 0.5) AS BIGINT)) AS BIGINT)
            AS frob_fp
    FROM cov
),
extra AS (
    SELECT
        CAST(SUM(CASE WHEN g.i = g.j
            THEN CAST(FLOOR((CAST(m.m_fp AS DOUBLE) / {_CKA_SG}.0
                             / CAST(cnt.n AS DOUBLE))
                            * (CAST(m.m_fp AS DOUBLE) / {_CKA_SG}.0
                               / CAST(cnt.n AS DOUBLE))
                            * {_CKA_SF} + 0.5) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS mean_sq_fp,
        CAST(SUM(CASE WHEN g.i = g.j
            THEN CAST(FLOOR(CAST(g.s_fp AS DOUBLE) / {_CKA_SG}.0
                            / CAST(cnt.n AS DOUBLE) * {_CKA_SF} + 0.5)
                      AS BIGINT) ELSE 0 END) AS BIGINT) AS e_norm_sq_fp
    FROM gram g
    JOIN mean_fp m ON m.i = g.i
    CROSS JOIN cnt
)
SELECT cnt.n AS n_vectors,
       ROUND(CAST(tr_fp AS DOUBLE) / {_CKA_SF}.0, 6) AS trace_cov,
       ROUND(CAST(frob_fp AS DOUBLE) / {_CKA_SF}.0, 6) AS frob_sq_cov,
       ROUND((CAST(tr_fp AS DOUBLE) / {_CKA_SF}.0)
             * (CAST(tr_fp AS DOUBLE) / {_CKA_SF}.0)
             / (CAST(frob_fp AS DOUBLE) / {_CKA_SF}.0), 6)
           AS effective_rank,
       ROUND((CAST(mean_sq_fp AS DOUBLE) / {_CKA_SF}.0)
             / (CAST(e_norm_sq_fp AS DOUBLE) / {_CKA_SF}.0), 6)
           AS anisotropy
FROM sums, extra, cnt
""".strip()


@query("effective_rank_embeddings", oracle=_ERANK_SQL)
def effective_rank_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective rank (participation ratio) and anisotropy of the
    embedding corpus — the two spectrum diagnostics every embedding
    pipeline should watch (collapsed representations -> effective rank
    << dim; the "narrow cone" pathology -> anisotropy near 1), computed
    WITHOUT any eigendecomposition: PR = tr(C)^2 / ||C||_F^2 needs only
    the covariance trace and Frobenius norm, and the anisotropy proxy
    E[cos(x,y)] ~ ||mean||^2 / E||x||^2 needs only the mean vector and
    the Gram diagonal — all from the SAME one-pass dim^2 Gram aggregate
    as the PCA/CKA family. Bounded tail stays relational (per-entry
    1e-12 fixed point before the 4096-entry sums); one sqrt-free row
    out."""
    cov = _centered_cov_frame(spark, sf_dir)
    n_df = cov.select("n").limit(1)
    sg = F.lit(float(_CKA_SG))
    sf = F.lit(float(_CKA_SF))
    nD = F.col("n").cast("double")
    diag = F.col("i") == F.col("j")
    sums = cov.agg(
        F.sum(
            F.when(diag, F.floor(F.col("c") * sf + F.lit(0.5)).cast("long"))
            .otherwise(0)
        ).cast("long").alias("tr_fp"),
        F.sum(
            F.floor(F.col("c") * F.col("c") * sf + F.lit(0.5)).cast("long")
        ).cast("long").alias("frob_fp"),
        F.sum(
            F.when(
                diag,
                F.floor(
                    (F.col("mi").cast("double") / sg / nD)
                    * (F.col("mi").cast("double") / sg / nD)
                    * sf
                    + F.lit(0.5)
                ).cast("long"),
            ).otherwise(0)
        ).cast("long").alias("mean_sq_fp"),
        F.sum(
            F.when(
                diag,
                F.floor(
                    F.col("s_fp").cast("double") / sg / nD * sf + F.lit(0.5)
                ).cast("long"),
            ).otherwise(0)
        ).cast("long").alias("e_norm_sq_fp"),
    )
    out = sums.crossJoin(F.broadcast(n_df))
    tr = F.col("tr_fp").cast("double") / sf
    fr = F.col("frob_fp").cast("double") / sf
    return out.select(
        F.col("n").alias("n_vectors"),
        F.round(tr, 6).alias("trace_cov"),
        F.round(fr, 6).alias("frob_sq_cov"),
        F.round(tr * tr / fr, 6).alias("effective_rank"),
        F.round(
            (F.col("mean_sq_fp").cast("double") / sf)
            / (F.col("e_norm_sq_fp").cast("double") / sf),
            6,
        ).alias("anisotropy"),
    )


# --- restricted mean survival time (area under KM to one week) -----------------

_RMST_TAU_H = 168  # one week, exact integer hours

_RMST_SQL = f"""
WITH RECURSIVE mic AS (
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
),
steps AS (
    SELECT ROW_NUMBER() OVER (ORDER BY dur) AS rn, dur, deaths, at_risk
    FROM risk WHERE deaths > 0
),
km AS (
    SELECT rn, dur,
           1.0 * (1.0 - CAST(deaths AS DOUBLE) / CAST(at_risk AS DOUBLE)) AS surv
    FROM steps WHERE rn = 1
    UNION ALL
    SELECT s.rn, s.dur,
           km.surv * (1.0 - CAST(s.deaths AS DOUBLE) / CAST(s.at_risk AS DOUBLE))
    FROM km JOIN steps s ON s.rn = km.rn + 1
),
segs AS (
    SELECT rn, dur, surv,
           LEAD(dur, 1, {_RMST_TAU_H}) OVER (ORDER BY rn) AS next_dur
    FROM km
),
pieces AS (
    SELECT CAST(FLOOR(CAST(LEAST(next_dur, {_RMST_TAU_H})
                           - LEAST(dur, {_RMST_TAU_H}) AS DOUBLE)
                      * surv * 1000000000.0 + 0.5) AS BIGINT) AS area_fp
    FROM segs
),
head AS (
    SELECT CAST(LEAST(MIN(dur), {_RMST_TAU_H}) AS BIGINT) AS first_dur,
           CAST(COUNT(*) AS BIGINT) AS n_steps
    FROM km
)
SELECT CAST({_RMST_TAU_H} AS BIGINT) AS tau_h,
       head.n_steps,
       ROUND(CAST(head.first_dur AS DOUBLE)
             + CAST(SUM(area_fp) AS DOUBLE) / 1000000000.0, 6) AS rmst_h
FROM pieces, head
GROUP BY head.first_dur, head.n_steps
""".strip()


@query("rmst_to_purchase", oracle=_RMST_SQL)
def rmst_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time to first purchase, truncated at one
    week — "expected purchase-free hours in the first {_RMST_TAU_H}" —
    the scalar summary clinicians (and growth teams) quote when median
    survival is undefined; completes the survival family (KM curve,
    Greenwood bands, Nelson-Aalen, log-rank). The step-function integral
    is computed from the SAME forced-order KM chain: segment widths are
    exact integer hours, each ``width * S_i`` piece is fixed-pointed
    (1e-9) before the cross-step sum, and the pre-first-death strip
    enters as the exact integer ``min(t_1, tau)`` (survival 1 there)."""
    risk = _survival_risk_table(spark, sf_dir).filter(F.col("deaths") > 0)
    packed = risk.agg(
        F.sort_array(
            F.collect_list(F.struct("dur", "deaths", "at_risk"))
        ).alias("arr")
    )
    surv = _km_surv_chain()
    km = packed.select(
        F.posexplode(F.arrays_zip(F.col("arr"), surv.alias("surv_arr")))
    ).select(
        (F.col("pos") + 1).alias("rn"),
        F.col("col.arr.dur").alias("dur"),
        F.col("col.surv_arr").alias("surv"),
    )
    tau = F.lit(_RMST_TAU_H)
    segs = km.withColumn(
        "next_dur",
        F.lead("dur", 1, _RMST_TAU_H).over(Window.orderBy("rn")),
    )
    area_fp = F.floor(
        (F.least(F.col("next_dur"), tau) - F.least(F.col("dur"), tau))
        .cast("double")
        * F.col("surv")
        * F.lit(1_000_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    agg = segs.agg(
        F.sum(area_fp).cast("long").alias("area_sum"),
        F.least(F.min("dur"), tau.cast("long")).cast("long").alias("first_dur"),
        F.count(F.lit(1)).cast("long").alias("n_steps"),
    )
    return agg.select(
        F.lit(_RMST_TAU_H).cast("long").alias("tau_h"),
        "n_steps",
        F.round(
            F.col("first_dur").cast("double")
            + F.col("area_sum").cast("double") / F.lit(1_000_000_000.0),
            6,
        ).alias("rmst_h"),
    )


# --- mixture SPRT: always-valid p-value over the event stream ------------------

#: mSPRT design (normal-approximation Bernoulli): H0 p0 = 0.15, mixing
#: prior tau = 0.1. With per-observation variance q0 = p0*(1-p0), the
#: normal-mixture likelihood ratio has the closed form
#:   ln Lambda_i = 0.5*ln(q0/(q0 + i*tau^2))
#:                 + (S - i*p0)^2 * tau^2 / (2*q0*(q0 + i*tau^2))
#: — evaluated per position from the SAME packed
#: (i, S) prefix sum as the Wald SPRT; the always-valid p-value is
#: 1/max_i Lambda_i (Howard/Ramdas-style). All literals pinned.
_MSPRT_P0 = "0.15"
_MSPRT_Q0 = "0.1275"   # p0*(1-p0), pinned so both engines parse one literal
_MSPRT_T2 = "0.01"     # tau^2

_MSPRT_SQL = f"""
WITH ordered AS (
    SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
           ROW_NUMBER() OVER (ORDER BY ts, event_id) AS i
    FROM events
),
walk AS (
    SELECT i,
           CAST(SUM(pos) OVER (
               ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS s
    FROM ordered
),
lam AS (
    SELECT i, s,
           0.5 * LN({_MSPRT_Q0}
                    / ({_MSPRT_Q0} + CAST(i AS DOUBLE) * {_MSPRT_T2}))
           + (CAST(s AS DOUBLE) - CAST(i AS DOUBLE) * {_MSPRT_P0})
             * (CAST(s AS DOUBLE) - CAST(i AS DOUBLE) * {_MSPRT_P0})
             * {_MSPRT_T2}
             / (2.0 * {_MSPRT_Q0}
                * ({_MSPRT_Q0} + CAST(i AS DOUBLE) * {_MSPRT_T2})) AS ln_lam
    FROM walk
)
SELECT CAST(MAX(i) AS BIGINT) AS n_total,
       ROUND(MAX(ln_lam), 6) AS max_ln_lambda,
       CAST(MIN(CASE WHEN ln_lam = (SELECT MAX(ln_lam) FROM lam)
                     THEN i END) AS BIGINT) AS argmax_i,
       ROUND(LEAST(1.0, EXP(-MAX(ln_lam))), 6) AS p_always_valid
FROM lam
""".strip()


@query("msprt_always_valid_pvalue", oracle=_MSPRT_SQL)
def msprt_always_valid_pvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture SPRT always-valid p-value for "purchase rate != 0.15"
    over the event stream — the anytime-inference companion to the Wald
    SPRT (peek at every observation, the guarantee still holds:
    p_av = 1/max_i Lambda_i). ln Lambda_i is a closed form of the packed
    (position, cum_positives) pair, which rides the SAME distributed
    prefix sum (range-partitioned, no single-partition window); the
    maximum is one MAX aggregate over per-row identical double
    expressions (every engine computes the same ln Lambda values, so
    MAX and the min-position argmax are deterministic), and the single
    EXP runs once on the aggregated maximum. Pinned literals:
    p0={_MSPRT_P0}, tau^2={_MSPRT_T2}."""
    from apache_beam_challange_spark.plans.coverage import (
        distributed_prefix_sum,
    )

    ev = load_table(spark, sf_dir, "events")
    packed = ev.select(
        F.col("ts"),
        F.col("event_id"),
        (
            (F.col("event_type") == "purchase").cast("long")
            * F.lit(_SPRT_PACK)
            + F.lit(1)
        ).alias("v"),
    )
    cum = distributed_prefix_sum(packed, [F.col("ts"), F.col("event_id")], "v")
    iD = (F.col("cum") % F.lit(_SPRT_PACK)).cast("double")
    sD = F.expr(f"cum div {_SPRT_PACK}").cast("double")
    q0 = F.lit(float(_MSPRT_Q0))
    t2 = F.lit(float(_MSPRT_T2))
    p0 = F.lit(float(_MSPRT_P0))
    ln_lam = (
        F.lit(0.5) * F.log(q0 / (q0 + iD * t2))
        + (sD - iD * p0) * (sD - iD * p0) * t2
        / (F.lit(2.0) * q0 * (q0 + iD * t2))
    )
    lam = cum.select(
        (F.col("cum") % F.lit(_SPRT_PACK)).alias("i"), ln_lam.alias("ln_lam")
    )
    # argmax with min-i tie-break: join back on the max (bounded row)
    mx = lam.agg(F.max("ln_lam").alias("mx"))
    arg = (
        lam.join(F.broadcast(mx), lam.ln_lam == mx.mx)
        .agg(F.min("i").cast("long").alias("argmax_i"))
    )
    fin = lam.agg(
        F.max("i").cast("long").alias("n_total"),
        F.max("ln_lam").alias("mxl"),
    ).crossJoin(F.broadcast(arg))
    return fin.select(
        "n_total",
        F.round(F.col("mxl"), 6).alias("max_ln_lambda"),
        "argmax_i",
        F.round(
            F.least(F.lit(1.0), F.exp(-F.col("mxl"))), 6
        ).alias("p_always_valid"),
    )


# --- quantile treatment effects (weekend, type-1 cent quantiles) ---------------

_QTE_SQL = """
WITH base AS (
    SELECT CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS w,
           CAST(FLOOR(value * 100) AS BIGINT) AS vb
    FROM events
),
hist AS (
    SELECT w, vb, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY w, vb
),
cum AS (
    SELECT w, vb,
           CAST(SUM(c) OVER (
               PARTITION BY w ORDER BY vb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cc,
           CAST(SUM(c) OVER (PARTITION BY w) AS BIGINT) AS n
    FROM hist
),
q AS (
    SELECT w, MAX(n) AS n,
           MIN(CASE WHEN 4 * cc >= n THEN vb END) AS q25,
           MIN(CASE WHEN 2 * cc >= n THEN vb END) AS q50,
           MIN(CASE WHEN 4 * cc >= 3 * n THEN vb END) AS q75
    FROM cum GROUP BY w
)
SELECT t.n AS n_treated, c.n AS n_control,
       t.q25 AS q25_treated, c.q25 AS q25_control,
       CAST(t.q25 - c.q25 AS BIGINT) AS qte25,
       t.q50 AS q50_treated, c.q50 AS q50_control,
       CAST(t.q50 - c.q50 AS BIGINT) AS qte50,
       t.q75 AS q75_treated, c.q75 AS q75_control,
       CAST(t.q75 - c.q75 AS BIGINT) AS qte75
FROM (SELECT * FROM q WHERE w = 1) t, (SELECT * FROM q WHERE w = 0) c
""".strip()


@query("qte_weekend_value", oracle=_QTE_SQL)
def qte_weekend_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects of "weekend" on value at the three
    quartiles — where in the distribution does the effect live? (A mean
    shift the ATE reports can hide a pure tail effect; QTE separates
    them.) Per-arm type-1 (lower) quantiles via EXACT integer threshold
    picks over the per-arm cent histograms (``k*cum >= q*n`` — zero
    floats anywhere, the ``weighted_quantiles`` discipline), differenced
    per quartile. One conditional aggregate + domain-bounded windows."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.when(F.weekday("ts") >= 5, F.lit(1)).otherwise(F.lit(0)).alias("w"),
        F.floor(F.col("value") * 100).cast("long").alias("vb"),
    )
    hist = base.groupBy("w", "vb").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wcum = (
        Window.partitionBy("w")
        .orderBy("vb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("w")
    cum = hist.select(
        "w",
        "vb",
        F.sum("c").over(wcum).cast("long").alias("cc"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )
    pick = lambda cond: F.min(F.when(cond, F.col("vb")))  # noqa: E731
    q = cum.groupBy("w").agg(
        F.max("n").alias("n"),
        pick(F.lit(4) * F.col("cc") >= F.col("n")).alias("q25"),
        pick(F.lit(2) * F.col("cc") >= F.col("n")).alias("q50"),
        pick(F.lit(4) * F.col("cc") >= F.lit(3) * F.col("n")).alias("q75"),
    )
    t = q.filter(F.col("w") == 1).select(
        F.col("n").alias("n_treated"),
        F.col("q25").alias("q25_treated"),
        F.col("q50").alias("q50_treated"),
        F.col("q75").alias("q75_treated"),
    )
    c = q.filter(F.col("w") == 0).select(
        F.col("n").alias("n_control"),
        F.col("q25").alias("q25_control"),
        F.col("q50").alias("q50_control"),
        F.col("q75").alias("q75_control"),
    )
    out = t.crossJoin(F.broadcast(c))
    return out.select(
        "n_treated",
        "n_control",
        "q25_treated",
        "q25_control",
        (F.col("q25_treated") - F.col("q25_control")).cast("long").alias("qte25"),
        "q50_treated",
        "q50_control",
        (F.col("q50_treated") - F.col("q50_control")).cast("long").alias("qte50"),
        "q75_treated",
        "q75_control",
        (F.col("q75_treated") - F.col("q75_control")).cast("long").alias("qte75"),
    )


# --- symmetric trimmed mean (exact histogram walk) ------------------------------

_TRIM_PCT_NUM = 1   # trim 1/10 from each tail
_TRIM_PCT_DEN = 10

_TRIM_SQL = f"""
WITH hist AS (
    SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS vb,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
cum AS (
    SELECT event_type, vb, c,
           CAST(SUM(c) OVER (
               PARTITION BY event_type ORDER BY vb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cc,
           CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM hist
),
kept AS (
    SELECT event_type, vb, n,
           -- rows of this bucket inside [lo+1, n-lo] by global position:
           -- bucket occupies positions (cc-c+1 .. cc)
           GREATEST(0, LEAST(cc, n - (n * {_TRIM_PCT_NUM}) // {_TRIM_PCT_DEN})
                       - GREATEST(cc - c,
                                  (n * {_TRIM_PCT_NUM}) // {_TRIM_PCT_DEN}))
               AS kc
    FROM cum
)
SELECT event_type,
       MAX(n) AS n,
       CAST(SUM(kc) AS BIGINT) AS n_kept,
       ROUND(CAST(SUM(vb * kc) AS DOUBLE) / CAST(SUM(kc) AS DOUBLE), 6)
           AS trimmed_mean_cents
FROM kept
GROUP BY event_type
ORDER BY event_type
""".strip()


@query("trimmed_mean_value_by_type", oracle=_TRIM_SQL)
def trimmed_mean_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric 10% trimmed mean per event type — the robust-location
    companion to the winsorized mean (trim DROPS the tails instead of
    clamping them). The exact-integer trick: a cent bucket occupies
    global positions (cum-c+1 .. cum), so the kept count per bucket is
    one interval intersection with [lo+1, n-lo] — no per-row ranking,
    no data-sized window; trimmed sum and count stay exact BIGINTs with
    one final division. One aggregate + domain-bounded windows."""
    ev = load_table(spark, sf_dir, "events")
    hist = ev.groupBy(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("vb")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("vb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "vb",
        "c",
        F.sum("c").over(wcum).cast("long").alias("cc"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )
    lo = F.expr(f"(n * {_TRIM_PCT_NUM}) div {_TRIM_PCT_DEN}")
    kc = F.greatest(
        F.lit(0),
        F.least(F.col("cc"), F.col("n") - lo)
        - F.greatest(F.col("cc") - F.col("c"), lo),
    )
    kept = cum.select("event_type", "vb", "n", kc.alias("kc"))
    return (
        kept.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.sum("kc").cast("long").alias("n_kept"),
            F.round(
                F.sum(F.col("vb") * F.col("kc")).cast("double")
                / F.sum("kc").cast("double"),
                6,
            ).alias("trimmed_mean_cents"),
        )
        .orderBy("event_type")
    )


# --- FWL partialled effect (hour fixed effects) ---------------------------------

_FWL_SQL = """
WITH base AS (
    SELECT CAST(hour(ts) AS BIGINT) AS h,
           CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS w,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
    FROM events
),
strata AS (
    SELECT h,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(w) AS BIGINT) AS n1,
           CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
           CAST(SUM(w * y) AS DECIMAL(38,0)) AS s1y
    FROM base GROUP BY h
),
terms AS (
    SELECT
        CAST(FLOOR((CAST(s1y AS DOUBLE)
                    - CAST(n1 AS DOUBLE) * CAST(sy AS DOUBLE)
                      / CAST(n AS DOUBLE))
                   * 1000000.0 + 0.5) AS BIGINT) AS cov_fp,
        CAST(FLOOR(CAST(n1 AS DOUBLE)
                   * (1.0 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * 1000000.0 + 0.5) AS BIGINT) AS var_fp,
        n1, n
    FROM strata
)
SELECT CAST(SUM(n) AS BIGINT) AS n,
       CAST(SUM(n1) AS BIGINT) AS n_treated,
       ROUND(CAST(SUM(var_fp) AS DOUBLE) / 1000000.0, 6) AS var_w_resid,
       ROUND(CAST(SUM(cov_fp) AS DOUBLE) / CAST(SUM(var_fp) AS DOUBLE), 6)
           AS fwl_effect_cents
FROM terms
""".strip()


@query("fwl_weekend_effect_hour_fe", oracle=_FWL_SQL)
def fwl_weekend_effect_hour_fe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression-adjusted weekend effect with hour-of-day FIXED EFFECTS
    via Frisch-Waugh-Lovell partialling — the variance-weighted
    regression estimate next to the equal-n-weighted
    ``stratified_ate_weekend_value`` (the two differ exactly when effect
    and treatment share vary across strata; reading them together is the
    standard heterogeneity check). FWL collapses to closed form on
    per-stratum exact sums: cov(resid_y, resid_w) = sum_h (S1y_h -
    n1_h*ybar_h) and var(resid_w) = sum_h n1_h(1 - n1_h/n_h), each term
    fixed-pointed before the cross-stratum sum. One conditional
    aggregate; 24-bounded tail."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.hour("ts").cast("long").alias("h"),
        F.when(F.weekday("ts") >= 5, F.lit(1)).otherwise(F.lit(0)).alias("w"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    strata = base.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("w").cast("long").alias("n1"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("w") * F.col("y")).cast("decimal(38,0)").alias("s1y"),
    )
    nD = F.col("n").cast("double")
    n1D = F.col("n1").cast("double")
    cov_fp = F.floor(
        (F.col("s1y").cast("double") - n1D * F.col("sy").cast("double") / nD)
        * F.lit(_FP)
        + F.lit(0.5)
    ).cast("long")
    var_fp = F.floor(
        n1D * (F.lit(1.0) - n1D / nD) * F.lit(_FP) + F.lit(0.5)
    ).cast("long")
    agg = strata.select(
        "n", "n1", cov_fp.alias("cov_fp"), var_fp.alias("var_fp")
    ).agg(
        F.sum("n").cast("long").alias("n_all"),
        F.sum("n1").cast("long").alias("n_treated"),
        F.sum("cov_fp").cast("long").alias("covs"),
        F.sum("var_fp").cast("long").alias("vars"),
    )
    return agg.select(
        F.col("n_all").alias("n"),
        "n_treated",
        F.round(F.col("vars").cast("double") / F.lit(_FP), 6).alias(
            "var_w_resid"
        ),
        F.round(
            F.col("covs").cast("double") / F.col("vars").cast("double"), 6
        ).alias("fwl_effect_cents"),
    )


# --- Theil between/within decomposition by nation --------------------------------

_THEIL_DECOMP_SQL = """
WITH rev AS (
    SELECT c.c_custkey, n.n_name,
           CAST(COALESCE(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                                  AS BIGINT)), 0) AS BIGINT) AS r
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, n.n_name
),
pos AS (SELECT n_name, r FROM rev WHERE r > 0),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(r AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s
    FROM pos
),
grp AS (
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS ng,
           CAST(SUM(CAST(r AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sg
    FROM pos GROUP BY n_name
),
within_terms AS (
    SELECT p.n_name,
           CAST(FLOOR((CAST(p.r AS DOUBLE)
                       / (CAST(g.sg AS DOUBLE) / CAST(g.ng AS DOUBLE)))
                      * LN(CAST(p.r AS DOUBLE)
                           / (CAST(g.sg AS DOUBLE) / CAST(g.ng AS DOUBLE)))
                      * 1000000000.0 + 0.5) AS BIGINT) AS t_fp
    FROM pos p JOIN grp g ON g.n_name = p.n_name
),
tw AS (
    SELECT w.n_name, CAST(SUM(t_fp) AS BIGINT) AS t_sum
    FROM within_terms w GROUP BY w.n_name
),
parts AS (
    SELECT
        -- within: sum over groups of (s_g/S) * T_g
        CAST(SUM(CAST(FLOOR((CAST(g.sg AS DOUBLE) / CAST(t.s AS DOUBLE))
                            * (CAST(tw.t_sum AS DOUBLE) / 1000000000.0
                               / CAST(g.ng AS DOUBLE))
                            * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT)
            AS within_fp,
        -- between: sum over groups of (s_g/S) * ln( (s_g/S) / (n_g/N) )
        CAST(SUM(CAST(FLOOR((CAST(g.sg AS DOUBLE) / CAST(t.s AS DOUBLE))
                            * LN((CAST(g.sg AS DOUBLE) / CAST(t.s AS DOUBLE))
                                 / (CAST(g.ng AS DOUBLE)
                                    / CAST(t.n AS DOUBLE)))
                            * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT)
            AS between_fp
    FROM grp g JOIN tw ON tw.n_name = g.n_name CROSS JOIN tot t
)
SELECT t.n, ROUND(CAST(between_fp AS DOUBLE) / 1000000000.0, 6) AS theil_between,
       ROUND(CAST(within_fp AS DOUBLE) / 1000000000.0, 6) AS theil_within,
       ROUND(CAST(between_fp AS DOUBLE) / 1000000000.0
             + CAST(within_fp AS DOUBLE) / 1000000000.0, 6) AS theil_total
FROM parts, tot t
""".strip()


@query("theil_decomposition_by_nation", oracle=_THEIL_DECOMP_SQL)
def theil_decomposition_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T decomposition of customer-revenue inequality into BETWEEN-
    nation and WITHIN-nation components — the property Gini lacks and the
    reason ``theil_index_revenue`` exists: T = sum_g (s_g/S) ln((s_g/S)/
    (n_g/N)) + sum_g (s_g/S) T_g, additively exact. Per-customer within
    terms and per-group between terms each fixed-pointed (1e-9) before
    their sums (the wave's ln discipline); the decomposition identity is
    test-pinned against the direct global Theil up to fixed-point
    granularity. Data-sized work: the custkey aggregate + one pass of
    within terms; groups are nation-bounded."""
    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(
            od.groupBy("o_custkey").agg(
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
                ).alias("lr")
            ),
            cust.c_custkey == F.col("o_custkey"),
            "left",
        )
        .select(
            "n_name", F.coalesce("lr", F.lit(0)).cast("long").alias("r")
        )
    )
    pos = rev.filter(F.col("r") > 0).localCheckpoint()  # feeds tot+grp+terms
    tot = pos.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("r").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s"),
    )
    grp = pos.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(F.col("r").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sg"),
    )
    mu_g = F.col("sg").cast("double") / F.col("ng").cast("double")
    within_terms = (
        pos.join(F.broadcast(grp), "n_name")
        .select(
            "n_name",
            F.floor(
                (F.col("r").cast("double") / mu_g)
                * F.log(F.col("r").cast("double") / mu_g)
                * F.lit(1_000_000_000.0)
                + F.lit(0.5)
            ).cast("long").alias("t_fp"),
        )
        .groupBy("n_name")
        .agg(F.sum("t_fp").cast("long").alias("t_sum"))
    )
    share = F.col("sg").cast("double") / F.col("s").cast("double")
    joined = grp.join(within_terms, "n_name").crossJoin(F.broadcast(tot))
    within_fp = F.floor(
        share
        * (
            F.col("t_sum").cast("double")
            / F.lit(1_000_000_000.0)
            / F.col("ng").cast("double")
        )
        * F.lit(1_000_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    between_fp = F.floor(
        share
        * F.log(
            share / (F.col("ng").cast("double") / F.col("n").cast("double"))
        )
        * F.lit(1_000_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    parts = joined.agg(
        F.sum(within_fp).cast("long").alias("w_fp"),
        F.sum(between_fp).cast("long").alias("b_fp"),
        F.max("n").cast("long").alias("n"),
    )
    b = F.col("b_fp").cast("double") / F.lit(1_000_000_000.0)
    w = F.col("w_fp").cast("double") / F.lit(1_000_000_000.0)
    return parts.select(
        "n",
        F.round(b, 6).alias("theil_between"),
        F.round(w, 6).alias("theil_within"),
        F.round(b + w, 6).alias("theil_total"),
    )


# --- mutual information between event type and hour -----------------------------

_MI_SQL = """
WITH joint AS (
    SELECT event_type AS t, CAST(hour(ts) AS BIGINT) AS h,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM joint),
rowm AS (SELECT t, CAST(SUM(c) AS BIGINT) AS ct FROM joint GROUP BY t),
colm AS (SELECT h, CAST(SUM(c) AS BIGINT) AS ch FROM joint GROUP BY h),
mi_terms AS (
    SELECT CAST(FLOOR((CAST(j.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
                      * LN(CAST(j.c AS DOUBLE) * CAST(tot.n AS DOUBLE)
                           / (CAST(r.ct AS DOUBLE) * CAST(co.ch AS DOUBLE)))
                      * 1000000000.0 + 0.5) AS BIGINT) AS t_fp
    FROM joint j
    JOIN rowm r ON r.t = j.t
    JOIN colm co ON co.h = j.h
    CROSS JOIN tot
),
hr AS (
    SELECT CAST(SUM(CAST(FLOOR(-(CAST(ct AS DOUBLE) / CAST(tot.n AS DOUBLE))
                               * LN(CAST(ct AS DOUBLE) / CAST(tot.n AS DOUBLE))
                               * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT)
        AS h_row_fp
    FROM rowm, tot GROUP BY tot.n
),
hc AS (
    SELECT CAST(SUM(CAST(FLOOR(-(CAST(ch AS DOUBLE) / CAST(tot.n AS DOUBLE))
                               * LN(CAST(ch AS DOUBLE) / CAST(tot.n AS DOUBLE))
                               * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT)
        AS h_col_fp
    FROM colm, tot GROUP BY tot.n
)
SELECT tot.n,
       ROUND(CAST(SUM(t_fp) AS DOUBLE) / 1000000000.0, 6) AS mi_nats,
       ROUND(CAST(hr.h_row_fp AS DOUBLE) / 1000000000.0, 6) AS h_type,
       ROUND(CAST(hc.h_col_fp AS DOUBLE) / 1000000000.0, 6) AS h_hour,
       ROUND(CAST(SUM(t_fp) AS DOUBLE)
             / LEAST(CAST(hr.h_row_fp AS DOUBLE),
                     CAST(hc.h_col_fp AS DOUBLE)), 6) AS nmi
FROM mi_terms, hr, hc, tot
GROUP BY tot.n, hr.h_row_fp, hc.h_col_fp
""".strip()


@query("mi_type_hour_dependence", oracle=_MI_SQL)
def mi_type_hour_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and hour-of-day (nats),
    with both marginal entropies and the min-entropy-normalized NMI —
    the information-theoretic dependence measure next to the chi-square
    test (chi2 scales with n; MI is the effect size feature-selection
    pipelines actually rank by). Every plogp term is fixed-pointed
    (1e-9) before its sum over the TYPES x 24 bounded contingency; one
    map-side-combined joint aggregate is the only data-sized work."""
    ev = load_table(spark, sf_dir, "events")
    joint = ev.groupBy(
        F.col("event_type").alias("t"), F.hour("ts").cast("long").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c")).localCheckpoint()
    tot = joint.agg(F.sum("c").cast("long").alias("n"))
    rowm = joint.groupBy("t").agg(F.sum("c").cast("long").alias("ct"))
    colm = joint.groupBy("h").agg(F.sum("c").cast("long").alias("ch"))
    nD = F.col("n").cast("double")
    fp9 = lambda x: F.floor(  # noqa: E731
        x * F.lit(1_000_000_000.0) + F.lit(0.5)
    ).cast("long")
    mi_terms = (
        joint.join(F.broadcast(rowm), "t")
        .join(F.broadcast(colm), "h")
        .crossJoin(F.broadcast(tot))
        .select(
            fp9(
                (F.col("c").cast("double") / nD)
                * F.log(
                    F.col("c").cast("double") * nD
                    / (F.col("ct").cast("double") * F.col("ch").cast("double"))
                )
            ).alias("t_fp")
        )
    )
    ent = lambda cnt_col: fp9(  # noqa: E731
        -(cnt_col.cast("double") / nD) * F.log(cnt_col.cast("double") / nD)
    )
    hr = rowm.crossJoin(F.broadcast(tot)).agg(
        F.sum(ent(F.col("ct"))).cast("long").alias("h_row_fp")
    )
    hc = colm.crossJoin(F.broadcast(tot)).agg(
        F.sum(ent(F.col("ch"))).cast("long").alias("h_col_fp")
    )
    mi = mi_terms.agg(F.sum("t_fp").cast("long").alias("mi_fp"))
    out = (
        mi.crossJoin(F.broadcast(hr))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(tot))
    )
    g = F.lit(1_000_000_000.0)
    return out.select(
        "n",
        F.round(F.col("mi_fp").cast("double") / g, 6).alias("mi_nats"),
        F.round(F.col("h_row_fp").cast("double") / g, 6).alias("h_type"),
        F.round(F.col("h_col_fp").cast("double") / g, 6).alias("h_hour"),
        F.round(
            F.col("mi_fp").cast("double")
            / F.least(
                F.col("h_row_fp").cast("double"),
                F.col("h_col_fp").cast("double"),
            ),
            6,
        ).alias("nmi"),
    )


# --- Kendall's W: do event types agree on the hourly revenue ranking? -----------

_KW_W_SQL = """
WITH cell AS (
    SELECT event_type AS t, CAST(hour(ts) AS BIGINT) AS h,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
    FROM events GROUP BY 1, 2
),
spine AS (
    SELECT t, h
    FROM (SELECT DISTINCT t FROM cell), (SELECT unnest(generate_series(0, 23)) AS h)
),
filled AS (
    SELECT spine.t, spine.h, COALESCE(rev, 0) AS rev
    FROM spine LEFT JOIN cell ON cell.t = spine.t AND cell.h = spine.h
),
ranked AS (
    SELECT t, h,
           2 * CAST(COUNT(*) OVER (
               PARTITION BY t ORDER BY rev, h
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS BIGINT) + 1 + 1 AS r2
    FROM filled
),
sums AS (
    SELECT h, CAST(SUM(r2) AS BIGINT) AS rsum2,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM ranked GROUP BY h
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(k) AS k,
           CAST(SUM(CAST(rsum2 AS DECIMAL(38,0)) * CAST(rsum2 AS DECIMAL(38,0)))
                AS DECIMAL(38,0)) AS ss2,
           CAST(SUM(CAST(rsum2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
    FROM sums
)
SELECT n AS n_hours, k AS n_judges,
       ROUND((3.0 * (CAST(ss2 AS DOUBLE)
                     - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                       / CAST(n AS DOUBLE)))
             / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
                * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   - CAST(n AS DOUBLE))), 6) AS kendall_w
FROM stats
""".strip()


@query("kendall_w_hourly_revenue_ranking", oracle=_KW_W_SQL)
def kendall_w_hourly_revenue_ranking(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kendall's W coefficient of concordance: do the event types (the
    "judges") agree on how the 24 hours rank by revenue? W=1 — all types
    peak and dip together (one daily rhythm); W~0 — uncorrelated
    rhythms. Each type ranks the ZERO-FILLED 24-hour spine (doubled
    ranks stay integer; revenue ties broken by hour identically in both
    engines — with exact cent revenues ties are rare but the order must
    still be total), and W = 12 S / (k^2(n^3-n)) computed from doubled
    rank sums (12*S(R) = 3*S(2R)). Exact DECIMAL sums; hour/type-bounded
    frames after one aggregate."""
    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.col("event_type").alias("t"), F.hour("ts").cast("long").alias("h")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "rev"
        )
    )
    types = cell.select("t").distinct()
    hours = F.broadcast(
        cell.sparkSession.range(0, 24).select(F.col("id").alias("h"))
    )
    spine = types.crossJoin(hours)
    filled = spine.join(cell, ["t", "h"], "left").select(
        "t", "h", F.coalesce("rev", F.lit(0)).alias("rev")
    )
    wrank = (
        Window.partitionBy("t")
        .orderBy("rev", "h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = filled.select(
        "t",
        "h",
        (
            F.lit(2) * F.coalesce(F.count(F.lit(1)).over(wrank), F.lit(0))
            + F.lit(2)
        ).cast("long").alias("r2"),
    )
    sums = ranked.groupBy("h").agg(
        F.sum("r2").cast("long").alias("rsum2"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    stats = sums.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("k").cast("long").alias("k"),
        F.sum(dec("rsum2") * dec("rsum2")).cast("decimal(38,0)").alias("ss2"),
        F.sum(dec("rsum2")).cast("decimal(38,0)").alias("s2"),
    )
    nD = F.col("n").cast("double")
    kD = F.col("k").cast("double")
    return stats.select(
        F.col("n").alias("n_hours"),
        F.col("k").alias("n_judges"),
        F.round(
            (
                F.lit(3.0)
                * (
                    F.col("ss2").cast("double")
                    - F.col("s2").cast("double") * F.col("s2").cast("double")
                    / nD
                )
            )
            / (kD * kD * (nD * nD * nD - nD)),
            6,
        ).alias("kendall_w"),
    )


# --- ABC x XYZ inventory classification (parts) ---------------------------------

#: XYZ thresholds on the weekly-demand coefficient of variation, pinned.
_XYZ_LO = "0.5"
_XYZ_HI = "1.0"

_ABCXYZ_SQL = f"""
WITH rev AS (
    SELECT l_partkey,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS r
    FROM lineitem GROUP BY 1
),
ranked AS (
    SELECT l_partkey, r,
           CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_r,
           CAST(SUM(r) OVER () AS BIGINT) AS tot_r
    FROM rev
),
abc AS (
    SELECT l_partkey,
           CASE WHEN 10 * cum_r <= 8 * tot_r THEN 'A'
                WHEN 100 * cum_r <= 95 * tot_r THEN 'B'
                ELSE 'C' END AS abc
    FROM ranked
),
weekly AS (
    SELECT l_partkey,
           CAST(CAST(l_shipdate AS DATE) - DATE '2024-01-01' AS BIGINT) // 7
               AS wk,
           CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
    FROM lineitem GROUP BY 1, 2
),
cv AS (
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS nw,
           CAST(SUM(q) AS BIGINT) AS sq,
           CAST(SUM(q * q) AS BIGINT) AS sqq
    FROM weekly GROUP BY 1
),
xyz AS (
    SELECT l_partkey,
           CASE WHEN nw < 2 THEN 'Z'
                WHEN SQRT(GREATEST(0.0,
                        (CAST(sqq AS DOUBLE)
                         - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
                           / CAST(nw AS DOUBLE)) / CAST(nw - 1 AS DOUBLE)))
                     / (CAST(sq AS DOUBLE) / CAST(nw AS DOUBLE))
                     <= {_XYZ_LO} THEN 'X'
                WHEN SQRT(GREATEST(0.0,
                        (CAST(sqq AS DOUBLE)
                         - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
                           / CAST(nw AS DOUBLE)) / CAST(nw - 1 AS DOUBLE)))
                     / (CAST(sq AS DOUBLE) / CAST(nw AS DOUBLE))
                     <= {_XYZ_HI} THEN 'Y'
                ELSE 'Z' END AS xyz
    FROM cv
)
SELECT abc.abc, xyz.xyz, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM abc JOIN xyz ON xyz.l_partkey = abc.l_partkey
GROUP BY abc.abc, xyz.xyz
ORDER BY abc.abc, xyz.xyz
""".strip()


@query("abc_xyz_parts", oracle=_ABCXYZ_SQL)
def abc_xyz_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC x XYZ inventory classification — the planning grid every
    supply chain runs: ABC = revenue concentration classes (80/95%
    cumulative-share cuts, integer threshold compares over the exact
    cent prefix sums — the ``pareto_abc_parts`` machinery), XYZ = demand
    VARIABILITY classes (weekly-demand coefficient of variation against
    pinned {_XYZ_LO}/{_XYZ_HI} cuts; single-week parts are Z by
    convention). The part-count grid (<=9 rows) is the output. The
    revenue ranking runs the part-bounded window; weekly demand is one
    map-side-combined aggregate with exact integer moments."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    rev = li.groupBy("l_partkey").agg(F.sum(cents).cast("long").alias("r"))
    wcum = Window.orderBy(F.desc("r"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the grand total is a SCALAR: broadcast it instead of a second
    # single-partition unbounded window pass (round-12 pin adjudication
    # found the two-window plan; one part-bounded window remains — the
    # Pareto prefix-sum is inherently sequential)
    tot = rev.agg(F.sum("r").cast("long").alias("tot_r"))
    ranked = rev.select(
        "l_partkey",
        F.sum("r").over(wcum).cast("long").alias("cum_r"),
    ).crossJoin(F.broadcast(tot))
    abc = ranked.select(
        "l_partkey",
        F.when(F.lit(10) * F.col("cum_r") <= F.lit(8) * F.col("tot_r"), "A")
        .when(F.lit(100) * F.col("cum_r") <= F.lit(95) * F.col("tot_r"), "B")
        .otherwise("C")
        .alias("abc"),
    )
    weekly = li.groupBy(
        "l_partkey",
        F.expr(
            "cast(cast(l_shipdate as date) - date'2024-01-01' as bigint) div 7"
        ).alias("wk"),
    ).agg(
        F.sum(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long"))
        .cast("long").alias("q")
    )
    cv = weekly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("nw"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
    )
    nwD = F.col("nw").cast("double")
    mean = F.col("sq").cast("double") / nwD
    sd = F.sqrt(
        F.greatest(
            F.lit(0.0),
            (
                F.col("sqq").cast("double")
                - F.col("sq").cast("double") * F.col("sq").cast("double") / nwD
            )
            / (F.col("nw") - F.lit(1)).cast("double"),
        )
    )
    xyz = cv.select(
        "l_partkey",
        F.when(F.col("nw") < 2, "Z")
        .when(sd / mean <= float(_XYZ_LO), "X")
        .when(sd / mean <= float(_XYZ_HI), "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc", "xyz")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .orderBy("abc", "xyz")
    )


# --- order-to-ship latency quantiles --------------------------------------------

_O2S_SQL = """
WITH lat AS (
    SELECT o.o_orderpriority AS pri,
           CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
                AS BIGINT) AS days
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
hist AS (
    SELECT pri, days, CAST(COUNT(*) AS BIGINT) AS c FROM lat GROUP BY 1, 2
),
cum AS (
    SELECT pri, days,
           CAST(SUM(c) OVER (
               PARTITION BY pri ORDER BY days
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cc,
           CAST(SUM(c) OVER (PARTITION BY pri) AS BIGINT) AS n
    FROM hist
)
SELECT pri AS priority, MAX(n) AS n_lines,
       MIN(CASE WHEN 2 * cc >= n THEN days END) AS p50_days,
       MIN(CASE WHEN 10 * cc >= 9 * n THEN days END) AS p90_days,
       MIN(CASE WHEN 100 * cc >= 99 * n THEN days END) AS p99_days,
       MAX(days) AS max_days
FROM cum
GROUP BY pri
ORDER BY pri
""".strip()


@query("order_to_ship_latency_quantiles", oracle=_O2S_SQL)
def order_to_ship_latency_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-to-ship latency SLO table per order priority — p50/p90/p99
    /max days from order date to each line's ship date, the fulfillment
    health readout. Latencies are exact integer day differences; the
    quantiles are type-1 integer threshold picks over the per-priority
    DAY-DOMAIN histogram (the ``weighted_quantiles`` discipline — no
    sort of raw rows, no percentile float path). Data-sized work: one
    orderkey equi-join (both sides bucketable) + one aggregate."""
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lat = od.join(li, od.o_orderkey == li.l_orderkey).select(
        F.col("o_orderpriority").alias("pri"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("long").alias("days"),
    )
    hist = lat.groupBy("pri", "days").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcum = (
        Window.partitionBy("pri")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("pri")
    cum = hist.select(
        "pri",
        "days",
        F.sum("c").over(wcum).cast("long").alias("cc"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )
    pick = lambda cond: F.min(F.when(cond, F.col("days")))  # noqa: E731
    return (
        cum.groupBy("pri")
        .agg(
            F.max("n").alias("n_lines"),
            pick(F.lit(2) * F.col("cc") >= F.col("n")).alias("p50_days"),
            pick(F.lit(10) * F.col("cc") >= F.lit(9) * F.col("n")).alias(
                "p90_days"
            ),
            pick(F.lit(100) * F.col("cc") >= F.lit(99) * F.col("n")).alias(
                "p99_days"
            ),
            F.max("days").alias("max_days"),
        )
        .withColumnRenamed("pri", "priority")
        .orderBy("priority")
    )


# --- return rate by brand with Wilson intervals ---------------------------------

_RET_SQL = f"""
WITH base AS (
    SELECT p.p_brand AS brand,
           CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
g AS (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ret) AS BIGINT) AS r
    FROM base GROUP BY brand
)
SELECT brand, n, r,
       CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
       ((CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
         + {_Z95} * {_Z95} / (2.0 * CAST(n AS DOUBLE)))
        - {_Z95} * SQRT((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)
                        + {_Z95} * {_Z95}
                          / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
       / (1.0 + {_Z95} * {_Z95} / CAST(n AS DOUBLE)) AS lo95,
       ((CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
         + {_Z95} * {_Z95} / (2.0 * CAST(n AS DOUBLE)))
        + {_Z95} * SQRT((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)
                        + {_Z95} * {_Z95}
                          / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
       / (1.0 + {_Z95} * {_Z95} / CAST(n AS DOUBLE)) AS hi95
FROM g ORDER BY brand
""".strip()


@query("return_rate_by_brand_wilson", oracle=_RET_SQL)
def return_rate_by_brand_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand line-item return rate with Wilson 95% intervals — the
    supplier-quality scorecard (which brands get returned, with honest
    small-n uncertainty instead of bare rates). Exact counts from one
    broadcast-dim join + aggregate; the interval is the pinned-z
    identical double expression per brand (the
    ``wilson_ci_purchase_by_parity`` formula over a business
    dimension)."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    g = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("long"))
            .cast("long").alias("r"),
        )
    )
    z = F.lit(float(_Z95))
    nD = F.col("n").cast("double")
    p = F.col("r").cast("double") / nD
    center = p + z * z / (F.lit(2.0) * nD)
    half = z * F.sqrt(
        p * (F.lit(1.0) - p) / nD + z * z / (F.lit(4.0) * nD * nD)
    )
    denom = F.lit(1.0) + z * z / nD
    return g.select(
        "brand",
        "n",
        "r",
        p.alias("rate"),
        ((center - half) / denom).alias("lo95"),
        ((center + half) / denom).alias("hi95"),
    ).orderBy("brand")


# --- log-log price elasticity by brand ------------------------------------------

_ELAST_SQL = """
WITH weekly AS (
    SELECT p.p_brand AS brand,
           CAST(CAST(l.l_shipdate AS DATE) - DATE '2024-01-01' AS BIGINT) // 7
               AS wk,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice / l.l_quantity * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS price_sum,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(FLOOR(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1, 2
),
fp AS (
    SELECT brand,
           CAST(FLOOR(LN(CAST(price_sum AS DOUBLE) / CAST(n_lines AS DOUBLE))
                      * 1000000000.0 + 0.5) AS DECIMAL(38,0)) AS x_fp,
           CAST(FLOOR(LN(CAST(q AS DOUBLE)) * 1000000000.0 + 0.5)
                AS DECIMAL(38,0)) AS y_fp
    FROM weekly WHERE q > 0
),
s AS (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x_fp) AS DECIMAL(38,0)) AS sx,
           CAST(SUM(y_fp) AS DECIMAL(38,0)) AS sy,
           CAST(SUM(x_fp * y_fp) AS DECIMAL(38,0)) AS sxy,
           CAST(SUM(x_fp * x_fp) AS DECIMAL(38,0)) AS sxx
    FROM fp GROUP BY brand
)
SELECT brand, n AS n_weeks,
       ROUND((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e18)
              - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
             / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e18)
                - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9)),
             6) AS elasticity
FROM s
WHERE n >= 8
ORDER BY brand
""".strip()


@query("price_elasticity_by_brand", oracle=_ELAST_SQL)
def price_elasticity_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of weekly demand per brand — the
    econometrics staple (slope of ln(quantity) on ln(avg unit price)
    across weeks; -1 is unit-elastic). Weekly average unit prices come
    from exact integer cent sums over line counts; both logs are
    fixed-pointed (1e-9) before the per-brand regression sums (products
    exact in DECIMAL(38,0), the ``zipf``/``heaps`` OLS discipline);
    brands with under 8 priced weeks are excluded honestly. Data-sized
    work: one broadcast-dim join + weekly aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    weekly = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.expr(
                "cast(cast(l_shipdate as date) - date'2024-01-01' as bigint)"
                " div 7"
            ).alias("wk"),
        )
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") / F.col("l_quantity") * 100
                    + F.lit(0.5)
                ).cast("long")
            ).cast("long").alias("price_sum"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long"))
            .cast("long").alias("q"),
        )
        .filter(F.col("q") > 0)
    )
    ln_fp = lambda col: F.floor(  # noqa: E731
        F.log(col) * F.lit(1_000_000_000.0) + F.lit(0.5)
    ).cast("decimal(38,0)")
    fp = weekly.select(
        "brand",
        ln_fp(
            F.col("price_sum").cast("double") / F.col("n_lines").cast("double")
        ).alias("x_fp"),
        ln_fp(F.col("q").cast("double")).alias("y_fp"),
    )
    s = fp.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x_fp").cast("decimal(38,0)").alias("sx"),
        F.sum("y_fp").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x_fp") * F.col("y_fp")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x_fp") * F.col("x_fp")).cast("decimal(38,0)").alias("sxx"),
    ).filter(F.col("n") >= 8)
    nD = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / F.lit(1e9)
    sy = F.col("sy").cast("double") / F.lit(1e9)
    sxy = F.col("sxy").cast("double") / F.lit(1e18)
    sxx = F.col("sxx").cast("double") / F.lit(1e18)
    return s.select(
        "brand",
        F.col("n").alias("n_weeks"),
        F.round((nD * sxy - sx * sy) / (nD * sxx - sx * sx), 6).alias(
            "elasticity"
        ),
    ).orderBy("brand")


# --- exact median absolute deviation per type -----------------------------------

_MAD_SQL = """
WITH hist AS (
    SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS vb,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
cum AS (
    SELECT event_type, vb, c,
           CAST(SUM(c) OVER (
               PARTITION BY event_type ORDER BY vb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cc,
           CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM hist
),
med AS (
    SELECT event_type, MAX(n) AS n,
           MIN(CASE WHEN 2 * cc >= n THEN vb END) AS med
    FROM cum GROUP BY event_type
),
dev AS (
    SELECT h.event_type, ABS(h.vb - m.med) AS db,
           CAST(SUM(h.c) AS BIGINT) AS c
    FROM hist h JOIN med m ON m.event_type = h.event_type
    GROUP BY h.event_type, ABS(h.vb - m.med)
),
dcum AS (
    SELECT event_type, db, c,
           CAST(SUM(c) OVER (
               PARTITION BY event_type ORDER BY db
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cc,
           CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM dev
)
SELECT d.event_type, m.n, m.med AS median_cents,
       MIN(CASE WHEN 2 * d.cc >= d.n THEN d.db END) AS mad_cents
FROM dcum d JOIN med m ON m.event_type = d.event_type
GROUP BY d.event_type, m.n, m.med
ORDER BY d.event_type
""".strip()


@query("mad_value_by_type", oracle=_MAD_SQL)
def mad_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median absolute deviation per event type — the robust scale
    estimate (breakdown point 50%, vs 0% for the standard deviation)
    behind every robust z-score, computed with ZERO floats: type-1
    median from the cent histogram, then the deviation histogram folds
    |vb - med| WITHOUT touching rows again (buckets equidistant from
    the median merge exactly), then a second type-1 threshold pick.
    Two DOMAIN-bounded window passes over histograms; one data-sized
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hist = ev.groupBy(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("vb")
    ).agg(F.count(F.lit(1)).cast("long").alias("c")).localCheckpoint()
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("vb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "vb",
        F.sum("c").over(wcum).cast("long").alias("cc"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )
    med = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.lit(2) * F.col("cc") >= F.col("n"), F.col("vb"))
        ).alias("med"),
    )
    dev = (
        hist.join(F.broadcast(med), "event_type")
        .groupBy("event_type", F.abs(F.col("vb") - F.col("med")).alias("db"))
        .agg(F.sum("c").cast("long").alias("c"))
    )
    dcum = dev.select(
        "event_type",
        "db",
        F.sum("c").over(
            Window.partitionBy("event_type")
            .orderBy("db")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("cc"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )
    mad = dcum.groupBy("event_type").agg(
        F.min(
            F.when(F.lit(2) * F.col("cc") >= F.col("n"), F.col("db"))
        ).alias("mad_cents")
    )
    return (
        med.join(mad, "event_type")
        .select(
            "event_type",
            "n",
            F.col("med").alias("median_cents"),
            "mad_cents",
        )
        .orderBy("event_type")
    )


# --- Tukey-fence outlier audit (fully integer) ----------------------------------

_TUKEY_SQL = """
WITH hist AS (
    SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS vb,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
cum AS (
    SELECT event_type, vb, c,
           CAST(SUM(c) OVER (
               PARTITION BY event_type ORDER BY vb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cc,
           CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM hist
),
q AS (
    SELECT event_type, MAX(n) AS n,
           MIN(CASE WHEN 4 * cc >= n THEN vb END) AS q1,
           MIN(CASE WHEN 4 * cc >= 3 * n THEN vb END) AS q3
    FROM cum GROUP BY event_type
)
SELECT h.event_type, q.n, q.q1, q.q3, CAST(q.q3 - q.q1 AS BIGINT) AS iqr,
       CAST(SUM(CASE WHEN 2 * h.vb < 2 * q.q1 - 3 * (q.q3 - q.q1)
                     THEN h.c ELSE 0 END) AS BIGINT) AS n_low_outliers,
       CAST(SUM(CASE WHEN 2 * h.vb > 2 * q.q3 + 3 * (q.q3 - q.q1)
                     THEN h.c ELSE 0 END) AS BIGINT) AS n_high_outliers
FROM hist h JOIN q ON q.event_type = h.event_type
GROUP BY h.event_type, q.n, q.q1, q.q3
ORDER BY h.event_type
""".strip()


@query("tukey_fence_outliers_by_type", oracle=_TUKEY_SQL)
def tukey_fence_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per event type — the boxplot rule
    (outside q1 - 1.5*IQR / q3 + 1.5*IQR) kept FULLY INTEGER by
    doubling: ``2*vb < 2*q1 - 3*IQR`` is the exact half-cent-free
    spelling of the 1.5x fence, so the counts cannot disagree between
    engines even at fence-boundary values. Type-1 quartiles from the
    cent histogram (the ``qte`` discipline); outlier counts re-fold the
    histogram, never raw rows. Complements ``mad_value_by_type`` and
    the z-score-based ``hourly_anomaly_zscores``."""
    ev = load_table(spark, sf_dir, "events")
    hist = ev.groupBy(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("vb")
    ).agg(F.count(F.lit(1)).cast("long").alias("c")).localCheckpoint()
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("vb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "vb",
        F.sum("c").over(wcum).cast("long").alias("cc"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )
    q = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.lit(4) * F.col("cc") >= F.col("n"), F.col("vb"))).alias("q1"),
        F.min(
            F.when(F.lit(4) * F.col("cc") >= F.lit(3) * F.col("n"), F.col("vb"))
        ).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    joined = hist.join(F.broadcast(q), "event_type")
    return (
        joined.groupBy("event_type", "n", "q1", "q3")
        .agg(
            F.sum(
                F.when(
                    F.lit(2) * F.col("vb")
                    < F.lit(2) * F.col("q1") - F.lit(3) * iqr,
                    F.col("c"),
                ).otherwise(0)
            ).cast("long").alias("n_low_outliers"),
            F.sum(
                F.when(
                    F.lit(2) * F.col("vb")
                    > F.lit(2) * F.col("q3") + F.lit(3) * iqr,
                    F.col("c"),
                ).otherwise(0)
            ).cast("long").alias("n_high_outliers"),
        )
        .select(
            "event_type",
            "n",
            "q1",
            "q3",
            (F.col("q3") - F.col("q1")).cast("long").alias("iqr"),
            "n_low_outliers",
            "n_high_outliers",
        )
        .orderBy("event_type")
    )


# --- seasonal-naive forecast baseline -------------------------------------------

_SNAIVE_SQL = """
WITH daily AS (
    SELECT event_type,
           CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yc
    FROM events GROUP BY 1, 2
),
pairs AS (
    SELECT a.event_type, ABS(a.yc - b.yc) AS ae
    FROM daily a JOIN daily b
      ON b.event_type = a.event_type AND b.d = a.d - 7
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_forecasts,
       ROUND(CAST(SUM(ae) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS mae_snaive
FROM pairs
GROUP BY event_type
ORDER BY event_type
""".strip()


@query("seasonal_naive_backtest", oracle=_SNAIVE_SQL)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast baseline (predict today = same weekday
    last week) on the daily revenue series — the canonical yardstick
    every forecasting-family member must beat (read next to the
    EWMA / Holt / Holt-Winters MAEs: a model losing to snaive is
    worthless, the MASE denominator convention). Absolute errors are
    EXACT integers (cent daily sums, integer lag-7 self-join on the
    calendar-bounded daily frame); MAE is one division per type."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "yc"
        )
    ).localCheckpoint()  # one shuffle feeds both sides of the lag join
    b = daily.select(
        F.col("event_type").alias("bt"),
        F.col("d").alias("bd"),
        F.col("yc").alias("by"),
    )
    pairs = daily.join(
        b, (F.col("bt") == F.col("event_type")) & (F.col("bd") == F.col("d") - 7)
    ).select(
        "event_type", F.abs(F.col("yc") - F.col("by")).cast("long").alias("ae")
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_forecasts"),
            F.round(
                F.sum("ae").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mae_snaive"),
        )
        .orderBy("event_type")
    )

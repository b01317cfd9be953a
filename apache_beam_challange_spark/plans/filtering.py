"""Published LLM-curation filter rules + link prediction — four operators
rounding out the pretraining-data surface (SURVEY.md §2.9's "beyond the
reference" mandate; the reference, a 360-line Beam composition, has no
analog):

- **Gopher quality rules** (`gopher_quality_flags`): the document-level
  heuristic filters of Rae et al. 2021 ("Scaling Language Models: ...
  Gopher", Appendix A — public literature), per-language rule-failure
  accounting: word-count window, mean-word-length window, and the
  stop-word-presence rule. Thresholds are re-centered for this corpus's
  observed ranges (words 10-99, mean word length 3.7-5.3) so every rule
  actually discriminates — a filter that never fires verifies nothing.
  One corpus scan, one per-lang aggregate (map-side combined); at
  100 TB this is the classic single-pass keep/drop accounting.
- **DSIR importance weights** (`dsir_importance_weights`): hashed-n-gram
  importance sampling of Xie et al. 2023 ("Data Selection for Language
  Models via Importance Resampling", NeurIPS — public literature): word
  bigrams hash (md5, oracle-reproducible) into 128 buckets; a target
  corpus (the curated source group) and the raw corpus each induce a
  smoothed bucket distribution; every document scores
  ``sum_f c_f(doc) * (ln p_target(f) - ln p_raw(f))`` and the top-50
  most target-like documents surface. Shape: one bigram explode, one
  (doc, bucket) aggregate, a 128-row bucket dimension (broadcast-class
  join), one doc aggregate — the corpus never shuffles by anything
  wider than (doc_id, bucket).
- **maximal duplicate-span islands** (`duplicate_span_islands`): extends
  `duplicate_ngram_spans` (plans/extensions.py) from per-8-gram flags to
  the MAXIMAL merged spans of Lee et al. ACL'22's ExactSubstr dedup:
  overlapping/adjacent duplicated 8-gram positions merge (gaps-and-
  islands, two stacked per-doc windows) into contiguous islands, giving
  per-doc island count, covered-token count and coverage ratio — the
  actual cut-list a span-level deduper consumes. All windows are
  per-doc partitions (no global window); the only wide ops are the
  fingerprint groupBy and the per-doc window shuffle.
- **Adamic-Adar link prediction** (`adamic_adar_link_prediction`): over
  the station-proximity graph (the 2 km radius-pair edges, one shared
  definition with `stations_within_radius_pairs`), predict MISSING
  edges from wedge structure — non-adjacent pairs with >= 1 common
  neighbor, scored ``sum_z 1/ln(deg z)`` (Adamic & Adar 2003;
  Liben-Nowell & Kleinberg 2003). A geometric graph keeps the check
  non-vacuous at every SF — the MinHash-LSH near-dup graph was
  evaluated first and rejected: its duplicate clusters are
  band-complete cliques, so every wedge closes and the prediction set
  is empty. Wedge equi-join on the center node (triangle-counting join
  class), anti-join against the existing edge list;
  `operators/graph.py:adamic_adar` documents the hub-degree cap for
  adversarial degree distributions.

Every query is pure DataFrame composition — no UDFs, no driver-side
collection — and every oracle reproduces the exact arithmetic (md5
fingerprints, ln on doubles, ROUND 6) so the driver's value-hash gate
verifies results, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_beam_challange_spark.plans.extensions import _HEXD, _MINHASH_CTE
from apache_beam_challange_spark.plans.registry import query
from apache_beam_challange_spark.sources.catalog import load_table

# --- Gopher quality rules ---------------------------------------------------

#: word-count window (Gopher rule 1; corpus range 10-99 words)
_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 30, 80
#: mean-word-length window (Gopher rule 2; corpus range 3.7-5.3)
_GOPHER_MIN_MWL, _GOPHER_MAX_MWL = 3.9, 4.6

_GOPHER_DOC_SQL = f"""
    SELECT lang,
           len(string_split(text, ' ')) AS n_words,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        x -> len(x))) AS DOUBLE)
               / len(string_split(text, ' ')) AS mwl,
           list_contains(string_split(text, ' '), 'the')
               AND list_contains(string_split(text, ' '), 'a') AS has_stops
    FROM documents
"""


@query(
    "gopher_quality_flags",
    oracle=f"""
WITH d AS ({_GOPHER_DOC_SQL}),
flags AS (
    SELECT lang,
           n_words < {_GOPHER_MIN_WORDS} AS fail_short,
           n_words > {_GOPHER_MAX_WORDS} AS fail_long,
           mwl < {_GOPHER_MIN_MWL} OR mwl > {_GOPHER_MAX_MWL} AS fail_word_len,
           NOT has_stops AS fail_stop
    FROM d
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN fail_short THEN 1 ELSE 0 END) AS BIGINT)
           AS n_fail_short,
       CAST(SUM(CASE WHEN fail_long THEN 1 ELSE 0 END) AS BIGINT)
           AS n_fail_long,
       CAST(SUM(CASE WHEN fail_word_len THEN 1 ELSE 0 END) AS BIGINT)
           AS n_fail_word_len,
       CAST(SUM(CASE WHEN fail_stop THEN 1 ELSE 0 END) AS BIGINT)
           AS n_fail_stop,
       CAST(SUM(CASE WHEN NOT (fail_short OR fail_long OR fail_word_len
                               OR fail_stop) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_keep,
       ROUND(SUM(CASE WHEN NOT (fail_short OR fail_long OR fail_word_len
                                OR fail_stop) THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS keep_rate
FROM flags
GROUP BY lang
ORDER BY lang
""".strip(),
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, Appendix A), per
    language: how many documents each rule rejects and what survives all
    of them — the keep/drop accounting a curation run reports before
    committing a filter config. One scan, one per-lang aggregate; every
    per-doc feature (word count, mean word length, stop-word presence)
    is a JVM-side array expression, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    d = docs.select(
        "lang",
        F.size(words).alias("n_words"),
        (
            F.aggregate(
                F.transform(words, lambda x: F.length(x)),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).cast("double")
            / F.size(words)
        ).alias("mwl"),
        (F.array_contains(words, "the") & F.array_contains(words, "a")).alias(
            "has_stops"
        ),
    )
    flags = d.select(
        "lang",
        (F.col("n_words") < _GOPHER_MIN_WORDS).alias("fail_short"),
        (F.col("n_words") > _GOPHER_MAX_WORDS).alias("fail_long"),
        (
            (F.col("mwl") < _GOPHER_MIN_MWL) | (F.col("mwl") > _GOPHER_MAX_MWL)
        ).alias("fail_word_len"),
        (~F.col("has_stops")).alias("fail_stop"),
    )
    keep = ~(
        F.col("fail_short")
        | F.col("fail_long")
        | F.col("fail_word_len")
        | F.col("fail_stop")
    )
    cnt = lambda c: F.sum(F.col(c).cast("long")).alias(f"n_{c}")  # noqa: E731
    return (
        flags.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cnt("fail_short"),
            cnt("fail_long"),
            cnt("fail_word_len"),
            cnt("fail_stop"),
            F.sum(keep.cast("long")).alias("n_keep"),
            F.round(F.sum(keep.cast("long")) * 1.0 / F.count(F.lit(1)), 6).alias(
                "keep_rate"
            ),
        )
        .orderBy("lang")
    )


# --- DSIR importance weights ------------------------------------------------

#: hashed-feature bucket count (DSIR's hashed n-gram space)
_DSIR_BUCKETS = 128
#: the "curated target" source group the importance weights point at
_DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3")

#: first 4 hex chars of md5(g) as an integer — DuckDB twin of Spark's
#: conv(substring(md5(g), 1, 4), 16, 10)
_HEX4_G = " + ".join(
    _HEXD.format(m="md5(g)", p=p) + f" * {16 ** (4 - p)}" for p in range(1, 5)
)


@query(
    "dsir_importance_weights",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
bi AS (
    SELECT doc_id, source, toks[i] || ' ' || toks[i + 1] AS g
    FROM tok, (SELECT unnest(generate_series(1, 4000)) AS i) p
    WHERE p.i + 1 <= len(toks)
),
feat AS (
    SELECT doc_id, source, ({_HEX4_G}) % {_DSIR_BUCKETS} AS f FROM bi
),
raw AS (
    SELECT f, CAST(COUNT(*) AS BIGINT) AS cr FROM feat GROUP BY f
),
tgt AS (
    SELECT f, CAST(COUNT(*) AS BIGINT) AS ct FROM feat
    WHERE source IN {_DSIR_TARGET_SOURCES!r} GROUP BY f
),
tot AS (
    SELECT CAST(SUM(cr) AS DOUBLE) AS total_raw,
           CAST((SELECT COALESCE(SUM(ct), 0) FROM tgt) AS DOUBLE) AS total_tgt
    FROM raw
),
dim AS (
    SELECT raw.f,
           ln((COALESCE(tgt.ct, 0) + 1.0) / (tot.total_tgt + {_DSIR_BUCKETS}))
               - ln((raw.cr + 1.0) / (tot.total_raw + {_DSIR_BUCKETS}))
               AS logratio
    FROM raw LEFT JOIN tgt ON raw.f = tgt.f CROSS JOIN tot
),
docfeat AS (
    SELECT doc_id, f, CAST(COUNT(*) AS BIGINT) AS c
    FROM feat GROUP BY doc_id, f
)
SELECT d.doc_id,
       CAST(SUM(d.c) AS BIGINT) AS n_bigrams,
       ROUND(SUM(d.c * dim.logratio), 6) AS dsir_weight
FROM docfeat d JOIN dim ON d.f = dim.f
GROUP BY d.doc_id
ORDER BY dsir_weight DESC, d.doc_id
LIMIT 50
""".strip(),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) hashed-n-gram importance weights: which raw
    documents look most like the curated target sources, measured by the
    log-likelihood ratio of their hashed-bigram counts under the
    smoothed target vs raw bucket distributions. Top-50, deterministic
    tiebreak on doc_id.

    Shape: the corpus is touched by one bigram explode and two keyed
    aggregates — (doc_id, bucket) and (bucket) — then everything joins
    through a {_DSIR_BUCKETS}-row bucket dimension (broadcast-class: AQE
    sees a sub-kilobyte side). The bucket totals are a 1-row
    cross-join, the scalar-aggregate pattern the canonical q4 uses.
    Nothing doc x doc, nothing collected. (The oracle's bigram position
    series is bounded at 4000 for the cross-join unnest; corpus docs max
    out at ~100 tokens — a 40x margin, not a silent truncation — the
    same documented bound `duplicate_span_islands` carries.)"""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source", F.split("text", " ").alias("t"))
    # the >= 2 pre-filter is load-bearing: for a single-token doc,
    # sequence(1, 0) is DESCENDING [1, 0] (Spark defaults the step to -1
    # when start > stop) and element_at(t, 0)/element_at(t, 2) throw
    # under ANSI mode — one-token docs must contribute no bigrams (as
    # the oracle's WHERE p.i + 1 <= len(toks) does), not crash the query
    bi = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat(
                    F.element_at("t", i), F.lit(" "), F.element_at("t", i + 1)
                ),
            )
        ).alias("g"),
    )
    # the hashed-feature stream feeds THREE consumers (raw totals, target
    # totals, per-doc counts); materialize it once (lazy localCheckpoint,
    # the dedup-chain discipline) or Spark re-runs the corpus explode +
    # md5 per consumer
    feat = bi.select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("g"), 1, 4), 16, 10).cast("long")
            % _DSIR_BUCKETS
        ).alias("f"),
    ).localCheckpoint(eager=False)
    raw = feat.groupBy("f").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        feat.filter(F.col("source").isin(*_DSIR_TARGET_SOURCES))
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tot = raw.agg(F.sum("cr").cast("double").alias("total_raw")).crossJoin(
        tgt.agg(
            F.coalesce(F.sum("ct"), F.lit(0)).cast("double").alias("total_tgt")
        )
    )
    dim = (
        raw.join(tgt, "f", "left")
        .crossJoin(tot)
        .select(
            "f",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                    / (F.col("total_tgt") + _DSIR_BUCKETS)
                )
                - F.log(
                    (F.col("cr") + 1.0) / (F.col("total_raw") + _DSIR_BUCKETS)
                )
            ).alias("logratio"),
        )
    )
    docfeat = feat.groupBy("doc_id", "f").agg(F.count(F.lit(1)).alias("c"))
    return (
        docfeat.join(dim, "f")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.round(F.sum(F.col("c") * F.col("logratio")), 6).alias(
                "dsir_weight"
            ),
        )
        .orderBy(F.col("dsir_weight").desc(), F.col("doc_id"))
        .limit(50)
    )


# --- maximal duplicate-span islands -----------------------------------------

_SPAN_N = 8  # span length in tokens, matching duplicate_ngram_spans


@query(
    "duplicate_span_islands",
    oracle=f"""
WITH grams AS (
    SELECT doc_id, p.p AS p,
           md5(array_to_string(toks[p.p:p.p+{_SPAN_N - 1}], ' ')) AS fp
    FROM (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ) d,
    (SELECT unnest(generate_series(1, 4000)) AS p) p
    WHERE p.p + {_SPAN_N - 1} <= LEN(d.toks)
),
dup_fps AS (
    SELECT fp FROM grams GROUP BY fp HAVING COUNT(DISTINCT doc_id) > 1
),
pos AS (
    SELECT g.doc_id, g.p FROM grams g JOIN dup_fps USING (fp)
),
flagged AS (
    SELECT doc_id, p,
           CASE WHEN MAX(p + {_SPAN_N - 1}) OVER (
                    PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) IS NULL
                OR p > MAX(p + {_SPAN_N - 1}) OVER (
                    PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) + 1
                THEN 1 ELSE 0 END AS ni
    FROM pos
),
numbered AS (
    SELECT doc_id, p,
           SUM(ni) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS island
    FROM flagged
),
spans AS (
    SELECT doc_id, island, MIN(p) AS s, MAX(p + {_SPAN_N - 1}) AS e
    FROM numbered GROUP BY doc_id, island
),
docagg AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(e - s + 1) AS BIGINT) AS covered_tokens,
           CAST(MAX(e - s + 1) AS BIGINT) AS max_island_tokens
    FROM spans GROUP BY doc_id
),
nt AS (
    SELECT doc_id, CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
)
SELECT a.doc_id, a.n_islands, a.covered_tokens, a.max_island_tokens,
       nt.n_tokens,
       ROUND(a.covered_tokens * 1.0 / nt.n_tokens, 6) AS dup_coverage
FROM docagg a JOIN nt ON a.doc_id = nt.doc_id
""".strip(),
)
def duplicate_span_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicate spans (Lee et al. ACL'22
    ExactSubstr, at 8-gram granularity): duplicated 8-gram start
    positions that overlap or touch merge into contiguous islands
    (gaps-and-islands: a running MAX of span ends decides whether the
    next position extends the island or opens a new one), and each
    affected document reports island count, covered tokens, the longest
    island, and the covered fraction — the exact cut-list a span-level
    deduper applies, where `duplicate_ngram_spans` only counts flags.

    Shape: one narrow explode + md5 per span, the fingerprint groupBy
    finding multi-doc spans, one equi-join back, then two STACKED
    per-doc windows (running max, running sum — both partitioned by
    doc_id, never global) and a per-doc aggregate. (The oracle's
    4000-position series bounds the unnest; corpus docs max out at ~100
    tokens — a 40x margin, not a silent truncation.)"""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    n = _SPAN_N
    # two consumers (the dup-fingerprint groupBy and the position join);
    # materialize the fingerprint stream once or the tokenize+md5 pass
    # runs twice
    # the >= n pre-filter is load-bearing: for a doc shorter than n
    # tokens, sequence(1, 0) is DESCENDING [1, 0] (Spark defaults the
    # step to -1 when start > stop) and slice(toks, 0, n) throws
    # INVALID_PARAMETER_VALUE — short docs must produce no spans (as the
    # oracle's WHERE p + 7 <= LEN does), not crash the query
    grams = (
        docs.filter(F.size("toks") >= n)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("toks") - (n - 1))).alias(
                "p"
            ),
            "toks",
        )
        .select(
            "doc_id",
            F.col("p").cast("long").alias("p"),
            F.md5(F.array_join(F.slice("toks", F.col("p"), n), " ")).alias("fp"),
        )
        .localCheckpoint(eager=False)
    )
    dup_fps = (
        grams.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("fp")
    )
    pos = grams.join(dup_fps, "fp").select("doc_id", "p")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("p") + (n - 1)).over(w_prev)
    flagged = pos.select(
        "doc_id",
        "p",
        F.when(prev_end.isNull() | (F.col("p") > prev_end + 1), 1)
        .otherwise(0)
        .alias("ni"),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = flagged.select(
        "doc_id", "p", F.sum("ni").over(w_run).alias("island")
    )
    spans = numbered.groupBy("doc_id", "island").agg(
        F.min("p").alias("s"), F.max(F.col("p") + (n - 1)).alias("e")
    )
    docagg = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("covered_tokens"),
        F.max(F.col("e") - F.col("s") + 1)
        .cast("long")
        .alias("max_island_tokens"),
    )
    nt = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return docagg.join(nt, "doc_id").select(
        "doc_id",
        "n_islands",
        "covered_tokens",
        "max_island_tokens",
        "n_tokens",
        F.round(F.col("covered_tokens") * 1.0 / F.col("n_tokens"), 6).alias(
            "dup_coverage"
        ),
    )


# --- Adamic-Adar link prediction over the near-dup graph --------------------


#: the station-proximity graph's edge list — built on
#: plans/traindata.py:STATION_RADIUS_CTE (the SINGLE SQL definition of
#: the station/grid/radius geometry, also backing the
#: stations_within_radius_pairs oracle) so the radius, cell size and
#: station formula cannot drift between the three oracles
from apache_beam_challange_spark.plans.traindata import (  # noqa: E402
    STATION_RADIUS_CTE,
)

_STATION_EDGES_CTE = (
    STATION_RADIUS_CTE
    + """,
edges AS (
    SELECT id_1 AS u, id_2 AS v FROM dist WHERE distance_km <= 2.0
)"""
)


@query(
    "adamic_adar_link_prediction",
    oracle=f"""
WITH {_STATION_EDGES_CTE},
deg AS (
    SELECT node, COUNT(*) AS d
    FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
    GROUP BY node
),
adj AS (
    SELECT e.u AS z, e.v AS n FROM edges e
    UNION ALL
    SELECT e.v AS z, e.u AS n FROM edges e
),
adjd AS (
    SELECT adj.z, adj.n, deg.d FROM adj JOIN deg ON adj.z = deg.node
),
wedges AS (
    SELECT a.n AS u, b.n AS v, a.d AS dz
    FROM adjd a JOIN adjd b ON a.z = b.z AND a.n < b.n
),
scored AS (
    SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n_common,
           SUM(1.0 / ln(CAST(dz AS DOUBLE))) AS aa_score
    FROM wedges GROUP BY u, v
)
SELECT s.u AS id_1, s.v AS id_2, s.n_common,
       ROUND(s.aa_score, 6) AS aa_score
FROM scored s LEFT JOIN edges e ON s.u = e.u AND s.v = e.v
WHERE e.u IS NULL
ORDER BY aa_score DESC, id_1, id_2
LIMIT 50
""".strip(),
)
def adamic_adar_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the station-proximity graph (the
    2 km radius-pair edges of `stations_within_radius_pairs`, ONE edge
    definition for both queries): the top-50 NON-adjacent station pairs
    ranked by ``sum over common neighbors z of 1/ln(deg z)`` — pairs
    just outside the radius whose shared neighborhoods say they belong
    to the same cluster. A geometric graph keeps the check non-vacuous
    at every SF (wedges genuinely stay open), where the MinHash LSH
    graph's duplicate clusters are band-complete cliques with nothing to
    predict. Wedge equi-join on the center node (the triangle-counting
    join class — never pair x pair), anti-join against the edge list;
    `operators/graph.py:adamic_adar` documents the hub-degree cap for
    adversarial degree distributions (off here: radius graphs are
    degree-bounded by the cell capacity)."""
    from apache_beam_challange_spark.operators.graph import adamic_adar
    from apache_beam_challange_spark.plans.traindata import (
        stations_within_radius_pairs,
    )

    # the operator reads its edge input from ~7 plan branches; the
    # radius-join chain is expensive, so materialize it once here (the
    # operator itself stays policy-free)
    edges = (
        stations_within_radius_pairs(spark, sf_dir)
        .select(F.col("id_1").alias("u"), F.col("id_2").alias("v"))
        .localCheckpoint(eager=False)
    )
    return (
        adamic_adar(edges)
        .select(
            F.col("u").alias("id_1"),
            F.col("v").alias("id_2"),
            "n_common",
            F.round("aa_score", 6).alias("aa_score"),
        )
        .orderBy(F.col("aa_score").desc(), "id_1", "id_2")
        .limit(50)
    )


# --- containment on LSH candidates ------------------------------------------

_MIN_CONTAINMENT = 0.8


@query(
    "containment_dup_pairs",
    oracle=f"""
WITH {_MINHASH_CTE},
bands AS (
    SELECT doc_id, CAST(FLOOR(hash_idx / 2) AS BIGINT) AS band_idx,
           STRING_AGG(CAST(min_hash AS VARCHAR), '|' ORDER BY hash_idx) AS band_val
    FROM mh
    GROUP BY doc_id, FLOOR(hash_idx / 2)
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
    FROM bands a
    JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                AND a.doc_id < b.doc_id
),
tokset AS (
    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
sizes AS (
    SELECT doc_id, COUNT(*) AS n_tokens FROM tokset GROUP BY doc_id
),
inter AS (
    SELECT c.doc_id_1, c.doc_id_2, CAST(COUNT(*) AS BIGINT) AS n_inter
    FROM cand c
    JOIN tokset a ON a.doc_id = c.doc_id_1
    JOIN tokset b ON b.doc_id = c.doc_id_2 AND b.token = a.token
    GROUP BY c.doc_id_1, c.doc_id_2
)
SELECT i.doc_id_1, i.doc_id_2, i.n_inter,
       CAST(s1.n_tokens AS BIGINT) AS n1,
       CAST(s2.n_tokens AS BIGINT) AS n2,
       ROUND(i.n_inter * 1.0 / LEAST(s1.n_tokens, s2.n_tokens), 6)
           AS containment
FROM inter i
JOIN sizes s1 ON i.doc_id_1 = s1.doc_id
JOIN sizes s2 ON i.doc_id_2 = s2.doc_id
WHERE i.n_inter * 1.0 / LEAST(s1.n_tokens, s2.n_tokens) >= 0.8
""".strip(),
)
def containment_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment verification on the MinHash-LSH candidates:
    ``|A ∩ B| / min(|A|, |B|)`` — the subset-duplication detector
    (a short document quoted wholesale inside a long one scores low
    symmetric Jaccard but containment ~1; Broder's containment measure).
    Same two-stage scale shape as `jaccard_on_lsh_candidates`: the LSH
    recall stage proposes linearly many candidates from the at-rest
    signature table, the exact verifier touches only those."""
    from apache_beam_challange_spark.operators.dedup import (
        containment_on_candidates,
        lsh_candidate_pairs,
    )
    from apache_beam_challange_spark.plans.extensions import minhash_sigs_at_rest

    docs = load_table(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(
        minhash_sigs_at_rest(spark, sf_dir), rows_per_band=2
    )
    return containment_on_candidates(
        docs, cand, min_containment=_MIN_CONTAINMENT
    )


# --- grid DBSCAN over the station layout ------------------------------------

#: DBSCAN core threshold: a station is core with >= this many radius
#: neighbors (minPts excluding the point itself)
_DBSCAN_MIN_NEIGHBORS = 2


@query(
    "station_dbscan_clusters",
    oracle=f"""
WITH RECURSIVE {_STATION_EDGES_CTE},
deg AS (
    SELECT node, COUNT(*) AS d
    FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
    GROUP BY node
),
core AS (
    SELECT node FROM deg WHERE d >= {_DBSCAN_MIN_NEIGHBORS}
),
core_edges AS (
    SELECT e.u AS node, e.v AS nbr FROM edges e
    WHERE e.u IN (SELECT node FROM core) AND e.v IN (SELECT node FROM core)
    UNION ALL
    SELECT e.v AS node, e.u AS nbr FROM edges e
    WHERE e.u IN (SELECT node FROM core) AND e.v IN (SELECT node FROM core)
),
reach AS (
    SELECT node, node AS lbl FROM core
    UNION
    SELECT e.nbr AS node, r.lbl
    FROM reach r JOIN core_edges e ON e.node = r.node
),
comp AS (
    SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
),
adj AS (
    SELECT e.u AS node, e.v AS nbr FROM edges e
    UNION ALL
    SELECT e.v AS node, e.u AS nbr FROM edges e
),
border AS (
    SELECT a.node, MIN(c.component) AS component
    FROM adj a JOIN comp c ON a.nbr = c.node
    WHERE a.node NOT IN (SELECT node FROM core)
    GROUP BY a.node
),
labeled AS (
    SELECT s.id,
           CASE WHEN co.node IS NOT NULL THEN 'core'
                WHEN b.node IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           COALESCE(cm.component, b.component, -1) AS cluster
    FROM stations s
    LEFT JOIN core co ON co.node = s.id
    LEFT JOIN comp cm ON cm.node = s.id
    LEFT JOIN border b ON b.node = s.id
)
SELECT id, role, CAST(cluster AS BIGINT) AS cluster
FROM labeled
""".strip(),
)
def station_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-accelerated DBSCAN (Ester et al. 1996 — public literature)
    over the station layout: the 2 km radius-pair edge list (grid-cell
    equi-join, the shared definition with `stations_within_radius_pairs`
    and the Adamic-Adar query) provides the epsilon-neighborhoods; a
    station with >= 2 neighbors is CORE; clusters are the connected
    components of the core-core subgraph (min-label propagation, the CC
    operator); non-core stations adjacent to a core join its cluster as
    BORDER (ties to the smallest component label — deterministic where
    classical DBSCAN is arrival-order-dependent); everything else is
    NOISE (cluster -1). Density-based clustering at scale without any
    all-pairs step: the neighborhood join is the cell equi-join, and the
    core clustering is TWO-PHASE (VERDICT r7 #4): each 4x4-grid-cell
    SUPER-CELL's intra-cell subgraph contracts locally in one
    applyInPandas union-find (population bounded by geometric density —
    no rounds, no shuffles), then large-star/small-star runs only on the
    contracted boundary graph, whose node count is super-cell-bounded —
    cutting the LSS round count that dominated the r7 wall (PERF.md has
    the before/after; a round-count test pins the reduction). History:
    min-label propagation hit its 25-round diameter bound loudly at
    sf0.1 (1000-station grid chains), the failure mode LSS exists for;
    raw LSS then made this the slowest bench query at 6.8-7.2 s."""
    from apache_beam_challange_spark.operators.graph import (
        connected_components_two_phase,
    )
    from apache_beam_challange_spark.plans.traindata import (
        stations_within_radius_pairs,
    )
    from apache_beam_challange_spark.sources.catalog import stations as station_dim

    # the radius edge list feeds deg (x2), the core semi-joins, adj (x2)
    # and border — materialize it once or the grid-probe + haversine +
    # distinct chain re-executes per consumer
    edges = (
        stations_within_radius_pairs(spark, sf_dir)
        .select(F.col("id_1").alias("u"), F.col("id_2").alias("v"))
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    core = deg.filter(F.col("d") >= _DBSCAN_MIN_NEIGHBORS).select("node")
    core_edges = (
        edges.join(core.withColumnRenamed("node", "u"), "u", "left_semi")
        .join(core.withColumnRenamed("node", "v"), "v", "left_semi")
        .select("u", "v")
    )
    # super-cell key for the phase-1 local contraction: 4x4 blocks of the
    # radius-sized grid cells (the same lat6/lon6 cell discipline as the
    # edge join) — population per super-cell is bounded by station
    # density over a fixed area, never by corpus size
    cells = station_dim(spark, sf_dir).select(
        F.col("id").alias("node"),
        F.concat_ws(
            ":",
            F.floor(
                F.round(F.col("latitude") * 1000000, 0).cast("long")
                / 20000
                / 4
            ).cast("long"),
            F.floor(
                F.round(F.col("longitude") * 1000000, 0).cast("long")
                / 30000
                / 4
            ).cast("long"),
        ).alias("cell"),
    )
    comp = connected_components_two_phase(
        core.withColumnRenamed("node", "id"),
        core_edges,
        cells,
        id_col="id",
        src_col="u",
        dst_col="v",
    )
    adj = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    border = (
        adj.join(core.withColumnRenamed("node", "__c"), adj.node == F.col("__c"), "left_anti")
        .join(
            comp.select(F.col("node").alias("nbr"), "component"),
            "nbr",
        )
        .groupBy("node")
        .agg(F.min("component").alias("b_component"))
    )
    stations = station_dim(spark, sf_dir).select("id")
    return (
        stations.join(
            comp.select(F.col("node").alias("id"), F.col("component").alias("c_component")),
            "id",
            "left",
        )
        .join(
            border.select(F.col("node").alias("id"), "b_component"), "id", "left"
        )
        .select(
            "id",
            F.when(F.col("c_component").isNotNull(), "core")
            .when(F.col("b_component").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
            F.coalesce("c_component", "b_component", F.lit(-1))
            .cast("long")
            .alias("cluster"),
        )
    )


# --- canonical representative per near-dup cluster --------------------------

from apache_beam_challange_spark.functions.text import (  # noqa: E402
    QUALITY_SCORE_SQL,
    quality_score,
)


@query(
    "cluster_canonical_docs",
    oracle=f"""
WITH RECURSIVE {_MINHASH_CTE},
bands AS (
    SELECT doc_id, CAST(FLOOR(hash_idx / 2) AS BIGINT) AS band_idx,
           STRING_AGG(CAST(min_hash AS VARCHAR), '|' ORDER BY hash_idx) AS band_val
    FROM mh
    GROUP BY doc_id, FLOOR(hash_idx / 2)
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
    FROM bands a
    JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                AND a.doc_id < b.doc_id
),
sym AS (
    SELECT doc_id_1 AS node, doc_id_2 AS nbr FROM cand
    UNION ALL
    SELECT doc_id_2 AS node, doc_id_1 AS nbr FROM cand
),
reach AS (
    SELECT doc_id AS node, doc_id AS lbl FROM documents
    UNION
    SELECT e.nbr AS node, r.lbl
    FROM reach r JOIN sym e ON e.node = r.node
),
comp AS (
    SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
),
scored AS (
    SELECT c.node AS doc_id, c.component,
           ROUND({QUALITY_SCORE_SQL}, 6) AS quality
    FROM comp c JOIN documents d ON d.doc_id = c.node
),
ranked AS (
    SELECT doc_id, component, quality,
           ROW_NUMBER() OVER (
               PARTITION BY component
               ORDER BY quality DESC, doc_id ASC
           ) AS rn,
           COUNT(*) OVER (PARTITION BY component) AS cluster_size
    FROM scored
)
SELECT component, doc_id AS canonical_doc_id, quality AS canonical_quality,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(cluster_size - 1 AS BIGINT) AS n_dropped
FROM ranked
WHERE rn = 1 AND cluster_size >= 2
""".strip(),
)
def cluster_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection per near-dup cluster — the
    keep-the-BEST policy real dedup pipelines use where
    `dedup_connected_components` keeps the min-id: each multi-member LSH
    connected component elects the member with the highest surface
    quality score (tie -> smallest doc_id), and reports how many
    near-dups retire. The composition is the existing CC fixpoint plus
    one quality-ranked window per component — one extra shuffle over
    the verdict the cluster stage already computes."""
    from apache_beam_challange_spark.operators.graph import connected_components
    from apache_beam_challange_spark.operators.dedup import lsh_candidate_pairs
    from apache_beam_challange_spark.plans.extensions import minhash_sigs_at_rest

    docs = load_table(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(
        minhash_sigs_at_rest(spark, sf_dir), rows_per_band=2
    )
    comp = connected_components(docs, cand)
    scored = comp.join(
        docs.select(
            "doc_id", F.round(quality_score(F.col("text")), 6).alias("quality")
        ),
        comp.node == F.col("doc_id"),
    ).select("doc_id", "component", "quality")
    w = Window.partitionBy("component").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    ranked = scored.select(
        "doc_id",
        "component",
        "quality",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("component")).alias(
            "cluster_size"
        ),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("cluster_size") >= 2)).select(
        "component",
        F.col("doc_id").alias("canonical_doc_id"),
        F.col("quality").alias("canonical_quality"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
        (F.col("cluster_size") - 1).cast("long").alias("n_dropped"),
    )


# --- SemDeDup: semantic dedup inside k-means clusters ------------------------

_SEMDEDUP_TAU = 0.35


def _semdedup_oracle() -> str:
    from apache_beam_challange_spark.operators.clustering import kmeans_cents_ctes

    return (
        "WITH "
        + kmeans_cents_ctes(k=4, n_iter=2)
        + f""",
assign AS (
    SELECT vec_id, centroid_id, ROUND(dist, 6) AS dist FROM (
        SELECT v.vec_id, c.centroid_id,
               list_distance(v.vec, c.cvec) AS dist,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_distance(v.vec, c.cvec), c.centroid_id
               ) AS rn
        FROM vecs v CROSS JOIN cents2 c
    ) WHERE rn = 1
),
ranked AS (
    SELECT a.vec_id, a.centroid_id,
           ROW_NUMBER() OVER (
               PARTITION BY a.centroid_id ORDER BY a.dist, a.vec_id
           ) AS rk
    FROM assign a
),
pruned AS (
    SELECT b.centroid_id, b.vec_id
    FROM ranked b
    WHERE EXISTS (
        SELECT 1 FROM ranked a
        JOIN vecs va ON va.vec_id = a.vec_id
        JOIN vecs vb ON vb.vec_id = b.vec_id
        WHERE a.centroid_id = b.centroid_id AND a.rk < b.rk
          AND list_dot_product(va.vec, vb.vec) >= {_SEMDEDUP_TAU}
    )
)
SELECT r.centroid_id,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COUNT(p.vec_id) AS BIGINT) AS n_pruned,
       CAST(COALESCE(MIN(p.vec_id), -1) AS BIGINT) AS min_pruned_vec,
       CAST(COALESCE(MAX(p.vec_id), -1) AS BIGINT) AS max_pruned_vec
FROM ranked r LEFT JOIN pruned p
  ON p.centroid_id = r.centroid_id AND p.vec_id = r.vec_id
GROUP BY r.centroid_id
ORDER BY r.centroid_id"""
    )


@query("semdedup_cluster_prune", oracle=_semdedup_oracle())
def semdedup_cluster_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", arXiv:2303.09540 —
    public literature): embedding-level near-duplicate pruning that
    catches SEMANTIC duplicates the shingle/MinHash families miss
    (same meaning, different surface form). Stage 1 clusters the
    embeddings with the existing deterministic k-means (k=4, 2 Lloyd
    rounds — `operators/clustering.py`, the same trajectory the IVF
    index trains); stage 2 compares pairs ONLY inside a cluster:
    members are ranked by (distance-to-centroid, vec_id) and an item
    is pruned when any earlier-ranked cluster-mate has similarity
    >= tau (0.35 — above the p99 of this corpus's pair-similarity
    distribution, so the verdict is selective, ~20%). Similarity is
    the DOT PRODUCT on L2-normalized embeddings — exactly the paper's
    cosine (SemDeDup normalizes on ingest; this corpus measures
    norm^2 = 1 +/- 2e-7), at a third of the per-pair fold cost of
    recomputing both norms for every pair. Deterministic keep-first
    discipline replaces the paper's random keep, making the whole
    verdict oracle-checkable; output is the per-cluster audit (sizes,
    pruned counts, pruned id range).

    Scale posture: the quadratic stage is BUCKETED by centroid_id —
    production SemDeDup (and this implementation) bounds per-cluster
    cost by growing k with the corpus (k ~ N/target_cluster_size), so
    the comparison volume is sum of bounded cluster squares, never a
    global all-pairs; the pair stage is one centroid-keyed shuffle of
    the (already tiny) id+vector projection, and the pruned set comes
    from a LEFT SEMI join (stop at the first qualifying earlier mate —
    no all-pairs materialization, no dedup shuffle). The cluster
    assignment reuses the broadcast-centroid narrow pass
    (`kmeans_assignments`).

    Cross-engine exactness: ranking uses the ROUNDED (6 dp) centroid
    distance the k-means operator already emits (ties -> vec_id), the
    tau comparison is the same sequential-fold dot in both engines,
    and every output column is an integer."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_prune(emb, k=4, n_iter=2)


@query(
    "semdedup_cluster_prune_k32",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       TRUE AS clusters_nonempty,
       TRUE AS pruned_bounded
FROM embeddings
""".strip(),
)
def semdedup_cluster_prune_k32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION-SHAPED SemDeDup plan under driver watch (VERDICT r7
    #7): the same `semdedup_prune` core at k=32 — the linearity knob
    PERF.md's table measures (k=4 is 18.3x at 10x by fixed-k design;
    k=32 restores ~3.2x) — run end to end, reduced to a RECOUNT-ORACLE
    row. The k=32 Lloyd trajectory cannot be replayed as a static SQL
    CTE chain (which is why the value-exact oracle entry pins k=4), so
    this entry checks the trajectory-independent invariants instead:
    cluster sizes PARTITION the corpus (n_items == corpus count — a
    dropped or double-counted vector breaks the hash), every cluster is
    non-empty, and no cluster prunes itself away (rank-1 always kept).
    Weaker than value equality, and labeled as such; the per-cluster
    k=32 invariants are additionally pytest-pinned at sf0.01
    (tests/test_approx.py)."""
    per = semdedup_prune(load_table(spark, sf_dir, "embeddings"), k=32, n_iter=2)
    return per.agg(
        F.sum("n_items").cast("long").alias("n_items"),
        F.min(F.col("n_items") > 0).alias("clusters_nonempty"),
        F.min(F.col("n_pruned") < F.col("n_items")).alias("pruned_bounded"),
    )


def semdedup_prune(emb: DataFrame, k: int, n_iter: int) -> DataFrame:
    """Parametrized SemDeDup core. ``k`` is the LINEARITY KNOB: per-item
    pair cost is the cluster size N/k, so production grows
    ``k ~ N / target_cluster_size`` and total pair volume stays linear
    (the paper clusters 50k-wide at web scale). The registry entry pins
    k=4 only because the DuckDB oracle replays the Lloyd trajectory as a
    static CTE chain; PERF.md records the measured 10x-data points for
    k=4 (super-linear, as fixed k must be) and k=32 (restored) to prove
    the knob works on this exact plan."""
    from apache_beam_challange_spark.functions.vector import as_double, dot
    from apache_beam_challange_spark.operators.clustering import kmeans_assignments

    vecs = emb.select("vec_id", as_double(F.col("embedding")).alias("vec"))
    assign = kmeans_assignments(emb, k=k, n_iter=n_iter)
    rk_w = Window.partitionBy("centroid_id").orderBy("dist", "vec_id")
    # Three consumers read the ranked assignment (both pair sides + the
    # final audit join); materialize the narrow (id, cluster, rank)
    # projection once instead of re-running the k-means window tree
    # 3x — at production scale this is the at-rest IVF assignment table.
    ranked = assign.select(
        "vec_id", "centroid_id", F.row_number().over(rk_w).alias("rk")
    ).localCheckpoint(eager=False)
    with_vec = ranked.join(vecs, "vec_id").select(
        "vec_id", "centroid_id", "rk", "vec"
    )
    a = with_vec.select(
        F.col("centroid_id").alias("cid"),
        F.col("rk").alias("rk_a"),
        F.col("vec").alias("vec_a"),
    )
    b = with_vec.select(
        "centroid_id",
        F.col("vec_id").alias("pruned_vec_id"),
        F.col("rk").alias("rk_b"),
        F.col("vec").alias("vec_b"),
    )
    pruned = b.join(
        a,
        (a.cid == b.centroid_id)
        & (a.rk_a < b.rk_b)
        & (dot(F.col("vec_a"), F.col("vec_b")) >= _SEMDEDUP_TAU),
        "leftsemi",
    ).select(
        F.col("centroid_id").alias("p_cid"),
        F.col("pruned_vec_id"),
    )
    return (
        ranked.join(
            pruned,
            (ranked.centroid_id == pruned.p_cid)
            & (ranked.vec_id == pruned.pruned_vec_id),
            "left",
        )
        .groupBy(ranked.centroid_id)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.count("pruned_vec_id").cast("long").alias("n_pruned"),
            F.coalesce(F.min("pruned_vec_id"), F.lit(-1))
            .cast("long")
            .alias("min_pruned_vec"),
            F.coalesce(F.max("pruned_vec_id"), F.lit(-1))
            .cast("long")
            .alias("max_pruned_vec"),
        )
        .orderBy("centroid_id")
    )

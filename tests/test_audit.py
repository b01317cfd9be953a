"""Round-6 audit family: simplified silhouette, k-anonymity audit,
CEP-style event pattern matching.

The oracle gate verifies exact values against DuckDB; these tests pin
the semantic invariants (silhouette bounds and agreement with a Python
reference on the assignment, k-anonymity accounting, regex-journey
counts recomputed from raw events) and the plan shapes.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QS = entrymod.all_queries()


# --- kmeans_silhouette ------------------------------------------------------


def test_silhouette_bounds_and_population(spark, sf_dir):
    rows = QS["kmeans_silhouette"](spark, sf_dir).collect()
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_points for r in rows) == emb_n
    for r in rows:
        assert -1.0 <= r.min_silhouette <= r.avg_silhouette <= 1.0


def test_silhouette_agrees_with_assignment(spark, sf_dir):
    """Cluster sizes must match the k-means assignment query — the
    silhouette is an evaluation of THAT clustering, not a re-clustering."""
    sil = {r.centroid_id: r.n_points for r in QS["kmeans_silhouette"](spark, sf_dir).collect()}
    asg = (
        QS["kmeans_embedding_clusters"](spark, sf_dir)
        .groupBy("centroid_id")
        .count()
        .collect()
    )
    assert sil == {r.centroid_id: r["count"] for r in asg}


def test_silhouette_separated_clusters_score_high(spark):
    """Closed-form check: two tight, far-apart clusters must score near 1."""
    from apache_beam_challange_spark.functions.vector import as_double
    from apache_beam_challange_spark.operators.clustering import (
        _sq_l2,
        kmeans_centroids,
    )
    from pyspark.sql import Window

    pts = [([0.0, 0.0], 0), ([0.0, 0.1], 1), ([10.0, 10.0], 2), ([10.0, 10.1], 3)]
    emb = spark.createDataFrame(
        [(i, v, l) for i, (v, l) in enumerate(pts)],
        "vec_id long, embedding array<double>, label int",
    )
    cents = kmeans_centroids(emb, k=2, n_iter=2)
    vecs = emb.select("vec_id", as_double(F.col("embedding")).alias("vec"))
    w = Window.partitionBy("vec_id").orderBy("dist", "centroid_id")
    ranked = (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("dist", _sq_l2(F.col("vec"), F.col("cvec")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
    )
    ab = ranked.groupBy("vec_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("dist"))).alias("a"),
        F.max(F.when(F.col("rn") == 2, F.col("dist"))).alias("b"),
    )
    for r in ab.collect():
        s = (r.b - r.a) / max(r.a, r.b)
        assert s > 0.98


# --- k_anonymity_audit ------------------------------------------------------


def test_k_anonymity_matches_python_reference(spark, sf_dir):
    from apache_beam_challange_spark.plans.audit import _CHARS_BUCKET, _K_ANON

    got = {r.lang: r for r in QS["k_anonymity_audit"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    classes: dict[tuple, int] = {}
    for d in docs:
        key = (d.lang, d.source, d.n_chars // _CHARS_BUCKET)
        classes[key] = classes.get(key, 0) + 1
    langs = {k[0] for k in classes}
    assert set(got) == langs
    for lang in langs:
        mine = {k: v for k, v in classes.items() if k[0] == lang}
        r = got[lang]
        assert r.n_classes == len(mine)
        assert r.n_violating_classes == sum(1 for v in mine.values() if v < _K_ANON)
        assert r.n_rows_at_risk == sum(v for v in mine.values() if v < _K_ANON)
        assert r.min_class_size == min(mine.values())


# --- event_pattern_matches --------------------------------------------------


def test_patterns_match_python_reference(spark, sf_dir):
    """Rebuild every journey string in Python and re-count both regexes —
    pins the ordering tiebreak, the day scoping and the match
    semantics end to end."""
    got = {
        (r.user_id, str(r.day)): (r.n_events, r.n_funnel, r.n_error_retry)
        for r in QS["event_pattern_matches"](spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    journeys: dict[tuple, list] = {}
    for e in ev:
        key = (e.user_id, str(e.ts.date()))
        journeys.setdefault(key, []).append((e.ts, e.event_id, e.event_type[0]))
    expect = {}
    for key, evs in journeys.items():
        evs.sort()
        j = "".join(t for _, _, t in evs)
        nf = len(re.findall("vc*p", j))
        nr = len(re.findall("e+p", j))
        if nf > 0 or nr > 0:
            expect[key] = (len(evs), nf, nr)
    assert got == expect


def test_pattern_counts_on_crafted_journey(spark):
    """Closed-form on the journey 'vccpevpeep': exactly 2 funnel matches
    (vccp, vp) and 1 error-retry match (eep) — Python and Spark agree."""
    j = "vccpevpeep"
    assert len(re.findall("vc*p", j)) == 2  # vccp, vp
    assert len(re.findall("e+p", j)) == 1  # eep (the 'e' before 'vp' is not followed by p)
    row = (
        spark.range(1)
        .select(
            F.size(F.regexp_extract_all(F.lit(j), F.lit("vc*p"), F.lit(0))).alias("nf"),
            F.size(F.regexp_extract_all(F.lit(j), F.lit("e+p"), F.lit(0))).alias("nr"),
        )
        .collect()[0]
    )
    assert (row.nf, row.nr) == (2, 1)


# --- plan shapes ------------------------------------------------------------




def test_silhouette_broadcasts_codebook(plans):
    """The vectors x centroids join must broadcast the k-row codebook —
    never shuffle the embedding table against it."""
    p = plans("kmeans_silhouette")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_k_anonymity_two_phase_no_join(plans):
    p = plans("k_anonymity_audit")
    assert "Join" not in p
    assert p.count("FileScan parquet") == 1
    assert "partial_count" in p or "partial_sum" in p


def test_patterns_single_shuffle_no_join(plans):
    """One (user, day) aggregate carries the whole query — no join, no
    global window, one exchange."""
    p = plans("event_pattern_matches")
    assert "Join" not in p
    assert p.count("Exchange") <= 2  # the (user, day) hash + AQE reads


# --- dp_noisy_lang_counts ---------------------------------------------------


def test_dp_noise_matches_python_reference(spark, sf_dir):
    """Recompute the seeded Laplace inverse-CDF draw from hashlib/math —
    pins the derandomized mechanism end to end."""
    import hashlib
    import math

    from apache_beam_challange_spark.plans.audit import _DP_EPSILON, _DP_SEED

    rows = QS["dp_noisy_lang_counts"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    true = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert {r.lang for r in rows} == set(true)
    b = 1.0 / _DP_EPSILON
    for r in rows:
        assert r.n_docs == true[r.lang]
        u = int(hashlib.md5(f"{_DP_SEED}{r.lang}".encode()).hexdigest()[:15], 16) / 16**15
        if u >= 0.5:
            noise = -b * math.log(1.0 - 2.0 * (u - 0.5))
        else:
            noise = b * math.log(1.0 - 2.0 * (0.5 - u))
        assert r.noisy_count == pytest.approx(round(r.n_docs + noise, 6), abs=2e-6)
        assert r.epsilon == _DP_EPSILON


# --- unpivot_returnflag_metrics ---------------------------------------------


def test_unpivot_matches_wide_aggregate(spark, sf_dir):
    rows = QS["unpivot_returnflag_metrics"](spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    wide = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
        )
        .collect()
    }
    assert len(rows) == 3 * len(wide)
    for r in rows:
        assert r.value == wide[r.l_returnflag][r.metric]


def test_unpivot_is_expand_not_union_rescan(spark, sf_dir):
    """The reshape must be one Expand over the aggregate — not three
    re-scans of the fact table unioned together."""
    p = (
        QS["unpivot_returnflag_metrics"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in p
    assert p.count("FileScan parquet") == 1


# --- event_transition_matrix ------------------------------------------------


def test_transition_matrix_matches_python_reference(spark, sf_dir):
    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.prob)
        for r in QS["event_transition_matrix"](spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    seqs: dict[int, list] = {}
    for e in ev:
        seqs.setdefault(e.user_id, []).append((e.ts, e.event_id, e.event_type))
    counts: dict[tuple, int] = {}
    for evs in seqs.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    assert set(got) == set(counts)
    row_tot: dict[str, int] = {}
    for (a, _), n in counts.items():
        row_tot[a] = row_tot.get(a, 0) + n
    for (a, b), (n, p) in got.items():
        assert n == counts[(a, b)]
        assert p == pytest.approx(round(counts[(a, b)] / row_tot[a], 6))


def test_transition_rows_normalize_to_one(spark, sf_dir):
    rows = QS["event_transition_matrix"](spark, sf_dir).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.prob
    for total in by_from.values():
        assert total == pytest.approx(1.0, abs=5e-6)


# --- hll_intersection_users -------------------------------------------------


def test_hll_intersection_tracks_exact(spark, sf_dir):
    """The inclusion-exclusion estimate must land near the exact overlap
    (64 registers -> ~13% standard error; assert a generous 3-sigma
    band) and the estimates must be internally consistent."""
    r = QS["hll_intersection_users"](spark, sf_dir).collect()[0]
    assert r.est_union_users <= r.est_view_users + r.est_purchase_users + 1e-6
    assert r.exact_intersection_users >= 0
    if r.exact_intersection_users > 0:
        rel = abs(r.est_intersection_users - r.exact_intersection_users) / r.exact_intersection_users
        assert rel < 0.45  # 3 sigma of ~13% + algebra amplification


def test_hll_register_construction_shared_with_base_query(spark, sf_dir):
    """The union-set registers must equal the standalone
    hll_registers_users registers restricted to view/purchase users —
    one register definition, not a drifted copy."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    users = {
        r.user_id
        for r in ev.filter(F.col("event_type").isin("view", "purchase"))
        .select("user_id")
        .distinct()
        .collect()
    }
    import hashlib

    def hex4(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)

    regs: dict[int, int] = {}
    for u in users:
        b = hex4(str(u)) % 64
        w = (hex4(f"w#{u}") * 65536 + hex4(f"v#{u}")) % 16777216
        rho = 25 if w == 0 else 24 - int(__import__("math").floor(__import__("math").log2(w)))
        regs[b] = max(regs.get(b, 0), rho)
    # recompute the union estimate from the Python registers
    import math

    s = sum(2.0 ** -regs.get(b, 0) for b in range(64))
    z = sum(1 for b in range(64) if regs.get(b, 0) == 0)
    raw = 0.709 * 64 * 64 / s
    est = 64.0 * math.log(64.0 / z) if (raw <= 160.0 and z > 0) else raw
    r = QS["hll_intersection_users"](spark, sf_dir).collect()[0]
    assert r.est_union_users == pytest.approx(round(est, 4), abs=2e-4)


# --- shuffle_skew_report ----------------------------------------------------


def test_skew_report_matches_python_reference(spark, sf_dir):
    r = QS["shuffle_skew_report"](spark, sf_dir).collect()[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    counts: dict[int, int] = {}
    for row in o:
        counts[row.o_custkey] = counts.get(row.o_custkey, 0) + 1
    total = sum(counts.values())
    mx = max(counts.values())
    top10 = sum(sorted(counts.values(), reverse=True)[:10])
    assert r.n_keys == len(counts)
    assert r.n_rows == total
    assert r.max_key_rows == mx
    assert r.top_key_share == pytest.approx(round(mx / total, 6))
    assert r.skew_factor == pytest.approx(round(mx * len(counts) / total, 6))
    assert r.top10_rows == top10
    assert r.skew_factor >= 1.0  # max >= mean always


# --- benford_price_audit ------------------------------------------------------


def test_benford_micro_table_is_rounded_log10(spark):
    """The pinned integer-millionth literals ARE round(log10(1+1/d)*1e6)
    and partition 1e6 exactly — the property that makes expected counts
    drift-free."""
    import math

    from apache_beam_challange_spark.plans.audit import _BENFORD_MICRO

    for d, p in _BENFORD_MICRO.items():
        assert p == round(math.log10(1 + 1 / d) * 1_000_000)
    assert sum(_BENFORD_MICRO.values()) == 1_000_000


def test_benford_audit_conservation(spark, sf_dir):
    """Observed digits sum to the row count; expected_micro sums to
    exactly total*1e6 (no rounding remainder); all 9 digits present."""
    rows = QS["benford_price_audit"](spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert [r.first_digit for r in rows] == list(range(1, 10))
    assert sum(r.observed for r in rows) == n
    assert sum(r.expected_micro for r in rows) == n * 1_000_000
    for r in rows:
        assert r.abs_dev_micro == abs(r.observed * 1_000_000 - r.expected_micro)


# --- snapshot_diff_audit ------------------------------------------------------


def test_snapshot_diff_partitions_and_matches_python(spark, sf_dir):
    """added+changed+unchanged == n_keys_new; removed+changed+unchanged
    == n_keys_old; counts match a driver-side recompute of both
    snapshots (latest-row-wins with 'error' tombstones)."""
    r = QS["snapshot_diff_audit"](spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    cutoff = max(e.ts for e in ev).replace(hour=0, minute=0, second=0, microsecond=0)

    def snap(rows):
        best = {}
        for e in rows:
            k = e.user_id
            if k not in best or (e.ts, e.event_id) > (best[k].ts, best[k].event_id):
                best[k] = e
        return {
            k: (e.event_type, e.value)
            for k, e in best.items()
            if e.event_type != "error"
        }

    old = snap([e for e in ev if e.ts < cutoff])
    new = snap(ev)
    added = len(new.keys() - old.keys())
    removed = len(old.keys() - new.keys())
    common = old.keys() & new.keys()
    changed = sum(1 for k in common if old[k] != new[k])
    assert (r.n_keys_old, r.n_keys_new) == (len(old), len(new))
    assert (r.added, r.removed, r.changed) == (added, removed, changed)
    assert r.added + r.changed + r.unchanged == r.n_keys_new
    assert r.removed + r.changed + r.unchanged == r.n_keys_old
    assert r.changed_event_type <= r.changed and r.changed_value <= r.changed


# --- l_diversity_audit --------------------------------------------------------


def test_l_diversity_matches_python_and_fires(spark, sf_dir):
    """Per-source class stats match a driver-side recompute, the l=3
    threshold actually fires somewhere (non-vacuous), and rows at risk
    never exceed the source's row count."""
    from apache_beam_challange_spark.plans.audit import _CHARS_BUCKET, _L_DIVERSITY

    rows = QS["l_diversity_audit"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    classes: dict[tuple, set] = {}
    sizes: dict[tuple, int] = {}
    for d in docs:
        k = (d.source, int(d.n_chars // _CHARS_BUCKET))
        classes.setdefault(k, set()).add(d.lang)
        sizes[k] = sizes.get(k, 0) + 1
    for r in rows:
        ks = [k for k in classes if k[0] == r.source]
        viol = [k for k in ks if len(classes[k]) < _L_DIVERSITY]
        assert r.n_classes == len(ks)
        assert r.n_violating_classes == len(viol)
        assert r.n_rows_at_risk == sum(sizes[k] for k in viol)
        assert r.min_diversity == min(len(classes[k]) for k in ks)
    assert sum(r.n_violating_classes for r in rows) > 0


# --- cuped_variance_reduction ---------------------------------------------------


def test_cuped_matches_python_and_reduces_variance(spark, sf_dir):
    """theta, variances and the reduction ratio match a driver-side
    recompute from the same integer micros; at the optimal theta the
    reduction equals rho^2, so it lies in [0, 1) and var_y_adj <=
    var_y."""
    r = QS["cuped_variance_reduction"](spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    import math
    from datetime import timezone

    def epoch(ts):  # collected ntz values are naive UTC; pin the zone
        return math.floor(ts.replace(tzinfo=timezone.utc).timestamp())

    epochs = [epoch(e.ts) for e in ev]
    mid = (min(epochs) + max(epochs)) // 2
    per: dict[int, list[int]] = {}
    for e in ev:
        xy = per.setdefault(e.user_id, [0, 0])
        xy[0 if epoch(e.ts) < mid else 1] += math.floor(
            e.value * 1_000_000
        )
    n = len(per)
    xs = [v[0] for v in per.values()]
    ys = [v[1] for v in per.values()]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    cov_num = float(n * sxy - sx * sy)
    varx_num = float(n * sxx - sx * sx)
    vary_num = float(n * syy - sy * sy)
    theta = cov_num / varx_num
    assert r.n_users == n
    assert r.theta == pytest.approx(round(theta, 6))
    assert r.var_y == pytest.approx(round(vary_num / n / n / 1e12, 4))
    assert 0.0 <= r.var_reduction < 1.0
    assert r.var_y_adj <= r.var_y
    rho2 = cov_num * cov_num / (varx_num * vary_num)
    assert r.var_reduction == pytest.approx(rho2, rel=1e-4)


def test_psi_matches_numpy_replay(spark, sf_dir):
    """PSI must equal a numpy replay of the identical pipeline: bit-length
    cent bins, 24-bin spine, 0.5/12.0 smoothing, left-to-right bin-order
    summation."""
    import numpy as np
    import pyarrow.parquet as pq

    from apache_beam_challange_spark.plans.audit import (
        _PSI_BINS,
        psi_weekend_drift_by_type,
    )

    t = pq.read_table(
        sf_dir + "/events.parquet", columns=["ts", "event_type", "value"]
    ).to_pandas()
    cents = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    bins = np.frompyfunc(int.bit_length, 1, 1)(cents).astype(np.int64)
    wknd = t["ts"].dt.weekday.to_numpy() >= 5
    rows = psi_weekend_drift_by_type(spark, sf_dir).collect()
    for r in rows:
        m = (t["event_type"] == r["event_type"]).to_numpy()
        nb = np.bincount(bins[m & ~wknd], minlength=_PSI_BINS + 1)
        nc = np.bincount(bins[m & wknd], minlength=_PSI_BINS + 1)
        tb, tc = float(nb.sum()), float(nc.sum())
        assert (r["n_base"], r["n_curr"]) == (int(tb), int(tc))
        psi = 0.0
        for b in range(1, _PSI_BINS + 1):
            pb = (float(nb[b]) + 0.5) / (tb + 12.0)
            pc = (float(nc[b]) + 0.5) / (tc + 12.0)
            psi += (pc - pb) * np.log(pc / pb)
        assert np.isclose(r["psi"], psi, rtol=1e-12)


def test_km_matches_numpy_replay(spark, sf_dir):
    """The KM curve must equal a numpy replay: exact integer-hour
    durations, suffix-sum at-risk, sequential survival product."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from apache_beam_challange_spark.plans.audit import (
        _KM_HOUR_US,
        km_time_to_purchase,
    )

    t = pq.read_table(
        sf_dir + "/events.parquet", columns=["ts", "user_id", "event_type"]
    ).to_pandas()
    us = t["ts"].astype("datetime64[us]").astype("int64")  # exact micros
    g = pd.DataFrame(
        {"user_id": t["user_id"], "us": us, "p": t["event_type"] == "purchase"}
    )
    per = g.groupby("user_id").agg(
        t0=("us", "min"),
        tl=("us", "max"),
    )
    tp = g[g["p"]].groupby("user_id")["us"].min()
    per["tp"] = tp
    end = per["tp"].fillna(per["tl"]).astype("int64")
    dur = (end - per["t0"]) // _KM_HOUR_US
    died = per["tp"].notna()
    rows = km_time_to_purchase(spark, sf_dir).collect()
    surv = 1.0
    expect = []
    for d in sorted(dur[died].unique()):
        at_risk = int((dur >= d).sum())
        deaths = int((dur[died] == d).sum())
        surv = surv * (1.0 - float(deaths) / float(at_risk))
        expect.append((int(d), at_risk, deaths, surv))
    got = [(r["dur_h"], r["at_risk"], r["deaths"], r["surv"]) for r in rows]
    assert [(a, b, c) for a, b, c, _ in expect] == [
        (a, b, c) for a, b, c, _ in got
    ]
    assert np.allclose(
        [s for *_, s in got], [s for *_, s in expect], rtol=1e-12
    )
    # survival is a proper non-increasing curve in [0, 1] (exactly 0.0
    # when the final step's at-risk set all convert, as at sf0.001)
    vals = [s for *_, s in got]
    assert all(0.0 <= s <= 1.0 for s in vals)
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_bootstrap_ci_matches_hashlib_replay(spark, sf_dir):
    """Every replicate world must be bit-reproducible outside Spark AND
    DuckDB: recompute the md5 uniforms + Poisson weights in pure
    Python and verify n, mean, and both CI order statistics."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from apache_beam_challange_spark.plans.audit import (
        _BOOT_B,
        _BOOT_CDF,
        _BOOT_DENOM,
        bootstrap_ci_value_by_type,
    )

    t = pq.read_table(
        sf_dir + "/events.parquet",
        columns=["event_id", "event_type", "value"],
    ).to_pandas()
    vu = np.floor(t["value"].to_numpy() * 10000 + 0.5).astype(np.int64)
    rows = bootstrap_ci_value_by_type(spark, sf_dir).collect()
    for r in rows:
        m = (t["event_type"] == r["event_type"]).to_numpy()
        ids = t["event_id"].to_numpy()[m]
        v = vu[m]
        assert r["n"] == int(m.sum())
        assert np.isclose(
            r["mean_value"], v.sum() / len(v) / 10000.0, rtol=1e-12
        )
        means = []
        for rep in range(_BOOT_B):
            wn = wd = 0
            for eid, val in zip(ids, v):
                h = hashlib.md5(f"boot#{eid}#{rep}".encode()).hexdigest()
                u = float(int(h[:15], 16)) / float(_BOOT_DENOM)
                w = next(
                    (k for k, c in enumerate(_BOOT_CDF) if u < c),
                    len(_BOOT_CDF),
                )
                wn += w * int(val)
                wd += w
            means.append((wn / wd / 10000.0, rep))
        means.sort()
        assert np.isclose(r["ci_lo"], means[1][0], rtol=1e-12)
        assert np.isclose(r["ci_hi"], means[_BOOT_B - 2][0], rtol=1e-12)
        assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"]


def test_dq_expectations_accounting(spark, sf_dir):
    """Every check's totals must match the raw tables, the generator's
    hard invariants (unique keys, non-null FKs, clean RI) must PASS,
    and `passed` must derive from the violation count."""
    rows = QS["data_quality_expectations"](spark, sf_dir).collect()
    by = {r["check_name"]: r for r in rows}
    assert len(rows) == 7
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert by["orders_orderkey_unique"]["n_total"] == n_orders
    assert by["events_type_accepted"]["n_total"] == n_events
    for name in (
        "orders_orderkey_unique",
        "orders_custkey_not_null",
        "orders_custkey_ri_customer",
        "events_type_accepted",
        "lineitem_quantity_in_range",
    ):
        assert by[name]["n_violations"] == 0 and by[name]["passed"]
    for r in rows:
        assert r["passed"] == (r["n_violations"] == 0)
        assert 0 <= r["n_violations"] <= r["n_total"]


def test_markov_backtest_consistent_with_matrix(spark, sf_dir):
    """In-sample top-1 accuracy per from-state must equal the MAX
    transition probability in `event_transition_matrix` (that IS what
    predicting the argmax scores on the training stream), and the
    predicted label must be the matrix's argmax row."""
    mat = QS["event_transition_matrix"](spark, sf_dir).collect()
    best = {}
    for r in mat:
        cur = best.get(r["from_type"])
        key = (r["n_transitions"], r["to_type"])
        # argmax by count, tie-break by type name ASC (so invert name order)
        if cur is None or r["n_transitions"] > cur[0][0] or (
            r["n_transitions"] == cur[0][0] and r["to_type"] < cur[0][1]
        ):
            best[r["from_type"]] = (key, r)
    rows = QS["markov_backtest_accuracy"](spark, sf_dir).collect()
    assert {r["from_type"] for r in rows} == set(best)
    for r in rows:
        _, b = best[r["from_type"]]
        assert r["predicted"] == b["to_type"]
        assert abs(r["accuracy"] - b["prob"]) < 2e-6  # prob rounded to 6
        assert r["n_hits"] == b["n_transitions"]
        assert 0.0 < r["accuracy"] <= 1.0


def test_ks_matches_scipy_style_replay(spark, sf_dir):
    """Replay the exact two-sample KS in numpy over the merged cent
    support and check statistic + argmax location."""
    import numpy as np
    import pyarrow.parquet as pq

    from apache_beam_challange_spark.plans.audit import ks_test_weekend_value

    t = pq.read_table(
        sf_dir + "/events.parquet", columns=["ts", "event_type", "value"]
    ).to_pandas()
    cents = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    wknd = t["ts"].dt.weekday.to_numpy() >= 5
    rows = ks_test_weekend_value(spark, sf_dir).collect()
    for r in rows:
        m = (t["event_type"] == r["event_type"]).to_numpy()
        a = np.sort(cents[m & ~wknd])
        b = np.sort(cents[m & wknd])
        assert (r["n_base"], r["n_curr"]) == (len(a), len(b))
        support = np.unique(cents[m])
        ca = np.searchsorted(a, support, side="right").astype(object)
        cb = np.searchsorted(b, support, side="right").astype(object)
        gap = np.abs(ca * len(b) - cb * len(a))  # exact python ints
        best = int(np.max(gap))
        assert np.isclose(
            r["ks_stat"], best / (len(a) * len(b)), rtol=1e-12
        )
        assert r["argmax_cent"] == int(support[np.argmax(gap)])
        assert 0.0 <= r["ks_stat"] <= 1.0


def test_chi2_matches_scipy_formula_replay(spark, sf_dir):
    """Replay Pearson chi2 in numpy (exact counts, same term order) and
    check the statistic, dof, and dims."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from apache_beam_challange_spark.plans.audit import (
        chi2_type_dow_independence,
    )

    t = pq.read_table(
        sf_dir + "/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    t["dow"] = t["ts"].dt.weekday + 1
    ct = pd.crosstab(t["event_type"], t["dow"])
    n = ct.values.sum()
    chi2 = 0.0
    for et in sorted(ct.index):
        for d in sorted(ct.columns):
            obs = float(ct.loc[et, d])
            e = float(ct.loc[et].sum()) * float(ct[d].sum()) / float(n)
            if e > 0:
                chi2 += (obs - e) * (obs - e) / e
    [r] = chi2_type_dow_independence(spark, sf_dir).collect()
    assert r["n_events"] == int(n)
    assert r["dof"] == (len(ct.index) - 1) * (len(ct.columns) - 1)
    assert np.isclose(r["chi2"], chi2, rtol=1e-9)
    assert r["chi2"] >= 0.0


def test_mde_matches_closed_form(spark, sf_dir):
    """Replay MDE = (z_a+z_b)*sqrt(2*var/(n/2)) in numpy on identically
    quantized data; sanity: MDE shrinks as n grows (compare the two
    largest types)."""
    import numpy as np
    import pyarrow.parquet as pq

    from apache_beam_challange_spark.plans.audit import (
        _MDE_Z_ALPHA,
        _MDE_Z_BETA,
        mde_power_analysis,
    )

    t = pq.read_table(
        sf_dir + "/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    vu = np.floor(t["value"].to_numpy() * 10000 + 0.5).astype(np.int64)
    rows = mde_power_analysis(spark, sf_dir).collect()
    for r in rows:
        m = (t["event_type"] == r["event_type"]).to_numpy()
        v = vu[m]
        n = np.float64(len(v))
        mean_u = np.float64(v.sum()) / n
        var_v = (np.float64((v.astype(object) ** 2).sum()) / n - mean_u * mean_u) / 1e8
        assert r["n"] == len(v)
        assert np.isclose(r["variance"], var_v, rtol=1e-12)
        expect = (_MDE_Z_ALPHA + _MDE_Z_BETA) * np.sqrt(2.0 * var_v / (n / 2.0))
        assert np.isclose(r["mde_abs"], expect, rtol=1e-12)
        assert r["mde_abs"] > 0.0

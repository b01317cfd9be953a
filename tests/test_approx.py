"""Approximate aggregates: sketch-based results cannot hash-match an exact
oracle, so they are bounded against exact answers here instead of in the
registry."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_challange_spark.sources.catalog import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select(F.countDistinct("user_id").alias("n")).collect()[0]["n"]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.05).alias("n")
    ).collect()[0]["n"]
    assert abs(approx - exact) <= max(3.0, 0.15 * exact)


def test_approx_percentile_brackets_median(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    [lo, mid, hi] = ev.select(
        F.percentile_approx("value", [0.25, 0.5, 0.75], 1000).alias("p")
    ).collect()[0]["p"]
    assert lo <= mid <= hi
    vmin, vmax = ev.select(F.min("value"), F.max("value")).collect()[0]
    assert vmin <= lo and hi <= vmax


def test_kll_rank_error_within_emitted_bound(spark, sf_dir):
    """The KLL-class sketch's estimated quantile values must land within
    the rank-error bound the query itself emits (sum of per-shard
    strides): for each q, the true rank of est_value_fp differs from the
    target rank by at most rank_err_bound. Also pins the register table
    staying register-sized (<= shards * (64 + 1) rows)."""
    import bisect

    import __spark_entry__ as em

    rows = em.all_queries()["kll_value_quantiles"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    exact = sorted(
        r.v
        for r in ev.select(
            F.floor(F.col("value") * 10000 + F.lit(0.5))
            .cast("long")
            .alias("v")
        ).collect()
    )
    n = len(exact)
    for r in rows:
        assert r.n_rows == n
        assert r.sketch_rows <= 8 * 65
        target = (r.q_pct * n + 99) // 100
        # true rank range of the estimated value in the sorted data
        lo = bisect.bisect_left(exact, r.est_value_fp) + 1
        hi = bisect.bisect_right(exact, r.est_value_fp)
        err = 0 if lo <= target <= hi else min(abs(lo - target), abs(hi - target))
        assert err <= r.rank_err_bound, (r.q_pct, err, r.rank_err_bound)


def test_kll_merge_is_register_union(spark, sf_dir):
    """Mergeability proof: the register table built from ONLY one shard's
    rows equals the full build's registers for that shard, row for row —
    so merging independently-built shard sketches is plain UNION, no
    recompaction (the content-keyed shard assignment makes each shard's
    compaction independent of every other shard's data)."""
    from pyspark.sql import functions as SF

    from apache_beam_challange_spark.plans.advanced import kll_register_table

    ev = load_table(spark, sf_dir, "events")

    def hex4(prefix, col):
        return SF.conv(
            SF.substring(
                SF.md5(SF.concat(SF.lit(prefix), col.cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")

    shard0_events = ev.filter(hex4("s#", F.col("event_id")) % 8 == 0)
    solo = sorted(
        (r.shard, r.v, r.rk0, r.w)
        for r in kll_register_table(shard0_events).collect()
    )
    full = sorted(
        (r.shard, r.v, r.rk0, r.w)
        for r in kll_register_table(ev).filter(F.col("shard") == 0).collect()
    )
    assert solo == full and len(solo) > 0


def test_mergeable_topk_bounds_bracket_exact_counts(spark, sf_dir):
    """The deterministic heavy-hitter guarantee: for every reported user,
    est_lo <= exact count <= est_hi, and a user present in all shards
    is EXACT (lo == hi == truth) — the mergeable-summary analogue of
    the KLL rank-error-bound test."""
    from apache_beam_challange_spark.plans.advanced import (
        _HH_SHARDS,
        mergeable_topk_user_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = mergeable_topk_user_counts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        t = exact[r["user_id"]]
        assert r["est_lo"] <= t <= r["est_hi"], (r, t)
        if r["n_shards_present"] == _HH_SHARDS:
            assert r["est_lo"] == t == r["est_hi"]


def test_semdedup_prune_is_selective_and_keeps_rank1(spark, sf_dir):
    """SemDeDup invariants: every cluster keeps at least its rank-1
    member (the closest-to-centroid item can never be pruned by an
    earlier one), pruning is selective (neither 0% nor 100% overall at
    tau=0.35 on this corpus), and the cluster sizes partition the
    corpus."""
    from apache_beam_challange_spark.plans.filtering import semdedup_cluster_prune

    rows = semdedup_cluster_prune(spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_items"] for r in rows) == n_vecs
    for r in rows:
        assert r["n_pruned"] < r["n_items"]
    assert sum(r["n_pruned"] for r in rows) > 0


def test_semdedup_linearity_knob_keeps_invariants(spark, sf_dir):
    """The parametrized core with a LARGER k (the production linearity
    knob — k grows with the corpus) must preserve the partition and
    rank-1-kept invariants: sizes partition the corpus and no cluster is
    fully pruned. Proves the knob measured in PERF.md (k=32 at the 10x
    point) is the same plan, not a separate code path."""
    from apache_beam_challange_spark.plans.filtering import semdedup_prune

    emb = load_table(spark, sf_dir, "embeddings")
    rows = semdedup_prune(emb, k=8, n_iter=2).collect()
    assert sum(r["n_items"] for r in rows) == emb.count()
    for r in rows:
        assert r["n_pruned"] < r["n_items"]


def test_kll_oversized_shard_fails_loudly(spark, sf_dir, monkeypatch):
    """A shard whose row count exceeds K * max(power) must RAISE, not
    silently vanish from the sketch (ADVICE r7: the old inner join
    dropped such shards, biasing every quantile with no error). Shrink
    the power spine so sf0.001's shards overflow it and assert the
    data-path error fires with the operator dial named."""
    import pytest

    from apache_beam_challange_spark.plans import advanced

    monkeypatch.setattr(advanced, "_KLL_POWERS", [(0, 1)])
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(Exception, match="raise _KLL_SHARDS"):
        advanced.kll_register_table(ev).collect()

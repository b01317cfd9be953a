"""Curation-plan additions (plans/curation.py) not covered by the older
per-family suites."""

from __future__ import annotations

import __spark_entry__ as entrymod

QS = entrymod.all_queries()


# --- lang_mixing_allocation ---------------------------------------------------


def test_mixing_allocation_sums_to_budget_and_smooths(spark, sf_dir):
    """Largest-remainder invariants: integer allocs sum EXACTLY to the
    budget, every alloc is within 1 of its real-valued share, and
    alpha-smoothing holds — the dominant language's allocated share is
    strictly below its raw char-mass share, every minority language's
    strictly above."""
    from apache_beam_challange_spark.plans.curation import _MIX_BUDGET

    rows = QS["lang_mixing_allocation"](spark, sf_dir).collect()
    assert sum(r.alloc for r in rows) == _MIX_BUDGET
    tot_w = sum(r.weight_micro for r in rows)
    tot_chars = sum(r.chars for r in rows)
    for r in rows:
        exact = _MIX_BUDGET * r.weight_micro / tot_w
        assert exact - 1 < r.alloc < exact + 1
    top = max(rows, key=lambda r: r.chars)
    for r in rows:
        raw_share = r.chars / tot_chars
        alloc_share = r.alloc / _MIX_BUDGET
        if r.lang == top.lang:
            assert alloc_share < raw_share
        else:
            assert alloc_share > raw_share


def test_gini_matches_numpy_replay(spark, sf_dir):
    """Exact-rank Gini replayed in Python ints (no float until the final
    division) for every nation scope and the global scope."""
    import numpy as np
    import pyarrow.parquet as pq

    from apache_beam_challange_spark.plans.curation import (
        gini_revenue_inequality,
    )

    cust = pq.read_table(
        sf_dir + "/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        sf_dir + "/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    orders = pq.read_table(
        sf_dir + "/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pandas()
    orders["c"] = np.floor(
        orders["o_totalprice"].to_numpy() * 100 + 0.5
    ).astype(np.int64)
    rev = (
        cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .merge(
            orders.groupby("o_custkey")["c"].sum().rename("rev"),
            left_on="c_custkey",
            right_index=True,
            how="left",
        )
        .fillna({"rev": 0})
    )
    rev["rev"] = rev["rev"].astype(np.int64)

    def gini(sub):
        s = sub.sort_values(["rev", "c_custkey"]).reset_index(drop=True)
        n = len(s)
        x = [int(v) for v in s["rev"]]
        s1 = sum((i + 1) * xi for i, xi in enumerate(x))  # exact ints
        s0 = sum(x)
        return float(2 * s1 - (n + 1) * s0) / float(n * s0)

    rows = {r["scope"]: r for r in gini_revenue_inequality(spark, sf_dir).collect()}
    assert set(rows) == set(rev["n_name"]) | {"ALL"}
    for scope, r in rows.items():
        sub = rev if scope == "ALL" else rev[rev["n_name"] == scope]
        assert r["n_customers"] == len(sub)
        assert r["total_c"] == int(sub["rev"].sum())
        assert np.isclose(r["gini"], gini(sub), rtol=1e-12)
        assert 0.0 <= r["gini"] < 1.0


def test_fellegi_sunter_scores_are_exact_log_odds(spark, sf_dir):
    """Every returned score must equal the sum of the pinned per-field
    log-odds for its agreement pattern (recomputed in Python), matches
    flagged by the threshold, candidates block-bounded."""
    from apache_beam_challange_spark.plans.curation import (
        _FS_THRESHOLD,
        _FS_W,
        fellegi_sunter_part_links,
    )

    rows = fellegi_sunter_part_links(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    part = {
        r["p_partkey"]: r
        for r in spark.read.parquet(f"{sf_dir}/part.parquet").collect()
    }
    for r in rows:
        a, b = part[r["part_a"]], part[r["part_b"]]
        ag = {
            "brand": a["p_brand"] == b["p_brand"],
            "type": a["p_type"] == b["p_type"],
            "size": abs(a["p_size"] - b["p_size"]) <= 2,
        }
        # name agreement: recompute Levenshtein in pure Python
        na, nb = a["p_name"], b["p_name"]
        prev = list(range(len(nb) + 1))
        for i, ca in enumerate(na, 1):
            cur = [i]
            for j, cb in enumerate(nb, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        ag["name"] = prev[-1] <= 3
        score = 0.0
        for f in ("brand", "type", "size", "name"):
            score = score + (_FS_W[f][0] if ag[f] else _FS_W[f][1])
        assert r["fs_score"] == score  # bit-identical: literal sums only
        assert r["n_agree"] == sum(ag.values())
        assert r["is_match"] == (r["fs_score"] >= _FS_THRESHOLD)
        # same-block guarantee
        assert na.rsplit(" ", 1)[-1] == nb.rsplit(" ", 1)[-1]


def test_vocab_js_terms_match_numpy(spark, sf_dir):
    """Replay every JS term in numpy from raw token counts; the folded
    total must be a valid JS divergence (0 <= JS <= ln 2) and the spine
    must conserve both distributions' mass."""
    import collections

    import numpy as np
    import pyarrow.parquet as pq

    from apache_beam_challange_spark.plans.curation import (
        _VJS_K,
        _VJS_SRC,
        vocab_js_drift_src0,
    )

    t = pq.read_table(
        sf_dir + "/documents.parquet", columns=["text", "source"]
    ).to_pandas()
    ca: collections.Counter = collections.Counter()
    cb: collections.Counter = collections.Counter()
    for txt, src in zip(t["text"], t["source"]):
        (cb if src == _VJS_SRC else ca).update(txt.split(" "))
    ta = sum(ca.values())
    tb = sum(cb.values())
    allc = ca + cb
    top = sorted(allc, key=lambda k: (-allc[k], k))[:_VJS_K]
    rows = vocab_js_drift_src0(spark, sf_dir).collect()
    assert len(rows) == min(_VJS_K, len(allc)) + 1
    assert sum(r["n_base"] for r in rows) == ta
    assert sum(r["n_curr"] for r in rows) == tb
    total = 0.0
    for r in rows:
        if r["token"] == "<OOV>":
            na = ta - sum(ca[k] for k in top)
            nb = tb - sum(cb[k] for k in top)
        else:
            assert r["token"] in top
            na, nb = ca[r["token"]], cb[r["token"]]
        assert (r["n_base"], r["n_curr"]) == (na, nb)
        pa, pb = na / ta, nb / tb
        m = 0.5 * (pa + pb)
        term = 0.5 * (pa * np.log(pa / m) if na else 0.0) + 0.5 * (
            pb * np.log(pb / m) if nb else 0.0
        )
        assert np.isclose(r["js_term"], term, rtol=1e-12, atol=1e-300)
        total += r["js_term"]
    assert -1e-12 <= total <= np.log(2.0) + 1e-12


def test_multitouch_credit_is_exactly_conserved(spark, sf_dir):
    """Total credit across channels must equal purchases x 1e6 EXACTLY
    (the integer-apportionment guarantee), shares must sum to 1, and
    the binned join must be equi-shaped (no NLJ/cartesian)."""
    from apache_beam_challange_spark.plans.curation import (
        _MTA_MICRO,
        multitouch_attribution,
    )

    df = multitouch_attribution(spark, sf_dir)
    rows = df.collect()
    n_purch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("event_type = 'purchase'")
        .count()
    )
    assert sum(r["credit_millionths"] for r in rows) == n_purch * _MTA_MICRO
    assert abs(sum(r["credit_share"] for r in rows) - 1.0) < 1e-9
    p = df._jdf.queryExecution().executedPlan().toString()
    # the touch-purchase match must be an equi join on (user, hour
    # bucket); the only NLJ allowed is the 1-row total-scalar attach
    assert "CartesianProduct" not in p
    assert "hb" in p and ("BroadcastHashJoin" in p or "SortMergeJoin" in p)


def test_ltv_curve_conserves_revenue_and_is_monotone(spark, sf_dir):
    """Total curve revenue must equal all purchase cents; cumulative is
    non-decreasing within each cohort; LTV = cum / cohort size."""
    import numpy as np
    import pyarrow.parquet as pq

    from apache_beam_challange_spark.plans.curation import cohort_ltv_curve

    t = pq.read_table(
        sf_dir + "/events.parquet", columns=["user_id", "ts", "event_type", "value"]
    ).to_pandas()
    total_cents = int(
        np.floor(
            t.loc[t["event_type"] == "purchase", "value"].to_numpy() * 100 + 0.5
        )
        .astype(np.int64)
        .sum()
    )
    rows = cohort_ltv_curve(spark, sf_dir).collect()
    assert sum(r["revenue_c"] for r in rows) == total_cents
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    n_users = t["user_id"].nunique()
    assert sum({r["cohort_week"]: r["cohort_users"] for r in rows}.values()) <= n_users
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_week"])
        cum = 0
        for r in rs:
            cum += r["revenue_c"]
            assert r["cum_revenue_c"] == cum
            assert np.isclose(
                r["ltv_per_user"], cum / r["cohort_users"] / 100.0, rtol=1e-12
            )


def test_growth_accounting_identities(spark, sf_dir):
    """The decomposition identities must hold exactly: WAU = new +
    retained + resurrected, and churned_w = WAU_{w-1} - retained_w
    (every previously-active user either retains or churns)."""
    from apache_beam_challange_spark.plans.curation import (
        growth_accounting_wau,
    )

    rows = sorted(
        growth_accounting_wau(spark, sf_dir).collect(),
        key=lambda r: r["week"],
    )
    assert rows and rows[0]["new_users"] == rows[0]["wau"]
    prev = None
    for r in rows:
        assert r["wau"] == r["new_users"] + r["retained"] + r["resurrected"]
        if prev is not None and r["week"] == prev["week"] + 1:
            assert r["churned"] == prev["wau"] - r["retained"]
        prev = r

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

"""Round-6 wave 7: TPC-H Q3/Q10 adaptations and the exact rolling
median. Oracle gate pins values; these tests pin a Python reference for
the rolling median and the plan shapes the star joins depend on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QS = entrymod.all_queries()


def test_rolling_median_matches_python_reference(spark, sf_dir):
    got = {
        r.event_id: r.rolling_median
        for r in QS["rolling_median_value"](spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    seqs: dict[int, list] = {}
    for e in ev:
        seqs.setdefault(e.user_id, []).append((e.ts, e.event_id, e.value))
    expect = {}
    for evs in seqs.values():
        evs.sort()
        for i in range(len(evs)):
            win = sorted(v for _, _, v in evs[max(0, i - 9) : i + 1])
            n = len(win)
            med = (win[(n + 1) // 2 - 1] + win[n // 2]) / 2.0
            expect[evs[i][1]] = round(med, 6)
    assert len(got) == len(expect)
    for eid, m in got.items():
        assert m == pytest.approx(expect[eid], abs=2e-6)


def test_q3_revenue_descends_and_respects_cutoff(spark, sf_dir):
    rows = QS["tpch_q3_shipping_priority"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    import datetime

    for r in rows:
        assert r.o_orderdate < datetime.datetime(1998, 6, 1)


def test_q10_rows_are_returned_revenue(spark, sf_dir):
    rows = QS["tpch_q10_returned_items"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 20
    assert all(r.revenue > 0 for r in rows)
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)




def test_q3_predicates_reach_scans(plans):
    """Both date predicates and the segment filter must push into their
    parquet scans; the top-10 must be TakeOrderedAndProject."""
    p = plans("tpch_q3_shipping_priority")
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert any("o_orderdate" in l and "DataFilters: [" in l for l in scans)
    assert any("l_shipdate" in l and "DataFilters: [" in l for l in scans)
    assert any("c_mktsegment" in l and "DataFilters: [" in l for l in scans)
    assert "TakeOrderedAndProject" in p


def test_q10_nation_broadcasts(plans):
    p = plans("tpch_q10_returned_items")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert any("l_returnflag" in l and "DataFilters: [" in l for l in scans)


def test_rolling_median_single_window_shuffle(plans):
    p = plans("rolling_median_value")
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1


# --- attribution_delay_quantiles / weekly_revenue_wow (wave 10) --------------


def test_delay_quantiles_match_python_reference(spark, sf_dir):
    r = QS["attribution_delay_quantiles"](spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    clicks = [(e.user_id, e.ts) for e in ev if e.event_type == "click"]
    purchases = [(e.user_id, e.ts) for e in ev if e.event_type == "purchase"]
    import datetime
    import math

    # the engine computes floor(epoch(p)) - floor(epoch(c)) (timestamp ->
    # long truncates each side), which differs from truncating the
    # DIFFERENCE when sub-second parts straddle a boundary
    def fsec(ts):
        return math.floor(ts.replace(tzinfo=datetime.timezone.utc).timestamp())

    delays = sorted(
        fsec(pts) - fsec(cts)
        for cu, cts in clicks
        for pu, pts in purchases
        if cu == pu and cts <= pts < cts + datetime.timedelta(minutes=30)
    )
    n = len(delays)
    assert r.n_pairs == n

    def q(num, den):
        return delays[(num * n + den - 1) // den - 1]

    assert (r.p25_sec, r.p50_sec, r.p75_sec, r.p90_sec) == (
        q(1, 4),
        q(1, 2),
        q(3, 4),
        q(9, 10),
    )
    assert r.p25_sec <= r.p50_sec <= r.p75_sec <= r.p90_sec


def test_weekly_wow_window_input_bounded_600_weeks(spark, sf_dir):
    """The LAG/moving-average window runs over the post-aggregation
    weekly table whose cardinality is CALENDAR WEEKS, not fact rows —
    provably bounded (≤600 ≈ 11.5 years; TPC-H orderdates span 7), so
    the single-partition WindowExec shape is safe at any fact-table
    scale. If this fires, the window input grew with the data and the
    plan needs a partitioned window instead."""
    assert QS["weekly_revenue_wow"](spark, sf_dir).count() <= 600


def test_wow_change_consistent_with_revenue(spark, sf_dir):
    rows = QS["weekly_revenue_wow"](spark, sf_dir).collect()
    assert rows[0].wow_change is None
    for prev, cur in zip(rows, rows[1:]):
        if prev.revenue > 0:
            assert cur.wow_change == pytest.approx(
                round((cur.revenue - prev.revenue) / prev.revenue, 6), abs=2e-6
            )
    # the 4-week average over the first 4 rows is the plain mean
    import statistics

    for i, r in enumerate(rows[:8]):
        window = [x.revenue for x in rows[max(0, i - 3) : i + 1]]
        assert r.revenue_4wk_avg == pytest.approx(
            round(statistics.mean(window), 4), abs=2e-4
        )


# --- global_row_ids_orders ----------------------------------------------------


def test_global_row_ids_are_the_sort_permutation(spark, sf_dir):
    """ids are exactly 1..n and agree with the (o_totalprice,
    o_orderkey) sort order recomputed driver-side."""
    import __spark_entry__ as entrymod

    got = {
        r.o_orderkey: r.global_id
        for r in entrymod.all_queries()["global_row_ids_orders"](
            spark, sf_dir
        ).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    want = {
        row.o_orderkey: i + 1
        for i, row in enumerate(
            sorted(o, key=lambda r: (r.o_totalprice, r.o_orderkey))
        )
    }
    assert got == want

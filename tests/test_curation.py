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

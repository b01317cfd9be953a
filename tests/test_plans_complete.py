"""PLANS.md completeness (VERDICT r11 #2): three rounds running (r9 #4,
r10 #5, r11 #2) a late-added driver-tier query silently missed the
PLANS.md regeneration. This test makes the gap class impossible — every
DRIVER_ORDER name must have a `## <name>` section in PLANS.md or an
explicit, reasoned entry in tools/dump_plans.PLAN_EXCLUDED."""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _plan_sections() -> set[str]:
    with open(os.path.join(REPO, "PLANS.md")) as f:
        return {m.group(1) for m in re.finditer(r"^## (\S+)", f.read(), re.M)}


def test_every_driver_tier_query_has_a_plan_section():
    from apache_beam_challange_spark.plans.registry import DRIVER_ORDER

    import dump_plans

    sections = _plan_sections()
    missing = [
        name
        for name in DRIVER_ORDER
        if name not in sections and name not in dump_plans.PLAN_EXCLUDED
    ]
    assert not missing, (
        f"driver-tier queries missing from PLANS.md: {missing} — run "
        "`python tools/dump_plans.py` (add the names to FLAGSHIPS first) "
        "or record a reason in dump_plans.PLAN_EXCLUDED"
    )


def test_flagship_roster_matches_plans_md():
    """The generated file and the generator roster agree exactly — a
    FLAGSHIPS edit without a regen (the r11 gap) fails here."""
    import dump_plans

    sections = _plan_sections()
    stale = [n for n in dump_plans.FLAGSHIPS if n not in sections]
    assert not stale, (
        f"FLAGSHIPS entries with no PLANS.md section (regen needed): {stale}"
    )


def test_exclusions_are_real_and_reasoned():
    """Every exclusion names a registered query and carries a reason —
    the list can't silently absorb typos or turn into a dumping ground."""
    from apache_beam_challange_spark.plans import registry

    import dump_plans

    registry.load_all()
    for name, reason in dump_plans.PLAN_EXCLUDED.items():
        assert name in registry.QUERIES, f"excluded unknown query {name}"
        assert len(reason) > 20, f"exclusion for {name} needs a real reason"

"""Data-quality rule expressions shared by the batch quarantine
accounting query (``plans/curation.py:quarantine_rule_counts``) and the
streaming dead-letter router (``streaming/maintenance.py:
route_quality_stream``) — one definition, two execution modes, so batch
counts and streamed routing can never disagree on what "invalid" means.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rule name -> violation predicate over the events schema. The gate
#: FAILS CLOSED on unparseable input: a NULL from the JSON extractor is
#: falsy in the value rules, so ``props_malformed`` exists to flag the
#: row explicitly (malformed or NULL props quarantines; a VALID object
#: merely missing the optional key does not — absence is data, garbage
#: is not). Earlier revisions claimed fail-closed while the extractor's
#: NULL silently routed malformed rows as clean (found by review).
QUALITY_RULES: dict[str, Callable[[], Column]] = {
    "value_above_400": lambda: F.col("value") > 400,
    "error_type": lambda: F.col("event_type") == "error",
    "props_k_above_80": lambda: (
        F.get_json_object(F.col("props"), "$.k").cast("int") > 80
    ),
    "props_malformed": lambda: F.try_parse_json(F.col("props")).isNull(),
}


def violated_rules(df: DataFrame) -> DataFrame:
    """``df`` plus a ``__rules`` array column naming every violated rule
    (empty array = clean row). Pure projection — no shuffle."""
    tags = F.array_compact(
        F.array(
            *[
                F.when(pred(), F.lit(name))
                for name, pred in QUALITY_RULES.items()
            ]
        )
    )
    return df.withColumn("__rules", tags)

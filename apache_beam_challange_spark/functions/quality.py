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

#: rule name -> violation predicate over the events schema. A malformed
#: ``props`` JSON yields NULL from the extractor, and NULL comparisons are
#: falsy, so rules fail closed (the row is NOT flagged by a rule whose
#: input is unparseable — the range/domain rules still apply).
QUALITY_RULES: dict[str, Callable[[], Column]] = {
    "value_above_400": lambda: F.col("value") > 400,
    "error_type": lambda: F.col("event_type") == "error",
    "props_k_above_80": lambda: (
        F.get_json_object(F.col("props"), "$.k").cast("int") > 80
    ),
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

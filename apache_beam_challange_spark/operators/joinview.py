"""Incremental materialized JOIN-view maintenance: advance an enriched
fact table (fact ⋈ broadcast dim) by joining ONLY newly-appended fact
rows — the denormalize-at-ingest pattern every warehouse runs next to
its rollups.

Why incremental matters at 100 TB: a full view rebuild re-joins the
entire fact history every refresh; the incremental path joins only rows
past the append watermark (the view's own MAX(key) — a single-scalar
read of the published layer, restart-safe, no side state), against the
broadcast dim. With the fact partitioned on ingest key, partition
pruning turns the refresh into the new chunks only.

Semantics contract (documented, test-asserted):

- **Fact side**: append-only with a monotonically increasing key (the
  event-log / CDC-outbox contract). Out-of-order backfills below the
  watermark are not re-joined — the same strictly-greater-than filter
  discipline as :mod:`.rollup`, whose ``lookback_hours`` shows the
  bounded-repair variant.
- **Dim side**: joined AT APPEND TIME. A dim change between refreshes
  affects NEW fact rows only; history keeps the attributes that were
  current when it was enriched (exactly what "enrich at ingest" means —
  point-in-time-correct history is the SCD-2 operator's job,
  ``plans/curation.py:scd2_event_type_history``, which this view
  deliberately does not duplicate).
- **Erasure composition**: the view is DERIVED data — a compliance
  delete (``sources/publish.py:delete_published_keys``) must erase the
  upstream facts too, or the watermark mechanics can resurrect erased
  rows: deleting the view rows that held MAX(o_orderkey) regresses the
  watermark, and the next refresh re-joins those keys from the
  still-present facts. Erase upstream first, then the view; a fully
  emptied view raises on refresh rather than silently stalling (its
  watermark is undefined).

Idempotency & crash model: each refresh publishes ``current UNION
delta`` through :mod:`..sources.publish` (version dir first, atomic
``_CURRENT`` flip last), so a crash leaves the previous complete view
readable and a retry re-folds from it. Re-running after success
publishes nothing (watermark already at MAX — the idempotent no-op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: dim columns carried onto the fact (the denormalized serving schema)
_DIM_COLS = ("c_mktsegment", "c_nationkey")


def enrich_orders(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """The view definition: orders joined to its customer dim attributes
    (broadcast — the dim is small by definition of this pattern). Kept as
    ONE function so the incremental refresh and any full rebuild are the
    same plan applied to different fact slices (append == rebuild is
    test-asserted, not hoped)."""
    dim = customer.select("c_custkey", *_DIM_COLS)
    return orders.join(
        F.broadcast(dim), orders.o_custkey == dim.c_custkey
    ).drop("c_custkey")


def refresh_enriched_orders(
    orders: DataFrame, customer: DataFrame, view_path: str
) -> int:
    """Advance the enriched-orders view published under ``view_path`` to
    cover every fact row (watermark = the view's MAX(o_orderkey), one
    scalar read). Returns the number of newly enriched rows folded in
    (0 = already current, nothing published)."""
    from apache_beam_challange_spark.sources.publish import (
        publish,
        read_published,
    )

    spark = orders.sparkSession
    current = read_published(spark, view_path)
    if current is not None:
        wm = current.agg(F.max("o_orderkey").alias("wm")).collect()[0]["wm"]
        if wm is None:
            # a published-but-empty view (e.g. a compliance delete erased
            # every row) has NO watermark: refreshing from None would
            # silently re-enrich nothing forever. Loud, not stalled —
            # found by review. Rebuild from the (erased-upstream!) facts.
            raise RuntimeError(
                f"enriched view at {view_path} is published but empty — "
                "its append watermark is undefined; erase the upstream "
                "facts and rebuild the view instead of refreshing"
            )
        fresh = orders.filter(F.col("o_orderkey") > F.lit(wm))
    else:
        fresh = orders
    delta = enrich_orders(fresh, customer)
    # localCheckpoint: count + publish must see one consistent delta
    delta = delta.localCheckpoint()
    n = delta.count()
    if n:
        merged = delta if current is None else current.unionByName(delta)
        publish(merged, view_path)
    return n

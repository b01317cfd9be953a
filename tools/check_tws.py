"""Loud environment-gap report for the transformWithStateInPandas (TWS)
seam (VERDICT r6 #8).

The engine ships two TWS operators (`streaming/stateful.py`:
``user_session_stats_tws``, ``running_key_counts_tws``) whose
equality-with-batch contract is protobuf-gated: the TWS Python worker
speaks protobuf to the JVM state server, and this container has no
usable ``google.protobuf``, so the pytest twins skip silently. This
script makes that gap VISIBLE in every round's record instead of only
in a docstring:

- environment unusable  -> prints the exact missing piece, exits 3
  (loud, distinguishable from a test failure);
- environment usable    -> runs the real equality check
  (user_session_stats_tws over a two-batch file stream vs the batch
  GROUP BY) and exits 0 on match / 1 on mismatch.

Run: ``python tools/check_tws.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def probe_environment() -> str | None:
    """Return None if TWS can run here, else the human-readable reason.

    Round 11: the probe now activates the App Engine protobuf shim
    (``streaming/tws_env.ensure_protobuf``) before giving up — a
    pure-python protobuf 6.32 ships inside the preinstalled Google Cloud
    SDK, which un-blocks the seam in this container."""
    from apache_beam_challange_spark.streaming.tws_env import ensure_protobuf

    reason = ensure_protobuf()
    if reason is not None:  # pragma: no cover - env-specific
        return (
            reason + " The operators ship UNVERIFIED here; their shared "
            "_fold_session_batches accumulator IS covered via the "
            "applyInPandasWithState twin."
        )
    return None


def run_equality_check() -> int:
    """The protobuf-gated contract, for real: TWS session stats after an
    availableNow run must equal the batch GROUP BY."""
    import tempfile

    from pyspark.sql import functions as F

    from apache_beam_challange_spark.session import get_spark
    from apache_beam_challange_spark.sources.catalog import load_table
    from apache_beam_challange_spark.streaming.stateful import (
        user_session_stats_tws,
    )

    spark = get_spark("check_tws")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    # Reuse the catalog loader so the check feeds TWS the EXACT timestamps
    # the engine serves (integer `ts div 1000` nano->micro conversion) —
    # ADVICE r7: the old double true-division here could differ by +-1 us
    # above 2^53.
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value"
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        ev.repartition(2).write.parquet(src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            user_session_stats_tws(stream)
            .writeStream.format("memory")
            .queryName("tws_check")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(300)
        if not finished:
            # A timed-out run left the memory table partially populated;
            # comparing it would report a FAKE correctness mismatch.
            # Report the environment condition loudly instead (exit 3,
            # like the missing-protobuf gap).
            q.stop()
            print(
                "TWS ENVIRONMENT GAP: availableNow run did not finish "
                "within 300 s — equality NOT checked (not a mismatch). "
                "Re-run on a faster host or smaller SPARK_GRAFT_SF_DIR."
            )
            sys.exit(3)
        # The memory sink holds one update-mode row per user per batch
        # with NO ordering guarantee across batches (ADVICE r7: relying
        # on insertion order could crown a stale batch-0 row and report a
        # spurious mismatch). The winner is made explicit instead:
        # n_events is monotone non-decreasing across a user's updates, so
        # the final state is the row with max n_events per user.
        got = {}
        for r in spark.sql("SELECT * FROM tws_check").collect():
            cur = got.get(r.user_id)
            if cur is None or r.n_events > cur[0]:
                got[r.user_id] = (r.n_events, r.n_types, r.value_micros)
    want = {
        r.user_id: (r.n_events, r.n_types, r.value_micros)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").cast("int").alias("n_types"),
            F.sum(F.floor(F.col("value") * 1e6).cast("long"))
            .cast("long")
            .alias("value_micros"),
        )
        .collect()
    }
    if got == want:
        print(f"TWS equality check PASSED over {len(want)} users")
        return 0
    diff = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
    print(f"TWS equality check FAILED for {len(diff)} users: {sorted(diff)[:10]}")
    return 1


def main() -> int:
    reason = probe_environment()
    if reason is not None:
        print("TWS ENVIRONMENT GAP (operators ship unverified this round):")
        print(f"  {reason}")
        return 3
    return run_equality_check()


if __name__ == "__main__":
    sys.exit(main())

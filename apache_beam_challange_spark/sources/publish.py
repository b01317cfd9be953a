"""Atomic snapshot publication over plain parquet (no Delta/Iceberg in
the container): versioned directories plus a ``_CURRENT`` pointer file,
flipped with ``os.replace`` (atomic on POSIX).

Layout under a published base path::

    base/
      v_00000001/          complete parquet dir (_SUCCESS committed last)
      v_00000002/
      _CURRENT             text file naming the live version ("v_00000002")

Commit order: (1) write the new version dir fully — Spark commits its
``_SUCCESS`` marker last; (2) write the pointer to a temp file and
``os.replace`` it over ``_CURRENT``. A crash anywhere before step 2
leaves ``_CURRENT`` on the previous complete version, so a concurrent
reader NEVER observes partial state — the same commit-ordering
discipline as :func:`~apache_beam_challange_spark.operators.clustering.
pq_write_index`. Retrying a crashed publish re-derives the same next
version number and ``mode("overwrite")`` clears the torn dir before the
pointer ever references it.

On a transactional table format this whole module collapses into the
table's own commit protocol; the seam is kept explicit rather than
pretending parquet gives transactions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"
_KEEP_VERSIONS = 2  # live + one predecessor for in-flight readers

# module-level seam so crash-injection tests can fail the flip without
# patching the global os module
_pointer_flip = os.replace


def current_version_path(base: str) -> str | None:
    """Path of the live version dir under ``base``, or ``None`` when
    nothing has been published. Raises — loudly, per the crash model —
    if the pointer references a dir without ``_SUCCESS``: that cannot
    happen under the commit order above, so it means outside interference
    and the caller must not launder it into a merge."""
    ptr = os.path.join(base, _POINTER)
    if not os.path.isfile(ptr):
        # Unpublished is only a valid state for an empty/new base or one
        # holding orphaned version dirs from a crashed FIRST publish.
        # Anything else under base (e.g. a pre-versioning plain parquet
        # snapshot) must not be silently ignored — restarting from
        # scratch over live data would masquerade as a fresh table.
        if os.path.isdir(base):
            foreign = [
                e
                for e in os.listdir(base)
                if not e.startswith(("v_", _POINTER))
            ]
            if foreign:
                raise RuntimeError(
                    f"{base} holds non-versioned content {foreign[:3]} — "
                    "refusing to treat an unversioned layout as empty; "
                    "migrate it by publishing it as a version first"
                )
        return None
    with open(ptr, encoding="utf-8") as fh:
        name = fh.read().strip()
    vdir = os.path.join(base, name)
    if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
        raise RuntimeError(
            f"published pointer {ptr} references {name!r} which has no "
            "_SUCCESS marker — refusing to read a torn snapshot"
        )
    return vdir


def _current_version_num(base: str) -> int | None:
    """Version number the pointer names, or None before the first flip."""
    vdir = current_version_path(base)
    return None if vdir is None else int(os.path.basename(vdir).split("_")[1])


def published_versions(base: str) -> list[int]:
    """Version numbers currently retained under ``base`` (complete dirs
    only, AND at-or-below the live pointer), ascending — the
    snapshot-history window a reader can time-travel within (GC keeps the
    live version plus one predecessor). A fully-written dir ABOVE the
    pointer is a publish that crashed before its flip: it was never live,
    its retrying writer will overwrite it in place, and it must not be
    listed as readable (found by review)."""
    cur = _current_version_num(base)
    if cur is None:
        return []
    out = []
    for entry in os.listdir(base):
        if entry.startswith("v_") and os.path.exists(
            os.path.join(base, entry, "_SUCCESS")
        ):
            try:
                n = int(entry.split("_")[1])
            except (IndexError, ValueError):
                continue
            if n <= cur:
                out.append(n)
    return sorted(out)


def read_published(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame | None:
    """The live published DataFrame, or ``None`` before the first publish.

    ``version`` time-travels to a retained historical snapshot (the
    versioned layout gives the last ``_KEEP_VERSIONS`` publishes for
    free — the same read-old-snapshot contract a table format sells);
    asking for a pruned or never-published version raises rather than
    silently serving the wrong data."""
    if version is not None:
        vdir = os.path.join(base, f"v_{version:08d}")
        cur = _current_version_num(base)
        # the second clause rejects a complete-but-never-flipped dir: that
        # version never became live and its writer may be mid-overwrite
        if not os.path.exists(os.path.join(vdir, "_SUCCESS")) or (
            cur is None or version > cur
        ):
            raise ValueError(
                f"version {version} is not retained under {base} "
                "(pruned, or never published — a complete dir above the "
                f"pointer was never live; available: {published_versions(base)})"
            )
        return spark.read.parquet(vdir)
    vdir = current_version_path(base)
    return None if vdir is None else spark.read.parquet(vdir)


def publish(df: DataFrame, base: str) -> str:
    """Write ``df`` as the next version under ``base`` and atomically flip
    ``_CURRENT`` to it. Returns the new version dir. Single-writer by
    contract (streaming checkpoint / refresh driver); readers need no
    coordination."""
    cur = current_version_path(base)
    nxt = 1 if cur is None else int(os.path.basename(cur).split("_")[1]) + 1
    name = f"v_{nxt:08d}"
    vdir = os.path.join(base, name)
    # overwrite: a retry of a crashed publish clears its own torn dir
    df.write.mode("overwrite").parquet(vdir)
    tmp = os.path.join(base, f"{_POINTER}.tmp.{os.getpid()}")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(name)
        fh.flush()
        os.fsync(fh.fileno())
    _pointer_flip(tmp, os.path.join(base, _POINTER))
    _prune(base, keep_from=nxt - _KEEP_VERSIONS + 1)
    return vdir


def _prune(base: str, keep_from: int) -> None:
    """Best-effort GC of versions older than ``keep_from`` (the live
    version and one predecessor stay, so a reader that resolved the old
    pointer just before the flip can finish its scan)."""
    import shutil

    for entry in os.listdir(base):
        if not entry.startswith("v_"):
            continue
        try:
            n = int(entry.split("_")[1])
        except (IndexError, ValueError):
            continue
        if n < keep_from:
            shutil.rmtree(os.path.join(base, entry), ignore_errors=True)


def delete_published_keys(
    spark: SparkSession,
    base: str,
    key_col: str,
    keys,
    purge_history: bool = True,
) -> int:
    """Compliance (right-to-be-forgotten) delete: republish the live
    version under ``base`` WITHOUT the rows whose ``key_col`` is in
    ``keys`` (a python sequence for a request batch, or a DataFrame of
    keys for bulk erasure — the DataFrame route is a broadcast anti-join,
    so the table never shuffles). Returns the number of rows removed
    (0 = nothing matched, nothing published — the idempotent no-op, so a
    retried erasure job cannot burn versions).

    ``purge_history=True`` (the default, because this is the compliance
    path) guarantees that AFTER the call only the live version is
    retained: time-travel snapshots also contain the subject's rows, and
    an erasure that leaves them readable under
    ``read_published(version=...)`` has not erased anything. The purge
    runs even when nothing matched — that is what makes a RETRY after a
    crash between publish and purge (or after an earlier
    ``purge_history=False`` call) complete the erasure instead of
    skipping it (found by review: gating the purge on the removal count
    left old snapshots readable forever on exactly that retry). Set
    ``purge_history=False`` to keep the audit window when policy allows.

    NULL-key rows are never deleted by either route (a NULL key matches
    no erasure request; the naive ``~isin`` filter silently dropped them
    — found by review). A bare string for ``keys`` is rejected rather
    than exploded into per-character keys, and the DataFrame route
    requires the key column by name (or a single-column frame) rather
    than silently taking the first column.

    Derived tables are the caller's responsibility, as with every
    erasure system: anything built FROM this data (e.g. an enriched join
    view) still holds the subject's rows and must be erased or re-derived
    too — and a re-derivation from un-erased upstream facts resurrects
    them, so erase upstream first."""
    from pyspark.sql import functions as F

    if isinstance(keys, str):
        raise TypeError(
            "keys must be a sequence of key values or a DataFrame — a bare "
            "string would be exploded into per-character keys"
        )
    current = read_published(spark, base)
    n_removed = 0
    if current is not None:
        if isinstance(keys, DataFrame):
            if key_col in keys.columns:
                src = key_col
            elif len(keys.columns) == 1:
                src = keys.columns[0]
            else:
                raise ValueError(
                    f"keys DataFrame must carry {key_col!r} or exactly one "
                    f"column, got {keys.columns}"
                )
            key_df = keys.select(F.col(src).alias("__del_key")).distinct()
            # No forced broadcast: a bulk-erasure key set can be
            # arbitrarily large (review — the same no-forced-broadcast-
            # of-growing-inputs discipline as bigram_surprise_docs); AQE
            # picks broadcast vs shuffle from the measured size.
            flagged = current.join(
                key_df,
                current[key_col] == F.col("__del_key"),
                "left",
            ).withColumn("__del", F.col("__del_key").isNotNull())
            flagged = flagged.drop("__del_key")
        else:
            # NULL-safe on BOTH sides: isNull rows are kept, never
            # silently erased, and a None inside the request list is
            # dropped rather than poisoning isin() into three-valued
            # NULL (which silently discarded every non-matching row —
            # found by review)
            vals = [k for k in keys if k is not None]
            flagged = current.withColumn(
                "__del",
                current[key_col].isNotNull() & current[key_col].isin(vals)
                if vals
                else F.lit(False),
            )
        # ONE source scan: flag + checkpoint, then both counts and the
        # publish read the local snapshot
        flagged = flagged.localCheckpoint()
        n_removed = flagged.filter(F.col("__del")).count()
        if n_removed:
            publish(flagged.filter(~F.col("__del")).drop("__del"), base)
    if purge_history:
        cur = _current_version_num(base)
        if cur is not None:
            _prune(base, keep_from=cur)
    return n_removed

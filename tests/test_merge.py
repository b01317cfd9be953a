"""MERGE INTO compiler (operators/merge_into.py): ANSI clause semantics
over constructed fixtures — the unit surface behind the oracle-checked
`merge_into_cdc_snapshot` registry entry."""

from __future__ import annotations

import pytest

from apache_beam_challange_spark.operators.merge_into import merge_into, parse_merge


def _views(spark, target_rows, source_rows):
    spark.createDataFrame(
        target_rows, "k long, v long, tag string"
    ).createOrReplaceTempView("tgt")
    spark.createDataFrame(
        source_rows, "k long, nv long, op string"
    ).createOrReplaceTempView("src")


def _run(spark, sql):
    return {
        (r.k, r.v, r.tag) for r in merge_into(spark, sql).collect()
    }


def test_merge_upsert_delete_and_insert_guard(spark):
    """The full contract in one statement: tombstone DELETE, UPDATE,
    guarded INSERT, and untouched / fall-through rows."""
    _views(
        spark,
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
        [(2, 99, "upd"), (3, 0, "del"), (4, 40, "ins"), (5, 50, "del")],
    )
    out = _run(
        spark,
        """
        MERGE INTO tgt t USING src s ON t.k = s.k
        WHEN MATCHED AND s.op = 'del' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.nv, tag = s.op
        WHEN NOT MATCHED AND s.op <> 'del' THEN
            INSERT (k, v, tag) VALUES (s.k, s.nv, s.op)
        """,
    )
    # 1 untouched, 2 updated, 3 deleted, 4 inserted, 5 insert-guarded out
    assert out == {(1, 10, "a"), (2, 99, "upd"), (4, 40, "ins")}


def test_merge_first_match_wins_clause_order(spark):
    """Two applicable WHEN MATCHED clauses: the FIRST in statement order
    applies — swapping them flips the outcome."""
    _views(spark, [(1, 10, "a")], [(1, 99, "x")])
    first_delete = """
        MERGE INTO tgt t USING src s ON t.k = s.k
        WHEN MATCHED AND s.nv > 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.nv
    """
    first_update = """
        MERGE INTO tgt t USING src s ON t.k = s.k
        WHEN MATCHED AND s.nv > 0 THEN UPDATE SET v = s.nv
        WHEN MATCHED THEN DELETE
    """
    assert _run(spark, first_delete) == set()
    assert _run(spark, first_update) == {(1, 99, "a")}


def test_merge_fallthrough_keeps_row_and_skips_insert(spark):
    """A matched row failing every clause condition stays UNCHANGED; a
    source-only row failing every NOT MATCHED condition is NOT inserted."""
    _views(spark, [(1, 10, "a")], [(1, 99, "noop"), (7, 70, "noop")])
    out = _run(
        spark,
        """
        MERGE INTO tgt t USING src s ON t.k = s.k
        WHEN MATCHED AND s.op = 'del' THEN DELETE
        WHEN NOT MATCHED AND s.op = 'ins' THEN
            INSERT (k, v, tag) VALUES (s.k, s.nv, s.op)
        """,
    )
    assert out == {(1, 10, "a")}


def test_merge_partial_update_and_null_insert_columns(spark):
    """SET touching one column leaves the others; INSERT listing a column
    subset leaves the rest NULL."""
    _views(spark, [(1, 10, "a")], [(1, 99, "u"), (2, 20, "i")])
    out = _run(
        spark,
        """
        MERGE INTO tgt t USING src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.nv + 1
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)
        """,
    )
    assert out == {(1, 100, "a"), (2, 20, None)}


def test_merge_cardinality_violation_raises(spark):
    """ANSI rule enforced at runtime: one target row matching two source
    rows is an ERROR, never an arbitrary pick."""
    _views(spark, [(1, 10, "a")], [(1, 98, "x"), (1, 99, "y")])
    with pytest.raises(Exception, match="cardinality violation"):
        merge_into(
            spark,
            """
            MERGE INTO tgt t USING src s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET v = s.nv
            """,
        ).collect()


def test_merge_parser_rejects_malformed_statements(spark):
    for bad in (
        "MERGE INTO tgt t ON t.k = s.k WHEN MATCHED THEN DELETE",  # no USING
        """MERGE INTO tgt t USING src s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v""",  # bad assignment
        """MERGE INTO tgt t USING src s ON t.k = s.k
           WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k)""",  # arity
        """MERGE INTO tgt t USING src s ON t.k = s.k
           WHEN MATCHED THEN DELETE garbage here""",  # trailing text
        "MERGE INTO tgt t USING src s ON t.k = s.k",  # no WHEN clauses
    ):
        with pytest.raises(ValueError):
            parse_merge(bad)


def test_merge_expressions_use_sparks_parser(spark):
    """Conditions and values are arbitrary Spark SQL expressions over the
    statement aliases (functions, arithmetic, CASE)."""
    _views(spark, [(1, 10, "a"), (2, 20, "bb")], [(1, 5, "u"), (2, 5, "u")])
    out = _run(
        spark,
        """
        MERGE INTO tgt t USING src s ON t.k = s.k AND length(t.tag) = 1
        WHEN MATCHED THEN UPDATE SET v = t.v * s.nv + length(t.tag)
        WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES
            (s.k * 100, CASE WHEN s.nv > 0 THEN s.nv ELSE 0 END, upper(s.op))
        """,
    )
    # k=1 matches (tag len 1) -> 10*5+1; k=2 does NOT match the ON (tag
    # 'bb'), so target row 2 is kept AND source row 2 inserts at k=200
    assert out == {(1, 51, "a"), (2, 20, "bb"), (200, 5, "U")}


def test_merge_not_matched_by_source_clauses(spark):
    """SQL:2023 extension semantics: BY SOURCE clauses act on target-only
    rows — conditional UPDATE (source columns are NULL there), DELETE,
    first-match-wins, and fall-through keeps the row."""
    _views(
        spark,
        [(1, 10, "keep"), (2, 20, "flagme"), (3, 30, "dropme"), (4, 40, "a")],
        [(4, 99, "u")],
    )
    out = _run(
        spark,
        """
        MERGE INTO tgt t USING src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.nv
        WHEN NOT MATCHED BY SOURCE AND t.tag = 'dropme' THEN DELETE
        WHEN NOT MATCHED BY SOURCE AND t.tag = 'flagme' THEN
            UPDATE SET tag = 'stale', v = t.v + 1
        """,
    )
    # 4 matched-updated (v only — SET doesn't touch tag); 3 by-source-
    # deleted; 2 by-source-updated; 1 falls through every by-source
    # condition and is kept unchanged
    assert out == {(1, 10, "keep"), (2, 21, "stale"), (4, 99, "a")}


def test_merge_by_source_rejects_insert_and_requires_not(spark):
    with pytest.raises(ValueError):
        parse_merge(
            """MERGE INTO tgt t USING src s ON t.k = s.k
               WHEN NOT MATCHED BY SOURCE THEN INSERT (k) VALUES (1)"""
        )
    with pytest.raises(ValueError, match="only valid after NOT MATCHED"):
        parse_merge(
            """MERGE INTO tgt t USING src s ON t.k = s.k
               WHEN MATCHED BY SOURCE THEN DELETE"""
        )


def test_merge_full_sync_by_source_delete_fires_on_real_data(spark, sf_dir):
    """The registry full-sync query's BY SOURCE DELETE path must actually
    fire at sf0.01: at least one stale-snapshot user is tombstoned in the
    desired state (otherwise the clause is dead code on this corpus)."""
    import __spark_entry__ as em

    em.all_queries()["merge_full_sync_snapshot"](spark, sf_dir)  # registers views
    stale = {r.user_id for r in spark.table("__merge_sync_target").collect()}
    desired = {r.user_id for r in spark.table("__merge_sync_desired").collect()}
    assert stale - desired, "no user exercises the BY SOURCE DELETE path"


def test_merge_multimatch_without_applicable_clause_is_legal(spark):
    """Review fix: ANSI raises only on NONDETERMINISTIC multi-matches.
    (a) insert-only merge over a multi-matched target row succeeds and
    keeps ONE unchanged copy; (b) two matches where exactly one satisfies
    the clause condition applies that one deterministically; (c) two
    matches both satisfying a clause still raise."""
    _views(spark, [(1, 10, "a")], [(1, 7, "x"), (1, 8, "y"), (5, 50, "i")])
    out = _run(
        spark,
        """
        MERGE INTO tgt t USING src s ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.nv, s.op)
        """,
    )
    assert out == {(1, 10, "a"), (5, 50, "i")}

    out = _run(
        spark,
        """
        MERGE INTO tgt t USING src s ON t.k = s.k
        WHEN MATCHED AND s.op = 'y' THEN UPDATE SET v = s.nv
        """,
    )
    assert out == {(1, 8, "a")}

    with pytest.raises(Exception, match="cardinality violation"):
        merge_into(
            spark,
            """
            MERGE INTO tgt t USING src s ON t.k = s.k
            WHEN MATCHED AND s.nv > 0 THEN UPDATE SET v = s.nv
            """,
        ).collect()


def test_merge_case_when_in_conditions_and_set(spark):
    """Review fix: CASE WHEN ... THEN expressions inside clause
    conditions and SET lists parse (boundaries key on WHEN [NOT]
    MATCHED), and quoted commas survive the SET splitter."""
    _views(spark, [(1, 10, "a"), (2, 20, "b")], [(1, 5, "u"), (2, -5, "u")])
    out = _run(
        spark,
        """
        MERGE INTO tgt t USING src s ON t.k = s.k
        WHEN MATCHED AND CASE WHEN s.nv > 0 THEN true ELSE false END THEN
            UPDATE SET v = CASE WHEN s.nv > 3 THEN s.nv ELSE 0 END, tag = 'x,y'
        """,
    )
    assert out == {(1, 5, "x,y"), (2, 20, "b")}

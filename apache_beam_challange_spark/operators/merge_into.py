"""Declarative MERGE INTO surface (VERDICT r7 #8).

The lakehouse upsert statement, executed by THIS engine: neither runtime
in this container ships a native MERGE executor (vanilla Spark's
`spark_catalog` parquet tables reject MERGE INTO — it needs a DSv2
row-level-operations catalog like Delta/Iceberg — and DuckDB 1.0.0
predates MERGE, which landed in 1.4), so the statement TEXT is compiled
here to the relational plan a table format's copy-on-write MERGE runs
anyway: ONE full-outer join of target and source on the ON condition,
per-column CASE projection for the clause actions, and a keep-predicate
filter. The result is the POST-MERGE target snapshot as a DataFrame —
the engine is immutable-source, so "merge" publishes a new snapshot
(exactly the versioned-pointer discipline of `sources/publish.py`).

Grammar (the canonical subset, ANSI clause semantics):

    MERGE INTO <view> [AS] <alias>
    USING <view> [AS] <alias>
    ON <condition>
    { WHEN MATCHED [AND <cond>] THEN UPDATE SET c = expr [, ...]
    | WHEN MATCHED [AND <cond>] THEN DELETE
    | WHEN NOT MATCHED [AND <cond>] THEN INSERT (cols) VALUES (exprs)
    | WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET ... | DELETE }...

(the last form is the SQL:2023 / lakehouse-dialect extension acting on
TARGET rows with no source match — the clause full-sync reconciliation
needs; its conditions see source columns as NULL, its only legal
actions are UPDATE/DELETE)

Semantics compiled faithfully:

- clauses apply FIRST-MATCH-WINS in statement order within their group
  (a matched row falling through every WHEN MATCHED condition stays
  unchanged; a source-only row falling through every WHEN NOT MATCHED
  condition is not inserted);
- the ANSI/lakehouse cardinality rule is ENFORCED at runtime, not
  assumed, and faithfully: a target row raises only when MORE THAN ONE
  matching source row has an APPLICABLE WHEN MATCHED clause — the
  nondeterministic-update case Delta/SQL Server reject. Multi-matches
  that no clause (or exactly one row's clause) touches are legal and
  deterministic: the row survives once, unchanged or updated by its one
  action row (review: the first cut raised on ANY multi-match). The
  guard is folded into the keep-predicate column itself so pruning
  cannot drop it;
- expressions (ON, clause conditions, assignments, insert values) are
  passed to Spark SQL's own expression parser qualified by the
  statement's aliases, so anything Spark SQL can evaluate is legal here
  (incl. CASE WHEN ... THEN inside conditions and SET lists — clause
  boundaries key on the full WHEN [NOT] MATCHED pair; the one documented
  parser limit is the literal text "WHEN MATCHED" inside a string
  constant).

Scale shape: the full-outer equi-join shuffle on the ON keys
(broadcastable when the delta is small, the CDC norm) plus ONE window
over the joined relation for the cardinality guard / no-op dedup —
keyed by target row id, with source-only rows carrying their own unique
key so insert-heavy merges have no NULL-key skew partition (review).
Then narrow projection and filter. No collect, no loops.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass
class _MatchedClause:
    condition: str | None
    delete: bool
    assignments: dict[str, str] = field(default_factory=dict)


@dataclass
class _NotMatchedClause:
    condition: str | None
    columns: list[str] = field(default_factory=list)
    values: list[str] = field(default_factory=list)


@dataclass
class _Merge:
    target: str
    t_alias: str
    source: str
    s_alias: str
    on: str
    matched: list[_MatchedClause] = field(default_factory=list)
    not_matched: list[_NotMatchedClause] = field(default_factory=list)
    #: SQL:2023 extension clauses — target rows with NO source match
    #: (full-sync reconciliation: UPDATE or DELETE them declaratively)
    not_matched_by_source: list[_MatchedClause] = field(default_factory=list)


#: Clause boundaries key on the full "WHEN [NOT] MATCHED" keyword pair,
#: never a bare WHEN/THEN — so CASE WHEN ... THEN ... expressions inside
#: conditions, SET assignments, and VALUES lists parse through (review).
#: The action THEN is disambiguated from an expression THEN by requiring
#: an action keyword after it. Remaining documented limit: the literal
#: text "WHEN MATCHED" inside a string constant would still split.
_CLAUSE_BOUNDARY = r"WHEN\s+(?:NOT\s+)?MATCHED\b"
_HEAD = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>\w+)(?:\s+AS)?\s+(?P<t>\w+)\s+"
    r"USING\s+(?P<source>\w+)(?:\s+AS)?\s+(?P<s>\w+)\s+"
    r"ON\s+(?P<on>.+?)\s+(?=" + _CLAUSE_BOUNDARY + r")",
    re.IGNORECASE | re.DOTALL,
)
_WHEN = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?:\s+BY\s+(?P<by>SOURCE|TARGET))?"
    r"(?:\s+AND\s+(?P<cond>.+?))?"
    r"\s+THEN\s+(?=UPDATE\s|DELETE\b|INSERT\s*\()"
    r"(?P<action>UPDATE\s+SET\s+.+?|DELETE|INSERT\s*\(.+?\)\s*VALUES\s*\(.+\))"
    r"\s*(?=" + _CLAUSE_BOUNDARY + r"|$)",
    re.IGNORECASE | re.DOTALL,
)


def _split_top_level(text: str) -> list[str]:
    """Split on commas not nested inside parentheses OR single-quoted
    string literals (SET / VALUES lists) — 'a,b' stays one value
    (review). Quotes escape SQL-style by doubling ('')."""
    parts, depth, in_str, cur = [], 0, False, []
    for ch in text:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
                continue
        cur.append(ch)
    if "".join(cur).strip():
        parts.append("".join(cur).strip())
    return parts


def parse_merge(sql_text: str) -> _Merge:
    """Parse the canonical MERGE grammar; raise loudly on anything else."""
    head = _HEAD.match(sql_text)
    if not head:
        raise ValueError(
            "unparseable MERGE statement (expected MERGE INTO <view> <alias> "
            f"USING <view> <alias> ON <cond> WHEN ...): {sql_text[:120]!r}"
        )
    m = _Merge(
        target=head.group("target"),
        t_alias=head.group("t"),
        source=head.group("source"),
        s_alias=head.group("s"),
        on=head.group("on").strip(),
    )
    rest = sql_text[head.end() :]
    consumed = 0
    for w in _WHEN.finditer(rest):
        if rest[consumed : w.start()].strip():
            raise ValueError(
                f"unparseable text between MERGE clauses: "
                f"{rest[consumed : w.start()]!r}"
            )
        consumed = w.end()
        action = w.group("action").strip()
        cond = w.group("cond").strip() if w.group("cond") else None
        by = (w.group("by") or "").upper()
        if by and not w.group("not"):
            raise ValueError(f"BY {by} is only valid after NOT MATCHED")
        if w.group("not") and by == "SOURCE":
            # SQL:2023 WHEN NOT MATCHED BY SOURCE: acts on TARGET rows,
            # so its legal actions are UPDATE/DELETE, never INSERT
            if action.upper() == "DELETE":
                m.not_matched_by_source.append(_MatchedClause(cond, delete=True))
            else:
                um = re.match(
                    r"UPDATE\s+SET\s+(?P<sets>.+)$",
                    action,
                    re.IGNORECASE | re.DOTALL,
                )
                if not um:
                    raise ValueError(
                        "WHEN NOT MATCHED BY SOURCE supports only UPDATE "
                        f"SET / DELETE: {action!r}"
                    )
                assigns = {}
                for part in _split_top_level(um.group("sets")):
                    k, _, v = part.partition("=")
                    if not _ or not k.strip() or not v.strip():
                        raise ValueError(f"unparseable SET assignment: {part!r}")
                    assigns[k.strip()] = v.strip()
                m.not_matched_by_source.append(
                    _MatchedClause(cond, delete=False, assignments=assigns)
                )
        elif w.group("not"):
            im = re.match(
                r"INSERT\s*\((?P<cols>.+?)\)\s*VALUES\s*\((?P<vals>.+)\)\s*$",
                action,
                re.IGNORECASE | re.DOTALL,
            )
            if not im:
                raise ValueError(
                    f"WHEN NOT MATCHED supports only INSERT (...) VALUES "
                    f"(...): {action!r}"
                )
            cols = [c.strip() for c in _split_top_level(im.group("cols"))]
            vals = _split_top_level(im.group("vals"))
            if len(cols) != len(vals):
                raise ValueError(
                    f"INSERT column/value arity mismatch: {cols} vs {vals}"
                )
            m.not_matched.append(_NotMatchedClause(cond, cols, vals))
        elif action.upper() == "DELETE":
            m.matched.append(_MatchedClause(cond, delete=True))
        else:
            um = re.match(
                r"UPDATE\s+SET\s+(?P<sets>.+)$", action, re.IGNORECASE | re.DOTALL
            )
            if not um:
                raise ValueError(f"unparseable WHEN MATCHED action: {action!r}")
            assigns = {}
            for part in _split_top_level(um.group("sets")):
                k, _, v = part.partition("=")
                if not _ or not k.strip() or not v.strip():
                    raise ValueError(f"unparseable SET assignment: {part!r}")
                assigns[k.strip()] = v.strip()
            m.matched.append(_MatchedClause(cond, delete=False, assignments=assigns))
    if rest[consumed:].strip():
        raise ValueError(f"trailing text after MERGE clauses: {rest[consumed:]!r}")
    if not m.matched and not m.not_matched and not m.not_matched_by_source:
        raise ValueError("MERGE with no WHEN clauses")
    return m


def merge_into(spark: SparkSession, sql_text: str) -> DataFrame:
    """Compile and run a MERGE INTO statement over registered temp views;
    returns the post-merge target snapshot (same schema as the target)."""
    m = parse_merge(sql_text)
    t_raw = spark.table(m.target)
    tcols = t_raw.columns
    target = (
        t_raw.withColumn("__tid", F.monotonically_increasing_id())
        .withColumn("__t_exists", F.lit(True))
        .alias(m.t_alias)
    )
    source = (
        spark.table(m.source)
        .withColumn("__sid", F.monotonically_increasing_id())
        .withColumn("__s_exists", F.lit(True))
        .alias(m.s_alias)
    )
    joined = target.join(source, F.expr(m.on), "full_outer")
    t_exists = F.coalesce(F.col(f"{m.t_alias}.__t_exists"), F.lit(False))
    s_exists = F.coalesce(F.col(f"{m.s_alias}.__s_exists"), F.lit(False))
    matched = t_exists & s_exists

    def first_match_wins(clauses, value_of, fallthrough):
        """CASE chain over clause conditions in statement order."""
        expr = fallthrough
        for clause in reversed(clauses):
            cond = F.expr(clause.condition) if clause.condition else F.lit(True)
            expr = F.when(cond, value_of(clause)).otherwise(expr)
        return expr

    # does ANY WHEN MATCHED clause apply to this joined row?
    any_applies = F.lit(False)
    for cl in m.matched:
        any_applies = any_applies | (
            F.expr(cl.condition) if cl.condition else F.lit(True)
        )

    # The per-target-row window behind the cardinality rule and no-op
    # dedup. Source-only rows get their own UNIQUE key (struct head False
    # + __sid), so inserts never funnel into one NULL-key partition —
    # insert-heavy merges stay skew-free (review).
    wkey = F.struct(
        t_exists.alias("t"),
        F.coalesce(
            F.col(f"{m.t_alias}.__tid"), F.col(f"{m.s_alias}.__sid")
        ).alias("i"),
    )
    w = Window.partitionBy(wkey)
    # ANSI/lakehouse cardinality rule, faithfully: a target row is an
    # ERROR only when MORE THAN ONE matching source row has an APPLICABLE
    # WHEN MATCHED clause (that is when the update/delete would be
    # nondeterministic — Delta/SQL Server semantics). Multiple matches
    # where no clause (or exactly one row's clause) applies are legal and
    # deterministic. The guard defines the keep column, so pruning cannot
    # drop it.
    n_applied = F.sum(F.when(matched & any_applies, 1).otherwise(0)).over(w)
    # among a target row's join copies, rank applicable rows first so the
    # action row (n_applied == 1) or one no-op representative (== 0)
    # survives; the surviving no-op copies are value-identical, so the
    # __sid order is for stability only
    rn = F.row_number().over(
        w.orderBy(
            F.when(matched & any_applies, 0).otherwise(1),
            F.col(f"{m.s_alias}.__sid").asc_nulls_last(),
        )
    )
    cardinality_guard = F.when(
        t_exists & (n_applied > 1),
        F.raise_error(
            F.format_string(
                "MERGE cardinality violation: a %s row matches %s %s rows "
                "with an applicable WHEN MATCHED clause — the update/delete "
                "would be nondeterministic",
                F.lit(m.target),
                n_applied.cast("string"),
                F.lit(m.source),
            )
        ).cast("boolean"),
    )

    out_cols = []
    for c in tcols:
        t_val = F.col(f"{m.t_alias}.{c}")
        matched_val = first_match_wins(
            m.matched,
            lambda cl, c=c, t_val=t_val: (
                t_val if cl.delete or c not in cl.assignments
                else F.expr(cl.assignments[c])
            ),
            t_val,
        )
        ins_val = first_match_wins(
            m.not_matched,
            lambda cl, c=c: (
                F.expr(cl.values[cl.columns.index(c)])
                if c in cl.columns
                else F.lit(None)
            ),
            F.lit(None),
        )
        tonly_val = first_match_wins(
            m.not_matched_by_source,
            lambda cl, c=c, t_val=t_val: (
                t_val if cl.delete or c not in cl.assignments
                else F.expr(cl.assignments[c])
            ),
            t_val,
        )
        out_cols.append(
            F.when(matched, F.when(any_applies, matched_val).otherwise(t_val))
            .when(t_exists, tonly_val)
            .otherwise(ins_val)
            .alias(c)
        )

    keep_matched = first_match_wins(
        m.matched, lambda cl: F.lit(not cl.delete), F.lit(True)
    )
    keep_inserted = first_match_wins(
        m.not_matched, lambda cl: F.lit(True), F.lit(False)
    )
    keep_tonly = first_match_wins(
        m.not_matched_by_source, lambda cl: F.lit(not cl.delete), F.lit(True)
    )
    keep = F.coalesce(
        cardinality_guard,
        F.when(matched & any_applies, keep_matched)
        # matched rows no clause touches: ONE unchanged copy survives
        # (multi-match copies are value-identical by construction)
        .when(matched, (n_applied == 0) & (rn == 1))
        .when(t_exists, keep_tonly)
        .otherwise(keep_inserted),
    )
    return joined.withColumn("__keep", keep).filter(F.col("__keep")).select(out_cols)

"""Core relational operators (SURVEY.md §2.2, §2.4, §2.5).

Each is a pure ``DataFrame -> DataFrame`` function that builds a declarative
plan — Catalyst handles pushdown/pruning/combiner-lifting that the reference
performs manually (or not at all).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Column projection (reference P1: ``beam.Map(lambda x: (x[a], x[b]))``,
    ``pipelines/cycle_rides.py:50``). Catalyst pushes the pruning into the
    parquet scan's ReadSchema."""
    return df.select(*cols)


def drop_null_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Keep rows whose (selected) fields are all non-NULL — the reference's
    ``remove_none`` predicate (``pipelines/total_distance.py:55-57``, applied
    at ``:98`` and ``:115``). Applied *before* any shuffle so the filter is
    pushed toward the scan."""
    return df.na.drop("any", subset=list(subset) if subset else None)


def group_count(df: DataFrame, keys: Sequence[str], alias: str = "amount_of_rides") -> DataFrame:
    """Group-by-value count (reference A1: ``beam.combiners.Count.PerElement``,
    ``pipelines/cycle_rides.py:51``). Spark plans the same two-phase shape
    Beam's combiner lifting produces: HashAggregate(partial) -> Exchange ->
    HashAggregate(final) — map-side combine shrinks the shuffle."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


def top_k(df: DataFrame, k: int, order: Sequence[Column], tiebreak: Sequence[str] = ()) -> DataFrame:
    """Global top-k (reference A3: ``beam.transforms.combiners.Top.Of``,
    ``pipelines/cycle_rides.py:53``). ``orderBy().limit()`` compiles to
    TakeOrderedAndProject: per-partition partial top-k + single merge — no
    total sort, same strategy as Beam's combiner-based Top.

    ``Top.Of`` is nondeterministic among ties; callers pass full-key
    ``tiebreak`` columns so results are stable for oracle hashing
    (SURVEY.md §2.5 note)."""
    if k <= 0:
        raise ValueError(f"top_k needs k >= 1, got {k}")
    return df.orderBy(*order, *[F.col(c) for c in tiebreak]).limit(k)


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Per-document top-k TF-IDF terms (SURVEY.md §2.9 text analysis):
    ``(doc_id, term, tf, df, tfidf, rank)``.

    Plan shape at scale: tokenize is a narrow explode; term frequency is one
    (doc, term) aggregation; document frequency REUSES that aggregate (one
    more groupBy on term — both map-side combined); the corpus size joins in
    as a broadcast scalar, so no driver-side ``count()`` action. The top-k
    cut is a per-doc window rank — hash-partitioned by doc, never global.

    Determinism: tfidf is rounded to 6 dp BEFORE ranking, and ties break on
    the term string, so Spark and the SQL oracle produce the identical cut
    even when unrounded scores differ in the last ulp.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") * F.lit(1.0) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )

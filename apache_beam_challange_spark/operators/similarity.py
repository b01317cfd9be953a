"""Similarity search over embedding columns (SURVEY.md §2.9).

Two paths, same API:

- :func:`cosine_topk` — brute-force exact top-k: one narrow pass computing
  cosine against a broadcast query vector, then TakeOrderedAndProject.
  At 100 TB this is a full scan but *no shuffle at all* — the partial top-k
  merge ships k rows per partition. The right baseline, and often the right
  answer when k is small and the scan is already needed.

- :func:`ann_lsh_topk` — sign-random-projection LSH: hyperplanes are
  *deterministic* pseudo-random vectors (sin-hash of (plane, component), so
  oracle SQL can reproduce them), each vector maps to a bit-string bucket,
  and only the query's bucket (plus optional 1-bit-flip neighbors) is
  scanned exactly. The bucket filter prunes the candidate set before any
  cosine math — the scan reads, hashes, filters; at scale you'd persist the
  bucket id partition-bucketed to skip files entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_beam_challange_spark.functions.vector import as_double, cosine


def _query_vec(embeddings: DataFrame, query_vec_id: int) -> DataFrame:
    return embeddings.filter(F.col("vec_id") == query_vec_id).select(
        as_double(F.col("embedding")).alias("__qvec")
    )


def cosine_topk(embeddings: DataFrame, query_vec_id: int, k: int = 20) -> DataFrame:
    """Exact top-k by cosine similarity against one stored vector.

    The single-row query side is broadcast (scalar-like join), keeping the
    big side's partitioning untouched."""
    q = _query_vec(embeddings, query_vec_id)
    scored = (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(as_double(F.col("embedding")), F.col("__qvec")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col("vec_id")).limit(k)


def _hyperplane(plane: int, dim: int) -> F.Column:
    """Deterministic pseudo-random hyperplane: component j of plane p is
    frac(sin(p*dim + j + 1) * 43758.5453) - 0.5 — identical IEEE doubles in
    any engine with sin(), so LSH bucketing is oracle-reproducible."""
    seq = F.sequence(F.lit(plane * dim + 1), F.lit(plane * dim + dim))
    return F.transform(
        seq,
        lambda j: F.sin(j.cast("double")) * 43758.5453
        - F.floor(F.sin(j.cast("double")) * 43758.5453)
        - 0.5,
    )


def lsh_bucket(vec: F.Column, num_planes: int, dim: int) -> F.Column:
    """Concatenated sign bits of projections onto the deterministic planes."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec, _hyperplane(p, dim), lambda x, h: x * h),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in range(num_planes)
    ]
    return F.concat(*bits)


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 20,
    num_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the query's
    LSH bucket. With 2^num_planes buckets the candidate set shrinks
    geometrically; recall is tuned by num_planes (fewer planes = higher
    recall, bigger candidate sets)."""
    with_bucket = embeddings.select(
        "vec_id",
        "label",
        as_double(F.col("embedding")).alias("vec"),
        lsh_bucket(as_double(F.col("embedding")), num_planes, dim).alias("bucket"),
    )
    q = with_bucket.filter(F.col("vec_id") == query_vec_id).select(
        F.col("vec").alias("__qvec"), F.col("bucket").alias("__qbucket")
    )
    candidates = (
        with_bucket.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("__qbucket"))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("vec"), F.col("__qvec")), 6).alias("cosine_sim"),
        )
    )
    return candidates.orderBy(F.col("cosine_sim").desc(), F.col("vec_id")).limit(k)

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


def ivf_assignments(
    embeddings: DataFrame, codebook_ids: tuple[int, ...]
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    (argmax cosine, centroid-id tie-break). The codebook here is a
    deterministic sample of stored vectors (at real scale: k-means
    centroids, trained offline); it broadcasts, so assignment is one
    narrow pass over the table — the inverted lists are then just a
    cluster_id column to partition/bucket by."""
    from pyspark.sql import Window

    cents = embeddings.filter(F.col("vec_id").isin(list(codebook_ids))).select(
        F.col("vec_id").alias("centroid_id"),
        as_double(F.col("embedding")).alias("cvec"),
    )
    scored = embeddings.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("vec")
    ).crossJoin(F.broadcast(cents)).withColumn(
        "__sim", cosine(F.col("vec"), F.col("cvec"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("vec_id", "label", "vec", "centroid_id")
    )


def ivf_candidates(
    embeddings: DataFrame,
    cents: DataFrame,
    query_vec_id: int,
    n_probe: int = 2,
) -> DataFrame:
    """The IVF recall stage alone: assign every vector to its nearest
    centroid (broadcast codebook), rank centroids against the query, and
    return the members of the ``n_probe`` probed inverted lists (query
    vector excluded) — ``(vec_id, label, vec, centroid_id)``. Composable
    with any precision stage: exact cosine (:func:`ivf_topk_with_centroids`)
    or compressed ADC (IVF+PQ, :func:`operators.clustering.pq_topk`)."""
    from pyspark.sql import Window

    vecs = embeddings.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("vec")
    )
    aw = Window.partitionBy("vec_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id")
    )
    assigned = (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("__sim", cosine(F.col("vec"), F.col("cvec")))
        .withColumn("__rk", F.row_number().over(aw))
        .filter(F.col("__rk") == 1)
        .select("vec_id", "label", "vec", "centroid_id")
    )
    q = _query_vec(embeddings, query_vec_id)
    probe_w = Window.orderBy(F.col("__qsim").desc(), F.col("centroid_id"))
    probes = (
        cents.crossJoin(F.broadcast(q))
        .withColumn("__qsim", cosine(F.col("cvec"), F.col("__qvec")))
        .withColumn("__rk", F.row_number().over(probe_w))
        .filter(F.col("__rk") <= n_probe)
        .select("centroid_id")
    )
    return assigned.join(F.broadcast(probes), "centroid_id").filter(
        F.col("vec_id") != query_vec_id
    )


def ivf_topk_with_centroids(
    embeddings: DataFrame,
    cents: DataFrame,
    query_vec_id: int,
    k: int = 20,
    n_probe: int = 2,
) -> DataFrame:
    """IVF approximate top-k against an arbitrary ``(centroid_id, cvec)``
    codebook — sampled vectors, or k-means output
    (:func:`operators.clustering.kmeans_centroids`). Rank centroids against
    the query, probe the ``n_probe`` nearest inverted lists, exact-search
    only those. With |codebook| lists and n_probe probes the scan shrinks
    by roughly n_probe/|codebook| — the standard recall/cost dial."""
    candidates = ivf_candidates(embeddings, cents, query_vec_id, n_probe=n_probe)
    q = _query_vec(embeddings, query_vec_id)
    return (
        candidates.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("vec"), F.col("__qvec")), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 20,
    codebook_ids: tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6, 7),
    n_probe: int = 2,
) -> DataFrame:
    """IVF approximate top-k with the deterministic sampled codebook
    (stored vectors ``codebook_ids`` act as centroids). See
    :func:`ivf_topk_with_centroids` for the general form."""
    cents = embeddings.filter(F.col("vec_id").isin(list(codebook_ids))).select(
        F.col("vec_id").alias("centroid_id"),
        as_double(F.col("embedding")).alias("cvec"),
    )
    return ivf_topk_with_centroids(
        embeddings, cents, query_vec_id, k=k, n_probe=n_probe
    )


def ivf_write_index(
    embeddings: DataFrame, path: str, codebook_ids: tuple[int, ...]
) -> None:
    """Materialize the IVF inverted lists AT REST: every vector written
    under ``path`` hive-partitioned by its ``centroid_id``. This is the
    100 TB posture for ANN — the index is built once (here coarse
    quantization; at real scale offline k-means), and a query touches only
    ``n_probe`` of the |codebook| partition directories, skipping the rest
    of the files entirely."""
    assigned = ivf_assignments(embeddings, codebook_ids)
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivf_topk_indexed(
    embeddings: DataFrame,
    index: DataFrame,
    query_vec_id: int,
    k: int = 20,
    codebook_ids: tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6, 7),
    n_probe: int = 2,
) -> DataFrame:
    """IVF top-k served from the materialized index: rank centroids
    against the query (tiny broadcast), then join the index on
    ``centroid_id`` — the partition column — so Spark's dynamic partition
    pruning drops every non-probed inverted list at the FILE level before
    any vector is read. Same results as :func:`ivf_topk`; the scan cost
    drops from full-table to ~n_probe/|codebook|."""
    from pyspark.sql import Window

    cents = embeddings.filter(F.col("vec_id").isin(list(codebook_ids))).select(
        F.col("vec_id").alias("centroid_id"),
        as_double(F.col("embedding")).alias("cvec"),
    )
    q = _query_vec(embeddings, query_vec_id)
    probe_w = Window.orderBy(F.col("__qsim").desc(), F.col("centroid_id"))
    probes = (
        cents.crossJoin(F.broadcast(q))
        .withColumn("__qsim", cosine(F.col("cvec"), F.col("__qvec")))
        .withColumn("__rk", F.row_number().over(probe_w))
        .filter(F.col("__rk") <= n_probe)
        .select("centroid_id")
    )
    candidates = index.join(F.broadcast(probes), "centroid_id").filter(
        F.col("vec_id") != query_vec_id
    )
    return (
        candidates.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("vec"), F.col("__qvec")), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


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

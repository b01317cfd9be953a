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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_beam_challange_spark.functions.vector import as_double, cosine


def _query_vec(embeddings: DataFrame, query_vec_id: int) -> DataFrame:
    return embeddings.filter(F.col("vec_id") == query_vec_id).select(
        as_double(F.col("embedding")).alias("__qvec")
    )


def _cos_py(q: list, v: list) -> float:
    """Bit-exact driver replication of :func:`cosine` (the engine's
    zip_with+aggregate expression): per-element products, left-to-right
    sums seeded at 0.0, correctly-rounded sqrt, one division — every
    step the same IEEE-754 double operation in the same order the JVM
    executes, so the value is bit-identical to Spark's (and to the
    DuckDB oracle's replay of the same chain)."""
    num = 0.0
    for x, y in zip(q, v):
        num += x * y
    dq = 0.0
    for x in q:
        dq += x * x
    dv = 0.0
    for y in v:
        dv += y * y
    den = math.sqrt(dq) * math.sqrt(dv)
    if den == 0.0:
        # Spark double-division semantics for the degenerate norm (never
        # hit on the fixtures; Python would raise instead)
        return (
            float("nan") if num == 0.0 else math.copysign(float("inf"), num)
        )
    return num / den


def _cos_fp_py(q: list, v: list) -> int:
    """Driver replication of :func:`_cos_fp`: the same IEEE multiply by
    1e9 then floor — exact for |cos| <= 1."""
    return int(math.floor(_cos_py(q, v) * _VAM_FP))


def _in_pred(col_name: str, ids) -> F.Column:
    """Single-gateway-call IN predicate over integer ids.

    ``Column.isin(list)`` routes one py4j round-trip PER element through
    ``_create_column_from_literal`` — profiled at 2.8 s of a 7.4 s serve
    loop for ~2.4k ids (13k gateway calls). Rendering the id list into
    one SQL ``IN`` expression is a single gateway call and parses to the
    identical ``In(col, literals)`` predicate, so the parquet pushdown
    and the result are unchanged (guide §1.2 step 2: per-task — here
    per-round driver — work)."""
    ids = sorted(int(i) for i in ids)
    if not ids:
        return F.lit(False)
    return F.expr(f"`{col_name}` IN ({','.join(map(str, ids))})")


def _serve_fetch(vecs: DataFrame, adj_df: DataFrame, vec_pred, src_pred):
    """ONE combined point-lookup job for the graph-serve loop: vectors
    matching ``vec_pred`` and adjacency rows matching ``src_pred``,
    each predicate pushed to its own parquet scan, unioned into a
    single action (r13: the serve wall is Spark job round-trips, not
    data — one job per round instead of two). Returns
    ``(vecs_dict, edges_list)``; either predicate may be None to skip
    that side. The plan carries no scoring expressions — scoring is
    driver-side via :func:`_cos_py`/:func:`_cos_fp_py`."""
    parts = []
    if src_pred is not None:
        parts.append(
            adj_df.filter(src_pred).select(
                F.col("src").alias("i"),
                F.col("dst").alias("j"),
                F.lit(None).cast("array<double>").alias("vec"),
            )
        )
    if vec_pred is not None:
        parts.append(
            vecs.filter(vec_pred).select(
                F.col("vec_id").alias("i"),
                F.lit(None).cast("long").alias("j"),
                F.col("vec"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    got_vecs: dict[int, list] = {}
    edges: list[tuple[int, int]] = []
    for r in df.collect():
        if r["j"] is None:
            got_vecs[r["i"]] = list(r["vec"])
        else:
            edges.append((r["i"], r["j"]))
    return got_vecs, edges


def _merge_edges(nbrs: dict, fetched_ids, edges) -> None:
    """Fold a fetch's adjacency rows into the driver cache, marking every
    queried src as fetched (an isolated node caches an empty list so it
    is never re-fetched)."""
    for i in fetched_ids:
        nbrs.setdefault(i, [])
    for s, d in edges:
        nbrs.setdefault(s, []).append(d)


def _serve_phase(
    vecs: DataFrame,
    adj_df: DataFrame,
    qvecs: dict,
    score_py,
    visited: dict,
    vcache: dict,
    nbrs: dict,
    b: int,
    rr: int,
) -> None:
    """One descent phase of the driver-cached graph-serve loop, shared by
    the single-query and batched routes (r13 restructure, guide
    §1.2/§2.4): per round at most ONE combined point-lookup job
    (:func:`_serve_fetch` — vectors for newly reached ids + this layer's
    adjacency for those same ids, prefetched so the NEXT round's frontier
    selection never blocks on a second job). Frontier selection, dedup
    and scoring are driver-local over parameter-bounded state (visited ≤
    seeds + rounds*b*M ids per query; adjacency cache ≤ visited*M rows —
    never corpus-bounded; the fetch predicates stay IN-pushed to the
    parquet scans, the vector-store point-lookup shape). At phase start
    every scored id may re-enter a frontier (the expanded mark resets at
    layer boundaries), so this layer's adjacency for ids not yet cached
    is fetched once. Trajectory-identical per qid to the per-round
    localCheckpoint DataFrame form (deterministic scoring, same frontier
    rule, same never-rescore dedup — same fixpoint); the prefetch only
    moves WHEN bytes are fetched, never what is scored."""
    qids = sorted(qvecs)
    expanded: dict[int, set[int]] = {q: set() for q in qids}
    missing = sorted(
        {v for q in qids for v in visited[q]} - set(nbrs)
    )
    if missing:
        _, edges = _serve_fetch(
            vecs, adj_df, None, _in_pred("src", missing)
        )
        _merge_edges(nbrs, missing, edges)
    for _ in range(rr):
        frontier = {
            q: sorted(
                (v for v in visited[q] if v not in expanded[q]),
                key=lambda v: (-visited[q][v], v),
            )[:b]
            for q in qids
        }
        if not any(frontier.values()):
            break
        need: dict[int, set[int]] = {}
        for q in qids:
            if not frontier[q]:
                continue
            expanded[q].update(frontier[q])
            reached: set[int] = set()
            for s in frontier[q]:
                reached.update(nbrs.get(s, ()))
            reached -= visited[q].keys() | {q}
            for v in reached:
                need.setdefault(v, set()).add(q)
        if not need:
            continue
        new_ids = sorted(set(need) - set(vcache))
        adj_ids = sorted(set(need) - set(nbrs))
        if new_ids or adj_ids:
            nvecs, edges = _serve_fetch(
                vecs,
                adj_df,
                _in_pred("vec_id", new_ids) if new_ids else None,
                _in_pred("src", adj_ids) if adj_ids else None,
            )
            vcache.update(nvecs)
            _merge_edges(nbrs, adj_ids, edges)
        for vid, qs in need.items():
            for q in qs:
                visited[q][vid] = score_py(qvecs[q], vcache[vid])


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
    any engine with sin(), so LSH bucketing is oracle-reproducible.

    The components are evaluated HERE, once, at plan-build time, and
    emitted as an array literal: inlining the sin() expression tree instead
    makes every ROW recompute dim sins per plane (4096 per row for a
    16-table index — measured 4.8 s → 1.3 s at sf0.1 for the multitable
    query when folded). Python's sin is the same C libm call DuckDB makes,
    and its bit-parity with the JVM's on this integer input family is
    exactly what two rounds of green LSH oracles already rest on."""
    import math

    vals = []
    for j in range(plane * dim + 1, plane * dim + dim + 1):
        s = math.sin(float(j)) * 43758.5453
        vals.append(s - math.floor(s) - 0.5)
    return F.lit(vals)


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


def centroid_table(source: DataFrame, codebook_ids: tuple[int, ...]) -> DataFrame:
    """The broadcastable IVF codebook ``(centroid_id, cvec)`` extracted
    from stored vectors — ONE definition for build, serve, append and
    batch-join paths (this and the two helpers below existed as eight
    near-identical inline copies; a tie-break or metric change applied to
    one copy would silently desynchronize index-build from index-serve —
    found by review)."""
    return source.filter(F.col("vec_id").isin(list(codebook_ids))).select(
        F.col("vec_id").alias("centroid_id"),
        as_double(F.col("embedding")).alias("cvec"),
    )


def assign_nearest(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Coarse quantization shared by every IVF path: broadcast the
    codebook, score cosine, keep the argmax with centroid-id tie-break.
    ``vecs`` must carry (vec_id, ..., vec); output appends
    ``centroid_id``."""
    from pyspark.sql import Window

    aw = Window.partitionBy("vec_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id")
    )
    keep = [c for c in vecs.columns] + ["centroid_id"]
    return (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("__sim", cosine(F.col("vec"), F.col("cvec")))
        .withColumn("__rk", F.row_number().over(aw))
        .filter(F.col("__rk") == 1)
        .select(*keep)
    )


def probe_centroids(cents: DataFrame, q: DataFrame, n_probe: int) -> DataFrame:
    """Single-query probe ranking shared by every IVF serve path: rank
    the codebook against the broadcast query vector, keep the top
    ``n_probe`` list ids (centroid-id tie-break)."""
    from pyspark.sql import Window

    pw = Window.orderBy(F.col("__qsim").desc(), F.col("centroid_id"))
    return (
        cents.crossJoin(F.broadcast(q))
        .withColumn("__qsim", cosine(F.col("cvec"), F.col("__qvec")))
        .withColumn("__rk", F.row_number().over(pw))
        .filter(F.col("__rk") <= n_probe)
        .select("centroid_id")
    )


def ivf_assignments(
    embeddings: DataFrame, codebook_ids: tuple[int, ...]
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    (argmax cosine, centroid-id tie-break). The codebook here is a
    deterministic sample of stored vectors (at real scale: k-means
    centroids, trained offline); it broadcasts, so assignment is one
    narrow pass over the table — the inverted lists are then just a
    cluster_id column to partition/bucket by."""
    cents = centroid_table(embeddings, codebook_ids)
    vecs = embeddings.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("vec")
    )
    return assign_nearest(vecs, cents)


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
    vecs = embeddings.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("vec")
    )
    assigned = assign_nearest(vecs, cents)
    q = _query_vec(embeddings, query_vec_id)
    probes = probe_centroids(cents, q, n_probe)
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


def ivf_append_index(
    new_embeddings: DataFrame,
    codebook_source: DataFrame,
    path: str,
    codebook_ids: tuple[int, ...],
) -> None:
    """Incremental IVF maintenance: assign ONLY the new vectors against
    the FIXED stored codebook (``codebook_source`` is any table holding
    the codebook vectors — the base corpus or a stored centroids table;
    serving systems never retrain between periodic rebuilds) and append
    their rows into the existing ``centroid_id`` partitions. Because the
    codebook is fixed, appended rows are bit-identical to a from-scratch
    rebuild over the union — test-asserted. Same at-least-once append
    seam as :func:`lsh_append_index`; the indexed reader de-duplicates
    candidate ids, so a crash-retry re-append cannot change served
    results."""
    cents = centroid_table(codebook_source, codebook_ids)
    vecs = new_embeddings.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("vec")
    )
    assign_nearest(vecs, cents).write.mode("append").partitionBy(
        "centroid_id"
    ).parquet(path)


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
    cents = centroid_table(embeddings, codebook_ids)
    q = _query_vec(embeddings, query_vec_id)
    probes = probe_centroids(cents, q, n_probe)
    candidates = (
        index.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("vec_id") != query_vec_id)
        # identity on a clean index; makes a crash-retried incremental
        # append (duplicate rows, see ivf_append_index) result-invisible
        .dropDuplicates(["vec_id"])
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


def ann_lsh_multitable_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 20,
    # default matches lsh_write_index / ann_lsh_multitable_topk_indexed so
    # a default-parameter inline-vs-indexed comparison probes the SAME
    # table count (a 8-vs-16 defaults skew silently halved inline recall
    # in such comparisons; found by review)
    num_tables: int = 16,
    num_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """OR-amplified LSH: ``num_tables`` independent hash tables (table t
    uses the deterministic planes ``t*num_planes .. (t+1)*num_planes-1``),
    candidates = vectors sharing the query's bucket in ANY table, then
    exact cosine over the distinct union. The standard recall amplifier
    for sign-random-projection LSH: per-table neighbor-capture q becomes
    ``1-(1-q)^L`` at the cost of a ~L/2^planes-of-corpus candidate scan.

    Plan shape (the part that survives 100 TB): vector components
    posexplode to narrow (vec_id, j, x) rows, broadcast-join the
    (plane, j, h) component matrix (L*planes*dim literal rows), and the
    per-plane projections are ONE codegen'd hash aggregation — the same
    comp→proj→buck pipeline the DuckDB oracle runs, chosen over the
    per-row ``aggregate(zip_with(...))`` fold because Spark's higher-order
    functions are interpreted per element (measured 4.2 s → this shape at
    sf0.1; the aggregation partial-combines map-side so the shuffle is
    L*|corpus| narrow rows). Candidates then come from ONE equi-join on
    (table_idx, bucket) against the query's broadcast bucket list —
    exactly the MinHash band-join shape, never all-pairs — then one
    distinct on vec_id, a semi-join back to the vectors, and a
    zero-shuffle exact-cosine TakeOrdered. The float-sum accumulation
    order within a (vec_id, plane) group is j-ascending on both engines
    (narrow intra-partition order), keeping projections bit-identical to
    the sequential fold."""
    flat = _multitable_buckets(embeddings, num_tables, num_planes, dim)
    qvec = _query_vec(embeddings, query_vec_id)
    cand_ids = _bucket_candidate_ids(flat, query_vec_id)
    vecs = embeddings.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("vec")
    )
    return (
        vecs.join(cand_ids, "vec_id")
        .crossJoin(F.broadcast(qvec))
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


def knn_join_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    codebook_ids: tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6, 7),
    n_probe: int = 2,
) -> DataFrame:
    """Batch k-NN JOIN: for EVERY query vector, its ``k`` nearest corpus
    vectors by cosine — the operator a curation pipeline actually runs
    (dedup/enrichment is never one query at a time). Both sides coarse-
    quantize against the same broadcast codebook; each query is scored
    only against corpus members of its ``n_probe`` nearest inverted
    lists, via ONE equi-join on ``centroid_id`` — the classic IVF
    batch-probe shape, never queries x corpus all-pairs. Per-query top-k
    is a window rank over the probed candidates.

    Output: ``(query_vec_id, vec_id, label, cosine_sim)``, self-matches
    excluded (query and corpus may be the same table).

    Scale posture: with |lists| inverted lists and ``n_probe`` probes the
    join's expected output is ``n_probe/|lists|`` of the all-pairs
    volume; both sides shuffle once on ``centroid_id`` (or not at all
    when the corpus is already hive-partitioned by it — the at-rest
    layout ``ivf_write_index`` produces), and the window's partition key
    ``query_vec_id`` distributes the ranking."""
    from pyspark.sql import Window

    cents = centroid_table(corpus, codebook_ids)
    corpus_vecs = corpus.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("vec")
    )
    assigned = assign_nearest(corpus_vecs, cents)
    query_vecs = queries.select(
        F.col("vec_id").alias("query_vec_id"),
        as_double(F.col("embedding")).alias("qvec"),
    )
    pw = Window.partitionBy("query_vec_id").orderBy(
        F.col("__qsim").desc(), F.col("centroid_id")
    )
    probes = (
        query_vecs.crossJoin(F.broadcast(cents))
        .withColumn("__qsim", cosine(F.col("qvec"), F.col("cvec")))
        .withColumn("__rk", F.row_number().over(pw))
        .filter(F.col("__rk") <= n_probe)
        .select("query_vec_id", "qvec", "centroid_id")
    )
    kw = Window.partitionBy("query_vec_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id")
    )
    return (
        assigned.join(probes, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_vec_id"))
        .select(
            "query_vec_id",
            "vec_id",
            "label",
            F.round(cosine(F.col("vec"), F.col("qvec")), 6).alias("cosine_sim"),
        )
        .withColumn("__rk", F.row_number().over(kw))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def ann_lsh_multiprobe_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 20,
    num_planes: int = 4,
    dim: int = 64,
    max_flips: int = 1,
) -> DataFrame:
    """Multi-probe LSH — the OTHER standard amplification (Lv et al.,
    "Multi-probe LSH", VLDB'07): ONE hash table, but the query probes
    every bucket within ``max_flips`` sign flips of its own (flipping the
    bits most likely to be borderline; here: all of them, the exhaustive
    variant for small plane counts). Probing 1+planes of the 2^planes
    buckets multiplies candidates (and recall) by ~(1+planes) without
    building more tables — the memory-lean alternative to
    :func:`ann_lsh_multitable_topk`. The probe test is a broadcast join
    against the single query-bucket row with a per-character Hamming
    predicate on the bit-string (codegen-friendly; no UDF)."""
    with_bucket = embeddings.select(
        "vec_id",
        "label",
        as_double(F.col("embedding")).alias("vec"),
        lsh_bucket(as_double(F.col("embedding")), num_planes, dim).alias("bucket"),
    )
    q = with_bucket.filter(F.col("vec_id") == query_vec_id).select(
        F.col("vec").alias("__qvec"), F.col("bucket").alias("__qbucket")
    )
    hamming = sum(
        (
            F.substring(F.col("bucket"), i + 1, 1)
            != F.substring(F.col("__qbucket"), i + 1, 1)
        ).cast("int")
        for i in range(num_planes)
    )
    return (
        with_bucket.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .filter(hamming <= max_flips)
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("vec"), F.col("__qvec")), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def _multitable_buckets(
    embeddings: DataFrame, num_tables: int, num_planes: int, dim: int
) -> DataFrame:
    """Narrow (vec_id, table_idx, bucket) rows for every vector — the
    codegen'd comp→proj→buck pipeline shared by the inline multitable
    query and the at-rest index builder."""
    import math

    spark = embeddings.sparkSession
    plane_rows = []
    for p in range(num_tables * num_planes):
        for idx in range(dim):
            g = p * dim + idx + 1
            s = math.sin(float(g)) * 43758.5453
            plane_rows.append((p, idx + 1, s - math.floor(s) - 0.5))
    planes = spark.createDataFrame(plane_rows, "p int, j int, h double")
    comp = embeddings.select(
        "vec_id", F.posexplode(as_double(F.col("embedding"))).alias("j0", "x")
    ).select("vec_id", (F.col("j0") + 1).alias("j"), "x")
    proj = (
        comp.join(F.broadcast(planes), "j")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("x") * F.col("h")).alias("s"))
    )
    return (
        proj.groupBy(
            "vec_id",
            F.floor(F.col("p") / num_planes).cast("int").alias("table_idx"),
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "p",
                                F.when(F.col("s") > 0, F.lit("1"))
                                .otherwise(F.lit("0"))
                                .alias("bit"),
                            )
                        )
                    ),
                    lambda st: st["bit"],
                ),
                "",
            ).alias("bucket")
        )
    )


def _bucket_candidate_ids(flat: DataFrame, query_vec_id: int) -> DataFrame:
    """Distinct candidate vec_ids sharing any (table_idx, bucket) row with
    the query — the OR-amplified band equi-join shared by the cosine
    multitable route and the augmented-MIPS route (plans/mips.py); one
    definition so tie-break/join fixes can never desynchronize the two."""
    q = flat.filter(F.col("vec_id") == query_vec_id).select(
        F.col("table_idx").alias("__qtable"),
        F.col("bucket").alias("__qbucket"),
    )
    return (
        flat.filter(F.col("vec_id") != query_vec_id)
        .join(
            F.broadcast(q),
            (F.col("table_idx") == F.col("__qtable"))
            & (F.col("bucket") == F.col("__qbucket")),
        )
        .select("vec_id")
        .dropDuplicates(["vec_id"])
    )


def lsh_write_index(
    embeddings: DataFrame,
    path: str,
    num_tables: int = 16,
    num_planes: int = 4,
    dim: int = 64,
) -> None:
    """Materialize the multitable LSH bucket index AT REST: every
    (vec_id, table_idx, bucket) row written hive-partitioned by
    (table_idx, bucket) — num_tables * 2^num_planes directories. A query
    computes its own ``num_tables`` bucket ids (tiny) and joins them into
    the partition columns, so dynamic partition pruning opens exactly
    num_tables of the directories and never reads the rest — the same
    at-rest posture as :func:`ivf_write_index`, completing the LSH family
    (the L*planes projection passes happen ONCE here, not per query).

    The stored partition value is ``"b" + bucket``: hive partition-column
    type inference would read a pure-digit bit-string ("0101") back as an
    integer with leading zeros dropped, leaving the bucket join to rely on
    implicit string==int casts. The non-digit prefix pins the partition
    column to string under any inference config or bucket alphabet."""
    _multitable_buckets(embeddings, num_tables, num_planes, dim).withColumn(
        "bucket", F.concat(F.lit("b"), F.col("bucket"))
    ).write.mode("overwrite").partitionBy("table_idx", "bucket").parquet(path)


def lsh_append_index(
    new_embeddings: DataFrame,
    path: str,
    num_tables: int = 16,
    num_planes: int = 4,
    dim: int = 64,
) -> None:
    """Incremental maintenance of the at-rest LSH index: bucket rows for
    ONLY the new vectors, appended into the existing hive partitions — the
    corpus grows without ever rebuilding the index (the projection pass is
    linear in the delta, not the corpus). The plane matrix is a pure
    function of (table, plane, dim), so appended rows are bit-identical to
    what a from-scratch rebuild over the union would produce — asserted in
    tests, not assumed.

    Crash/retry model (plain parquet): Spark stages part files under
    ``_temporary`` and moves them at job commit, so a crash mid-job leaves
    no visible partial rows; a crash DURING commit can leave a subset of
    the delta visible. The retry simply re-appends: duplicate (vec_id,
    table_idx, bucket) rows are harmless to serving because the indexed
    query de-duplicates candidate ids before ranking
    (:func:`ann_lsh_multitable_topk_indexed` ``dropDuplicates``) — append
    is semantically idempotent, also test-asserted. On a transactional
    table format the append becomes one atomic commit."""
    _multitable_buckets(new_embeddings, num_tables, num_planes, dim).withColumn(
        "bucket", F.concat(F.lit("b"), F.col("bucket"))
    ).write.mode("append").partitionBy("table_idx", "bucket").parquet(path)


def probe_index_candidates(
    index: DataFrame, qb: DataFrame, query_vec_id: int
) -> DataFrame:
    """Distinct candidate ids from an at-rest bucket index probed by the
    query's (__qtable, __qbucket) list — the partition-column equi-join
    dynamic partition pruning keys on. ONE definition shared by the
    cosine indexed route and the MIPS indexed route (plans/mips.py), the
    same no-desync rationale as :func:`_bucket_candidate_ids`."""
    return (
        index.join(
            F.broadcast(qb),
            (F.col("table_idx") == F.col("__qtable"))
            & (F.col("bucket") == F.col("__qbucket")),
        )
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id")
        .dropDuplicates(["vec_id"])
    )


def ann_lsh_multitable_topk_indexed(
    embeddings: DataFrame,
    index: DataFrame,
    query_vec_id: int,
    k: int = 20,
    num_tables: int = 16,
    num_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Multitable LSH top-k served from the at-rest bucket index: the
    query's bucket list (recomputed for one vector — a pruned scan) joins
    the index on its PARTITION columns (table_idx, bucket), dynamic
    partition pruning drops every non-probed bucket directory, the
    distinct candidate ids semi-join back to the vectors, exact cosine
    ranks. Identical results to :func:`ann_lsh_multitable_topk`."""
    qb = _multitable_buckets(
        embeddings.filter(F.col("vec_id") == query_vec_id),
        num_tables,
        num_planes,
        dim,
    ).select(
        F.col("table_idx").alias("__qtable"),
        # lsh_write_index stores "b"-prefixed buckets (string-typed
        # partition values); mirror the prefix on the query side.
        F.concat(F.lit("b"), F.col("bucket")).alias("__qbucket"),
    )
    cand_ids = probe_index_candidates(index, qb, query_vec_id)
    qvec = _query_vec(embeddings, query_vec_id)
    vecs = embeddings.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("vec")
    )
    return (
        vecs.join(cand_ids, "vec_id")
        .crossJoin(F.broadcast(qvec))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("vec"), F.col("__qvec")), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


# --- single-layer NSW graph ANN ----------------------------------------------

#: NSW graph parameters, shared by build, serve, and the oracle text:
#: candidate edges from 4 LSH tables, top-M=16 neighbors kept per node,
#: beam width 16, 8 expansion rounds, coarse seed every 50th vec_id.
#: Chosen by measured recall@20 sweep (tests/test_vector.py pins the
#: floors): M=8/beam=8/rounds=3 gave 0.15; this setting gives 1.0 at
#: sf0.01 and 0.95 at sf0.1.
NSW_TABLES, NSW_PLANES, NSW_M = 4, 4, 16
NSW_BEAM, NSW_ROUNDS, NSW_SEED_STEP = 16, 8, 50


def nsw_build_graph(
    embeddings: DataFrame,
    num_tables: int = NSW_TABLES,
    num_planes: int = NSW_PLANES,
    m: int = NSW_M,
    dim: int = 64,
) -> DataFrame:
    """Build the navigable-small-world neighbor graph WITHOUT an all-pairs
    scan: candidate edges are pairs sharing any of ``num_tables`` LSH
    buckets (the multitable machinery), and each node keeps its top-``m``
    candidates by exact cosine (window over per-src candidate groups —
    bucket-bounded, never corpus-bounded). Returns directed
    (src, dst, cos) adjacency. Deterministic end to end (sin-hyperplane
    buckets, cosine + vec_id tie-break), so the DuckDB oracle can
    recompute the graph exactly."""
    from pyspark.sql import Window

    buck = _multitable_buckets(embeddings, num_tables, num_planes, dim)
    pairs = (
        buck.alias("a")
        .join(
            buck.alias("b"),
            (F.col("a.table_idx") == F.col("b.table_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("src"), F.col("b.vec_id").alias("dst")
        )
        .dropDuplicates(["src", "dst"])
    )
    vecs = embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    scored = (
        pairs.join(vecs.withColumnRenamed("vec_id", "src").alias("va"), "src")
        .join(
            vecs.select(
                F.col("vec_id").alias("dst"), F.col("v").alias("vb")
            ),
            "dst",
        )
        .select("src", "dst", cosine(F.col("v"), F.col("vb")).alias("cos"))
    )
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= m)
        .select("src", "dst", "cos")
    )


def nsw_write_index(embeddings: DataFrame, path: str, **kw) -> None:
    """Materialize the NSW adjacency AT REST (same posture as
    :func:`ivf_write_index` / :func:`lsh_write_index`): the LSH passes and
    the per-node top-M selection happen ONCE here; serving reads only the
    frontier's adjacency rows (min/max row-group pruning on the sorted
    src column), never recomputing the graph. A BUCKET SIDECAR
    (``path + "_buckets"``) stores the per-node LSH rows so
    :func:`nsw_append_index` can fold deltas in without re-hashing the
    corpus. Commit order (torn-artifact rule — readers require _SUCCESS
    in all parts): invalidate any existing primary marker, commit the
    sidecar, commit the adjacency LAST."""
    import os

    nt = kw.get("num_tables", NSW_TABLES)
    np_ = kw.get("num_planes", NSW_PLANES)
    dim = kw.get("dim", 64)
    stale_marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(stale_marker):
        os.remove(stale_marker)
    _multitable_buckets(embeddings, nt, np_, dim).write.mode(
        "overwrite"
    ).parquet(path + "_buckets")
    nsw_build_graph(embeddings, **kw).sortWithinPartitions("src").write.mode(
        "overwrite"
    ).parquet(path)


def nsw_topk(
    embeddings: DataFrame,
    adjacency: DataFrame,
    query_vec_id: int,
    k: int = 20,
    beam: int = NSW_BEAM,
    rounds: int = NSW_ROUNDS,
    seed_step: int = NSW_SEED_STEP,
) -> DataFrame:
    """Single-layer NSW/HNSW-style bounded beam search over the at-rest
    neighbor graph: score a fixed coarse seed set (every ``seed_step``-th
    vec_id — the one-level stand-in for HNSW's upper layers), then for
    ``rounds`` iterations expand the top-``beam`` not-yet-expanded
    visited nodes through the adjacency and score the newly reached
    nodes. Exact cosine over the visited set serves the final top-k.

    Iterative-driver-job shape with id-pushdown serving, restructured in
    r13 to ONE combined single-stage job per round (guide §1.2/§2.4 —
    the serve wall was Spark job round-trips, not data): the visited
    scores (≤ seeds + rounds*beam*M ids — parameter-bounded, never
    corpus-bounded) and the fetched vectors/adjacency live in DRIVER
    caches, frontier selection is a local sort, scoring is the
    driver-side bit-exact :func:`_cos_py`, and each round issues at most
    one :func:`_serve_fetch` (vectors for newly reached ids + their
    adjacency, prefetched for the next frontier — both IN-pushed to the
    parquet scans, the vector-store point-lookup shape real graph-ANN
    serving uses). The seed pass is the same combined job (seed vectors
    + query vector + seed adjacency, all predicate-pushed).
    Trajectory-identical to the per-round DataFrame form (deterministic
    scoring; same frontier rule, same reached-dedup), so the DuckDB
    oracle replays the identical unrolled trajectory. Deterministic
    (cos desc, vec_id tie-breaks)."""
    spark = embeddings.sparkSession
    vecs = embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    adj = adjacency.select("src", "dst")
    # seed pass: ONE combined fetch — seed + query vectors and the seed
    # nodes' adjacency (predicate-pushed; prefetched so round 1 never
    # blocks on a second job)
    vcache, edges = _serve_fetch(
        vecs,
        adj,
        (F.col("vec_id") % seed_step == 0)
        | (F.col("vec_id") == query_vec_id),
        F.col("src") % seed_step == 0,
    )
    nbrs: dict[int, list[int]] = {}
    _merge_edges(
        nbrs, [i for i in vcache if i % seed_step == 0], edges
    )
    qvec = vcache[query_vec_id]
    visited: dict[int, dict[int, float]] = {query_vec_id: {}}
    vis = visited[query_vec_id]
    for i, v in vcache.items():
        if i % seed_step == 0 and i != query_vec_id:
            vis[i] = _cos_py(qvec, v)
    _serve_phase(
        vecs,
        adj,
        {query_vec_id: qvec},
        _cos_py,
        visited,
        vcache,
        nbrs,
        beam,
        rounds,
    )
    out = spark.createDataFrame(
        sorted(vis.items()), "vec_id long, cos double"
    )
    return (
        out.join(embeddings.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id", "label", F.round(F.col("cos"), 6).alias("cosine_sim")
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def nsw_topk_batch(
    embeddings: DataFrame,
    adjacency: DataFrame,
    query_ids: list[int],
    k: int = 20,
    beam: int = NSW_BEAM,
    rounds: int = NSW_ROUNDS,
    seed_step: int = NSW_SEED_STEP,
) -> DataFrame:
    """Batched NSW beam search (VERDICT r7 #2): every query in
    ``query_ids`` advances through the SAME per-round work, keyed by
    ``qid`` — the ``knn_join_vec10`` discipline applied to the graph
    index. Restructured in r13 (guide §1.2/§2.4) from the qid-keyed
    per-round localCheckpoint DataFrame shape to the driver-cached
    serve core of :func:`nsw_topk`, SHARED across the batch: at most ONE
    combined single-stage point-lookup job per round
    (:func:`_serve_phase`) — independent of batch size, vs one
    multi-exchange localCheckpoint job per round before; vectors fetched
    once serve every query in the batch. All fetches parameter-bounded
    (≤ qids*beam*M reached ids per round, never corpus-bounded);
    trajectory-identical per qid to :func:`nsw_topk` (same frontier
    rule, same never-rescore dedup, deterministic scoring — the previous
    anti-join form reached the same fixpoint). The driver-job count is
    pinned independent of batch size in tests/test_vector.py. This
    point-lookup shape is the right one for driver-bounded batches (tens
    of queries); a mass knn join (thousands+) belongs on the at-rest
    indexed routes (DPP probes), which stay corpus-shaped."""
    from pyspark.sql import Window

    spark = embeddings.sparkSession
    vecs = embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    adj = adjacency.select("src", "dst")
    qids = sorted(set(query_ids))
    # seed pass: ONE combined fetch — seed + query vectors and the seed
    # nodes' adjacency, all predicate-pushed
    vcache, edges = _serve_fetch(
        vecs,
        adj,
        (F.col("vec_id") % seed_step == 0)
        | _in_pred("vec_id", qids),
        F.col("src") % seed_step == 0,
    )
    nbrs: dict[int, list[int]] = {}
    _merge_edges(
        nbrs, [i for i in vcache if i % seed_step == 0], edges
    )
    qvecs = {q: vcache[q] for q in qids}
    visited: dict[int, dict[int, float]] = {q: {} for q in qids}
    for i, v in vcache.items():
        if i % seed_step != 0:
            continue
        for q in qids:
            if i != q:
                visited[q][i] = _cos_py(qvecs[q], v)
    _serve_phase(
        vecs,
        adj,
        qvecs,
        _cos_py,
        visited,
        vcache,
        nbrs,
        beam,
        rounds,
    )
    out = spark.createDataFrame(
        [(q, v, c) for q in qids for v, c in sorted(visited[q].items())],
        "query_vec_id long, vec_id long, cos double",
    )
    wk = Window.partitionBy("query_vec_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id")
    )
    return (
        out.join(embeddings.select("vec_id", "label"), "vec_id")
        .select(
            "query_vec_id",
            "vec_id",
            "label",
            F.round(F.col("cos"), 6).alias("cosine_sim"),
        )
        .withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def probe_index_candidates_batch(index: DataFrame, qb: DataFrame) -> DataFrame:
    """Batch twin of :func:`probe_index_candidates` (VERDICT r7 #3): a
    QUERY-SET bucket table (qid, __qtable, __qbucket) joins the at-rest
    index on its partition columns in ONE broadcast equi-join — dynamic
    partition pruning opens the union of all probed bucket directories
    once, instead of one index pass per query. Returns distinct
    (qid, vec_id) candidate pairs with self-matches dropped per query."""
    return (
        index.join(
            F.broadcast(qb),
            (F.col("table_idx") == F.col("__qtable"))
            & (F.col("bucket") == F.col("__qbucket")),
        )
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .dropDuplicates(["qid", "vec_id"])
    )


def knn_join_rerank(
    cand: DataFrame,
    vecs: DataFrame,
    qvecs: DataFrame,
    score,
    score_col: str,
    k: int,
) -> DataFrame:
    """Shared batch-serving rerank (review: this shape was forking into
    per-module copies): distinct (qid, vec_id) candidates join the
    vector table ("vec_id", "label", "__v") and the broadcast query
    vectors ("qid", "__qv") ONCE; a per-qid row_number window ranks by
    the rounded score (desc, vec_id ties) and keeps top-``k``. One
    definition of the rounding/tie-break discipline for the LSH-cosine
    and MIPS-dot batch routes, the same no-desync rationale as
    :func:`probe_index_candidates`."""
    from pyspark.sql import Window

    wk = Window.partitionBy("query_vec_id").orderBy(
        F.col(score_col).desc(), F.col("vec_id")
    )
    return (
        cand.join(vecs, "vec_id")
        .join(qvecs, "qid")
        .select(
            F.col("qid").alias("query_vec_id"),
            "vec_id",
            "label",
            F.round(score(F.col("__v"), F.col("__qv")), 6).alias(score_col),
        )
        .withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def knn_join_lsh_indexed(
    embeddings: DataFrame,
    index: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_tables: int = 16,
    num_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Batch k-NN join served from the at-rest multitable LSH bucket
    index: every query in ``query_ids`` computes its bucket list in one
    pruned pass over the query rows, the query-set probes the index's
    partition columns in one join (DPP opens only probed directories),
    and ONE exact-cosine rerank ranks all candidates per query
    (row_number window) — the ``knn_join_vec10`` discipline on the LSH
    index family. The corpus is scanned a CONSTANT number of times
    regardless of query count (plan-pinned in tests/test_vector.py);
    per-query results equal :func:`ann_lsh_multitable_topk_indexed`."""
    qids = list(query_ids)
    qb = _multitable_buckets(
        embeddings.filter(F.col("vec_id").isin(qids)),
        num_tables,
        num_planes,
        dim,
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("table_idx").alias("__qtable"),
        # lsh_write_index stores "b"-prefixed buckets (string-typed
        # partition values); mirror the prefix on the query side.
        F.concat(F.lit("b"), F.col("bucket")).alias("__qbucket"),
    )
    cand = probe_index_candidates_batch(index, qb)
    vecs = embeddings.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("__v")
    )
    qvecs = F.broadcast(
        embeddings.filter(F.col("vec_id").isin(qids)).select(
            F.col("vec_id").alias("qid"),
            as_double(F.col("embedding")).alias("__qv"),
        )
    )
    return knn_join_rerank(cand, vecs, qvecs, cosine, "cosine_sim", k)


def probe_centroids_batch(
    cents: DataFrame, qvecs: DataFrame, n_probe: int
) -> DataFrame:
    """Batch twin of :func:`probe_centroids`: rank the broadcast codebook
    against EVERY query vector (``qvecs``: (qid, qvec)) in one plan —
    per-qid row_number window, centroid-id tie-break — returning
    (qid, centroid_id) probe pairs. The codebook and the query set are
    both dimension-sized, so the whole probe stage is broadcast-local."""
    from pyspark.sql import Window

    pw = Window.partitionBy("qid").orderBy(
        F.col("__qsim").desc(), F.col("centroid_id")
    )
    return (
        cents.crossJoin(F.broadcast(qvecs))
        .withColumn("__qsim", cosine(F.col("cvec"), F.col("qvec")))
        .withColumn("__rk", F.row_number().over(pw))
        .filter(F.col("__rk") <= n_probe)
        .select("qid", "centroid_id")
    )


def nsw_append_graph(
    adjacency: DataFrame,
    old_buckets: DataFrame,
    embeddings_all: DataFrame,
    new_embeddings: DataFrame,
    num_tables: int = NSW_TABLES,
    num_planes: int = NSW_PLANES,
    m: int = NSW_M,
    dim: int = 64,
) -> DataFrame:
    """Incremental NSW graph maintenance with an EXACTNESS THEOREM
    (round 8): append == rebuild, row for row. For an old node u, a
    rebuild keeps top-M over ALL its candidates; every candidate u's old
    top-M dropped was dominated by M better old candidates that are all
    still present, so top-M(old-top-M(u) UNION new-touching-candidates(u))
    equals top-M(all candidates(u)) — same cosines, same (cos desc, dst)
    tie-break, identical rows (test-asserted against a from-scratch
    rebuild, not assumed). Unlike the MIPS index, whose stored hashes
    embed a corpus norm bound, an NSW edge score depends only on its two
    endpoint vectors — appends never go stale and need no guard.

    Incrementality: ONLY the delta is hashed (``new_embeddings`` ->
    bucket rows); candidates come from delta buckets joined against the
    stored bucket sidecar; only AFFECTED srcs re-rank; every untouched
    adjacency row passes through verbatim. Cost is O(delta x bucket
    collisions), independent of corpus size."""
    from pyspark.sql import Window

    new_buck = _multitable_buckets(new_embeddings, num_tables, num_planes, dim)
    buck_all = old_buckets.unionByName(new_buck)
    half = (
        buck_all.alias("a")
        .join(
            new_buck.alias("b"),
            (F.col("a.table_idx") == F.col("b.table_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("src"), F.col("b.vec_id").alias("dst"))
    )
    pairs = (
        half.unionByName(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .dropDuplicates(["src", "dst"])
    )
    vecs = embeddings_all.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    scored = (
        pairs.join(vecs.withColumnRenamed("vec_id", "src").alias("va"), "src")
        .join(
            vecs.select(F.col("vec_id").alias("dst"), F.col("v").alias("vb")),
            "dst",
        )
        .select("src", "dst", cosine(F.col("v"), F.col("vb")).alias("cos"))
    )
    affected = pairs.select("src").distinct()
    merged = (
        adjacency.join(affected, "src", "left_semi")
        .unionByName(scored)
        .dropDuplicates(["src", "dst"])
    )
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
    reranked = (
        merged.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= m)
        .select("src", "dst", "cos")
    )
    return adjacency.join(affected, "src", "left_anti").unionByName(reranked)


def nsw_append_index(
    new_embeddings: DataFrame,
    embeddings_all: DataFrame,
    path: str,
    **kw,
) -> None:
    """At-rest NSW append: read the adjacency + bucket sidecar, fold the
    delta in via :func:`nsw_append_graph`, and republish. Both outputs
    are localCheckpoint-ed BEFORE any write (the computation reads the
    paths it rewrites). Commit order mirrors mips_lsh_write_index's
    torn-artifact rule (readers require _SUCCESS in all parts): the
    primary's marker is invalidated FIRST, the bucket sidecar commits
    (delta rows appended), the rewritten adjacency commits LAST — a
    crash anywhere in between leaves is_materialized false and forces a
    clean rebuild, never a silently-stale graph."""
    import os

    spark = new_embeddings.sparkSession
    adjacency = spark.read.parquet(path).localCheckpoint()
    old_buckets = spark.read.parquet(path + "_buckets")
    nt = kw.get("num_tables", NSW_TABLES)
    np_ = kw.get("num_planes", NSW_PLANES)
    dim = kw.get("dim", 64)
    new_buck = _multitable_buckets(
        new_embeddings, nt, np_, dim
    ).localCheckpoint()
    appended = nsw_append_graph(
        adjacency, old_buckets, embeddings_all, new_embeddings, **kw
    ).localCheckpoint()
    stale_marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(stale_marker):
        os.remove(stale_marker)
    new_buck.write.mode("append").parquet(path + "_buckets")
    appended.sortWithinPartitions("src").write.mode("overwrite").parquet(path)


def ann_lsh_multitable_topk_filtered(
    embeddings: DataFrame,
    query_vec_id: int,
    predicate,
    k: int = 20,
    num_tables: int = 16,
    num_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """FILTERED vector search (round 8) — the production ANN query shape
    'top-k neighbors WHERE <metadata predicate>', with the predicate
    pushed into the CANDIDATE stage (pre-filter), not applied to a fixed
    shortlist afterwards: post-filtering a top-k loses recall whenever
    the predicate is selective (a k-list with f qualifying rows serves
    only f results), while the pre-filter ranks only qualifying vectors
    and always surfaces k survivors when they exist — the gap is
    test-measured in tests/test_vector.py. ``predicate`` is any Column
    over the vector table's metadata (vec_id, label); at rest the same
    shape applies the predicate between the bucket probe and the rerank,
    where it also prunes the point-lookup join."""
    flat = _multitable_buckets(embeddings, num_tables, num_planes, dim)
    qvec = _query_vec(embeddings, query_vec_id)
    cand_ids = _bucket_candidate_ids(flat, query_vec_id)
    vecs = embeddings.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("vec")
    )
    return (
        vecs.join(cand_ids, "vec_id")
        .filter(predicate)
        .crossJoin(F.broadcast(qvec))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("vec"), F.col("__qvec")), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


# --- DiskANN-class (Vamana) on-disk graph index --------------------------------

#: Vamana parameters: candidate pool size, alpha-prune rounds (= max kept
#: out-edges before reverse merge), alpha as an exact integer ratio
#: (12/10 = 1.2), post-reverse-merge degree cap, and the serve budget.
VAMANA_C, VAMANA_PRUNE_ROUNDS = 24, 8
VAMANA_ALPHA_NUM, VAMANA_ALPHA_DEN = 12, 10
VAMANA_CAP, VAMANA_BEAM, VAMANA_ROUNDS = 12, 16, 8

#: 1e9 fixed point for every graph-build/serve DECISION (selection,
#: pruning, ordering): both engines floor the identical double cosine to
#: the identical integer, so no 1-ulp difference can flip a comparison.
_VAM_FP = 1_000_000_000.0


def _cos_fp(a, b):
    return F.floor(cosine(a, b) * F.lit(_VAM_FP)).cast("long")


def _alpha_prune(cand: DataFrame, pp: DataFrame) -> DataFrame:
    """The alpha-RobustPrune step (DiskANN Algorithm 2), shared by the
    full build and the FreshDiskANN-style insert: greedily keep the
    closest surviving candidate per src, discard everything it
    alpha-covers (``alpha*d(kept,c) <= d(p,c)``, evaluated exactly in
    integer fixed point), stop at ``VAMANA_PRUNE_ROUNDS`` kept edges.

    Implementation is a COGROUPED ``applyInPandas``: the per-src work is
    bounded (<= C candidates, C^2 pairwise rows), which is exactly the
    shape Spark's grouped-pandas path is for — ONE shuffle on src, then
    a local greedy per group. (A checkpointed relational-round version
    was trajectory-identical but paid a full Spark job per round — the
    greedy is inherently sequential per src, not per dataset.) The
    DuckDB oracle replays the SAME greedy as unrolled materialized CTE
    rounds; results are identical because the greedy is deterministic
    (rk order, exact integer cover test).

    ``cand`` is (src, dst, c_fp, rk); ``pp`` is (src, di, dj, cc_fp).
    Returns kept (src, dst, c_fp)."""
    import pandas as pd

    fp = int(_VAM_FP)
    a_num, a_den, max_kept = (
        VAMANA_ALPHA_NUM,
        VAMANA_ALPHA_DEN,
        VAMANA_PRUNE_ROUNDS,
    )

    def prune(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        if left.empty:
            return pd.DataFrame({"src": [], "dst": [], "c_fp": []}).astype(
                "int64"
            )
        src = int(left["src"].iloc[0])
        cc = {
            (int(di), int(dj)): int(c)
            for di, dj, c in zip(right["di"], right["dj"], right["cc_fp"])
        }
        # rk already encodes the (c_fp desc, dst asc) total order
        pending = sorted(
            zip(
                left["rk"].astype(int),
                left["dst"].astype(int),
                left["c_fp"].astype(int),
            )
        )
        kept = []
        surv = [(d, c) for _, d, c in pending]
        while surv and len(kept) < max_kept:
            wd, wc = surv.pop(0)
            kept.append((src, wd, wc))
            surv = [
                (d, c)
                for d, c in surv
                if not (a_num * (fp - cc[(wd, d)]) <= a_den * (fp - c))
            ]
        return pd.DataFrame(kept, columns=["src", "dst", "c_fp"])

    return (
        cand.groupBy("src")
        .cogroup(pp.groupBy("src"))
        .applyInPandas(prune, "src long, dst long, c_fp long")
    )


def vamana_build_graph(
    embeddings: DataFrame,
    num_tables: int = NSW_TABLES,
    num_planes: int = NSW_PLANES,
    dim: int = 64,
) -> DataFrame:
    """Vamana (DiskANN) graph construction, Spark-relational and
    deterministic — the three ingredients that distinguish it from the
    NSW top-M graph (nsw_build_graph keeps the M nearest candidates;
    Vamana's alpha-prune deliberately keeps a mix of short AND
    long-range edges, which is what makes single-entry greedy search
    converge from a medoid):

    1. **Candidate pool** — LSH-bucket pairs (never all-pairs), top-C per
       node by fixed-point cosine.
    2. **alpha-RobustPrune** (DiskANN Algorithm 2) as a cogrouped
       ``applyInPandas`` greedy (:func:`_alpha_prune`): keep the closest
       surviving candidate, discard every candidate it alpha-covers
       (``alpha * d(kept, c) <= d(p, c)`` — evaluated exactly in integer
       fixed point as ``12*(1e9 - cos_fp(kept,c)) <= 10*(1e9 -
       cos_fp(p,c))``), stop at R kept. Per-src work is bounded (C
       candidates, C^2 pairwise cosines from ONE self-join) — the
       grouped-pandas shape, one shuffle on src.
    3. **Reverse-edge merge + degree cap** — every kept edge is inserted
       in both directions (cosine is exactly symmetric), then capped to
       the top-``VAMANA_CAP`` per node.

    Work is bucket-bounded per node (C^2 prune pairs), one hash shuffle
    per stage — survives the 100x scale-up by construction. Returns
    directed (src, dst, c_fp) adjacency."""
    from pyspark.sql import Window

    buck = _multitable_buckets(embeddings, num_tables, num_planes, dim)
    pairs = (
        buck.alias("a")
        .join(
            buck.alias("b"),
            (F.col("a.table_idx") == F.col("b.table_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("src"), F.col("b.vec_id").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    vecs = embeddings.select("vec_id", as_double(F.col("embedding")).alias("v"))
    scored = (
        pairs.join(vecs.withColumnRenamed("vec_id", "src").alias("va"), "src")
        .join(vecs.select(F.col("vec_id").alias("dst"), F.col("v").alias("vb")), "dst")
        .select("src", "dst", _cos_fp(F.col("v"), F.col("vb")).alias("c_fp"))
    )
    w = Window.partitionBy("src").orderBy(F.col("c_fp").desc(), F.col("dst"))
    cand = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= VAMANA_C)
        .localCheckpoint()  # feeds the pairwise join AND every prune round
    )
    # bounded C^2-per-node pairwise cosines for the alpha-cover test
    pp = (
        cand.select("src", F.col("dst").alias("di"))
        .join(cand.select("src", F.col("dst").alias("dj")), "src")
        .filter(F.col("di") != F.col("dj"))
        .join(vecs.select(F.col("vec_id").alias("di"), F.col("v").alias("vi")), "di")
        .join(vecs.select(F.col("vec_id").alias("dj"), F.col("v").alias("vj")), "dj")
        .select("src", "di", "dj", _cos_fp(F.col("vi"), F.col("vj")).alias("cc_fp"))
        .localCheckpoint()
    )
    kept = _alpha_prune(cand, pp)
    rev = kept.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "c_fp"
    )
    merged = kept.union(rev).dropDuplicates(["src", "dst"])
    w_cap = Window.partitionBy("src").orderBy(F.col("c_fp").desc(), F.col("dst"))
    return (
        merged.withColumn("rk", F.row_number().over(w_cap))
        .filter(F.col("rk") <= VAMANA_CAP)
        .select("src", "dst", "c_fp")
    )


def vamana_medoid(embeddings: DataFrame) -> DataFrame:
    """The search entry point, DiskANN-style: the vector most similar to
    the corpus centroid. Exact-deterministic without a cross-row float
    sum: per-dimension centroid components are INTEGER sums of 1e-6
    fixed-point components (order-free), the per-vector score is the
    integer dot ``sum(x_fp * C_j)`` (DECIMAL(38,0) — exact at any corpus
    size) over the vector's own exact integer norm, one double division.
    One narrow pass + one 64-row broadcast; returns a single
    (medoid_id) row."""
    comp = embeddings.select(
        "vec_id",
        F.posexplode(as_double(F.col("embedding"))).alias("j", "x"),
    ).select(
        "vec_id", "j", F.floor(F.col("x") * F.lit(1e6)).cast("long").alias("x_fp")
    )
    cent = comp.groupBy("j").agg(F.sum("x_fp").cast("long").alias("cj"))
    d38 = "decimal(38,0)"
    scores = (
        comp.join(F.broadcast(cent), "j")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("x_fp").cast(d38) * F.col("cj").cast(d38))
            .cast(d38)
            .alias("m_num"),
            F.sum(F.col("x_fp").cast(d38) * F.col("x_fp").cast(d38))
            .cast(d38)
            .alias("n2_fp"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(
        (
            F.col("m_num").cast("double")
            / F.sqrt(F.col("n2_fp").cast("double"))
        ).desc(),
        F.col("vec_id"),
    )
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("vec_id").alias("medoid_id"))
    )


def vamana_write_index(embeddings: DataFrame, path: str, **kw) -> None:
    """Materialize the Vamana graph AT REST (ivf/lsh/nsw_write_index
    posture): adjacency sorted by src for row-group pruning on the
    serve-side IN-list lookups, plus a one-row ``path + "_medoid"``
    sidecar holding the entry point. Commit order (torn-artifact rule):
    invalidate the primary marker, commit the sidecar, commit the
    adjacency LAST."""
    import os

    stale = os.path.join(path, "_SUCCESS")
    if os.path.exists(stale):
        os.remove(stale)
    vamana_medoid(embeddings).write.mode("overwrite").parquet(path + "_medoid")
    vamana_build_graph(embeddings, **kw).sortWithinPartitions(
        "src"
    ).write.mode("overwrite").parquet(path)


def vamana_topk(
    embeddings: DataFrame,
    adjacency: DataFrame,
    medoid_id: int,
    query_vec_id: int,
    k: int = 20,
    beam: int = VAMANA_BEAM,
    rounds: int = VAMANA_ROUNDS,
) -> DataFrame:
    """DiskANN-style greedy beam search from the SINGLE medoid entry
    (where NSW seeds a coarse sample, Vamana's alpha-prune guarantees
    long-range edges make one entry point sufficient): score the medoid,
    then for ``rounds`` iterations expand the top-``beam`` unexpanded
    visited nodes through the at-rest adjacency and score the newly
    reached nodes — every decision on 1e9 fixed-point cosine. Same
    driver-cached serve core as :func:`nsw_topk` (r13 restructure, guide
    §1.2/§2.4): the visited scores (exact fixed-point longs, ≤ 1 +
    rounds*beam*CAP of them) live in the driver, frontier selection is a
    local integer sort, scoring is the bit-exact :func:`_cos_fp_py`, and
    each round issues at most ONE combined IN-pushed point-lookup job
    (:func:`_serve_phase`) — the per-round
    ``distinct``/``localCheckpoint`` exchanges are gone.
    Trajectory-identical (fixed-point scoring is deterministic);
    per-query work stays O(rounds*beam*CAP) regardless of corpus
    size."""
    spark = embeddings.sparkSession
    vecs = embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    adj = adjacency.select("src", "dst")
    # entry: ONE combined fetch — medoid + query vectors and the
    # medoid's adjacency (prefetched for round 1)
    vcache, edges = _serve_fetch(
        vecs,
        adj,
        _in_pred("vec_id", [medoid_id, query_vec_id]),
        F.col("src") == medoid_id,
    )
    nbrs: dict[int, list[int]] = {}
    _merge_edges(nbrs, [medoid_id], edges)
    qvec = vcache[query_vec_id]
    visited: dict[int, dict[int, int]] = {query_vec_id: {}}
    vis = visited[query_vec_id]
    if medoid_id != query_vec_id:
        vis[medoid_id] = _cos_fp_py(qvec, vcache[medoid_id])
    _serve_phase(
        vecs,
        adj,
        {query_vec_id: qvec},
        _cos_fp_py,
        visited,
        vcache,
        nbrs,
        beam,
        rounds,
    )
    out = spark.createDataFrame(
        sorted(vis.items()), "vec_id long, q_fp long"
    )
    return (
        out.join(embeddings.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            F.round(F.col("q_fp").cast("double") / F.lit(_VAM_FP), 6).alias(
                "cosine_sim"
            ),
        )
        .orderBy(F.col("q_fp").desc(), F.col("vec_id"))
        .limit(k)
    )


def vamana_topk_batch(
    embeddings: DataFrame,
    adjacency: DataFrame,
    medoid_id: int,
    query_ids: list[int],
    k: int = 5,
    beam: int = VAMANA_BEAM,
    rounds: int = VAMANA_ROUNDS,
) -> DataFrame:
    """Batched Vamana serving — the ``knn_join_vec10`` discipline applied
    to the alpha-pruned graph (family parity with :func:`nsw_topk_batch`):
    every query advances from the one medoid entry, every decision on 1e9
    fixed-point cosine. Restructured in r13 (guide §1.2/§2.4) to the
    driver-cached serve core shared with :func:`vamana_topk`: at most
    ONE combined IN-pushed point-lookup job per round independent of
    batch size (:func:`_serve_phase`), replacing the per-round
    multi-exchange localCheckpoint job. Fetches parameter-bounded
    (≤ qids*beam*CAP reached ids per round); trajectory-identical per
    qid to :func:`vamana_topk` (deterministic fixed-point scoring, same
    frontier/dedup rules)."""
    from pyspark.sql import Window

    spark = embeddings.sparkSession
    vecs = embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    adj = adjacency.select("src", "dst")
    qids = sorted(set(query_ids))
    # medoid entry: ONE combined fetch (medoid + query vectors, medoid
    # adjacency); a qid that IS the medoid starts empty (the DF form's
    # vec_id != qid filter)
    vcache, edges = _serve_fetch(
        vecs,
        adj,
        _in_pred("vec_id", set(qids) | {medoid_id}),
        F.col("src") == medoid_id,
    )
    nbrs: dict[int, list[int]] = {}
    _merge_edges(nbrs, [medoid_id], edges)
    qvecs = {q: vcache[q] for q in qids}
    visited: dict[int, dict[int, int]] = {q: {} for q in qids}
    for q in qids:
        if q != medoid_id:
            visited[q][medoid_id] = _cos_fp_py(qvecs[q], vcache[medoid_id])
    _serve_phase(
        vecs,
        adj,
        qvecs,
        _cos_fp_py,
        visited,
        vcache,
        nbrs,
        beam,
        rounds,
    )
    out = spark.createDataFrame(
        [(q, v, s) for q in qids for v, s in sorted(visited[q].items())],
        "query_vec_id long, vec_id long, q_fp long",
    )
    wk = Window.partitionBy("query_vec_id").orderBy(
        F.col("q_fp").desc(), F.col("vec_id")
    )
    return (
        out.join(embeddings.select("vec_id", "label"), "vec_id")
        .select("query_vec_id", "vec_id", "label", "q_fp")
        .withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .select(
            "query_vec_id",
            "vec_id",
            "label",
            F.round(F.col("q_fp").cast("double") / F.lit(_VAM_FP), 6).alias(
                "cosine_sim"
            ),
        )
    )


def vamana_insert_graph(
    embeddings: DataFrame,
    adjacency: DataFrame,
    medoid_id: int,
    new_ids: list[int],
    beam: int = VAMANA_BEAM,
    rounds: int = VAMANA_ROUNDS,
) -> DataFrame:
    """FreshDiskANN-style batch INSERT — the maintenance path that keeps
    a Vamana index serving while the corpus grows, without the full
    rebuild (DiskANN's graph depends on global candidate structure, so
    unlike the LSH/IVF/NSW families there is no append==rebuild theorem;
    the canonical maintenance algorithm is insert-by-search: FreshDiskANN,
    Singh et al. 2021):

    1. **Search**: one batched beam search (qid-keyed, the
       :func:`vamana_topk_batch` plan shape) finds each new vector's
       visited set over the EXISTING graph from the medoid — new nodes
       link only to pre-existing nodes, so a batch insert is
       order-independent and deterministic.
    2. **alpha-prune**: the visited set is each new node's candidate
       pool; the shared :func:`_alpha_prune` keeps its short+long-range
       out-edges.
    3. **Reverse-link + re-cap**: each kept edge is inserted in reverse
       into its target's list, and ONLY touched targets re-apply the
       degree cap (untouched adjacency rows pass through unchanged — at
       100 TB the re-cap shuffles just |touched| * CAP rows, not the
       graph).

    Returns the updated (src, dst, c_fp) adjacency. Serving quality after
    insert is floor-pinned in tests/test_wave7.py (held-out vectors are
    findable and recall holds); degree caps are re-asserted there too."""
    from pyspark.sql import Window

    vecs = embeddings.select("vec_id", as_double(F.col("embedding")).alias("v"))
    new_set = set(int(i) for i in new_ids)
    # 1. batched search over the OLD graph: visited sets per new id
    queries = F.broadcast(
        vecs.filter(F.col("vec_id").isin(list(new_set))).select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qvec")
        )
    )
    visited = (
        vecs.filter(F.col("vec_id") == medoid_id)
        .crossJoin(queries)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            _cos_fp(F.col("v"), F.col("qvec")).alias("c_fp"),
            F.lit(False).alias("expanded"),
        )
        .localCheckpoint()
    )
    w = Window.partitionBy("qid").orderBy(F.col("c_fp").desc(), "vec_id")
    old_adj = adjacency.filter(~F.col("src").isin(list(new_set)))
    for _ in range(rounds):
        frontier = (
            visited.filter(~F.col("expanded"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= beam)
            .select("qid", "vec_id")
        )
        reached = (
            frontier.withColumnRenamed("vec_id", "src")
            .join(old_adj.select("src", "dst"), "src")
            .select("qid", F.col("dst").alias("vec_id"))
            .filter(F.col("vec_id") != F.col("qid"))
            .filter(~F.col("vec_id").isin(list(new_set)))
            .distinct()
            .join(visited.select("qid", "vec_id"), ["qid", "vec_id"], "left_anti")
        )
        new_scored = (
            reached.join(vecs.select("vec_id", "v"), "vec_id")
            .join(queries, "qid")
            .select(
                "qid",
                "vec_id",
                _cos_fp(F.col("v"), F.col("qvec")).alias("c_fp"),
                F.lit(False).alias("expanded"),
            )
        )
        visited = (
            visited.join(
                frontier.withColumn("_f", F.lit(True)), ["qid", "vec_id"], "left"
            )
            .select(
                "qid",
                "vec_id",
                "c_fp",
                (F.col("expanded") | F.coalesce(F.col("_f"), F.lit(False))).alias(
                    "expanded"
                ),
            )
            .unionByName(new_scored)
            .localCheckpoint()
        )
    # 2. candidate pool = visited top-C per new node; shared alpha-prune
    cand = (
        visited.select(
            F.col("qid").alias("src"), F.col("vec_id").alias("dst"), "c_fp"
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.col("c_fp").desc(), "dst")
            ),
        )
        .filter(F.col("rk") <= VAMANA_C)
        .localCheckpoint()
    )
    pp = (
        cand.select("src", F.col("dst").alias("di"))
        .join(cand.select("src", F.col("dst").alias("dj")), "src")
        .filter(F.col("di") != F.col("dj"))
        .join(vecs.select(F.col("vec_id").alias("di"), F.col("v").alias("vi")), "di")
        .join(vecs.select(F.col("vec_id").alias("dj"), F.col("v").alias("vj")), "dj")
        .select("src", "di", "dj", _cos_fp(F.col("vi"), F.col("vj")).alias("cc_fp"))
        .localCheckpoint()
    )
    kept = _alpha_prune(cand, pp).localCheckpoint()  # new-node out-edges
    # 3. reverse-link into touched targets only, re-cap those lists
    rev = kept.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "c_fp"
    )
    touched = rev.select("src").distinct()
    touched_recapped = (
        old_adj.join(touched, "src")
        .unionByName(rev)
        .dropDuplicates(["src", "dst"])
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.col("c_fp").desc(), "dst")
            ),
        )
        .filter(F.col("rk") <= VAMANA_CAP)
        .select("src", "dst", "c_fp")
    )
    untouched = old_adj.join(touched, "src", "left_anti").select(
        "src", "dst", "c_fp"
    )
    return untouched.unionByName(touched_recapped).unionByName(
        kept.select("src", "dst", "c_fp")
    )


# --- multi-layer HNSW ----------------------------------------------------------
#
# The hierarchy the single-layer NSW route stood in for (VERDICT r11 #6):
# nodes get geometric levels (p = 1/4 per step), every layer l holds the
# LSH-bucketed top-M neighbor graph over the nodes with level >= l, and a
# query greedily descends from a deterministic top-layer entry point — the
# log-diameter routing that replaces NSW's fixed coarse seed scan (the
# "every 50th vec_id" layer-0 workaround) and is what keeps entry routing
# cheap at 1e9 vectors. Public knowledge: Malkov & Yashunin, "Efficient and
# robust approximate nearest neighbor search using Hierarchical Navigable
# Small World graphs" (arXiv:1603.09320). The reference repo has no vector
# surface; this extends SURVEY.md §2.9.

HNSW_MAX_LEVEL = 2
HNSW_M_UPPER = 8
HNSW_UPPER_BEAM, HNSW_UPPER_ROUNDS = 4, 2


def suggested_max_level(n: int) -> int:
    """log4 level-cap sizing so the TOP layer stays O(1) — the hierarchy
    invariant single-entry descent depends on. The round-12 scale check
    measured the cost of violating it: at 20k vectors a cap of 2 leaves
    a ~1000-node "top" layer and recall@20 collapses to 0.0; the same
    corpus at cap 7 (top layer 6 nodes) serves recall 0.95 with the SAME
    per-layer budgets. Returns the smallest L with n/4^L <= 8 (floor 2).
    The oracle-paired queries pin cap 2 — right-sized for their 500-row
    corpora AND required for a statically-unrolled oracle; larger
    corpora pass this cap explicitly (tests pin the recall floor)."""
    level = 0
    while n > 8 * (4 ** level):
        level += 1
    return max(level, 2)


def hnsw_levels(
    embeddings: DataFrame, max_level: int = HNSW_MAX_LEVEL
) -> DataFrame:
    """(vec_id, level): deterministic geometric level assignment. The
    standard HNSW draw is floor(-ln(u) * mL) with mL = 1/ln(4); reading
    the uniform as md5 hex digits makes it exact and cross-engine —
    level = length of the maximal prefix of md5(vec_id-as-string) whose
    chars are all in '0'..'3' (P(level >= l) = 4^-l), capped at
    ``max_level``. Pure string ops, so the DuckDB oracle recomputes the
    identical assignment."""
    h = F.md5(F.col("vec_id").cast("string"))
    level = F.lit(0)
    running = F.lit(True)
    for i in range(1, max_level + 1):
        running = running & F.substring(h, i, 1).isin("0", "1", "2", "3")
        level = level + F.when(running, F.lit(1)).otherwise(F.lit(0))
    return embeddings.select("vec_id", level.cast("int").alias("level"))


def hnsw_build_graph(
    embeddings: DataFrame,
    max_level: int = HNSW_MAX_LEVEL,
    m_upper: int = HNSW_M_UPPER,
    m0: int = NSW_M,
    num_tables: int = NSW_TABLES,
    num_planes: int = NSW_PLANES,
    dim: int = 64,
) -> DataFrame:
    """Per-layer adjacency (layer, src, dst, cos): layer l is the NSW
    graph (LSH-bucketed candidates, per-src top-M by cosine — never
    all-pairs) over the nodes with level >= l; layer 0 keeps M=16, upper
    layers M=8 (the standard M vs 2M split). ONE bucket pass, ONE pair
    self-join, ONE cosine scoring for the whole hierarchy: buckets are
    per-vector (level-independent) and layer l's candidate pairs are
    exactly the layer-0 pairs whose endpoints both reach l, so each
    scored pair explodes to layers 0..min(level(src), level(dst)) and a
    single (layer, src) window takes the per-layer top-M — the identical
    shape the DuckDB oracle materializes (cand -> adj). Equivalent row
    for row to building each layer's NSW graph over its subset, at a
    third of the build cost (pinned by the append==rebuild test, which
    compares against per-layer nsw_append_graph folds)."""
    from pyspark.sql import Window

    lv = hnsw_levels(embeddings, max_level)
    buck = _multitable_buckets(embeddings, num_tables, num_planes, dim)
    pairs = (
        buck.alias("a")
        .join(
            buck.alias("b"),
            (F.col("a.table_idx") == F.col("b.table_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("src"), F.col("b.vec_id").alias("dst")
        )
        .dropDuplicates(["src", "dst"])
    )
    vecs = embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    scored = (
        pairs.join(vecs.withColumnRenamed("vec_id", "src").alias("va"), "src")
        .join(
            vecs.select(F.col("vec_id").alias("dst"), F.col("v").alias("vb")),
            "dst",
        )
        .select("src", "dst", cosine(F.col("v"), F.col("vb")).alias("cos"))
    )
    leveled = (
        scored.join(
            lv.select(
                F.col("vec_id").alias("src"), F.col("level").alias("src_lv")
            ),
            "src",
        )
        .join(
            lv.select(
                F.col("vec_id").alias("dst"), F.col("level").alias("dst_lv")
            ),
            "dst",
        )
        .select(
            "src",
            "dst",
            "cos",
            F.explode(
                F.sequence(F.lit(0), F.least("src_lv", "dst_lv"))
            ).alias("layer"),
        )
    )
    w = Window.partitionBy("layer", "src").orderBy(
        F.col("cos").desc(), F.col("dst")
    )
    return (
        leveled.withColumn("rk", F.row_number().over(w))
        .filter(
            F.col("rk")
            <= F.when(F.col("layer") == 0, F.lit(m0)).otherwise(F.lit(m_upper))
        )
        .select("layer", "src", "dst", "cos")
    )


def hnsw_write_index(embeddings: DataFrame, path: str, **kw) -> None:
    """Materialize the layered adjacency AT REST (posture of
    :func:`nsw_write_index`): adjacency sorted by (layer, src) for
    row-group pruning, plus a ``path + "_levels"`` sidecar so serving
    finds the entry point without re-hashing and a ``path + "_buckets"``
    sidecar so :func:`hnsw_append_graph` can fold deltas in without
    re-hashing the corpus (buckets are level-independent — ONE sidecar
    serves every layer). Commit order (torn-artifact rule): invalidate
    the primary marker, commit the sidecars, commit the adjacency LAST."""
    import os

    max_level = kw.get("max_level", HNSW_MAX_LEVEL)
    nt = kw.get("num_tables", NSW_TABLES)
    np_ = kw.get("num_planes", NSW_PLANES)
    dim = kw.get("dim", 64)
    stale_marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(stale_marker):
        os.remove(stale_marker)
    hnsw_levels(embeddings, max_level).write.mode("overwrite").parquet(
        path + "_levels"
    )
    _multitable_buckets(embeddings, nt, np_, dim).write.mode(
        "overwrite"
    ).parquet(path + "_buckets")
    hnsw_build_graph(embeddings, **kw).sortWithinPartitions(
        "layer", "src"
    ).write.mode("overwrite").parquet(path)


def _hnsw_phases(
    max_level: int, upper_beam: int, upper_rounds: int, beam: int, rounds: int
) -> list[tuple[int, int, int]]:
    """(layer, beam, rounds) descent schedule: top layer down to 1 with
    the small upper budget, then the full layer-0 search."""
    return [
        (layer, upper_beam, upper_rounds) for layer in range(max_level, 0, -1)
    ] + [(0, beam, rounds)]


def hnsw_topk(
    embeddings: DataFrame,
    adjacency: DataFrame,
    levels: DataFrame,
    query_vec_id: int,
    k: int = 20,
    beam: int = NSW_BEAM,
    rounds: int = NSW_ROUNDS,
    max_level: int = HNSW_MAX_LEVEL,
    upper_beam: int = HNSW_UPPER_BEAM,
    upper_rounds: int = HNSW_UPPER_ROUNDS,
) -> DataFrame:
    """Hierarchical beam search: score the deterministic entry point (the
    MIN vec_id on the top layer, query excluded), run a small bounded
    search per upper layer (expanding only that layer's edges), then the
    full layer-0 search seeded by everything the descent scored. ONE
    visited set spans the descent — a node's cosine is layer-independent,
    so scores are never recomputed; the expanded mark resets per layer
    (a node expanded through layer-2 edges still owes its layer-0
    neighborhood). Driver-cached serve core (r13 restructure, guide
    §1.2/§2.4): at most ONE combined IN-pushed point-lookup job per
    round (:func:`_serve_phase`), per-layer adjacency caches, bit-exact
    driver scoring. All fetches parameter-bounded. Total scored
    ≤ 1 + max_level*upper_rounds*upper_beam*M_upper + rounds*beam*M0,
    independent of corpus size; vs NSW the corpus-sized seed scan is
    gone — that is the hierarchy's point. Deterministic end to end (cos
    desc, vec_id ties), so the DuckDB oracle replays the identical
    trajectory unrolled."""
    spark = embeddings.sparkSession
    vecs = embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    # ONE parameter-bounded collect (≤ levels rows, a handful) replaces
    # the two scalar aggregates: per-level min non-self vec_id. top = the
    # highest POPULATED level at or under the cap (log4-sized caps can
    # leave the top level empty by hash chance), entry = the minimum
    # non-self vec_id on the highest level ≥ top — identical rule.
    by_level = {
        r["level"]: r["mn"]
        for r in levels.filter(F.col("vec_id") != query_vec_id)
        .groupBy("level")
        .agg(F.min("vec_id").alias("mn"))
        .collect()
    }
    top = max(lvl for lvl in by_level if lvl <= max_level)
    entry = min(m for lvl, m in by_level.items() if lvl >= top)
    # entry: ONE combined fetch — entry + query vectors and the entry's
    # top-layer adjacency (prefetched for the first descent round)
    vcache, edges = _serve_fetch(
        vecs,
        adjacency.filter(F.col("layer") == top).select("src", "dst"),
        _in_pred("vec_id", [entry, query_vec_id]),
        F.col("src") == entry,
    )
    nbrs_by_layer: dict[int, dict[int, list[int]]] = {top: {}}
    _merge_edges(nbrs_by_layer[top], [entry], edges)
    qvec = vcache[query_vec_id]
    visited: dict[int, dict[int, float]] = {
        query_vec_id: {entry: _cos_py(qvec, vcache[entry])}
    }
    vis = visited[query_vec_id]
    for layer, b, rr in _hnsw_phases(
        top, upper_beam, upper_rounds, beam, rounds
    ):
        _serve_phase(
            vecs,
            adjacency.filter(F.col("layer") == layer).select("src", "dst"),
            {query_vec_id: qvec},
            _cos_py,
            visited,
            vcache,
            nbrs_by_layer.setdefault(layer, {}),
            b,
            rr,
        )
    out = spark.createDataFrame(
        sorted(vis.items()), "vec_id long, cos double"
    )
    return (
        out.join(embeddings.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id", "label", F.round(F.col("cos"), 6).alias("cosine_sim")
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def hnsw_topk_batch(
    embeddings: DataFrame,
    adjacency: DataFrame,
    levels: DataFrame,
    query_ids: list[int],
    k: int = 20,
    beam: int = NSW_BEAM,
    rounds: int = NSW_ROUNDS,
    max_level: int = HNSW_MAX_LEVEL,
    upper_beam: int = HNSW_UPPER_BEAM,
    upper_rounds: int = HNSW_UPPER_ROUNDS,
) -> DataFrame:
    """Batched hierarchical serving (the :func:`nsw_topk_batch`
    discipline on the layered graph), restructured in r13 (guide
    §1.2/§2.4) to the driver-cached serve core: at most ONE combined
    IN-pushed point-lookup job per descent round independent of batch
    size (:func:`_serve_phase`), per-layer adjacency caches, bit-exact
    driver scoring — replacing the per-round multi-exchange
    localCheckpoint job. Per-qid entry keeps the committed rule — best
    candidate by (level DESC, vec_id ASC) excluding self over the
    candidate set floored at the highest level with cumulative
    population ≥ 2 — computed by the same one-job window, with only the
    ≤ len(query_ids) entry rows collected. The expanded set resets at
    each layer boundary exactly like the single-query route;
    trajectory-identical per qid (deterministic scoring, same
    frontier/dedup rules — the previous anti-join form reached the same
    fixpoint)."""
    from pyspark.sql import Window

    spark = embeddings.sparkSession
    vecs = embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    qids = sorted(set(query_ids))
    queries = F.broadcast(
        embeddings.filter(F.col("vec_id").isin(list(query_ids))).select(
            F.col("vec_id").alias("qid")
        )
    )
    # Per-level populations at or under the cap: ONE parameter-bounded
    # collect (≤ cap+1 rows). ``top`` (the schedule's start layer) is the
    # highest populated level, as before; the entry-candidate set floors
    # at the highest level whose CUMULATIVE population is ≥ 2, so every
    # query has a non-self candidate — mirroring the single-query route's
    # self-exclusion (a top layer whose only node is a query itself would
    # otherwise hand that query an empty entry set and silently return no
    # rows instead of descending). Per-qid entry = best candidate by
    # (level DESC, vec_id ASC) excluding self, which is exactly the
    # single-query rule "min vec_id on the highest non-self level"; for a
    # qid entering below ``top`` the upper phases expand no edges (its
    # entry has none there) — a no-op, trajectory-equal to starting lower.
    lvl_counts = {
        r["level"]: r["cnt"]
        for r in levels.filter(F.col("level") <= max_level)
        .groupBy("level")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    top = max(lvl_counts)
    cum, floor = 0, 0
    for lvl in sorted(lvl_counts, reverse=True):
        cum += lvl_counts[lvl]
        if cum >= 2:
            floor = lvl
            break
    cand_nodes = F.broadcast(
        levels.filter(F.col("level") >= floor).select("vec_id", "level")
    )
    w_entry = Window.partitionBy("qid").orderBy(
        F.col("level").desc(), F.col("vec_id")
    )
    # one job; collect is ≤ len(query_ids) rows (parameter-bounded)
    entry_rows = (
        queries.select("qid")
        .join(cand_nodes, F.col("vec_id") != F.col("qid"))
        .withColumn("_rk", F.row_number().over(w_entry))
        .filter(F.col("_rk") == 1)
        .select("qid", "vec_id")
        .collect()
    )
    need: dict[int, set[int]] = {}
    for r in entry_rows:
        need.setdefault(r["vec_id"], set()).add(r["qid"])
    # entry fetch: ONE combined job — entry + query vectors and the
    # entries' top-layer adjacency (prefetched for the first round)
    entry_ids = sorted(need)
    vcache, edges = _serve_fetch(
        vecs,
        adjacency.filter(F.col("layer") == top).select("src", "dst"),
        _in_pred("vec_id", set(entry_ids) | set(qids)),
        _in_pred("src", entry_ids),
    )
    nbrs_by_layer: dict[int, dict[int, list[int]]] = {top: {}}
    _merge_edges(nbrs_by_layer[top], entry_ids, edges)
    qvecs = {q: vcache[q] for q in qids}
    visited: dict[int, dict[int, float]] = {q: {} for q in qids}
    for vid, qs in need.items():
        for q in qs:
            visited[q][vid] = _cos_py(qvecs[q], vcache[vid])
    for layer, b, rr in _hnsw_phases(
        top, upper_beam, upper_rounds, beam, rounds
    ):
        # layer boundary handled by _serve_phase: expanded resets, and
        # this layer's adjacency for already-scored ids is fetched once
        _serve_phase(
            vecs,
            adjacency.filter(F.col("layer") == layer).select("src", "dst"),
            qvecs,
            _cos_py,
            visited,
            vcache,
            nbrs_by_layer.setdefault(layer, {}),
            b,
            rr,
        )
    out = spark.createDataFrame(
        [(q, v, c) for q in qids for v, c in sorted(visited[q].items())],
        "query_vec_id long, vec_id long, cos double",
    )
    wk = Window.partitionBy("query_vec_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id")
    )
    return (
        out.join(embeddings.select("vec_id", "label"), "vec_id")
        .select(
            "query_vec_id",
            "vec_id",
            "label",
            F.round(F.col("cos"), 6).alias("cosine_sim"),
        )
        .withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def hnsw_append_graph(
    adjacency: DataFrame,
    old_buckets: DataFrame,
    embeddings_all: DataFrame,
    new_embeddings: DataFrame,
    max_level: int = HNSW_MAX_LEVEL,
    m_upper: int = HNSW_M_UPPER,
    m0: int = NSW_M,
    num_tables: int = NSW_TABLES,
    num_planes: int = NSW_PLANES,
    dim: int = 64,
) -> DataFrame:
    """Incremental HNSW maintenance with the NSW exactness theorem applied
    PER LAYER: append == rebuild, row for row. Levels are a pure function
    of vec_id (md5 prefix), so an append never re-levels an existing node,
    and each layer's graph is exactly an NSW graph over its (grown)
    level>=l population — :func:`nsw_append_graph`'s dominance argument
    (a dropped old candidate was dominated by M still-present better
    candidates) holds layer by layer. Only the delta is hashed; per layer,
    only srcs touched by a delta bucket collision re-rank. Completes the
    maintenance story across the ANN families: NSW append (theorem),
    IVF/MIPS append (guarded), Vamana insert (search-based), HNSW append
    (per-layer theorem)."""
    lv_all = hnsw_levels(embeddings_all, max_level)
    lv_new = hnsw_levels(new_embeddings, max_level)
    out = None
    for layer in range(max_level + 1):
        keep_all = lv_all.filter(F.col("level") >= layer).select("vec_id")
        keep_new = lv_new.filter(F.col("level") >= layer).select("vec_id")
        g = nsw_append_graph(
            adjacency.filter(F.col("layer") == layer).select(
                "src", "dst", "cos"
            ),
            old_buckets.join(keep_all, "vec_id"),
            embeddings_all.join(keep_all, "vec_id"),
            new_embeddings.join(keep_new, "vec_id"),
            num_tables=num_tables,
            num_planes=num_planes,
            m=(m0 if layer == 0 else m_upper),
            dim=dim,
        ).select(F.lit(layer).alias("layer"), "src", "dst", "cos")
        out = g if out is None else out.unionByName(g)
    return out


def hnsw_append_index(
    new_embeddings: DataFrame,
    embeddings_all: DataFrame,
    path: str,
    **kw,
) -> None:
    """At-rest HNSW append (posture of :func:`nsw_append_index`): read
    the layered adjacency + the level-independent bucket sidecar, fold
    the delta in via :func:`hnsw_append_graph`, append the delta's
    levels to the levels sidecar, and republish. All outputs are
    localCheckpoint-ed BEFORE any write (the computation reads the paths
    it rewrites). Commit order (torn-artifact rule — readers require
    _SUCCESS in all parts): invalidate the primary marker FIRST, commit
    the sidecars (delta rows appended), commit the rewritten adjacency
    LAST — a crash anywhere in between leaves is_materialized false and
    forces a clean rebuild, never a silently-stale hierarchy."""
    import os

    spark = new_embeddings.sparkSession
    max_level = kw.get("max_level", HNSW_MAX_LEVEL)
    nt = kw.get("num_tables", NSW_TABLES)
    np_ = kw.get("num_planes", NSW_PLANES)
    dim = kw.get("dim", 64)
    adjacency = spark.read.parquet(path).localCheckpoint()
    old_buckets = spark.read.parquet(path + "_buckets")
    new_buck = _multitable_buckets(
        new_embeddings, nt, np_, dim
    ).localCheckpoint()
    new_levels = hnsw_levels(new_embeddings, max_level).localCheckpoint()
    appended = hnsw_append_graph(
        adjacency, old_buckets, embeddings_all, new_embeddings, **kw
    ).localCheckpoint()
    stale_marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(stale_marker):
        os.remove(stale_marker)
    new_buck.write.mode("append").parquet(path + "_buckets")
    new_levels.write.mode("append").parquet(path + "_levels")
    appended.sortWithinPartitions("layer", "src").write.mode(
        "overwrite"
    ).parquet(path)

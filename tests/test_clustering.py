"""K-means Lloyd clustering (operators/clustering.py)."""

from __future__ import annotations

import pytest

from apache_beam_challange_spark.operators.clustering import kmeans_assignments


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, label, [float(x) for x in vec]) for i, (label, vec) in enumerate(rows)],
        "vec_id long, label int, embedding array<float>",
    )


def test_kmeans_separates_obvious_clusters(spark):
    rows = [
        (0, (0.1, 0.0)), (1, (10.0, 10.1)),  # seeds, one per true cluster
        (0, (0.2, 0.1)), (0, (-0.1, 0.3)),
        (1, (9.8, 10.0)), (1, (10.2, 9.9)),
    ]
    got = {r["vec_id"]: r for r in kmeans_assignments(_emb(spark, rows), k=2, n_iter=2).collect()}
    assert {got[i]["centroid_id"] for i in (0, 2, 3)} == {0}
    assert {got[i]["centroid_id"] for i in (1, 4, 5)} == {1}
    # converged assignment sits near its centroid
    assert all(got[i]["dist"] < 1.0 for i in range(6))


@pytest.mark.slow
def test_kmeans_deterministic(spark):
    rows = [(i % 3, (i * 1.7 % 5.0, (i * i) % 7.0, i / 3.0)) for i in range(20)]
    emb = _emb(spark, rows)
    a = sorted(tuple(r) for r in kmeans_assignments(emb, k=3, n_iter=2).collect())
    b = sorted(tuple(r) for r in kmeans_assignments(emb, k=3, n_iter=2).collect())
    assert a == b
    assert len(a) == 20


def test_kmeans_matches_numpy_reference(spark):
    """Cross-check the DataFrame Lloyd loop against an independent numpy
    implementation of the same fixed-point update rules."""
    import numpy as np

    n, dim, k, n_iter, scale = 40, 6, 3, 2, 10_000
    vecs = np.array(
        [[((i * 7 + j * 3) % 11) / 2.0 + (i % 5) for j in range(dim)] for i in range(n)]
    )

    cents = {c: vecs[c].copy() for c in range(k)}
    for _ in range(n_iter):
        members = {c: [] for c in cents}
        for i in range(n):
            dists = {c: float(np.sqrt(((vecs[i] - cv) ** 2).sum())) for c, cv in cents.items()}
            best = min(dists, key=lambda c: (dists[c], c))
            members[best].append(i)
        cents = {
            c: np.floor(vecs[m] * scale + 0.5).astype(np.int64).sum(axis=0)
            / (len(m) * float(scale))
            for c, m in members.items()
            if m
        }
    want = {}
    for i in range(n):
        dists = {c: float(np.sqrt(((vecs[i] - cv) ** 2).sum())) for c, cv in cents.items()}
        best = min(dists, key=lambda c: (dists[c], c))
        want[i] = (best, round(dists[best], 6))

    emb = spark.createDataFrame(
        [(i, 0, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, label int, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["centroid_id"], r["dist"])
        for r in kmeans_assignments(emb, k=k, n_iter=n_iter, scale=scale).collect()
    }
    assert got == want


@pytest.mark.slow
def test_pq_topk_deterministic_and_ordered(spark, sf_dir):
    from apache_beam_challange_spark.operators.clustering import pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = pq_topk(emb, query_vec_id=0, k_results=10).collect()
    b = pq_topk(emb, query_vec_id=0, k_results=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 10
    assert all(r["vec_id"] != 0 for r in a)
    dists = [r["adc_dist"] for r in a]
    assert dists == sorted(dists) and all(d >= 0 for d in dists)


@pytest.mark.slow
def test_opq_allocation_balances_and_recall_not_regressed(spark):
    """The trained OPQ permutation must (a) be a true permutation of the
    dims, (b) achieve its objective EXACTLY on the greedy deal — subspace
    variance-energy spread bounded by m times the max single-dim key (the
    round-robin guarantee) — and (c) not regress recall vs plain PQ at
    the same code budget. On this isotropic corpus (per-dim variance
    spread 1.3x) a recall LIFT is mathematically unavailable — both
    measure 0.45 — so the test pins equality-or-better plus the
    objective, rather than asserting an improvement the data cannot
    yield."""
    from pyspark.sql import functions as F

    from apache_beam_challange_spark.functions.vector import as_double
    from apache_beam_challange_spark.operators.clustering import (
        opq_allocation_from_keys,
        opq_topk,
        opq_variance_keys,
        pq_topk,
    )
    from apache_beam_challange_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    m, dim = 4, 64
    subs = opq_allocation_from_keys(
        opq_variance_keys(emb).collect(), m=m, dim=dim
    )
    flat = [d for g in subs for d in g]
    assert sorted(flat) == list(range(1, dim + 1))
    assert all(len(g) == dim // m for g in subs)

    comp = emb.select(
        F.posexplode(as_double(F.col("embedding"))).alias("d0", "x")
    ).select(
        (F.col("d0") + 1).alias("d"),
        F.floor(F.col("x") * 10000 + 0.5).cast("long").alias("q"),
    )
    keys = {
        r["d"]: r["n"] * r["s2"] - r["s1"] * r["s1"]
        for r in comp.groupBy("d")
        .agg(
            F.sum("q").alias("s1"),
            F.sum(F.col("q") * F.col("q")).alias("s2"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    energies = [sum(keys[d] for d in g) for g in subs]
    assert max(energies) - min(energies) <= max(keys.values())

    exact = {r["vec_id"] for r in cosine_topk(emb, 0, k=20).collect()}
    pq = {r["vec_id"] for r in pq_topk(emb, 0, k_results=20).collect()}
    opq = {
        r["vec_id"]
        for r in opq_topk(emb, 0, k_results=20, subs=subs).collect()
    }
    assert len(opq & exact) >= len(pq & exact)

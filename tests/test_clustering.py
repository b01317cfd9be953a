"""K-means Lloyd clustering (operators/clustering.py)."""

from __future__ import annotations

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


def test_kmeans_deterministic(spark):
    rows = [(i % 3, (i * 1.7 % 5.0, (i * i) % 7.0, i / 3.0)) for i in range(20)]
    emb = _emb(spark, rows)
    a = sorted(tuple(r) for r in kmeans_assignments(emb, k=3, n_iter=2).collect())
    b = sorted(tuple(r) for r in kmeans_assignments(emb, k=3, n_iter=2).collect())
    assert a == b
    assert len(a) == 20

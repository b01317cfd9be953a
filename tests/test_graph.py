"""Connected-components dedup clustering (operators/graph.py)."""

from __future__ import annotations

from apache_beam_challange_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _graph(spark, n_vertices, edges):
    v = spark.createDataFrame([(i,) for i in range(n_vertices)], ["doc_id"])
    e = spark.createDataFrame(edges, ["doc_id_1", "doc_id_2"]) if edges else (
        spark.createDataFrame([], "doc_id_1 long, doc_id_2 long")
    )
    return v, e


def test_path_triangle_singleton(spark):
    # 0-1-2-3 path, 4-5-6 triangle, 7 singleton: components {0},{4},{7}
    v, e = _graph(
        spark, 8, [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (4, 6)]
    )
    got = {
        r["node"]: r["component"] for r in connected_components(v, e).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 7}


def test_long_path_converges(spark):
    # a 12-hop path exercises multi-round propagation (diameter >> 1)
    v, e = _graph(spark, 13, [(i, i + 1) for i in range(12)])
    got = connected_components(v, e).collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == 13


def test_edge_direction_irrelevant(spark):
    v, e1 = _graph(spark, 3, [(0, 1), (1, 2)])
    _, e2 = _graph(spark, 3, [(1, 0), (2, 1)])
    assert sorted(connected_components(v, e1).collect()) == sorted(
        connected_components(v, e2).collect()
    )


def test_no_edges_all_singletons(spark):
    v, e = _graph(spark, 4, [])
    got = {r["node"]: r["component"] for r in connected_components(v, e).collect()}
    assert got == {i: i for i in range(4)}


def test_dedup_clusters_keep_flags(spark):
    v, e = _graph(spark, 5, [(0, 1), (1, 2)])
    rows = {r["doc_id"]: r for r in dedup_clusters(v, e).collect()}
    assert rows[0]["keep"] and rows[0]["cluster_size"] == 3
    assert not rows[1]["keep"] and rows[1]["component"] == 0
    assert not rows[2]["keep"] and rows[2]["cluster_size"] == 3
    # singletons keep themselves with size 1
    assert rows[3]["keep"] and rows[3]["cluster_size"] == 1
    assert rows[4]["keep"] and rows[4]["cluster_size"] == 1
    # exactly one kept row per component — the dedup invariant
    kept = [r for r in rows.values() if r["keep"]]
    assert len(kept) == len({r["component"] for r in rows.values()})


def test_random_graphs_match_union_find(spark):
    """Cross-check min-label propagation against an independent pure-Python
    union-find on seeded random graphs."""
    import random

    def uf_components(n, edges):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical label = min node id in the component
        label = {}
        for node in range(n):
            root = find(node)
            label.setdefault(root, min(
                m for m in range(n) if find(m) == root
            ))
        return {node: label[find(node)] for node in range(n)}

    rng = random.Random(42)
    for trial in range(3):
        n = 30
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(5, 25))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        v, e = _graph(spark, n, edges or [(0, 1)])
        got = {
            r["node"]: r["component"]
            for r in connected_components(v, e).collect()
        }
        want = uf_components(n, edges or [(0, 1)])
        assert got == want, f"trial {trial}: {got} != {want}"


def test_lss_matches_propagation_and_union_find(spark):
    """Large-star/small-star must produce identical components to the
    propagation variant on fixed and random graphs — including the
    adversarial long path it exists for."""
    import random

    from apache_beam_challange_spark.operators.graph import (
        connected_components_lss,
    )

    cases = [
        (8, [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (4, 6)]),
        (13, [(i, i + 1) for i in range(12)]),  # long path
        (4, []),
    ]
    rng = random.Random(7)
    for _ in range(2):
        n = 25
        es = [(rng.randrange(n), rng.randrange(n)) for _ in range(15)]
        cases.append((n, [(a, b) for a, b in es if a != b]))
    for n, es in cases:
        v, e = _graph(spark, n, es or [(0, 1)])
        want = sorted(
            tuple(r) for r in connected_components(v, e).collect()
        )
        got = sorted(
            tuple(r) for r in connected_components_lss(v, e).collect()
        )
        assert got == want, (n, es)


def test_high_diameter_raises_propagation_but_lss_converges(spark):
    """The contract behind the twin operators: propagation REFUSES (loud
    RuntimeError, not silent wrong labels) when the diameter exceeds its
    round bound, while star contraction handles the same path graph in
    O(log^2 n) rounds."""
    import pytest as _pytest

    from apache_beam_challange_spark.operators.graph import (
        connected_components_lss,
    )

    n = 60
    v, e = _graph(spark, n, [(i, i + 1) for i in range(n - 1)])
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(v, e, max_iter=5)
    got = connected_components_lss(v, e).collect()
    assert {r["component"] for r in got} == {0} and len(got) == n

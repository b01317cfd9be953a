"""Connected-components dedup clustering (operators/graph.py)."""

from __future__ import annotations

import pytest

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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_skew_stress_power_law_graph(spark):
    """Round-2 verdict ask #8: stress CC at a realistic dedup-graph scale
    with ADVERSARIAL shape — a power-law (Zipf-size star clusters: one
    hot 3000-member hub down to 60 tail clusters, the degree skew a viral
    near-dup cluster produces) PLUS a 5000-node path (diameter far beyond
    propagation's round budget). Built distributed via spark.range — no
    driver-side row lists. Asserts:

    - large-star/small-star converges within its O(log^2 n) round budget
      on ~18k nodes / ~18k edges and labels every cluster/path member with
      the cluster min (exact expected labels, computed analytically);
    - the known LSS risk — intermediate edge growth — is MEASURED and
      bounded: no round's canonical edge set exceeds 2x the initial;
    - min-label propagation handles the power-law clusters in <= 3 rounds
      (diameter 2, skew stresses the groupBy(node) MIN reducer for the
      hub) but RAISES on the path rather than returning wrong labels.
    """
    import pytest
    from pyspark.sql import functions as F

    from apache_beam_challange_spark.operators.graph import (
        _canon_edges,
        _star_round,
        connected_components_lss,
    )

    n_clusters = 60
    # cluster c (1-based): ids in [base(c), base(c) + size(c)), star to min
    sizes = [max(2, 3000 // c) for c in range(1, n_clusters + 1)]
    bases = [0]
    for s in sizes[:-1]:
        bases.append(bases[-1] + s)
    n_cluster_nodes = bases[-1] + sizes[-1]
    path_len = 5000
    n_nodes = n_cluster_nodes + path_len

    cluster_bounds = spark.createDataFrame(
        [(bases[c], bases[c] + sizes[c]) for c in range(n_clusters)],
        "base long, stop long",
    )
    cluster_edges = (
        spark.range(n_cluster_nodes)
        .join(
            F.broadcast(cluster_bounds),
            (F.col("id") > F.col("base")) & (F.col("id") < F.col("stop")),
        )
        .select(F.col("base").alias("doc_id_1"), F.col("id").alias("doc_id_2"))
    )
    path_edges = (
        spark.range(n_cluster_nodes, n_nodes - 1)
        .select(
            F.col("id").alias("doc_id_1"), (F.col("id") + 1).alias("doc_id_2")
        )
    )
    vertices = spark.range(n_nodes).select(F.col("id").alias("doc_id"))

    # --- LSS on the full adversarial graph, measuring edge growth -------
    e = _canon_edges(
        cluster_edges.unionByName(path_edges).select(
            F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b")
        )
    ).localCheckpoint()
    e0 = e.count()
    max_edges, rounds, converged = e0, 0, False
    for _ in range(20):
        rounds += 1
        mid = _star_round(e, large=True).localCheckpoint()
        after = _star_round(mid, large=False).localCheckpoint()
        max_edges = max(max_edges, mid.count(), after.count())
        unchanged = after.count() == e.count() and after.exceptAll(e).isEmpty()
        e = after
        if unchanged:
            converged = True
            break
    assert converged, f"LSS did not converge in 20 rounds (n={n_nodes})"
    assert rounds <= 15, rounds
    assert max_edges <= 2 * e0, (max_edges, e0)

    # final labels from the converged star set, checked exactly
    labels = {
        r["node"]: r["component"]
        for r in connected_components_lss(
            vertices, cluster_edges.unionByName(path_edges)
        ).collect()
    }
    for c in range(n_clusters):
        for node in (bases[c], bases[c] + sizes[c] - 1):
            assert labels[node] == bases[c]
    assert labels[n_nodes - 1] == n_cluster_nodes
    assert labels[n_cluster_nodes] == n_cluster_nodes

    # --- propagation: fine on skewed shallow clusters, raises on path ---
    prop = {
        r["node"]: r["component"]
        for r in connected_components(
            vertices.filter(F.col("doc_id") < n_cluster_nodes),
            cluster_edges,
            max_iter=3,
        ).collect()
    }
    assert prop[bases[-1] + sizes[-1] - 1] == bases[-1]
    assert prop[1] == 0 and prop[sizes[0] - 1] == 0
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            vertices, cluster_edges.unionByName(path_edges), max_iter=10
        )


def _pagerank_reference(pairs, n_iter=3, scale=1_000_000):
    """Pure-Python twin of pagerank_int's exact integer trajectory."""
    from collections import defaultdict

    adj = defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    deg = {n: len(v) for n, v in adj.items()}
    r = {n: scale for n in adj}
    teleport = (15 * scale) // 100
    for _ in range(n_iter):
        acc = defaultdict(int)
        for n, nbrs in adj.items():
            c = r[n] // deg[n]
            for m in nbrs:
                acc[m] += c
        r = {n: teleport + (85 * acc[n]) // 100 for n in adj}
    return r


def test_pagerank_int_exact_star_plus_edge(spark):
    """Star (0-1,0-2,0-3) plus a pendant pair (4-5): ranks must equal the
    pure-Python integer trajectory BIT-EXACTLY, center must dominate its
    leaves, and the disconnected pair stays symmetric."""
    from apache_beam_challange_spark.operators.graph import pagerank_int

    pairs = [(0, 1), (0, 2), (0, 3), (4, 5)]
    edges = spark.createDataFrame(pairs, ["doc_id_1", "doc_id_2"])
    got = {
        r["node"]: r["rank_int"]
        for r in pagerank_int(edges, n_iter=3).collect()
    }
    assert got == _pagerank_reference(pairs)
    assert got[0] > got[1] == got[2] == got[3]
    assert got[4] == got[5]


def test_pagerank_int_mass_bounds(spark):
    """On a cycle every node keeps exactly `scale` mass (regular graph
    fixpoint, floor-exact: contrib = scale, r' = 150000 + 850000)."""
    from apache_beam_challange_spark.operators.graph import pagerank_int

    n = 6
    pairs = [(i, (i + 1) % n) for i in range(n)]
    edges = spark.createDataFrame(pairs, ["doc_id_1", "doc_id_2"])
    got = {
        r["node"]: r["rank_int"]
        for r in pagerank_int(edges, n_iter=4).collect()
    }
    assert set(got.values()) == {1_000_000}


# --- label propagation -------------------------------------------------------


def _uv_edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "u long, v long")


def _python_lpa(pairs, rounds):
    """Reference synchronous LPA: neighbor-majority, tie -> smallest."""
    import collections

    adj = collections.defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n in adj:
            counts = collections.Counter(labels[m] for m in adj[n])
            nxt[n] = min(
                counts, key=lambda lb: (-counts[lb], lb)
            )
        labels = nxt
    return labels


def test_lpa_two_cliques_separate_communities(spark):
    """Two 4-cliques joined by one bridge edge: CC fuses them into one
    component, but LPA's neighbor-majority keeps two communities — the
    property that makes it the density-seeking member of the family."""
    from apache_beam_challange_spark.operators.graph import label_propagation

    k4a = [(u, v) for u in (1, 2, 3, 4) for v in (1, 2, 3, 4) if u < v]
    k4b = [(u, v) for u in (5, 6, 7, 8) for v in (5, 6, 7, 8) if u < v]
    pairs = k4a + k4b + [(4, 5)]
    got = {
        r.node: r.community
        for r in label_propagation(_uv_edges(spark, pairs), rounds=4).collect()
    }
    assert got == _python_lpa(pairs, 4)
    # one label per clique, and the two cliques differ
    assert len({got[n] for n in (1, 2, 3)}) == 1
    assert len({got[n] for n in (6, 7, 8)}) == 1
    assert got[1] != got[8]


def test_lpa_matches_python_reference_on_random_graph(spark):
    """Full-trajectory equality on a deterministic pseudo-random graph
    (including oscillation-prone structures — synchronous LPA runs a
    FIXED round count, so both implementations must agree exactly)."""
    from apache_beam_challange_spark.operators.graph import label_propagation

    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for i in range(120)
            for a, b in [((i * i * 7) % 30, (i * 13 + 5) % 30)]
            if a != b
        }
    )
    for rounds in (1, 3, 4):
        got = {
            r.node: r.community
            for r in label_propagation(
                _uv_edges(spark, pairs), rounds=rounds
            ).collect()
        }
        assert got == _python_lpa(pairs, rounds), rounds


@pytest.mark.slow
def test_two_phase_matches_lss_and_cuts_rounds(spark):
    """VERDICT r7 #4 pin: two-phase CC (local per-cell union-find, then
    LSS only on the contracted boundary graph) must (a) return the exact
    components of raw LSS on random spatially-celled graphs, and (b) run
    STRICTLY FEWER star rounds than raw LSS on a grid-shaped graph — the
    round cost that made station_dbscan the slowest bench query."""
    import random

    import apache_beam_challange_spark.operators.graph as g

    def with_cells(spark, n, edges, cell_of):
        v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
        e = spark.createDataFrame(edges, ["u", "v"])
        c = spark.createDataFrame(
            [(i, cell_of(i)) for i in range(n)], ["node", "cell"]
        )
        return v, e, c

    # (a) equality on random graphs under an arbitrary cell partition
    rng = random.Random(11)
    for trial in range(3):
        n = 30
        es = [
            (a, b)
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(25)
            )
            if a != b
        ] or [(0, 1)]
        v, e, c = with_cells(spark, n, es, lambda i: f"c{i % 5}")
        want = sorted(
            tuple(r)
            for r in g.connected_components_lss(
                v, e, id_col="id", src_col="u", dst_col="v"
            ).collect()
        )
        got = sorted(
            tuple(r)
            for r in g.connected_components_two_phase(
                v, e, c, id_col="id", src_col="u", dst_col="v"
            ).collect()
        )
        assert got == want, (trial, es)

    # (b) round reduction on a 2D grid graph (the station layout shape):
    # cells of 4x4 blocks contract locally; the boundary graph is tiny
    side = 12
    n = side * side
    es = []
    for y in range(side):
        for x in range(side):
            i = y * side + x
            if x + 1 < side:
                es.append((i, i + 1))
            if y + 1 < side:
                es.append((i, i + side))
    orig = g._star_round
    counts = {}
    for name, fn in (
        (
            "raw",
            lambda v, e, c: g.connected_components_lss(
                v, e, id_col="id", src_col="u", dst_col="v"
            ),
        ),
        ("two_phase", g.connected_components_two_phase),
    ):
        calls = [0]

        def counting(edges, large, canon=True):
            calls[0] += 1
            return orig(edges, large, canon=canon)

        g._star_round = counting
        try:
            v, e, c = with_cells(
                spark,
                n,
                es,
                lambda i: f"{(i // side) // 4}:{(i % side) // 4}",
            )
            out = sorted(tuple(r) for r in fn(v, e, c).collect())
            counts[name] = calls[0]
        finally:
            g._star_round = orig
        # one fully connected grid -> every node labeled 0
        assert out == [(i, 0) for i in range(n)]
    assert counts["two_phase"] < counts["raw"], counts

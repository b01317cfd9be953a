"""Graph operators for dedup clustering (SURVEY.md §2.9 extension surface).

A near-duplicate pipeline does not end at candidate pairs: the pair list is
an undirected similarity *graph*, and the unit of deduplication is its
connected component — every doc transitively linked to a cluster keeps one
canonical representative. This module supplies that final stage as an
iterative DataFrame algorithm (the one genuinely non-relational step in the
corpus-dedup chain).

Scale posture (100 TB):

- **Min-label propagation**: each iteration is one equi-join (labels onto
  the symmetrized edge list, keyed by neighbor) plus one groupBy(node) MIN —
  both plain hash-shuffles on the node id, so every iteration partitions and
  combines map-side like any other aggregation. No step ever materializes a
  component's member list on one executor.
- **Convergence**: label propagation converges in O(graph diameter)
  iterations. Near-dup similarity graphs are dense small clusters (docs
  that all share shingles collide in the same LSH bands), so the diameter
  is tiny — 2-3 hops in practice. For adversarially long path graphs the
  alternating large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14) drops the bound to
  O(log^2 n) rounds; propagation is the better constant-factor choice for
  the dedup workload and keeps the plan two shuffles per round.
- **Lineage**: each iteration's result is ``localCheckpoint``-ed — an
  iterative loop otherwise compounds the logical plan until analysis cost
  dominates. On a real cluster with a fault-tolerance requirement, swap in
  ``df.checkpoint()`` against a reliable checkpoint dir; ``localCheckpoint``
  is the right call in a single-app context where executor loss restarts
  the job anyway.
- **Driver involvement**: one scalar ``count`` per iteration to detect the
  fixpoint — an O(1) result of a distributed aggregation, not a collect of
  data. This is exactly how GraphX/GraphFrames iterate.

Reference parity: the reference engine has no graph stage (its dedup story
stops at pairwise comparison); this is part of the beyond-reference LLM
data-pipeline surface the build brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_id_1",
    dst_col: str = "doc_id_2",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by min-label propagation.

    Returns ``(node, component)`` with one row per vertex, where
    ``component`` is the smallest vertex id reachable from ``node``
    (singletons map to themselves). Deterministic by construction — the
    fixpoint of ``label(v) = min(label(v), min over neighbors)`` is unique —
    so the output is oracle-hashable.

    ``max_iter`` bounds the loop defensively; the fixpoint test exits as
    soon as an iteration changes no label (propagation strictly decreases
    labels, so "no label decreased" IS convergence). If the bound is hit
    before the fixpoint, the result would be silently wrong (labels only
    propagated ``max_iter`` hops), so a RuntimeError points at the
    O(log^2 n) twin :func:`connected_components_lss` instead.
    """
    # Materialize the symmetrized edge list ONCE — the loop joins it every
    # iteration, and without this the upstream plan that produced the edges
    # (e.g. the whole shingle->MinHash->LSH chain) would re-execute per round.
    sym = (
        edges.select(F.col(src_col).alias("node"), F.col(dst_col).alias("nbr"))
        .unionByName(
            edges.select(F.col(dst_col).alias("node"), F.col(src_col).alias("nbr"))
        )
        .localCheckpoint()
    )
    labels = vertices.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("component")
    ).localCheckpoint(eager=False)

    # r13 (guide §1.2 step 2 — one action per round instead of three):
    # the change test rode a label-vs-label join + count on top of the
    # eager checkpoint job. Propagation labels are MONOTONE — the node
    # set only grows (relay endpoints absent from `vertices` accrue via
    # the neighbor union, never disappear) and each node's label only
    # decreases — so the pair (row count, exact sum of labels) is a
    # complete change detector: a new node strictly raises the count, a
    # label drop strictly lowers the sum, and nothing else can move
    # either. The sum is DECIMAL(38,0) (ids reach 16^15 — a BIGINT sum
    # could wrap and alias two different states). One aggregate per
    # round materializes the now-lazy checkpoint AND reads the fixpoint.
    def _sig(df: DataFrame) -> tuple[int, object]:
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s"),
        ).collect()[0]
        return r["n"], r["s"]

    def _propagate(lbl: DataFrame) -> DataFrame:
        nbr_labels = sym.join(
            lbl.select(F.col("node").alias("nbr"), F.col("component")),
            "nbr",
        ).select("node", "component")
        return (
            lbl.unionByName(nbr_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )

    prev_sig = _sig(labels)
    # Two propagation steps per unit (r13 round-unrolling): monotonicity
    # makes the unit-level (count, sum) test exact across both steps, a
    # converged graph just replays one idempotent step, and the action +
    # checkpoint count halves. Same fixpoint, same output.
    for _ in range(max_iter // 2 + 1):
        new_labels = _propagate(_propagate(labels)).localCheckpoint(
            eager=False
        )
        sig = _sig(new_labels)
        changed = 0 if sig == prev_sig else 1
        prev_sig = sig
        labels = new_labels
        if changed == 0:
            # Edge endpoints absent from `vertices` act as relay nodes
            # during propagation (rows for them accrue via the neighbor
            # union) but are NOT part of the output contract — the LSS
            # twin never emits them, and cluster sizes would overcount.
            # Constrain the result to the declared vertex set (found by
            # review: the two variants disagreed on phantom endpoints).
            return labels.join(
                vertices.select(F.col(id_col).alias("node")),
                "node",
                "left_semi",
            )
    raise RuntimeError(
        "connected_components did not converge in "
        f"{2 * (max_iter // 2 + 1)} propagation steps "
        f"(max_iter={max_iter}, 2-step units) — the graph diameter "
        "exceeds the bound; use connected_components_lss "
        "(O(log^2 n) rounds) for high-diameter graphs"
    )


def _canon_edges(df: DataFrame) -> DataFrame:
    """Undirected canonical form: (a < b), no self-loops, distinct."""
    return (
        df.select(
            F.least(F.col("a"), F.col("b")).alias("a"),
            F.greatest(F.col("a"), F.col("b")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _star_round(edges: DataFrame, large: bool, canon: bool = True) -> DataFrame:
    """One large-star or small-star operation (Kiveris et al., SoCC'14):
    every node u computes m = min(N(u) ∪ {u}) and re-links neighbors —
    strictly larger ones (large-star) or smaller-or-equal plus itself
    (small-star) — directly to m.

    ``canon=False`` skips the output canonicalization (least/greatest +
    self-loop filter + distinct) for outputs that feed DIRECTLY into
    another star round (r13, guide §2.4): the next round symmetrizes and
    takes a min, so edge orientation, duplicate edges and self-loops are
    all inert there — only an output consumed for set-equality tests or
    final labeling needs the canonical distinct form."""
    sym = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
    )
    j = sym.join(mins, "u")
    if large:
        out = j.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("a"), F.col("m").alias("b")
        )
    else:
        out = j.filter(F.col("v") < F.col("u")).select(
            F.col("v").alias("a"), F.col("m").alias("b")
        ).unionByName(
            mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
        )
    return _canon_edges(out) if canon else out


def connected_components_lss(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_id_1",
    dst_col: str = "doc_id_2",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by alternating large-star/small-star (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    the adversarial-diameter twin of :func:`connected_components`:
    propagation needs O(diameter) rounds (fine for dense near-dup
    clusters, hopeless for a million-node path), star contraction
    converges in O(log^2 n) rounds on ANY graph shape. Each round is two
    groupBy-min + join passes over the edge set, which *shrinks* toward
    one star per component. Same output contract as the propagation
    variant: ``(node, component)``, component = min node id.
    """
    e = _canon_edges(
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    ).localCheckpoint()
    converged = False
    # r13: carry the previous round's count instead of re-counting the
    # checkpointed frame every round (one fewer action per round; the
    # set-equality semantics of the convergence check are unchanged)
    prev_n = e.count()
    # r13 (guide §2.4): the mid-composite canonicalization is skipped
    # (canon=False — the small-star's symmetrize+min absorbs orientation,
    # duplicate edges and self-loops, so only the composite's OUTPUT,
    # which feeds the equality test and the final labeling, needs the
    # canonical distinct form: one exchange fewer per round), and the
    # round checkpoint is lazy — the convergence count materializes it,
    # one action per round instead of two. (A 2-composite unroll per
    # action was measured and REJECTED: the 9-exchange single-action
    # plan made AQE replan the whole deep tree at every exchange
    # materialization — two_phase 9 s → 17-30 s.)
    for _ in range(max_iter):
        after = _star_round(
            _star_round(e, large=True, canon=False), large=False
        ).localCheckpoint(eager=False)
        n = after.count()
        unchanged = n == prev_n and after.exceptAll(e).isEmpty()
        e = after
        prev_n = n
        if unchanged:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_lss did not converge in {max_iter} rounds"
        )
    sym = e.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        e.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    nbr_min = sym.groupBy("node").agg(F.min("nbr").alias("mn"))
    base = vertices.select(F.col(id_col).alias("node"))
    return base.join(nbr_min, "node", "left").select(
        "node",
        F.least(F.coalesce(F.col("mn"), F.col("node")), F.col("node")).alias(
            "component"
        ),
    )


def dedup_clusters(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_id_1",
    dst_col: str = "doc_id_2",
) -> DataFrame:
    """Cluster-level dedup verdict per document: ``(doc_id, component,
    cluster_size, keep)`` where ``component`` is the canonical (minimum)
    doc id of the connected near-dup cluster, ``cluster_size`` its member
    count, and ``keep`` marks the one canonical representative — the row a
    dedup pass retains. Singletons keep themselves."""
    comp = connected_components(
        vertices, edges, id_col=id_col, src_col=src_col, dst_col=dst_col
    )
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias(id_col),
            "component",
            "cluster_size",
            (F.col("node") == F.col("component")).alias("keep"),
        )
    )


def pagerank_int(
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = 1_000_000,
    src_col: str = "doc_id_1",
    dst_col: str = "doc_id_2",
) -> DataFrame:
    """PageRank over an undirected pair graph in EXACT integer arithmetic.

    Ranks live in fixed-point units of ``1/scale`` and every update is
    BIGINT: ``contrib = r DIV deg`` (floor division) per edge,
    ``r' = (15*scale) DIV 100 + (85 * sum(contrib)) DIV 100``. Floor
    division makes the whole trajectory bit-reproducible on any engine
    (the same guarantee :func:`~apache_beam_challange_spark.operators.
    clustering.kmeans_centroids` gets from fixed-point sums), so an
    unrolled SQL twin hashes identically — no float summation-order wobble
    compounding across iterations.

    Each iteration is one equi-join (ranks onto the edge list) plus one
    groupBy(dst) SUM — two hash shuffles on the node id, the same scale
    shape as :func:`connected_components`. Nodes are the pair-graph
    members only (isolated docs have no rank mass to exchange; callers
    union them back at teleport mass if needed). Returns
    ``(node, rank_int)``, steady-state mass ≈ scale per node.

    The damping split (85/100) and teleport (15/100) are the standard
    Brin-Page constants as exact rationals.
    """
    sym = edges.select(
        F.col(src_col).alias("node"), F.col(dst_col).alias("nbr")
    ).unionByName(
        edges.select(
            F.col(dst_col).alias("node"), F.col(src_col).alias("nbr")
        )
    )
    # the edge list feeds every iteration's join — materialize it once
    # (lazily; see lsh_candidate_pairs for the executor-loss caveat)
    sym = sym.localCheckpoint(eager=False)
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select("node", F.lit(scale).cast("long").alias("r"))
    teleport = (15 * scale) // 100
    for _ in range(n_iter):
        acc = (
            sym.join(ranks.join(deg, "node"), "node")
            .select(
                F.col("nbr").alias("node"),
                F.expr("r DIV deg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("acc"))
        )
        ranks = deg.select("node").join(acc, "node", "left").select(
            "node",
            (
                F.lit(teleport).cast("long")
                + F.expr("(85 * coalesce(acc, 0)) DIV 100")
            ).alias("r"),
        )
    return ranks.select("node", F.col("r").alias("rank_int"))


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Triangle count + global clustering coefficient via the
    degree-ordered node-iterator (Schank & Wagner '05).

    ``edges`` carries one undirected edge per row in columns (u, v) with
    u < v and no duplicates. Every edge is oriented from its
    (degree, id)-smaller endpoint, wedges join at the common source, and
    each wedge closes against the oriented edge set — so every triangle
    is counted exactly once, from its lowest-degree corner, and each
    source's out-degree is O(sqrt(m)) on any graph (the arboricity
    bound). All equi-joins + two aggregates; nothing quadratic in nodes.

    Returns one row: n_nodes, n_edges, n_triangles, n_wedges,
    clustering_coeff (= 3*triangles / wedges, exact integers inside one
    rounded division).
    """
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    e = edges.join(
        deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u"
    ).join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dst_d"),
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    wedge_lt = (F.col("e1.dst_d") < F.col("e2.dst_d")) | (
        (F.col("e1.dst_d") == F.col("e2.dst_d"))
        & (F.col("e1.dst") < F.col("e2.dst"))
    )
    tri = (
        e1.join(e2, (F.col("e2.src") == F.col("e1.src")) & wedge_lt)
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.dst"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    wed = deg.agg(
        F.coalesce(F.sum(F.expr("d * (d - 1) div 2")), F.lit(0))
        .cast("long")
        .alias("n_wedges")
    )
    counts = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges")).crossJoin(
        deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    return (
        counts.crossJoin(tri)
        .crossJoin(wed)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.round(
                F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
                    3.0 * F.col("n_triangles") / F.col("n_wedges")
                ),
                6,
            ).alias("clustering_coeff"),
        )
    )


def k_core(edges: DataFrame, k: int = 2, max_iter: int = 40) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop nodes
    with degree < k (and their edges) until the fixpoint; what survives
    is the k-core. ``edges`` carries (u, v) with u < v, no duplicates.

    Scale shape: each round is one degree aggregation + one semi-join
    filter on both endpoints — two shuffles per round, the same
    per-iteration cost class as ``connected_components``; the driver
    reads ONE scalar (surviving-edge count) per round for the
    convergence test. Peeling strictly shrinks the edge set, so "no edge
    removed" IS the fixpoint. Raises at ``max_iter`` instead of
    returning a half-peeled graph (the CC discipline: loud, not wrong) —
    the bound also lets the unrolled-CTE oracle replay the identical
    trajectory.

    Returns (node, core_degree): the k-core members with their degree
    INSIDE the core."""
    cur = edges.select("u", "v").localCheckpoint(eager=False)
    prev_n = cur.count()
    for _ in range(max_iter):
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("node")
        nxt = (
            cur.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        n = nxt.count()
        if n == prev_n:
            core = nxt
            break
        cur, prev_n = nxt, n
    else:
        raise RuntimeError(f"k_core: no fixpoint within {max_iter} rounds")
    return (
        core.select(F.col("u").alias("node"))
        .unionAll(core.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


def label_propagation(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan et
    al.): every node starts as its own label; each round, every node
    adopts the most frequent label among its NEIGHBORS, ties broken by
    the smallest label — fully deterministic, unlike the classic
    random-order asynchronous LPA (determinism is what lets an oracle
    replay the trajectory and two engines agree). ``edges`` carries
    (u, v) with u < v, no duplicates.

    Runs EXACTLY ``rounds`` rounds: synchronous LPA can 2-cycle on
    bipartite-ish structures, so "converged" is not well-defined — a
    fixed round count is both the standard remedy and what makes the
    result reproducible (the k-means/PageRank bounded-iteration
    discipline). Communities denser than their surroundings (duplicate
    cliques) absorb their members within 1-2 rounds; the bridge
    structure between them keeps oscillating labels localized.

    Scale shape: each round is one neighbor-label expansion (two
    equi-joins on the static edge list), one (node, label) count, and
    one per-node argmax window — all hash-partitioned on node, no
    driver reads at all. Labels are checkpointed per round so round r+1
    starts from materialized labels, not a growing lineage.

    Returns (node, community)."""
    e = edges.select("u", "v").localCheckpoint(eager=False)
    labels = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), "label")
    for _ in range(rounds):
        nb = (
            e.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "label")
            .unionAll(
                e.join(labels.withColumnRenamed("node", "u"), "u").select(
                    F.col("v").alias("node"), "label"
                )
            )
        )
        labels = (
            nb.groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("label").alias("community"))


def adamic_adar(edges: DataFrame, max_degree: int | None = None) -> DataFrame:
    """Adamic-Adar link prediction over an undirected graph: for every
    non-adjacent pair (u, v) with at least one common neighbor, the score
    ``sum over common neighbors z of 1 / ln(deg(z))`` (Adamic & Adar 2003;
    Liben-Nowell & Kleinberg 2003 — public literature). ``edges`` carries
    (u, v) with u < v, no duplicates.

    Shape: degree aggregation, symmetric adjacency with deg(z) attached,
    wedge self-equi-join on the center z (the triangle-counting join
    class — never pair x pair), score aggregation, and an anti-join
    against the existing edges so only PREDICTED links remain. A wedge
    center needs >= 2 neighbors, so deg(z) >= 2 and ln(deg) is never 0.

    Scale: wedge count is sum over z of C(deg(z), 2) — quadratic in hub
    degree, the same exposure triangle counting bounds by degree
    orientation. Here orientation cannot apply (both wedge endpoints are
    outputs, not a count), so the guard is ``max_degree``: hub centers
    above the cap are EXCLUDED (with 1/ln(d) their per-wedge weight is
    already the smallest) — the standard bounded-AA trade, off by
    default so small graphs stay exact.

    Returns (u, v, n_common, aa_score): u < v, not an existing edge.
    """
    # NOTE: the edge list feeds ~7 plan branches (deg x2, adj x2 then
    # self-joined, and the final anti-join); callers whose edge input is
    # expensive should materialize it BEFORE passing it in (the
    # registered query does) — the operator itself stays policy-free so
    # cheap or already-cached inputs pay nothing
    e = edges.select("u", "v")
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    if max_degree is not None:
        deg = deg.filter(F.col("d") <= max_degree)
    adj = (
        e.select(F.col("u").alias("z"), F.col("v").alias("n"))
        .unionAll(e.select(F.col("v").alias("z"), F.col("u").alias("n")))
        .join(deg.withColumnRenamed("node", "z"), "z")
    )
    a, b = adj.alias("a"), adj.alias("b")
    wedges = a.join(
        b, (F.col("a.z") == F.col("b.z")) & (F.col("a.n") < F.col("b.n"))
    ).select(
        F.col("a.n").alias("u"), F.col("b.n").alias("v"), F.col("a.d").alias("dz")
    )
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum(F.lit(1.0) / F.log(F.col("dz").cast("double"))).alias("aa_score"),
    )
    return scored.join(e, ["u", "v"], "left_anti")


def connected_components_two_phase(
    vertices: DataFrame,
    edges: DataFrame,
    cells: DataFrame,
    id_col: str = "id",
    src_col: str = "u",
    dst_col: str = "v",
    max_iter: int = 20,
) -> DataFrame:
    """Two-phase connected components for SPATIALLY PARTITIONED graphs
    (VERDICT r7 #4): phase 1 contracts each cell's intra-cell subgraph
    LOCALLY (one ``applyInPandas`` union-find per cell — no iteration,
    no shuffle rounds; a cell's population is bounded by geometric
    density, never by corpus size), phase 2 runs large-star/small-star
    only on the CONTRACTED boundary graph (one node per local cluster,
    one edge per cross-cell adjacency) — orders of magnitude fewer
    nodes/edges per round, and far fewer rounds, than LSS on the raw
    geometric graph whose round count grows with the layout.

    ``cells`` maps every vertex to EXACTLY ONE cell ``(node, cell)``;
    intra-cell edges (both endpoints in one cell) contract locally,
    cross-cell edges survive into phase 2. The local label is the MIN
    node id of the local cluster, so composing phase-2 components (min
    label) reproduces the global min-node-id contract of
    :func:`connected_components_lss` exactly — test-asserted equal on
    the same graph."""
    import pandas as pd

    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).filter(F.col("a") != F.col("b"))
    ca = cells.select(F.col("node").alias("a"), F.col("cell").alias("cell_a"))
    cb = cells.select(F.col("node").alias("b"), F.col("cell").alias("cell_b"))
    ec = e.join(ca, "a").join(cb, "b")
    intra = ec.filter(F.col("cell_a") == F.col("cell_b")).select(
        F.col("cell_a").alias("cell"), "a", "b"
    )

    def _uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.setdefault(r, r) != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(pdf["a"], pdf["b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                # union by MIN so the root is the local min node id
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        return pd.DataFrame(
            {"node": list(parent), "lbl": [find(n) for n in parent]}
        )

    local = intra.groupBy("cell").applyInPandas(_uf, "node long, lbl long")
    labels = (
        vertices.select(F.col(id_col).alias("node"))
        .join(local, "node", "left")
        .select("node", F.coalesce("lbl", "node").alias("lbl"))
        .localCheckpoint()
    )
    la = labels.select(F.col("node").alias("a"), F.col("lbl").alias("la"))
    lb = labels.select(F.col("node").alias("b"), F.col("lbl").alias("lb"))
    contracted = (
        ec.filter(F.col("cell_a") != F.col("cell_b"))
        .select("a", "b")
        .join(la, "a")
        .join(lb, "b")
        .select(F.col("la").alias("u"), F.col("lb").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    comp_l = connected_components_lss(
        labels.select("lbl").distinct(),
        contracted,
        id_col="lbl",
        src_col="u",
        dst_col="v",
        max_iter=max_iter,
    )
    return labels.join(
        comp_l.select(F.col("node").alias("lbl"), "component"), "lbl"
    ).select("node", "component")

"""Round-6 filtering family: Gopher quality rules, DSIR importance
weights, maximal duplicate-span islands, Adamic-Adar link prediction.

The oracle gate verifies exact values against DuckDB; these tests pin
the semantic invariants (closed-form AA scores on known graphs, a
Python-reference DSIR recompute, island/coverage arithmetic, rule
accounting) and the plan shapes the 100 TB posture depends on.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from apache_beam_challange_spark.operators.graph import adamic_adar

QS = entrymod.all_queries()


# --- adamic_adar on known graphs --------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame([(u, v) for u, v in pairs], "u long, v long")


def _aa(spark, pairs, **kw):
    rows = adamic_adar(_edges(spark, pairs), **kw).collect()
    return {(r.u, r.v): (r.n_common, r.aa_score) for r in rows}


def test_aa_path_predicts_endpoints(spark):
    got = _aa(spark, [(1, 2), (2, 3)])
    assert set(got) == {(1, 3)}
    n_common, score = got[(1, 3)]
    assert n_common == 1
    assert score == pytest.approx(1.0 / math.log(2.0))


def test_aa_square_predicts_both_diagonals(spark):
    got = _aa(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    assert set(got) == {(1, 3), (2, 4)}
    for pair in ((1, 3), (2, 4)):
        n_common, score = got[pair]
        assert n_common == 2
        assert score == pytest.approx(2.0 / math.log(2.0))


def test_aa_triangle_predicts_nothing(spark):
    """Every wedge of a clique closes — no missing links to predict."""
    assert _aa(spark, [(1, 2), (1, 3), (2, 3)]) == {}


def test_aa_existing_edges_never_predicted(spark):
    """A wedge whose endpoints are already adjacent must be anti-joined
    away even when OTHER wedges also support it."""
    # 1-2-3 path plus the closing edge 1-3 plus a pendant 4 at node 2
    got = _aa(spark, [(1, 2), (2, 3), (1, 3), (2, 4)])
    assert (1, 3) not in got
    # pendant wedges at node 2: (1,4) and (3,4), deg(2)=3
    assert got[(1, 4)] == (1, pytest.approx(1.0 / math.log(3.0)))
    assert got[(3, 4)] == (1, pytest.approx(1.0 / math.log(3.0)))


def test_aa_hub_degree_cap_drops_hub_wedges(spark):
    """With max_degree below the hub's degree, the hub stops being a wedge
    center — the bounded-AA trade documented on the operator."""
    star = [(1, 2), (1, 3), (1, 4), (1, 5)]
    assert len(_aa(spark, star)) == 6  # C(4,2) spoke pairs
    assert _aa(spark, star, max_degree=3) == {}


def test_aa_query_rows_nonvacuous(spark, sf_dir):
    """The registered query must produce predictions at the smallest SF —
    an empty prediction set verifies nothing (the reason the LSH
    near-dup graph was rejected as the substrate)."""
    rows = QS["adamic_adar_link_prediction"](spark, sf_dir).collect()
    assert len(rows) >= 1
    scores = [r.aa_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # predicted links are disjoint from the radius-pair edge list
    edges = {
        (r.id_1, r.id_2)
        for r in QS["stations_within_radius_pairs"](spark, sf_dir).collect()
    }
    assert all((r.id_1, r.id_2) not in edges for r in rows)


# --- duplicate_span_islands -------------------------------------------------


def test_islands_consistent_with_span_flags(spark, sf_dir):
    """Same dup-detection core as duplicate_ngram_spans: the affected-doc
    sets must agree, and island arithmetic must be internally sound."""
    islands = {r.doc_id: r for r in QS["duplicate_span_islands"](spark, sf_dir).collect()}
    flagged = {r.doc_id for r in QS["duplicate_ngram_spans"](spark, sf_dir).collect()}
    assert set(islands) == flagged
    for r in islands.values():
        assert 1 <= r.n_islands
        assert 8 <= r.max_island_tokens <= r.covered_tokens <= r.n_tokens
        # each island covers >= one full 8-gram
        assert r.covered_tokens >= 8 * r.n_islands
        assert r.dup_coverage == pytest.approx(
            round(r.covered_tokens / r.n_tokens, 6)
        )


def test_islands_merge_touching_spans(spark):
    """Gaps-and-islands arithmetic on a crafted position set: positions
    whose 8-token spans overlap or touch merge into one island."""
    from apache_beam_challange_spark.plans.filtering import _SPAN_N

    assert _SPAN_N == 8
    # spans at p=1 (covers 1-8), p=9 (9-16, touching -> same island),
    # p=30 (30-37, gap -> new island), p=31 (overlaps -> same island)
    from pyspark.sql import Window

    pos = spark.createDataFrame(
        [(1, p) for p in (1, 9, 30, 31)], "doc_id long, p long"
    )
    w_prev = (
        Window.partitionBy("doc_id").orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("p") + 7).over(w_prev)
    flagged = pos.select(
        "doc_id",
        "p",
        F.when(prev_end.isNull() | (F.col("p") > prev_end + 1), 1).otherwise(0).alias("ni"),
    )
    w_run = (
        Window.partitionBy("doc_id").orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = (
        flagged.select("doc_id", "p", F.sum("ni").over(w_run).alias("island"))
        .groupBy("doc_id", "island")
        .agg(F.min("p").alias("s"), F.max(F.col("p") + 7).alias("e"))
        .orderBy("s")
        .collect()
    )
    assert [(r.s, r.e) for r in spans] == [(1, 16), (30, 38)]


# --- gopher_quality_flags ---------------------------------------------------


def test_gopher_accounting_is_complete(spark, sf_dir):
    rows = QS["gopher_quality_flags"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        # a kept doc fails nothing; failures can overlap so the sum of
        # per-rule counts bounds but need not equal n_docs - n_keep
        assert 0 <= r.n_keep <= r.n_docs
        assert (
            r.n_docs - r.n_keep
            <= r.n_fail_short + r.n_fail_long + r.n_fail_word_len + r.n_fail_stop
        )
        assert r.keep_rate == pytest.approx(round(r.n_keep / r.n_docs, 6))


def test_gopher_rules_discriminate(spark, sf_dir):
    """A filter that never fires verifies nothing: across the corpus, at
    least one rule must fail somewhere AND some docs must survive."""
    rows = QS["gopher_quality_flags"](spark, sf_dir).collect()
    assert sum(r.n_keep for r in rows) > 0
    assert sum(r.n_docs - r.n_keep for r in rows) > 0


# --- dsir_importance_weights ------------------------------------------------


def test_dsir_matches_python_reference(spark, sf_dir):
    """Recompute one returned document's weight from raw text with
    hashlib/math only — pins the bucket hash, the add-1 smoothing and
    the log-ratio arithmetic end to end."""
    from apache_beam_challange_spark.plans.filtering import (
        _DSIR_BUCKETS,
        _DSIR_TARGET_SOURCES,
    )

    got = QS["dsir_importance_weights"](spark, sf_dir).collect()
    assert len(got) > 0
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()

    def buckets(text):
        toks = text.split(" ")
        for i in range(len(toks) - 1):
            g = f"{toks[i]} {toks[i + 1]}"
            yield int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % _DSIR_BUCKETS

    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for d in docs:
        mine = per_doc.setdefault(d.doc_id, {})
        for f in buckets(d.text):
            raw[f] = raw.get(f, 0) + 1
            mine[f] = mine.get(f, 0) + 1
            if d.source in _DSIR_TARGET_SOURCES:
                tgt[f] = tgt.get(f, 0) + 1
    total_raw, total_tgt = sum(raw.values()), sum(tgt.values())

    top = got[0]
    expect = sum(
        c
        * (
            math.log((tgt.get(f, 0) + 1.0) / (total_tgt + _DSIR_BUCKETS))
            - math.log((raw[f] + 1.0) / (total_raw + _DSIR_BUCKETS))
        )
        for f, c in per_doc[top.doc_id].items()
    )
    assert top.dsir_weight == pytest.approx(round(expect, 6), abs=2e-6)
    assert top.n_bigrams == sum(per_doc[top.doc_id].values())
    # and the list is the global argmax, not just sorted
    best = max(
        per_doc,
        key=lambda did: (
            sum(
                c
                * (
                    math.log((tgt.get(f, 0) + 1.0) / (total_tgt + _DSIR_BUCKETS))
                    - math.log((raw[f] + 1.0) / (total_raw + _DSIR_BUCKETS))
                )
                for f, c in per_doc[did].items()
            ),
            -did,
        ),
    )
    assert top.doc_id == best


# --- plan shapes ------------------------------------------------------------




def test_gopher_is_single_scan_no_join(plans):
    """One corpus scan, one two-phase aggregate — no joins at all."""
    p = plans("gopher_quality_flags")
    assert p.count("FileScan parquet") == 1
    assert "Join" not in p
    assert "partial_count" in p or "partial_sum" in p


def test_dsir_joins_stay_bucket_sized(plans):
    """The corpus never joins anything wider than the 128-row bucket
    dimension: no doc x doc shapes, and the only nested-loop/cartesian
    is the 1-row totals cross-join (scalar-aggregate pattern)."""
    p = plans("dsir_importance_weights")
    assert "CartesianProduct" not in p
    # the totals cross-join is a 1-row broadcast NLJ; any OTHER NLJ is a bug
    assert p.count("BroadcastNestedLoopJoin") <= 2
    assert "SortMergeJoin" not in p


def test_islands_windows_are_per_doc(plans):
    """Both stacked windows must partition by doc_id — a global window
    here would serialize the corpus through one task."""
    p = plans("duplicate_span_islands")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    for line in p.splitlines():
        if "Window " in line or line.strip().startswith("Window"):
            assert "doc_id" in line


def test_aa_wedge_join_is_equi(plans):
    """Wedge generation and the edge anti-join must be equi-joins — never
    a pair x pair product."""
    p = plans("adamic_adar_link_prediction")
    assert "CartesianProduct" not in p


# --- containment_dup_pairs --------------------------------------------------


def test_containment_detects_subset_doc(spark):
    """A short doc fully inside a long one: containment 1.0 while Jaccard
    is low — the asymmetric case the symmetric verifier misses."""
    from apache_beam_challange_spark.operators.dedup import (
        containment_on_candidates,
    )

    docs = spark.createDataFrame(
        [
            (1, "x y z w"),
            (2, "x y z w q r s t u v"),
        ],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame([(1, 2)], "doc_id_1 long, doc_id_2 long")
    rows = containment_on_candidates(docs, cand, min_containment=0.8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_inter, r.n1, r.n2, r.containment) == (4, 4, 10, 1.0)
    # the same pair fails a 0.5-Jaccard verify: 4 / (4 + 10 - 4) < 0.5
    from apache_beam_challange_spark.operators.dedup import jaccard_on_candidates

    assert jaccard_on_candidates(docs, cand, min_jaccard=0.5).count() == 0


def test_containment_invariants_on_corpus(spark, sf_dir):
    rows = QS["containment_dup_pairs"](spark, sf_dir).collect()
    assert len(rows) >= 1  # exact dups collide in every band
    for r in rows:
        assert r.n_inter <= min(r.n1, r.n2)
        assert 0.8 <= r.containment <= 1.0
        assert r.containment == pytest.approx(
            round(r.n_inter / min(r.n1, r.n2), 6)
        )


# --- station_dbscan_clusters ------------------------------------------------


def test_dbscan_roles_partition_stations(spark, sf_dir):
    """Every station gets exactly one role; clusters are consistent:
    cores carry their component, borders a neighboring core's cluster,
    noise -1."""
    rows = QS["station_dbscan_clusters"](spark, sf_dir).collect()
    from apache_beam_challange_spark.sources.catalog import stations

    assert len(rows) == stations(spark, sf_dir).count()
    by_role = {}
    for r in rows:
        by_role.setdefault(r.role, []).append(r)
        assert r.role in ("core", "border", "noise")
        if r.role == "noise":
            assert r.cluster == -1
        else:
            assert r.cluster >= 0
    # cluster labels are core ids (min-label CC over cores)
    core_ids = {r.id for r in by_role.get("core", [])}
    for r in by_role.get("core", []) + by_role.get("border", []):
        assert r.cluster in core_ids


def test_dbscan_matches_python_reference(spark, sf_dir):
    """Recompute DBSCAN from the radius edge list in Python: same cores,
    same cluster partition (up to the deterministic min-label), same
    border attachment."""
    edges = [
        (r.id_1, r.id_2)
        for r in QS["stations_within_radius_pairs"](spark, sf_dir).collect()
    ]
    got = {r.id: (r.role, r.cluster) for r in QS["station_dbscan_clusters"](spark, sf_dir).collect()}
    from collections import defaultdict

    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    core = {n for n, s in nbrs.items() if len(s) >= 2}
    # min-label CC over the core-core subgraph
    label = {n: n for n in core}
    changed = True
    while changed:
        changed = False
        for u in core:
            for v in nbrs[u] & core:
                m = min(label[u], label[v])
                if label[u] != m or label[v] != m:
                    label[u] = label[v] = m
                    changed = True
    for sid, (role, cluster) in got.items():
        if sid in core:
            assert role == "core" and cluster == label[sid]
        elif sid in nbrs and nbrs[sid] & core:
            assert role == "border"
            assert cluster == min(label[c] for c in nbrs[sid] & core)
        else:
            assert role == "noise" and cluster == -1


# --- cluster_canonical_docs -------------------------------------------------


def test_canonical_beats_min_id_policy(spark, sf_dir):
    """The quality-elected canonical must be a member of the same CC
    cluster the min-id policy reports, with maximal quality among its
    members (tie -> smallest doc_id)."""
    cc = {}
    for r in QS["dedup_connected_components"](spark, sf_dir).collect():
        cc.setdefault(r.component, []).append(r.doc_id)
    quality = {
        r.doc_id: r.quality
        for r in QS["quality_scores_top"](spark, sf_dir).limit(10**9).collect()
    }
    got = {r.component: r for r in QS["cluster_canonical_docs"](spark, sf_dir).collect()}
    multi = {c: m for c, m in cc.items() if len(m) >= 2}
    assert set(got) == set(multi)
    for comp, r in got.items():
        members = multi[comp]
        assert r.canonical_doc_id in members
        assert r.cluster_size == len(members)
        assert r.n_dropped == len(members) - 1
        # maximal quality among members that HAVE a quality row (top-100
        # truncation of the quality query may omit some members)
        if r.canonical_doc_id in quality:
            for m in members:
                if m in quality:
                    assert (
                        quality[r.canonical_doc_id],
                        -r.canonical_doc_id,
                    ) >= (quality[m], -m)


# --- short-document crash guards (review-found) -----------------------------


def test_short_docs_produce_no_spans_and_no_crash(spark, tmp_path):
    """Docs shorter than the 8-gram window (and single-token docs for the
    bigram explode) must contribute NOTHING — not crash: Spark's
    sequence(1, 0) is descending [1, 0], so without the pre-filter
    slice()/element_at() throw. Review-found, fixed with load-bearing
    pre-filters in duplicate_span_islands / duplicate_ngram_spans /
    dsir_importance_weights."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "one", "en", "src0", 3),
            (2, "a b", "en", "src1", 3),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "en", "src0", 26),
            (4, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "de", "src5", 26),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    # islands: the two identical 9-token docs share every 8-gram; the
    # 1- and 2-token docs must be silently absent
    islands = QS["duplicate_span_islands"](spark, sf).collect()
    assert {r.doc_id for r in islands} == {3, 4}
    for r in islands:
        assert (r.n_islands, r.covered_tokens, r.n_tokens) == (1, 9, 9)
    spans = QS["duplicate_ngram_spans"](spark, sf).collect()
    assert {r.doc_id for r in spans} == {3, 4}
    # DSIR: the single-token doc contributes no bigrams; every other doc
    # scores
    weights = QS["dsir_importance_weights"](spark, sf).collect()
    assert {r.doc_id for r in weights} == {2, 3, 4}

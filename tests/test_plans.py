"""Plan-quality regression tests: the physical plans the 100 TB design
depends on, asserted from explain output so a refactor can't silently
degrade them (SURVEY.md §4).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod




def test_dim_join_broadcasts(plans):
    """Fact-dim equi-join must broadcast the dim — never sort-merge."""
    p = plans("join_broadcast_revenue")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_all_pairs_is_broadcast_nlj(plans):
    """The reference's single-worker cross-join funnel must be a broadcast
    nested-loop join here."""
    p = plans("q3_station_distances")
    assert "BroadcastNestedLoopJoin" in p
    assert "Exchange hashpartitioning" not in p


def test_topk_uses_take_ordered(plans):
    """Top-k must be partial-topk + merge (TakeOrderedAndProject), not a
    global sort."""
    p = plans("events_group_topk")
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p.replace("TakeOrderedAndProject", "")


def test_aggregation_is_two_phase(plans):
    """Counts/sums must map-side combine before the shuffle."""
    p = plans("pricing_summary")
    assert "partial_sum" in p and "partial_count" in p


def test_filter_reaches_scan(plans):
    """The shipdate predicate must be pushed into the parquet scan."""
    p = plans("pricing_summary")
    scan_lines = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert any("l_shipdate" in l and "DataFilters: [" in l for l in scan_lines)


def test_column_pruning(plans):
    """A 2-column aggregation must not read the wide columns (props)."""
    p = plans("events_group_topk")
    scan_lines = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert scan_lines and all("props" not in l for l in scan_lines)


def test_cosine_topk_has_no_shuffle(plans):
    """Brute-force similarity must be scan + broadcast + TakeOrdered —
    zero hash exchanges."""
    p = plans("cosine_topk_vec0")
    assert "Exchange hashpartitioning" not in p
    assert "TakeOrderedAndProject" in p


def test_semi_join_stays_semi(plans):
    p = plans("join_semi_active_customers")
    assert "LeftSemi" in p


def test_whole_stage_codegen_active(plans):
    """Narrow chains must compile into whole-stage codegen spans."""
    p = plans("project_filter_nulls")
    assert "*(1)" in p  # codegen stage marker


def test_jaccard_on_lsh_has_no_cartesian(plans):
    """The LSH-gated exact Jaccard must stay equi-join shaped end to end:
    band-bucket join + two doc_id joins — never a CartesianProduct or
    nested-loop over document pairs."""
    p = plans("jaccard_on_lsh_candidates")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_lsh_signature_subtree_computed_once(plans):
    """The shingle→md5→min-aggregate signature subtree must execute ONCE:
    the banded signatures are localCheckpoint-ed before the self-join, so
    the final plan reads the materialized bands (ExistingRDD) on both join
    sides and contains NO md5 recomputation — previously the full
    signature aggregation appeared once per side (round-2 verdict,
    'What's wrong' #3)."""
    p = plans("jaccard_on_lsh_candidates")
    assert "md5" not in p
    assert "ExistingRDD" in p
    p2 = plans("minhash_candidate_pairs")
    assert "md5" not in p2
    assert "ExistingRDD" in p2


def test_bmp_decode_is_narrow(plans):
    """Codec round-trip must be scan -> mapInPandas chains with no
    shuffle: each executor encodes/decodes its own partitions."""
    p = plans("multimodal_decode_bmp")
    assert "Exchange hashpartitioning" not in p
    assert "ArrowEvalPython" in p or "MapInPandas" in p or "FlatMapInPandas" in p


def test_geodesic_parity_is_broadcast_nlj(plans):
    """The geodesic pair expansion keeps the q3 shape (broadcast NLJ over
    the station dim) with the pandas UDF evaluated post-join."""
    p = plans("q3_station_distances_geodesic")
    assert "BroadcastNestedLoopJoin" in p
    assert "Exchange hashpartitioning" not in p


def test_hypertable_serves_closed_hours_from_rollup(plans):
    """The continuous aggregate must union a rollup-parquet scan with the
    live-tail aggregation — i.e. two FileScans, one of them the
    materialized hourly table, and the raw-events scan filtered by the
    cutoff."""
    p = plans("hypertable_rollup_hourly")
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 2
    assert any("hypertable_hourly" in l for l in scans)


def test_tfidf_corpus_size_is_broadcast(plans):
    """TF-IDF joins the corpus-size scalar via broadcast — no shuffle of
    the big side for a 1-row dimension, and no driver-side count()."""
    p = plans("tfidf_top_terms")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p


def test_pmi_dim_joins_broadcast(plans):
    """PMI's df/N lookups must broadcast; the only shuffle joins are the
    per-doc pair join keyed on doc_id."""
    p = plans("token_cooccurrence_pmi")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_kmeans_assignment_broadcasts_codebook(plans):
    """K-means assignment must stream the vector table against a broadcast
    k-row codebook — the big side is never shuffled for the cross join."""
    p = plans("kmeans_embedding_clusters")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_rolling_frame_single_window_shuffle(plans):
    """The rolling frame aggregate is one hash-partitioned window — no
    extra exchanges beyond the per-customer partitioning."""
    p = plans("window_rolling_order_totals")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Window" in p


def test_funnel_is_two_phase_no_join(plans):
    """The ordered funnel must be aggregation-only — conditional MINs then
    a global fold, never self-joins per stage."""
    p = plans("event_funnel_counts")
    assert "Join" not in p
    assert "partial_min" in p


def test_retention_cohort_join_broadcasts(plans):
    """The per-user cohort side must broadcast into the activity join."""
    p = plans("user_retention_cohorts")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_multitable_lsh_plan_shape(plans):
    """The servable multitable LSH must stay band-join shaped: candidates
    from an equi-join (broadcast of the query's 16-bucket list), never a
    CartesianProduct over vectors; final top-k via TakeOrderedAndProject;
    and the bucket pipeline must be the codegen'd join+agg shape (a
    BroadcastHashJoin against the plane matrix), not per-row interpreted
    folds."""
    p = plans("ann_lsh_multitable_topk_vec0")
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p


def test_ivfpq_refined_indexed_prunes_and_reranks(plans):
    """The served IVFPQ+refine must read the codes table with dynamic
    partition pruning (probes into the partition column) and end in a
    TakeOrderedAndProject rerank — no full-corpus float scan shape
    (CartesianProduct) anywhere."""
    p = plans("ivfpq_refined_topk_indexed_vec0")
    assert "dynamicpruning" in p.lower()
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_duplicate_spans_never_doc_by_doc(plans):
    """Span dedup is fingerprint-join shaped: one explode, hash
    aggregations, an equi-join on the fingerprint — never a doc x doc
    join."""
    p = plans("duplicate_ngram_spans")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q6_filters_all_reach_scan(plans):
    """TPC-H Q6 shape: all four predicates in the parquet scan's
    DataFilters, and no shuffle at all (partial agg folds map-side into
    the single-row result)."""
    p = plans("q6_forecast_revenue")
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan.split("DataFilters")[1], col
    assert "Exchange hashpartitioning" not in p


def test_sessionize_single_shuffle(plans):
    """Gaps-and-islands sessionization: the lag window, the running sum,
    and the session aggregation must all reuse ONE user_id
    hash-partitioning."""
    p = plans("batch_sessionize_events")
    exchanges = [
        l for l in p.splitlines()
        if "Exchange hashpartitioning" in l and "Reused" not in l
    ]
    assert len(exchanges) == 1, exchanges


def test_latest_snapshot_single_shuffle(plans):
    """Latest-record-per-key compaction: one key shuffle, nothing else."""
    p = plans("latest_event_per_user")
    exchanges = [
        l for l in p.splitlines()
        if "Exchange hashpartitioning" in l and "Reused" not in l
    ]
    assert len(exchanges) == 1, exchanges


def test_bloom_membership_broadcasts_sketch(plans):
    """The Bloom bitset and the member dim must broadcast into the probe
    side; no sort-merge join anywhere; the four counts come from ONE
    aggregation (no per-count re-execution of the probe subtree)."""
    p = plans("bloom_membership_orders")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # one final single-partition aggregate, not four cross-joined ones
    assert p.count("Exchange SinglePartition") == 1


def test_anti_join_builds_filtered_side(plans):
    """NOT EXISTS must compile to a (broadcast) anti join with the
    priority filter pushed into the orders scan — never a full-orders
    build."""
    p = plans("customers_without_urgent_orders")
    assert "LeftAnti" in p
    scan = [l for l in p.splitlines() if "FileScan parquet" in l and "o_orderpriority" in l]
    assert scan, "priority filter must reach the orders scan"
    assert "SortMergeJoin" not in p


def test_bm25_postings_filtered_before_joins(plans):
    """BM25 must be posting-list shaped: the query-term IN-filter applies
    before the tf aggregation (cost tracks query postings), stats/df join
    in as broadcasts, and nothing degenerates to a cartesian."""
    p = plans("bm25_top_docs")
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p
    assert p.count("BroadcastExchange") >= 2  # qdf + stats scalars


def test_rrf_fuses_two_topk_lists(plans):
    """RRF fuses two ALREADY-CUT top-depth lists: each arm is bounded by
    its own top-k (TakeOrderedAndProject) BEFORE the full-outer fusion
    join, so the join touches 2*depth rows regardless of corpus size (a
    full-outer join cannot broadcast — SMJ over two 50-row lists is the
    right plan, same rationale as q4's zero-fill join)."""
    p = plans("hybrid_rrf_vec0")
    assert p.count("TakeOrderedAndProject") >= 2  # both arms + final cut
    assert "CartesianProduct" not in p


def test_fuzzy_join_is_blocked_equi_join(plans):
    """The fuzzy join must be an equi-join on the blocking key with the
    Levenshtein predicate as a post-join filter — never a full cross
    product over names."""
    p = plans("fuzzy_part_name_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "levenshtein" in p


def test_unigram_vocab_join_broadcasts(plans):
    """The vocabulary aggregate must be EXPLICITLY broadcast into the token
    join (VERDICT r4): relying on AQE holds at test scale but a web-scale
    vocab over the threshold would fall back to sort-merge on ``token`` —
    the most skewed key in the corpus."""
    p = plans("unigram_surprise_docs")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_fuzzy_join_block_cap_enforced(spark):
    """A hot block larger than the cap must be EXCLUDED from matching (the
    record-linkage stop-word-block rule), while small blocks still match —
    the quadratic bound is enforced, not assumed."""
    from pyspark.sql import functions as F

    from apache_beam_challange_spark.plans.curation import blocked_fuzzy_pairs

    hot = spark.range(50).select(
        F.concat(F.lit("name"), F.col("id").cast("string"), F.lit(" ltd")).alias(
            "p_name"
        )
    )
    small = spark.createDataFrame(
        [("alpha co",), ("alphb co",)], ["p_name"]
    )
    out = blocked_fuzzy_pairs(hot.unionByName(small), cap=10).collect()
    # the 50-name "ltd" block is over the cap: none of its ~1225 candidate
    # pairs may appear; the 2-name "co" block is under it and matches
    assert {(r["name_1"], r["name_2"]) for r in out} == {("alpha co", "alphb co")}
    assert out[0]["edit_dist"] == 1


def test_contamination_benchmark_side_broadcasts(plans):
    """Decontamination must broadcast the (small) benchmark n-gram set
    into the corpus n-gram stream — the corpus side shuffles only for its
    per-doc aggregations, never for the membership join."""
    p = plans("benchmark_contamination_topk")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_curation_funnel_is_two_shuffles(plans):
    """The end-to-end funnel (dedup window -> quality gate -> per-lang
    accounting) must fuse into exactly two hash shuffles — fingerprint
    window + language aggregation — not one per stage."""
    p = plans("curation_funnel_by_lang")
    assert p.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p


# --- round-6 shapes (VERDICT r5 #5): post-b11ce1f queries -------------------


def test_cdc_chunking_is_narrow_until_chunk_rows(plans):
    """Content-defined chunking must compute chunk boundaries INSIDE the
    task that read the document — one narrow mapInPandas over the scan,
    ZERO Exchange between them (round 5 shipped a 16x char-row shuffle
    here; VERDICT r5 'What's wrong' #1). Only emitted chunk rows may
    shuffle, for the global distinct-hash stats."""
    p = plans("cdc_chunk_dedup_stats")
    assert "MapInPandas" in p
    # tree prints children below their parent: everything after the last
    # MapInPandas line is its scan-side subtree
    below = p[p.rindex("MapInPandas"):]
    assert "Exchange" not in below
    assert "FileScan parquet" in below
    # the char-explosion closed form must be gone from the Spark side
    assert "posexplode" not in p


def test_radius_join_is_cell_equi_join(plans):
    """The geo radius join must equi-join on integer grid cells with the
    haversine predicate as a residual — never a theta/cartesian join over
    station pairs. (The 9-row neighbor-offset crossJoin on the build side
    is a constant-size dimension, not a pair enumeration.)"""
    p = plans("stations_within_radius_pairs")
    assert "CartesianProduct" not in p
    # the pair join itself is hash on the (ny, nx) cell key
    assert "BroadcastHashJoin [ny" in p or "SortMergeJoin [ny" in p


def test_mmr_distributed_stages_bounded_by_topk(spark, sf_dir):
    """MMR's only corpus-scale stage is the top-k recall cut; the pairwise
    cosine cross join must have BOTH sides descend from that cut, so it is
    k x k by construction — a corpus-sized side showing up here would be
    the classic all-pairs regression."""
    from apache_beam_challange_spark.plans.traindata import mmr_candidate_sims

    cand, sims = mmr_candidate_sims(spark, sf_dir, k_cand=50)
    pc = cand._jdf.queryExecution().executedPlan().toString()
    ps = sims._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject(limit=50" in pc
    # both cross sides are the candidate set: the top-k cut appears on
    # each side of the (bounded) nested-loop block
    assert ps.count("TakeOrderedAndProject(limit=50") >= 2


def test_cdc_snapshot_single_shuffle_with_group_limit(plans):
    """The CDC snapshot (latest-change-wins + tombstones) must be ONE
    key-partitioned shuffle with the rank-1 cut pushed below it
    (WindowGroupLimit partial before the Exchange) — per-partition
    pre-pruning, not a full sort of the changelog."""
    p = plans("cdc_snapshot_with_deletes")
    assert p.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in p


def test_covisit_pmi_is_blocked_self_join(plans):
    """Session co-visitation PMI must pair event types WITHIN a session
    key (equi self-join on (user, session)) — never a cartesian across
    sessions; marginals join back on the type keys."""
    p = plans("session_covisit_pmi")
    assert "CartesianProduct" not in p


def test_grid_density_two_phase_agg(plans):
    """Grid density is hash aggregation on integer cells — partial
    (map-side) combine before the shuffle — and its only join is the
    broadcast hash join onto the station dim: never a shuffle join or a
    nested-loop."""
    p = plans("station_grid_density")
    assert "partial_count" in p
    assert "SortMergeJoin" not in p
    assert "ShuffledHashJoin" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_bigram_counts_join_not_forced_broadcast(spark, sf_dir):
    """The unigram-count side of the bigram LM join must NOT be a forced
    broadcast (ADVICE r5: word vocabulary grows with the corpus) — the
    logical plan carries no broadcast hint on it; AQE may still CHOOSE
    broadcast at runtime when the vocab is actually small."""
    import __spark_entry__ as entrymod

    qs = entrymod.all_queries()
    df = qs["bigram_surprise_docs"](spark, sf_dir)
    # hints must be read from the ANALYZED plan: the optimizer folds
    # ResolvedHint nodes into the Join (EliminateResolvedHint), so
    # counting them on optimizedPlan() is always 0 — a vacuous guard
    # (found by review). Exactly one forced broadcast may remain: the
    # 1-row vocabulary scalar.
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") <= 1


def test_lateral_join_is_decorrelated(plans):
    """The correlated LATERAL subquery must be DECORRELATED by Catalyst:
    the executed plan is window/limit + one equi-join — never a
    nested-loop re-scan of customer per nation row."""
    p = plans("lateral_top_customers_per_nation")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "WindowGroupLimit" in p or "Window" in p


def test_q17_correlated_scalar_subquery_decorrelated(plans):
    """Q17's per-part correlated AVG must DECORRELATE: lineitem is
    aggregated by partkey ONCE (partial_avg visible → map-side combined)
    and equi-joined back — never a per-outer-row re-scan (no
    nested-loop, no cartesian), the same discipline the LATERAL test
    pins."""
    p = plans("tpch_q17_small_qty_revenue")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "partial_avg" in p


def test_q22_not_exists_is_anti_hash_join(plans):
    """Q22's NOT EXISTS must plan as a LEFT ANTI hash join with the
    priority/date predicates pushed into the orders scan — never a
    nested-loop existence probe."""
    p = plans("tpch_q22_idle_customers")
    assert "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert any(
        "o_orderpriority" in l and "DataFilters" in l for l in scans
    )


def test_skew_report_has_no_global_window(plans):
    """shuffle_skew_report's per-key table grows with the fact table, so
    no single-partition WindowExec may touch it (review): the top-10 is
    TakeOrderedAndProject (per-partition heaps) and the totals are one
    two-phase agg — zero Window operators anywhere in the plan."""
    p = plans("shuffle_skew_report")
    assert "Window" not in p
    assert "TakeOrderedAndProject" in p
    assert "partial_sum" in p


def test_enriched_view_serves_history_from_warehouse(plans):
    """The join-view serving query must union a warehouse scan of the
    pre-enriched layer with the live-tail join: two parquet scan groups,
    one of them the materialized enriched_orders table, and the only
    JOIN in the plan is the tail's broadcast dim join."""
    p = plans("enriched_orders_view_revenue")
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert any("enriched_orders" in l for l in scans)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_q21_double_correlation_is_semi_plus_anti(plans):
    """Q21 stacks an EXISTS and a NOT EXISTS on lineitem, the NOT EXISTS
    correlating through a non-equi predicate on a third table's column
    (o_orderdate). Both must decorrelate to hash joins on l_orderkey
    (LeftSemi + LeftAnti) with the residual predicates as join
    conditions — never a per-row re-scan — and the orderstatus filter
    must reach the orders scan."""
    p = plans("tpch_q21_waiting_suppliers")
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert any("o_orderstatus" in l and "DataFilters" in l for l in scans)


def test_range_frame_is_single_shuffle_rangeframe(plans):
    """The trailing-24h window must plan as a RANGE frame (RangeFrame in
    the window spec — frame bounds from the ORDER-BY value, not row
    offsets) over exactly one user-keyed shuffle."""
    p = plans("range_frame_user_day_totals")
    assert "RangeFrame" in p
    assert p.count("Exchange hashpartitioning") == 1


def test_semdedup_pair_stage_is_cluster_bucketed(plans):
    """SemDeDup's quadratic stage must be BUCKETED by centroid_id — an
    equi-join on the cluster key with the cosine threshold as residual —
    never a global all-pairs product; and the ranked assignment must be
    materialized once (ExistingRDD reuse), not re-derived per consumer."""
    p = plans("semdedup_cluster_prune")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert p.count("ExistingRDD") >= 2


def test_mergeable_topk_merges_summaries_not_rows(plans):
    """The heavy-hitter merge must consume ONLY the S*(K+1)-row summary:
    the serve plan reads the materialized cut (ExistingRDD), never the
    events parquet (zero fact scans), the per-shard rank is
    WindowGroupLimit-pruned inside the summary lineage, and the final
    top-10 is a TakeOrderedAndProject."""
    p = plans("mergeable_topk_user_counts")
    assert "TakeOrderedAndProject" in p
    serve_scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert not serve_scans
    assert p.count("ExistingRDD") >= 2


def test_global_row_ids_no_data_sized_global_window(plans):
    """global_row_ids_orders must number rows via range-shuffle +
    narrow MapInPandas + config-bounded offsets — the only Window sits
    above the per-partition-count aggregate (<= shuffle.partitions
    rows), never above the orders scan. Since the round-8 correctness
    fix, the range shuffle runs EXACTLY ONCE inside the helper's
    localCheckpoint (boundary consistency is a materialization
    guarantee, not an exchange-reuse hope), so the serve plan must
    read the checkpointed RDD in both branches and contain NO range
    exchange of its own."""
    p = plans("global_row_ids_orders")
    assert "MapInPandas" in p
    assert "Exchange rangepartitioning" not in p
    assert p.count("Scan ExistingRDD") == 2  # both branches, one shuffle
    assert "BroadcastHashJoin" in p  # offsets join back as a broadcast
    # the Window's input is the aggregated counts: partial_count proves
    # the agg runs below it (a Window straight over the scan would not)
    assert "partial_count" in p


def test_runtime_bloom_filter_reduces_fact_scan(spark, sf_dir):
    """100 TB posture beyond static pushdown: with a selective dim
    filter and a non-broadcastable join, Spark's runtime Bloom-filter
    injection (spark.sql.optimizer.runtime.bloomFilter.*) must plant a
    might_contain probe on the FACT side — rows that cannot join are
    dropped at the scan, before the shuffle. Pin the capability so a
    Spark upgrade or conf drift that silently loses it fails here."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from pyspark.sql import functions as F2

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
            F2.col("p_name").contains("green")
        )
        j = li.join(p, li.l_partkey == p.p_partkey).groupBy("p_name").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_mips_indexed_prunes_and_reranks(plans):
    """The at-rest MIPS route must probe the augmented-bucket index via
    dynamic partition pruning (the query's 16 bucket ids into the
    partition columns), rerank as a TakeOrderedAndProject, and never
    fall back to a corpus-product shape."""
    p = plans("mips_augmented_lsh_topk_indexed_vec0")
    assert "dynamicpruning" in p.lower()
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_merge_compiles_to_joins_not_cartesian(plans):
    """The MERGE compiler's plan must be the copy-on-write join shape:
    an equi-join on the ON keys (hash/sort-merge), one window for the
    cardinality guard, and no cartesian product anywhere."""
    for name in ("merge_into_cdc_snapshot", "merge_full_sync_snapshot"):
        p = plans(name)
        assert "CartesianProduct" not in p, name
        assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p), name


def test_filtered_ann_is_band_join_plus_takeordered(plans):
    """Filtered vector search keeps the multitable band-join shape — the
    predicate rides the candidate stage, the rerank is a partial-top-k
    merge, and nothing degenerates to an all-pairs scan."""
    p = plans("ann_lsh_filtered_topk_vec0")
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_interval_join_is_equi_join_not_nlj(plans):
    """The binned interval join must plan as an equi-join on
    (user, bucket) — never a nested-loop/cartesian over the theta
    predicate."""
    p = plans("batch_interval_join_binned")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Join" in p


def test_equi_depth_window_runs_on_histogram_not_rows(plans):
    """The quantile-edge window must consume the aggregated histogram
    (post-groupBy), and the raw-row side must join the edges broadcast —
    no data-sized global sort of events."""
    p = plans("equi_depth_value_bins")
    assert "BroadcastHashJoin" in p  # edges broadcast back onto raw rows
    # the window's sort is under the histogram aggregate, so an Exchange
    # hashpartitioning on the histogram key precedes any Sort
    assert "partial_count" in p


def test_q4_exists_is_left_semi(plans):
    """Q4's correlated EXISTS must decorrelate to one LEFT SEMI join."""
    p = plans("tpch_q4_priority_check")
    assert "LeftSemi" in p
    assert p.count("LeftSemi") == 1


def test_q19_part_dim_broadcasts_with_residual_disjunction(plans):
    """Q19 must broadcast the part dim and keep the OR-of-conjuncts as a
    residual filter — no shuffle join for a 2000-row dim."""
    p = plans("tpch_q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_q18_having_is_aggregate_then_semi_join(plans):
    """Q18's IN-subquery must execute as aggregate + LeftSemi, not a
    re-executed subquery."""
    p = plans("tpch_q18_large_volume_customers")
    assert "LeftSemi" in p
    assert "TakeOrderedAndProject" in p


def test_q11_total_is_scalar_broadcast_not_second_scan(plans):
    """Q11's global total must derive from the SAME per-part aggregate
    (broadcast single row), not a second lineitem scan."""
    p = plans("tpch_q11_important_parts")
    scans = [l for l in p.splitlines() if "FileScan parquet" in l and "lineitem" in l]
    assert len(scans) <= 2  # one for the aggregate; reuse/exchange for total
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_q2_min_is_window_not_correlated_requery(plans):
    """Q2's per-part minimum must be one window over the eligible cost
    table — the correlated subquery may not re-aggregate per row."""
    p = plans("tpch_q2_min_cost_supplier")
    assert "Window" in p
    scans = [l for l in p.splitlines() if "FileScan parquet" in l and "lineitem" in l]
    assert len(scans) == 1


def test_pareto_prefix_sum_is_range_partitioned(plans):
    """pareto_abc_parts must compute its cumulative via the distributed
    prefix pattern: range repartition on the sort key, pid-partitioned
    window for the data-sized cumsum, broadcast offsets back — never a
    single-partition global window over the per-part aggregate."""
    p = plans("pareto_abc_parts")
    assert "Exchange rangepartitioning" in p
    assert "BroadcastHashJoin" in p
    assert "partial_sum" in p
    # the data-sized cumsum window must be keyed on the partition id —
    # an unkeyed window over the revenue aggregate would funnel through
    # a SinglePartition exchange directly feeding a Window
    import re

    assert not re.search(r"Exchange SinglePartition[^\n]*\n\s*\+?-?\s*Window", p)


def test_session_window_is_native_merging_sessions(plans):
    """session_window_native must run Spark's built-in session operator
    (MergingSessions after one user-keyed exchange) — no LAG/island
    Window rewrite anywhere in the plan."""
    p = plans("session_window_native")
    assert "MergingSessions" in p
    assert "Window" not in p
    assert p.count("Exchange hashpartitioning") == 1
    assert "partial_count" in p


def test_linreg_is_single_shuffle_exact_moments(plans):
    """The OLS fit must be one map-side-combined moment aggregate: five
    partial_sums/counts before a single hash exchange, closed form as a
    Project on top — no second scan, no join, no window."""
    p = plans("linreg_value_on_hour_by_type")
    assert p.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in p and "partial_count" in p
    assert "Join" not in p and "Window" not in p
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1 and "props" not in scans[0]


def test_skyline_window_runs_on_histogram_not_rows(plans):
    """skyline_parts_price_size must sweep the DOMAIN-bounded cent
    histogram (Window directly over the price aggregate) and probe the
    skyline cents back via broadcast — never the textbook all-pairs the
    oracle states."""
    p = plans("skyline_parts_price_size")
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    # the window's input must be the cent histogram, i.e. an aggregate
    # sits between the scan and the window
    win = p.index("Window")
    assert "HashAggregate" in p[win:]


def test_psi_is_one_pass_conditional_aggregate(plans):
    """The PSI hist must come from ONE map-side-combined conditional
    aggregate over a pruned events scan; no window anywhere (the fold
    is an array expression); spine/total work is row-bounded."""
    p = plans("psi_weekend_drift_by_type")
    assert "partial_sum" in p
    assert "Window" not in p
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 2  # hist scan + the 5-row distinct-type spine seed
    assert all("props" not in l for l in scans)


def test_kfold_total_window_is_fold_bounded(plans):
    """group_kfold_split_audit's only SinglePartition window runs over
    the K-row fold aggregate (post-HashAggregate), and the global-mix
    join broadcasts the tiny type side."""
    p = plans("group_kfold_split_audit")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    import re

    # no SinglePartition exchange directly over a file scan
    assert not re.search(
        r"Exchange SinglePartition[^\n]*\n\s*\+?-?\s*(Project[^\n]*\n\s*\+?-?\s*)?FileScan",
        p,
    )


def test_km_window_runs_on_duration_histogram(plans):
    """km_time_to_purchase's suffix-sum window must sit on the duration
    histogram (aggregate between scan and Window), with the user rollup
    as the only data-sized shuffle and no cartesian anywhere."""
    p = plans("km_time_to_purchase")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    win = p.index("Window")
    assert "HashAggregate" in p[win:]
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1 and all("props" not in l for l in scans)


def test_bootstrap_replicates_are_one_aggregate(plans):
    """The Poisson bootstrap must be: scan x broadcast 16-row replicate
    spine -> ONE map-side-combined (type, rep) aggregate; no cartesian
    of data-sized sides, no window."""
    p = plans("bootstrap_ci_value_by_type")
    assert "partial_sum" in p
    assert "Window" not in p and "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p  # the bounded replicate spine
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1 and all("props" not in l for l in scans)


def test_dq_ri_check_is_broadcast_anti_join(plans):
    """The referential-integrity check must be a broadcast LeftAnti hash
    join (orders anti customer-keys), never sort-merge; all other
    checks are pure conditional aggregates."""
    p = plans("data_quality_expectations")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_window_pack_is_single_shuffle(plans):
    """All six analytic functions must ride ONE user-keyed exchange —
    Spark may split offset (LAG/LEAD) and running (rank-family) frames
    into separate Window operators but must not re-shuffle between
    them."""
    p = plans("window_feature_pack")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Window" in p
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1 and all("props" not in l for l in scans)


def test_markov_backtest_broadcasts_the_model(plans):
    """The 25-row argmax model must broadcast back onto the transition
    stream — the scoring join can never shuffle the data-sized side."""
    p = plans("markov_backtest_accuracy")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_ewma_is_aggregate_then_bounded_fold(plans):
    """The EWMA series work must be one map-side-combined daily
    aggregate; the recurrence is an array fold on <= types x days rows
    — no join, no window over the scan."""
    p = plans("ewma_forecast_backtest")
    assert "partial_sum" in p
    assert "Join" not in p and "Window" not in p
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1 and all("props" not in l for l in scans)


def test_ks_cumulative_runs_on_cent_histogram(plans):
    """The KS cumulative window must sit on the domain-bounded cent
    histogram (aggregate between scan and Window) and the max-gap join
    must broadcast the per-type maxima."""
    p = plans("ks_test_weekend_value")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # the gap table is checkpointed (domain-bounded), so the serve plan
    # reads the materialized RDD on both sides and the events scan ran
    # exactly once, inside the checkpoint job
    assert "FileScan parquet" not in p
    assert p.count("Scan ExistingRDD") == 2


def test_grouping_sets_is_one_expand_pass(plans):
    """All four granularities must come from ONE Expand + aggregate over
    a single joined scan — never a union of per-set scans; dims
    broadcast."""
    p = plans("grouping_sets_revenue")
    assert "Expand" in p
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p and "Union" not in p
    scans = [l for l in p.splitlines() if "FileScan parquet" in l and "orders" in l]
    assert len(scans) == 1

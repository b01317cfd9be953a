"""Round-5 traindata family: sequence packing, PII redaction, LOCF
resampling, triangle counting, SQ8 quantized ANN, BPE pair statistics.

The oracle gate verifies exact values against DuckDB; these tests pin the
*semantic invariants* (packing arithmetic, detector coverage, LOCF carry,
closed-form triangle counts on known graphs, SQ8 recall floor) and the
physical-plan properties the 100 TB posture depends on.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from apache_beam_challange_spark.operators.graph import triangle_stats

QS = entrymod.all_queries()


# --- triangle_stats on known graphs ----------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame([(u, v) for u, v in pairs], "u long, v long")


def _tri_row(spark, pairs):
    return triangle_stats(_edges(spark, pairs)).collect()[0]


def test_triangle_k3(spark):
    r = _tri_row(spark, [(1, 2), (1, 3), (2, 3)])
    assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) == (3, 3, 1, 3)
    assert r.clustering_coeff == 1.0


def test_triangle_path_has_none(spark):
    r = _tri_row(spark, [(1, 2), (2, 3), (3, 4)])
    assert r.n_triangles == 0
    assert r.n_wedges == 2  # one wedge at node 2, one at node 3


def test_triangle_k4(spark):
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    r = _tri_row(spark, k4)
    assert r.n_triangles == 4
    assert r.n_wedges == 4 * 3  # 4 nodes x C(3,2)
    assert r.clustering_coeff == 1.0


def test_triangle_star_zero_coeff(spark):
    r = _tri_row(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
    assert r.n_triangles == 0
    assert r.n_wedges == 6  # C(4,2) at the hub
    assert r.clustering_coeff == 0.0


def test_triangle_two_components(spark):
    # K3 plus a disjoint edge: counts must not bleed across components.
    r = _tri_row(spark, [(1, 2), (1, 3), (2, 3), (10, 11)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (5, 4, 1)


# --- sequence packing -------------------------------------------------------


def test_packing_arithmetic_invariants(spark, sf_dir):
    rows = QS["sequence_packing_by_shard"](spark, sf_dir).collect()
    assert rows
    total_docs = 0
    for r in rows:
        total_docs += r.n_docs
        assert r.n_sequences == math.ceil(r.n_tokens / 256)
        assert r.pad_tokens == r.n_sequences * 256 - r.n_tokens
        assert 0 <= r.pad_tokens < 256
        # a doc can split only if the shard spans >1 sequence
        assert r.n_split_docs <= max(r.n_sequences - 1, 0)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert total_docs == n_docs


def test_packing_single_shuffle(spark, sf_dir):
    """Window and aggregate share the (lang, shard) partitioning — the
    whole packing accounting must be ONE hash shuffle."""
    p = (
        QS["sequence_packing_by_shard"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Exchange hashpartitioning") == 1


# --- PII redaction ----------------------------------------------------------


def test_pii_detectors_cover_every_doc(spark, sf_dir):
    """Each constructed contact tail carries exactly one email, one phone,
    one IPv4 — the detectors must find all of them, and redaction must
    strictly shrink every document."""
    rows = QS["pii_redaction_counts"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_emails == r.n_docs
        assert r.n_phones == r.n_docs
        assert r.n_ips == r.n_docs
        assert r.chars_redacted > 0


def test_pii_regexes_on_handcrafted_text(spark):
    from apache_beam_challange_spark.plans.traindata import (
        _EMAIL_RE,
        _IP_RE,
        _PHONE_RE,
    )

    df = spark.createDataFrame(
        [("reach me at jo.doe+spam@mail.example.org or +1-415-0199 via 192.168.0.1",)],
        "s string",
    )
    got = df.select(
        F.regexp_count("s", F.lit(_EMAIL_RE)).alias("e"),
        F.regexp_count("s", F.lit(_PHONE_RE)).alias("p"),
        F.regexp_count("s", F.lit(_IP_RE)).alias("i"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("s", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
            ),
            _IP_RE,
            "<IP>",
        ).alias("red"),
    ).collect()[0]
    assert (got.e, got.p, got.i) == (1, 1, 1)
    assert got.red == "reach me at <EMAIL> or <PHONE> via <IP>"


# --- LOCF resampling --------------------------------------------------------


def test_locf_dense_spine_and_carry(spark, sf_dir):
    df = QS["resample_locf_hourly"](spark, sf_dir)
    rows = df.collect()
    types = {r.event_type for r in rows}
    hours = sorted({r.hour for r in rows})
    # dense grid: every (type, hour) cell exactly once
    assert len(rows) == len(types) * len(hours)
    span = (hours[-1] - hours[0]).total_seconds() / 3600 + 1
    assert len(hours) == span
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.hour)
        prev = None
        seen_obs = False
        for r in series:
            if r.is_gap == 0:
                seen_obs = True
                assert r.value_locf is not None
            elif seen_obs:
                # gap after first observation: value carried unchanged
                assert r.value_locf == prev
            else:
                # leading gap: honestly NULL
                assert r.value_locf is None
            prev = r.value_locf


# --- SQ8 --------------------------------------------------------------------


def test_sq8_recall_floor(spark, sf_dir):
    exact = {r.vec_id for r in QS["cosine_topk_vec0"](spark, sf_dir).collect()}
    sq8 = {r.vec_id for r in QS["sq8_topk_vec0"](spark, sf_dir).collect()}
    assert len(sq8) == 20
    assert len(exact & sq8) / 20 >= 0.90


def test_sq8_shortlist_is_topk_not_global_sort(spark, sf_dir):
    p = (
        QS["sq8_topk_vec0"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


# --- BPE pair counts --------------------------------------------------------


def test_bpe_pairs_match_manual_count(spark, sf_dir):
    texts = [
        r.text for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    wf: dict = {}
    for t in texts:
        for tok in t.split(" "):
            wf[tok] = wf.get(tok, 0) + 1
    manual: dict = {}
    for tok, f_ in wf.items():
        for i in range(len(tok) - 1):
            p = tok[i : i + 2]
            manual[p] = manual.get(p, 0) + f_
    expect = sorted(manual.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [
        (r.pair, r.n_occurrences)
        for r in QS["bpe_pair_counts"](spark, sf_dir).collect()
    ]
    assert got == expect

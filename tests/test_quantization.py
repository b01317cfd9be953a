"""Round-6 quantized-ANN routes: binary quantization (sign-bit packing +
Hamming shortlist) and Matryoshka prefix-dimension search.

The oracle gate verifies exact ranked values against DuckDB; these tests
pin the bit-packing arithmetic (closed form), the measured recall floors
against the exact twin (the ANN family's honesty discipline — the test
embeddings are synthetic, NOT MRL-trained, so these floors are lower
bounds for real embeddings), and the plan shapes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QS = entrymod.all_queries()

#: measured recall@20 vs cosine_topk_vec0: bq 1.00/0.95/0.85 and
#: matryoshka 0.95/0.90/0.85 at sf0.001/0.01/0.1 — floors pinned below
#: the worst measured value
_BQ_FLOOR = 0.80
_MAT_FLOOR = 0.80


def _recall(name, spark, sf_dir):
    exact = {r.vec_id for r in QS["cosine_topk_vec0"](spark, sf_dir).collect()}
    got = {r.vec_id for r in QS[name](spark, sf_dir).collect()}
    return len(got & exact) / len(exact)


def test_bq_recall_floor(spark, sf_dir):
    assert _recall("bq_topk_vec0", spark, sf_dir) >= _BQ_FLOOR


def test_matryoshka_recall_floor(spark, sf_dir):
    assert _recall("matryoshka_topk_vec0", spark, sf_dir) >= _MAT_FLOOR


def test_sign_bit_packing_closed_form(spark):
    """A crafted vector with known sign pattern must pack to the exact
    integer words: bits set where the component is >= 0."""
    from apache_beam_challange_spark.functions.vector import as_double

    # dims 1,3,5,...,63 positive (odd positions), evens negative:
    # word bits 0,2,4,...,30 set -> 0x55555555 in both words
    v = [(1.0 if i % 2 == 0 else -1.0) for i in range(64)]
    df = spark.createDataFrame([(1, v)], "vec_id long, embedding array<double>")
    vecs = df.select("vec_id", as_double(F.col("embedding")).alias("v"))

    def pack(lo):
        return F.aggregate(
            F.sequence(F.lit(lo), F.lit(lo + 31)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(
                F.element_at("v", i) >= 0,
                F.pow(F.lit(2.0), (i - lo).cast("double")).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )

    r = vecs.select(pack(1).alias("w1"), pack(33).alias("w2")).collect()[0]
    assert r.w1 == 0x55555555
    assert r.w2 == 0x55555555


def test_hamming_identity_and_complement(spark):
    """bit_count(xor) arithmetic: identical words -> 0; complementary
    32-bit words -> 32."""
    r = (
        spark.range(1)
        .select(
            F.bit_count(F.lit(0x55555555).bitwiseXOR(F.lit(0x55555555))).alias("same"),
            F.bit_count(F.lit(0x55555555).bitwiseXOR(F.lit(0xAAAAAAAA))).alias("comp"),
        )
        .collect()[0]
    )
    assert (r.same, r.comp) == (0, 32)


def test_topk_results_are_subset_of_rerank_scores(spark, sf_dir):
    """Ranked output must be sorted by exact cosine and never contain the
    query vector itself."""
    for name in ("bq_topk_vec0", "matryoshka_topk_vec0"):
        rows = QS[name](spark, sf_dir).collect()
        assert len(rows) == 20
        assert all(r.vec_id != 0 for r in rows)
        sims = [r.cosine_sim for r in rows]
        assert sims == sorted(sims, reverse=True)




def test_bq_shortlist_is_take_ordered(plans):
    """The Hamming shortlist must be partial-topk + merge, not a global
    sort, and the query-words side a 1-row broadcast."""
    p = plans("bq_topk_vec0")
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    assert "Exchange hashpartitioning" not in p


def test_matryoshka_prefix_stage_no_shuffle(plans):
    p = plans("matryoshka_topk_vec0")
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    assert "Exchange hashpartitioning" not in p

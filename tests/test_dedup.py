from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_challange_spark.operators.dedup import (
    jaccard_on_candidates,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash64,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_minhash_identical_docs_collide(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(spark, [(1, text, "a"), (2, text, "a"), (3, "completely different words here nothing shared at all whatsoever today", "a")])
    sigs = minhash_signatures(shingles(docs, n=3), num_hashes=8)
    pairs = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in lsh_candidate_pairs(sigs, rows_per_band=2).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_signature_count(spark):
    docs = _docs(spark, [(1, "a b c d e f g h", "s")])
    sigs = minhash_signatures(shingles(docs, n=3), num_hashes=8)
    assert sigs.count() == 8


def test_simhash_deterministic_and_discriminative(spark):
    t1 = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = _docs(
        spark,
        [(1, t1, "a"), (2, t1, "a"),
         (3, "totally unrelated content about database engines and query plans", "a")],
    )
    out = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_simhash_near_duplicates_close(spark):
    t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    t2 = t1.replace("today", "tonight")  # one token changed
    docs = _docs(spark, [(1, t1, "a"), (2, t2, "a")])
    out = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    hamming = bin((out[1] ^ out[2]) & ((1 << 64) - 1)).count("1")
    assert hamming <= 16  # near-dup signatures stay close


def test_jaccard_identical_is_one(spark):
    t = "alpha beta gamma delta epsilon"
    docs = _docs(spark, [(1, t, "s"), (2, t, "s")])
    out = jaccard_pairs(docs, "source").collect()
    assert len(out) == 1 and out[0]["jaccard"] == 1.0


def test_jaccard_blocking_respects_group(spark):
    t = "alpha beta gamma delta epsilon"
    docs = _docs(spark, [(1, t, "s1"), (2, t, "s2")])
    assert jaccard_pairs(docs, "source").count() == 0


def test_jaccard_on_candidates_matches_all_pairs(spark):
    t1 = "the quick brown fox jumps over the lazy dog again and again today"
    t2 = "the quick brown fox jumps over the lazy dog again and again tonight"
    docs = _docs(
        spark,
        [
            (1, t1, "a"),
            (2, t2, "a"),
            (3, "completely different words here nothing shared at all whatsoever now", "a"),
        ],
    )
    sigs = minhash_signatures(shingles(docs, n=3), num_hashes=8)
    cand = lsh_candidate_pairs(sigs, rows_per_band=2)
    gated = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in jaccard_on_candidates(docs, cand, min_jaccard=0.5).collect()
    }
    brute = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in jaccard_pairs(docs, "source", min_jaccard=0.5).collect()
    }
    # every LSH-gated score must equal the brute-force score for that pair
    for pair, j in gated.items():
        assert brute[pair] == j
    assert (1, 2) in gated


def test_jaccard_on_candidates_identical_docs(spark):
    text = "one two three four five six seven eight nine ten eleven twelve"
    docs = _docs(spark, [(1, text, "a"), (2, text, "a")])
    sigs = minhash_signatures(shingles(docs, n=3), num_hashes=8)
    cand = lsh_candidate_pairs(sigs, rows_per_band=2)
    rows = jaccard_on_candidates(docs, cand, min_jaccard=0.5).collect()
    assert len(rows) == 1 and rows[0]["jaccard"] == 1.0


def test_simhash_banding_finds_identical_and_near_docs(spark):
    from apache_beam_challange_spark.operators.dedup import (
        simhash64_md5,
        simhash_candidate_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = _docs(
        spark,
        [
            (1, base, "a"),
            (2, base, "a"),  # identical -> hamming 0
            (3, "completely unrelated vocabulary with zero overlap whatsoever entirely different words", "a"),
        ],
    )
    sigs = simhash64_md5(docs)
    pairs = {
        (r["doc_id_1"], r["doc_id_2"]): r["hamming"]
        for r in simhash_candidate_pairs(sigs, num_bands=4, max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs

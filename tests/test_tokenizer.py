"""Round-6 tokenizer-pipeline family: BPE merge training, vocabulary
coverage curve, RAG overlap chunking, robust (median/MAD) outliers.

The oracle gate verifies exact values against DuckDB; these tests pin the
semantic invariants (BPE trajectory equality vs a textbook python
trainer, coverage monotonicity, chunk coverage arithmetic, injected
outlier detection) and the physical-plan properties the 100 TB posture
depends on (no corpus re-scan in the iterative rounds)."""

from __future__ import annotations

import collections
import tempfile

import __spark_entry__ as entrymod
from apache_beam_challange_spark.plans.tokenizer import (
    BPE_ROUNDS,
    CHUNK_S,
    CHUNK_W,
)

QS = entrymod.all_queries()


# --- BPE merge training ------------------------------------------------------


def _python_bpe(word_freq: dict[str, int], rounds: int):
    """Textbook BPE trainer on a word-frequency dict: per round, count
    weighted adjacent symbol pairs, take the (count DESC, pair asc)
    argmax, apply it greedily left-to-right in every word."""
    states = {tuple(w): f for w, f in word_freq.items()}
    out = []
    for r in range(1, rounds + 1):
        counts: collections.Counter = collections.Counter()
        for syms, f in states.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        (l, rr), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        new_states: dict[tuple, int] = {}
        for syms, f in states.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rr:
                    merged.append(l + rr)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_states[key] = new_states.get(key, 0) + f
        states = new_states
        tokens = sum(len(s) * f for s, f in states.items())
        out.append((r, l, rr, l + rr, n, tokens))
    return out


def test_bpe_train_merges_equals_python_trainer(spark, sf_dir):
    """The relational replace()-based trainer must reproduce the textbook
    sequential trainer's full trajectory — merges, weighted counts, and
    per-round corpus token counts."""
    import duckdb

    wf = duckdb.sql(
        f"""SELECT token, COUNT(*) FROM (
                SELECT unnest(string_split(text, ' ')) AS token
                FROM '{sf_dir}/documents.parquet')
            WHERE token <> '' GROUP BY token"""
    ).fetchall()
    want = _python_bpe(dict(wf), BPE_ROUNDS)
    got = [
        (r.round, r.left_sym, r.right_sym, r.merged, r.pair_count, r.corpus_tokens)
        for r in QS["bpe_train_merges"](spark, sf_dir).collect()
    ]
    assert got == want


def test_bpe_merges_shrink_corpus_monotonically(spark, sf_dir):
    """Each applied merge strictly reduces the corpus token count by
    exactly the number of pair occurrences it merged... NOT exactly:
    overlapping occurrences are skipped by greedy application, so the
    reduction is <= pair_count but always > 0."""
    rows = sorted(
        QS["bpe_train_merges"](spark, sf_dir).collect(), key=lambda r: r.round
    )
    assert [r.round for r in rows] == list(range(1, BPE_ROUNDS + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert cur.corpus_tokens < prev.corpus_tokens
    for r in rows:
        assert r.merged == r.left_sym + r.right_sym
        assert r.pair_count > 0


def test_bpe_plan_has_no_corpus_scan(spark, sf_dir):
    """Every merge round must run on the checkpointed vocab table — the
    returned plan contains NO file scan at all (the one corpus pass
    happened at vocab-build time; iterations never re-read the corpus)."""
    df = QS["bpe_train_merges"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in p and "FileScan" not in p


def test_bpe_encode_matches_python_trainer_states(spark, sf_dir):
    """Per-language token counts after encoding must equal re-encoding
    with the python trainer's final states (the end-use contract: the
    trained vocab IS the tokenizer)."""
    import duckdb

    wf = duckdb.sql(
        f"""SELECT token, COUNT(*) FROM (
                SELECT unnest(string_split(text, ' ')) AS token
                FROM '{sf_dir}/documents.parquet')
            WHERE token <> '' GROUP BY token"""
    ).fetchall()
    states = {tuple(w): f for w, f in wf}
    for _, l, rr, *_ in _python_bpe(dict(wf), BPE_ROUNDS):
        new_states: dict[tuple, int] = {}
        for syms, f in states.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rr:
                    merged.append(l + rr)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_states[tuple(merged)] = new_states.get(tuple(merged), 0) + f
        states = new_states
    tok_len = {"".join(s): len(s) for s in states}
    docs = duckdb.sql(
        f"SELECT lang, doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    want: dict[str, list[int]] = {}
    for lang, doc_id, text in docs:
        words = [w for w in text.split(" ") if w]
        acc = want.setdefault(lang, [set(), 0, 0])
        acc[0].add(doc_id)
        acc[1] += len(words)
        acc[2] += sum(tok_len[w] for w in words)
    for r in QS["bpe_encode_token_counts"](spark, sf_dir).collect():
        docs_set, n_words, n_tokens = want[r.lang]
        assert r.n_docs == len(docs_set)
        assert r.n_words == n_words
        assert r.n_tokens == n_tokens
        assert r.tokens_per_100_words == n_tokens * 100 // n_words


# --- vocabulary coverage -----------------------------------------------------


def test_vocab_rank_window_input_bounded_10k_token_types(spark, sf_dir):
    """The ranking window in vocab_coverage_topk runs over the VOCAB
    aggregate (distinct token types), not corpus tokens — Zipf-small and
    provably bounded here (≤10k types for the synthetic corpus), so the
    single-partition row_number window is safe at any corpus scale. If
    this fires, the vocabulary stopped being post-aggregation-small and
    the ranking needs TakeOrderedAndProject-style capping first."""
    import duckdb

    n_types = duckdb.sql(
        f"""SELECT COUNT(DISTINCT token) FROM (
                SELECT unnest(string_split(text, ' ')) AS token
                FROM '{sf_dir}/documents.parquet')
            WHERE token <> ''"""
    ).fetchone()[0]
    assert n_types <= 10_000


def test_robust_outlier_window_input_bounded_8784_hours(spark, sf_dir):
    """robust_outlier_hours' median/MAD percentiles aggregate the
    (event_type, hour) table whose cardinality is CALENDAR HOURS × event
    types — bounded (≤8784 hours/leap-year per type), not fact-row-
    driven, so the broadcast median/MAD sides stay tiny at any event
    volume. If this fires, the hourly domain grew and the broadcast
    hints need revisiting."""
    import duckdb

    n_hours, n_types = duckdb.sql(
        f"""SELECT COUNT(DISTINCT date_trunc('hour', ts)),
                   COUNT(DISTINCT event_type)
            FROM '{sf_dir}/events.parquet'"""
    ).fetchone()
    assert n_hours <= 8784
    assert n_types <= 50


def test_vocab_coverage_curve_invariants(spark, sf_dir):
    """Coverage is monotone in k, bounded by the total, and the ppm is
    the exact floor — checked against a pandas recount of the corpus."""
    rows = sorted(QS["vocab_coverage_topk"](spark, sf_dir).collect())
    assert [r.k for r in rows] == [10, 100, 1000]
    import duckdb

    freqs = sorted(
        (
            -n, t
        )
        for t, n in duckdb.sql(
            f"""SELECT token, COUNT(*) FROM (
                    SELECT unnest(string_split(text, ' ')) AS token
                    FROM '{sf_dir}/documents.parquet')
                WHERE token <> '' GROUP BY token"""
        ).fetchall()
    )
    total = sum(-n for n, _ in freqs)
    prev_cov = 0
    for r in rows:
        want_cov = sum(-n for n, _ in freqs[: r.k])
        assert r.covered_tokens == want_cov
        assert r.total_tokens == total
        assert r.coverage_ppm == want_cov * 1000000 // total
        assert r.covered_tokens >= prev_cov
        prev_cov = r.covered_tokens


# --- RAG overlap chunking ----------------------------------------------------


def test_chunk_overlap_counts_and_dedup(spark, sf_dir):
    """Per-language chunk counts equal sum(ceil(len/S)) and the distinct
    count equals a pandas set of the actual chunk texts."""
    import duckdb

    docs = duckdb.sql(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    want: dict[str, list] = {}
    for lang, text in docs:
        n = (len(text) + CHUNK_S - 1) // CHUNK_S
        chunks = [text[i * CHUNK_S : i * CHUNK_S + CHUNK_W] for i in range(n)]
        acc = want.setdefault(lang, [0, set()])
        acc[0] += len(chunks)
        acc[1].update(chunks)
    for r in QS["chunk_overlap_dedup"](spark, sf_dir).collect():
        n_chunks, distinct = want[r.lang]
        assert r.n_chunks == n_chunks
        assert r.n_distinct == len(distinct)
        assert r.dup_ppm == (n_chunks - len(distinct)) * 1000000 // n_chunks


def test_chunk_windows_cover_every_char():
    """W >= S guarantees every character index lands in at least one
    chunk window (the RAG no-gap property the constants must keep)."""
    assert CHUNK_W >= CHUNK_S
    for length in (1, CHUNK_S, CHUNK_S + 1, 3 * CHUNK_S - 1, 577):
        n = (length + CHUNK_S - 1) // CHUNK_S
        covered = set()
        for i in range(n):
            covered.update(range(i * CHUNK_S, min(i * CHUNK_S + CHUNK_W, length)))
        assert covered == set(range(length))


# --- robust (median/MAD) outliers -------------------------------------------


def _write_events(spark, d, data):
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")


def test_robust_outliers_flag_injected_spike_not_clean_series(spark):
    """A flat series yields no outliers; one injected 100x hour is the
    single flagged row — and the median/MAD screen is NOT dragged by the
    outlier itself (the property that breaks mean/stddev z-scores)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    flat = [
        (i, base + dt.timedelta(hours=i), 1, "view", 10.0 + (i % 3), "{}")
        for i in range(24)
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, flat)
        assert QS["robust_outlier_hours"](spark, d).count() == 0
        spiked = flat + [
            (100 + j, base + dt.timedelta(hours=5), 1, "view", 500.0, "{}")
            for j in range(3)
        ]
        _write_events(spark, d, spiked)
        out = QS["robust_outlier_hours"](spark, d).collect()
    assert len(out) == 1
    assert out[0].hour == base + dt.timedelta(hours=5)
    assert out[0].dev4 > 3 * out[0].mad4


def test_robust_outliers_plan_single_fact_scan(spark, sf_dir):
    """The median, the deviation join, and the MAD must all run on the
    checkpointed hourly aggregate: the returned plan reads no file at
    all (one fact scan happened at aggregate-build time)."""
    df = QS["robust_outlier_hours"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in p and "FileScan" not in p
    assert "BroadcastHashJoin" in p


def test_chunk_overlap_empty_text_yields_zero_chunks(spark, tmp_path):
    """An empty document must contribute ZERO chunks — Spark's
    sequence(0, -1) DESCENDS to [0, -1] (two phantom chunks) where
    DuckDB's generate_series(0, -1) is empty, so the guard is explicit
    (found by review). Non-empty docs still chunk normally."""
    df = spark.createDataFrame(
        [(1, "", "en", "s", 0), (2, "x" * (CHUNK_S + 1), "en", "s", CHUNK_S + 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = QS["chunk_overlap_dedup"](spark, d).collect()
    assert len(rows) == 1
    assert rows[0].n_chunks == 2  # ceil(61/60) for the non-empty doc only

"""Text-analysis expression builders (SURVEY.md §2.9 extension surface).

All pure ``pyspark.sql.functions`` compositions — JVM-side, codegen'd,
no Python in the hot path. Each has an ANSI-SQL twin string so the DuckDB
oracle computes identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the heuristic language-ID.
# Deliberately simple: the point is the *operator shape* (vectorized
# CASE/likeness scoring over text), not linguistic accuracy.
LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "es": ("el", "la", "los"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space corpus)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def fingerprint_md5(text: Column) -> Column:
    """Document fingerprint: md5 of the lower-cased text. md5 hex output is
    identical across Spark and DuckDB, so fingerprints are oracle-stable."""
    return F.md5(F.lower(text))


def punct_count(text: Column) -> Column:
    """Number of non-alphanumeric, non-space characters."""
    return F.length(F.regexp_replace(text, "[a-zA-Z0-9 ]", ""))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1]-ish quality score from cheap surface features:
    length band, mean token length, punctuation ratio. The shape of a
    pretraining-corpus quality filter, minus the learned model."""
    n_chars = F.length(text)
    n_tok = token_count(text)
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok  # chars excl. separators
    punct_ratio = punct_count(text) / n_chars
    return (
        F.least(n_chars / F.lit(500.0), F.lit(1.0)) * 0.4
        + F.least(mean_tok_len / F.lit(8.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2
    )


QUALITY_SCORE_SQL = """
LEAST(LENGTH(text) / 500.0, 1.0) * 0.4
+ LEAST(((LENGTH(text) - (LEN(STRING_SPLIT(text, ' ')) - 1))
         / LEN(STRING_SPLIT(text, ' '))) / 8.0, 1.0) * 0.4
+ (1.0 - LEAST((LENGTH(REGEXP_REPLACE(text, '[a-zA-Z0-9 ]', '', 'g'))
                / LENGTH(text)) * 10.0, 1.0)) * 0.2
""".strip()


def lang_id(text: Column) -> Column:
    """Heuristic language ID: first language whose marker stopwords appear
    as ' word ' substrings; 'unk' otherwise. Vectorized LIKE chain."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    expr = F.lit("unk")
    for lang in reversed(list(LANG_MARKERS)):
        markers = LANG_MARKERS[lang]
        cond = F.lit(False)
        for m in markers:
            cond = cond | padded.contains(f" {m} ")
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_id_sql() -> str:
    clauses = []
    for lang, markers in LANG_MARKERS.items():
        conds = " OR ".join(
            f"(' ' || LOWER(text) || ' ') LIKE '% {m} %'" for m in markers
        )
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'unk' END"

"""Multimodal registry queries: binary-column plumbing through Arrow-batched
mapInPandas (operators/multimodal.py). The fake byte-arithmetic decoder lets
even the Python-UDF path be hash-verified: the DuckDB oracle recomputes the
same features from the md5 hex string (hex-pair -> int via strpos)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from apache_beam_challange_spark.operators.multimodal import (
    attach_fake_image,
    decode_image_features,
    sample_frames,
)
from apache_beam_challange_spark.plans.registry import query
from apache_beam_challange_spark.sources.catalog import load_table

# hex pair at position p (1-based, pairs are chars 2p-1..2p) -> byte int
_HEXPAIR = (
    "((STRPOS('0123456789abcdef', SUBSTR(h, {a}, 1)) - 1) * 16"
    " + STRPOS('0123456789abcdef', SUBSTR(h, {b}, 1)) - 1)"
)


def _byte_at(i: int) -> str:
    """SQL for byte i (0-based) of the md5 digest given hex string ``h``."""
    return _HEXPAIR.format(a=2 * i + 1, b=2 * i + 2)


_SUM_BYTES = " + ".join(_byte_at(i) for i in range(16))


@query(
    "multimodal_image_features",
    oracle=f"""
WITH hx AS (SELECT doc_id, md5(LOWER(text)) AS h FROM documents)
SELECT doc_id,
       16 AS n_bytes,
       CAST({_byte_at(0)} % 64 + 1 AS INTEGER) AS width,
       CAST({_byte_at(1)} % 64 + 1 AS INTEGER) AS height,
       CAST({_byte_at(2)} % 3 + 1 AS INTEGER) AS channels,
       CAST({_SUM_BYTES} AS BIGINT) AS sum_bytes
FROM hx
""".strip(),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary image column -> decoded feature rows via mapInArrow (the
    measured-faster twin of the mapInPandas path; both tested equal). The
    decode kernel is the documented stub (no codecs in-container); the
    Spark plumbing (binary col, Arrow batches, schema contract) is real."""
    from apache_beam_challange_spark.operators.multimodal import (
        decode_image_features_arrow,
    )

    docs = load_table(spark, sf_dir, "documents")
    return decode_image_features_arrow(attach_fake_image(docs))


@query(
    "multimodal_frame_sample",
    oracle=f"""
WITH hx AS (SELECT doc_id, md5(LOWER(text)) AS h FROM documents),
idx AS (SELECT unnest(generate_series(0, 3)) AS frame_idx)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST((STRPOS('0123456789abcdef', SUBSTR(h, 8 * frame_idx + 1, 1)) - 1) * 16
            + STRPOS('0123456789abcdef', SUBSTR(h, 8 * frame_idx + 2, 1)) - 1
            AS INTEGER) AS frame_byte
FROM hx, idx
""".strip(),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary "video" payloads: every 4th byte as a
    frame record, 1->N inside mapInPandas (ffmpeg keyframe-seek shape)."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_fake_image(docs), every=4, n_frames=4)

from __future__ import annotations

import hashlib

import pytest

from apache_beam_challange_spark.operators.multimodal import (
    _decode_fake,
    _decode_real,
    attach_fake_image,
    decode_image_features,
    sample_frames,
)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_real(b"\x00")


def test_decode_features_exact(spark):
    docs = spark.createDataFrame([(1, "Hello World")], ["doc_id", "text"])
    out = decode_image_features(attach_fake_image(docs)).collect()
    digest = hashlib.md5(b"hello world").digest()
    assert len(out) == 1
    r = out[0]
    assert r["n_bytes"] == 16
    assert r["width"] == digest[0] % 64 + 1
    assert r["height"] == digest[1] % 64 + 1
    assert r["channels"] == digest[2] % 3 + 1
    assert r["sum_bytes"] == sum(digest)


def test_frame_sample_positions(spark):
    docs = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    out = sample_frames(attach_fake_image(docs), every=4, n_frames=4).collect()
    digest = hashlib.md5(b"abc").digest()
    got = {r["frame_idx"]: r["frame_byte"] for r in out}
    assert got == {i: digest[i * 4] for i in range(4)}


def test_arrow_and_pandas_decoders_agree(spark):
    from apache_beam_challange_spark.operators.multimodal import (
        decode_image_features_arrow,
    )

    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(20)], ["doc_id", "text"]
    )
    imgs = attach_fake_image(docs)
    via_pandas = sorted(map(tuple, decode_image_features(imgs).collect()))
    via_arrow = sorted(map(tuple, decode_image_features_arrow(imgs).collect()))
    assert via_pandas == via_arrow


def test_resize_halves_payload(spark):
    from apache_beam_challange_spark.operators.multimodal import resize_images

    docs = spark.createDataFrame([(1, "Hello World")], ["doc_id", "text"])
    out = resize_images(attach_fake_image(docs), factor=2).collect()
    digest = hashlib.md5(b"hello world").digest()
    assert len(out) == 1
    assert out[0]["n_bytes"] == 8
    assert bytes(out[0]["image_bytes"]) == digest[::2]


def test_fake_decoder_pure():
    assert _decode_fake(b"\x05\x06\x07") == {
        "n_bytes": 3,
        "width": 6,
        "height": 7,
        "channels": 2,
        "sum_bytes": 18,
    }

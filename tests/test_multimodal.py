"""Multimodal column plumbing: schema, batch shapes, stub gating."""

import pytest

from apache_arrow_spark.functions.multimodal import (
    attach_fake_media,
    decode_image,
    extract_features,
    frame_sample_stub,
    resize_stub,
)


@pytest.fixture()
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    return attach_fake_media(docs)


def test_media_schema(media):
    assert media.schema.simpleString() == (
        "struct<doc_id:bigint,payload:binary,media_type:string,width:int,height:int>"
    )
    r = media.first()
    assert isinstance(r["payload"], (bytes, bytearray)) and len(r["payload"]) > 0
    assert 64 <= r["width"] < 1088 and 64 <= r["height"] < 832


def test_decode_stub_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc", fake=False)
    feats = decode_image(b"abcabc", fake=True)
    assert len(feats) == 16 and abs(sum(feats) - 1.0) < 1e-9


def test_extract_features_batchwise(spark, media):
    out = extract_features(media, fake=True)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-6
        assert r["n_bytes"] > 0


def test_resize_rewrites_metadata(spark, media):
    out = resize_stub(media, 224, 224)
    r = out.first()
    assert (r["width"], r["height"]) == (224, 224)
    assert out.count() == 50


def test_frame_sample_explodes(spark, media):
    frames = frame_sample_stub(media.limit(3), every_n=4)
    rows = frames.collect()
    assert len(rows) == 12
    assert {r["frame_no"] for r in rows} == {0, 1, 2, 3}

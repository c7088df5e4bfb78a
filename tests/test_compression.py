"""Compression surface (SURVEY §2.7; reference python/pyarrow/io.pxi:890,953)."""

import pyarrow as pa
import pytest

from apache_arrow_spark.io.compression import (
    SUPPORTED,
    compress,
    compress_column,
    decompress,
    decompress_column,
)

PAYLOAD = b"the quick brown fox " * 200


@pytest.mark.parametrize("codec", [c for c in SUPPORTED if pa.Codec.is_available(c)])
def test_buffer_roundtrip_all_codecs(codec):
    comp = compress(PAYLOAD, codec=codec)
    assert isinstance(comp, bytes)
    assert len(comp) < len(PAYLOAD)  # highly repetitive input must shrink
    back = decompress(comp, decompressed_size=len(PAYLOAD), codec=codec)
    assert back == PAYLOAD


def test_buffer_api_shapes():
    comp = compress(PAYLOAD, codec="zstd", asbytes=False)
    assert isinstance(comp, pa.Buffer)
    back = decompress(comp, decompressed_size=len(PAYLOAD), codec="zstd", asbytes=False)
    assert back.to_pybytes() == PAYLOAD
    with pytest.raises(ValueError):
        compress(PAYLOAD, codec="xz")  # not an arrow codec


def test_column_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, b"alpha" * 100), (2, b"beta" * 200), (3, None)], "id long, blob binary"
    )
    packed = compress_column(df, "blob", codec="zstd")
    assert packed.schema["blob"].dataType.simpleString().startswith("struct<codec")
    rows = {r["id"]: r["blob"] for r in packed.collect()}
    assert rows[3] is None
    assert rows[1]["codec"] == "zstd" and rows[1]["n_raw"] == 500
    assert len(rows[1]["payload"]) < 500  # actually compressed
    back = decompress_column(packed, "blob")
    got = {r["id"]: r["blob"] for r in back.collect()}
    assert bytes(got[1]) == b"alpha" * 100
    assert bytes(got[2]) == b"beta" * 200
    assert got[3] is None


def test_column_roundtrip_preserves_other_columns(spark):
    df = spark.createDataFrame([(1, "keep", b"data" * 50)], "id long, tag string, blob binary")
    back = decompress_column(compress_column(df, "blob", codec="lz4"), "blob")
    r = back.collect()[0]
    assert r["tag"] == "keep" and bytes(r["blob"]) == b"data" * 50

"""Buffer + column compression (SURVEY §2.7 compression row;
python/pyarrow/io.pxi:890 ``compress``, :953 ``decompress``;
cpp/src/arrow/util/compression.h Codec).

Two layers:

- **Buffer API** — ``compress``/``decompress`` over one bytes-like value,
  the reference's exact call shape (decompression requires the
  decompressed size, as Arrow codecs are raw-stream, not self-framing).
- **Column API** — ``compress_column``/``decompress_column`` apply the
  codec executor-side over a binary column via Arrow-batched pandas
  functions.  The compressed column is a struct carrying the codec name
  and decompressed size next to the payload, so decompression needs no
  side channel — the distributed analog of how parquet pages record their
  uncompressed length.

Writer-option plumbing (parquet codec selection) lives in io.parquet;
this module is the standalone codec surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUPPORTED = ("lz4", "zstd", "snappy", "gzip", "brotli")


def _check_codec(codec: str) -> str:
    codec = codec.lower()
    if codec not in SUPPORTED:
        raise ValueError(f"codec {codec!r} not in {SUPPORTED}")
    if not pa.Codec.is_available(codec):
        raise NotImplementedError(f"codec {codec!r} not built into this pyarrow")
    return codec


def compress(data, codec: str = "lz4", asbytes: bool = True):
    """One-buffer compression (io.pxi:890).  Returns bytes (default) or a
    pyarrow Buffer."""
    codec = _check_codec(codec)
    out = pa.compress(data, codec=codec, asbytes=asbytes)
    return out


def decompress(data, decompressed_size: int, codec: str = "lz4", asbytes: bool = True):
    """One-buffer decompression (io.pxi:953).  ``decompressed_size`` is
    required — Arrow raw codec frames don't self-describe their length."""
    codec = _check_codec(codec)
    return pa.decompress(
        data, decompressed_size=decompressed_size, codec=codec, asbytes=asbytes
    )


COMPRESSED_SCHEMA = "struct<codec:string,n_raw:bigint,payload:binary>"


def compress_column(df: DataFrame, col: str, codec: str = "lz4") -> DataFrame:
    """Replace binary column ``col`` with a self-describing compressed
    struct {codec, n_raw, payload}.  Runs executor-side in Arrow batches;
    shuffling/storing the result moves only compressed bytes — at 100 TB
    this is the difference between shipping raw documents and shipping
    ~3-10x less."""
    codec = _check_codec(codec)
    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name != col]
    out_schema = ", ".join(out_fields + [f"{col} {COMPRESSED_SCHEMA}"])
    others = [c for c in df.columns if c != col]

    def _compress(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            raw = pdf[col].map(lambda v: bytes(v) if v is not None else None)
            packed = [
                None
                if v is None
                else {"codec": codec, "n_raw": len(v), "payload": pa.compress(v, codec=codec, asbytes=True)}
                for v in raw
            ]
            out = pdf[others].copy()
            out[col] = packed
            yield out

    return df.mapInPandas(_compress, out_schema)


def decompress_column(df: DataFrame, col: str) -> DataFrame:
    """Inverse of ``compress_column``: struct {codec, n_raw, payload} back
    to the raw binary column, using the struct's own codec/size."""
    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name != col]
    out_schema = ", ".join(out_fields + [f"{col} binary"])
    others = [c for c in df.columns if c != col]

    def _decompress(batches: Iterator) -> Iterator:
        for pdf in batches:
            raw = [
                None
                if v is None
                else pa.decompress(
                    bytes(v["payload"]), decompressed_size=int(v["n_raw"]), codec=v["codec"], asbytes=True
                )
                for v in pdf[col]
            ]
            out = pdf[others].copy()
            out[col] = raw
            yield out

    return df.mapInPandas(_decompress, out_schema)

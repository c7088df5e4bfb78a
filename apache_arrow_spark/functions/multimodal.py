"""Multimodal (image/audio/video) column plumbing.

Model (per the build brief): media are opaque ``binary`` columns carrying
typed metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so each executor
processes its partitions batch-wise.  The actual codec calls are STUBBED
(no PIL/ffmpeg in this container): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, whose deterministic stand-in
(byte histograms) keeps every piece of Spark plumbing — schema, batch
iteration, partitioning — real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = "doc_id bigint, payload binary, media_type string, width int, height int"
FEATURE_BITS = 16  # byte-histogram buckets in the fake feature extractor


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a deterministic binary payload column (utf-8 bytes of the
    text) plus typed metadata — the schema a real image table would have."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("image/fake").alias("media_type"),
        (F.pmod(F.xxhash64(F.col(text_col)), F.lit(1024)) + 64).cast("int").alias("width"),
        (F.pmod(F.xxhash64(F.col(text_col), F.lit(1)), F.lit(768)) + 64).cast("int").alias("height"),
    )


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Decode one image payload into pixel data.

    Real decoding requires an image codec library not present in this
    container — STUB.  ``fake=True`` returns a deterministic 16-bucket byte
    histogram (normalized), standing in for pixel features.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires a codec library (PIL/opencv) not available here; "
            "pass fake=True for the deterministic stand-in"
        )
    counts = [0] * FEATURE_BITS
    for byte in payload:
        counts[byte % FEATURE_BITS] += 1
    total = max(len(payload), 1)
    return [c / total for c in counts]


def extract_features(media_df: DataFrame, fake: bool = True) -> DataFrame:
    """Batch feature extraction over mapInPandas: (doc_id, features
    array<double>, n_bytes).  Arrow-batched; executors see pandas frames of
    whole partitions, the decode loop never crosses the JVM boundary."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda p: decode_image(bytes(p), fake=fake))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": feats,
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return media_df.mapInPandas(_extract, "doc_id bigint, features array<double>, n_bytes bigint")


def resize_stub(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through a mapInPandas stage and
    rewrites the metadata (real resampling would replace `payload`)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            yield out

    return media_df.mapInPandas(_resize, MEDIA_SCHEMA)


def frame_sample_stub(media_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled 'frame'
    (deterministic fake: chunks of the payload), exploding rows batch-wise —
    the exact shape a real ffmpeg-backed sampler would produce."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"].map(bytes).to_numpy()
            lengths = np.fromiter((len(p) for p in payloads), dtype="int64", count=len(payloads))
            chunk = np.maximum(lengths // every_n, 1)
            n_frames = np.minimum(every_n, lengths)
            # vectorized explode: repeat row attrs per frame, slice by offsets
            doc_ids = np.repeat(pdf["doc_id"].to_numpy(), n_frames)
            frame_no = (
                np.concatenate([np.arange(n, dtype="int32") for n in n_frames])
                if len(n_frames) and n_frames.sum() > 0
                else np.array([], dtype="int32")
            )
            starts = np.repeat(chunk, n_frames) * frame_no
            ends = starts + np.repeat(chunk, n_frames)
            frames = [
                p[s:e]
                for p, s, e in zip(np.repeat(payloads, n_frames), starts, ends)
            ]
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_no": frame_no, "frame": frames}
            )

    return media_df.mapInPandas(_frames, "doc_id bigint, frame_no int, frame binary")

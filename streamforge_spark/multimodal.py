"""Multimodal (image/audio/video) column handling.

Media is modeled as opaque ``binary`` payload columns plus typed
metadata — the Spark-native layout for 100 TB multimodal corpora
(binary stays columnar in parquet; metadata prunes/filters without
touching bytes). Decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages: one Python worker per
partition, batch-at-a-time, no driver involvement.

The actual codec step is STUBBED (no image/audio libs in this
container): ``decode_media`` raises NotImplementedError unless
``fake=True``, which substitutes a deterministic metadata-only
"decode" so the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),     # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("source", T.StringType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("checksum", T.StringType()),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA frame from the documents fixture (text
    bytes stand in for encoded media) — the test/demo source."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.col("source"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode stage over mapInPandas. Real codecs (PIL/ffmpeg/...) are
    not available here — fake=True applies the deterministic stand-in
    (dimensions derived from payload length, md5 checksum)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "pass fake=True for the deterministic stand-in")
            n = pdf["payload"].map(len)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n.astype("int64"),
                "width": (n % 1024).astype("int32"),
                "height": (n % 768).astype("int32"),
                "checksum": pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
            })

    return df.mapInPandas(decode, DECODED_SCHEMA)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction stage (the embedding-model slot): Arrow-
    batched mapInPandas producing fixed-dim double vectors. The
    deterministic stand-in hashes payload bytes into the vector; a real
    model slots into the same signature/batch shape."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        def vec(b) -> list[float]:
            h = hashlib.sha256(bytes(b)).digest()
            return [h[i] / 255.0 for i in range(dim)]
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "features": pdf["payload"].map(vec),
            })

    return df.mapInPandas(extract, FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling stage shape: 1 media row -> N frame rows
    (byte-window stand-in for video frame extraction); demonstrates the
    expand-shape mapInPandas contract."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                for i in range(0, len(payload), every_n_bytes):
                    out.append(dict(media_id=row["media_id"],
                                    frame_idx=i // every_n_bytes,
                                    frame=payload[i:i + every_n_bytes]))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return df.mapInPandas(sample, schema)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_media(df: DataFrame, width: int, height: int,
                 fake: bool = False) -> DataFrame:
    """Resize stage over mapInPandas (1 row -> 1 smaller row). The
    real implementation slots PIL/ffmpeg scaling into the same
    signature; the deterministic stand-in (fake=True) truncates the
    payload proportionally to the pixel-count ratio so downstream
    size-dependent logic sees realistic shrinkage. Output keeps the
    binary columnar layout — resize early, and every later stage
    shuffles the small bytes, not the originals."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "pass fake=True for the deterministic stand-in")
            n = pdf["payload"].map(len)
            ratio = min(1.0, (width * height) / (1024.0 * 768.0))
            keep = (n * ratio).astype("int64").clip(lower=1)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "payload": [bytes(b)[:k] for b, k in zip(pdf["payload"], keep)],
                "width": pd.Series([width] * len(pdf), dtype="int32"),
                "height": pd.Series([height] * len(pdf), dtype="int32"),
            })

    return df.mapInPandas(resize, RESIZED_SCHEMA)

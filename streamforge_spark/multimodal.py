"""Multimodal (image/audio/video) column handling.

Media is modeled as opaque ``binary`` payload columns plus typed
metadata — the Spark-native layout for 100 TB multimodal corpora
(binary stays columnar in parquet; metadata prunes/filters without
touching bytes). Decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages: one Python worker per
partition, batch-at-a-time, no driver involvement.

Codec status: all three media types decode FOR REAL via pure-stdlib
codecs — PNG images (``functions/png.py``: zlib inflate + all five
scanline filters), WAV audio (``functions/wav.py``: RIFF/PCM), and
animated-GIF video (``functions/gif.py``: container parsing + full
LZW). ``decode_media`` sniffs the payload magic bytes and dispatches;
unrecognized formats (e.g. JPEG — no stdlib codec exists) fall back to
the deterministic stand-in with ``fake=True`` or raise — no silent
junk. ``sample_frames`` is the format-agnostic byte-window sampler for
opaque payloads; TRUE per-frame decode for video goes through
``functions/gif.py`` (see queries/llm.py::multimodal_gif_roundtrip,
which emits real decoded-frame statistics).
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


def media_png_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize REAL PNG payloads from the documents fixture: per
    doc, a (4 + id%13) x (3 + id%7) RGB image whose pixel bytes follow
    the deterministic pattern (id*7 + i) % 256 — encoded through the
    real codec, so downstream decode exercises inflate + unfilter on
    genuine PNG bytes, and the pixel content stays SQL-computable for
    the oracle."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from streamforge_spark.functions.png import encode_png
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for did in ids:
                w, h = 4 + did % 13, 3 + did % 7
                px = bytes((did * 7 + i) % 256 for i in range(w * h * 3))
                payloads.append(encode_png(int(w), int(h), px))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return (docs.select("doc_id").mapInPandas(build, schema)
            .withColumn("media_type", F.lit("image"))
            .withColumn("source", F.lit("synth"))
            .withColumn("meta", F.create_map(F.lit("codec"), F.lit("png"))))


def media_wav_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize REAL WAV payloads from the documents fixture: per
    doc, 200 + id%100 mono 16-bit PCM samples following the
    deterministic pattern ((id*31 + i*17) % 4001) - 2000 — packed
    through the real RIFF/PCM codec (functions/wav.py), so downstream
    decode exercises genuine container parsing + sample unpacking
    while the sample values stay SQL-computable for the oracle."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from streamforge_spark.functions.wav import encode_wav
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for did in ids:
                n = 200 + did % 100
                samples = [int((did * 31 + i * 17) % 4001) - 2000
                           for i in range(n)]
                payloads.append(encode_wav(samples, 8000))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return (docs.select("doc_id").mapInPandas(build, schema)
            .withColumn("media_type", F.lit("audio"))
            .withColumn("source", F.lit("synth"))
            .withColumn("meta", F.create_map(F.lit("codec"), F.lit("wav"))))


def media_gif_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize REAL multi-frame video payloads (animated GIF89a)
    from the documents fixture: per doc, 2 + id%3 frames of a
    (6 + id%8) x (4 + id%5) grayscale-palette image whose frame f /
    pixel i byte is (id*13 + f*101 + i*7) % 256 — encoded through the
    real codec (functions/gif.py), so downstream decode exercises
    genuine container parsing + LZW decompression on every frame while
    the pixel content stays SQL-computable for the oracle. With PNG
    (image) and WAV (audio) this makes ALL THREE media types
    real-codec-backed."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from streamforge_spark.functions.gif import encode_gif
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for did in ids:
                w, h, nf = 6 + did % 8, 4 + did % 5, 2 + did % 3
                frames = [bytes((did * 13 + f * 101 + i * 7) % 256
                                for i in range(w * h))
                          for f in range(nf)]
                payloads.append(encode_gif(int(w), int(h), frames))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return (docs.select("doc_id").mapInPandas(build, schema)
            .withColumn("media_type", F.lit("video"))
            .withColumn("source", F.lit("synth"))
            .withColumn("meta", F.create_map(F.lit("codec"), F.lit("gif"))))


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode stage over mapInPandas, dispatching on payload magic
    bytes to the REAL pure-stdlib codecs:

    - PNG (``\\x89PNG``): width/height from IHDR, checksum = md5 of
      the DECODED pixels (proves the inflate+unfilter path);
    - WAV (``RIFF..WAVE``): width = sample count, height = frame rate,
      checksum = md5 of the decoded PCM frames;
    - GIF (``GIF8``): frame dimensions, checksum = md5 over every
      decoded frame's pixels (proves the LZW path frame-by-frame).

    Unrecognized formats (e.g. JPEG — no stdlib codec): the
    deterministic stand-in with fake=True, NotImplementedError
    otherwise — no silent junk."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from streamforge_spark.functions.gif import decode_gif
        from streamforge_spark.functions.png import decode_png, is_png
        from streamforge_spark.functions.wav import decode_wav
        for pdf in batches:
            out = {"media_id": [], "media_type": [], "n_bytes": [],
                   "width": [], "height": [], "checksum": []}
            for mid, mtype, payload in zip(
                    pdf["media_id"], pdf["media_type"], pdf["payload"]):
                b = bytes(payload)
                if is_png(b):
                    w, h, _, pixels = decode_png(b)
                    ck = hashlib.md5(pixels).hexdigest()
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    _, rate, n, samples = decode_wav(b)
                    w, h = n, rate
                    ck = hashlib.md5(
                        b"".join(s.to_bytes(2, "little", signed=True)
                                 for s in samples)).hexdigest()
                elif b[:4] == b"GIF8":
                    w, h, frames = decode_gif(b)
                    m = hashlib.md5()
                    for fr in frames:
                        m.update(fr)
                    ck = m.hexdigest()
                elif fake:
                    n = len(b)
                    w, h = n % 1024, n % 768
                    ck = hashlib.md5(b).hexdigest()
                else:
                    raise NotImplementedError(
                        "unrecognized media format (no stdlib codec); "
                        "pass fake=True for the deterministic stand-in")
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["n_bytes"].append(len(b))
                out["width"].append(w)
                out["height"].append(h)
                out["checksum"].append(ck)
            yield pd.DataFrame({
                "media_id": pd.Series(out["media_id"], dtype="int64"),
                "media_type": out["media_type"],
                "n_bytes": pd.Series(out["n_bytes"], dtype="int64"),
                "width": pd.Series(out["width"], dtype="int32"),
                "height": pd.Series(out["height"], dtype="int32"),
                "checksum": out["checksum"],
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
    """Resize stage over mapInPandas (1 row -> 1 smaller row). PNG
    payloads run the REAL pipeline: decode -> nearest-neighbor
    resample -> re-encode (functions/png.py — integer-exact kernel, no
    float interpolation). Non-PNG: the deterministic stand-in
    (fake=True) truncates the payload proportionally to the pixel-
    count ratio; NotImplementedError otherwise. Output keeps the
    binary columnar layout — resize early, and every later stage
    shuffles the small bytes, not the originals."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from streamforge_spark.functions.png import (
            decode_png, encode_png, is_png, resize_nearest)
        for pdf in batches:
            payloads, n = [], pdf["payload"].map(len)
            ratio = min(1.0, (width * height) / (1024.0 * 768.0))
            for b, keep in zip(pdf["payload"],
                               (n * ratio).astype("int64").clip(lower=1)):
                b = bytes(b)
                if is_png(b):
                    w0, h0, ch, px = decode_png(b)
                    payloads.append(encode_png(
                        width, height,
                        resize_nearest(w0, h0, ch, px, width, height), ch))
                elif fake:
                    payloads.append(b[:keep])
                else:
                    raise NotImplementedError(
                        "non-PNG codecs unavailable in this environment; "
                        "pass fake=True for the deterministic stand-in")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "payload": payloads,
                "width": pd.Series([width] * len(pdf), dtype="int32"),
                "height": pd.Series([height] * len(pdf), dtype="int32"),
            })

    return df.mapInPandas(resize, RESIZED_SCHEMA)


AHASH_GX, AHASH_GY = 10, 6  # sample grid: 60 bits, fits a positive BIGINT


def image_ahash(df: DataFrame) -> DataFrame:
    """Perceptual average-hash over DECODED pixels: nearest-neighbor
    sample a fixed 10x6 grid of grayscale values (r+g+b), set bit i
    when sample_i * 60 > total (integer cross-multiplication — no
    division, no float) — a 60-bit fingerprint that survives resizing
    and mild re-encoding, THE image near-dedup key for multimodal
    corpora (group/band by hash the same way text uses MinHash).

    Input: (media_id, payload) with real PNG bytes; decoding runs the
    actual inflate+unfilter codec, so the hash certifies the whole
    pixel path. Arrow-batched; one narrow output row per image."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("ahash", T.LongType()),
    ])

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        from streamforge_spark.functions.png import decode_png
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "ahash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, _, pixels = decode_png(bytes(payload))
                px = np.frombuffer(pixels, dtype=np.uint8).astype(np.int64)
                xs = (np.arange(AHASH_GX) * w) // AHASH_GX
                ys = (np.arange(AHASH_GY) * h) // AHASH_GY
                pos = (ys[:, None] * w + xs[None, :]).reshape(-1) * 3
                gray = px[pos] + px[pos + 1] + px[pos + 2]
                total = int(gray.sum())
                bits = gray * (AHASH_GX * AHASH_GY) > total
                ah = int(np.sum(bits.astype(np.int64)
                                << np.arange(AHASH_GX * AHASH_GY)))
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["ahash"].append(ah)
            yield pd.DataFrame({
                "media_id": pd.Series(out["media_id"], dtype="int64"),
                "width": pd.Series(out["width"], dtype="int32"),
                "height": pd.Series(out["height"], dtype="int32"),
                "ahash": pd.Series(out["ahash"], dtype="int64"),
            })

    return df.select("media_id", "payload").mapInPandas(hash_batch, schema)


AUDIO_ENV_WINDOWS = 20  # loudness-envelope windows -> 20-bit fingerprint


def audio_envelope_fingerprint(df: DataFrame) -> DataFrame:
    """Audio perceptual fingerprint from DECODED PCM: split the clip
    into ``AUDIO_ENV_WINDOWS`` equal sample windows, set bit w when
    window w's absolute-amplitude energy exceeds the clip mean
    (integer cross-multiplication, no division) — a loudness-envelope
    signature robust to gain-less re-encoding, the audio analog of
    image_ahash for multimodal near-dedup.

    Input: (media_id, payload) with real RIFF/WAV bytes; decoding runs
    the actual container+PCM codec. Arrow-batched, one narrow row per
    clip."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("env_hash", T.LongType()),
    ])

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        from streamforge_spark.functions.wav import decode_wav
        W = AUDIO_ENV_WINDOWS
        for pdf in batches:
            out = {"media_id": [], "n_samples": [], "env_hash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, n, samples = decode_wav(bytes(payload))
                a = np.abs(np.asarray(samples, dtype=np.int64))
                bounds = (np.arange(W) * n) // W
                energy = np.add.reduceat(a, bounds)
                total = int(a.sum())
                bits = energy * W > total
                out["media_id"].append(mid)
                out["n_samples"].append(n)
                out["env_hash"].append(
                    int(np.sum(bits.astype(np.int64) << np.arange(W))))
            yield pd.DataFrame({
                "media_id": pd.Series(out["media_id"], dtype="int64"),
                "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                "env_hash": pd.Series(out["env_hash"], dtype="int64"),
            })

    return df.select("media_id", "payload").mapInPandas(fp, schema)


VID_GX, VID_GY = 4, 3  # per-frame sample grid -> 12 bits/frame


def video_scene_signature(df: DataFrame) -> DataFrame:
    """Video perceptual signature from DECODED frames: each frame
    contributes a 12-bit spatial hash (4x3 grid samples thresholded
    against the frame mean, integer cross-multiplication) packed at
    bit offset 12*frame — a temporal-spatial fingerprint for video
    near-dedup, completing the modality set (image_ahash, audio
    envelope). Input: (media_id, payload) with real animated-GIF
    bytes; decoding runs the full LZW codec per frame."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("vhash", T.LongType()),
    ])

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        from streamforge_spark.functions.gif import decode_gif
        for pdf in batches:
            out = {"media_id": [], "n_frames": [], "vhash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames = decode_gif(bytes(payload))
                xs = (np.arange(VID_GX) * w) // VID_GX
                ys = (np.arange(VID_GY) * h) // VID_GY
                pos = (ys[:, None] * w + xs[None, :]).reshape(-1)
                vhash = 0
                for f, fr in enumerate(frames):
                    px = np.frombuffer(fr, dtype=np.uint8).astype(np.int64)
                    sample = px[pos]
                    bits = sample * (w * h) > int(px.sum())
                    vhash |= int(np.sum(bits.astype(np.int64)
                                        << np.arange(VID_GX * VID_GY))) << (12 * f)
                out["media_id"].append(mid)
                out["n_frames"].append(len(frames))
                out["vhash"].append(vhash)
            yield pd.DataFrame({
                "media_id": pd.Series(out["media_id"], dtype="int64"),
                "n_frames": pd.Series(out["n_frames"], dtype="int64"),
                "vhash": pd.Series(out["vhash"], dtype="int64"),
            })

    return df.select("media_id", "payload").mapInPandas(sig, schema)

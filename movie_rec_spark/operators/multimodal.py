"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video are treated as opaque ``binary`` columns with a typed
metadata struct, exactly as a 100 TB lakehouse stores them. The
decode / feature-extract / resize / frame-sample stages run as
Arrow-batched ``mapInPandas`` — the one place Python belongs, because
codec libraries are Python/native. The image/audio libs are NOT in this
container, so the codec call is stubbed (deterministic fake derived from
the payload bytes, or NotImplementedError when strict=True); the
Spark-side plumbing — schema, batch shape, partition behavior — is real
and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("mean_byte", DoubleType()),
])

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_sha", LongType()),
])


def with_payload(documents: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column (here: the UTF-8 bytes of
    the text, standing in for image bytes) plus typed metadata."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("image/fake").alias("mime"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def q_multimodal_meta(documents: DataFrame) -> DataFrame:
    """Declared query: payload metadata extraction — byte length and
    content digest over the binary column, all JVM-side."""
    p = with_payload(documents)
    return p.select(
        "doc_id",
        F.col("meta.n_bytes").cast("int").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.origin").alias("origin"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake image decode: dimensions from the content
    digest, mean byte from the payload. STUB — replace the body with
    PIL/libvips in an environment that has codecs."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 64
    height = 64 + h[1] % 64
    channels = 1 + h[2] % 3
    mean_byte = (sum(payload) / len(payload)) if payload else 0.0
    return width, height, channels, round(mean_byte, 4)


def decode_image_features(with_payload_df: DataFrame,
                          strict: bool = False) -> DataFrame:
    """Image decode + feature extraction over mapInPandas.

    Arrow-batched: each partition arrives as pandas batches; one Python
    call per BATCH, not per row. With strict=True raises
    NotImplementedError (no codec libs in this container) — the
    production hook point.
    """
    decode = _fake_decode  # bind into the closure: pickle the stub BY
    # VALUE with fn, so workers never need this module importable

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image decode requires PIL/libvips; not in container")
        for pdf in batches:
            decoded = [decode(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "channels": [d[2] for d in decoded],
                "mean_byte": [d[3] for d in decoded],
            })

    return with_payload_df.mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("duration_sec", DoubleType()),
    StructField("rms", DoubleType()),
])


def decode_audio_features(with_payload_df: DataFrame,
                          strict: bool = False) -> DataFrame:
    """Audio decode + feature extraction over mapInPandas — the audio
    twin of decode_image_features: sample rate / length from the
    container header, RMS level from the samples. The codec call is a
    deterministic fake (header fields derived from the content digest,
    RMS from payload bytes recentred to [-1, 1]); with strict=True it
    raises NotImplementedError (no libsndfile/ffmpeg in this
    container) — the production hook point. Schema, Arrow batch shape,
    and 1→1 row contract are the real product.
    """
    def fake_decode(payload: bytes) -> tuple[int, int, float, float]:
        h = hashlib.md5(payload).digest()
        rate = (8000, 16000, 22050, 44100)[h[0] % 4]
        n_samples = max(len(payload), 1) * 16
        duration = round(n_samples / rate, 4)
        if payload:
            acc = 0.0
            for b in payload:
                v = (b - 128.0) / 128.0
                acc += v * v
            rms = round((acc / len(payload)) ** 0.5, 4)
        else:
            rms = 0.0
        return rate, n_samples, duration, rms

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real audio decode requires libsndfile/ffmpeg; "
                "not in container")
        for pdf in batches:
            decoded = [fake_decode(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "sample_rate": pd.Series(
                    [d[0] for d in decoded], dtype="int32"),
                "n_samples": pd.Series(
                    [d[1] for d in decoded], dtype="int64"),
                "duration_sec": [d[2] for d in decoded],
                "rms": [d[3] for d in decoded],
            })

    return with_payload_df.mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


def sample_frames(with_payload_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling stub: emits n_frames rows per payload with a
    deterministic per-frame digest — a 1→N mapInPandas (the real codec
    would seek/decode keyframes per batch)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(b)
                step = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    chunk = raw[i * step:(i + 1) * step]
                    dig = int.from_bytes(
                        hashlib.md5(chunk).digest()[:8], "big", signed=True)
                    ids.append(doc_id)
                    idxs.append(i)
                    shas.append(dig)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_sha": pd.Series(shas, dtype="int64"),
            })

    return with_payload_df.mapInPandas(fn, FRAME_SAMPLE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("resized", BinaryType()),
])


def resize_images(with_payload_df: DataFrame, target: int = 32) -> DataFrame:
    """Image resize stub over mapInPandas: emits a transformed payload
    of deterministic size target×target (here: a strided byte
    subsample — the real body is one PIL/libvips call per batch).
    Output batch shape (binary out column, 1→1 rows) is exactly the
    production contract; only the codec call is fake.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target * target
        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                raw = bytes(b)
                if not raw:
                    out.append(b"\x00" * n_out)
                    continue
                step = max(len(raw) // n_out, 1)
                sub = raw[::step][:n_out]
                out.append(sub.ljust(n_out, b"\x00"))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": pd.Series([target] * len(pdf), dtype="int32"),
                "height": pd.Series([target] * len(pdf), dtype="int32"),
                "resized": out,
            })

    return with_payload_df.mapInPandas(fn, RESIZED_SCHEMA)

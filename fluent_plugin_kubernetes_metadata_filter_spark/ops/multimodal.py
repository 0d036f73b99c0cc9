"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs via
mapInPandas.

The Spark-side contract (schema, partitioning, batch shape, UDF
signatures) is real and tested; the actual media DECODE is stubbed — the
sandbox image has no PIL/ffmpeg — behind ``decoder=`` hooks that raise
NotImplementedError unless a deterministic fake is injected. A real
deployment passes e.g. a PIL-based decoder with the same signature.

Scale notes: binary payloads ride the Arrow stream in batches
(spark.sql.execution.arrow.maxRecordsPerBatch caps batch memory);
mapInPandas keeps per-partition streaming (never materializes a
partition), and feature extraction emits narrow rows so the wide binary
column is dropped as early as possible (column pruning does the rest).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def fake_decoder(payload: pd.Series) -> pd.Series:
    """Deterministic stand-in for a real image/audio decode: derives an
    8-dim 'feature' from payload bytes. Replace with a real decoder in
    production (same signature: Series[bytes] -> Series[list[float]])."""
    def feat(b: bytes) -> list[float]:
        if b is None or len(b) == 0:
            return [0.0] * 8
        a = np.frombuffer(b, dtype=np.uint8)
        chunks = np.array_split(a, 8)
        return [float(c.mean()) / 255.0 if len(c) else 0.0 for c in chunks]

    return payload.map(feat)


def bp_feature_decoder(payload: pd.Series) -> pd.Series:
    """Exact-arithmetic variant of ``fake_decoder`` for cross-engine
    value checks: feature[j] = chunk_sum * 10000 // (chunk_len * 255)
    (integer basis points of the chunk byte mean, stored as floats —
    integers <= 10000 are exactly representable in float32, so there is
    no float32-vs-float64 rounding-grid hazard when an independent
    engine recomputes the same feature in integer SQL)."""
    def feat(b: bytes) -> list[float]:
        if b is None or len(b) == 0:
            return [0.0] * 8
        a = np.frombuffer(b, dtype=np.uint8)
        return [
            float(int(c.sum()) * 10000 // (len(c) * 255)) if len(c) else 0.0
            for c in np.array_split(a, 8)
        ]

    return payload.map(feat)


def unavailable_decoder(payload: pd.Series) -> pd.Series:
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; inject a decoder with signature "
        "Series[bytes] -> Series[list[float]]"
    )


def extract_features(df: DataFrame,
                     decoder: Callable[[pd.Series], pd.Series] = unavailable_decoder,
                     batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: narrow output (drops the payload),
    Arrow-batched, per-partition streaming."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decoder(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "payload_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int,
                decoder: Callable[[pd.Series], pd.Series] = unavailable_decoder) -> DataFrame:
    """Image resize plumbing: same binary-in/binary-out mapInPandas shape;
    the transform itself is the injected decoder's concern."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            _ = decoder(pdf["payload"])  # decode hook (raises when stubbed)
            out["width"] = width
            out["height"] = height
            yield out

    return df.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, duration_ms) into
    frame timestamps JVM-side; the decode of each frame is the stubbed
    part. Demonstrates pruning: the payload column is not touched here.

    Videos shorter than ``every_ms`` (n == 0) and null durations emit NO
    frames — without the n > 0 guard, greatest(n-1, 0) would fabricate a
    frame at t=0 for both (greatest ignores nulls)."""
    n = (F.col("duration_ms") / every_ms).cast("int")
    return (
        df.where((F.col("kind") == "video") & n.isNotNull() & (n > 0))
        .select(
            "media_id",
            F.explode(
                F.transform(F.sequence(F.lit(0), n - 1), lambda i: i * every_ms)
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randint(0, 256, size=128 + (i % 5) * 64, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32 if kind == "image" else None,
                48 + i % 16 if kind == "image" else None,
                (i % 10 + 1) * 1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

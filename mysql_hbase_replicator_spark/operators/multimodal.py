"""Multimodal column plumbing (SURVEY.md §2.11): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched Python.

The Spark-side design is the real deliverable here — schema, partitioning,
UDF signatures, and Arrow batch shapes are production-shaped:

- payloads stay in executors end-to-end (no driver collects); rows flow
  through ``mapInPandas`` so each Arrow batch holds a bounded number of
  payloads (``spark.sql.execution.arrow.maxRecordsPerBatch`` caps memory).
- frame sampling is pure JVM (sequence + explode on metadata) — the Python
  boundary is crossed only where bytes must actually be decoded.
- the decode itself is STUBBED: this container ships no image/audio codecs.
  ``decoder="real"`` raises NotImplementedError where PIL/ffmpeg would be
  called; the default ``decoder="fake"`` is a deterministic stand-in
  (byte-statistics pseudo-decode) so the plumbing is testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("channels", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
    ]
)

FEATURE_DIM = 16
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(spark: SparkSession, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media rows for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{kind}-{i}".encode()).digest() * 8  # 256 bytes
        meta = (64, 48, 3, None, None, "fake") if kind == "image" else (None, None, 1, 16000, 100, "fake")
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> tuple[float, float]:
    """Deterministic pseudo-decode: byte statistics as 'pixels'."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    p = hist / max(len(arr), 1)
    nz = p[p > 0]
    entropy = float(-(nz * np.log2(nz)).sum())
    return float(arr.mean()), entropy


def decode_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode payloads to per-item stats via mapInPandas (Arrow batches).

    ``decoder="real"`` marks where a codec library (PIL / soundfile / ffmpeg)
    would run; not available in this container.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real media decode requires PIL/soundfile/ffmpeg, not shipped in this container; "
            "use decoder='fake' for the deterministic stand-in"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "width": pdf["meta"].map(lambda m: m["width"] if m else None),
                "height": pdf["meta"].map(lambda m: m["height"] if m else None),
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else None),
            }
            stats = pdf["payload"].map(lambda b: _fake_decode(bytes(b)) if b is not None else (None, None))
            out["mean_intensity"] = stats.map(lambda s: s[0])
            out["byte_entropy"] = stats.map(lambda s: s[1])
            yield pd.DataFrame(out)

    return df.mapInPandas(decode_batches, DECODED_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Payload → FEATURE_DIM float vector (the embedding-extraction shape).
    Deterministic hash-derived features stand in for a real model forward."""

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def feats(b) -> list[float] | None:
                if b is None:
                    return None
                # two sha256 digests (64 bytes) → 16 little-endian uint32 →
                # [-1, 1] float32. sha256 (not sha512) so the oracle can
                # recompute the identical features in SQL.
                raw = bytes(b)
                h = hashlib.sha256(raw).digest() + hashlib.sha256(raw + b"x").digest()
                arr = np.frombuffer(h[: FEATURE_DIM * 4], dtype="<u4").astype(np.float64)
                return (arr / np.iinfo(np.uint32).max * 2 - 1).astype(np.float32).tolist()

            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": pdf["payload"].map(feats)})

    return df.mapInPandas(feature_batches, FEATURE_SCHEMA)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Adapt the `documents` table to the MEDIA_SCHEMA shape: payload = the
    UTF-8 bytes of ``text`` (a deterministic opaque-binary stand-in, since the
    test corpus ships no real media), ``n_frames`` = n_chars/8. This keeps the
    multimodal operators runnable — and oracle-checkable — on driver testdata:
    the "decode" statistics over these payloads have exact SQL equivalents.
    Pure JVM projection: ``encode`` produces the binary column executor-side."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(1).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.col("n_chars") / 8).cast("int").alias("n_frames"),
            F.lit("utf8").alias("format"),
        ).alias("meta"),
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — pure JVM: explode the sampled frame indices
    from metadata; the (expensive, stubbed) per-frame decode would then run
    only on the sampled subset."""
    n_frames = F.col("meta.n_frames")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return (
        df.filter(n_frames.isNotNull() & (n_frames > 0))
        .select("media_id", "kind", F.explode(idx).alias("frame_index"))
    )


def resize_media(df: DataFrame, width: int = 16, height: int = 16, decoder: str = "fake") -> DataFrame:
    """Resize every payload to width×height (single channel) via Arrow-batched
    mapInPandas — same executor-side plumbing a real PIL/ffmpeg resample
    would use. ``decoder="real"`` marks the codec call site (not shipped in
    this container); the fake path truncates the byte stream to the target
    size (deterministic, SQL-recomputable), updating the metadata to the new
    geometry."""
    if decoder == "real":
        raise NotImplementedError(
            "real media resize requires PIL/ffmpeg, not shipped in this container; "
            "use decoder='fake' for the deterministic stand-in"
        )
    target = width * height

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "kind"]].copy()
            out["payload"] = pdf["payload"].map(
                lambda b: bytes(b)[:target] if b is not None else None
            )
            out["meta"] = pdf["payload"].map(
                lambda b: {
                    "width": width,
                    "height": height,
                    "channels": 1,
                    "sample_rate": None,
                    "n_frames": None,
                    "format": "fake-resized",
                }
                if b is not None
                else None
            )
            yield out

    return df.mapInPandas(resize_batches, MEDIA_SCHEMA)

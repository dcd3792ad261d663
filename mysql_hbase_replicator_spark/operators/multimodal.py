"""Multimodal column plumbing (SURVEY.md §2.11): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched Python.

The Spark-side design is the real deliverable here — schema, partitioning,
UDF signatures, and Arrow batch shapes are production-shaped:

- payloads stay in executors end-to-end (no driver collects); rows flow
  through ``mapInPandas`` so each Arrow batch holds a bounded number of
  payloads (``spark.sql.execution.arrow.maxRecordsPerBatch`` caps memory).
- frame sampling is pure JVM (sequence + explode on metadata) — the Python
  boundary is crossed only where bytes must actually be decoded.
- ``decoder="real"`` decodes real formats with the pure-numpy codecs in
  media_codecs.py (BMP 24-bit images, PCM-16 WAV audio — no codec library
  needed); formats that would need PIL/ffmpeg raise NotImplementedError at
  the decode site. The default ``decoder="fake"`` remains the deterministic
  byte-statistics stand-in whose outputs the DuckDB oracle can recompute.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# module-level: the codecs are pure numpy/stdlib (cheap import, re-imported
# once per executor) — the previous per-ROW function-local imports executed
# a sys.modules lookup inside loops over millions of payloads (r13 review)
from mysql_hbase_replicator_spark.operators.media_codecs import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    sniff_format,
)

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
    """Deterministic media rows for tests. Kinds "image"/"audio" carry opaque
    seeded bytes (for the fake decoder); kinds "bmp"/"wav" carry REAL files
    built by the pure-numpy encoders, so decoder="real" has true payloads."""
    rows = []
    for i in range(n):
        if kind == "bmp":
            w, h = 32, 24
            x = np.arange(w, dtype=np.int64)[None, :, None]
            y = np.arange(h, dtype=np.int64)[:, None, None]
            c = np.arange(3, dtype=np.int64)[None, None, :]
            pixels = ((x * 3 + y * 7 + c * 11 + i * 13) % 256).astype(np.uint8)
            payload, meta = encode_bmp(pixels), (w, h, 3, None, None, "bmp")
        elif kind == "wav":
            t = np.arange(1600, dtype=np.int64)
            samples = (((t * (i + 3) * 257) % 4096) - 2048).astype(np.int16)
            payload, meta = encode_wav(samples, 16000), (None, None, 1, 16000, 1600, "wav")
        else:
            payload = hashlib.sha256(f"{kind}-{i}".encode()).digest() * 8  # 256 bytes
            meta = (64, 48, 3, None, None, "fake") if kind == "image" else (None, None, 1, 16000, 100, "fake")
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> tuple[float | None, float | None]:
    """Deterministic pseudo-decode: byte statistics as 'pixels'. An EMPTY
    (non-NULL) payload yields NULL stats, matching the oracle's LIST_AVG
    over an empty list — numpy's mean of an empty array is NaN plus a
    RuntimeWarning, which value-hash-diverges (r13 review)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return None, None
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    p = hist / len(arr)
    nz = p[p > 0]
    entropy = float(-(nz * np.log2(nz)).sum())
    return float(arr.mean()), entropy


def _entropy_u8(arr: np.ndarray) -> float:
    hist = np.bincount(arr.reshape(-1), minlength=256).astype(np.float64)
    p = hist / max(arr.size, 1)
    nz = p[p > 0]
    return float(-(nz * np.log2(nz)).sum())


def _real_decode(payload: bytes) -> tuple[int | None, int | None, float, float]:
    """True decode via the pure-numpy codecs: (width, height, mean, entropy).
    Images: mean/entropy over decoded RGB pixels. Audio: mean over the int16
    samples, entropy over their little-endian byte view. Anything else needs
    a codec library this container doesn't ship → NotImplementedError."""
    fmt = sniff_format(payload)
    if fmt == "bmp":
        pixels = decode_bmp(payload)
        return pixels.shape[1], pixels.shape[0], float(pixels.mean()), _entropy_u8(pixels)
    if fmt == "png":
        # cost note: None/Up/Sub filter rows decode vectorized; foreign
        # PNGs using Average/Paeth hit decode_png's per-pixel fallback —
        # correct but slow at photo sizes (swap in PIL for those corpora)
        pixels = decode_png(payload)
        return pixels.shape[1], pixels.shape[0], float(pixels.mean()), _entropy_u8(pixels)
    if fmt == "wav":
        samples, _rate = decode_wav(payload)
        return None, None, float(samples.mean()), _entropy_u8(
            samples.astype("<i2").view(np.uint8)
        )
    raise NotImplementedError(
        "decoder='real' supports BMP, 8-bit PNG and PCM-16 WAV (pure-numpy/"
        "stdlib-zlib); other formats require PIL/soundfile/ffmpeg, not "
        "shipped in this container"
    )


def decode_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode payloads to per-item stats via mapInPandas (Arrow batches).

    ``decoder="fake"`` (default): deterministic byte-statistics pseudo-decode,
    oracle-recomputable; width/height pass through from metadata.
    ``decoder="real"``: true decode via the pure-numpy BMP/WAV codecs —
    width/height come from the DECODED image, executor-side; unsupported
    formats raise NotImplementedError inside the UDF.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder}")
    real = decoder == "real"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"]}
            n_bytes = pdf["payload"].map(lambda b: len(b) if b is not None else None)
            if real:
                decoded = pdf["payload"].map(
                    lambda b: _real_decode(bytes(b)) if b is not None else (None,) * 4
                )
                out["width"] = decoded.map(lambda d: d[0])
                out["height"] = decoded.map(lambda d: d[1])
                out["n_bytes"] = n_bytes
                out["mean_intensity"] = decoded.map(lambda d: d[2])
                out["byte_entropy"] = decoded.map(lambda d: d[3])
            else:
                out["width"] = pdf["meta"].map(lambda m: m["width"] if m else None)
                out["height"] = pdf["meta"].map(lambda m: m["height"] if m else None)
                out["n_bytes"] = n_bytes
                stats = pdf["payload"].map(
                    lambda b: _fake_decode(bytes(b)) if b is not None else (None, None)
                )
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


def png_media_from_documents(documents: DataFrame) -> DataFrame:
    """The REAL-codec twin of ``media_from_documents`` (r12 verdict #7):
    each document's UTF-8 bytes become the pixel row of a 1×N 8-bit
    GRAYSCALE PNG — a true container with a zlib-DEFLATE body — built
    executor-side in Arrow batches. Decoding the payload back
    (``decode_media(..., decoder="real")``) must recover exactly the text
    bytes as pixels, so the byte-statistics oracle that verifies the
    opaque-bytes path verifies the full encode→inflate→unfilter round trip
    too. Empty documents carry a NULL payload (a 0-pixel PNG is invalid)."""

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # one UTF-8 encode per row feeds BOTH the payload and the width —
            # meta stays consistent with the pixels by construction
            def to_png_and_meta(text: str | None):
                raw = text.encode("utf-8") if text else b""
                png = (
                    bytearray(
                        encode_png(np.frombuffer(raw, dtype=np.uint8).reshape(1, -1))
                    )
                    if raw
                    else None
                )
                return png, {
                    "width": len(raw) if raw else None,
                    "height": 1 if raw else None,
                    "channels": 1,
                    "sample_rate": None,
                    "n_frames": None,
                    "format": "png",
                }

            encoded = pdf["text"].map(to_png_and_meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "payload": encoded.map(lambda pm: pm[0]),
                    "meta": encoded.map(lambda pm: pm[1]),
                }
            )

    return documents.select("doc_id", "text").mapInPandas(
        encode_batches, MEDIA_SCHEMA
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
    """Resize every payload to width×height via Arrow-batched mapInPandas —
    the executor-side plumbing a PIL/ffmpeg resample would use.

    ``decoder="fake"``: truncates the byte stream to the target size
    (deterministic, SQL-recomputable), single channel.
    ``decoder="real"``: true nearest-neighbor resample of BMP or PNG images
    (decode → index-sample → re-encode in the SAME container, all
    numpy/stdlib-zlib); other payloads raise NotImplementedError inside the
    UDF (audio resampling would need a DSP library)."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder}")
    real = decoder == "real"
    target = width * height

    def _resize_real(b: bytes) -> tuple[bytes, str, int]:
        """→ (payload, format, channels) — resampled in the source container."""
        fmt = sniff_format(b)
        if fmt == "bmp":
            pixels = decode_bmp(b)
        elif fmt == "png":
            pixels = decode_png(b)
        else:
            raise NotImplementedError(
                "decoder='real' resize supports BMP and PNG images "
                "(pure-numpy/stdlib-zlib); other formats require PIL/ffmpeg"
            )
        h0, w0 = pixels.shape[:2]
        ys = (np.arange(height) * h0 // height).clip(0, h0 - 1)
        xs = (np.arange(width) * w0 // width).clip(0, w0 - 1)
        resized = pixels[ys][:, xs]
        channels = 1 if resized.ndim == 2 else resized.shape[2]
        payload = encode_bmp(resized) if fmt == "bmp" else encode_png(resized)
        return payload, fmt, channels

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "kind"]].copy()
            if real:
                resized = pdf["payload"].map(
                    lambda b: _resize_real(bytes(b)) if b is not None else None
                )
                out["payload"] = resized.map(lambda r: r and r[0])
                out["meta"] = resized.map(
                    lambda r: {
                        "width": width,
                        "height": height,
                        "channels": r[2],
                        "sample_rate": None,
                        "n_frames": None,
                        "format": r[1],
                    }
                    if r is not None
                    else None
                )
            else:
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

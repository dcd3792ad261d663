"""Multimodal plumbing (SURVEY.md §2.11): schema, Arrow UDF shapes,
determinism, JVM-side frame sampling, real BMP/WAV codecs, and the
unsupported-format gate."""

from __future__ import annotations

import numpy as np
import pytest

from mysql_hbase_replicator_spark.operators.media_codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    sniff_format,
)
from mysql_hbase_replicator_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    sample_frames,
    synthesize_media,
)


def test_decode_media_shapes_and_determinism(spark):
    media = synthesize_media(spark, 10, kind="image").repartition(4)
    decoded = decode_media(media)
    rows = {r.media_id: r for r in decoded.collect()}
    assert len(rows) == 10
    assert rows[0].width == 64 and rows[0].height == 48
    assert 0 <= rows[0].mean_intensity <= 255
    assert rows[0].byte_entropy > 0
    # deterministic across runs
    rows2 = {r.media_id: r for r in decode_media(media).collect()}
    assert rows[3].mean_intensity == rows2[3].mean_intensity
    assert rows[3].byte_entropy == rows2[3].byte_entropy


def test_bmp_codec_roundtrip():
    pixels = (np.arange(24 * 17 * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(17, 24, 3)
    data = encode_bmp(pixels)  # w=24 exercises row padding (24*3=72, pad-free) …
    assert sniff_format(data) == "bmp"
    assert np.array_equal(decode_bmp(data), pixels)
    odd = pixels[:, :23]  # … and w=23 (69 bytes → padded to 72)
    assert np.array_equal(decode_bmp(encode_bmp(np.ascontiguousarray(odd))), odd)


def test_wav_codec_roundtrip():
    mono = (np.arange(500, dtype=np.int64) * 37 % 4096 - 2048).astype(np.int16)
    data = encode_wav(mono, 8000)
    assert sniff_format(data) == "wav"
    samples, rate = decode_wav(data)
    assert rate == 8000 and np.array_equal(samples[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    samples2, _ = decode_wav(encode_wav(stereo, 44100))
    assert np.array_equal(samples2, stereo)


def test_real_decoder_decodes_bmp_end_to_end(spark):
    """decoder='real' runs the pure-numpy BMP parse inside mapInPandas:
    geometry comes from the decoded image, stats from real pixels."""
    media = synthesize_media(spark, 4, kind="bmp").repartition(2)
    rows = {r.media_id: r for r in decode_media(media, decoder="real").collect()}
    assert len(rows) == 4
    # recompute row 2's truth locally from the same deterministic pixels
    payload = bytes({r[0]: r for r in media.select("media_id", "payload").collect()}[2][1])
    pixels = decode_bmp(payload)
    assert (rows[2].width, rows[2].height) == (pixels.shape[1], pixels.shape[0]) == (32, 24)
    assert rows[2].mean_intensity == pytest.approx(float(pixels.mean()))
    assert rows[2].byte_entropy > 0


def test_real_decoder_decodes_wav_end_to_end(spark):
    media = synthesize_media(spark, 3, kind="wav").repartition(2)
    rows = {r.media_id: r for r in decode_media(media, decoder="real").collect()}
    assert len(rows) == 3
    payload = bytes({r[0]: r for r in media.select("media_id", "payload").collect()}[1][1])
    samples, rate = decode_wav(payload)
    assert rate == 16000 and samples.shape == (1600, 1)
    assert rows[1].width is None and rows[1].height is None
    assert rows[1].mean_intensity == pytest.approx(float(samples.mean()))


def test_real_decoder_rejects_unknown_formats(spark):
    """Opaque non-media bytes must fail loudly inside the UDF, not produce
    garbage stats."""
    media = synthesize_media(spark, 2)  # payload = raw sha256 bytes
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        decode_media(media, decoder="real").collect()


def test_extract_features_vector_shape(spark):
    media = synthesize_media(spark, 6, kind="image").repartition(3)
    feats = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert len(feats) == 6
    assert all(len(v) == FEATURE_DIM for v in feats.values())
    assert all(-1.0 <= x <= 1.0 for v in feats.values() for x in v)
    assert feats[1] != feats[2]  # distinct payloads → distinct features


def test_sample_frames_jvm_side(spark):
    media = synthesize_media(spark, 3, kind="audio")  # n_frames=100
    sampled = sample_frames(media, every_n=25)
    per_id = {}
    for r in sampled.collect():
        per_id.setdefault(r.media_id, []).append(r.frame_index)
    assert all(sorted(v) == [0, 25, 50, 75] for v in per_id.values())
    # pure-JVM plan: no Python evaluation node for the sampling itself
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan.lower()


def test_resize_media_plumbing(spark):
    from mysql_hbase_replicator_spark.operators.multimodal import (
        decode_media,
        resize_media,
        synthesize_media,
    )

    media = synthesize_media(spark, 5, kind="image")  # 256-byte payloads
    resized = resize_media(media, width=8, height=8)  # → 64 bytes
    rows = {r.media_id: r for r in resized.collect()}
    assert all(len(r.payload) == 64 for r in rows.values())
    assert rows[0].meta.width == 8 and rows[0].meta.height == 8
    # chained decode sees the resized geometry and byte count
    dec = {r.media_id: r for r in decode_media(resized).collect()}
    assert dec[0].n_bytes == 64 and dec[0].width == 8

def test_resize_media_real_bmp(spark):
    """Real nearest-neighbor resample: decode → index-sample → re-encode,
    all executor-side."""
    from mysql_hbase_replicator_spark.operators.multimodal import resize_media

    media = synthesize_media(spark, 3, kind="bmp")  # 32×24 gradients
    resized = resize_media(media, width=8, height=6, decoder="real")
    rows = {r.media_id: r for r in resized.collect()}
    assert rows[0].meta.width == 8 and rows[0].meta.height == 6
    pixels = decode_bmp(bytes(rows[0].payload))
    assert pixels.shape == (6, 8, 3)
    # nearest-neighbor truth from the original payload
    orig = decode_bmp(bytes({r[0]: r for r in media.select("media_id", "payload").collect()}[0][1]))
    ys = (np.arange(6) * 24 // 6).clip(0, 23)
    xs = (np.arange(8) * 32 // 8).clip(0, 31)
    assert np.array_equal(pixels, orig[ys][:, xs])

    # audio payloads need a DSP library → loud failure inside the UDF
    wav = synthesize_media(spark, 1, kind="wav")
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        resize_media(wav, decoder="real").collect()


def test_png_codec_roundtrip_all_filters():
    """PNG (r12 verdict #7): every decoder unfilter path (None/Sub/Up/
    Average/Paeth) round-trips grayscale, gray+alpha, RGB and RGBA shapes,
    including the 1xN row layout png_media_from_documents emits."""
    from mysql_hbase_replicator_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(13)
    shapes = [(1, 41), (11, 7), (5, 9, 3), (4, 6, 4), (3, 8, 2)]
    for shape in shapes:
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        for ft in range(5):
            data = encode_png(px, filter_type=ft)
            assert sniff_format(data) == "png"
            back = decode_png(data)
            assert back.shape == px.shape and np.array_equal(back, px), (shape, ft)


def test_png_decode_rejects_unsupported():
    from mysql_hbase_replicator_spark.operators.media_codecs import decode_png

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a" + b"\x00" * 32)


def test_real_decoder_decodes_png_end_to_end(spark):
    """decoder='real' inflates + unfilters PNG payloads inside mapInPandas;
    png_media_from_documents packs text bytes as 1xN grayscale pixels, so
    decoded geometry/stats equal the raw byte statistics."""
    from mysql_hbase_replicator_spark.operators.media_codecs import decode_png
    from mysql_hbase_replicator_spark.operators.multimodal import (
        png_media_from_documents,
    )

    docs = spark.createDataFrame(
        [(1, "hello png"), (2, "a" * 300), (3, "")],
        "doc_id long, text string",
    )
    media = png_media_from_documents(docs).repartition(2)
    rows = {r.media_id: r for r in decode_media(media, decoder="real").collect()}
    assert (rows[1].width, rows[1].height) == (9, 1)
    assert rows[1].mean_intensity == pytest.approx(
        float(np.frombuffer(b"hello png", dtype=np.uint8).mean())
    )
    assert (rows[2].width, rows[2].height) == (300, 1)
    assert rows[2].mean_intensity == pytest.approx(float(ord("a")))
    # empty document: NULL payload, NULL stats (a 0-pixel PNG is invalid)
    assert rows[3].width is None and rows[3].mean_intensity is None
    # and the payload really is a PNG whose pixels are the text bytes
    payload = bytes(
        {r[0]: r[1] for r in media.select("media_id", "payload").collect()}[1]
    )
    assert sniff_format(payload) == "png"
    assert decode_png(payload).tobytes() == b"hello png"


def test_resize_media_real_png(spark):
    """Real nearest-neighbor resample of PNG payloads: decode -> index-
    sample -> re-encode in the same container; the resized payload is a
    valid PNG of the target geometry."""
    from mysql_hbase_replicator_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )
    from mysql_hbase_replicator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
    )

    px = (np.arange(20 * 30 * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(20, 30, 3)
    rows = [(0, "image", bytearray(encode_png(px)), (30, 20, 3, None, None, "png"))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_media(media, width=8, height=6, decoder="real").collect()[0]
    resized = decode_png(bytes(out.payload))
    assert resized.shape == (6, 8, 3)
    assert out.meta["format"] == "png" and out.meta["channels"] == 3
    # nearest-neighbor ground truth
    ys = (np.arange(6) * 20 // 6).clip(0, 19)
    xs = (np.arange(8) * 30 // 8).clip(0, 29)
    assert np.array_equal(resized, px[ys][:, xs])


def test_multimodal_queries_match_oracle_on_null_and_empty_docs(spark, tmp_path):
    """Latent-contract check (r13 review): the multimodal query/oracle pairs
    must stay value-equal on corpora containing NULL and EMPTY documents —
    the shipped corpus has neither, so the sweep can't catch divergence
    here. Pinned divergences: DuckDB's LEAST skips NULLs (n_bytes 256 vs
    NULL), the RANGE cross join emits 16 feature rows for NULL text (vs
    Spark's NULL size), and numpy's mean of an empty payload is NaN (vs
    LIST_AVG's NULL)."""
    import duckdb
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from verify_local import compare

    import __spark_entry__ as se

    docs = spark.createDataFrame(
        [
            (1, "hello world", 11, "en"),
            (2, None, None, None),   # NULL text
            (3, "", 0, "en"),        # empty text
        ],
        "doc_id long, text string, n_chars long, lang string",
    )
    sf = str(tmp_path / "sf_null")
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    qs, oracles = se.queries(), se.oracle_sql()
    for name in (
        "multimodal_decode_stats",
        "multimodal_resize_stats",
        "multimodal_feature_extract",
    ):
        sdf = qs[name](spark, sf).toPandas()
        odf = con.sql(oracles[name]).df()
        assert not compare(name, sdf, odf), f"{name} diverges on NULL/empty docs"

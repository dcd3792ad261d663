"""Multimodal plumbing (SURVEY.md §2.11): schema, Arrow UDF shapes,
determinism, JVM-side frame sampling, stubbed real-decoder gate."""

from __future__ import annotations

import pytest

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


def test_real_decoder_is_explicitly_stubbed(spark):
    media = synthesize_media(spark, 2)
    with pytest.raises(NotImplementedError, match="not shipped"):
        decode_media(media, decoder="real")


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

    with pytest.raises(NotImplementedError, match="not shipped"):
        resize_media(media, decoder="real")

"""Adversarial-shape tests for the r6 adaptive knobs (r6 verdict #7).

adaptive_time_bucket and adaptive_salted_join both derive a parameter from
a data pass (span/occupancy histogram, sampled key histogram). The happy
path is swept elsewhere (test_window_rekey.py, bench --skew); these tests
pin the ugly shapes: degenerate spans, NULL/empty inputs, the max_salts
cap under extreme single-key skew, and a sampling pass that MISSES the hot
key entirely — where the contract is "correct, merely slower", never
wrong."""

from __future__ import annotations

from pyspark.sql import functions as F


# --- adaptive_time_bucket ---------------------------------------------------


def _bucketed(spark, df):
    from mysql_hbase_replicator_spark.operators.window_rekey import (
        adaptive_time_bucket,
    )

    b = adaptive_time_bucket(df, "ts", ["k"])
    return df.select("ts", b.alias("b"))


def test_time_bucket_single_instant(spark):
    """Every row on ONE timestamp: span is 1 µs, width must clamp to the
    floor and all rows land in one bucket (no zero/negative width, no
    divide-by-zero)."""
    df = spark.range(500).select(
        F.timestamp_micros(F.lit(1_700_000_000_000_000)).alias("ts"),
        F.lit("t").alias("k"),
    )
    got = _bucketed(spark, df)
    assert got.select("b").distinct().count() == 1
    assert got.where(F.col("b").isNull()).count() == 0


def test_time_bucket_all_null_ts(spark):
    """Rows exist but every ts is NULL (the ADVICE r6 crash shape): the
    width derivation must fall back instead of raising, and NULL ts rows
    bucket to NULL."""
    df = spark.range(100).select(
        F.lit(None).cast("timestamp").alias("ts"), F.lit("t").alias("k")
    )
    got = _bucketed(spark, df)  # must not raise
    assert got.count() == 100
    assert got.where(F.col("b").isNotNull()).count() == 0


def test_time_bucket_empty_input(spark):
    df = spark.range(0).select(
        F.current_timestamp().alias("ts"), F.lit("t").alias("k")
    )
    assert _bucketed(spark, df).count() == 0


def test_time_bucket_null_mixed_with_data(spark):
    """NULL-ts rows alongside real rows: width derives from the non-null
    span; NULLs group into their own (NULL) bucket."""
    real = spark.range(1000).select(
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000_000
        ).alias("ts"),
        F.lit("t").alias("k"),
    )
    df = real.unionByName(
        spark.range(7).select(
            F.lit(None).cast("timestamp").alias("ts"), F.lit("t").alias("k")
        )
    )
    got = _bucketed(spark, df)
    assert got.where(F.col("b").isNull()).count() == 7
    assert got.where(F.col("b").isNotNull()).count() == 1000


# --- adaptive_salted_join ---------------------------------------------------


def _probe(spark, n, hot_frac, n_cold_keys=50):
    hot_n = int(n * hot_frac)
    return spark.range(n).select(
        F.when(F.col("id") < hot_n, F.lit(0))
        .otherwise(F.col("id") % n_cold_keys + 1)
        .cast("long")
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def _build(spark, n_keys=60):
    return spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
    )


def _agg_rows(df):
    return sorted(
        tuple(r)
        for r in df.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 6).alias("sv"))
        .collect()
    )


def test_salt_width_hits_max_salts_cap(spark):
    """One key owns 99.9% of rows and the estimate wants far more lanes
    than max_salts: the width must cap exactly at max_salts and the join
    must still be correct."""
    from mysql_hbase_replicator_spark.operators.skew import (
        adaptive_salted_join,
        sampled_key_widths,
    )

    kw = dict(sample_fraction=0.2, rows_per_salt=50, max_salts=8)
    p = _probe(spark, 40_000, hot_frac=0.999)
    widths = sampled_key_widths(p, ["k"], **kw)
    hot = {w[0]: w[1] for w in widths}
    assert hot.get(0) == 8  # est ~40k/50 = 800 lanes, capped at max_salts
    got = _agg_rows(adaptive_salted_join(p, _build(spark), ["k"], **kw))
    want = _agg_rows(p.join(_build(spark), "k"))
    assert got == want


def test_salt_sample_misses_hot_key_still_correct(spark):
    """rows_per_salt so large that NO key qualifies (the same code path as
    a sample that never sees the hot key: the widths map is empty, every
    key gets width 1). The join must degrade to the plain shuffle join —
    slower, never wrong."""
    from mysql_hbase_replicator_spark.operators.skew import (
        adaptive_salted_join,
        sampled_key_widths,
    )

    kw = dict(sample_fraction=0.01, rows_per_salt=10_000_000, max_salts=64)
    p = _probe(spark, 20_000, hot_frac=0.9)
    assert sampled_key_widths(p, ["k"], **kw) == []
    got = _agg_rows(adaptive_salted_join(p, _build(spark), ["k"], **kw))
    want = _agg_rows(p.join(_build(spark), "k"))
    assert got == want


def test_salt_tiny_sample_fraction_correct_any_detection(spark):
    """A 1e-4 sample over 20k rows sees ~2 rows — whether or not it
    catches the hot key is luck of the seed; correctness must not depend
    on it."""
    from mysql_hbase_replicator_spark.operators.skew import adaptive_salted_join

    kw = dict(sample_fraction=0.0001, rows_per_salt=100, max_salts=16)
    p = _probe(spark, 20_000, hot_frac=0.75)
    got = _agg_rows(adaptive_salted_join(p, _build(spark), ["k"], **kw))
    want = _agg_rows(p.join(_build(spark), "k"))
    assert got == want


def test_salt_empty_probe_and_empty_build(spark):
    from mysql_hbase_replicator_spark.operators.skew import (
        adaptive_salted_join,
        sampled_key_widths,
    )

    empty_p = _probe(spark, 0, hot_frac=0.5)
    assert sampled_key_widths(empty_p, ["k"], sample_fraction=0.5) == []
    assert adaptive_salted_join(empty_p, _build(spark), ["k"]).count() == 0
    p = _probe(spark, 1_000, hot_frac=0.5)
    empty_b = _build(spark, n_keys=0)
    assert adaptive_salted_join(p, empty_b, ["k"]).count() == 0
    # left joins against an empty build keep every probe row
    assert adaptive_salted_join(p, empty_b, ["k"], how="left").count() == 1_000


def test_salted_join_spreads_identical_probe_rows(spark):
    """The salt must be a per-row nonce, not a content hash: a hot key's
    rows are often byte-identical (e.g. a probe pre-projected to its join
    keys), and a content hash landed them all in ONE lane while the build
    side still paid n_salts-fold replication (r13 review). Verified via the
    same salt expression the join applies; correctness of the join result
    is asserted alongside."""
    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.operators.skew import SALT, salted_join

    probe = spark.range(10_000).select(
        F.lit(1).alias("k"), F.lit("x").alias("v")
    )  # 10k byte-identical rows of one hot key
    build = spark.createDataFrame([(1, "dim")], "k int, d string")
    joined = salted_join(probe, build, ["k"], n_salts=8)
    assert joined.count() == 10_000  # exact join semantics preserved
    # lane spread: re-derive the salt the join assigns
    salted = probe.withColumn(
        SALT, F.pmod(F.monotonically_increasing_id(), F.lit(8)).cast("int")
    )
    n_lanes = salted.select(SALT).distinct().count()
    assert n_lanes == 8, f"identical rows collapsed into {n_lanes} lane(s)"


def test_salted_join_rejects_zero_salts(spark):
    """n_salts=0 made the probe salt pmod(x, 0) = NULL (ANSI off) and the
    join silently returned empty (r13 review) — must raise instead."""
    import pytest

    from mysql_hbase_replicator_spark.operators.skew import salted_join

    probe = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(probe, probe.select("k"), ["k"], n_salts=0)

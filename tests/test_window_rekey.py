"""Boundary-stitched re-keyed windows (operators/window_rekey.py).

The contract is *bit-identical* output vs the plain single-key window, so
every test here compares the stitched plan against a reference
``Window.partitionBy(key)`` computed on the same data — including the edge
cases the stitch must survive: buckets with fewer rows than the frame,
entirely empty buckets between populated ones, frames that chain across
several sparse buckets, and single-row buckets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_hbase_replicator_spark.operators.window_rekey import (
    STITCH_CARRY,
    stitched_range_frame,
    stitched_rows_frame,
)


def _rows_reference(df, frame_rows):
    w = (
        Window.partitionBy("k")
        .orderBy("pos")
        .rowsBetween(-(frame_rows - 1), Window.currentRow)
    )
    return df.select(
        "k",
        "pos",
        F.sum("v").over(w).alias("s"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.size(F.collect_set("v").over(w)).alias("d"),
    )


def _rows_stitched(df, frame_rows, bucket_width):
    stitched, w = stitched_rows_frame(
        df,
        keys=["k"],
        order_by=["pos"],
        bucket=F.floor(F.col("pos") / F.lit(bucket_width)),
        frame_rows=frame_rows,
    )
    return (
        stitched.select(
            "k",
            "pos",
            F.col(STITCH_CARRY),
            F.sum("v").over(w).alias("s"),
            F.count(F.lit(1)).over(w).alias("n"),
            F.size(F.collect_set("v").over(w)).alias("d"),
        )
        .where(~F.col(STITCH_CARRY))
        .drop(STITCH_CARRY)
    )


def _assert_same(a, b):
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb


@pytest.mark.parametrize("frame_rows", [3, 7])
@pytest.mark.parametrize("bucket_width", [1, 4, 10, 1000])
def test_rows_stitch_dense(spark, frame_rows, bucket_width):
    """Dense positions: every bucket populated; width 1 = one row per
    bucket (maximal chaining), 1000 = everything in one bucket (stitch is
    a no-op and must still be exact)."""
    rows = [(k, p, (p * 7 + k) % 5) for k in range(2) for p in range(40)]
    df = spark.createDataFrame(rows, "k int, pos int, v int")
    _assert_same(
        _rows_stitched(df, frame_rows, bucket_width), _rows_reference(df, frame_rows)
    )


def test_rows_stitch_sparse_and_empty_buckets(spark):
    """Positions with large gaps: carry must chain back across several
    empty/short buckets to fill the frame."""
    pos = [0, 1, 17, 18, 19, 53, 90, 91, 92, 93, 150]
    rows = [(0, p, p % 4) for p in pos]
    df = spark.createDataFrame(rows, "k int, pos int, v int")
    _assert_same(_rows_stitched(df, 5, 10), _rows_reference(df, 5))


def test_rows_stitch_frame_larger_than_any_bucket(spark):
    """frame_rows far exceeds every bucket's population — each destination
    needs carries from many source buckets."""
    rows = [(0, p, p) for p in range(0, 100, 3)]  # ~3 rows per width-10 bucket
    df = spark.createDataFrame(rows, "k int, pos int, v int")
    _assert_same(_rows_stitched(df, 20, 10), _rows_reference(df, 20))


def test_rows_stitch_multi_key(spark):
    """Keys with different bucket occupancy patterns stitch independently."""
    rows = [(0, p, p % 3) for p in range(30)] + [(1, p * 9, p) for p in range(12)]
    df = spark.createDataFrame(rows, "k int, pos int, v int")
    _assert_same(_rows_stitched(df, 6, 8), _rows_reference(df, 6))


@pytest.mark.parametrize("bucket_width", [1000, 2500, 10_000])
def test_range_stitch_matches_plain(spark, bucket_width):
    """RANGE frame: stitched result equals the plain window, including
    value ties (peer rows) and values exactly at bucket edges."""
    vals = (
        [i * 37 % 9000 for i in range(300)]
        + [1000, 2000, 2000, 3000, 9000 - 1000]  # exact-boundary and tie cases
        + [0, 1, 999, 1000, 1001]
    )
    rows = [(i % 3, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k int, val double")

    wp = Window.partitionBy("k").orderBy("val").rangeBetween(-1000, Window.currentRow)
    ref = df.select("k", "val", F.count(F.lit(1)).over(wp).alias("n"),
                    F.sum("val").over(wp).alias("s"))

    stitched, w = stitched_range_frame(
        df, keys=["k"], order_col="val", bucket_width=bucket_width, preceding=1000
    )
    got = (
        stitched.select(
            "k", "val", F.col(STITCH_CARRY),
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum("val").over(w).alias("s"),
        )
        .where(~F.col(STITCH_CARRY))
        .drop(STITCH_CARRY)
    )
    _assert_same(got, ref)


def test_range_stitch_rejects_narrow_buckets(spark):
    df = spark.createDataFrame([(0, 1.0)], "k int, val double")
    with pytest.raises(ValueError, match="bucket_width"):
        stitched_range_frame(df, ["k"], "val", bucket_width=500, preceding=1000)


def test_registered_queries_match_plain_window_form(spark):
    """The three re-keyed registry queries equal their original
    single-partition-key formulations on real data (sf0.001)."""
    from mysql_hbase_replicator_spark.plans.queries_events import (
        ROLLING_FRAME,
        ZSCORE_FRAME,
        ZSCORE_THRESH,
    )
    from mysql_hbase_replicator_spark.plans.registry import (
        QUERY_REGISTRY,
        load_all_queries,
    )
    from mysql_hbase_replicator_spark.sources.tables import load_table

    load_all_queries()
    sf = "/root/testdata/sf0.001"

    # window_count_distinct_rolling
    e = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLLING_FRAME - 1), Window.currentRow)
    )
    ref = e.select(
        "event_id",
        "event_type",
        F.size(F.collect_set("user_id").over(w)).cast("int").alias("n_distinct_users"),
    )
    _assert_same(QUERY_REGISTRY["window_count_distinct_rolling"](spark, sf), ref)

    # events_anomaly_zscore
    ez = e.filter(F.col("value").isNotNull())
    x9 = F.floor(F.col("value") * F.lit(1000000000.0)).cast("decimal(18,0)")
    wz = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ZSCORE_FRAME - 1), Window.currentRow)
    )
    m = ez.select(
        "event_id",
        "event_type",
        x9.alias("x9"),
        F.count(F.lit(1)).over(wz).alias("n"),
        F.sum(x9).over(wz).cast("double").alias("s1"),
        F.sum(x9 * x9).over(wz).cast("double").alias("s2"),
    )
    nvar = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    zval = F.when(
        (F.col("n") > 1) & (nvar > 0),
        (F.col("x9").cast("double") - F.col("s1") / F.col("n"))
        / F.sqrt(F.greatest(nvar / (F.col("n") * (F.col("n") - 1)), F.lit(0.0))),
    )
    refz = m.select(
        "event_id",
        "event_type",
        F.round(zval, 6).alias("zscore"),
        F.coalesce(F.abs(zval) > ZSCORE_THRESH, F.lit(False)).alias("is_anomaly"),
    )
    _assert_same(QUERY_REGISTRY["events_anomaly_zscore"](spark, sf), refz)

    # window_range_numeric
    o = load_table(spark, sf, "orders")
    wr = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    refr = o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.count(F.lit(1)).over(wr).alias("n_within_1000"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(wr)
        .cast("double")
        .alias("sum_within_1000"),
    )
    _assert_same(QUERY_REGISTRY["window_range_numeric"](spark, sf), refr)


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("bucket_width", [1, 7, 1000])
def test_global_rank_row_number(spark, descending, bucket_width):
    """Stitched global row_number equals the plain-window row_number for a
    total ordering, under any bucket granularity and both directions."""
    from mysql_hbase_replicator_spark.operators.window_rekey import (
        stitched_global_rank,
    )

    rows = [(k, (p * 13 + k * 5) % 97, p) for k in range(2) for p in range(60)]
    df = spark.createDataFrame(rows, "k int, v int, tb int")
    order = [F.desc("v"), F.desc("tb")] if descending else [F.col("v"), F.col("tb")]
    got = stitched_global_rank(
        df, ["k"], order, "v", bucket_width, descending=descending
    ).select("k", "v", "tb", F.col("_rn").alias("rn"), F.col("_n").alias("n"))
    w = Window.partitionBy("k").orderBy(*order)
    ref = df.select(
        "k", "v", "tb",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    _assert_same(got, ref)


@pytest.mark.parametrize("bucket_width", [1, 5, 1000])
def test_global_rank_with_ties(spark, bucket_width):
    """RANK/DENSE_RANK with tie groups (duplicated values) — local ranks +
    distinct-value offsets must reproduce the SQL semantics exactly."""
    from mysql_hbase_replicator_spark.operators.window_rekey import (
        stitched_global_rank,
    )

    vals = [5, 5, 5, 9, 9, 12, 12, 12, 12, 1, 3, 3, 20, 20, 7]
    rows = [(i % 2, v) for i, v in enumerate(vals)] + [(0, 5), (1, 9)]
    df = spark.createDataFrame(rows, "k int, v int")
    got = stitched_global_rank(
        df, ["k"], [F.desc("v")], "v", bucket_width,
        descending=True, with_ties=True,
    ).select("k", "v", F.col("_rank").alias("r"), F.col("_dense").alias("d"))
    w = Window.partitionBy("k").orderBy(F.desc("v"))
    ref = df.select(
        "k", "v", F.rank().over(w).alias("r"), F.dense_rank().over(w).alias("d")
    )
    _assert_same(got, ref)


def test_ntile_formula_matches_spark(spark):
    """ntile_from_rank reproduces F.ntile for ragged partition sizes,
    including n < k."""
    from mysql_hbase_replicator_spark.operators.window_rekey import (
        ntile_from_rank,
        stitched_global_rank,
    )

    rows = [(k, p) for k, sz in [(0, 11), (1, 8), (2, 3), (3, 1)] for p in range(sz)]
    df = spark.createDataFrame(rows, "k int, v int")
    for k in (4, 3, 7):
        got = stitched_global_rank(df, ["k"], [F.col("v")], "v", 4).select(
            "k", "v", ntile_from_rank(F.col("_rn"), F.col("_n"), k).alias("t")
        )
        w = Window.partitionBy("k").orderBy("v")
        ref = df.select("k", "v", F.ntile(k).over(w).alias("t"))
        _assert_same(got, ref)


def test_rank_family_registry_queries_match_plain_window(spark):
    """The three re-keyed rank-family registry queries equal their original
    plain-window formulations on real data (sf0.001)."""
    from mysql_hbase_replicator_spark.plans.registry import (
        QUERY_REGISTRY,
        load_all_queries,
    )
    from mysql_hbase_replicator_spark.sources.tables import load_table

    load_all_queries()
    sf = "/root/testdata/sf0.001"

    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    ref = o.select(
        "o_orderkey", "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
    _assert_same(QUERY_REGISTRY["window_ntile_percent"](spark, sf), ref)

    w2 = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ref2 = o.select(
        "o_orderkey", "o_orderpriority",
        F.cume_dist().over(w2).alias("cd"),
        F.first("o_orderkey").over(wf).alias("cheapest_key"),
        F.last("o_orderkey").over(wf).alias("running_last_key"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
    )
    _assert_same(QUERY_REGISTRY["window_cume_dist_first_last"](spark, sf), ref2)

    s = load_table(spark, sf, "supplier")
    w3 = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"))
    ref3 = s.select(
        "s_nationkey", "s_suppkey", "s_acctbal",
        F.rank().over(w3).alias("bal_rank"),
        F.dense_rank().over(w3).alias("bal_dense_rank"),
    )
    _assert_same(QUERY_REGISTRY["window_rank_dense"](spark, sf), ref3)


# --- property tier: random inputs vs the plain window ----------------------
try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:

    @st.composite
    def rekey_case(draw):
        n = draw(st.integers(min_value=0, max_value=50))
        rows = [
            (
                draw(st.integers(min_value=0, max_value=2)),   # key
                draw(st.integers(min_value=-40, max_value=120)),  # pos (gaps, negatives)
                draw(st.integers(min_value=0, max_value=6)),   # value
                i,                                             # unique tiebreak
            )
            for i in range(n)
        ]
        frame = draw(st.integers(min_value=1, max_value=12))
        width = draw(st.sampled_from([1, 3, 7, 16, 1000]))
        return rows, frame, width

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(rekey_case())
    def test_property_rows_stitch_equals_plain(spark_prop, case):
        """Random keys/positions (duplicates, gaps, negative buckets, empty
        input) x random frame and bucket width: stitched ROWS frame must be
        bit-identical to the plain window."""
        rows, frame, width = case
        df = spark_prop.createDataFrame(rows, "k int, pos int, v int, tb int")
        stitched, w = stitched_rows_frame(
            df,
            keys=["k"],
            order_by=["pos", "tb"],
            bucket=F.floor(F.col("pos") / F.lit(width)),
            frame_rows=frame,
        )
        got = (
            stitched.select(
                "k", "pos", "tb", F.col(STITCH_CARRY),
                F.sum("v").over(w).alias("s"),
                F.count(F.lit(1)).over(w).alias("n"),
            )
            .where(~F.col(STITCH_CARRY))
            .drop(STITCH_CARRY)
        )
        wp = (
            Window.partitionBy("k")
            .orderBy("pos", "tb")
            .rowsBetween(-(frame - 1), Window.currentRow)
        )
        ref = df.select(
            "k", "pos", "tb",
            F.sum("v").over(wp).alias("s"),
            F.count(F.lit(1)).over(wp).alias("n"),
        )
        _assert_same(got, ref)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(rekey_case())
    def test_property_global_rank_equals_plain(spark_prop, case):
        """Random data x random bucket width: stitched global rank state
        (with ties, on the duplicated value column) must match RANK /
        DENSE_RANK from the plain window."""
        from mysql_hbase_replicator_spark.operators.window_rekey import (
            stitched_global_rank,
        )

        rows, _frame, width = case
        df = spark_prop.createDataFrame(rows, "k int, pos int, v int, tb int")
        got = stitched_global_rank(
            df, ["k"], [F.col("pos")], "pos", width, with_ties=True
        ).select("k", "pos", "tb", F.col("_rank").alias("r"), F.col("_dense").alias("d"))
        wp = Window.partitionBy("k").orderBy("pos")
        ref = df.select(
            "k", "pos", "tb",
            F.rank().over(wp).alias("r"),
            F.dense_rank().over(wp).alias("d"),
        )
        _assert_same(got, ref)


def test_adaptive_time_bucket_tracks_density(spark):
    """The adaptive bucket width is an occupancy knob: 10x the rows in the
    same time span must produce ~10x the buckets (until the 1-hour floor),
    and the resulting bucket column must be non-decreasing in ts — the
    stitch kernels' correctness precondition."""
    from mysql_hbase_replicator_spark.operators.window_rekey import (
        adaptive_time_bucket,
    )

    def events(n):
        # n rows spread over 100 days, one synthetic key
        return spark.range(n).select(
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * (8_640_000_000_000 // n)
            ).alias("ts"),
            F.lit("t").alias("k"),
        )

    def n_buckets(n_rows, **kw):
        df = events(n_rows)
        b = adaptive_time_bucket(df, "ts", ["k"], **kw)
        return df.select(b.alias("b")).distinct().count()

    # explicit target_rows: the property under test is the FORMULA (10x
    # rows => ~10x buckets), independent of the sweep-tuned default
    # (2000 -> 8000 in r17, SCALING.md)
    small = n_buckets(4_000, target_rows=2_000)
    big = n_buckets(40_000, target_rows=2_000)
    assert small >= 2
    assert 5 * small <= big <= 20 * small, (small, big)
    # the 1-hour floor: absurdly small targets can't fragment past span/1h
    assert n_buckets(40_000, target_rows=1) <= 100 * 24 + 1  # +1: span edge

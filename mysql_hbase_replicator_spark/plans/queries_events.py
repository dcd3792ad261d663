"""Event-time analytics over the `events` stream table (SURVEY.md §2.5/§2.7).

The reference's only aggregation surface is streaming counters — per-op and
per-table event counts (`HbaseApplier.scala:110,120,125-135`,
`MySQLExtractor.scala:217-223`); it has no event-time processing at all
(binlog order is total, SURVEY §2.7). Our engine adds the standard
Structured-Streaming window family. Each query below is the exact batch
equivalent of its streaming form — `F.window` / `F.session_window` produce
identical groupings under `readStream` with a watermark — so the DuckDB
oracle checks the streaming semantics on frozen input.

`events.ts` is TIMESTAMP(NANOS) in parquet: oracles CAST to µs-precision
TIMESTAMP, matching what sources/tables.py does on the Spark side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_hbase_replicator_spark.plans.queries import SQL_MSUM, SQL_TS, msum, ts_str
from mysql_hbase_replicator_spark.plans.registry import query
from mysql_hbase_replicator_spark.sources.tables import load_table


@query(
    "events_op_counters",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def events_op_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-op running counters — the batch form of the reference's only
    aggregation (`HbaseApplier.scala:125-135` per-op counts, streamed as
    groupBy(op).count() with outputMode('update'))."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


@query(
    "events_tumbling_window",
    oracle=f"""
    SELECT {SQL_TS("DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))")} AS window_start, event_type,
           COUNT(*) AS n_events,
           {SQL_MSUM("value")} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling-window counts/sums per event type. Streaming form:
    identical plan under readStream + withWatermark('ts', ...); windows are
    epoch-aligned so DATE_TRUNC is the exact oracle. Decimal-exact sum keeps
    the value hash shuffle-order-independent."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), msum(F.col("value")).alias("sum_value"))
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_sliding_window",
    oracle="""
    SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S.%f') AS window_start, COUNT(*) AS n_events
    FROM (
        SELECT UNNEST([DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)),
                       DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR]) AS ws
        FROM events
    )
    GROUP BY ws
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every hour: each event lands in two windows
    (starting at its hour floor and one hour before). Spark assigns via
    F.window(ts, '2 hours', '1 hour'); the oracle materializes the same two
    starts per event explicitly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(ts_str(F.col("w.start")).alias("window_start"), "n_events")
    )


@query(
    "events_session_window",
    oracle="""
    WITH t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         < INTERVAL 10 MINUTE
                    THEN 0 ELSE 1 END AS new_s
        FROM t
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id, STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           STRFTIME(MAX(ts) + INTERVAL 10 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap
    (`F.session_window` — the applyInPandasWithState-free path for custom
    sessionization). Session end = last event + gap, merging when the gap is
    strictly under 10 minutes; the oracle is the classic gaps-and-islands
    rewrite. One shuffle on user_id either way — scale-safe."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            ts_str(F.col("w.start")).alias("session_start"),
            ts_str(F.col("w.end")).alias("session_end"),
            "n_events",
        )
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view
        FROM events GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, v.t_view,
               MIN(CASE WHEN e.event_type = 'click'
                         AND CAST(e.ts AS TIMESTAMP) > v.t_view
                        THEN CAST(e.ts AS TIMESTAMP) END) AS t_click
        FROM events e JOIN v USING (user_id)
        GROUP BY e.user_id, v.t_view
    ),
    p AS (
        SELECT c.user_id, c.t_view, c.t_click,
               MIN(CASE WHEN e.event_type = 'purchase'
                         AND CAST(e.ts AS TIMESTAMP) > c.t_click
                        THEN CAST(e.ts AS TIMESTAMP) END) AS t_purchase
        FROM events e JOIN c USING (user_id)
        GROUP BY c.user_id, c.t_view, c.t_click
    )
    SELECT COUNT(*) AS n_users,
           COUNT(t_view) AS stage_view,
           COUNT(t_click) AS stage_click,
           COUNT(t_purchase) AS stage_purchase
    FROM p
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel counted per user — genuinely SEQUENTIAL: first view,
    then the first click AFTER that view, then the first purchase AFTER
    that click. The previous form compared global per-stage minima
    ("first click > first view"), which drops a user whose earliest click
    predates their first view even when a qualifying later click exists
    (r13 review: the docstring promised sequential semantics the
    implementation didn't have, and the oracle faithfully encoded the same
    approximation so the hash check couldn't catch it).

    Scale shape: three chained conditional-min windows over ONE user_id
    partitioning — each stage's threshold is the previous stage's window
    column, so no self-join per stage and the exchange is planned once;
    the per-user collapse and the 1-row rollup follow. Per-user state is
    O(1), skew-free (mins combine map-side)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    et, ts = F.col("event_type"), F.col("ts")
    staged = (
        e.withColumn("t_view", F.min(F.when(et == "view", ts)).over(w))
        .withColumn(
            "t_click",
            F.min(F.when((et == "click") & (ts > F.col("t_view")), ts)).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(F.when((et == "purchase") & (ts > F.col("t_click")), ts)).over(w),
        )
    )
    u = staged.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),  # constant per user; max = the value
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("stage_view"),
        F.count("t_click").alias("stage_click"),
        F.count("t_purchase").alias("stage_purchase"),
    )


@query(
    "events_user_retention",
    oracle="""
    WITH d AS (SELECT user_id,
                      DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS active_day
               FROM events),
    a AS (SELECT DISTINCT user_id, active_day FROM d),
    c AS (SELECT user_id, MIN(active_day) AS cohort_day FROM d GROUP BY user_id)
    SELECT STRFTIME(c.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(DATEDIFF('day', c.cohort_day, a.active_day) AS INT) AS day_offset,
           COUNT(*) AS n_active
    FROM a JOIN c USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day, counted
    on each later active day as a day offset. Three keyed shuffles, all on
    user_id or the tiny (cohort, offset) key: dedup to (user, day), per-user
    min for the cohort, a co-partitioned user_id join (both sides were just
    shuffled on user_id, so AQE reuses the exchange), then the final rollup
    whose key space is O(days²) regardless of corpus size."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    d = e.select("user_id", day.alias("active_day"))
    a = d.distinct()
    c = d.groupBy("user_id").agg(F.min("active_day").alias("cohort_day"))
    return (
        a.join(c, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("active_day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "events_interarrival_stats",
    oracle="""
    WITH g AS (
        SELECT user_id,
               EPOCH_US(CAST(ts AS TIMESTAMP))
                 - EPOCH_US(LAG(CAST(ts AS TIMESTAMP))
                              OVER (PARTITION BY user_id
                                    ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS gap_us
        FROM events
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           CAST(CAST(SUM(gap_us) AS BIGINT) AS DOUBLE) / COUNT(gap_us) AS avg_gap_us,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM g
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival-time statistics (microsecond gaps between
    consecutive events) — the feed for rate-anomaly and bot detection, and
    the lag()-under-window companion to the session queries. Gaps are exact
    integer epoch-microsecond differences (no float time math), so the
    double mean is a single exact division. One shuffle on user_id for the
    window + the same key for the aggregate — AQE reuses the exchange."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        e.select("user_id", gap.alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            (F.sum("gap_us").cast("double") / F.count("gap_us")).alias("avg_gap_us"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


@query(
    "events_hourly_error_rate",
    oracle=f"""
    SELECT {SQL_TS("DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))")} AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_errors,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS error_rate
    FROM events
    GROUP BY 1
    """,
)
def events_hourly_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour error-rate SLO metric — the ratio form of the tumbling
    window (conditional sum over count, one exact double division). The
    same plan runs under readStream with a watermark; alert thresholds
    compare against error_rate downstream. One shuffle on the hour key."""
    e = load_table(spark, sf_dir, "events")
    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            n_err.alias("n_errors"),
            (n_err.cast("double") / F.count(F.lit(1))).alias("error_rate"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "n_events",
            "n_errors",
            "error_rate",
        )
    )


@query(
    "events_activity_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
        FROM events
    ),
    grouped AS (
        SELECT user_id, d,
               d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                        AS INT) AS grp
        FROM days
    )
    SELECT user_id,
           STRFTIME(MIN(d), '%Y-%m-%d') AS streak_start,
           STRFTIME(MAX(d), '%Y-%m-%d') AS streak_end,
           CAST(COUNT(*) AS INT) AS streak_days
    FROM grouped
    GROUP BY user_id, grp
    """,
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-day streaks per user — the gaps-and-islands
    pattern in its canonical form: distinct active days, then
    day − row_number() is constant exactly within a consecutive run, so one
    groupBy collapses each island. Two shuffles on user_id (dedup + window,
    AQE reuses the exchange) and one on the island key."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    return grouped.groupBy("user_id", "grp").agg(
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
        F.date_format(F.max("d"), "yyyy-MM-dd").alias("streak_end"),
        F.count(F.lit(1)).cast("int").alias("streak_days"),
    ).drop("grp")


# sessionization: assign explicit session ordinals per user (gap > 30 min
# starts a new session) — the per-event form of the session_window aggregate,
# needed when downstream features join on a session id
SESSION_GAP_US = 1_800_000_000


def _sessionized(e, *cols, cast_int: bool = False):
    """The 30-minute gaps-and-islands session ordinal — ONE definition of
    the gap rule and its (ts, event_id) tiebreak, shared by
    events_sessionize_ids / events_top_sessions / events_session_paths
    (r13 review: three byte-near-identical copies meant a gap-rule change
    had to land in six places counting the oracles). One (user_id)
    shuffle: the lag and the running sum share partitioning and ordering,
    so Spark evaluates them over one sort; per-user state is O(1).
    Returns ``e.select(*cols, session_num)``."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) > SESSION_GAP_US),
        1,
    ).otherwise(0)
    snum = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if cast_int:
        snum = snum.cast("int")
    return e.select(*cols, snum.alias("session_num"))


@query(
    "events_sessionize_ids",
    oracle=f"""
    WITH o AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
    m AS (
        SELECT event_id, user_id, t,
               CASE WHEN LAG(t) OVER w IS NULL
                      OR EPOCH_US(t) - EPOCH_US(LAG(t) OVER w) > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM o
        WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    )
    SELECT event_id, user_id,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
             AS session_num
    FROM m
    """,
)
def events_sessionize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: every event gets its user's session
    ordinal, where a >30-minute silence starts a new session. This is the
    per-event companion to ``events_session_window`` (which aggregates per
    session): training pipelines need the id ON the event row to join
    session-level features back.

    Scale shape: one (user_id) shuffle; both windows (lag, running sum)
    share the same partitioning and ordering so Spark evaluates them in one
    Window node pair over one sort, and per-user state is O(1). Gap
    arithmetic is integer micros (unix_micros / EPOCH_US) on both engines —
    no float boundary risk."""
    e = load_table(spark, sf_dir, "events")
    return _sessionized(e, "event_id", "user_id", cast_int=True)


# rolling distinct cardinality: Spark has no COUNT(DISTINCT) OVER, so the
# engine expresses it as size(collect_set() over frame) — bounded state
# (frame width), codegen'd, and exactly equal to the SQL form
ROLLING_FRAME = 100

# coarse re-key bucket for the low-cardinality-key windows below: events
# span ~30 days, so 1-day buckets give #event_types x ~30 window partitions
# at any SF; at 100x the data you shrink the width (the stitch cost is
# O(#buckets x frame) carry rows, independent of bucket size)
DAY_BUCKET_US = 86_400_000_000


@query(
    "window_count_distinct_rolling",
    oracle=f"""
    SELECT event_id, event_type,
           CAST(COUNT(DISTINCT user_id) OVER (
                PARTITION BY event_type
                ORDER BY CAST(ts AS TIMESTAMP), event_id
                ROWS BETWEEN {ROLLING_FRAME - 1} PRECEDING AND CURRENT ROW)
             AS INT) AS n_distinct_users
    FROM events
    """,
)
def window_count_distinct_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct-user cardinality over the last {ROLLING_FRAME}
    events per event type — the windowed form of count_distinct that ANSI
    allows but Spark's window functions don't: re-expressed as
    ``size(collect_set(user_id))`` over the same ROWS frame, which is
    exactly equivalent (set semantics, not an estimate).

    Scale shape: event_type has ~5 distinct values, so a plain
    partitionBy(event_type) window caps parallelism at 5 tasks each
    sorting 20% of the fact table. The registered plan instead re-keys on
    (event_type, 1-day time bucket) via the boundary-stitched ROWS kernel
    (operators/window_rekey.py): each bucket's trailing FRAME-1 rows are
    replicated into its successor so the first rows of every bucket see
    their full frame — bit-identical output, and per-row state is still
    the bounded {ROLLING_FRAME}-element set. r6: the bucket width is
    adaptive (window_rekey.adaptive_time_bucket) — a fixed 1-day bucket
    left per-task sorts growing linearly with density (measured 6.3× for
    10× data at sf≈10); the width now targets ~2k rows per (type, bucket)
    task from one cheap stats pass."""
    from mysql_hbase_replicator_spark.operators.window_rekey import (
        STITCH_CARRY,
        adaptive_time_bucket,
        stitched_rows_frame,
    )

    e = load_table(spark, sf_dir, "events")
    stitched, w = stitched_rows_frame(
        e,
        keys=["event_type"],
        order_by=["ts", "event_id"],
        bucket=adaptive_time_bucket(e, "ts", ["event_type"]),
        frame_rows=ROLLING_FRAME,
    )
    return (
        stitched.withColumn(
            "n_distinct_users",
            F.size(F.collect_set("user_id").over(w)).cast("int"),
        )
        .where(~F.col(STITCH_CARRY))
        .select("event_id", "event_type", "n_distinct_users")
    )


# rolling z-score anomaly flag: per event type, each value scored against
# the mean/std of its trailing window — the monitoring-side analytic over
# the same op-counter stream the reference exposes via JMX (§2.8)
ZSCORE_FRAME = 50
ZSCORE_THRESH = 3.0


@query(
    "events_anomaly_zscore",
    oracle=f"""
    WITH q AS (
        SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS t,
               CAST(FLOOR(value * 1000000000.0) AS DECIMAL(18,0)) AS x9
        FROM events WHERE value IS NOT NULL
    ),
    m AS (
        SELECT event_id, event_type, x9,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(x9) OVER w AS DOUBLE) AS s1,
               CAST(SUM(CAST(x9 AS DECIMAL(36,0)) * x9) OVER w AS DOUBLE) AS s2
        FROM q
        WINDOW w AS (PARTITION BY event_type ORDER BY t, event_id
                     ROWS BETWEEN {ZSCORE_FRAME - 1} PRECEDING AND CURRENT ROW)
    ),
    z AS (
        SELECT event_id, event_type, n,
               CASE WHEN n > 1 AND (n * s2 - s1 * s1) > 0
                    THEN (CAST(x9 AS DOUBLE) - s1 / n)
                         / SQRT(GREATEST((n * s2 - s1 * s1) / (n * (n - 1)), 0.0))
                    ELSE NULL END AS zval
        FROM m
    )
    SELECT event_id, event_type, ROUND(zval, 6) AS zscore,
           COALESCE(ABS(zval) > {ZSCORE_THRESH}, FALSE) AS is_anomaly
    FROM z
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score outlier detection per event type: each value scored
    against the trailing {ZSCORE_FRAME}-event mean/std. Moments accumulate
    on the 1e-9 quantized integer grid (decimal window sums — exact and
    shuffle-order-free), and the z closed form runs on identical doubles in
    both engines; z itself is scale-invariant so the quantization unit
    cancels.

    Scale shape: like window_count_distinct_rolling, the plain
    partitionBy(event_type) form caps parallelism at ~5 tasks, so the
    registered plan re-keys on (event_type, adaptive time bucket) through
    the boundary-stitched ROWS kernel (operators/window_rekey.py) — the
    carried FRAME-1 boundary rows feed the three running moments but emit
    no output row, so the result is bit-identical to the single-key
    window. r6: bucket width adaptive (~2k rows per task), same rationale
    as window_count_distinct_rolling."""
    from mysql_hbase_replicator_spark.operators.window_rekey import (
        STITCH_CARRY,
        adaptive_time_bucket,
        stitched_rows_frame,
    )

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x9 = F.floor(F.col("value") * F.lit(1000000000.0)).cast("decimal(18,0)")
    stitched, w = stitched_rows_frame(
        e.withColumn("x9", x9),
        keys=["event_type"],
        order_by=["ts", "event_id"],
        bucket=adaptive_time_bucket(e, "ts", ["event_type"]),
        frame_rows=ZSCORE_FRAME,
    )
    m = (
        stitched.select(
            "event_id",
            "event_type",
            "x9",
            F.col(STITCH_CARRY),
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum("x9").over(w).cast("double").alias("s1"),
            F.sum(F.col("x9") * F.col("x9")).over(w).cast("double").alias("s2"),
        )
        .where(~F.col(STITCH_CARRY))
        .drop(STITCH_CARRY)
    )
    nvar = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    zval = F.when(
        (F.col("n") > 1) & (nvar > 0),
        (F.col("x9").cast("double") - F.col("s1") / F.col("n"))
        / F.sqrt(F.greatest(nvar / (F.col("n") * (F.col("n") - 1)), F.lit(0.0))),
    )
    return m.select(
        "event_id",
        "event_type",
        F.round(zval, 6).alias("zscore"),
        F.coalesce(F.abs(zval) > ZSCORE_THRESH, F.lit(False)).alias("is_anomaly"),
    )


TOP_SESSIONS_N = 20


@query(
    "events_top_sessions",
    oracle=f"""
    WITH o AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
    m AS (
        SELECT event_id, user_id, t,
               CASE WHEN LAG(t) OVER w IS NULL
                      OR EPOCH_US(t) - EPOCH_US(LAG(t) OVER w) > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM o
        WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    s AS (
        SELECT event_id, user_id, t,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
                 AS session_num
        FROM m
    ),
    sess AS (
        SELECT user_id, session_num,
               CAST(COUNT(*) AS INT) AS n_events,
               CAST(EPOCH_US(MAX(t)) - EPOCH_US(MIN(t)) AS BIGINT) AS duration_us
        FROM s GROUP BY user_id, session_num
    )
    SELECT user_id, session_num, n_events, duration_us
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY duration_us DESC, user_id,
                                       session_num) AS rn FROM sess)
    WHERE rn <= {TOP_SESSIONS_N}
    """,
)
def events_top_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_SESSIONS_N} longest sessions corpus-wide — the composition of
    events_sessionize_ids with a per-session rollup and a global top-k:
    session boundaries from the same gap rule, duration as integer micros
    (exact on both engines), total order (duration desc, user, session) so
    the cut is deterministic.

    Scale shape: the sessionize window and the (user_id, session_num)
    rollup share the (user_id) partitioning — one shuffle reused across the
    window and the aggregate; the global top-k is a TakeOrderedAndProject
    over the tiny per-session table, never a full sort."""
    e = load_table(spark, sf_dir, "events")
    s = _sessionized(e, "user_id", "ts", cast_int=True)
    sess = s.groupBy("user_id", "session_num").agg(
        F.count(F.lit(1)).cast("int").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )
    return sess.orderBy(
        F.desc("duration_us"), "user_id", "session_num"
    ).limit(TOP_SESSIONS_N)


@query(
    "events_time_weighted_avg",
    oracle="""
    WITH o AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t, value
               FROM events),
    d AS (
        SELECT user_id, value,
               EPOCH_US(LEAD(t) OVER (PARTITION BY user_id
                                      ORDER BY t, event_id))
                 - EPOCH_US(t) AS dur_us
        FROM o
    )
    SELECT user_id,
           ROUND(CAST(SUM(CAST(value * dur_us AS DECIMAL(25,6))) AS DOUBLE)
                 / CAST(SUM(dur_us) AS BIGINT), 6) AS twa_value,
           CAST(SUM(dur_us) AS BIGINT) AS active_span_us
    FROM d
    WHERE dur_us IS NOT NULL
    GROUP BY user_id
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user under last-value-holds
    interpolation: each event's value persists until the user's next event,
    so its weight is the gap to the successor (the final event carries no
    weight). The metering/IoT aggregate that plain AVG gets wrong whenever
    sampling is irregular.

    Scale shape: one (user_id) shuffle shared by the LEAD window and the
    groupBy (same key, AQE reuses the exchange); per-user window state is
    O(1). Determinism: gaps are integer epoch-micros and the weighted sum
    is decimal-exact; the ~21-significant-digit numerator's decimal→double
    conversion can differ by 1 ulp across engines, so the quotient is
    ROUNDed to 6 dp (the repo's statistical-aggregate convention)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    return (
        e.select("user_id", "value", dur.alias("dur_us"))
        .filter(F.col("dur_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum((F.col("value") * F.col("dur_us")).cast("decimal(25,6)"))
                .cast("double")
                / F.sum("dur_us"),
                6,
            ).alias("twa_value"),
            F.sum("dur_us").alias("active_span_us"),
        )
    )


@query(
    "events_cumulative_distinct_users",
    oracle="""
    WITH f AS (
        SELECT user_id,
               MIN(CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE))
                 AS first_day
        FROM events
        GROUP BY user_id
    )
    SELECT STRFTIME(first_day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_new_users,
           CAST(SUM(COUNT(*)) OVER (ORDER BY first_day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM f
    GROUP BY first_day
    """,
)
def events_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the growth-curve query. A naive
    COUNT(DISTINCT) per expanding day range is quadratic in days and
    reshuffles the fact table per day; the scale-safe identity is
    first-touch attribution: distinct-to-date(d) = Σ new-users(d'), d'≤d.
    One (user_id) groupBy computes each user's first active day (map-side
    partial MIN makes the shuffle carry one row per user per partition);
    the day-level running sum then runs over a ≤#days-row aggregate, so the
    single-partition window at the end is over a bounded, tiny frame — the
    fact table never passes through an unpartitioned window."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts")).cast("date")).alias("first_day")
    )
    per_day = first.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        "n_new_users",
        F.sum("n_new_users").over(w).alias("cum_users"),
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH o AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t, event_type
               FROM events),
    p AS (
        SELECT event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY t, event_id) AS prev_type
        FROM o
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS DOUBLE)
             AS prob
    FROM p
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user actions: for every
    (previous event type → next event type) pair, the transition count and
    the row-normalized probability — the behavioral fingerprint features a
    sequence model trains on.

    Scale shape: the LAG window and nothing else touches the fact table —
    one (user_id) shuffle with O(1) per-user state. The normalizing
    SUM-over-prev_type window looks like a low-cardinality-key window but
    runs AFTER the groupBy, over the #types x #types aggregate (25 rows at
    any SF) — the re-key treatment the big windows get is unnecessary when
    the window input is already bounded by the type-pair domain. Division
    is bigint/bigint evaluated in double on identical operands."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = e.select(
        F.col("event_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = p.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    norm = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(norm).cast("double")
        ).alias("prob"),
    )


@query(
    "events_user_activity_pareto",
    oracle="""
    WITH pc AS (SELECT user_id, COUNT(*) AS n_ev FROM events GROUP BY user_id),
    h AS (SELECT n_ev, CAST(COUNT(*) AS BIGINT) AS n_users FROM pc GROUP BY n_ev)
    SELECT n_ev AS events_per_user,
           n_users,
           CAST(SUM(n_users) OVER w AS BIGINT) AS cum_users,
           CAST(SUM(n_ev * n_users) OVER w AS BIGINT) AS cum_events,
           CAST(SUM(n_ev * n_users) OVER w AS DOUBLE)
             / CAST((SELECT SUM(n_ev * n_users) FROM h) AS DOUBLE)
             AS event_share_cume
    FROM h
    WINDOW w AS (ORDER BY n_ev DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def events_user_activity_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration (Pareto) curve: for each events-per-user level,
    descending, how many users are at least that active and what share of
    all events they generate — the how-heavy-is-the-head question behind
    per-user sampling caps.

    The scale-safe formulation: ranking users directly would need a global
    sort of #users rows; instead the fact table collapses to per-user
    counts (one shuffle, map-side combine), counts collapse to a
    count-of-counts histogram (second tiny shuffle), and the cumulative
    window runs over the DISTINCT ACTIVITY LEVELS — bounded by
    max-events-per-user, hundreds of rows at any corpus size — so the
    single-partition window is over a domain-bounded aggregate, never the
    data. The denominator is a 1-row broadcast."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    pc = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))
    h = pc.groupBy("n_ev").agg(F.count(F.lit(1)).alias("n_users"))
    total = h.agg(
        F.sum(F.col("n_ev") * F.col("n_users")).alias("tot_events")
    )
    w = Window.orderBy(F.desc("n_ev")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        h.withColumn("cum_users", F.sum("n_users").over(w))
        .withColumn("cum_events", F.sum(F.col("n_ev") * F.col("n_users")).over(w))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("n_ev").alias("events_per_user"),
            "n_users",
            "cum_users",
            "cum_events",
            (
                F.col("cum_events").cast("double")
                / F.col("tot_events").cast("double")
            ).alias("event_share_cume"),
        )
    )


# top-k session openers: how many leading event types define a "path"
PATH_LEN = 3
TOP_PATHS_N = 20


@query(
    "events_session_paths",
    oracle=f"""
    WITH o AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t, event_type
               FROM events),
    m AS (
        SELECT user_id, event_id, t, event_type,
               CASE WHEN LAG(t) OVER w IS NULL
                      OR EPOCH_US(t) - EPOCH_US(LAG(t) OVER w) > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM o
        WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    s AS (
        SELECT user_id, event_id, t, event_type,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_num
        FROM m
    ),
    r AS (
        SELECT user_id, session_num, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, session_num
                                  ORDER BY t, event_id) AS rn
        FROM s
    ),
    paths AS (
        SELECT user_id, session_num,
               STRING_AGG(event_type, '>' ORDER BY rn) AS path
        FROM r
        WHERE rn <= {PATH_LEN}
        GROUP BY user_id, session_num
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {TOP_PATHS_N}
    """,
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-opener path mining: the {TOP_N} most common sequences of the
    first {LEN} event types in a session (30-minute gap rule) — the
    behavioral n-gram table that seeds next-action models and funnel
    hypotheses.

    Scale shape: sessionization (lag + running sum), the per-session rank,
    and the path assembly all share ONE (user_id) shuffle — the three
    windows and the (user_id, session_num) groupBy are key-prefix
    compatible, so Spark chains them over a single sort. The path count is
    a second shuffle over one row per session, and the top-20 is a
    TakeOrderedAndProject on a domain-bounded aggregate (≤ #types^{LEN}
    paths). The ORDER BY rn inside STRING_AGG has a Spark twin: the
    per-session collect happens on rows pre-sorted by the rank window, and
    the first-{LEN} filter keeps the collected array bounded."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    s = _sessionized(e, "user_id", "event_id", "ts", "event_type")
    wr = Window.partitionBy("user_id", "session_num").orderBy("ts", "event_id")
    r = s.withColumn("rn", F.row_number().over(wr)).filter(F.col("rn") <= PATH_LEN)
    paths = (
        r.groupBy("user_id", "session_num")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ).getField("event_type"),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(TOP_PATHS_N)
    )


# docstring placeholder substitution — guarded: under `python -OO`
# docstrings strip to None and the bare .replace crashed the module import
# (and with it load_all_queries / the whole driver, r13 review)
if events_session_paths.__doc__:
    events_session_paths.__doc__ = events_session_paths.__doc__.replace(
        "{TOP_N}", str(TOP_PATHS_N)
    ).replace("{LEN}", str(PATH_LEN))


@query(
    "events_dau_wau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
        FROM events
    ),
    expanded AS (
        SELECT user_id, d + CAST(i AS INT) AS target_day
        FROM ud, UNNEST(RANGE(0, 7)) AS u(i)
    ),
    wau AS (
        SELECT target_day, COUNT(DISTINCT user_id) AS wau
        FROM expanded GROUP BY target_day
    ),
    dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d)
    SELECT STRFTIME(dau.d, '%Y-%m-%d') AS day, dau.dau,
           wau.wau,
           CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
    FROM dau JOIN wau ON wau.target_day = dau.d
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    triple. The scale problem is WAU: COUNT(DISTINCT) over a sliding
    7-day frame per day re-scans the window naively. The distributed
    identity used here: a user active on day d contributes to WAU(d..d+6),
    so EXPLODE each distinct (user, day) into its 7 target days (map-side,
    bounded ×7) and take one exact COUNT(DISTINCT) per target day — two
    shuffles total ((user, day) dedup, then the per-day distinct), frame
    re-scan eliminated, and the same shape handles MAU with ×30.
    Stickiness is bigint/bigint in double — exact both engines. Days with
    no activity produce no row (inner join on the dau side)."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).distinct()
    expanded = ud.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "d"
    ).select("user_id", F.date_add(F.col("d"), F.col("i")).alias("target_day"))
    wau = expanded.groupBy("target_day").agg(
        F.count_distinct("user_id").alias("wau")
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, dau.d == wau.target_day)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
    )


@query(
    "events_weekday_hour_profile",
    oracle="""
    SELECT CAST(DAYOFWEEK(CAST(ts AS TIMESTAMP)) + 1 AS INT) AS dow,
           CAST(HOUR(CAST(ts AS TIMESTAMP)) AS INT) AS hour,
           COUNT(*) AS n_events,
           CAST(COUNT(*) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM events) AS DOUBLE) AS traffic_share
    FROM events
    GROUP BY 1, 2
    """,
)
def events_weekday_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality heat-map: event volume per (day-of-week, hour)
    cell with its share of total traffic — the capacity-planning profile
    and the prior behind anomaly baselines (events_anomaly_zscore's
    day-bucket re-key assumes exactly this kind of diurnal structure).
    One map-side-combined groupBy into a ≤7×24-cell grid; the total is a
    1-row broadcast scalar. DAYOFWEEK +1 aligns DuckDB's 0=Sunday with
    Spark's 1=Sunday (same convention note as scalar_date_arith_funcs);
    shares are bigint/bigint in double — exact."""
    e = load_table(spark, sf_dir, "events")
    total = e.agg(F.count(F.lit(1)).alias("tot"))
    return (
        e.groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(total))
        .select(
            "dow",
            "hour",
            "n_events",
            (F.col("n_events").cast("double") / F.col("tot").cast("double")).alias(
                "traffic_share"
            ),
        )
    )


# one mid-range ISO week of the 30-day events range, [start, end)
PRUNE_WEEK_START, PRUNE_WEEK_END = "2024-01-08", "2024-01-15"


@query(
    "events_pruned_week_error_rate",
    oracle=f"""
    SELECT {SQL_TS("DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))")} AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_errors,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS error_rate
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '{PRUNE_WEEK_START} 00:00:00'
      AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '{PRUNE_WEEK_END} 00:00:00'
    GROUP BY 1
    """,
)
def events_pruned_week_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-aware variant of events_hourly_error_rate: the events table is
    first materialized day-partitioned (operators/layout.py
    ensure_day_partitioned — the write-side contract the reference delegates
    to HBase region servers, HbaseApplier.scala:226-275), and the
    date-bounded scan then eliminates 23 of 30 day directories at PLANNING
    time: the scan node shows ``PartitionFilters`` on event_date, and zero
    I/O happens for out-of-range days. At 100 TB this is the difference
    between scanning one week and scanning the full history — predicate
    pushdown alone still opens every file's footer and reads every
    row-group whose ts min/max straddles the bound.

    The oracle runs the equivalent ts-range filter over the RAW events
    table, proving the partitioned layout changes scan cost only, never
    results (event_date = to_date(ts) in UTC, so the date bounds and the
    ts bounds select identical rows). The layout build itself is
    fingerprint-cached against the source parquet, one-time per SF."""
    from mysql_hbase_replicator_spark.operators.layout import (
        LAYOUT_CACHE_ROOT,
        ensure_day_partitioned,
    )

    dst = os.path.join(
        LAYOUT_CACHE_ROOT,
        os.path.abspath(sf_dir).strip("/").replace("/", "_"),
        "events_by_day",
    )
    path = ensure_day_partitioned(
        spark,
        load_table(spark, sf_dir, "events"),
        f"{sf_dir}/events.parquet",
        dst,
    )
    e = spark.read.parquet(path).filter(
        (F.col("event_date") >= F.lit(PRUNE_WEEK_START))
        & (F.col("event_date") < F.lit(PRUNE_WEEK_END))
    )
    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            n_err.alias("n_errors"),
            (n_err.cast("double") / F.count(F.lit(1))).alias("error_rate"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "n_events",
            "n_errors",
            "error_rate",
        )
    )


@query(
    "events_resample_ffill",
    oracle=f"""
    WITH bounds AS (
        SELECT user_id,
               DATE_TRUNC('hour', MIN(CAST(ts AS TIMESTAMP))) AS h0,
               DATE_TRUNC('hour', MAX(CAST(ts AS TIMESTAMP))) AS h1
        FROM events GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS gts
        FROM bounds
    ),
    ranked AS (
        SELECT user_id, DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS gts, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
               ) AS rn
        FROM events
    ),
    hourly AS (SELECT user_id, gts, value FROM ranked WHERE rn = 1),
    joined AS (
        SELECT g.user_id, g.gts, h.value,
               COUNT(h.value) OVER (
                   PARTITION BY g.user_id ORDER BY g.gts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS grp
        FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.gts = h.gts
    )
    SELECT user_id, {SQL_TS("gts")} AS grid_ts,
           MAX(value) OVER (PARTITION BY user_id, grp) AS value_ffill,
           CASE WHEN value IS NULL THEN 1 ELSE 0 END AS is_filled
    FROM joined
    """,
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user resample onto a regular hourly grid with forward fill — the
    time-series regularization step that turns an irregular event stream
    into model-ready fixed-step sequences (gap-aware feature tables,
    downsampled monitoring rollups). Each user's grid spans their own
    [first, last] event hour; the carried value is the LAST event in or
    before each grid hour (ties broken by event_id, the ingest order).

    Scale shape: the grid is ``sequence()`` per key — O(keys x span) rows,
    generated distributed, never on the driver; the hour-collapse is one
    map-side-combined groupBy; the fill is a per-key ``last(ignorenulls)``
    running window, O(n log n) within each key's partition. Nothing is
    quadratic and no global sort exists; at 100 TB the shuffles are keyed
    by user_id (the natural partitioning of every other events query).
    The oracle reproduces the fill with the count-over/max-over-group
    trick since DuckDB's LAST_VALUE lacks IGNORE NULLS."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("gts"),
    )
    hourly = (
        e.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("gts"))
        .agg(F.max_by("value", F.struct(F.col("ts"), F.col("event_id"))).alias("value"))
    )
    joined = grid.join(hourly, ["user_id", "gts"], "left")
    w = Window.partitionBy("user_id").orderBy("gts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "user_id",
        ts_str(F.col("gts")).alias("grid_ts"),
        F.last("value", ignorenulls=True).over(w).alias("value_ffill"),
        F.when(F.col("value").isNull(), 1).otherwise(0).alias("is_filled"),
    )


@query(
    "events_hourly_p95_exact",
    oracle=f"""
    WITH ranked AS (
        SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS h,
               value, event_id,
               ROW_NUMBER() OVER (PARTITION BY DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))
                                  ORDER BY value NULLS LAST, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)))
                   AS n
        FROM events
    )
    SELECT {SQL_TS("h")} AS window_start,
           CAST(n AS BIGINT) AS n_events,
           value AS p95_value
    FROM ranked
    WHERE rn = CAST(CEIL(0.95 * n) AS BIGINT)
    ORDER BY h
    """,
)
def events_hourly_p95_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-hour p95 latency by rank selection: within each hour the
    p95 is THE stored value at row ⌈0.95·n⌉ under a (value, event_id)
    total order — selection, not interpolation, so the output is a
    bit-identical scan value on any engine (percentile_cont/approx differ
    in interpolation and sketch semantics across engines; rank selection
    sidesteps both). The event_id tiebreak makes the picked row unique
    even under duplicate values.

    The monitoring twin of events_hourly_error_rate (reference parity: the
    reference's latency rings keep p50/p95/p99 ring-buffer samples,
    Metrics.scala via SURVEY §2.8 — this is the event-time exact batch
    form). Scale: one shuffle on the hour key; within a partition the sort
    is hour-local. At 100 TB the same shape runs per (hour, shard) with a
    final merge, or swaps to approx_percentile once cross-engine equality
    stops being the contract."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    h = F.date_trunc("hour", F.col("ts"))
    # NULLS LAST on both engines: Spark's ASC default is NULLS FIRST while
    # DuckDB's is NULLS LAST — an hour containing NULL values would shift
    # the ceil(0.95·n) pick to a smaller value on the Spark side only
    # (r13 review; latent — the generator emits no NULL values)
    wh = Window.partitionBy(h).orderBy(F.asc_nulls_last("value"), "event_id")
    ranked = e.select(
        h.alias("h"),
        "value",
        F.row_number().over(wh).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(h)).alias("n"),
    )
    return (
        ranked.where(F.col("rn") == F.ceil(0.95 * F.col("n")))
        .select(
            ts_str(F.col("h")).alias("window_start"),
            F.col("n").alias("n_events"),
            F.col("value").alias("p95_value"),
        )
        .orderBy("window_start")
    )


# --------------------------------------------------------------------------
# Shared scaffolding for the LIVE streaming CORRECTNESS rows (windowed
# watermark + stateful sessions): one batch split and one landing writer,
# with the split mirrored verbatim in both oracles. The split manufactures
# genuine late data — b0 = days <= 10 with even event_id, b1 = days 11-12,
# b2 = the WITHHELD odd-id early rows + days 13-15, b3 = the rest.
# --------------------------------------------------------------------------

# the split as DuckDB SQL (b column) — must stay term-for-term identical
# to _stream_batch_no below
_SQL_STREAM_BATCH = """CASE WHEN DATE_PART('day', CAST(ts AS TIMESTAMP)) <= 10
                         AND event_id % 2 = 0 THEN 0
                    WHEN DATE_PART('day', CAST(ts AS TIMESTAMP))
                         BETWEEN 11 AND 12 THEN 1
                    WHEN DATE_PART('day', CAST(ts AS TIMESTAMP)) <= 15 THEN 2
                    ELSE 3 END"""

# the batch-split CASE above, the streaming oracles' unrolled closed forms,
# and the dedup row's explicit batch list are all written for EXACTLY this
# many batches — change them together or not at all
N_STREAM_FILES = 4


def _stream_batch_no():
    """The 4-way batch split as a Spark Column (twin of _SQL_STREAM_BATCH)."""
    day = F.dayofmonth("ts")
    return (
        F.when((day <= 10) & (F.col("event_id") % 2 == 0), 0)
        .when(day.between(11, 12), 1)
        .when(day <= 15, 2)
        .otherwise(3)
        .cast("int")
    )


def _write_mtime_landing(tagged: DataFrame, root: str):
    """Write the `_b`-tagged frame as N_STREAM_FILES one-file-per-batch
    landing files with strictly increasing mtimes (the file source admits
    them in that order under maxFilesPerTrigger=1) and return
    (landing_dir, row schema). Cleans landing/ckpt/updates subdirs first —
    a stale streaming checkpoint beside a fresh landing would skip
    batches."""
    import glob as _glob
    import shutil as _shutil
    import time as _time

    landing = os.path.join(root, "landing")
    for d in (landing, os.path.join(root, "ckpt"), os.path.join(root, "updates")):
        _shutil.rmtree(d, ignore_errors=True)
    os.makedirs(landing)
    now = _time.time()
    schema = None
    for k in range(N_STREAM_FILES):
        part_df = tagged.filter(F.col("_b") == k).drop("_b").coalesce(1)
        schema = part_df.schema
        tmp = os.path.join(root, f"_stage_{k}")
        part_df.write.mode("overwrite").parquet(tmp)
        parts = sorted(_glob.glob(os.path.join(tmp, "*.parquet")))
        dst = os.path.join(landing, f"b{k}.parquet")
        os.replace(parts[0], dst)
        os.utime(dst, (now + k, now + k))
        _shutil.rmtree(tmp, ignore_errors=True)
    return landing, schema


def _await_drain(q) -> None:
    """awaitTermination returns False on timeout WITHOUT raising — letting
    the cache helper record then would cache a partial updates log as
    complete (r16 review)."""
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError(
            "streaming drain did not finish within 600s; "
            "updates log is partial and was NOT cached"
        )


# --------------------------------------------------------------------------
# T3 (SURVEY §2.7): the watermark late-drop rule through a REAL Structured
# Streaming drain. Every other events_* row states the batch equivalent of
# its streaming form; this one runs the streaming form itself — readStream
# over mtime-ordered files, withWatermark + windowed count, update-mode
# foreachBatch sink — so the engine's actual drop/accept decisions are what
# the DuckDB oracle hash-checks.
#
# The drop rule was pinned EMPIRICALLY (r16, scripted probes — do not trust
# docs here): the filter for micro-batch N uses the watermark derived from
# data through batch N-2 (one batch of lag behind the progress-reported
# value: the reported wm for batch N is max event time through batch N-1
# minus the delay, but the value a batch's late filter actually applies is
# the one committed at the START of the previous batch); a row is dropped
# iff its WINDOW END <= that watermark (inclusive; the predicate tests the
# window, not the raw ts — a row whose ts is behind the watermark but whose
# window is still open is accepted). Eviction uses the CURRENT reported
# watermark (the stateful-sessions probes separated the two), which equals
# the NEXT batch's late-filter value — so an evicted window can never be
# resurrected by a late row and the oracle's closed form is stable.
# --------------------------------------------------------------------------
@query(
    "events_stream_windowed_watermark",
    oracle=f"""
    WITH e AS (
        SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               {_SQL_STREAM_BATCH} AS b
        FROM events
    ),
    bmax AS (SELECT b, MAX(ts) AS mx FROM e GROUP BY b),
    wm AS (
        -- filter watermark for batch b: max event time over batches
        -- <= b-2, minus the 1h delay (NULL for the first two batches:
        -- everything accepted, matching the engine's epoch watermark)
        SELECT bb.b,
               (SELECT MAX(p.mx) FROM bmax p WHERE p.b <= bb.b - 2)
                   - INTERVAL 1 HOUR AS w
        FROM (SELECT DISTINCT b FROM e) bb
    ),
    acc AS (
        -- accepted iff the window END is strictly past the watermark
        -- (drop iff end <= wm: the inclusive boundary, probe-pinned)
        SELECT e.event_type, DATE_TRUNC('hour', e.ts) AS ws
        FROM e JOIN wm ON wm.b = e.b
        WHERE wm.w IS NULL
           OR DATE_TRUNC('hour', e.ts) + INTERVAL 1 HOUR > wm.w
    )
    SELECT {SQL_TS('ws')} AS window_start, event_type, COUNT(*) AS cnt
    FROM acc GROUP BY 1, 2
    """,
)
def events_stream_windowed_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-window counts per event type through a live streaming drain
    with late data: the events table splits into four mtime-ordered landing
    files — b0 = days <= 10 with even event_id, b1 = days 11-12, b2 = the
    WITHHELD odd-id early rows (genuine late arrivals, mostly dropped
    against the watermark batch 0 established) + days 13-15, b3 = the rest
    — drained by one Trigger.AvailableNow query (maxFilesPerTrigger=1) in
    update mode into a parquet updates log. The final report takes each
    (window, type) key's LAST update: cumulative counts over exactly the
    rows the engine accepted.

    Scale shape: the drain is the standard streaming-agg topology (one
    shuffle per micro-batch onto state-store partitions, state bounded by
    watermark eviction); the updates log is append-only parquet and the
    report a window over O(#windows x #types) rows. The drain is
    fingerprint-cached per (app, sf_dir) like the snapshot-transport rows
    — re-verification replays the report, not the stream."""
    from pyspark.sql import Window

    upd = _windowed_drain_updates(spark, sf_dir, "wmdrain", "update")
    w = Window.partitionBy("ws", "event_type").orderBy(F.col("_bid").desc())
    return (
        upd.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            ts_str(F.col("ws")).alias("window_start"),
            "event_type",
            "cnt",
        )
    )


def _windowed_drain_updates(
    spark: SparkSession, sf_dir: str, tag: str, mode: str
) -> DataFrame:
    """The shared windowed-count drain (both output modes): split events
    through the 4-file landing, run withWatermark + hour-window counts,
    append every emitted row (stamped with its batch id) to an updates
    log, return the log. Fingerprint-cached per (app, sf_dir, tag)."""
    from mysql_hbase_replicator_spark.plans.queries_extra import (
        fingerprint_cached_root,
    )

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    tagged = e.withColumn("_b", _stream_batch_no())

    def drain(root: str) -> None:
        landing, schema = _write_mtime_landing(tagged, root)
        ckpt = os.path.join(root, "ckpt")
        updates = os.path.join(root, "updates")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(landing)
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

        def fb(df: DataFrame, bid: int) -> None:
            (
                df.select(
                    F.col("w.start").alias("ws"),
                    "event_type",
                    "cnt",
                    F.lit(bid).alias("_bid"),
                )
                .write.mode("append")
                .parquet(updates)
            )

        q = (
            agg.writeStream.outputMode(mode)
            .foreachBatch(fb)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drain(q)

    root = fingerprint_cached_root(
        spark, sf_dir, tag, ("events.parquet",),
        exists=lambda r: os.path.isdir(os.path.join(r, "updates")),
        build=drain,
    )
    return spark.read.parquet(os.path.join(root, "updates"))


# Append mode: the emission-timing twin of the update row. Probe-pinned
# (r16): a window emits exactly once, in the first batch whose reported
# watermark reaches its END (inclusive — end == wm emits); the final
# no-data batch emits with wm = max event time over ALL batches minus the
# delay, so the emitted SET is {windows: end <= final wm} over accepted
# rows, and still-open windows are never emitted.
@query(
    "events_stream_windowed_append",
    oracle=f"""
    WITH e AS (
        SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               {_SQL_STREAM_BATCH} AS b
        FROM events
    ),
    bmax AS (SELECT b, MAX(ts) AS mx FROM e GROUP BY b),
    wm AS (
        SELECT bb.b,
               (SELECT MAX(p.mx) FROM bmax p WHERE p.b <= bb.b - 2)
                   - INTERVAL 1 HOUR AS w
        FROM (SELECT DISTINCT b FROM e) bb
    ),
    fin AS (SELECT MAX(EPOCH_MS(ts)) - 3600000 AS wf FROM e),
    acc AS (
        SELECT e.event_type, DATE_TRUNC('hour', e.ts) AS ws
        FROM e JOIN wm ON wm.b = e.b
        WHERE wm.w IS NULL
           OR DATE_TRUNC('hour', e.ts) + INTERVAL 1 HOUR > wm.w
    )
    SELECT window_start, event_type, cnt FROM (
        SELECT ws, {SQL_TS('ws')} AS window_start, event_type,
               COUNT(*) AS cnt
        FROM acc GROUP BY ws, event_type
    ), fin
    WHERE EPOCH_MS(ws + INTERVAL 1 HOUR) <= wf
    """,
)
def events_stream_windowed_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The append-mode twin of events_stream_windowed_watermark: same
    drain, same late-drop rule, but windows emit exactly once when the
    watermark passes their end — so the report is simply every emitted
    row, and the oracle adds one closed-form term to the update row's:
    keep only windows whose end <= the final watermark (inclusive,
    probe-pinned; still-open windows never emit). Counts cover exactly
    the accepted rows because a window's late rows are dropped by the
    same inclusive boundary once it has emitted. Scale shape identical
    to the update row."""
    upd = _windowed_drain_updates(spark, sf_dir, "wmappend", "append")
    return upd.select(
        ts_str(F.col("ws")).alias("window_start"), "event_type", "cnt"
    )


# --------------------------------------------------------------------------
# §2.9 custom stateful operator (applyInPandasWithState) as a CORRECTNESS
# row. Semantics pinned by probes (r16), extending the windowed row's
# findings to GroupState:
#   - late filter: drop iff ts <= wm_report(N-1) (inclusive, LAGGED — a
#     row at exactly the prior watermark is dropped);
#   - event-time timeout: fires at batch N for keys WITHOUT data iff
#     timeout_ts < wm_report(N) (STRICT, the CURRENT reported watermark —
#     a timeout at exactly the watermark does not fire);
#   - a key whose timeout expired but whose data arrives in the SAME
#     batch merges (no emission, session continues);
#   - Trigger.AvailableNow runs one final NO-DATA batch whose watermark
#     covers the last data batch, firing remaining eligible timeouts;
#     state still open after it is discarded.
# All arithmetic is integer ms/us on BOTH engines (the engine tracks
# watermarks in ms; the function floors event times the same way), so no
# float boundary can flip a verdict.
# --------------------------------------------------------------------------

_SESSION_GAP_MS = 2 * 3600 * 1000  # close a session 2h (watermark time) after its last event


def _stateful_sessions_oracle_sql() -> str:
    g = _SESSION_GAP_MS
    # per-batch state sim, unrolled over the 4 data batches + the final
    # no-data batch. cK/lK = state (count, last event us) after batch K;
    # tK = timeout ms; eK = emitted at batch K. Timeout on the data path is
    # GREATEST(last_ms, wm_ms) + gap — mirrors the operator, which must
    # never set a timeout at/below the current watermark (Spark rejects it).
    step = """
    s{K} AS (
        SELECT *,
            (c{P} IS NOT NULL AND n{K} IS NULL AND t{P} < w{K}) AS e{K},
            CASE WHEN n{K} IS NOT NULL THEN COALESCE(c{P}, 0) + n{K}
                 WHEN c{P} IS NOT NULL AND NOT (t{P} < w{K}) THEN c{P}
            END AS c{K},
            CASE WHEN n{K} IS NOT NULL THEN GREATEST(COALESCE(l{P}, m{K}), m{K})
                 WHEN c{P} IS NOT NULL AND NOT (t{P} < w{K}) THEN l{P}
            END AS l{K},
            CASE WHEN n{K} IS NOT NULL
                 THEN GREATEST(GREATEST(COALESCE(l{P}, m{K}), m{K}) // 1000,
                               w{K}) + {G}
                 WHEN c{P} IS NOT NULL AND NOT (t{P} < w{K}) THEN t{P}
            END AS t{K}
        FROM s{P})"""
    steps = ",".join(
        step.format(K=k, P=k - 1, G=g) for k in (1, 2, 3)
    )
    return f"""
    WITH e AS (
        SELECT event_id, user_id,
               CAST(DATE_PART('day', CAST(ts AS TIMESTAMP)) AS INT) AS day,
               CAST(ts AS TIMESTAMP) AS ts,
               {_SQL_STREAM_BATCH} AS b
        FROM events
    ),
    bmax AS (SELECT b, MAX(EPOCH_MS(ts)) AS mxms FROM e GROUP BY b),
    wmv AS (
        SELECT
            COALESCE((SELECT MAX(mxms) FROM bmax WHERE b <= 0) - 3600000, 0) AS w1,
            COALESCE((SELECT MAX(mxms) FROM bmax WHERE b <= 1) - 3600000, 0) AS w2,
            COALESCE((SELECT MAX(mxms) FROM bmax WHERE b <= 2) - 3600000, 0) AS w3,
            COALESCE((SELECT MAX(mxms) FROM bmax WHERE b <= 3) - 3600000, 0) AS wf
    ),
    acc AS (
        -- late filter: batch N drops ts <= wm_report(N-1) (lagged,
        -- inclusive); batches 0 and 1 see the epoch watermark
        SELECT e.* FROM e, wmv
        WHERE CASE e.b WHEN 0 THEN TRUE
                       WHEN 1 THEN TRUE
                       WHEN 2 THEN EPOCH_US(e.ts) > w1 * 1000
                       ELSE EPOCH_US(e.ts) > w2 * 1000 END
    ),
    gb AS (SELECT user_id, day, b, COUNT(*) AS n, MAX(EPOCH_US(ts)) AS mx
           FROM acc GROUP BY 1, 2, 3),
    gp AS (SELECT user_id, day,
           MAX(CASE WHEN b = 0 THEN n END) AS n0, MAX(CASE WHEN b = 0 THEN mx END) AS m0,
           MAX(CASE WHEN b = 1 THEN n END) AS n1, MAX(CASE WHEN b = 1 THEN mx END) AS m1,
           MAX(CASE WHEN b = 2 THEN n END) AS n2, MAX(CASE WHEN b = 2 THEN mx END) AS m2,
           MAX(CASE WHEN b = 3 THEN n END) AS n3, MAX(CASE WHEN b = 3 THEN mx END) AS m3
           FROM gb GROUP BY user_id, day),
    s0 AS (
        SELECT gp.*, wmv.*,
            n0 AS c0, m0 AS l0,
            CASE WHEN n0 IS NOT NULL
                 THEN GREATEST(m0 // 1000, 0) + {g} END AS t0
        FROM gp, wmv),
    {steps},
    em AS (
        SELECT user_id, day, c0 AS cnt, l0 AS end_us FROM s1 WHERE e1
        UNION ALL SELECT user_id, day, c1, l1 FROM s2 WHERE e2
        UNION ALL SELECT user_id, day, c2, l2 FROM s3 WHERE e3
        UNION ALL SELECT user_id, day, c3, l3 FROM s3
                  WHERE c3 IS NOT NULL AND t3 < wf
    )
    SELECT user_id, day, cnt AS n_events, end_us AS session_end_us FROM em
    """


@query("events_stream_stateful_sessions", oracle=_stateful_sessions_oracle_sql())
def events_stream_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity sessions through a LIVE applyInPandasWithState
    drain with event-time timeouts: each user's GroupState accumulates
    (count, last event time); a session closes — emitting (user_id,
    n_events, session_end_us) — when the watermark passes its timeout
    (last event + 2h of watermark time) in a batch where the user is
    silent. The same 4-file late-data landing as the windowed row drives
    genuine drops, merges-after-expiry, multi-session users, and the
    final no-data batch. Sessions still open at stream end are discarded
    (never emitted) — the oracle states the whole closure in integer ms.

    Scale shape: the canonical custom-stateful topology — one shuffle per
    micro-batch onto state-store partitions, per-key state a few longs,
    bounded by timeout eviction; Arrow-batched per-group pandas calls; the
    updates log is append-only parquet. Fingerprint-cached per
    (app, sf_dir) like the windowed row."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from mysql_hbase_replicator_spark.plans.queries_extra import (
        fingerprint_cached_root,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", F.dayofmonth("ts").alias("day")
    )
    tagged = e.withColumn("_b", _stream_batch_no())
    gap_ms = _SESSION_GAP_MS

    def drain(root: str) -> None:
        landing, schema = _write_mtime_landing(tagged, root)
        ckpt = os.path.join(root, "ckpt")
        updates = os.path.join(root, "updates")

        def fn(key, pdfs, state):
            import pandas as pd

            if state.hasTimedOut:
                cnt, last_us = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "day": [key[1]],
                        "n_events": [cnt],
                        "session_end_us": [last_us],
                    }
                )
            else:
                n = 0
                mx_us = None
                for pdf in pdfs:
                    if len(pdf):
                        n += len(pdf)
                        m = int(pd.Timestamp(pdf["ts"].max()).value // 1000)
                        mx_us = m if mx_us is None else max(mx_us, m)
                cnt, last_us = state.get if state.exists else (0, 0)
                if mx_us is not None:
                    last_us = max(last_us, mx_us)
                cnt += n
                state.update((cnt, last_us))
                # timeout must stay ABOVE the current watermark (Spark
                # rejects earlier values): a session whose (late but
                # accepted) last event trails the watermark still gets a
                # full gap of watermark time — mirrored in the oracle
                state.setTimeoutTimestamp(
                    max(last_us // 1000, state.getCurrentWatermarkMs()) + gap_ms
                )
                return iter(())

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(landing)
        )
        sessions = (
            stream.withWatermark("ts", "1 hour")
            .groupBy("user_id", "day")
            .applyInPandasWithState(
                fn,
                "user_id long, day int, n_events long, session_end_us long",
                "cnt long, last_us long",
                "update",
                GroupStateTimeout.EventTimeTimeout,
            )
        )

        def fb(df: DataFrame, bid: int) -> None:
            df.write.mode("append").parquet(updates)

        q = (
            sessions.writeStream.outputMode("update")
            .foreachBatch(fb)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drain(q)

    root = fingerprint_cached_root(
        spark, sf_dir, "stdrain", ("events.parquet",),
        exists=lambda r: os.path.isdir(os.path.join(r, "updates")),
        build=drain,
    )
    return spark.read.parquet(os.path.join(root, "updates"))


# --------------------------------------------------------------------------
# Spark's built-in streaming dedup (dropDuplicatesWithinWatermark) as a
# CORRECTNESS row. Probe-pinned semantics (r16):
#   - late filter: drop iff ts <= wm_report(N-1) (inclusive, LAGGED —
#     identical to the stateful op's input filter);
#   - dedup: a row is dropped iff its key's state survived the
#     end-of-batch-(N-1) eviction; state expiry is the ADMITTED row's
#     ts + delay — dropped duplicates do NOT extend it (probed: a dup
#     arriving while state is alive leaves the expiry unchanged);
#   - eviction runs at the END of each batch against that batch's
#     reported watermark, so aliveness at batch N is simply
#     admitted_ts + delay > wm_report(N-1);
#   - an admitted row after eviction creates a FRESH state (re-admission).
# The drain manufactures each path: batch 1 replays batch 0 verbatim
# (every replay row dedup-dropped), batch 2 carries the withheld odd-id
# early rows (late-filter-dropped) plus fresh days, batch 3 carries a
# ts+18d shifted copy of batch 0 (states long evicted -> re-admitted).
# Each key appears at most once per batch, so the admitted set is a
# closed form.
# --------------------------------------------------------------------------
@query(
    "events_stream_dedup_watermark",
    oracle=f"""
    WITH base AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
               DATE_PART('day', CAST(ts AS TIMESTAMP)) AS d
        FROM events
    ),
    b0 AS (SELECT event_id, ts FROM base WHERE d <= 10 AND event_id % 2 = 0),
    b1f AS (SELECT event_id, ts FROM base WHERE d BETWEEN 11 AND 12),
    b2f AS (SELECT event_id, ts FROM base
            WHERE (d <= 10 AND event_id % 2 = 1) OR d BETWEEN 13 AND 15),
    b3f AS (SELECT event_id, ts FROM base WHERE d >= 16),
    sh AS (SELECT event_id, ts + INTERVAL 18 DAY AS ts, ts AS orig_ts FROM b0),
    mx AS (
        -- wm_report(N-1) = max event time over batches <= N-2, minus the
        -- delay: batch 2's filter/aliveness value covers batch 0 only;
        -- batch 3's covers batches 0-1 (the replay repeats b0's maxima)
        SELECT
          (SELECT MAX(EPOCH_MS(ts)) FROM b0) - 3600000 AS w1,
          (SELECT MAX(EPOCH_MS(ts)) FROM
             (SELECT ts FROM b0 UNION ALL SELECT ts FROM b1f)) - 3600000 AS w2
    ),
    adm AS (
        -- batch 0: all fresh, epoch watermark
        SELECT event_id, ts FROM b0
        -- batch 1: fresh day-11/12 keys admitted; the b0 replay is
        -- dedup-dropped (state alive vs the epoch watermark) and is
        -- therefore absent here
        UNION ALL SELECT event_id, ts FROM b1f
        -- batch 2: fresh keys, but the lagged inclusive filter drops
        -- ts <= wm_report(1)
        UNION ALL SELECT e.event_id, e.ts FROM b2f e, mx
                  WHERE EPOCH_US(e.ts) > w1 * 1000
        -- batch 3: fresh day>=16 keys behind the wm_report(2) filter
        UNION ALL SELECT e.event_id, e.ts FROM b3f e, mx
                  WHERE EPOCH_US(e.ts) > w2 * 1000
        -- batch 3 shifted replay: re-admitted iff the original state was
        -- evicted (orig ts + 1h <= wm_report(2)); always behind the filter
        UNION ALL SELECT s.event_id, s.ts FROM sh s, mx
                  WHERE EPOCH_US(s.ts) > w2 * 1000
                    AND NOT (EPOCH_US(s.orig_ts) + 3600000000 > w2 * 1000)
    )
    SELECT event_id, {SQL_TS('ts')} AS admitted_ts FROM adm
    """,
)
def events_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's dropDuplicatesWithinWatermark through a live 4-batch drain
    with a verbatim replay, withheld late rows, and an 18-day-shifted
    re-delivery: the admitted (event_id, ts) set is hash-checked against
    the probe-derived closed form (see the block comment). Exercises all
    four paths: first-admission, dedup-drop of an alive key, late-filter
    drop, and re-admission after watermark eviction.

    Scale shape: the canonical streaming-dedup topology — one shuffle per
    micro-batch onto state-store partitions, one (key, ts) state row per
    alive key, bounded by watermark eviction. Fingerprint-cached per
    (app, sf_dir) like the other streaming rows."""
    from mysql_hbase_replicator_spark.plans.queries_extra import (
        fingerprint_cached_root,
    )

    e = load_table(spark, sf_dir, "events").select("event_id", "ts")
    d = F.dayofmonth("ts")
    b0 = e.filter((d <= 10) & (F.col("event_id") % 2 == 0))
    batches = [
        b0,
        e.filter(d.between(11, 12)).unionByName(b0),  # replay of b0
        e.filter(((d <= 10) & (F.col("event_id") % 2 == 1)) | d.between(13, 15)),
        e.filter(d >= 16).unionByName(
            b0.withColumn("ts", F.col("ts") + F.expr("INTERVAL 18 DAYS"))
        ),
    ]
    # the oracle's closed form is unrolled over exactly these batches, and
    # _write_mtime_landing emits one landing file per _b in
    # range(N_STREAM_FILES) — a drifted count would add phantom empty
    # micro-batches that silently shift the engine's batch numbering
    assert len(batches) == N_STREAM_FILES
    tagged = None
    for k, frame in enumerate(batches):
        part = frame.withColumn("_b", F.lit(k).cast("int"))
        tagged = part if tagged is None else tagged.unionByName(part)

    def drain(root: str) -> None:
        landing, schema = _write_mtime_landing(tagged, root)
        ckpt = os.path.join(root, "ckpt")
        updates = os.path.join(root, "updates")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(landing)
        )
        deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
            ["event_id"]
        )

        def fb(df: DataFrame, bid: int) -> None:
            df.write.mode("append").parquet(updates)

        q = (
            deduped.writeStream.outputMode("update")
            .foreachBatch(fb)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drain(q)

    root = fingerprint_cached_root(
        spark, sf_dir, "dddrain", ("events.parquet",),
        exists=lambda r: os.path.isdir(os.path.join(r, "updates")),
        build=drain,
    )
    upd = spark.read.parquet(os.path.join(root, "updates"))
    return upd.select("event_id", ts_str(F.col("ts")).alias("admitted_ts"))

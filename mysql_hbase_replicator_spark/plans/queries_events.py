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

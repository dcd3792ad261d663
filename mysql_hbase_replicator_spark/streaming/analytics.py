"""Streaming event-time analytics (SURVEY.md §2.7 EXT): the watermark +
windowed-aggregation layer over an event stream.

The reference needs none of this — the binlog is totally ordered, so its
streaming state is counters only (`HbaseApplier.scala:125-135`). These
operators cover the general case our engine adds: out-of-order event-time
data with bounded lateness. The batch twins in plans/queries_events.py are
oracle-checked; these builders produce the *same groupings* under readStream,
so the batch oracle validates the streaming semantics, and the test drives
the genuinely streaming-only part — late rows beyond the watermark dropped,
windows emitted exactly once across restarts (checkpointed state).

At scale: watermark state is per-window-per-key in the state store; the
window key keeps state bounded (old windows evicted at watermark), which is
what makes a 1000-executor streaming agg on an unbounded stream viable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window counts per event type with bounded lateness. In
    append mode a window emits once its end passes the watermark; later rows
    for it are dropped (the at-most-`watermark`-late contract)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def sessionized_user_activity(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user session windows (gap-merged) under a watermark — the
    streaming form of events_session_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )

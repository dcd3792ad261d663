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


def click_purchase_attribution(
    clicks: DataFrame, purchases: DataFrame, attribution_window: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: each purchase joins
    clicks by the same user within the preceding attribution window. Both
    sides carry watermarks, so the join state store evicts clicks older than
    click-watermark + window and purchases past their watermark — bounded
    state on unbounded streams, the property that makes stream-stream joins
    feasible at scale."""
    c = clicks.select(
        F.col("user_id"), F.col("ts").alias("click_ts")
    ).withWatermark("click_ts", "2 hours")
    p = purchases.select(
        F.col("user_id"), F.col("ts").alias("purchase_ts"), F.col("value")
    ).withWatermark("purchase_ts", "2 hours")
    return c.join(
        p,
        (c.user_id == p.user_id)
        & (p.purchase_ts >= c.click_ts)
        & (p.purchase_ts <= c.click_ts + F.expr(f"INTERVAL {attribution_window}")),
        "inner",
    ).select(c.user_id, "click_ts", "purchase_ts", "value")


def stateful_user_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState (§2.9 streaming):
    a per-user running event count that survives micro-batch boundaries and
    restarts through the checkpointed state store — the PySpark-native
    replacement for hand-rolled operator state (the reference's schema cache
    / counters, MySQLExtractor.scala:41, HbaseApplier.scala:110)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        seen = state.get[0] if state.exists else 0
        for pdf in pdfs:
            seen += len(pdf)
        state.update((seen,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events_total": [seen]})

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            "user_id long, n_events_total long",
            "n long",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def deduped_event_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """At-least-once → effectively-once repair for an event stream:
    dropDuplicatesWithinWatermark keeps the FIRST arrival of each key and
    drops re-deliveries that arrive within the watermark of it. This is the
    engine-level companion to the CDC replay gate (operators/cdc_apply.py —
    idempotence by last-image collapse) for sources that retry sends, e.g.
    an exactly-once-less event bus in front of the training-data pipeline.

    Unlike plain streaming dropDuplicates (state grows forever), state here
    is evicted once the watermark passes a key's first-seen event time —
    bounded state on an unbounded stream, which is what makes the operator
    runnable on a 1000-executor cluster. The trade: a duplicate arriving
    later than the watermark is re-admitted, the documented contract."""
    k = keys if keys is not None else ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(k)

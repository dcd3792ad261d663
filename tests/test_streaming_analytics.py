"""Watermark semantics (SURVEY.md §2.7 EXT): late-data drop and exactly-once
window emission across restarts — the streaming-only behavior the batch
oracles can't check."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _write_events(path: str, name: str, rows: list[tuple[str, int, str]]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for ts, uid, et in rows:
            f.write(json.dumps({"ts": ts, "user_id": uid, "event_type": et}) + "\n")


def _run_once(spark, src, ckpt, sink_name):
    """One availableNow pass; finalized (append-mode) windows land in a list
    via foreachBatch — the memory sink can't recover from a checkpoint."""
    from mysql_hbase_replicator_spark.streaming.analytics import windowed_event_counts

    rows: list = []
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
        .writeStream.foreachBatch(lambda df, _bid: rows.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {(r.window_start.isoformat(), r.event_type): r.n_events for r in rows}


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    src, ckpt = str(tmp_path / "events"), str(tmp_path / "ckpt")

    # batch 1: two events in the 10:00 window, max ts 13:00
    # → watermark after batch = 12:30; windows ending ≤ 12:30 emit
    _write_events(
        src,
        "b1.json",
        [
            ("2024-01-01T10:10:00", 1, "click"),
            ("2024-01-01T10:20:00", 2, "click"),
            ("2024-01-01T13:00:00", 3, "click"),
        ],
    )
    out1 = _run_once(spark, src, ckpt, "wm_sink_1")
    assert out1[("2024-01-01T10:00:00", "click")] == 2
    # the 13:00 window is still open — not emitted
    assert ("2024-01-01T13:00:00", "click") not in out1

    # batch 2: one LATE row for the already-finalized 10:00 window (beyond
    # the 12:30 watermark → dropped) plus a 14:40 row that advances the
    # watermark to 14:10 — past the 13:00 window's end, closing it
    _write_events(
        src,
        "b2.json",
        [
            ("2024-01-01T10:30:00", 4, "click"),  # late — must be dropped
            ("2024-01-01T14:40:00", 5, "click"),
        ],
    )
    out2 = _run_once(spark, src, ckpt, "wm_sink_2")
    # the finalized 10:00 window is NOT re-emitted and the late row had no
    # effect (exactly-once per window)
    assert ("2024-01-01T10:00:00", "click") not in out2
    # the 13:00 window closes with exactly its one on-time row
    assert out2[("2024-01-01T13:00:00", "click")] == 1


def test_streaming_and_batch_windows_agree(spark, tmp_path):
    """The streaming builder over a frozen stream equals the plain batch
    aggregation — the property that lets the DuckDB oracle stand in for
    streaming correctness."""
    from mysql_hbase_replicator_spark.streaming.analytics import windowed_event_counts

    src, ckpt = str(tmp_path / "ev2"), str(tmp_path / "ckpt2")
    rows = [
        ("2024-01-01T09:05:00", 1, "view"),
        ("2024-01-01T09:55:00", 2, "view"),
        ("2024-01-01T10:05:00", 1, "click"),
        ("2024-01-01T23:00:00", 9, "view"),  # pushes watermark past all others
    ]
    _write_events(src, "all.json", rows)
    out = _run_once(spark, src, ckpt, "wm_sink_3")

    batch = spark.read.schema(EVENT_SCHEMA).json(src)
    expected = {
        ((r["w"]["start"].isoformat()), r["event_type"]): r["n"]
        for r in batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["w"]["end"] <= __import__("datetime").datetime(2024, 1, 1, 22, 30)
    }
    assert out == expected


FULL_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_full(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for ts, uid, et, v in rows:
            f.write(
                json.dumps({"ts": ts, "user_id": uid, "event_type": et, "value": v}) + "\n"
            )


def test_stream_stream_join_attribution(spark, tmp_path):
    """Purchases join same-user clicks within the trailing 1h window; a
    purchase with no in-window click emits nothing."""
    from mysql_hbase_replicator_spark.streaming.analytics import (
        click_purchase_attribution,
    )

    src = str(tmp_path / "ev")
    _write_full(src, "b1.json", [
        ("2024-01-01T10:00:00", 1, "click", 0.0),
        ("2024-01-01T10:30:00", 1, "purchase", 9.99),   # attributed to 10:00 click
        ("2024-01-01T09:00:00", 2, "click", 0.0),
        ("2024-01-01T11:30:00", 2, "purchase", 5.0),    # 2.5h later — out of window
        ("2024-01-01T23:00:00", 9, "click", 0.0),       # advances both watermarks
    ])
    stream = spark.readStream.schema(FULL_SCHEMA).json(src)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    rows = []
    q = (
        click_purchase_attribution(clicks, purchases)
        .writeStream.foreachBatch(lambda df, _b: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.user_id, r.purchase_ts.isoformat(), r.value) for r in rows}
    assert got == {(1, "2024-01-01T10:30:00", 9.99)}


def test_stateful_counts_survive_restart(spark, tmp_path):
    """applyInPandasWithState: per-user totals accumulate across separate
    availableNow runs via the checkpointed state store."""
    from mysql_hbase_replicator_spark.streaming.analytics import stateful_user_counts

    src, ckpt = str(tmp_path / "ev2"), str(tmp_path / "ckpt2")

    def run():
        rows = []
        stream = spark.readStream.schema(FULL_SCHEMA).json(src)
        q = (
            stateful_user_counts(stream)
            .writeStream.foreachBatch(lambda df, _b: rows.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.user_id: r.n_events_total for r in rows}

    _write_full(src, "b1.json", [
        ("2024-01-01T10:00:00", 1, "click", 0.0),
        ("2024-01-01T10:01:00", 1, "click", 0.0),
        ("2024-01-01T10:02:00", 2, "view", 0.0),
    ])
    assert run() == {1: 2, 2: 1}

    _write_full(src, "b2.json", [
        ("2024-01-01T12:00:00", 1, "click", 0.0),
        ("2024-01-01T12:01:00", 3, "view", 0.0),
    ])
    out2 = run()  # state restored: user 1 continues from 2
    assert out2[1] == 3 and out2[3] == 1


DEDUP_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _write_ids(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for eid, ts, uid, et in rows:
            f.write(
                json.dumps(
                    {"event_id": eid, "ts": ts, "user_id": uid, "event_type": et}
                )
                + "\n"
            )


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Re-delivered event_ids within the watermark are dropped (first
    arrival wins); a duplicate arriving beyond the watermark is re-admitted
    (state for its key was evicted) — the documented bounded-state trade."""
    from mysql_hbase_replicator_spark.streaming.analytics import deduped_event_stream

    src, ckpt = str(tmp_path / "events"), str(tmp_path / "ckpt")
    rows: list = []

    def run_once():
        stream = spark.readStream.schema(DEDUP_SCHEMA).json(src)
        q = (
            deduped_event_stream(stream, watermark="30 minutes")
            .writeStream.foreachBatch(lambda df, _b: rows.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: event 1 twice (exact retry), event 2 once
    _write_ids(
        src,
        "b1.json",
        [
            (1, "2024-01-01T10:00:00", 7, "click"),
            (1, "2024-01-01T10:00:00", 7, "click"),
            (2, "2024-01-01T10:05:00", 8, "view"),
        ],
    )
    run_once()
    assert sorted(r.event_id for r in rows) == [1, 2]

    # batch 2: event 1 re-delivered while still within watermark state →
    # dropped; event 3 advances the watermark far past event 1's ts
    _write_ids(
        src,
        "b2.json",
        [
            (1, "2024-01-01T10:00:30", 7, "click"),
            (3, "2024-01-01T14:00:00", 9, "click"),
        ],
    )
    run_once()
    assert sorted(r.event_id for r in rows) == [1, 2, 3]

    # batch 3: event 1 again, now long past the watermark (state evicted) →
    # re-admitted; this is the bounded-state contract, not a bug
    _write_ids(src, "b3.json", [(1, "2024-01-01T14:30:00", 7, "click")])
    run_once()
    assert sorted(r.event_id for r in rows) == [1, 1, 2, 3]


def test_stream_windowed_watermark_row_exercises_drops():
    """The events_stream_windowed_watermark CORRECTNESS row only proves the
    late-drop rule if its batch split actually produces late data: the
    withheld odd-id early rows must be dropped against the batch-0
    watermark. Pin that the oracle's accepted count is strictly below the
    table total (169/1000 dropped at sf0.001 as shipped) so a future edit
    to the split can't silently degenerate the row into a drop-free
    pass-through."""
    import duckdb

    from mysql_hbase_replicator_spark.plans.registry import (
        ORACLE_REGISTRY,
        load_all_queries,
    )

    load_all_queries()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    total = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    accepted = con.execute(
        f"SELECT SUM(cnt) FROM ({ORACLE_REGISTRY['events_stream_windowed_watermark']})"
    ).fetchone()[0]
    assert accepted < total, (accepted, total)
    assert accepted > 0


def test_stateful_sessions_row_exercises_midstream_timeouts():
    """The events_stream_stateful_sessions CORRECTNESS row only proves the
    GroupState timeout machinery if sessions actually close MID-STREAM
    (silent key + watermark past its timeout), not just in the final
    no-data batch. Pin via the oracle's own state sim: every emission
    stage fires, some state is discarded open, and some day<=10 keys see
    both batch-0 data and batch-2 late-accepted data (the
    merge-after-expiry path)."""
    import duckdb

    from mysql_hbase_replicator_spark.plans.queries_events import (
        _stateful_sessions_oracle_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    sql = _stateful_sessions_oracle_sql()
    prefix = sql.split(",\n    em AS")[0]

    def n(q):
        return con.execute(prefix + " " + q).fetchone()[0]

    assert n("SELECT COUNT(*) FROM s1 WHERE e1") > 0          # batch-1 timeouts
    assert n("SELECT COUNT(*) FROM s2 WHERE e2") > 0          # batch-2 timeouts
    assert n("SELECT COUNT(*) FROM s3 WHERE e3") > 0          # batch-3 timeouts
    assert n(
        "SELECT COUNT(*) FROM s3 WHERE c3 IS NOT NULL AND t3 < wf"
    ) > 0                                                      # final no-data batch
    assert n(
        "SELECT COUNT(*) FROM s3 WHERE c3 IS NOT NULL AND NOT (t3 < wf)"
    ) > 0                                                      # open state discarded
    assert n(
        "SELECT COUNT(*) FROM s3 WHERE n0 IS NOT NULL AND n2 IS NOT NULL "
        "AND day <= 10"
    ) > 0                                                      # late-accept merge path


def test_stream_dedup_row_exercises_all_paths():
    """events_stream_dedup_watermark only proves the dedup state machine
    if each path fires: pin via the oracle's own CTEs that the replay is
    non-empty (every replay row is dedup-dropped), the late filter drops
    some withheld early rows, and the shifted re-delivery re-admits keys
    whose state the watermark evicted."""
    import duckdb

    from mysql_hbase_replicator_spark.plans.registry import (
        ORACLE_REGISTRY,
        load_all_queries,
    )

    load_all_queries()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    sql = ORACLE_REGISTRY["events_stream_dedup_watermark"]
    prefix = sql.split(",\n    adm AS")[0]

    def n(q):
        return con.execute(prefix + " " + q).fetchone()[0]

    n_b0 = n("SELECT COUNT(*) FROM b0")
    assert n_b0 > 0  # the replay (all dedup-dropped) is non-empty
    late_dropped = n(
        "SELECT COUNT(*) FROM b2f e, mx WHERE EPOCH_US(e.ts) <= w1 * 1000"
    )
    assert late_dropped > 0  # late filter fires
    readmitted = n(
        "SELECT COUNT(*) FROM sh s, mx WHERE EPOCH_US(s.ts) > w2 * 1000 "
        "AND NOT (EPOCH_US(s.orig_ts) + 3600000000 > w2 * 1000)"
    )
    assert readmitted > 0  # eviction + re-admission fires

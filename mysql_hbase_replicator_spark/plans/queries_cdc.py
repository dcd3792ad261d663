"""CDC-kernel semantics expressed as oracle-checkable batch queries.

The real CDC kernel (operators/cdc_apply.py) runs over constructed change
events and is verified in tests/. These queries re-express its core semantics
(SURVEY.md §2.3 K2-K5, §2.2 P2-P4, §2.1 S5) over the `events` table so the
driver's DuckDB harness also exercises them: treat events as a change stream
keyed by user_id, ordered by (ts, event_id) — the binlog-position analog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_hbase_replicator_spark.plans.registry import query
from mysql_hbase_replicator_spark.sources.tables import load_table


@query(
    "cdc_last_image_per_key",
    oracle="""
    SELECT user_id, event_type AS last_type, value AS last_value, event_id AS last_event_id
    FROM (
        SELECT user_id, event_type, value, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def cdc_last_image_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 event-ordered apply, batch-collapsed: the reference applies events
    strictly in binlog order on one thread (Rep.scala:56-65); per micro-batch
    this reduces to last-image-per-PK — one shuffle on the key, no ordering
    bottleneck at scale."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            F.col("event_id").alias("last_event_id"),
        )
    )


@query(
    "cdc_apply_upsert_delete",
    oracle="""
    SELECT user_id, value AS current_value, event_id AS applied_event_id
    FROM (
        SELECT user_id, event_type, value, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_apply_upsert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/K4 merge semantics: treat every non-'error' event as an upsert of
    (user_id → value) and 'error' as a delete of the key. Final state after
    ordered apply = last image per key, dropped if the last op was a delete —
    exactly what apply_cdc_batch does before its MERGE."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("value").alias("current_value"),
            F.col("event_id").alias("applied_event_id"),
        )
    )


@query(
    "cdc_replay_idempotence",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM (
        SELECT DISTINCT event_id, event_type
        FROM (SELECT event_id, event_type FROM events
              UNION ALL
              SELECT event_id, event_type FROM events)
    )
    GROUP BY event_type
    """,
)
def cdc_replay_idempotence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once replay (reference checkpoints *after* applying,
    HbaseApplier.scala:239): replaying an already-applied prefix must not
    change state. Batch analog: dedup by event id collapses the replayed
    union back to the original stream."""
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    replayed = e.unionAll(e)
    return (
        replayed.dropDuplicates(["event_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "cdc_projection_rename_cast",
    oracle="""
    SELECT event_id AS eventid,
           user_id AS userid,
           CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS val,
           CAST(user_id AS BIGINT) AS userkey
    FROM events
    WHERE event_type IN ('click', 'purchase', 'view')
    """,
)
def cdc_projection_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P3+P4 in one pass: project the included columns, apply the
    underscore-strip rename (HbaseTableInfo.scala:142-144 default mapping),
    and cast per the declared sink types (HbaseTableInfo.scala:158-182)."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_type").isin("click", "purchase", "view")).select(
        F.col("event_id").alias("eventid"),
        F.col("user_id").alias("userid"),
        F.col("value").cast("decimal(12,2)").cast("double").alias("val"),
        F.col("user_id").cast("bigint").alias("userkey"),
    )


@query(
    "cdc_checkpoint_high_watermark",
    oracle="""
    SELECT event_type AS stream, MAX(event_id) AS max_position, STRFTIME(MAX(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S.%f') AS max_ts,
           COUNT(*) AS n_applied
    FROM events
    GROUP BY event_type
    """,
)
def cdc_checkpoint_high_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 checkpoint sink analog: the per-stream high-watermark (max applied
    position) the reference persists after every event
    (HbaseApplier.scala:155-176)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.col("event_type").alias("stream")).agg(
        F.max("event_id").alias("max_position"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("max_ts"),
        F.count(F.lit(1)).alias("n_applied"),
    )


@query(
    "cdc_rotate_checkpoint",
    oracle="""
    SELECT user_id AS stream,
           MAX(event_id) AS position,
           CONCAT('binlog.', LPAD(CAST(COALESCE(
               MAX(CASE WHEN event_type = 'signup' THEN event_id END), 0)
               AS VARCHAR), 9, '0')) AS filename,
           COUNT(*) AS n_applied
    FROM events
    GROUP BY user_id
    """,
)
def cdc_rotate_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 rotate-aware checkpoint (RepEvent.scala:9-10,
    HbaseApplier.scala:155-165): the reference persists (filename, position),
    where the filename comes from the latest Rotate event seen. Batch analog
    over `events`: per stream (user_id), the checkpoint pairs the max applied
    position with the binlog filename announced by the last rotate marker
    ('signup' events play the Rotate role; streams that never rotated resolve
    to the initial file 'binlog.000000000'). The live kernel equivalent is
    apply_cdc_batch's maxfile aggregation + read_checkpoint_state resume."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.col("user_id").alias("stream")).agg(
        F.max("event_id").alias("position"),
        F.concat(
            F.lit("binlog."),
            F.lpad(
                F.coalesce(
                    F.max(
                        F.when(F.col("event_type") == "signup", F.col("event_id"))
                    ),
                    F.lit(0),
                ).cast("string"),
                9,
                "0",
            ),
        ).alias("filename"),
        F.count(F.lit(1)).alias("n_applied"),
    )


@query(
    "cdc_rowkey_encode",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CONCAT(CAST(l_orderkey AS VARCHAR), CHR(1), CAST(l_linenumber AS VARCHAR))
             AS rowkey
    FROM lineitem
    WHERE l_orderkey < 100
    """,
)
def cdc_rowkey_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 composite-PK rowkey encoding (SURVEY §2.3): the reference
    concatenates the declared key columns in ordinal order into one sortable
    key (HbaseApplier.scala:210-217 via HBaseKVHelper). In Spark the MERGE
    condition uses the column list directly; the materialized single-key
    form — separator-joined, here over lineitem's (l_orderkey, l_linenumber)
    compound key — is what a physical sort/bucket key would be."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.concat_ws(
            "\x01",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("rowkey"),
    )


@query(
    "cdc_scd2_history",
    oracle="""
    SELECT user_id, event_id, event_type, value,
           STRFTIME(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           COALESCE(STRFTIME(LEAD(CAST(ts AS TIMESTAMP))
                                 OVER (PARTITION BY user_id
                                       ORDER BY CAST(ts AS TIMESTAMP), event_id),
                             '%Y-%m-%d %H:%M:%S.%f'),
                    '9999-12-31 00:00:00.000000') AS valid_to,
           CAST(CASE WHEN LEAD(CAST(ts AS TIMESTAMP))
                              OVER (PARTITION BY user_id
                                    ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                     THEN 1 ELSE 0 END AS INT) AS is_current
    FROM events
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build from a change stream: every change event
    becomes a versioned row with [valid_from, valid_to) effectivity, the
    open version flagged current — the standard way a warehouse consumes the
    CDC feed the reference replicates (its HBase cells keep only the last
    image; timestamped versions are HBase's own version dimension —
    HbaseApplier.scala keeps one cell version, this materializes them all).
    One shuffle on the key; lead() is a per-partition scan — the same cost
    envelope as last-image collapse, at any scale."""
    from mysql_hbase_replicator_spark.plans.queries import ts_str

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        ts_str(F.col("ts")).alias("valid_from"),
        F.coalesce(ts_str(nxt), F.lit("9999-12-31 00:00:00.000000")).alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


def _fingerprint_cached_store(
    spark, sf_dir: str, tag: str, make_store, name: str, build,
    sources: tuple[str, ...] = ("events.parquet",),
):
    """Shared scratch-store scaffold for queries that BUILD a keyed store
    from the testdata (r13 review: previously copy-pasted per query): a
    per-(app, sf_dir, tag) /tmp root under the ``spark_graft_bucketed_``
    prefix (the shared atexit + dead-pid reaping protocol in
    queries_extra), rebuilt only when the fingerprint of ANY source parquet
    the build reads changes (``sources`` — r15 ADVICE: the multi-table
    build also reads orders.parquet, and fingerprinting events alone would
    serve stale order_state rows if orders regenerated independently).
    ``make_store(path)`` constructs the store; ``build(store)`` replays the
    trace into it. Returns the (possibly cached) store."""
    import shutil as _shutil

    from mysql_hbase_replicator_spark.plans.queries_extra import (
        fingerprint_cached_root,
    )

    holder: dict = {}

    def make(root: str):
        if "store" not in holder:
            holder["store"] = make_store(os.path.join(root, "store"))
        return holder["store"]

    def rebuild(root: str) -> None:
        store = make(root)
        # rebuild from scratch; a catalog-backed store also retires its
        # stale table entries (version dirs are about to be wiped)
        digest = getattr(store, "_digest", None)
        if digest is not None:
            for r in spark.sql("SHOW TABLES").collect():
                if r.tableName.startswith(f"lsm_{digest}_"):
                    spark.sql(f"DROP TABLE IF EXISTS {r.tableName}")
        _shutil.rmtree(store.table_path(name), ignore_errors=True)
        build(store)

    root = fingerprint_cached_root(
        spark, sf_dir, tag, sources,
        exists=lambda r: make(r).exists(name),
        build=rebuild,
    )
    return make(root)


# snapshot-diff cut points: state at T1 vs state at T2 over the event stream
SNAP_T1 = "2024-01-15 00:00:00"
SNAP_T2 = "2024-01-30 00:00:00"


@query(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH s1 AS (
        SELECT user_id, event_type, value FROM (
            SELECT user_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
            FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '{SNAP_T1}'
        ) WHERE rn = 1
    ),
    s2 AS (
        SELECT user_id, event_type, value FROM (
            SELECT user_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
            FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '{SNAP_T2}'
        ) WHERE rn = 1
    )
    SELECT COALESCE(s2.user_id, s1.user_id) AS user_id,
           CASE WHEN s1.user_id IS NULL THEN 'insert'
                WHEN s2.user_id IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           s1.event_type AS before_type, s1.value AS before_value,
           s2.event_type AS after_type,  s2.value AS after_value
    FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
    WHERE s1.user_id IS NULL OR s2.user_id IS NULL
       OR s1.event_type IS DISTINCT FROM s2.event_type
       OR s1.value IS DISTINCT FROM s2.value
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1's snapshot-diffing source mode (SURVEY §2.1: the self-contained
    alternative to binlog tailing — `Trigger.AvailableNow` snapshot diffing):
    reconstruct the keyed state at two cut points and emit the CDC events
    that transform snapshot-1 into snapshot-2 — `insert` for new keys,
    `delete` for vanished keys, `update` (with before/after images) where
    the image changed. Unchanged keys emit nothing, which is what makes
    periodic snapshot diffing a viable low-frequency CDC source when the
    binlog isn't reachable.

    Scale shape: each snapshot is one last-image-per-key window (the K5
    collapse) over a time-pruned scan; the diff is a single full outer join
    on the key — all three shuffles on user_id, and AQE reuses the exchange
    between the two windows' shared scan lineage. The change filter uses a
    null-safe inequality (``eqNullSafe`` / SQL ``IS DISTINCT FROM``): even
    though the current image columns are never NULL, a nullable source
    column transitioning to/from NULL must still register as a change, or
    the roundtrip invariant (T1 + diff == T2) silently breaks — and because
    engine and oracle would drop the same rows, oracle verification could
    never catch it (ADVICE r5)."""
    e = load_table(spark, sf_dir, "events")

    def snapshot(cut: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        return (
            e.filter(F.col("ts") < F.lit(cut).cast("timestamp"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", "value")
        )

    s1 = snapshot(SNAP_T1).select(
        F.col("user_id").alias("u1"),
        F.col("event_type").alias("before_type"),
        F.col("value").alias("before_value"),
    )
    s2 = snapshot(SNAP_T2).select(
        F.col("user_id").alias("u2"),
        F.col("event_type").alias("after_type"),
        F.col("value").alias("after_value"),
    )
    diff = s1.join(s2, F.col("u1") == F.col("u2"), "full_outer")
    op = (
        F.when(F.col("u1").isNull(), "insert")
        .when(F.col("u2").isNull(), "delete")
        .otherwise("update")
    )
    changed = (
        F.col("u1").isNull()
        | F.col("u2").isNull()
        | ~F.col("before_type").eqNullSafe(F.col("after_type"))
        | ~F.col("before_value").eqNullSafe(F.col("after_value"))
    )
    return diff.filter(changed).select(
        F.coalesce(F.col("u2"), F.col("u1")).alias("user_id"),
        op.alias("op"),
        "before_type",
        "before_value",
        "after_type",
        "after_value",
    )


@query(
    "cdc_lsm_merge_on_read",
    oracle="""
    SELECT user_id, value AS current_value, event_id AS applied_event_id,
           STRFTIME(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d')
             AS applied_day
    FROM (
        SELECT user_id, event_type, value, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                           event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_lsm_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LogStructuredKeyedStore read invariant (operators/merge.py, r7),
    stated declaratively: folding the stream as per-batch K5 collapses and
    then collapsing the batch results by append order must equal one flat
    last-image-per-key fold — fold(fold(batches)) == fold(stream). That
    associativity is exactly what makes delta appends + last-wins
    reconstruction equivalent to the rewrite store's eager MERGE (and what
    makes replayed batches idempotent: a duplicate delta loses to itself).

    Engine side computes the TWO-LEVEL path the LSM store executes — events
    batched by day (monotone in stream order, like delta seq numbers),
    last action per (key, batch), then last batch's action per key, deletes
    ('error' events) dropped; the oracle computes the flat single-level
    fold. Matching value hashes prove the composition law on real data.
    Scale shape: both windows are WindowGroupLimit top-1 per key — the
    inner one partitioned (key, day) so no day ever sorts another day's
    rows, the outer over one row per (key, day)."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "_day", F.to_date("ts")
    )
    w_batch = Window.partitionBy("user_id", "_day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    per_batch = (
        e.withColumn("_rn", F.row_number().over(w_batch))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w_read = Window.partitionBy("user_id").orderBy(
        F.desc("_day"), F.desc("ts"), F.desc("event_id")
    )
    return (
        per_batch.withColumn("_rn", F.row_number().over(w_read))
        .filter((F.col("_rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("value").alias("current_value"),
            F.col("event_id").alias("applied_event_id"),
            F.date_format("_day", "yyyy-MM-dd").alias("applied_day"),
        )
    )


@query(
    "cdc_lsm_bucketed_merge_on_read",
    oracle="""
    SELECT user_id, value AS current_value, event_id AS applied_event_id,
           STRFTIME(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d')
             AS applied_day
    FROM (
        SELECT user_id, event_type, value, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                           event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_lsm_bucketed_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BucketedLogStructuredKeyedStore driven END-TO-END (r11 verdict
    #2: the store was tests-only): the events stream is split into three
    day-range batches — monotone in (ts, event_id), like delta seq numbers
    — each collapsed to its last action per key ('error' → delete, else
    upsert) and appended through ``merge_actions`` into the bucketed
    catalog store, with one MID-TRACE ``compact()`` after the second batch
    (base fold + pointer flip + delta rotation all exercised). The
    returned frame is the store's merge-on-read ``read()`` — base
    anti-join + last-wins delta collapse off co-partitioned bucketed
    scans, no Exchange — and must equal the oracle's flat single-level
    last-image fold: fold(fold(batches)) == fold(stream), the same
    associativity `cdc_lsm_merge_on_read` states declaratively, here
    proven on the real store machinery.

    Scale shape: each batch append is one bucketed write clustered on the
    PK; compaction rewrites one base version (one task per bucket); the
    final read moves NO rows between executors (HbaseApplier.scala:210-217
    region-sharded layout parity — the plan gates live in
    tests/test_lsm_store.py). Store scratch is per-(app, sf_dir),
    fingerprint-cached and pid-reaped exactly like the bucketed facts
    layout (queries_extra.py)."""
    from mysql_hbase_replicator_spark.operators.merge import (
        KIND_COL,
        BucketedLogStructuredKeyedStore,
    )

    name = "events:state"
    sink_cols = ["user_id", "current_value", "applied_event_id", "applied_day"]

    def build(store) -> None:
        e = load_table(spark, sf_dir, "events").withColumn(
            "_day", F.to_date("ts")
        )
        from datetime import timedelta

        lo, hi = e.select(F.min("_day"), F.max("_day")).first()
        span = max((hi - lo).days + 1, 3)
        # three contiguous day-range batches covering [lo, lo+span)
        cuts = [lo + timedelta(days=i * span // 3) for i in range(4)]
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        for i in range(3):
            batch = e.filter(
                (F.col("_day") >= F.lit(cuts[i]))
                & (F.col("_day") < F.lit(cuts[i + 1]))
            )
            actions = (
                batch.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(
                    "user_id",
                    F.col("value").alias("current_value"),
                    F.col("event_id").alias("applied_event_id"),
                    F.date_format("_day", "yyyy-MM-dd").alias("applied_day"),
                    F.when(F.col("event_type") == "error", "delete")
                    .otherwise("upsert")
                    .alias(KIND_COL),
                )
            )
            store.merge_actions(spark, name, actions, sink_cols, ["user_id"])
            if i == 1:  # mid-trace major compaction
                store.compact(spark, name)

    store = _fingerprint_cached_store(
        spark, sf_dir, "cdc",
        lambda path: BucketedLogStructuredKeyedStore(path, n_buckets=8),
        name, build,
    )
    return store.read(spark, name).select(*sink_cols)


@query(
    "cdc_schema_evolution",
    oracle="""
    SELECT user_id, value AS current_value,
           CASE WHEN event_id >= (SELECT CAST(FLOOR(MAX(event_id) / 2.0) AS BIGINT)
                                  FROM events)
                THEN event_type END AS etype
    FROM (
        SELECT user_id, event_type, value, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-key schema drift tolerated mid-stream (r12 verdict #2 — the one
    CDC semantic implemented but not driver-certified): the reference
    tolerates non-key column add/drop (TableInfo.scala:33-39 helpers;
    MySQLExtractor.scala:195-198 only a PK change is fatal), and this engine
    implements it via unionByName(allowMissingColumns) in the keyed stores
    plus the registry's additive schema union (operators/merge.py).

    Here the REAL kernel runs it end-to-end: the events table becomes a CDC
    trace keyed by user_id with position = event_id (the binlog position
    analog; 'error' = delete, else insert/upsert). The stream is split at
    the median position, the FIRST half applied through ``apply_cdc_batch``
    with a two-column mapping (user_id, value) — then the table grows a
    column (MySQL ADD COLUMN): the SECOND half applies with the widened
    three-column mapping (+ event_type → etype). A compaction between the
    batches bakes the narrow base, so the final merge-on-read crosses the
    schema boundary both in the delta union AND against a compacted base.
    Rows whose last image predates the ADD COLUMN surface etype = NULL
    (exactly what MySQL backfills); rows last touched after it carry the
    value. The oracle replays the same trace flat in SQL — DuckDB's
    equivalent of applying the trace over ALTER TABLE ADD COLUMN.

    Scale shape: two delta appends + one compaction on the pointer-protocol
    LSM store (each a single bucketed write), and the final read is the
    standard merge-on-read collapse. Store scratch is per-(app, sf_dir),
    fingerprint-cached like the bucketed CDC store."""
    from mysql_hbase_replicator_spark.catalog.meta import (
        HbaseCollInfo,
        HbaseTableInfo,
    )
    from mysql_hbase_replicator_spark.operators.cdc_apply import apply_cdc_batch
    from mysql_hbase_replicator_spark.operators.merge import LogStructuredKeyedStore

    name = "app_events_state"
    base_cols = [
        HbaseCollInfo("user_id", "bigint(20)", "user_id", "LongType", True),
        HbaseCollInfo("value", "double", "current_value", "DoubleType", False),
    ]
    narrow = HbaseTableInfo(
        dbName="app", dbTableName="events_state", hbaseTableName=name,
        hbaseNameSpace="app", sparkTableName="events_state",
        bytesUtils="Binary", cols=base_cols,
    )
    widened = HbaseTableInfo(
        dbName="app", dbTableName="events_state", hbaseTableName=name,
        hbaseNameSpace="app", sparkTableName="events_state",
        bytesUtils="Binary",
        cols=[*base_cols,
              HbaseCollInfo("event_type", "varchar(20)", "etype", "StringType", False)],
    )

    def build(store) -> None:
        e = load_table(spark, sf_dir, "events")
        cut = int(e.agg(F.max("event_id")).first()[0]) // 2

        def to_events(df: DataFrame, with_etype: bool) -> DataFrame:
            img_cols = [F.col("user_id"), F.col("value")]
            if with_etype:
                img_cols.append(F.col("event_type"))
            img = F.struct(*img_cols)
            is_del = F.col("event_type") == "error"
            return df.select(
                F.col("event_id").cast("long").alias("position"),
                F.when(is_del, "delete").otherwise("insert").alias("op"),
                F.lit("app").alias("db"),
                F.lit("events_state").alias("table"),
                F.when(is_del, img).alias("before"),
                F.when(~is_del, img).alias("after"),
                F.lit(None).cast("array<string>").alias("included_before"),
                F.lit(None).cast("array<string>").alias("included_after"),
                F.lit(None).cast("string").alias("filename"),
            )

        apply_cdc_batch(
            spark, to_events(e.filter(F.col("event_id") < cut), False),
            store, {"app.events_state": narrow},
        )
        store.compact(spark, name)  # bake the narrow base pre-ADD COLUMN
        apply_cdc_batch(
            spark, to_events(e.filter(F.col("event_id") >= cut), True),
            store, {"app.events_state": widened},
        )

    store = _fingerprint_cached_store(
        spark, sf_dir, "cdcevo",
        lambda path: LogStructuredKeyedStore(path, n_buckets=8),
        name, build,
    )
    return store.read(spark, name).select("user_id", "current_value", "etype")

@query(
    "cdc_snapshot_diff_multi",
    oracle=f"""
    SELECT 'app.user_state' AS tbl, user_id AS pk,
           event_type AS state_type, value AS state_value,
           2 AS snap_watermark
    FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '{SNAP_T2}'
    ) WHERE rn = 1 AND event_type <> 'error'
    UNION ALL
    SELECT 'app.order_state' AS tbl, o_orderkey AS pk,
           o_orderstatus AS state_type,
           CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 1.0
                ELSE o_totalprice END AS state_value,
           2 AS snap_watermark
    FROM orders
    """,
)
def cdc_snapshot_diff_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MULTI-TABLE snapshot-diff transport driven END-TO-END (r14
    verdict #2: the mode was pytest-only; the reference routes EVERY mapped
    table from one stream, MySQLExtractor.scala:225-236). Two tables'
    snapshot histories — ``app.user_state`` (last-image user state derived
    from `events` at the T1/T2 cut points, 'error'-last keys absent, i.e.
    deleted) and ``app.order_state`` (an `orders` subset at v1 growing to
    the full table at v2, 'F'-status prices bumped so v1→v2 also updates) —
    land as per-table subdirs of ONE landing root, two parquet files per
    table-version, versions admitted as mtime-ordered waves by one
    ``Trigger.AvailableNow`` streaming query. Each wave routes per table,
    diffs against that table's PrevSnapshotStore, and applies through the
    kernel CONCURRENTLY (snapshot_parallel_tables=2 — the parallel per-table
    apply path with its per-writer overwrite isolation, merge.py:235).

    The returned frame is the store's own read-back of both tables (keyed
    store state after insert+update+delete diffs across two polls) plus the
    global min-across-tables snapshot watermark from ``_checkpoint.json`` —
    the reference's single binlog position analog. The oracle states the
    convergence invariant directly in SQL: after the final poll, each
    table's state must equal its v2 snapshot exactly, and the watermark must
    be 2. Routing leaks between tables, version-gate misfires, clobbered
    parallel applies, or missed deletes all diverge the hash.

    Scale shape: identical to production — per-poll cost is O(one snapshot)
    per table (files-map-pruned re-read + one full-outer diff join on the
    PK + bucketed merge), tables multiply batch count never per-row cost
    (measured 257k rows/s at 2×750k keys, SCALING.md r14). Store scratch is
    per-(app, sf_dir), fingerprint-cached and pid-reaped like the other CDC
    store queries."""
    import glob as _glob
    import shutil as _shutil
    import time as _time

    from mysql_hbase_replicator_spark.catalog.meta import (
        HbaseCollInfo,
        HbaseTableInfo,
    )
    from mysql_hbase_replicator_spark.operators.cdc_apply import (
        read_checkpoint_state,
    )
    from mysql_hbase_replicator_spark.operators.merge import ParquetKeyedStore
    from mysql_hbase_replicator_spark.sources.snapshot_diff import SNAP_VER_COL
    from mysql_hbase_replicator_spark.streaming.pipeline import CdcStreamPipeline

    def mapping(db_table: str, pk_src: str, type_src: str, val_src: str,
                hbase: str) -> HbaseTableInfo:
        return HbaseTableInfo(
            dbName="app", dbTableName=db_table, hbaseTableName=hbase,
            hbaseNameSpace="app", sparkTableName=db_table, bytesUtils="Binary",
            cols=[
                HbaseCollInfo(pk_src, "bigint(20)", "pk", "LongType", True),
                HbaseCollInfo(type_src, "varchar(20)", "state_type",
                              "StringType", False),
                HbaseCollInfo(val_src, "double", "state_value", "DoubleType",
                              False),
            ],
        )

    mappings = {
        "app.user_state": mapping(
            "user_state", "user_id", "event_type", "value", "app:user_state"
        ),
        "app.order_state": mapping(
            "order_state", "o_orderkey", "o_orderstatus", "o_totalprice",
            "app:order_state"
        ),
    }

    def user_snapshot(cut: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            load_table(spark, sf_dir, "events")
            .filter(F.col("ts") < F.lit(cut).cast("timestamp"))
            .withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
            .select("user_id", "event_type", "value")
        )

    def order_snapshot(ver: int) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        if ver == 1:
            return o.filter(
                F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
            ).select("o_orderkey", "o_orderstatus", "o_totalprice")
        return o.select(
            "o_orderkey",
            "o_orderstatus",
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice") + 1.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )

    snapshots = {
        "app.user_state": lambda v: user_snapshot(SNAP_T1 if v == 1 else SNAP_T2),
        "app.order_state": order_snapshot,
    }
    row_structs = {
        full: snapshots[full](2).schema for full in mappings
    }

    def build(store) -> None:
        root = os.path.dirname(store.base_dir)
        landing = os.path.join(root, "landing")
        ckpt = os.path.join(root, "ckpt")
        for d in (landing, ckpt, store.base_dir):
            _shutil.rmtree(d, ignore_errors=True)
        # one wave per version: both tables' vN files share an mtime bucket
        # so Trigger.AvailableNow (mtime-ordered, 4-file caps) admits v1
        # fully before v2 — the production poll cadence, compressed
        now = _time.time()
        for full in mappings:
            sub = os.path.join(landing, full)
            os.makedirs(sub, exist_ok=True)
            for ver in (1, 2):
                df = snapshots[full](ver).withColumn(
                    SNAP_VER_COL, F.lit(ver).cast("long")
                )
                tmp = os.path.join(root, f"_stage_{full}_v{ver}")
                df.repartition(2).write.mode("overwrite").parquet(tmp)
                for i, part in enumerate(
                    sorted(_glob.glob(os.path.join(tmp, "*.parquet")))
                ):
                    dst = os.path.join(sub, f"{ver:04d}-{i}.parquet")
                    os.replace(part, dst)
                    os.utime(dst, (now + ver, now + ver))
                _shutil.rmtree(tmp, ignore_errors=True)
        pipe = CdcStreamPipeline(
            spark=spark,
            events_path=landing,
            row_struct=None,
            row_structs=row_structs,
            store=store,
            mappings=mappings,
            checkpoint_dir=ckpt,
            source_format="snapshot_diff",
            snapshot_format="parquet",
            max_files_per_trigger=4,
            snapshot_parallel_tables=2,
        )
        q = pipe.start(available_now=True, query_name="cdc-snapdiff-multi")
        q.awaitTermination(600)

    store = _fingerprint_cached_store(
        spark, sf_dir, "snapmulti",
        lambda path: ParquetKeyedStore(path, n_buckets=8),
        "app:user_state", build,
        sources=("events.parquet", "orders.parquet"),
    )
    wm = int(read_checkpoint_state(store)["position"])
    out = None
    for full, hbase in (
        ("app.user_state", "app:user_state"),
        ("app.order_state", "app:order_state"),
    ):
        part = store.read(spark, hbase).select(
            F.lit(full).alias("tbl"),
            F.col("pk"),
            F.col("state_type"),
            F.col("state_value"),
            F.lit(wm).cast("int").alias("snap_watermark"),
        )
        out = part if out is None else out.unionAll(part)
    return out

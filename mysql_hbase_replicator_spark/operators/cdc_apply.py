"""CDC batch kernel (SURVEY.md §2.3 K1-K6, §2.2 P1-P5) — the
semantics-bearing heart of the engine.

Re-expresses the reference's per-event HBase mutation loop
(HbaseApplier.scala:226-275) as set-oriented DataFrame operations over a
micro-batch of change events:

1. P1  filter to mapped tables; skipped events still advance the checkpoint
       (MySQLExtractor.scala:225-236).
2. P2  included-columns projection: absent ordinals → NULL
       (BitSet gate, HbaseApplier.scala:197-208, MongoDBApplier.scala:87-97).
3. P3  column rename per mapping (HbaseTableInfo.scala:142-144).
4. P4  per-column cast to the declared sink type (HbaseTableInfo.scala:158-182).
5. K1  PK-combination key (composite keys supported; rows missing any PK are
       dead-lettered — the reference throws
       "sql statement does not contain all primary keys",
       HbaseApplier.scala:204-208).
6. K5  event-ordered apply collapsed per batch: last action per key by
       (position, seq) — the batch equivalent of the reference's
       single-thread strict ordering (Rep.scala:56-65).
7. K2/K3/K4 merge: upserts (insert + update-after-image) and deletes
       (delete + update-before-key) applied via ParquetKeyedStore.merge.

K3 note (SURVEY §2.3): the reference's update deletes the old row only when
the before/after rowkeys are EQUAL (HbaseApplier.scala:252) — a PK-changing
update orphans the old row. ``k3_mode="intended"`` (default) implements the
evident intent: always delete the before-key, upsert the after-image.
``k3_mode="faithful"`` reproduces the reference exactly (update = plain
upsert of the after-image at its own key; full-row replace already clears
stale columns in a columnar store).

K6: dead-lettered events are queued in a ``_dead_letter`` table — one
``batch=<token>`` subdirectory per write, overwritten on micro-batch replay
so the queue stays exactly-once under at-least-once delivery; exceeding
``max_dead_letter`` raises, the analog of the failed-event-queue overflow
exit (Rep.scala:86-92).
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import uuid
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_hbase_replicator_spark.catalog.meta import HbaseTableInfo
from mysql_hbase_replicator_spark.functions.types import spark_type_from_name
from mysql_hbase_replicator_spark.operators.merge import ParquetKeyedStore
from mysql_hbase_replicator_spark.sources.cdc_events import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    ROW_OPS,
)

DEAD_LETTER_TABLE = "_dead_letter"
CHECKPOINT_FILE = "_checkpoint.json"


def dead_letter_batch_path(store: ParquetKeyedStore, token: str) -> str:
    """Target subpath for ONE dead-letter write: every write lands in its
    own ``batch=<token>`` partition directory with mode=overwrite. A
    replayed micro-batch re-derives the same token and OVERWRITES its own
    previous write instead of appending duplicates — the store merge was
    replay-idempotent but an appending dead-letter table silently was not
    (ADVICE r8; K6's reference contract is queue-drained-exactly-once,
    Rep.scala:67-97). Plain ``spark.read.parquet(<base>/_dead_letter)``
    keeps working via partition discovery (the token surfaces as a
    ``batch`` string column). Root-level files must never be mixed into
    this layout: Spark refuses a mixed root-file / partition-dir
    directory, so ALL writers go through this helper (and the drain path
    migrates pre-upgrade root files into a ``batch=legacy-migrated``
    subdir before reading).

    The directory name carries BOTH the sanitized token (human-readable)
    and an md5 prefix of the RAW token: two distinct raw tokens that
    sanitize to the same string (e.g. table names differing only in a
    non-alnum character) must never share a directory — with
    mode=overwrite a collision would silently delete the other writer's
    queue, not merely co-mingle rows as append did. Same raw token →
    same path, so replay idempotence is unaffected."""
    safe = "".join(ch if (ch.isalnum() or ch in "._-") else "_" for ch in token)
    digest = hashlib.md5(token.encode("utf-8")).hexdigest()[:8]
    return os.path.join(store.base_dir, DEAD_LETTER_TABLE, f"batch={safe}.{digest}")

# Micro-batch regime switch (r6 verdict #2 — streaming fixed cost): below
# this many row events the batch's plans are TINY (a few thousand rows per
# shuffle), and the per-action fixed costs — AQE's per-stage re-optimization
# rounds, 32-partition shuffles, the collapse-cache materialization — cost
# more wall-clock than they save. The switch SETS SESSION CONF for the
# duration of the per-table applies (restored in a finally): callers running
# UNRELATED queries concurrently on the same SparkSession may plan under the
# small-batch conf — harmless for correctness, suboptimal for a large
# concurrent query. A pipeline owns its session in every supported
# deployment shape; give concurrent heterogeneous workloads their own
# session (getOrCreate().newSession()) if that ever changes. Small batches therefore run with AQE off,
# a handful of shuffle partitions, and no collapse persist (recomputing a
# 5k-row window inside the merge's two actions is cheaper than a dedicated
# materialization action). Large batches (backfills, the 200k-event kernel
# bench) keep the session's AQE settings and the collapse cache — the 100 TB
# configuration. Measured at 5k-event batches: 3.4 s → 2.3 s from the conf
# switch alone (scripts/profile_stream.py), before the action-count cuts.
SMALL_BATCH_ROWS = 50_000
SMALL_BATCH_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.shuffle.partitions": "4",
}
# The small-batch conf switch mutates SESSION-wide settings around the apply
# loop. Concurrent kernel applies (the multi-table snapshot pipeline's
# parallel per-table applies, r14) must not interleave those set/restore
# windows: thread B snapshotting prev_conf while thread A's temporary values
# are live would "restore" shuffle.partitions=4 / AQE=off as if user-set,
# pinning them for the rest of the session (r14 review). Small-batch windows
# therefore serialize on this lock — cheap by definition (small = fast) —
# while large batches mutate nothing and stay fully concurrent. A large
# batch planned while a sibling's small window is open can transiently see
# the small conf (a bounded perf wobble, never a correctness issue); mixed
# fleets that care should give heterogeneous workloads their own session
# (newSession()), per the note above.
_SMALL_CONF_LOCK = threading.Lock()


@dataclass
class CdcBatchResult:
    """Observability payload — the counter surface the reference exposes via
    JMX (HbaseApplier.scala:110,120-135; MySQLExtractor.scala:217-223)."""

    checkpoint_position: int | None = None
    checkpoint_filename: str | None = None
    applied_counts: dict[str, int] = field(default_factory=dict)  # "db.table.op" -> n
    dead_letter_count: int = 0
    skipped_unmapped: int = 0
    # O1 latency parity (HbaseApplier.scala:45-52 keeps a last-10 ring of
    # per-op HBase RPC times): the batch engine's unit of apply is the
    # per-table merge, so wall-times are keyed "apply:db.table" plus the
    # whole-batch "batch". The rolling ring lives in the pipeline.
    apply_latency_s: dict[str, float] = field(default_factory=dict)


class DeadLetterOverflowError(RuntimeError):
    """K6 failed-event-queue overflow (Rep.scala:86-92)."""


def _full_name() -> Column:
    return F.concat(F.col("db"), F.lit("."), F.col("table"))


def _present(side: str, col_name: str) -> Column:
    """Included-columns gate: NULL included_* list means 'all present'."""
    inc = F.col(f"included_{side}")
    return F.col(side).isNotNull() & (inc.isNull() | F.array_contains(inc, col_name))


def _gated(side: str, col_name: str) -> Column:
    return F.when(_present(side, col_name), F.col(f"{side}.{col_name}"))


def _pks_valid_on(info: HbaseTableInfo, side_col: Column, inc_col: Column) -> Column:
    """K1 precondition over explicit image/included columns (so the batch-wide
    stats pass can validate per table without first renaming columns)."""
    cond = F.lit(True)
    for c in info.key_columns():
        present = side_col.isNotNull() & (
            inc_col.isNull() | F.array_contains(inc_col, c.dbColumnName)
        )
        cond = cond & present & side_col.getField(c.dbColumnName).isNotNull()
    return cond


def _valid_expr(info: HbaseTableInfo, before: Column, after: Column) -> Column:
    """The K1 validity decision for one table's events (op-dependent image
    choice; update validates BOTH rowkeys like the reference,
    HbaseApplier.scala:250-251)."""
    inc_b, inc_a = F.col("included_before"), F.col("included_after")
    return (
        F.when(F.col("op") == OP_INSERT, _pks_valid_on(info, after, inc_a))
        .when(F.col("op") == OP_DELETE, _pks_valid_on(info, before, inc_b))
        .when(
            F.col("op") == OP_UPDATE,
            _pks_valid_on(info, after, inc_a) & _pks_valid_on(info, before, inc_b),
        )
        .otherwise(F.lit(False))
    )


def _sink_projection(info: HbaseTableInfo, side: str) -> list[Column]:
    """P2 (gate) + P3 (rename) + P4 (cast) for one image side."""
    return [
        _gated(side, c.dbColumnName)
        .cast(spark_type_from_name(c.hbaseColumnType, restrict_to_six=False))
        .alias(c.hbaseColumnName)
        for c in info.cols
    ]


def _pks_valid(info: HbaseTableInfo, side: str) -> Column:
    """K1 precondition: (pk & included) == pk and all PK values non-null."""
    return _pks_valid_on(info, F.col(side), F.col(f"included_{side}"))


def read_checkpoint_state(store: ParquetKeyedStore) -> dict | None:
    """S2 resume: last committed (filename, position) pair — the BinlogTable
    row analog (HbaseApplier.scala:138-153). The reference persists BOTH the
    binlog filename and the position within it (RepEvent.scala:9-10); a
    position alone is ambiguous across a mid-stream Rotate."""
    path = os.path.join(store.base_dir, CHECKPOINT_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def read_checkpoint(store: ParquetKeyedStore) -> int | None:
    """Position-only view of the checkpoint (back-compat convenience)."""
    state = read_checkpoint_state(store)
    return state.get("position") if state else None


def _write_checkpoint(store: ParquetKeyedStore, position: int, filename: str | None) -> None:
    """S5: checkpoint written AFTER the data commit — at-least-once, replay
    is idempotent (HbaseApplier.scala:239,261,273 order)."""
    path = os.path.join(store.base_dir, CHECKPOINT_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"position": position, "filename": filename}, f)
    os.replace(tmp, path)


def apply_cdc_batch(
    spark: SparkSession,
    events: DataFrame,
    store: ParquetKeyedStore,
    mappings: dict[str, HbaseTableInfo],
    k3_mode: str = "intended",
    max_dead_letter: int | None = None,
    advance_checkpoint: bool = True,
    batch_token: str | None = None,
) -> CdcBatchResult:
    """Apply one micro-batch of CDC events to the keyed store.

    ``advance_checkpoint=False`` applies without touching ``_checkpoint.json``
    — used by the dead-letter drain, whose replayed positions are historical
    (advancing from them would REGRESS the live watermark).

    ``batch_token``: stable identity of this micro-batch (the streaming
    pipeline passes ``b{batch_id}``). Dead-letter writes key their
    ``batch=`` subdirectory on it, so an at-least-once replay of the same
    batch overwrites its own prior dead letters instead of duplicating
    them. Callers outside a replayable stream may omit it (each write then
    gets a unique token — plain append semantics)."""
    if k3_mode not in ("intended", "faithful"):
        raise ValueError(f"unknown k3_mode: {k3_mode}")
    import time as _time

    batch_t0 = _time.perf_counter()
    result = CdcBatchResult()
    if "filename" not in events.columns:  # pre-rotate fixtures / legacy logs
        events = events.withColumn("filename", F.lit(None).cast("string"))
    events = events.persist()
    try:
        # --- checkpoint + counters + table discovery in ONE driver action ---
        # (the reference pays a checkpoint write per event,
        # HbaseApplier.scala:155-176; we pay one tiny groupBy per batch)
        #
        # Stream-order for the checkpoint pair: real MySQL positions reset
        # per binlog file (RepEvent.scala:9-10 pairs filename+position for
        # exactly this reason), so "max(position) over the batch" can pair
        # the NEW filename with the OLD file's larger position after a
        # mid-batch rotate. Sources that interleave rotates mid-batch must
        # therefore stamp a globally monotonic ``seq`` column (arrival
        # order); when present, the checkpoint is taken from the LAST event
        # by seq — its position, and the filename of the last
        # filename-bearing event by seq. Without ``seq`` we fall back to
        # position order, which is only correct for globally monotonic
        # positions (true of the file-log stand-in fixtures).
        ord_col = F.col("seq") if "seq" in events.columns else F.col("position")
        # K1 validity is folded into this same pass (one CASE branch per
        # mapped table) so the kernel never pays a dedicated dead-letter
        # count action: the dead-letter WRITE happens only for tables whose
        # n_dead here is non-zero (the rare path). Generic multi-table mode
        # parses the JSON images inline with each table's declared schema —
        # the identical expressions _apply_table uses, so the counts and the
        # written rows can't diverge.
        generic_images = dict(events.dtypes).get("before") == "string"
        invalid_case = F.lit(False)
        for fn, info in mappings.items():
            if generic_images:
                struct = source_struct(info)
                b = F.from_json(F.col("before"), struct)
                a = F.from_json(F.col("after"), struct)
            else:
                b, a = F.col("before"), F.col("after")
            invalid_case = F.when(
                F.col("_full_name") == fn, ~_valid_expr(info, b, a)
            ).otherwise(invalid_case)
        stats = (
            events.withColumn("_full_name", _full_name())
            .groupBy("_full_name", "op")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(F.col("op").isin(*ROW_OPS) & invalid_case, 1).otherwise(0)
                ).alias("n_dead"),
                F.max(
                    F.struct(ord_col.alias("o"), F.col("position").alias("position"))
                ).alias("maxpos"),
                # rotate consumption (HbaseApplier.scala:155-165): the current
                # binlog file is the filename carried by the latest
                # filename-bearing event (rotate markers and any event stamped
                # at source). max ignores the all-null groups.
                F.max(
                    F.when(
                        F.col("filename").isNotNull(),
                        F.struct(ord_col.alias("o"), F.col("filename").alias("filename")),
                    )
                ).alias("maxfile"),
            )
            .collect()
        )
        # Driver-side max over the collected (o, value) structs: compare via
        # a None-safe key, NOT tuple order — a group whose ord is NULL (a
        # legacy seq-less file sharing a batch with seq-stamped ones, or an
        # event line missing `position`) yields Row(o=None, ...), and Python
        # raises TypeError on None<int, wedging the stream in a
        # crash-replay loop (r13 review). None sorts below every real ord.
        # ... and the guard must be RECURSIVE: the ord may itself be a
        # struct (the Debezium pipeline's (ts_ms, file, pos) seq) whose
        # members can be NULL, or one batch can mix long ords with struct
        # ords (a replay straddling a source swap) — a flat None check
        # still raises TypeError on Row-vs-int or None-inside-Row
        # comparison, re-creating the same wedge one level down (ADVICE
        # r13). Type-tagged tuples make every pair comparable: None < any
        # value; unlike types order by tag, never by raw comparison.
        def _cmp_key(o):
            if o is None:
                return (0,)
            if isinstance(o, bool):
                return (1, int(o))
            if isinstance(o, (int, float)):
                return (1, o)
            if isinstance(o, str):
                return (2, o)
            if isinstance(o, (bytes, bytearray)):
                return (3, bytes(o))
            if isinstance(o, (tuple, list)):  # Row subclasses tuple
                return (4, tuple(_cmp_key(x) for x in o))
            return (2, str(o))

        def _none_safe_max(rows, field, field_default):
            def key(r):
                v = r[field]
                return (
                    _cmp_key(r["o"]),
                    v is not None,
                    v if v is not None else field_default,
                )

            return max(rows, key=key, default=None)

        latest_pos = _none_safe_max(
            [r["maxpos"] for r in stats if r["maxpos"] is not None], "position", 0
        )
        result.checkpoint_position = latest_pos["position"] if latest_pos else None
        latest_file = _none_safe_max(
            [r["maxfile"] for r in stats if r["maxfile"] is not None], "filename", ""
        )
        if latest_file is not None:
            result.checkpoint_filename = latest_file["filename"]
        else:
            # no rotate in this batch → the file is unchanged since the last
            # checkpoint (the reference keeps the filename in memory between
            # events; our between-batch memory is the checkpoint itself)
            prev = read_checkpoint_state(store)
            result.checkpoint_filename = prev.get("filename") if prev else None
        mapped = set(mappings)
        tables_in_batch = set()
        dead_counts: dict[str, int] = {}
        row_counts: dict[str, int] = {}
        n_row_events = 0
        for r in stats:
            if r["op"] not in ROW_OPS:
                continue
            n_row_events += r["n"]
            if r["_full_name"] in mapped:
                # the JMX-analog counter reports events APPLIED: the group's
                # dead-lettered rows were diverted, never merged — counting
                # them here made applied+dead sum past the batch size (r13
                # review). All-dead groups contribute no counter entry.
                n_applied = r["n"] - r["n_dead"]
                if n_applied:
                    result.applied_counts[f"{r['_full_name']}.{r['op']}"] = n_applied
                tables_in_batch.add(r["_full_name"])
                dead_counts[r["_full_name"]] = (
                    dead_counts.get(r["_full_name"], 0) + r["n_dead"]
                )
                row_counts[r["_full_name"]] = (
                    row_counts.get(r["_full_name"], 0) + r["n"]
                )
            else:
                result.skipped_unmapped += r["n"]

        row_events = events.filter(F.col("op").isin(*ROW_OPS)).withColumn(
            "_full_name", _full_name()
        )

        small = n_row_events < SMALL_BATCH_ROWS
        # snapshot only EXPLICITLY-set conf values: spark.conf.get(k, None)
        # returns the effective value (Spark's own default when unset), so
        # restoring from it would pin defaults as explicit session confs
        # after the first small batch and mask later spark-defaults changes
        # (ADVICE r7). SQLConf.contains distinguishes set-vs-default; if the
        # private accessor ever disappears, fall back to the old
        # pin-the-default behavior (harmless, just sticky).
        def _explicit(k: str):
            try:
                if spark._jsparkSession.sessionState().conf().contains(k):
                    return spark.conf.get(k)
                return None
            except Exception:
                return spark.conf.get(k, None)

        prev_conf: dict[str, str | None] = {}
        if small:
            # serialize concurrent small-batch conf windows (r14 review —
            # see _SMALL_CONF_LOCK): prev_conf must be snapshotted INSIDE
            # the lock or it can capture a sibling's temporary values
            _SMALL_CONF_LOCK.acquire()
        try:
            prev_conf = {k: _explicit(k) for k in SMALL_BATCH_CONF}
            if small:
                for k, v in SMALL_BATCH_CONF.items():
                    spark.conf.set(k, v)
            for full_name in sorted(tables_in_batch):
                info = mappings[full_name]
                ev = row_events.filter(F.col("_full_name") == full_name)
                t0 = _time.perf_counter()
                _apply_table(
                    spark,
                    ev,
                    store,
                    info,
                    k3_mode,
                    result,
                    n_dead=dead_counts.get(full_name, 0),
                    small=small,
                    n_valid=row_counts.get(full_name, 0)
                    - dead_counts.get(full_name, 0),
                    batch_token=batch_token,
                )
                result.apply_latency_s[f"apply:{full_name}"] = _time.perf_counter() - t0
        finally:
            if small:
                try:
                    for k, v in prev_conf.items():
                        if v is None:
                            spark.conf.unset(k)
                        else:
                            spark.conf.set(k, v)
                finally:
                    _SMALL_CONF_LOCK.release()

        if max_dead_letter is not None and result.dead_letter_count > max_dead_letter:
            raise DeadLetterOverflowError(
                f"dead-letter count {result.dead_letter_count} exceeds "
                f"max_dead_letter={max_dead_letter}"
            )

        if advance_checkpoint and result.checkpoint_position is not None:
            _write_checkpoint(
                store, result.checkpoint_position, result.checkpoint_filename
            )
        result.apply_latency_s["batch"] = _time.perf_counter() - batch_t0
        return result
    finally:
        events.unpersist()


def source_struct(info: HbaseTableInfo) -> "T.StructType":
    """The SOURCE row schema a mapping declares: db column names typed by the
    MySQL→Spark map (HbaseTableInfo.scala:158-182). Used to parse JSON row
    images in the heterogeneous multi-table stream — the analog of resolving
    TableInfo per TableMap event (MySQLExtractor.scala:182-202)."""
    from pyspark.sql import types as T

    from mysql_hbase_replicator_spark.functions.types import mysql_type_to_spark

    return T.StructType(
        [
            T.StructField(c.dbColumnName, mysql_type_to_spark(c.dbColumnType), True)
            for c in info.cols
        ]
    )


def _apply_table(
    spark: SparkSession,
    ev: DataFrame,
    store: ParquetKeyedStore,
    info: HbaseTableInfo,
    k3_mode: str,
    result: CdcBatchResult,
    n_dead: int = -1,
    small: bool = False,
    n_valid: int = -1,
    batch_token: str | None = None,
) -> None:
    # Small-batch regime: the action-expansion union below reads this frame
    # once per branch (3 branches), so a 32-partition micro-batch cache turns
    # into ~100 near-empty scan tasks per action. Coalesce (narrow — no
    # shuffle; each task just reads several cached blocks) to keep task
    # counts proportional to the data.
    if small:
        ev = ev.coalesce(4)
    # generic multi-table mode: images arrive as JSON strings; parse them
    # against THIS table's declared source schema before the typed kernel.
    # The RAW strings are kept aside first: the dead-letter payload must
    # preserve the delivery verbatim — serializing the post-parse structs
    # instead destroys any source value the current (possibly wrong)
    # mapping mistyped or didn't declare, which is exactly the data a
    # replay-after-mapping-fix needs back (r13 review).
    dtypes = dict(ev.dtypes)
    raw_json_images = dtypes.get("before") == "string"
    if raw_json_images:
        ev = ev.withColumn("_raw_before", F.col("before")).withColumn(
            "_raw_after", F.col("after")
        )
        struct = source_struct(info)
        ev = ev.withColumn("before", F.from_json("before", struct)).withColumn(
            "after", F.from_json("after", struct)
        )
    sink_cols = [c.hbaseColumnName for c in info.cols]
    sink_pks = [c.hbaseColumnName for c in info.key_columns()]
    table_name = info.hbaseTableName or info.full_name

    # stream-order key for the K5 collapse: seq when the source stamps it
    # (positions reset per binlog file — see apply_cdc_batch), else position
    ev = ev.withColumn("_ord", F.col("seq") if "seq" in ev.columns else F.col("position"))

    # --- K1 validation → dead letter ---------------------------------------
    valid = (
        F.when(F.col("op") == OP_INSERT, _pks_valid(info, "after"))
        .when(F.col("op") == OP_DELETE, _pks_valid(info, "before"))
        # update computes both rowkeys, like the reference
        # (HbaseApplier.scala:250-251 calls getRowKeyForSpark on both images)
        .when(F.col("op") == OP_UPDATE, _pks_valid(info, "after") & _pks_valid(info, "before"))
        .otherwise(F.lit(False))
    )
    ev = ev.withColumn("_valid", valid)
    if n_dead < 0:  # caller didn't pre-count (direct _apply_table use)
        n_dead = ev.filter(~F.col("_valid")).count()
    if n_dead:
        dead = ev.filter(~F.col("_valid"))
        result.dead_letter_count += n_dead
        # payload: the delivery verbatim. Generic mode embeds the RAW image
        # strings (pre-parse); typed mode serializes the typed structs,
        # which ARE the delivery there.
        payload = (
            F.concat(
                F.lit('{"before":'),
                F.coalesce(F.col("_raw_before"), F.lit("null")),
                F.lit(',"after":'),
                F.coalesce(F.col("_raw_after"), F.lit("null")),
                F.lit("}"),
            )
            if raw_json_images
            else F.to_json(F.struct("before", "after"))
        )
        dead.select(
            F.col("position"),
            # stream order survives the queue: without seq a replay's K5
            # collapse falls back to position order, which is invalid when
            # binlog positions reset per file (r13 review)
            *([F.col("seq")] if "seq" in dead.columns else []),
            F.col("op"),
            F.lit(info.full_name).alias("table_name"),
            F.lit("sql statement does not contain all primary keys").alias("reason"),
            payload.alias("payload"),
            # preserved verbatim so a replay re-applies the event exactly as
            # received — the included-columns gate and binlog file included
            F.col("included_before"),
            F.col("included_after"),
            F.col("filename"),
        ).write.mode("overwrite").parquet(
            # per-(batch, table) subdir: a replayed batch overwrites its own
            # prior write (idempotent); without a token the write gets a
            # unique subdir — append semantics in the uniform layout
            dead_letter_batch_path(
                store,
                f"{batch_token or 'adhoc-' + uuid.uuid4().hex[:12]}-{info.full_name}",
            )
        )
    ev = ev.filter(F.col("_valid"))
    if n_valid == 0:
        # every event for this table was dead-lettered: there is nothing to
        # merge, and the count is already known from the batch-stats pass —
        # skip the collapse + store write (the LSM store would otherwise
        # append an empty delta per all-dead batch)
        return

    # --- expand events into keyed actions ----------------------------------
    def upsert_from_after(src: DataFrame) -> DataFrame:
        return src.select(
            "_ord",
            F.lit(1).alias("_seq"),
            F.lit("upsert").alias("_kind"),
            *_sink_projection(info, "after"),
        )

    def delete_from_before(src: DataFrame) -> DataFrame:
        before_pks = [
            _gated("before", c.dbColumnName)
            .cast(spark_type_from_name(c.hbaseColumnType, restrict_to_six=False))
            .alias(c.hbaseColumnName)
            for c in info.key_columns()
        ]
        non_keys = [
            F.lit(None).cast(spark_type_from_name(c.hbaseColumnType, restrict_to_six=False)).alias(c.hbaseColumnName)
            for c in info.non_key_columns()
        ]
        proj = src.select("_ord", F.lit(0).alias("_seq"), F.lit("delete").alias("_kind"), *before_pks, *non_keys)
        return proj.select("_ord", "_seq", "_kind", *sink_cols)

    actions = upsert_from_after(ev.filter(F.col("op") == OP_INSERT))
    updates = ev.filter(F.col("op") == OP_UPDATE)
    actions = actions.unionByName(upsert_from_after(updates))
    if k3_mode == "intended":
        # delete the before-key; when the PK didn't change, the same-position
        # upsert (seq 1 > 0) wins — full-row replace, like the reference's
        # delete-then-Put (HbaseApplier.scala:252-258).
        actions = actions.unionByName(delete_from_before(updates))
    actions = actions.unionByName(delete_from_before(ev.filter(F.col("op") == OP_DELETE)))

    # --- K5: last action per PK by (stream order, seq) ---------------------
    w = Window.partitionBy(*sink_pks).orderBy(F.desc("_ord"), F.desc("_seq"))
    final = actions.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)

    # The rewrite store's merge runs two actions over the collapsed batch
    # (changed-bucket discovery, then the staged write) — for LARGE batches,
    # cache the collapse so the window shuffle executes once per batch, not
    # once per action. Small micro-batches skip the cache: the dedicated
    # materialization action costs more than recomputing a few-thousand-row
    # window inside the merge's actions (SMALL_BATCH_ROWS note above). A
    # single-action store (LogStructuredKeyedStore's delta append) never
    # benefits from the cache.
    cache = not small and store.MULTI_ACTION_MERGE
    if cache:
        final = final.persist()
    try:
        # --- K2/K3/K4: MERGE ------------------------------------------------
        store.merge_actions(spark, table_name, final, sink_cols, sink_pks)
    finally:
        if cache:
            final.unpersist()


def replay_dead_letters(
    spark: SparkSession,
    store: ParquetKeyedStore,
    mappings: dict[str, HbaseTableInfo],
    k3_mode: str = "intended",
) -> CdcBatchResult | None:
    """K6 drain semantics (Rep.scala:67-97: queued failed events are retried
    in order before new work): re-apply everything in the dead-letter table
    under the CURRENT mappings — the recovery path after an operator fixes a
    mapping (e.g. corrects the declared PK set). Events that still fail
    validation are re-dead-lettered by the kernel, so one call = one ordered
    drain pass. Returns None when there is nothing to replay.

    Fully distributed: the table directory is renamed aside (atomic drain —
    survivors re-append to a fresh directory), row images are re-extracted
    JVM-side with ``get_json_object``, and the resulting DataFrame feeds
    straight back through ``apply_cdc_batch``. Nothing is collected to the
    driver, so a poisoned stream's multi-million-row queue replays at the
    same scale as a normal batch. The included-columns gate and binlog
    filename travel with each event, so a replay applies the event exactly
    as originally received. The checkpoint is not advanced by a drain
    (replayed positions are historical). A drain directory left behind by a
    crashed replay is picked up by the next call."""
    import glob
    import shutil

    path = os.path.join(store.base_dir, DEAD_LETTER_TABLE)
    drain_dirs = sorted(glob.glob(path + ".draining.*"))  # stale crashed drains
    if os.path.isdir(path):
        # next suffix = max(existing)+1, NOT len(drain_dirs): after a crash
        # mid-cleanup the surviving set can be sparse (".draining.1" alive,
        # ".draining.0" removed) and a len-derived name would collide —
        # shutil.move would then nest the live dir INSIDE the stale one,
        # hiding its files from the parquet reader and losing the replay.
        used = [int(d.rsplit(".", 1)[-1]) for d in drain_dirs if d.rsplit(".", 1)[-1].isdigit()]
        dst = f"{path}.draining.{max(used, default=-1) + 1}"
        shutil.move(path, dst)
        drain_dirs.append(dst)
    if not drain_dirs:
        return None
    # Layout shim for pre-upgrade queues: the old writers appended parquet
    # files at the TABLE ROOT, the current layout is batch=<token> partition
    # subdirs, and Spark's partition discovery refuses a directory mixing
    # the two. Move any visible root-level files into their own batch=
    # subdir before reading (idempotent and crash-safe: the drain dir is
    # already renamed aside, and a re-run just moves whatever files remain;
    # underscore/dot files like _SUCCESS are invisible to discovery).
    for d in drain_dirs:
        root_files = [
            f
            for f in os.listdir(d)
            if os.path.isfile(os.path.join(d, f)) and not f.startswith(("_", "."))
        ]
        if root_files:
            legacy = os.path.join(d, "batch=legacy-migrated")
            os.makedirs(legacy, exist_ok=True)
            for f in root_files:
                shutil.move(os.path.join(d, f), os.path.join(legacy, f))
    dl = spark.read.option("mergeSchema", "true").parquet(*drain_dirs)
    if "batch" in dl.columns:
        # the per-write subdir token surfaces as a partition column on read;
        # it is layout bookkeeping, not event payload — drop it so replays
        # and re-queues never carry it into data files (a data column named
        # like the partition key would corrupt later partition discovery)
        dl = dl.drop("batch")
    # Exact-duplicate queue rows are replay ARTIFACTS (an event is
    # dead-lettered once per delivery; identical payload+position rows come
    # from a replayed batch that landed under two different batch tokens —
    # e.g. a replay straddling the token-scheme upgrade, where the old
    # write used `b7-...` and the re-delivery wrote `<lineage>-b7-...`, so
    # overwrite couldn't collapse them). Dedupe before applying: otherwise
    # the drain double-applies and still-invalid events re-queue in
    # duplicate, permanently. This byte-level pass is NOT sufficient on its
    # own (ADVICE r10): the same failure re-queued by a crashed earlier
    # drain re-serializes its payload (to_json of the re-extracted images),
    # which may differ from the original delivery in whitespace/wrapper
    # formatting — those duplicates are collapsed by the post-extraction
    # dedupe on ev_df below, after get_json_object has re-minified both.
    dl = dl.dropDuplicates()
    for c, t in (
        ("included_before", "array<string>"),  # legacy pre-upgrade queues
        ("included_after", "array<string>"),
        ("filename", "string"),
    ):
        if c not in dl.columns:
            dl = dl.withColumn(c, F.lit(None).cast(t))
    # Re-queue (K6: failures never vanish) everything the drain cannot
    # apply, VERBATIM from the queue rows: ingest-level dead letters whose
    # op is not a row op (e.g. corrupt Debezium envelopes queued by
    # debezium_dead_letters), and rows for tables absent from the CURRENT
    # mappings — apply_cdc_batch would merely count those as
    # skipped_unmapped while the drain's cleanup deleted their queue dirs,
    # silently destroying a decommissioned-then-remapped table's failures
    # (r13 review).
    mapped_names = list(mappings)
    requeue = dl.filter(
        ~F.col("op").isin(*ROW_OPS) | ~F.col("table_name").isin(*mapped_names)
    )
    n_requeue = requeue.count()
    if n_requeue:
        requeue.write.mode("overwrite").parquet(
            dead_letter_batch_path(store, f"requeue-{uuid.uuid4().hex[:12]}")
        )
    live = dl.filter(
        F.col("op").isin(*ROW_OPS) & F.col("table_name").isin(*mapped_names)
    )
    # stream order survives the round trip: queued rows carry seq when their
    # source stamped it — re-emit it VERBATIM (caller-owned type: long
    # offset or ts/file/pos struct; the kernel only needs orderability) so
    # the replay's K5 collapse keeps seq order (positions reset per binlog
    # file). Only when some row actually carries one: an all-null seq
    # column would OUST the position fallback in apply_cdc_batch and break
    # ordering for position-only queues.
    has_seq = "seq" in dl.columns and live.filter(
        F.col("seq").isNotNull()
    ).limit(1).count() > 0
    # route through the generic JSON path so each table parses against its
    # CURRENT mapping schema. get_json_object lifts the sub-objects back out
    # of the payload as JSON text per row, executor-side.
    ev_df = live.select(
        F.col("position").cast("long").alias("position"),
        *([F.col("seq")] if has_seq else []),
        F.col("op").cast("string").alias("op"),
        F.substring_index("table_name", ".", 1).alias("db"),
        F.substring_index("table_name", ".", -1).alias("table"),
        F.get_json_object("payload", "$.before").alias("before"),
        F.get_json_object("payload", "$.after").alias("after"),
        F.col("included_before"),
        F.col("included_after"),
        F.col("filename"),
    )
    # Semantic dedupe (ADVICE r10): get_json_object re-emits the extracted
    # before/after subtrees Jackson-minified, so two queue rows describing
    # the SAME failed event that differ only in payload formatting (the
    # original delivery vs a crashed drain's to_json re-queue) collapse
    # here even though the byte-level pass above missed them. Distinct
    # failures survive: two different events can't agree on every one of
    # (position, op, db, table, minified images, gates, filename) — the
    # only theoretical collision is two identical PK-less rows inside one
    # multi-row event, which the byte-level dropDuplicates above already
    # collapsed under the old scheme too.
    ev_df = ev_df.dropDuplicates()
    if ev_df.isEmpty():
        for d in drain_dirs:
            shutil.rmtree(d)
        if n_requeue:
            result = CdcBatchResult()
            result.dead_letter_count = n_requeue
            return result
        return None
    result = apply_cdc_batch(
        spark, ev_df, store, mappings, k3_mode=k3_mode, advance_checkpoint=False
    )
    result.dead_letter_count += n_requeue
    for d in drain_dirs:
        shutil.rmtree(d)
    return result

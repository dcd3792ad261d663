"""Debezium envelope adapter: the Kafka path into the CDC kernel.

SURVEY.md §2 S1 names the idiomatic production source for the reference's
binlog tail (`MySQLExtractor.scala:32-73` + `BinaryLogClient`): a
Kafka/Debezium topic consumed with `spark.readStream.format("kafka")`.
This module supplies the missing half of that swap — the transformation
from Debezium's MySQL connector envelope to the engine's normalized CDC
event schema (sources/cdc_events.py) — as a PURE DataFrame transformation,
so it is fully testable on envelope fixtures without a broker, and the same
column expressions run on a real Kafka stream unchanged.

Envelope → event mapping (Debezium MySQL connector JSON, unwrapped):

| Debezium                      | engine event                               |
|-------------------------------|--------------------------------------------|
| `op` c / r                    | `insert` (r = snapshot read — an upsert)   |
| `op` u                        | `update`                                   |
| `op` d                        | `delete`                                   |
| `before` / `after` sub-docs   | `before` / `after` JSON row images         |
| `source.db` / `source.table`  | `db` / `table`                             |
| `source.pos`                  | `position`                                 |
| `source.file`                 | `filename` (rotate tracking: the kernel    |
|                               |  checkpoints the latest file by seq order) |
| `source.ts_ms`×1000 + offset  | `seq` (globally monotonic arrival order —  |
|                               |  REQUIRED: binlog positions reset per file)|

Tombstones (null value payloads Debezium emits after deletes for Kafka log
compaction) carry no row data and are dropped. Non-null payloads that fail
to parse (corrupt JSON, missing/unknown `op`) are NOT dropped: route them
through ``debezium_dead_letters`` into the kernel's ``_dead_letter`` table
— the K6 contract (`Rep.scala:67-97` queues failed events rather than
discarding them) applies to ingest corruption the same as to apply
failures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# the envelope fields the adapter consumes; payloads stay JSON strings so
# the kernel parses them per table against the MAPPING's declared schema
# (the same generic multi-table path as read_event_stream_json)
_ENVELOPE_SCHEMA = (
    "op STRING, before STRING, after STRING, "
    "source STRUCT<db: STRING, `table`: STRING, file: STRING, pos: BIGINT, "
    "ts_ms: BIGINT, server_id: BIGINT>"
)

_OP_MAP = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}


def _op_col(op: Column) -> Column:
    out = F.lit(None).cast("string")
    for dbz, ours in _OP_MAP.items():
        out = F.when(op == dbz, F.lit(ours)).otherwise(out)
    return out


def parse_envelopes(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """The shared parse pass: original columns + ``_env`` (typed envelope
    struct) + ``_op`` (normalized op, NULL for tombstones/corrupt rows).
    ``debezium_to_cdc_events`` and ``debezium_dead_letters`` are both cheap
    projections of this frame — a caller that needs both (the streaming
    pipeline does, every micro-batch) should parse ONCE, persist the result,
    and pass it via their ``parsed=`` parameter; re-deriving the parse per
    consumer doubles the JSON work and, worse, adds a dedicated count action
    per batch (the r6 Debezium-vs-jsonl latency gap, BENCH_r06)."""
    return raw.withColumn(
        "_env", F.from_json(F.col(value_col).cast("string"), _ENVELOPE_SCHEMA)
    ).withColumn("_op", _op_col(F.col("_env.op")))


_parsed = parse_envelopes  # internal alias (original name)


def debezium_to_cdc_events(
    raw: DataFrame | None = None,
    value_col: str = "value",
    seq_col: Column | None = None,
    parsed: DataFrame | None = None,
) -> DataFrame:
    """Transform a frame of Debezium envelope JSON strings (the `value` of a
    Kafka record, after schema-registry unwrapping) into the engine's CDC
    event schema. Works on batch and streaming frames; only rows that parse
    to a known op are returned — tombstones (null payloads) are dropped by
    design, and corrupt/unknown envelopes are the ``debezium_dead_letters``
    split of the same input (the caller appends them to the kernel's
    dead-letter table; see CdcStreamPipeline's Debezium wiring).

    `seq` (globally monotonic arrival order; the kernel's K5 collapse and
    rotate-aware checkpoint order by it):

    - ``seq_col`` given: used verbatim, caller-owned TYPE included — the
      kernel only needs ``seq`` to be orderable (max-struct + window
      orderBy), so a caller may pass the Kafka partition offset (a long —
      Debezium keys records by PK, so a
      per-partition offset totally orders each key's history) or an
      order-preserving STRUCT like ``(ts_ms, file, pos)`` — the
      window-free form ``CdcStreamPipeline`` passes per micro-batch (the
      rank window below costs ~0.25 s of per-batch fixed time, measured
      r8; the struct encodes the identical lexicographic order for free).
    - batch frames: ``ts_ms * 1e6 + rank(pos) within ts_ms`` — Debezium
      stamps ts_ms per transaction (monotonic across binlog files), and the
      dense per-millisecond rank (ordered by file, pos) is order-preserving
      for ANY position values, unlike arithmetic on pos digits (positions
      straddling a modulus would invert). The rank window partitions on
      ts_ms — high cardinality, so no low-parallelism hazard — and fits a
      long until year ~2262 for < 1e6 events per source millisecond.
    - streaming frames without ``seq_col``: window functions are
      unavailable, so seq degrades to ``ts_ms * 1e6`` (same-millisecond
      arrival ties are NOT broken — pass the source's offset instead).
    """
    if parsed is None:
        if raw is None:
            raise ValueError("debezium_to_cdc_events: pass raw or parsed")
        parsed = _parsed(raw, value_col)
    env = parsed.filter(F.col("_op").isNotNull())
    if seq_col is not None:
        seq = seq_col  # verbatim: caller owns the type (long offset or struct)
    else:
        coarse = F.col("_env.source.ts_ms") * F.lit(1_000_000)
        if parsed.isStreaming:
            seq = coarse
        else:
            wr = Window.partitionBy(F.col("_env.source.ts_ms")).orderBy(
                F.col("_env.source.file"), F.col("_env.source.pos")
            )
            seq = (coarse + F.row_number().over(wr) - F.lit(1)).cast("long")
    return env.select(
        F.col("_env.source.pos").alias("position"),
        F.col("_op").alias("op"),
        F.col("_env.source.db").alias("db"),
        F.col("_env.source.table").alias("table"),
        F.col("_env.before").alias("before"),
        F.col("_env.after").alias("after"),
        F.lit(None).cast("array<string>").alias("included_before"),
        F.lit(None).cast("array<string>").alias("included_after"),
        F.col("_env.source.file").alias("filename"),
        seq.alias("seq"),
    )


def debezium_dead_letters(
    raw: DataFrame | None = None,
    value_col: str = "value",
    parsed: DataFrame | None = None,
) -> DataFrame:
    """The rows ``debezium_to_cdc_events`` cannot convert — non-null
    payloads that fail JSON parsing or carry a missing/unknown ``op`` — in
    the kernel's ``_dead_letter`` schema, raw payload preserved verbatim so
    an operator can fix and replay them (K6: failures queue, never vanish).
    Tombstones (null payloads) are NOT dead letters: they are a documented
    part of the protocol and carry no information to replay."""
    if parsed is None:
        if raw is None:
            raise ValueError("debezium_dead_letters: pass raw or parsed")
        parsed = _parsed(raw, value_col)
    bad = parsed.filter(F.col(value_col).isNotNull() & F.col("_op").isNull())
    return bad.select(
        F.col("_env.source.pos").alias("position"),
        F.coalesce(F.col("_env.op"), F.lit("?")).alias("op"),
        F.nullif(
            F.concat_ws(".", F.col("_env.source.db"), F.col("_env.source.table")),
            F.lit(""),
        ).alias("table_name"),
        # PERMISSIVE from_json yields an all-null struct (never a null
        # struct) on malformed input, so "unparseable" = no field survived
        F.when(
            F.col("_env.op").isNull()
            & F.col("_env.before").isNull()
            & F.col("_env.after").isNull()
            & F.col("_env.source").isNull(),
            F.lit("unparseable debezium envelope"),
        )
        .otherwise(F.lit("unknown debezium op"))
        .alias("reason"),
        F.col(value_col).cast("string").alias("payload"),
        F.lit(None).cast("array<string>").alias("included_before"),
        F.lit(None).cast("array<string>").alias("included_after"),
        F.col("_env.source.file").alias("filename"),
    )


def read_debezium_stream(
    spark, brokers: str, topic: str, starting_offsets: str = "earliest"
) -> DataFrame:
    """The production source: a Kafka Debezium topic as a streaming frame of
    RAW envelope lines (one ``value`` string column), shaped as the drop-in
    replacement for ``CdcStreamPipeline(source_format="debezium")``'s file
    reader — route it through the pipeline, whose per-batch split parses
    once and DEAD-LETTERS corrupt/unknown envelopes (K6). An earlier form
    returned ``debezium_to_cdc_events`` directly, which silently dropped
    every envelope that failed to parse — failures must queue, never vanish
    (r13 review; Rep.scala:67-97 parity).

    Ordering note for multi-partition topics: Debezium keys records by PK,
    so each key's history is totally ordered within its partition and the
    kernel's K5 per-key collapse stays correct; the FILE/POSITION
    checkpoint, however, is taken from the globally latest event by seq and
    becomes advisory across partitions — resume truth under Kafka is the
    stream's checkpointLocation (S2), and exact reference checkpoint parity
    needs a single-partition topic (the reference consumes one binlog
    socket = one total order).

    Requires the spark-sql-kafka package on the cluster (not present in the
    test sandbox — the envelope transformation above is what the tests
    cover; this assembly mirrors sources/jdbc.py's option-assembly
    pattern)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(F.col("value").cast("string").alias("value"))

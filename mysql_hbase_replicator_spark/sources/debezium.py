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
compaction) carry no row data and are dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


def debezium_to_cdc_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Transform a frame of Debezium envelope JSON strings (the `value` of a
    Kafka record, after schema-registry unwrapping) into the engine's CDC
    event schema. Works identically on batch and streaming frames.

    `seq` is ts_ms*1000 + pos%1000: Debezium stamps ts_ms per transaction
    (monotonic across files), and the low digits of pos break ties within a
    transaction deterministically. Sources that provide a true offset column
    (Kafka partition offset) should overwrite `seq` with it after this call.
    """
    env = raw.withColumn(
        "_env", F.from_json(F.col(value_col).cast("string"), _ENVELOPE_SCHEMA)
    ).filter(F.col("_env").isNotNull() & F.col("_env.op").isNotNull())  # tombstones
    return env.select(
        F.col("_env.source.pos").alias("position"),
        _op_col(F.col("_env.op")).alias("op"),
        F.col("_env.source.db").alias("db"),
        F.col("_env.source.table").alias("table"),
        F.col("_env.before").alias("before"),
        F.col("_env.after").alias("after"),
        F.lit(None).cast("array<string>").alias("included_before"),
        F.lit(None).cast("array<string>").alias("included_after"),
        F.col("_env.source.file").alias("filename"),
        (
            F.col("_env.source.ts_ms") * F.lit(1000)
            + F.pmod(F.col("_env.source.pos"), F.lit(1000))
        ).alias("seq"),
    ).filter(F.col("op").isNotNull())


def read_debezium_stream(
    spark, brokers: str, topic: str, starting_offsets: str = "earliest"
) -> DataFrame:
    """The production source: a Kafka Debezium topic as a streaming frame of
    CDC events, ready for CdcStreamPipeline's generic multi-table kernel.
    Requires the spark-sql-kafka package on the cluster (not present in the
    test sandbox — the envelope transformation above is what the tests
    cover; this assembly mirrors sources/jdbc.py's option-assembly pattern)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return debezium_to_cdc_events(raw)

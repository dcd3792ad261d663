"""CDC change-event model (SURVEY.md §1.1, FIXTURES.md B2).

The reference's RepEvent ADT (RepEvent.scala:9-14) normalized into a flat
Spark schema — one record per row-change plus checkpoint markers:

| column          | type            | notes                                   |
|-----------------|-----------------|-----------------------------------------|
| position        | long            | binlog position; apply order            |
| op              | string          | insert/update/delete; rotate/next_position markers |
| db              | string          | source database                         |
| table           | string          | db.table keys the mapping               |
| before          | struct          | pre-image (update/delete)               |
| after           | struct          | post-image (insert/update)              |
| included_before | array<string>   | present-column list (BitSet analog,     |
| included_after  | array<string>   |  HbaseApplier.scala:197-208); NULL = all|
| filename        | string          | binlog filename (RepEvent.scala:9-10);  |
|                 |                 |  rotate events announce the new file    |
|                 |                 |  (HbaseApplier.scala:155-165); NULL =   |
|                 |                 |  unchanged since the last known file    |
| seq (optional)  | long            | globally monotonic arrival order. Real  |
|                 |                 |  MySQL positions reset per binlog file, |
|                 |                 |  so sources that rotate mid-batch MUST  |
|                 |                 |  stamp seq; without it the kernel falls |
|                 |                 |  back to position order (valid only for |
|                 |                 |  globally monotonic positions)          |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"
OP_ROTATE = "rotate"
OP_NEXT_POSITION = "next_position"
ROW_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)


def cdc_event_schema(row_struct: T.StructType, with_seq: bool = False) -> T.StructType:
    """Event schema for a given source-table row struct (all fields nullable
    — absence is expressed via included_* or null structs)."""
    nullable_struct = T.StructType(
        [T.StructField(f.name, f.dataType, nullable=True) for f in row_struct.fields]
    )
    fields = [
        T.StructField("position", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("db", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("before", nullable_struct, True),
        T.StructField("after", nullable_struct, True),
        T.StructField("included_before", T.ArrayType(T.StringType()), True),
        T.StructField("included_after", T.ArrayType(T.StringType()), True),
        T.StructField("filename", T.StringType(), True),
    ]
    if with_seq:
        fields.append(T.StructField("seq", T.LongType(), True))
    return T.StructType(fields)


def events_from_rows(
    spark: SparkSession, rows: list[dict], row_struct: T.StructType
) -> DataFrame:
    """Build a CDC event DataFrame from python dicts (test/fixture helper).

    Each dict: {position, op, db, table, before: dict|None, after: dict|None,
    included_before: list|None, included_after: list|None}.
    """
    with_seq = any("seq" in r for r in rows)
    schema = cdc_event_schema(row_struct, with_seq=with_seq)
    field_names = [f.name for f in row_struct.fields]

    def to_struct_tuple(d: dict | None):
        if d is None:
            return None
        return tuple(d.get(n) for n in field_names)

    data = [
        (
            r["position"],
            r["op"],
            r.get("db", "db"),
            r.get("table", "t"),
            to_struct_tuple(r.get("before")),
            to_struct_tuple(r.get("after")),
            r.get("included_before"),
            r.get("included_after"),
            r.get("filename"),
        )
        + ((r.get("seq"),) if with_seq else ())
        for r in rows
    ]
    return spark.createDataFrame(data, schema)


def read_event_log(
    spark: SparkSession,
    path: str,
    row_struct: T.StructType,
    with_seq: bool = False,
) -> DataFrame:
    """Batch-read a CDC event directory (json lines, the self-contained
    binlog stand-in per SURVEY §2.1 S1). ``with_seq=True`` scans the
    globally monotonic ``seq`` column — sources whose rotates land
    mid-batch MUST stamp it (see the module table); without the knob the
    typed readers silently dropped a stamped seq and the kernel fell back
    to position order (r13 review). Opt-in for the same reason as
    ``cdc_json_event_schema``: an all-NULL seq from legacy files would
    oust the position fallback."""
    return spark.read.schema(cdc_event_schema(row_struct, with_seq=with_seq)).json(path)


def read_event_stream(
    spark: SparkSession,
    path: str,
    row_struct: T.StructType,
    max_files_per_trigger: int = 16,
    with_seq: bool = False,
) -> DataFrame:
    """Structured Streaming source over the same event directory. Resume
    comes from checkpointLocation (S2) — no hand-rolled position row.
    ``max_files_per_trigger`` bounds micro-batch size (latency/throughput
    knob; 1 = one event file per micro-batch, the latency-bench setting).
    ``with_seq``: see ``read_event_log``."""
    return (
        spark.readStream.schema(cdc_event_schema(row_struct, with_seq=with_seq))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


# --- heterogeneous multi-table stream (the real binlog shape) --------------
# One binlog carries every table's changes; a single typed row_struct cannot
# describe them all. In generic mode the images stay as JSON strings in the
# stream and are parsed per table inside the kernel, against the schema the
# MAPPING declares (db column names + MySQL types → Spark types,
# HbaseTableInfo.scala:158-182) — the Spark analog of the reference resolving
# TableInfo per TableMap event (MySQLExtractor.scala:182-202).

CDC_JSON_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("position", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("db", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("before", T.StringType(), True),  # JSON row image
        T.StructField("after", T.StringType(), True),  # JSON row image
        T.StructField("included_before", T.ArrayType(T.StringType()), True),
        T.StructField("included_after", T.ArrayType(T.StringType()), True),
        T.StructField("filename", T.StringType(), True),
    ]
)


def cdc_json_event_schema(with_seq: bool = False) -> T.StructType:
    """The generic stream's schema, optionally extended with the globally
    monotonic ``seq`` column. Opt-in (not always-on) because a seq column
    that scans as all-NULL from legacy seq-less files would silently break
    the kernel's stream-order fallback to position."""
    if not with_seq:
        return CDC_JSON_EVENT_SCHEMA
    return T.StructType(
        [*CDC_JSON_EVENT_SCHEMA.fields, T.StructField("seq", T.LongType(), True)]
    )


def read_event_stream_json(
    spark: SparkSession,
    path: str,
    with_seq: bool = False,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Schema-free (multi-table) streaming source: images are JSON strings,
    parsed per table in the kernel from each table's declared mapping.
    ``with_seq=True`` declares the seq column for sources that stamp arrival
    order (REQUIRED when rotates can land mid-batch — positions reset per
    binlog file)."""
    return (
        spark.readStream.schema(cdc_json_event_schema(with_seq))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )

"""Heterogeneous multi-table replication over ONE event stream — the real
binlog shape (SURVEY.md §3.1: one MySQLExtractor feeds every mapped table;
hard-parts note on multi-table ordering). Row images travel as JSON and are
parsed per table from each mapping's declared source schema inside the
kernel; per-table apply parallelizes safely because keys never cross tables,
and the checkpoint advances only after every table in the batch committed."""

from __future__ import annotations

import json
import os

from mysql_hbase_replicator_spark.catalog.meta import HbaseCollInfo, HbaseTableInfo
from mysql_hbase_replicator_spark.operators.merge import ParquetKeyedStore
from mysql_hbase_replicator_spark.streaming.pipeline import CdcStreamPipeline


def score_log_mapping() -> HbaseTableInfo:
    """A second mapped table with a different shape: single bigint PK +
    double payload (types exercise the long/double rows of the MySQL map)."""
    return HbaseTableInfo(
        dbName="mixfs",
        dbTableName="score_log",
        hbaseTableName="mixfs:score_log",
        hbaseNameSpace="mixfs",
        sparkTableName="score_log",
        bytesUtils="Binary",
        cols=[
            HbaseCollInfo("entry_id", "bigint", "entryid", "LongType", True),
            HbaseCollInfo("points", "double", "points", "DoubleType", False),
        ],
    )


def write_events(events_dir: str, name: str, events: list[dict]) -> None:
    os.makedirs(events_dir, exist_ok=True)
    tmp = os.path.join(events_dir, f".{name}.tmp")
    with open(tmp, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    os.replace(tmp, os.path.join(events_dir, f"{name}.json"))


def test_two_tables_one_stream(spark, tmp_path, student_mapping):
    events = [
        {"position": 1, "op": "insert", "db": "mixfs", "table": "student",
         "after": {"sn": 1, "id": 1, "score": 10, "name": "ann", "rem": "a"}},
        {"position": 2, "op": "insert", "db": "mixfs", "table": "score_log",
         "after": {"entry_id": 100, "points": 1.5}},
        {"position": 3, "op": "insert", "db": "mixfs", "table": "unmapped_t",
         "after": {"x": 1}},
        {"position": 4, "op": "update", "db": "mixfs", "table": "score_log",
         "before": {"entry_id": 100, "points": 1.5},
         "after": {"entry_id": 100, "points": 7.25}},
        {"position": 5, "op": "delete", "db": "mixfs", "table": "student",
         "before": {"sn": 1, "id": 1}},
        {"position": 6, "op": "insert", "db": "mixfs", "table": "student",
         "after": {"sn": 2, "id": 2, "score": 55, "name": "bob", "rem": None}},
    ]
    write_events(str(tmp_path / "events"), "b1", events)

    store = ParquetKeyedStore(str(tmp_path / "store"), n_buckets=4)
    pipe = CdcStreamPipeline(
        spark=spark,
        events_path=str(tmp_path / "events"),
        row_struct=None,  # generic multi-table stream
        store=store,
        mappings={
            "mixfs.student": student_mapping,
            "mixfs.score_log": score_log_mapping(),
        },
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = pipe.start(available_now=True)
    q.awaitTermination(120)

    students = sorted(
        tuple(r)
        for r in store.read(spark, "mixfs:student2")
        .select("sn", "id", "score", "name", "rem")
        .collect()
    )
    assert students == [(2, 2, 55, "bob", None)]

    scores = [
        tuple(r)
        for r in store.read(spark, "mixfs:score_log")
        .select("entryid", "points")
        .collect()
    ]
    assert scores == [(100, 7.25)]

    counts = pipe.total_counts()
    assert counts == {
        "mixfs.student.insert": 2,
        "mixfs.student.delete": 1,
        "mixfs.score_log.insert": 1,
        "mixfs.score_log.update": 1,
    }
    # the unmapped table advanced the checkpoint but wrote nothing
    assert pipe.results[-1].skipped_unmapped == 1
    assert pipe.results[-1].checkpoint_position == 6

"""S3 JDBC snapshot source: option assembly for the parallel scan, and the
snapshot→store bootstrap followed by idempotent CDC replay over it."""

from __future__ import annotations

import pytest

from mysql_hbase_replicator_spark.operators.cdc_apply import apply_cdc_batch
from mysql_hbase_replicator_spark.operators.merge import ParquetKeyedStore
from mysql_hbase_replicator_spark.sources.cdc_events import events_from_rows
from mysql_hbase_replicator_spark.sources.jdbc import (
    build_jdbc_options,
    snapshot_to_store,
)


def test_build_jdbc_options_partitioned():
    opts = build_jdbc_options(
        "dbhost", 3306, "mixfs", "student", "u", "p",
        partition_column="sn", lower_bound=0, upper_bound=1000, num_partitions=16,
    )
    assert opts["url"] == "jdbc:mysql://dbhost:3306/mixfs"
    assert opts["partitionColumn"] == "sn"
    assert (opts["lowerBound"], opts["upperBound"], opts["numPartitions"]) == ("0", "1000", "16")


def test_build_jdbc_options_requires_bounds():
    with pytest.raises(ValueError, match="bounds"):
        build_jdbc_options("h", 3306, "d", "t", "u", "p", partition_column="sn")


def test_snapshot_bootstrap_then_cdc_replay(spark, tmp_path, student_struct, student_mapping):
    """Seed from a snapshot, then apply a CDC batch including events that
    predate the snapshot (replay overlap) — upsert idempotence makes the
    overlap harmless, which is what permits snapshot+tail handoff."""
    snapshot = spark.createDataFrame(
        [(1, 1, 10, "ann", "a"), (2, 2, 20, "bob", "b")], student_struct
    )
    store = ParquetKeyedStore(str(tmp_path / "store"), n_buckets=4)
    assert snapshot_to_store(spark, snapshot, store, student_mapping) == 2

    events = [
        # replayed event already reflected in the snapshot
        {"position": 5, "op": "insert", "db": "mixfs", "table": "student",
         "after": {"sn": 2, "id": 2, "score": 20, "name": "bob", "rem": "b"}},
        # genuinely new tail event
        {"position": 9, "op": "update", "db": "mixfs", "table": "student",
         "before": {"sn": 1, "id": 1, "score": 10, "name": "ann", "rem": "a"},
         "after": {"sn": 1, "id": 1, "score": 99, "name": "ann", "rem": "a"}},
    ]
    apply_cdc_batch(
        spark,
        events_from_rows(spark, events, student_struct),
        store,
        {"mixfs.student": student_mapping},
    )
    rows = sorted(
        tuple(r) for r in store.read(spark, "mixfs:student2")
        .select("sn", "id", "score", "name", "rem").collect()
    )
    assert rows == [(1, 1, 99, "ann", "a"), (2, 2, 20, "bob", "b")]

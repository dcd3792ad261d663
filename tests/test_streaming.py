"""Streaming wrapper (SURVEY.md §2.7): file-source micro-batches through
foreachBatch(apply_cdc_batch), checkpoint resume, stop conditions."""

from __future__ import annotations

import json
import os
import time

import pytest

from mysql_hbase_replicator_spark.catalog.schema import (
    ColInfo,
    PrimaryKeyChangedError,
    TableSchema,
)
from mysql_hbase_replicator_spark.operators.merge import ParquetKeyedStore
from mysql_hbase_replicator_spark.streaming.pipeline import (
    CdcProgressListener,
    CdcStreamPipeline,
)

COLS = ("sn", "id", "score", "name", "rem")


def write_event_file(events_dir: str, name: str, events: list[dict]) -> None:
    os.makedirs(events_dir, exist_ok=True)
    tmp = os.path.join(events_dir, f".{name}.tmp")
    with open(tmp, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    os.replace(tmp, os.path.join(events_dir, f"{name}.json"))


def ev(pos, op, before=None, after=None):
    return {"position": pos, "op": op, "db": "mixfs", "table": "student",
            "before": before, "after": after}


def row(sn, id_, score=None, name=None, rem=None):
    return {"sn": sn, "id": id_, "score": score, "name": name, "rem": rem}


def state(spark, store):
    df = store.read(spark, "mixfs:student2")
    return sorted(tuple(r) for r in df.select(*COLS).collect()) if df is not None else []


def make_pipeline(spark, tmp_path, student_struct, student_mapping, **kw):
    store = ParquetKeyedStore(str(tmp_path / "store"), n_buckets=4)
    return CdcStreamPipeline(
        spark=spark,
        events_path=str(tmp_path / "events"),
        row_struct=student_struct,
        store=store,
        mappings={"mixfs.student": student_mapping},
        checkpoint_dir=str(tmp_path / "ckpt"),
        **kw,
    )


def test_stream_applies_and_resumes(spark, tmp_path, student_struct, student_mapping):
    events_dir = str(tmp_path / "events")
    write_event_file(events_dir, "b1", [
        ev(1, "insert", after=row(1, 1, 10, "ann", "a")),
        ev(2, "insert", after=row(2, 2, 20, "bob", "b")),
    ])
    pipe = make_pipeline(spark, tmp_path, student_struct, student_mapping)
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    assert state(spark, pipe.store) == [(1, 1, 10, "ann", "a"), (2, 2, 20, "bob", "b")]
    assert pipe.total_counts() == {"mixfs.student.insert": 2}

    # new file lands; restart from the SAME checkpoint → only the new file
    # is processed (S2 resume via checkpointLocation)
    write_event_file(events_dir, "b2", [
        ev(3, "delete", before=row(1, 1)),
        ev(4, "update", before=row(2, 2, 20, "bob", "b"), after=row(2, 2, 25, "bob", "b")),
    ])
    pipe2 = make_pipeline(spark, tmp_path, student_struct, student_mapping)
    q2 = pipe2.start(available_now=True)
    q2.awaitTermination(120)
    assert state(spark, pipe2.store) == [(2, 2, 25, "bob", "b")]
    # resume processed only batch 2's rows
    assert pipe2.total_counts() == {"mixfs.student.delete": 1, "mixfs.student.update": 1}


def test_stream_listener_progress(spark, tmp_path, student_struct, student_mapping):
    listener = CdcProgressListener()
    spark.streams.addListener(listener)
    try:
        write_event_file(str(tmp_path / "events"), "b1", [
            ev(1, "insert", after=row(1, 1, 10, "ann", "a")),
        ])
        pipe = make_pipeline(spark, tmp_path, student_struct, student_mapping)
        q = pipe.start(available_now=True)
        q.awaitTermination(120)
        deadline = time.time() + 30
        while not listener.progress and time.time() < deadline:
            time.sleep(0.2)
        assert any(p["numInputRows"] == 1 for p in listener.progress)
    finally:
        spark.streams.removeListener(listener)


def test_pk_schema_change_terminates_query(spark, tmp_path, student_struct, student_mapping):
    """§2.7 stop condition: PK drift must kill the stream
    (MySQLExtractor.scala:195-198)."""
    write_event_file(str(tmp_path / "events"), "b1", [
        ev(1, "insert", after=row(1, 1, 10, "ann", "a")),
    ])
    declared = TableSchema("mixfs", "student", [
        ColInfo("sn", "int(11)", is_primary_key=True),
        ColInfo("id", "int(11)", is_primary_key=True),
        ColInfo("score", "int(11)"),
    ])
    changed = TableSchema("mixfs", "student", [
        ColInfo("sn", "int(11)", is_primary_key=True),  # id no longer PK
        ColInfo("id", "int(11)"),
        ColInfo("score", "int(11)"),
    ])
    pipe = make_pipeline(
        spark, tmp_path, student_struct, student_mapping,
        declared_schemas={"mixfs.student": declared},
        fresh_schema_provider=lambda name: changed,
    )
    q = pipe.start(available_now=True)
    with pytest.raises(Exception) as exc_info:
        q.awaitTermination(120)
    assert "PrimaryKeyChangedError" in str(exc_info.value) or "primary key changed" in str(
        exc_info.value
    )


def test_status_server_serves_counters(spark, tmp_path, student_struct, student_mapping):
    """O2 parity: / and /jmx expose the applied-count surface over HTTP."""
    import json as _json
    import urllib.request

    from mysql_hbase_replicator_spark.streaming.status import StatusServer

    write_event_file(str(tmp_path / "events"), "b1", [
        ev(1, "insert", after=row(1, 1, 10, "ann", "a")),
        ev(2, "insert", after=row(2, 2, 20, "bob", "b")),
    ])
    pipeline = make_pipeline(spark, tmp_path, student_struct, student_mapping)
    q = pipeline.start(available_now=True)
    q.awaitTermination(120)
    srv = StatusServer(pipeline, port=0).start()  # ephemeral port
    try:
        jmx = _json.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/jmx", timeout=10).read()
        )
        assert jmx["batches"] >= 1
        assert jmx["counts"] == pipeline.total_counts()
        assert sum(jmx["counts"].values()) > 0
        # O1 latency ring (StatusServlet.java:83-99): per-apply wall-time
        # samples, bounded at 10
        assert "batch" in jmx["latency"]
        assert "apply:mixfs.student" in jmx["latency"]
        for samples in jmx["latency"].values():
            assert 0 < len(samples) <= 10
            assert all(s >= 0 for s in samples)
        html = urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/", timeout=10).read()
        assert b"checkpoint_position" in html
        assert b"latency_s (last 10):" in html
        assert b"apply:mixfs.student" in html
    finally:
        srv.stop()


def test_latency_ring_is_bounded(spark, tmp_path, student_struct, student_mapping):
    """12 micro-batches roll the ring: only the last 10 samples survive."""
    events_dir = str(tmp_path / "events")
    pipeline = make_pipeline(spark, tmp_path, student_struct, student_mapping)
    for i in range(12):
        write_event_file(
            events_dir, f"b{i:02d}", [ev(i + 1, "insert", after=row(i + 1, 1, i, "u", "x"))]
        )
        q = pipeline.start(available_now=True, query_name=f"ring-{i}")
        q.awaitTermination(120)
    samples = pipeline.latency_samples()
    assert len(samples["batch"]) == 10
    assert len(pipeline.results) == 12


def test_stream_through_bucketed_store(spark, tmp_path, student_struct, student_mapping):
    """End-to-end pipeline drive over the BUCKETED catalog store (r11):
    the streaming path — source parse, kernel, delta append, checkpoint,
    counters — must behave identically to the parent LSM store, with
    resume picking up only new files, and the merge-on-read state plan
    staying exchange-free after a compaction."""
    from mysql_hbase_replicator_spark.operators.merge import (
        BucketedLogStructuredKeyedStore,
    )

    events_dir = str(tmp_path / "events")
    write_event_file(events_dir, "b1", [
        ev(1, "insert", after=row(1, 1, 10, "ann", "a")),
        ev(2, "insert", after=row(2, 2, 20, "bob", "b")),
    ])
    store = BucketedLogStructuredKeyedStore(str(tmp_path / "bstore"), n_buckets=4)
    pipe = CdcStreamPipeline(
        spark=spark,
        events_path=events_dir,
        row_struct=student_struct,
        store=store,
        mappings={"mixfs.student": student_mapping},
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    assert state(spark, store) == [(1, 1, 10, "ann", "a"), (2, 2, 20, "bob", "b")]
    assert pipe.total_counts() == {"mixfs.student.insert": 2}

    write_event_file(events_dir, "b2", [
        ev(3, "delete", before=row(1, 1)),
        ev(4, "update", before=row(2, 2, 20, "bob", "b"),
           after=row(2, 2, 25, "bob", "b")),
    ])
    store2 = BucketedLogStructuredKeyedStore(str(tmp_path / "bstore"), n_buckets=4)
    pipe2 = CdcStreamPipeline(
        spark=spark,
        events_path=events_dir,
        row_struct=student_struct,
        store=store2,
        mappings={"mixfs.student": student_mapping},
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2 = pipe2.start(available_now=True)
    q2.awaitTermination(120)
    assert state(spark, store2) == [(2, 2, 25, "bob", "b")]
    assert pipe2.total_counts() == {"mixfs.student.delete": 1,
                                    "mixfs.student.update": 1}
    # the merge-on-read plan (deltas STILL unfolded — the window over the
    # deltas and the base anti-join are both present) must be
    # exchange-free: this is the store's whole point, so gate it BEFORE
    # compaction collapses the plan to a bare bucketed scan
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            store2.read(spark, "mixfs:student2")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # compaction is a pure representation change
    assert store2.compact(spark, "mixfs:student2") is True
    assert state(spark, store2) == [(2, 2, 25, "bob", "b")]


def test_pipeline_store_kind_option(spark, tmp_path, student_struct, student_mapping):
    """The sink layout is selectable by name (r11 verdict #6): store= takes
    a STORE_KINDS key resolved against store_dir, so the bucketed
    exchange-free merge-on-read store is one config flip away from the
    plain LSM, not a programmatic construction."""
    from mysql_hbase_replicator_spark.operators.merge import (
        BucketedLogStructuredKeyedStore,
        LogStructuredKeyedStore,
        ParquetKeyedStore,
    )

    events_dir = str(tmp_path / "events")
    write_event_file(events_dir, "b1", [
        ev(1, "insert", after=row(1, 1, 10, "ann", "a")),
        ev(2, "insert", after=row(2, 2, 20, "bob", "b")),
    ])
    kinds = {
        "rewrite": ParquetKeyedStore,
        "lsm": LogStructuredKeyedStore,
        "bucketed": BucketedLogStructuredKeyedStore,
    }
    for kind, cls in kinds.items():
        pipe = CdcStreamPipeline(
            spark=spark,
            events_path=events_dir,
            row_struct=student_struct,
            store=kind,
            store_dir=str(tmp_path / f"store_{kind}"),
            store_n_buckets=4,
            mappings={"mixfs.student": student_mapping},
            checkpoint_dir=str(tmp_path / f"ckpt_{kind}"),
        )
        assert type(pipe.store) is cls
        if kind != "bucketed":
            continue  # class resolution is the contract; drive only one e2e
        q = pipe.start(available_now=True, query_name=f"kind-{kind}")
        q.awaitTermination(120)
        assert state(spark, pipe.store) == [
            (1, 1, 10, "ann", "a"), (2, 2, 20, "bob", "b"),
        ]
    # unknown kind and missing store_dir both fail fast
    with pytest.raises(ValueError, match="unknown store kind"):
        CdcStreamPipeline(
            spark=spark, events_path=events_dir, row_struct=student_struct,
            store="nope", store_dir=str(tmp_path / "x"),
            mappings={"mixfs.student": student_mapping},
            checkpoint_dir=str(tmp_path / "ckpt_x"),
        )
    with pytest.raises(ValueError, match="store_dir is required"):
        CdcStreamPipeline(
            spark=spark, events_path=events_dir, row_struct=student_struct,
            store="lsm",
            mappings={"mixfs.student": student_mapping},
            checkpoint_dir=str(tmp_path / "ckpt_y"),
        )


def test_status_reports_latest_checkpoint_pair_not_max():
    """Binlog positions reset per file: after a rotate the status surface
    must show the LATEST batch's (filename, position) pair, not the
    all-time max position (r13 review: max froze the old file's larger
    offset forever, and the filename was missing entirely — the reference
    shows both, StatusServlet.java:61-104)."""
    from mysql_hbase_replicator_spark.operators.cdc_apply import CdcBatchResult
    from mysql_hbase_replicator_spark.streaming.status import StatusServer

    r1 = CdcBatchResult()
    r1.checkpoint_position, r1.checkpoint_filename = 90_000, "binlog.000001"
    r2 = CdcBatchResult()
    r2.checkpoint_position, r2.checkpoint_filename = 400, "binlog.000002"

    class FakePipe:
        results = [r1, r2]

        def total_counts(self):
            return {}

    srv = StatusServer(FakePipe(), port=0)
    try:
        snap = srv.snapshot()
        assert snap["checkpoint_position"] == 400
        assert snap["checkpoint_filename"] == "binlog.000002"
    finally:
        srv.stop()


def test_status_stop_before_start_returns():
    """stop() without start() must not block forever: BaseServer.shutdown
    waits on an event only serve_forever's exit sets (r13 review)."""
    from mysql_hbase_replicator_spark.streaming.status import StatusServer

    class FakePipe:
        results = []

        def total_counts(self):
            return {}

    srv = StatusServer(FakePipe(), port=0)
    srv.stop()  # would deadlock without the is_alive() guard

"""Snapshot-diff CDC source (SURVEY §2.1 S1 third mode, r12 verdict #3).

The contract under test: polling FULL-STATE snapshots through
``CdcStreamPipeline(source_format="snapshot_diff")`` must converge the keyed
store to the SAME final state as event-replay of the equivalent binlog
trace — the reference's binlog tail (MySQLExtractor.scala:32-73) and the
snapshot poll are two transports for one replication semantics.
"""

from __future__ import annotations

import json
import os

import pytest

from mysql_hbase_replicator_spark.operators.cdc_apply import apply_cdc_batch
from mysql_hbase_replicator_spark.operators.merge import ParquetKeyedStore
from mysql_hbase_replicator_spark.sources.cdc_events import events_from_rows
from mysql_hbase_replicator_spark.sources.snapshot_diff import snapshot_diff_events
from mysql_hbase_replicator_spark.streaming.pipeline import CdcStreamPipeline

COLS = ("sn", "id", "score", "name", "rem")
TABLE = "mixfs:student2"


def row(sn, id_, score=None, name=None, rem=None):
    return {"sn": sn, "id": id_, "score": score, "name": name, "rem": rem}


def ev(pos, op, before=None, after=None):
    return {
        "position": pos,
        "op": op,
        "db": "mixfs",
        "table": "student",
        "before": before,
        "after": after,
    }


# the binlog trace (test_lsm_store's BATCH_1/2/3) and the snapshot states it
# passes through — the two transports under comparison
TRACE = [
    [
        ev(1, "insert", after=row(1, 1, 90, "ann", "a")),
        ev(2, "insert", after=row(1, 2, 80, "bob", "b")),
        ev(3, "insert", after=row(2, 1, 70, "cat", "c")),
    ],
    [
        ev(4, "update", before=row(1, 1, 90, "ann", "a"), after=row(1, 1, 95, "ann", "a")),
        ev(5, "delete", before=row(1, 2, 80, "bob", "b")),
        ev(6, "update", before=row(2, 1, 70, "cat", "c"), after=row(2, 9, 70, "cat", "c")),
        ev(7, "insert", after=row(3, 3, 60, "dan", "d")),
    ],
    [
        ev(8, "delete", before=row(3, 3, 60, "dan", "d")),
        ev(9, "insert", after=row(4, 4, 50, "eve", "e")),
        ev(10, "update", before=row(1, 1, 95, "ann", "a"), after=row(1, 1, 99, "ann", "z")),
    ],
]
SNAPSHOTS = [
    [row(1, 1, 90, "ann", "a"), row(1, 2, 80, "bob", "b"), row(2, 1, 70, "cat", "c")],
    [row(1, 1, 95, "ann", "a"), row(2, 9, 70, "cat", "c"), row(3, 3, 60, "dan", "d")],
    [row(1, 1, 99, "ann", "z"), row(2, 9, 70, "cat", "c"), row(4, 4, 50, "eve", "e")],
]


def state(spark, store):
    df = store.read(spark, TABLE)
    if df is None:
        return []
    return sorted(tuple(r) for r in df.select(*COLS).collect())


def write_snapshot(snap_dir: str, name: str, rows: list[dict], ver: int) -> None:
    with open(os.path.join(snap_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps({**r, "_snap_ver": ver}) + "\n")


def make_pipe(spark, tmp_path, student_struct, student_mapping, snap_dir):
    return CdcStreamPipeline(
        spark=spark,
        events_path=snap_dir,
        row_struct=student_struct,
        store=ParquetKeyedStore(str(tmp_path / "snapstore"), n_buckets=4),
        mappings={"mixfs.student": student_mapping},
        checkpoint_dir=str(tmp_path / "ckpt"),
        source_format="snapshot_diff",
        max_files_per_trigger=1,
    )


def test_snapshot_diff_events_kernel(spark, student_struct):
    """Unit semantics of the diff: insert for new keys, delete for vanished
    keys, update (with both images) only when a non-key column null-safely
    differs; unchanged keys emit nothing."""
    prev = spark.createDataFrame(
        [(1, 1, 90, "ann", "a"), (1, 2, 80, "bob", None), (2, 1, 70, "cat", "c")],
        student_struct,
    )
    cur = spark.createDataFrame(
        [(1, 1, 90, "ann", "a"),      # unchanged -> no event
         (1, 2, 80, "bob", "b"),      # NULL -> value transition = update
         (3, 3, 60, "dan", "d")],     # new key = insert; (2,1) vanished = delete
        student_struct,
    )
    got = {
        (r["op"], r["before"] and tuple(r["before"]), r["after"] and tuple(r["after"]))
        for r in snapshot_diff_events(
            prev, cur, student_struct, ["sn", "id"], "mixfs", "student", position=7
        ).collect()
    }
    assert got == {
        ("update", (1, 2, 80, "bob", None), (1, 2, 80, "bob", "b")),
        ("delete", (2, 1, 70, "cat", "c"), None),
        ("insert", None, (3, 3, 60, "dan", "d")),
    }
    # first poll (prev=None): every row is an insert
    seeds = snapshot_diff_events(
        None, cur, student_struct, ["sn", "id"], "mixfs", "student", position=1
    ).collect()
    assert sorted(r["op"] for r in seeds) == ["insert"] * 3
    assert all(r["before"] is None and r["position"] == 1 for r in seeds)


def test_snapshot_polling_converges_to_event_replay(
    spark, tmp_path, student_struct, student_mapping
):
    """THE e2e contract (r12 verdict #3 'done' bar): snapshot polling
    through the streaming pipeline reaches the same store state as
    event-replay of the equivalent trace AFTER EVERY POLL; each restart
    resumes from the checkpoint and diffs only the new landing; per-op
    counters match the true diffs."""
    snap_dir = str(tmp_path / "snaps")
    os.makedirs(snap_dir)
    replay = ParquetKeyedStore(str(tmp_path / "replay"), n_buckets=4)
    for i, (snap, batch) in enumerate(zip(SNAPSHOTS, TRACE), start=1):
        write_snapshot(snap_dir, f"s{i}.json", snap, ver=i)
        pipe = make_pipe(spark, tmp_path, student_struct, student_mapping, snap_dir)
        q = pipe.start(available_now=True)
        q.awaitTermination(120)
        apply_cdc_batch(
            spark,
            events_from_rows(spark, batch, student_struct),
            replay,
            {"mixfs.student": student_mapping},
        )
        assert state(spark, pipe.store) == state(spark, replay), f"poll {i}"
        if i == 1:  # seed: every snapshot row is an insert
            assert pipe.total_counts() == {"mixfs.student.insert": 3}
        elif i == 2:
            # snap1->snap2 in PK space: (3,3) new and (2,1)->(2,9) appears
            # as delete+insert (the diff is keyed on (sn,id)); (1,1) score
            # changed = update; (1,2) vanished = delete
            assert pipe.total_counts() == {
                "mixfs.student.insert": 2,
                "mixfs.student.update": 1,
                "mixfs.student.delete": 2,
            }
    assert state(spark, pipe.store) == [
        (1, 1, 99, "ann", "z"),
        (2, 9, 70, "cat", "c"),
        (4, 4, 50, "eve", "e"),
    ]


def test_snapshot_out_of_order_landing_converges(
    spark, tmp_path, student_struct, student_mapping
):
    """Two snapshots landing in ONE poll window: Spark's file source breaks
    equal-mtime ties in arbitrary order (measured newest-path-first), so
    the pipeline must gate on _snap_ver — an older snapshot admitted after
    a newer one is SKIPPED, never applied as a state regression. Final
    state = the max-version snapshot regardless of admission order."""
    snap_dir = str(tmp_path / "snaps")
    os.makedirs(snap_dir)
    write_snapshot(snap_dir, "s1.json", SNAPSHOTS[0], ver=1)
    write_snapshot(snap_dir, "s2.json", SNAPSHOTS[1], ver=2)
    pipe = make_pipe(spark, tmp_path, student_struct, student_mapping, snap_dir)
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    assert state(spark, pipe.store) == [
        (1, 1, 95, "ann", "a"),
        (2, 9, 70, "cat", "c"),
        (3, 3, 60, "dan", "d"),
    ]


def test_snapshot_repoll_of_identical_state_is_a_noop(
    spark, tmp_path, student_struct, student_mapping
):
    """A poll that lands an UNCHANGED snapshot (the common idle case) emits
    zero events — the property that makes low-frequency polling viable as a
    CDC transport."""
    snap_dir = str(tmp_path / "snaps")
    os.makedirs(snap_dir)
    write_snapshot(snap_dir, "s1.json", SNAPSHOTS[0], ver=1)
    pipe = make_pipe(spark, tmp_path, student_struct, student_mapping, snap_dir)
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    want = state(spark, pipe.store)
    counts_before = pipe.total_counts()

    write_snapshot(snap_dir, "s2.json", SNAPSHOTS[0], ver=2)  # same rows
    pipe2 = make_pipe(spark, tmp_path, student_struct, student_mapping, snap_dir)
    q2 = pipe2.start(available_now=True)
    q2.awaitTermination(120)
    assert state(spark, pipe2.store) == want
    assert pipe2.total_counts() == {}  # zero events from the no-change diff
    assert counts_before == {"mixfs.student.insert": 3}


def test_snapshot_diff_requires_unambiguous_table(
    spark, tmp_path, student_struct, student_mapping
):
    pipe = make_pipe(
        spark, tmp_path, student_struct, student_mapping, str(tmp_path)
    )
    pipe.mappings = {"a.b": student_mapping, "c.d": student_mapping}
    with pytest.raises(ValueError, match="snapshot_table"):
        pipe._snapshot_full_name()


def test_snapshot_parquet_landing_converges(
    spark, tmp_path, student_struct, student_mapping
):
    """snapshot_format="parquet" — the production landing shape (a
    jdbc_snapshot poller writes columnar snapshots, not JSON lines): the
    same three-poll trace converges to the same final state as the JSONL
    transport and the event replay."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    snap_dir = str(tmp_path / "snaps")
    os.makedirs(snap_dir)

    def write_parquet_snapshot(name: str, rows: list[dict], ver: int) -> None:
        cols = {
            c: [r[c] for r in rows] for c in ("sn", "id", "score", "name", "rem")
        }
        cols["_snap_ver"] = [ver] * len(rows)
        table = pa.table(
            {
                "sn": pa.array(cols["sn"], pa.int32()),
                "id": pa.array(cols["id"], pa.int32()),
                "score": pa.array(cols["score"], pa.int32()),
                "name": pa.array(cols["name"], pa.string()),
                "rem": pa.array(cols["rem"], pa.string()),
                "_snap_ver": pa.array(cols["_snap_ver"], pa.int64()),
            }
        )
        pq.write_table(table, os.path.join(snap_dir, name))

    replay = ParquetKeyedStore(str(tmp_path / "replay"), n_buckets=4)
    for i, (snap, batch) in enumerate(zip(SNAPSHOTS, TRACE), start=1):
        write_parquet_snapshot(f"s{i}.parquet", snap, ver=i)
        pipe = make_pipe(spark, tmp_path, student_struct, student_mapping, snap_dir)
        pipe.snapshot_format = "parquet"
        q = pipe.start(available_now=True)
        q.awaitTermination(120)
        apply_cdc_batch(
            spark,
            events_from_rows(spark, batch, student_struct),
            replay,
            {"mixfs.student": student_mapping},
        )
        assert state(spark, pipe.store) == state(spark, replay), f"poll {i}"
    assert state(spark, pipe.store) == [
        (1, 1, 99, "ann", "z"),
        (2, 9, 70, "cat", "c"),
        (4, 4, 50, "eve", "e"),
    ]


def test_snapshot_without_version_stamp_warns(
    spark, tmp_path, student_struct, student_mapping, caplog
):
    """A landing whose rows carry no _snap_ver (producer contract
    violation) is discarded — but LOUDLY (r13 review: the silent return
    let a whole snapshot vanish with zero observability)."""
    import logging

    snap_dir = str(tmp_path / "snaps")
    os.makedirs(snap_dir)
    with open(os.path.join(snap_dir, "bad.json"), "w") as f:
        for r in SNAPSHOTS[0]:
            f.write(json.dumps(r) + "\n")  # no _snap_ver stamp
    pipe = make_pipe(spark, tmp_path, student_struct, student_mapping, snap_dir)
    with caplog.at_level(
        logging.WARNING, logger="mysql_hbase_replicator_spark.streaming.pipeline"
    ):
        q = pipe.start(available_now=True)
        q.awaitTermination(120)
    assert state(spark, pipe.store) == []  # nothing applied
    assert any(
        "no _snap_ver stamp" in rec.message and "DISCARDED" in rec.message
        for rec in caplog.records
    ), caplog.records


def test_snapshot_diff_plan_is_single_full_outer_smj(spark, student_struct):
    """Plan gate (the repo's test_plans.py discipline): with broadcast
    disabled — the 100 TB regime where neither full snapshot fits — the
    diff is ONE full-outer SortMergeJoin with exactly one exchange per
    side on the null-safe PK keys. No nested-loop or cartesian fallback:
    Spark rewrites eqNullSafe equi-conditions into coalesce/isnull hash
    keys."""
    prev = spark.createDataFrame([(1, 1, 90, "a", "r")], student_struct)
    cur = spark.createDataFrame([(1, 1, 91, "a", "r")], student_struct)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev = snapshot_diff_events(
            prev, cur, student_struct, ["sn", "id"], "mixfs", "student", 1
        )
        plan = ev._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan and "FullOuter" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_null_pk_row_is_matchable_not_ghost_insert(spark, student_struct):
    """A row whose PK column is legitimately NULL must classify by the
    side-presence markers, not PK nullness (r13 review: isNotNull presence
    turned an unchanged NULL-PK row into a before=NULL/after=NULL 'insert'
    on every poll). Unchanged NULL-PK row → no event; a non-key change on
    it → one update with both images."""
    rows = [(None, 1, 90, "ann", "a"), (1, 1, 80, "bob", "b")]
    prev = spark.createDataFrame(rows, student_struct)
    same = spark.createDataFrame(rows, student_struct)
    assert (
        snapshot_diff_events(
            prev, same, student_struct, ["sn", "id"], "mixfs", "student", 2
        ).count()
        == 0
    )
    cur = spark.createDataFrame(
        [(None, 1, 95, "ann", "a"), (1, 1, 80, "bob", "b")], student_struct
    )
    evs = snapshot_diff_events(
        prev, cur, student_struct, ["sn", "id"], "mixfs", "student", 2
    ).collect()
    assert len(evs) == 1
    assert evs[0]["op"] == "update"
    assert tuple(evs[0]["before"]) == (None, 1, 90, "ann", "a")
    assert tuple(evs[0]["after"]) == (None, 1, 95, "ann", "a")


def test_multifile_snapshot_version_split_across_triggers(
    spark, tmp_path, student_struct, student_mapping
):
    """One snapshot version landed as TWO files with maxFilesPerTrigger=1:
    the file source admits them in separate micro-batches, so diffing the
    admitted rows would apply a PARTIAL snapshot (spurious deletes) and the
    old equal-version skip would then drop the remainder forever (r13
    review). The pipeline must diff from the landing-dir re-read instead
    and converge to the full snapshot."""
    snap_dir = str(tmp_path / "snaps")
    os.makedirs(snap_dir)
    write_snapshot(snap_dir, "s1_part0.json", SNAPSHOTS[0][:2], ver=1)
    write_snapshot(snap_dir, "s1_part1.json", SNAPSHOTS[0][2:], ver=1)
    pipe = make_pipe(spark, tmp_path, student_struct, student_mapping, snap_dir)
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    assert state(spark, pipe.store) == sorted(tuple(r.values()) for r in SNAPSHOTS[0])
    # the first trigger applies the FULL version via the landing re-read;
    # the redelivered remainder re-diffs to an empty event set
    assert pipe.total_counts() == {"mixfs.student.insert": 3}


def test_late_remainder_file_of_applied_version_heals(
    spark, tmp_path, student_struct, student_mapping
):
    """A remainder file of an ALREADY-APPLIED version landing later (the
    producer was still writing the multi-file snapshot when the first poll
    caught it): the equal-version re-diff against the staged partial
    snapshot emits exactly the missing rows — the store heals instead of
    skipping the version as 'already applied'."""
    snap_dir = str(tmp_path / "snaps")
    os.makedirs(snap_dir)
    write_snapshot(snap_dir, "s1_part0.json", SNAPSHOTS[0][:2], ver=1)
    pipe = make_pipe(spark, tmp_path, student_struct, student_mapping, snap_dir)
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    assert len(state(spark, pipe.store)) == 2  # partial version on disk so far

    write_snapshot(snap_dir, "s1_part1.json", SNAPSHOTS[0][2:], ver=1)
    pipe2 = make_pipe(spark, tmp_path, student_struct, student_mapping, snap_dir)
    q2 = pipe2.start(available_now=True)
    q2.awaitTermination(120)
    assert state(spark, pipe2.store) == sorted(
        tuple(r.values()) for r in SNAPSHOTS[0]
    )
    assert pipe2.total_counts() == {"mixfs.student.insert": 1}


def test_mixed_stamped_and_unstamped_rows_warn(
    spark, tmp_path, student_struct, student_mapping, caplog
):
    """Unstamped rows sharing a batch with stamped ones must be reported
    too (r13 review: the warning only fired when ALL rows were unstamped —
    the mixed case silently dropped the violating rows). The stamped
    snapshot still applies."""
    import logging

    snap_dir = str(tmp_path / "snaps")
    os.makedirs(snap_dir)
    with open(os.path.join(snap_dir, "mixed.json"), "w") as f:
        for r in SNAPSHOTS[0][:2]:
            f.write(json.dumps({**r, "_snap_ver": 1}) + "\n")
        f.write(json.dumps(SNAPSHOTS[0][2]) + "\n")  # no stamp
    pipe = make_pipe(spark, tmp_path, student_struct, student_mapping, snap_dir)
    with caplog.at_level(
        logging.WARNING, logger="mysql_hbase_replicator_spark.streaming.pipeline"
    ):
        q = pipe.start(available_now=True)
        q.awaitTermination(120)
    assert any(
        "no _snap_ver stamp" in rec.message and "DISCARDED" in rec.message
        for rec in caplog.records
    ), caplog.records
    assert state(spark, pipe.store) == sorted(
        tuple(r.values()) for r in SNAPSHOTS[0][:2]
    )


def test_landing_rescan_prunes_already_applied_files(
    spark, tmp_path, student_struct, student_mapping
):
    """The landing re-read must scan only files that can still carry the
    triggering version: files whose recorded max version is strictly older
    are excluded (their content is already folded in), unseen files are
    kept. Keeps the per-poll scan O(one snapshot), not O(all history)."""
    from mysql_hbase_replicator_spark.sources.snapshot_diff import (
        PrevSnapshotStore,
    )

    snap_dir = str(tmp_path / "snaps")
    os.makedirs(snap_dir)
    for v in (1, 2, 3):
        write_snapshot(snap_dir, f"s{v}.json", SNAPSHOTS[v - 1], ver=v)
    pipe = make_pipe(spark, tmp_path, student_struct, student_mapping, snap_dir)
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    store = PrevSnapshotStore(os.path.join(pipe.checkpoint_dir, "snapshots"))
    # the files map learned every admitted landing's version
    assert store.files_map() == {"s1.json": 1, "s2.json": 2, "s3.json": 3}
    # a version-4 trigger scans only files that may carry it: the (unseen)
    # new landing; v1-v3 files are pruned
    write_snapshot(snap_dir, "s4.json", SNAPSHOTS[2], ver=4)
    paths, names = pipe._snapshot_landing_files(store, 4, {"s4.json": 4})
    assert sorted(os.path.basename(p) for p in paths) == ["s4.json"]
    assert sorted(names) == ["s1.json", "s2.json", "s3.json", "s4.json"]
    # an equal-version redelivery keeps the version's own files
    paths3, _ = pipe._snapshot_landing_files(store, 3, {})
    assert sorted(os.path.basename(p) for p in paths3) == ["s3.json", "s4.json"]

"""Debezium envelope adapter (SURVEY.md §2 S1's idiomatic Kafka path): the
envelope→CDC-event transformation is pure DataFrame code, so the full
kernel path — envelope JSON through apply_cdc_batch to the keyed store —
is drivable on fixtures without a broker."""

from __future__ import annotations

import json
import os

import pytest

from mysql_hbase_replicator_spark.operators.cdc_apply import apply_cdc_batch
from mysql_hbase_replicator_spark.operators.merge import ParquetKeyedStore
from mysql_hbase_replicator_spark.sources.debezium import debezium_to_cdc_events


def envelope(op, db="mixfs", table="student", before=None, after=None,
             file="binlog.000001", pos=100, ts_ms=1_700_000_000_000):
    return json.dumps({
        "op": op,
        "before": before,
        "after": after,
        "source": {"db": db, "table": table, "file": file, "pos": pos,
                   "ts_ms": ts_ms, "server_id": 1},
    })


def raw_frame(spark, values):
    return spark.createDataFrame([(v,) for v in values], "value string")


def test_envelope_mapping_ops_and_metadata(spark):
    vals = [
        envelope("c", after={"sn": 1, "id": 1, "score": 10}, pos=11),
        envelope("r", after={"sn": 2, "id": 2, "score": 20}, pos=12),  # snapshot
        envelope("u", before={"sn": 1, "id": 1, "score": 10},
                 after={"sn": 1, "id": 1, "score": 15}, pos=13),
        envelope("d", before={"sn": 2, "id": 2}, pos=14),
        None,  # tombstone after delete (log compaction)
    ]
    ev = debezium_to_cdc_events(raw_frame(spark, vals)).orderBy("position").collect()
    assert [r.op for r in ev] == ["insert", "insert", "update", "delete"]
    assert [r.position for r in ev] == [11, 12, 13, 14]
    assert all(r.db == "mixfs" and r.table == "student" for r in ev)
    assert all(r.filename == "binlog.000001" for r in ev)
    # images survive as JSON text for the kernel's per-mapping parse
    assert json.loads(ev[2].after)["score"] == 15
    assert ev[3].after is None
    # seq is monotone with (ts_ms, pos) here
    assert [r.seq for r in ev] == sorted(r.seq for r in ev)


def test_envelope_stream_through_kernel(spark, tmp_path, student_mapping):
    """Envelopes -> adapter -> apply_cdc_batch: final store state and the
    rotate-aware checkpoint pair match the declared semantics, including a
    post-rotate event at a SMALLER position (Debezium positions reset per
    binlog file; seq must win)."""
    vals = [
        envelope("c", after={"sn": 1, "id": 1, "score": 10, "name": "ann", "rem": "a"},
                 pos=500, ts_ms=1_700_000_000_000),
        envelope("c", after={"sn": 2, "id": 2, "score": 20, "name": "bob", "rem": "b"},
                 pos=510, ts_ms=1_700_000_000_100),
        # new binlog file, positions reset; later ts_ms => later seq
        envelope("u", before={"sn": 1, "id": 1, "score": 10, "name": "ann", "rem": "a"},
                 after={"sn": 1, "id": 1, "score": 99, "name": "ann2", "rem": "z"},
                 file="binlog.000002", pos=8, ts_ms=1_700_000_000_200),
    ]
    ev = debezium_to_cdc_events(raw_frame(spark, vals))
    store = ParquetKeyedStore(str(tmp_path / "store"), n_buckets=4)
    result = apply_cdc_batch(spark, ev, store, {"mixfs.student": student_mapping})
    # checkpoint = the post-rotate (file, position-within-file) pair
    assert result.checkpoint_filename == "binlog.000002"
    assert result.checkpoint_position == 8
    rows = sorted(
        tuple(r)
        for r in store.read(spark, "mixfs:student2")
        .select("sn", "id", "score", "name", "rem")
        .collect()
    )
    # the post-rotate update won despite its smaller position
    assert rows == [(1, 1, 99, "ann2", "z"), (2, 2, 20, "bob", "b")]


def test_seq_order_preserving_within_one_millisecond(spark):
    """Regression: positions straddling a multiple of 1000 inside one
    ts_ms (e.g. 998 then 1002) must yield INCREASING seq, and same-ms
    positions exactly 1000 apart must not collide — the old pos%1000
    arithmetic failed both."""
    ts = 1_700_000_000_000
    vals = [
        envelope("c", after={"sn": 1, "id": 1, "score": 1}, pos=998, ts_ms=ts),
        envelope("u", before={"sn": 1, "id": 1, "score": 1},
                 after={"sn": 1, "id": 1, "score": 2}, pos=1002, ts_ms=ts),
        envelope("u", before={"sn": 1, "id": 1, "score": 2},
                 after={"sn": 1, "id": 1, "score": 3}, pos=2002, ts_ms=ts),
    ]
    ev = sorted(debezium_to_cdc_events(raw_frame(spark, vals)).collect(),
                key=lambda r: r.position)
    seqs = [r.seq for r in ev]
    assert seqs == sorted(seqs) and len(set(seqs)) == 3, seqs


def test_seq_collapse_picks_latest_image_same_ms(spark, tmp_path, student_mapping):
    """End-to-end: two same-ms updates to one PK whose positions straddle
    1000 — the LATER position must win the K5 last-image collapse."""
    ts = 1_700_000_000_000
    vals = [
        envelope("c", after={"sn": 1, "id": 1, "score": 1, "name": "a", "rem": "x"},
                 pos=998, ts_ms=ts),
        envelope("u", before={"sn": 1, "id": 1, "score": 1, "name": "a", "rem": "x"},
                 after={"sn": 1, "id": 1, "score": 7, "name": "b", "rem": "y"},
                 pos=1002, ts_ms=ts),
    ]
    ev = debezium_to_cdc_events(raw_frame(spark, vals))
    store = ParquetKeyedStore(str(tmp_path / "store"), n_buckets=2)
    apply_cdc_batch(spark, ev, store, {"mixfs.student": student_mapping})
    rows = store.read(spark, "mixfs:student2").select("score", "name").collect()
    assert [(r.score, r.name) for r in rows] == [(7, "b")]


def test_corrupt_envelopes_route_to_dead_letter_not_dropped(spark, tmp_path):
    """K6 at ingest: corrupt JSON and unknown ops land in the dead-letter
    frame with the raw payload preserved; tombstones stay silent drops; the
    valid events still convert (stream continues)."""
    import os

    from mysql_hbase_replicator_spark.operators.cdc_apply import DEAD_LETTER_TABLE
    from mysql_hbase_replicator_spark.sources.debezium import debezium_dead_letters

    good = envelope("c", after={"sn": 1, "id": 1, "score": 10}, pos=11)
    corrupt = '{"op": "c", "before": null, '           # truncated JSON
    unknown = envelope("x", after={"sn": 9}, pos=12)   # op not in protocol
    raw = raw_frame(spark, [good, corrupt, unknown, None])

    ev = debezium_to_cdc_events(raw).collect()
    assert len(ev) == 1 and ev[0].op == "insert"

    dead = debezium_dead_letters(raw).collect()
    assert len(dead) == 2
    by_reason = {r.reason: r for r in dead}
    assert by_reason["unparseable debezium envelope"].payload == corrupt
    u = by_reason["unknown debezium op"]
    assert u.payload == unknown and u.table_name == "mixfs.student" and u.position == 12

    # schema-compatible with the kernel's dead-letter table: append + read back
    store = ParquetKeyedStore(str(tmp_path / "store"), n_buckets=2)
    os.makedirs(store.base_dir, exist_ok=True)
    debezium_dead_letters(raw).write.mode("append").parquet(
        os.path.join(store.base_dir, DEAD_LETTER_TABLE)
    )
    back = spark.read.parquet(os.path.join(store.base_dir, DEAD_LETTER_TABLE))
    assert back.count() == 2 and "payload" in back.columns


def test_converters_require_raw_or_parsed():
    """ADVICE r7: calling either converter with neither input must raise a
    clear ValueError, not an opaque AttributeError inside parse_envelopes."""
    from mysql_hbase_replicator_spark.sources.debezium import debezium_dead_letters

    with pytest.raises(ValueError, match="raw or parsed"):
        debezium_to_cdc_events()
    with pytest.raises(ValueError, match="raw or parsed"):
        debezium_dead_letters()


def test_ingest_overflow_contains_batch_before_apply(spark, tmp_path, student_mapping):
    """ADVICE r7 (pipeline.py): with max_dead_letter configured, a poisoned
    Debezium batch must be rejected BEFORE the kernel mutates the store or
    the checkpoint commits — otherwise every restart replays, re-commits,
    and re-raises with the bad data already applied. The dead letters ARE
    still queued (K6: failures never vanish)."""
    import json as _json

    from mysql_hbase_replicator_spark.operators.cdc_apply import (
        DEAD_LETTER_TABLE,
        DeadLetterOverflowError,
    )
    from mysql_hbase_replicator_spark.streaming.pipeline import CdcStreamPipeline

    events_dir = str(tmp_path / "envelopes")
    os.makedirs(events_dir)
    good = envelope("c", after={"sn": 1, "id": 1, "score": 10}, pos=11)
    with open(os.path.join(events_dir, "b1.json"), "w") as f:
        f.write(good + "\n" + '{"op": "c", "bro' + "\n")  # 1 good + 1 corrupt

    store = ParquetKeyedStore(str(tmp_path / "store"), n_buckets=2)
    pipe = CdcStreamPipeline(
        spark=spark,
        events_path=events_dir,
        row_struct=None,
        store=store,
        mappings={"mixfs.student": student_mapping},
        checkpoint_dir=str(tmp_path / "ckpt"),
        source_format="debezium",
        max_dead_letter=0,
    )
    q = pipe.start(available_now=True)
    with pytest.raises(Exception) as exc_info:
        q.awaitTermination(120)
    assert "DeadLetterOverflowError" in str(exc_info.value) or isinstance(
        exc_info.value, DeadLetterOverflowError
    )
    # containment: the batch's VALID row was never applied to the store
    assert store.read(spark, "mixfs:student2") is None
    # the corrupt envelope is queued for fix-and-replay — EXACTLY once, even
    # though supervised restarts would replay this batch (ADVICE r8)
    dl = spark.read.parquet(os.path.join(store.base_dir, DEAD_LETTER_TABLE))
    assert dl.filter(dl.reason == "unparseable debezium envelope").count() == 1


def test_dead_letter_replay_idempotent_exact_count(spark, tmp_path, student_mapping):
    """ADVICE r8 (K6 exactly-once queue, Rep.scala:67-97): the capped path
    writes dead letters BEFORE the kernel, so the overflow raise itself
    forces a replay of the same micro-batch. The replay must OVERWRITE the
    batch's own dead letters (batch-id-keyed subdir), not append duplicates.
    Scenario: cap=0 kills the query after queueing; the operator raises the
    cap and restarts from the same checkpoint; the replayed batch applies
    and the dead-letter table holds the corrupt envelope EXACTLY once."""
    from mysql_hbase_replicator_spark.operators.cdc_apply import DEAD_LETTER_TABLE
    from mysql_hbase_replicator_spark.streaming.pipeline import CdcStreamPipeline

    events_dir = str(tmp_path / "envelopes")
    os.makedirs(events_dir)
    good = envelope("c", after={"sn": 1, "id": 1, "score": 10}, pos=11)
    with open(os.path.join(events_dir, "b1.json"), "w") as f:
        f.write(good + "\n" + '{"op": "c", "bro' + "\n")  # 1 good + 1 corrupt

    store = ParquetKeyedStore(str(tmp_path / "store"), n_buckets=2)

    def pipe(cap):
        return CdcStreamPipeline(
            spark=spark,
            events_path=events_dir,
            row_struct=None,
            store=store,
            mappings={"mixfs.student": student_mapping},
            checkpoint_dir=str(tmp_path / "ckpt"),
            source_format="debezium",
            max_dead_letter=cap,
        )

    q = pipe(cap=0).start(available_now=True)
    with pytest.raises(Exception):
        q.awaitTermination(120)
    dl_path = os.path.join(store.base_dir, DEAD_LETTER_TABLE)
    assert spark.read.parquet(dl_path).count() == 1

    # cap raised, same checkpoint: batch 0 replays end-to-end
    q2 = pipe(cap=5).start(available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(dl_path).count() == 1  # overwritten, not doubled
    rows = store.read(spark, "mixfs:student2").collect()
    assert len(rows) == 1 and rows[0].score == 10


def test_combined_dead_letter_cap_enforced(spark, tmp_path, student_mapping):
    """ADVICE r8: ingest (corrupt envelope) and kernel (missing-PK) dead
    letters were each checked against max_dead_letter independently, so a
    batch at cap on BOTH sides passed at 2x the limit. With cap=1, one of
    each must now kill the query via the combined re-check."""
    from mysql_hbase_replicator_spark.operators.cdc_apply import (
        DeadLetterOverflowError,
    )
    from mysql_hbase_replicator_spark.streaming.pipeline import CdcStreamPipeline

    events_dir = str(tmp_path / "envelopes")
    os.makedirs(events_dir)
    good = envelope("c", after={"sn": 1, "id": 1, "score": 10}, pos=11)
    no_pk = envelope("c", after={"score": 5}, pos=12)  # kernel-side dead letter
    with open(os.path.join(events_dir, "b1.json"), "w") as f:
        f.write(good + "\n" + no_pk + "\n" + '{"op": "c", "bro' + "\n")

    store = ParquetKeyedStore(str(tmp_path / "store"), n_buckets=2)
    pipe = CdcStreamPipeline(
        spark=spark,
        events_path=events_dir,
        row_struct=None,
        store=store,
        mappings={"mixfs.student": student_mapping},
        checkpoint_dir=str(tmp_path / "ckpt"),
        source_format="debezium",
        max_dead_letter=1,  # each side alone is AT cap; combined total is 2
    )
    q = pipe.start(available_now=True)
    with pytest.raises(Exception) as exc_info:
        q.awaitTermination(120)
    assert "DeadLetterOverflowError" in str(exc_info.value) or isinstance(
        exc_info.value, DeadLetterOverflowError
    )
    assert "combined" in str(exc_info.value)

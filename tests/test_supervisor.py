"""Restart policy (SURVEY.md §2.7; reference MySQLExtractor.scala:87-126
keep-alive + :145-159 fatal-1236 exit): transient failures restart the query
with bounded backoff, fatal errors terminate, a healthy run resets the
budget."""

from __future__ import annotations

import pytest

from mysql_hbase_replicator_spark.operators.cdc_apply import DeadLetterOverflowError
from mysql_hbase_replicator_spark.operators.merge import ParquetKeyedStore
from mysql_hbase_replicator_spark.streaming.pipeline import CdcStreamPipeline
from mysql_hbase_replicator_spark.streaming.supervisor import (
    RestartPolicy,
    RestartsExhaustedError,
    StaleCheckpointError,
    default_is_fatal,
    supervise,
)
from tests.test_streaming import ev, row, state, write_event_file


class FakeQuery:
    def __init__(self, exc: BaseException | None):
        self._exc = exc

    def awaitTermination(self):
        if self._exc is not None:
            raise self._exc


def run_script(script, policy, **kw):
    """script: list of exceptions (None = clean run). Returns (report|raised,
    sleeps)."""
    sleeps: list[float] = []
    it = iter(script)
    report = supervise(
        lambda: FakeQuery(next(it)),
        policy,
        sleep=sleeps.append,
        **kw,
    )
    return report, sleeps


def test_transient_failures_restart_then_clean():
    report, sleeps = run_script(
        [IOError("connection reset"), IOError("timeout"), None],
        RestartPolicy(max_restarts=5, backoff_initial_s=5.0),
        clock=lambda: 0.0,
    )
    assert report.attempts == 3 and report.restarts == 2
    assert report.outcome == "clean"
    assert sleeps == [5.0, 5.0]  # the reference's constant 5 s keep-alive


def test_exponential_backoff_caps():
    with pytest.raises(RestartsExhaustedError):
        run_script(
            [IOError("down")] * 5,
            RestartPolicy(
                max_restarts=3,
                backoff_initial_s=2.0,
                backoff_multiplier=4.0,
                backoff_max_s=10.0,
            ),
            clock=lambda: 0.0,
        )


def test_exhaustion_after_bounded_restarts():
    sleeps: list[float] = []
    with pytest.raises(RestartsExhaustedError) as exc_info:
        supervise(
            lambda: FakeQuery(IOError("still down")),
            RestartPolicy(max_restarts=2, backoff_initial_s=1.0),
            sleep=sleeps.append,
            clock=lambda: 0.0,
        )
    assert len(sleeps) == 2  # 1 initial attempt + 2 restarts, then give up
    assert "3 attempts" in str(exc_info.value)


@pytest.mark.parametrize(
    "exc",
    [
        StaleCheckpointError("binlog.000001 purged at source"),
        RuntimeError("java wrapper: PrimaryKeyChangedError: pk drift on mixfs.student"),
        RuntimeError("DeadLetterOverflowError: dead-letter count 3 exceeds max"),
        RuntimeError("1236 could not find first log file in binary log index"),
        # r14: deleted-landing retention violations recur on every replay —
        # restarting wedges the supervisor around the same missing file
        RuntimeError(
            "SnapshotRetentionError: snapshot version 5 of db.t: landing "
            "re-read found 0 rows but the stream admitted 10"
        ),
        RuntimeError(
            "UnmappedLandingTableError: landing subdir(s) ['db.ghost'] "
            "have no row_structs entry"
        ),
    ],
)
def test_fatal_errors_never_restart(exc):
    sleeps: list[float] = []
    with pytest.raises(type(exc)):
        supervise(
            lambda: FakeQuery(exc),
            RestartPolicy(max_restarts=5),
            sleep=sleeps.append,
        )
    assert sleeps == []  # no retry on fatal


def test_healthy_run_resets_restart_budget():
    """Two transient failures spaced by a long healthy run must not exhaust a
    max_restarts=1 budget."""
    t = {"now": 0.0}

    class LongHealthyThenFail(FakeQuery):
        def awaitTermination(self):
            t["now"] += 1000.0  # ran healthy well past reset_after_s
            raise IOError("nightly blip")

    script = [LongHealthyThenFail(None), LongHealthyThenFail(None), FakeQuery(None)]
    it = iter(script)
    report = supervise(
        lambda: next(it),
        RestartPolicy(max_restarts=1, backoff_initial_s=0.5, reset_after_s=300.0),
        sleep=lambda s: None,
        clock=lambda: t["now"],
    )
    assert report.attempts == 3 and report.outcome == "clean"


def test_default_is_fatal_spares_transients():
    assert not default_is_fatal(IOError("connection reset by peer"))
    assert default_is_fatal(StaleCheckpointError("gone"))


# --- integration: a real streaming query through the supervisor -------------
class FlakyPipeline(CdcStreamPipeline):
    """Injects a transient source failure into the first N micro-batch
    applies — the file-source analog of a dropped binlog connection."""

    fail_times: int = 0

    def _apply_batch(self, batch_df, batch_id):
        if self.fail_times > 0:
            self.fail_times -= 1
            raise IOError("simulated transient source failure")
        super()._apply_batch(batch_df, batch_id)


def _flaky_pipeline(spark, tmp_path, student_struct, student_mapping, fail_times, **kw):
    store = ParquetKeyedStore(str(tmp_path / "store"), n_buckets=4)
    pipe = FlakyPipeline(
        spark=spark,
        events_path=str(tmp_path / "events"),
        row_struct=student_struct,
        store=store,
        mappings={"mixfs.student": student_mapping},
        checkpoint_dir=str(tmp_path / "ckpt"),
        **kw,
    )
    pipe.fail_times = fail_times
    return pipe


def test_supervised_stream_recovers_from_transient_failure(
    spark, tmp_path, student_struct, student_mapping
):
    events = [
        ev(1, "insert", after=row(1, 1, 90, "ann", "a")),
        ev(2, "insert", after=row(2, 2, 80, "bob", "b")),
    ]
    write_event_file(str(tmp_path / "events"), "b1", events)
    pipe = _flaky_pipeline(spark, tmp_path, student_struct, student_mapping, fail_times=2)
    sleeps: list[float] = []
    report = pipe.run_supervised(
        RestartPolicy(max_restarts=3, backoff_initial_s=0.01), sleep=sleeps.append
    )
    assert report.outcome == "clean" and report.restarts == 2
    assert len(sleeps) == 2
    assert state(spark, pipe.store) == [(1, 1, 90, "ann", "a"), (2, 2, 80, "bob", "b")]


def test_supervised_stream_fatal_overflow_terminates(
    spark, tmp_path, student_struct, student_mapping
):
    """A dead-letter overflow inside foreachBatch crosses the JVM boundary as
    a StreamingQueryException; the supervisor must classify it fatal and not
    burn restarts."""
    events = [ev(1, "insert", after=row(None, None))]  # PK-less → dead letter
    write_event_file(str(tmp_path / "events"), "bad", events)
    pipe = _flaky_pipeline(
        spark, tmp_path, student_struct, student_mapping, fail_times=0,
        max_dead_letter=0,
    )
    sleeps: list[float] = []
    with pytest.raises(Exception) as exc_info:
        pipe.run_supervised(
            RestartPolicy(max_restarts=3, backoff_initial_s=0.01), sleep=sleeps.append
        )
    assert "DeadLetterOverflowError" in f"{type(exc_info.value).__name__}: {exc_info.value}"
    assert sleeps == []  # never restarted
    assert DeadLetterOverflowError is not None  # imported contract stays


def test_error_history_is_bounded():
    """reset_after_s makes the restart loop deliberately unbounded for a
    long-lived stream; the report must not accumulate months of multi-KB
    tracebacks in driver memory (r13 review) — only the last ERRORS_KEPT
    entries are retained, each capped at ERROR_CHARS chars."""
    from mysql_hbase_replicator_spark.streaming.supervisor import (
        ERROR_CHARS,
        ERRORS_KEPT,
        RestartPolicy,
        supervise,
    )

    n_failures = ERRORS_KEPT + 37
    state = {"n": 0}
    big = "x" * (ERROR_CHARS * 3)

    class _Query:
        def awaitTermination(self):
            return None

    def start_query():
        if state["n"] < n_failures:
            state["n"] += 1
            raise IOError(f"flap {state['n']} {big}")
        return _Query()

    # fake clock: every run looks healthy for > reset_after_s, so the
    # budget refills forever — the unbounded-loop regime under test
    t = {"now": 0.0}

    def clock():
        t["now"] += 1000.0
        return t["now"]

    report = supervise(
        start_query,
        RestartPolicy(max_restarts=3, backoff_initial_s=0.0, reset_after_s=300.0),
        sleep=lambda _s: None,
        clock=clock,
    )
    assert report.outcome == "clean"
    assert report.restarts == n_failures
    assert len(report.errors) == ERRORS_KEPT  # bounded, oldest evicted
    assert all(len(e) <= ERROR_CHARS for e in report.errors)
    assert f"flap {n_failures} " in report.errors[-1]

"""O3 structured logging modes (SURVEY §2.8; reference config/logback.xml:
dev = console TRACE ``[%level] %m%n``, production = daily-rolling file
``./log/mydit.log`` at INFO with ``[%level] [%d{yy-MM-dd HH:mm:ss}]
%c{1}: %m%n``)."""

from __future__ import annotations

import logging
import os
import re

from mysql_hbase_replicator_spark.logging_config import (
    TRACE,
    configure_logging,
    resolve_mode,
    trace,
)

NS = "mysql_hbase_replicator_spark"


def teardown_function(_fn):
    # leave no mode handlers behind for other tests
    lg = logging.getLogger(NS)
    for h in list(lg.handlers):
        lg.removeHandler(h)
        h.close()
    lg.setLevel(logging.NOTSET)
    lg.propagate = True


def test_mode_resolution_matches_logback_contains_test(monkeypatch):
    # logback.xml:8,22 — property("mysql2hbase.mode").contains("production")
    assert resolve_mode("production") == "production"
    assert resolve_mode("eu-production-2") == "production"
    assert resolve_mode("development") == "development"
    assert resolve_mode("") == "development"
    monkeypatch.setenv("SPARK_GRAFT_MODE", "production")
    assert resolve_mode() == "production"
    monkeypatch.delenv("SPARK_GRAFT_MODE")
    assert resolve_mode() == "development"


def test_dev_mode_console_at_trace(capsys):
    lg = configure_logging("development")
    assert lg.level == TRACE and lg.isEnabledFor(TRACE)
    trace(lg, "replication event %d", 7)
    err = capsys.readouterr().err
    assert "[TRACE] replication event 7" in err  # [%level] %m%n


def test_prod_mode_rolling_file_at_info(tmp_path):
    log_dir = str(tmp_path / "log")
    lg = configure_logging("production", log_dir=log_dir)
    assert lg.level == logging.INFO and not lg.isEnabledFor(TRACE)
    trace(lg, "suppressed below INFO")
    logging.getLogger(f"{NS}.streaming.pipeline").info("applied batch 3")
    for h in lg.handlers:
        h.flush()
    path = os.path.join(log_dir, "mydit.log")
    assert os.path.exists(path)
    with open(path) as f:
        content = f.read()
    assert "suppressed" not in content
    # [%level] [%d{yy-MM-dd HH:mm:ss}] %c{1}: %m%n
    assert re.search(
        r"^\[INFO\] \[\d{2}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\] pipeline: "
        r"applied batch 3$",
        content,
        re.M,
    ), content


def test_reconfigure_replaces_handlers_not_stacks():
    configure_logging("development")
    configure_logging("development")
    lg = configure_logging("development")
    assert len(lg.handlers) == 1  # logback's scan-and-reload analog


def test_pipeline_emits_per_batch_trace(
    spark, tmp_path, student_struct, student_mapping, capsys
):
    """The "TRACE to see all replication events" surface (logback.xml:5) at
    batch altitude: one TRACE line per micro-batch with per-table.op
    counts and the advanced checkpoint."""
    import json

    from mysql_hbase_replicator_spark.operators.merge import ParquetKeyedStore
    from mysql_hbase_replicator_spark.streaming.pipeline import CdcStreamPipeline

    configure_logging("development")
    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    with open(os.path.join(events_dir, "b1.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "position": 1,
                    "op": "insert",
                    "db": "mixfs",
                    "table": "student",
                    "before": None,
                    "after": {"sn": 1, "id": 1, "score": 90, "name": "a", "rem": "r"},
                }
            )
            + "\n"
        )
    pipe = CdcStreamPipeline(
        spark=spark,
        events_path=events_dir,
        row_struct=student_struct,
        store=ParquetKeyedStore(str(tmp_path / "store"), n_buckets=4),
        mappings={"mixfs.student": student_mapping},
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    err = capsys.readouterr().err
    assert re.search(
        r"\[TRACE\] batch 0 applied \{'mixfs\.student\.insert': 1\}", err
    ), err

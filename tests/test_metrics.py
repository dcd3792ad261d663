"""Observed metrics (SURVEY.md §2.8 O1): the engine-computed replacement
for the reference's JMX per-op counters — metrics ride the plan, no second
pass and no driver-side accounting."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysql_hbase_replicator_spark.streaming.metrics import (
    cdc_op_metrics,
    observe_batch,
    observe_stream,
)


def _cdc_frame(spark):
    return spark.createDataFrame(
        [
            (1, "insert"),
            (2, "insert"),
            (3, "update"),
            (4, "delete"),
            (5, "insert"),
        ],
        "position long, op string",
    )


def test_observe_batch_counts_ops_in_one_pass(spark):
    df, obs = observe_batch(_cdc_frame(spark), cdc_op_metrics())
    assert df.count() == 5  # the action that materializes the metrics
    got = obs.get
    assert got["n_events"] == 5
    assert got["n_inserts"] == 3
    assert got["n_updates"] == 1
    assert got["n_deletes"] == 1
    assert got["max_position"] == 5


def test_observe_stream_metrics_in_progress(spark, tmp_path):
    """Streaming observe: every micro-batch progress carries the metric row
    under observedMetrics — the JMX-poll replacement."""
    src, ckpt = str(tmp_path / "ev"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "b1.json"), "w") as f:
        for pos, op in [(1, "insert"), (2, "update"), (3, "insert")]:
            f.write(json.dumps({"position": pos, "op": op}) + "\n")

    schema = T.StructType(
        [
            T.StructField("position", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(src)
    observed = observe_stream(stream, "cdc", cdc_op_metrics())
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    metrics = [
        p.observedMetrics["cdc"]
        for p in q.recentProgress
        if p.observedMetrics.get("cdc") is not None
    ]
    assert metrics, "no observedMetrics in any progress event"
    assert sum(m["n_events"] for m in metrics) == 3
    assert sum(m["n_inserts"] for m in metrics) == 2
    assert sum(m["n_updates"] for m in metrics) == 1

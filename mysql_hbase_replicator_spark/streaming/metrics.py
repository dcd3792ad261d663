"""Pipeline-inline metrics via ``Dataset.observe`` (SURVEY.md §2.8 O1).

The reference exports JMX MBeans with per-op counts and delays
(`Rep.scala:34-38`, `HbaseApplier.scala:22-53`). The Spark-native
equivalent is *observed metrics*: aggregate expressions attached to a plan
node that the engine computes as the data streams past — no second pass, no
extra action, no driver-side accounting. Batch callers read them from an
``Observation``; streaming callers get them in every
``StreamingQueryProgress.observedMetrics`` (and through
``StreamingQueryListener``), which is the JMX-poll replacement.

Metrics must be aggregate expressions; per-op counts are conditional sums —
the exact shape of the reference's `count.get(type).incrementAndGet` loop,
computed by the engine instead of user code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cdc_op_metrics() -> dict[str, Column]:
    """The reference's per-op counter set as observe expressions."""
    return {
        "n_events": F.count(F.lit(1)),
        "n_inserts": F.sum(F.when(F.col("op") == "insert", 1).otherwise(0)),
        "n_updates": F.sum(F.when(F.col("op") == "update", 1).otherwise(0)),
        "n_deletes": F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)),
        "max_position": F.max("position"),
    }


def observe_batch(df: DataFrame, metrics: dict[str, Column]):
    """Attach metrics to a batch DataFrame. Returns (df, observation);
    ``observation.get`` blocks until the first action on ``df`` completes
    and then holds the metric dict — one pass, no re-execution."""
    from pyspark.sql import Observation

    obs = Observation()
    out = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return out, obs


def observe_stream(df: DataFrame, name: str, metrics: dict[str, Column]) -> DataFrame:
    """Attach named metrics to a streaming DataFrame; every micro-batch
    progress event carries them under ``observedMetrics[name]``."""
    return df.observe(name, *[c.alias(n) for n, c in metrics.items()])

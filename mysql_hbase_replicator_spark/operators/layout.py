"""Data-layout management for the parquet store: the write-side half of
"fast at 100 TB".

The reference's sink is HBase — region servers own physical layout
(`HbaseApplier.scala` just issues puts/deletes). On a data-lake store the
engine owns layout itself, and two properties dominate scan cost at scale:

- **partition pruning**: a filter on the partition column must eliminate
  whole directories before any I/O (`PartitionFilters` in the scan node,
  not `PushedFilters` — pruning happens at planning, pushdown at read).
- **file sizing**: streaming/CDC sinks accrete many small files; reads then
  pay per-file open/footer costs and lose large sequential scans. Periodic
  compaction to ~target-sized files restores scan throughput.

Both operators are pure DataFrame writes — no driver-side data movement —
and the compaction swap is crash-safe via the same retired/staging
`os.replace` protocol as the streaming dedup index (dedup_stream.compact).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_sorted(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` hive-partitioned by ``partition_cols``, clustered so each
    partition directory holds ``files_per_partition`` files internally sorted
    by ``sort_cols``.

    The repartition keys every row by its partition values (plus a bounded
    file index when files_per_partition > 1), so each output file is written
    by exactly one task — no small-file spray where every upstream task
    writes into every partition. sortWithinPartitions gives min/max-tight
    row groups for ``sort_cols`` (parquet zone-map pruning on the sort key).
    """
    from pyspark.sql import functions as F

    parts = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        # spread rows of one partition value over N writer tasks
        # deterministically by hashing the sort key (or all columns); pin the
        # shuffle partition count explicitly — AQE would otherwise coalesce
        # the small per-(value, index) partitions back into one writer task
        # and defeat the split
        basis = [F.col(c) for c in (sort_cols or df.columns)]
        parts = parts + [F.pmod(F.hash(*basis), F.lit(files_per_partition))]
        n_values = df.select(*partition_cols).distinct().count()
        out = df.repartition(max(1, n_values) * files_per_partition, *parts)
    else:
        out = df.repartition(*parts)
    if sort_cols:
        out = out.sortWithinPartitions(*[F.col(c) for c in sort_cols])
    out.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite a (non-partitioned) parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files and atomically swap it in.

    Protocol (same crash-safety shape as dedup_stream.compact): write to
    ``path.compacting``, retire the live dir to ``path.retired``, promote
    staging with ``os.replace``, then delete the retired copy. On restart a
    missing live dir with a surviving ``.retired`` is restored before
    anything is deleted, so no crash point loses data.

    Returns {"files_before": n, "files_after": m, "bytes": b}.
    """
    staging, retired = path + ".compacting", path + ".retired"
    # reclaim from a previous crash: never delete the only copy
    if not os.path.isdir(path) and os.path.isdir(retired):
        os.replace(retired, path)
    for stale in (staging, retired):
        if os.path.isdir(stale):
            shutil.rmtree(stale)

    def _data_files(p: str) -> list[str]:
        return [
            os.path.join(r, f)
            for r, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        ]

    before = _data_files(path)
    total = sum(os.path.getsize(f) for f in before)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    # coalesce when shrinking (no shuffle); repartition only to grow
    out = df.coalesce(n_out) if n_out <= len(before) else df.repartition(n_out)
    out.write.mode("overwrite").parquet(staging)

    os.replace(path, retired)
    os.replace(staging, path)
    shutil.rmtree(retired)
    return {
        "files_before": len(before),
        "files_after": len(_data_files(path)),
        "bytes": total,
    }

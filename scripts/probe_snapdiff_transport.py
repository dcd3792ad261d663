"""Scale probe for the snapshot-diff TRANSPORT loop (r13 verdict #4).

The r13 kernel probe sized the diff join alone (50M keys/side, one
full-outer SMJ); the sustained-poll A/B ran at 10k keys x 24 landings.
This probe runs the FULL pipeline loop — landing admission → re-read+prune
→ diff → stage → apply kernel → pointer flip — at production-ish key
counts: default 1.5M keys per snapshot x 22 polls (2% key rotation + 10%
value churn per version, the bench generator's distribution), parquet
landing files (the production shape), LSM store with compaction exercised
mid-drain (compact_every=8 → ~2 compactions inside the 22 applies).

Records sustained rows/s over the whole drain, per-batch p50/p95, the
spill/shuffle telemetry the walls can't attribute, and the files-map size
(entries + marker bytes) that bounds the landing re-read's pruning state.

Usage:  python scripts/probe_snapdiff_transport.py [n_keys] [n_polls] [n_tables] [n_parallel] [skew]
        # default 1_500_000 x 22 x 1; results JSON on stdout
        # n_tables > 1 probes the MULTI-TABLE mode (r14): a landing root
        # with per-table subdirs through ONE pipeline, n_keys split evenly
        # across tables so total rows/poll stays comparable to the
        # single-table run
        # skew > 1 (r15 verdict #4) makes table t0 a HOG with skew x the
        # rows of each other table (n_keys stays the TOTAL): the
        # starvation probe — small tables' per-poll apply means must stay
        # near their equal-share walls, not queue behind the hog's
        # multi-stage job
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# shared telemetry helper — one key vocabulary with bench.py's query_io
# ({spill_disk, spill_mem, shuffle_bytes}; r14 review)
from mysql_hbase_replicator_spark.session import stage_io_totals as _stage_totals  # noqa: E402


def _apply_means(pipe) -> dict[str, float]:
    """Mean per-table apply wall (seconds) over every batch result —
    'apply:db.table' keyed, table-suffix only in the output."""
    sums: dict[str, list[float]] = {}
    for r in pipe.results:
        for k, s in r.apply_latency_s.items():
            if k.startswith("apply:"):
                sums.setdefault(k[len("apply:"):], []).append(s)
    return {t: round(sum(v) / len(v), 2) for t, v in sorted(sums.items())}


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from mysql_hbase_replicator_spark.catalog.meta import (
        HbaseCollInfo,
        HbaseTableInfo,
    )
    from mysql_hbase_replicator_spark.session import apply_volume_tuning, get_spark
    from mysql_hbase_replicator_spark.sources.snapshot_diff import (
        PrevSnapshotStore,
    )
    from mysql_hbase_replicator_spark.streaming.pipeline import CdcStreamPipeline

    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    n_polls = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    n_tables = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    # apply-worker count (r14 verdict #5: probe reference-style fan-out with
    # parallelism below table count, so the ThreadPool x Spark-FIFO
    # interaction under contention is measured, not assumed); defaults to
    # one worker per table — the r14 configuration
    n_parallel = int(sys.argv[4]) if len(sys.argv) > 4 else n_tables
    skew = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    # equal split by default; with skew, t0 gets skew shares and every
    # other table one — n_keys stays the grand total either way
    small = n_keys // (skew + n_tables - 1)
    table_keys = [skew * small] + [small] * (n_tables - 1)
    local_dir = "/tmp/spark-local-snaptrans"
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        app_name="probe-snapdiff-transport",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "40000",
            "spark.local.dir": local_dir,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    apply_volume_tuning(
        spark, "/tmp/sf100" if os.path.isdir("/tmp/sf100") else "/root/testdata/sf0.1"
    )
    base = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}"
    )
    row_struct = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    def make_mapping(table: str) -> HbaseTableInfo:
        return HbaseTableInfo(
            dbName="app", dbTableName=table, hbaseTableName=f"app:{table}",
            hbaseNameSpace="app", sparkTableName=table, bytesUtils="Binary",
            cols=[
                HbaseCollInfo("user_id", "bigint(20)", "user_id", "LongType", True),
                HbaseCollInfo("event_type", "varchar(16)", "event_type", "StringType", False),
                HbaseCollInfo("value", "double", "value", "DoubleType", False),
            ],
        )

    tables = [f"t{i}" for i in range(n_tables)] if n_tables > 1 else ["t"]
    fulls = [f"app.{t}" for t in tables]

    root = tempfile.mkdtemp(prefix="snaptrans-", dir=local_dir)
    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    try:
        # --- produce the poll history: one parquet landing file set per
        # version (per table in multi mode), atomically renamed in,
        # mtime-ordered oldest-first ------------------------------------
        t0 = time.time()
        total_rows = 0
        now = time.time()
        for full in fulls:
            sub = landing if n_tables == 1 else os.path.join(landing, full)
            os.makedirs(sub, exist_ok=True)
            t_off = fulls.index(full)
            keys_per_table = table_keys[t_off]
            for ver in range(1, n_polls + 1):
                k = F.col("id")
                df = (
                    spark.range(keys_per_table)
                    .filter((k + ver + t_off) % 50 != 0)  # 2% rotating absence
                    .select(
                        k.alias("user_id"),
                        F.lit("click").alias("event_type"),
                        ((k % 1000) + F.when((k + ver) % 10 == 0, ver).otherwise(0))
                        .cast("double")
                        .alias("value"),
                        F.lit(ver).cast("long").alias("_snap_ver"),
                    )
                )
                tmp = os.path.join(root, f"stage_{full}_v{ver}")
                df.repartition(4).write.mode("overwrite").parquet(tmp)
                for i, part in enumerate(
                    sorted(glob.glob(os.path.join(tmp, "*.parquet")))
                ):
                    dst = os.path.join(sub, f"{ver:04d}-{i}.parquet")
                    os.replace(part, dst)
                    os.utime(dst, (now + ver, now + ver))
                shutil.rmtree(tmp, ignore_errors=True)
                total_rows += keys_per_table - keys_per_table // 50
        build_s = round(time.time() - t0, 1)

        pipe = CdcStreamPipeline(
            spark=spark,
            events_path=landing,
            row_struct=row_struct if n_tables == 1 else None,
            row_structs=(
                None if n_tables == 1 else {f: row_struct for f in fulls}
            ),
            store="lsm",
            store_dir=os.path.join(root, "store"),
            store_n_buckets=32,
            store_compact_every=8,  # ~2 compactions inside the drain
            mappings={f: make_mapping(t) for f, t in zip(fulls, tables)},
            checkpoint_dir=os.path.join(root, "ckpt"),
            source_format="snapshot_diff",
            snapshot_format="parquet",
            # one version WAVE per trigger: 4 part files per table-version,
            # all tables' same version landing together in multi mode (the
            # concurrent per-table applies then overlap, r14)
            max_files_per_trigger=4 * n_tables,
            snapshot_parallel_tables=n_parallel,
        )
        before = _stage_totals(base)
        t0 = time.time()
        q = pipe.start(available_now=True, query_name="probe-snaptrans")
        q.awaitTermination(3600)
        wall = round(time.time() - t0, 1)
        after = _stage_totals(base)
        durs = sorted(
            p["durationMs"]["triggerExecution"]
            for p in q.recentProgress
            if p["numInputRows"] > 0
        )
        fmap_entries = 0
        marker_bytes = 0
        for full in fulls:
            snap_root = os.path.join(pipe.checkpoint_dir, "snapshots")
            if n_tables > 1:
                snap_root = os.path.join(snap_root, full)
            fmap_entries += len(PrevSnapshotStore(snap_root).files_map())
            marker_bytes += os.path.getsize(os.path.join(snap_root, "_current.json"))
        counts = pipe.total_counts()
        n_state = sum(
            pipe.store.read(spark, f"app:{t}").count() for t in tables
        )
        out = {
            "n_keys": n_keys,
            "n_polls": n_polls,
            "n_tables": n_tables,
            "n_parallel": n_parallel,
            "skew": skew,
            "keys_by_table": dict(zip(tables, table_keys)),
            "snapshot_rows_total": total_rows,
            "landing_build_s": build_s,
            "drain_wall_s": wall,
            "rows_per_s": int(total_rows / wall),
            "changes_applied": sum(counts.values()),
            "batch_ms_p50": durs[len(durs) // 2] if durs else None,
            "batch_ms_p95": durs[int(0.95 * (len(durs) - 1))] if durs else None,
            # per-table apply-wall spread across the drain: the starvation
            # signal for ThreadPool x Spark-FIFO under n_parallel < n_tables
            # (a starved table shows a mean apply wall far above the rest)
            "apply_s_mean_by_table": _apply_means(pipe),
            "n_batches": len(durs),
            "state_rows": n_state,
            "files_map_entries": fmap_entries,
            "files_map_marker_bytes": marker_bytes,
            # deltas clamped >= 0 like bench.py (ADVICE r14): past
            # spark.ui.retainedStages the UI evicts completed stages, so a
            # long drain can make after < before — flag that so
            # eviction-corrupted telemetry is visible instead of silent
            "disk_spill_mb": round(
                max(0.0, after["spill_disk"] - before["spill_disk"]) / 1e6, 1
            ),
            "mem_spill_mb": round(
                max(0.0, after["spill_mem"] - before["spill_mem"]) / 1e6, 1
            ),
            "shuffle_write_mb": round(
                max(0.0, after["shuffle_bytes"] - before["shuffle_bytes"]) / 1e6, 1
            ),
            "stage_eviction_suspected": any(
                after[k] < before[k]
                for k in ("spill_disk", "spill_mem", "shuffle_bytes")
            ),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

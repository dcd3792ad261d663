"""Scale probe for the snapshot-diff CDC kernel (r13): the transport's
cost envelope is one full-outer null-safe PK join between two FULL
snapshots (sources/snapshot_diff.snapshot_diff_events), so the number that
matters at 100 TB is that join at production key counts — here the two
snapshots are the last-image states of the scaled events table at two time
cuts (tens of millions of keys at /tmp/sf100), materialized to parquet
exactly as the pipeline stages them, then diffed with full UI-scraped
spill/shuffle telemetry, median-of-3.

Usage:  python scripts/probe_snapdiff_scale.py [label=dir ...]
        # default: ~100=/tmp/sf100
        python scripts/probe_snapdiff_scale.py --synthetic 50000000
        # synthetic mode: two 50M-key snapshots (10% churn, 2% rotation)
        # — the events table tops out at 1.5M distinct keys, so this is
        # the run that sizes the full-outer PK join itself
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_totals(base: str) -> dict[str, int]:
    with urllib.request.urlopen(f"{base}/stages?status=complete", timeout=30) as r:
        stages = json.loads(r.read())
    tot = {"disk_spill": 0, "mem_spill": 0, "shuffle_write": 0}
    for s in stages:
        tot["disk_spill"] += s.get("diskBytesSpilled", 0)
        tot["mem_spill"] += s.get("memoryBytesSpilled", 0)
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
    return tot


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    from mysql_hbase_replicator_spark.session import apply_volume_tuning, get_spark
    from mysql_hbase_replicator_spark.sources.snapshot_diff import (
        snapshot_diff_events,
    )
    from mysql_hbase_replicator_spark.sources.tables import load_table

    synthetic = None
    args = sys.argv[1:]
    if args[:1] == ["--synthetic"]:
        synthetic = int(args[1])
        args = args[2:]
    pairs = [tuple(a.split("=", 1)) for a in args] or [("~100", "/tmp/sf100")]
    local_dir = "/tmp/spark-local-snapdiff"
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        app_name="probe-snapdiff",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
            "spark.local.dir": local_dir,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
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
    out: dict[str, dict] = {}
    if synthetic is not None:
        pairs = [(f"synthetic{synthetic // 1_000_000}M", None)]
    for label, sf_dir in pairs:
        scratch = tempfile.mkdtemp(prefix="snapdiff-probe-", dir=local_dir)
        t0 = time.time()
        if synthetic is not None:
            apply_volume_tuning(spark, "/tmp/sf100" if os.path.isdir("/tmp/sf100") else "/root/testdata/sf0.1")
            n = synthetic

            def synth(ver: int, path: str) -> str:
                # 2% rotating key absence + 10% value churn per version —
                # the bench generator's distribution at probe scale
                k = F.col("id")
                (
                    spark.range(n)
                    .filter((k + ver) % 50 != 0)
                    .select(
                        k.alias("user_id"),
                        F.lit("click").alias("event_type"),
                        (
                            (k % 1000)
                            + F.when((k + ver) % 10 == 0, ver).otherwise(0)
                        ).cast("double").alias("value"),
                    )
                    .write.mode("overwrite")
                    .parquet(path)
                )
                return path

            prev_path = synth(1, os.path.join(scratch, "prev"))
            cur_path = synth(2, os.path.join(scratch, "cur"))
        else:
            apply_volume_tuning(spark, sf_dir)
            e = load_table(spark, sf_dir, "events")
            lo, hi = e.select(F.min("ts"), F.max("ts")).first()
            cut1 = lo + (hi - lo) * 2 / 3  # snapshot 1 = state at 2/3 of range

            def snapshot(cut_expr, path: str) -> str:
                w = Window.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
                (
                    e.filter(F.col("ts") <= F.lit(cut_expr))
                    .withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .select("user_id", "event_type", "value")
                    .write.mode("overwrite")
                    .parquet(path)
                )
                return path

            prev_path = snapshot(cut1, os.path.join(scratch, "prev"))
            cur_path = snapshot(hi, os.path.join(scratch, "cur"))
        build_s = round(time.time() - t0, 1)
        prev = spark.read.schema(row_struct).parquet(prev_path)
        cur = spark.read.schema(row_struct).parquet(cur_path)
        n_prev, n_cur = prev.count(), cur.count()

        times, spills, n_events = [], [], None
        for _rep in range(3):
            before = _stage_totals(base)
            t0 = time.time()
            ev = snapshot_diff_events(
                prev, cur, row_struct, ["user_id"], "app", "events_state", 1
            )
            n_events = ev.count()
            times.append(round(time.time() - t0, 3))
            after = _stage_totals(base)
            spills.append({k: after[k] - before[k] for k in after})
        med_spill = sorted(spills, key=lambda s: s["disk_spill"])[1]
        out[label] = {
            "snapshot_rows": [n_prev, n_cur],
            "snapshot_build_s": build_s,
            "diff_events": n_events,
            "diff_median_s": statistics.median(times),
            "diff_reps_s": times,
            "disk_spill_mb": round(med_spill["disk_spill"] / 1e6, 1),
            "mem_spill_mb": round(med_spill["mem_spill"] / 1e6, 1),
            "shuffle_write_mb": round(med_spill["shuffle_write"] / 1e6, 1),
        }
        print(f"# {label}: {out[label]}", file=sys.stderr)
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

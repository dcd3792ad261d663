"""Variance-controlled scale re-probe (r6 verdict #4): the shuffle-heavy
corpus/text family plus this round's reworked queries, at sf≈1 and sf≈10,
MEDIAN-of-3 per query with per-rep shuffle-spill telemetry.

Differences from scripts/scale_probe.py (best-of-2, no telemetry):
- 3 reps, median reported (plus the raw triple, so spread is visible);
- spark.local.dir pinned to one known directory on the big disk;
- the Spark UI REST API is enabled and scraped after every rep: the delta
  of cumulative diskBytesSpilled / memoryBytesSpilled / shuffle write bytes
  across completed stages attributes spill to the query that caused it.

Usage:
  SPARK_GRAFT_DRIVER_MEM=48g python scripts/reprobe_r7.py [--only a,b] \
      [label=dir ...]           # default: ~1=/tmp/sf1 ~10=/tmp/sf10
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    # the r6 "soft ratios" shuffle-heavy family (verdict #4)
    "corpus_repeated_ngrams",
    "corpus_bigram_top",
    "corpus_chunk_dedup",
    "text_bigram_coherence",
    "text_tfidf_top_terms",
    # r7 LSH rework validation (verdict #5)
    "dedup_minhash_lsh",
    "dedup_minhash_estimate_quality",
    "dedup_survivors_lsh",
    # r7 prefix-sum twin validation (verdict #6)
    "window_range_numeric",
    "window_range_numeric_sweep",
]


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
    from mysql_hbase_replicator_spark.plans.registry import (
        QUERY_REGISTRY,
        load_all_queries,
    )
    from mysql_hbase_replicator_spark.session import get_spark

    args = sys.argv[1:]
    only = None
    pairs: list[tuple[str, str]] = []
    i = 0
    while i < len(args):
        if args[i] == "--only":
            only = set(args[i + 1].split(","))
            i += 2
        else:
            label, _, d = args[i].partition("=")
            pairs.append((label, d))
            i += 1
    if not pairs:
        pairs = [("~1", "/tmp/sf1"), ("~10", "/tmp/sf10")]
    # --only accepts ANY registered query name, not just the default set
    names = list(QUERIES) if only is None else sorted(only)

    local_dir = "/tmp/spark-local-reprobe"
    os.makedirs(local_dir, exist_ok=True)
    load_all_queries()
    spark = get_spark(
        app_name="reprobe-r7",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
            "spark.local.dir": local_dir,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    for name in names:  # codegen warmup, smallest SF
        QUERY_REGISTRY[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    from mysql_hbase_replicator_spark.session import apply_volume_tuning

    out: dict[str, dict[str, dict]] = {}
    for label, sf_dir in pairs:
        spark.catalog.clearCache()
        # r11 self-tuning: size initialPartitionNum to THIS SF's volume
        # (env SPARK_GRAFT_INIT_PARTITIONS still overrides for A/B runs)
        n_init = apply_volume_tuning(spark, sf_dir)
        print(f"# sf{label}: initialPartitionNum={n_init}", file=sys.stderr)
        col: dict[str, dict] = {}
        for name in names:
            times, spills = [], []
            for _rep in range(3):
                before = _stage_totals(base)
                t0 = time.time()
                QUERY_REGISTRY[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(round(time.time() - t0, 3))
                after = _stage_totals(base)
                spills.append({k: after[k] - before[k] for k in after})
            med = statistics.median(times)
            med_spill = sorted(spills, key=lambda s: s["disk_spill"])[1]
            col[name] = {
                "median_s": med,
                "reps_s": times,
                "spread": round(max(times) - min(times), 3),
                "disk_spill_mb": round(med_spill["disk_spill"] / 1e6, 1),
                "mem_spill_mb": round(med_spill["mem_spill"] / 1e6, 1),
                "shuffle_write_mb": round(med_spill["shuffle_write"] / 1e6, 1),
            }
            print(f"# {label} {name}: {col[name]}", file=sys.stderr)
        out[label] = col
    print(json.dumps(out))


if __name__ == "__main__":
    main()

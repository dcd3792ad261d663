"""Scaling probe for SCALING.md: times the FULL bench.py HEADLINE set at a
series of SFs in ONE session, best-of-2 warm per query per SF — the same
methodology as bench.py, so the columns are comparable to BENCH_r*.json.

Usage:
  python scripts/scale_probe.py [label=dir ...] [--only n1,n2] [--skip n1,n2]

Defaults to the historical three columns:
  0.01=/root/testdata/sf0.01 0.1=/root/testdata/sf0.1 ~1=/tmp/sf1
Pass explicit pairs for other steps, e.g. a single sf~10 column:
  python scripts/scale_probe.py ~10=/tmp/sf10 --skip udaf_pandas_median
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import bench
    from mysql_hbase_replicator_spark.plans.registry import (
        QUERY_REGISTRY,
        load_all_queries,
    )
    from mysql_hbase_replicator_spark.session import get_spark

    args = sys.argv[1:]
    only: set[str] | None = None
    skip: set[str] = set()
    pairs: list[tuple[str, str]] = []
    i = 0
    while i < len(args):
        if args[i] == "--only":
            only = set(args[i + 1].split(","))
            i += 2
        elif args[i] == "--skip":
            skip = set(args[i + 1].split(","))
            i += 2
        else:
            label, _, d = args[i].partition("=")
            pairs.append((label, d))
            i += 1
    if not pairs:
        pairs = [
            ("0.01", "/root/testdata/sf0.01"),
            ("0.1", "/root/testdata/sf0.1"),
            ("~1", "/tmp/sf1"),
        ]

    names = [
        n
        for n in bench.HEADLINE
        if (only is None or n in only) and n not in skip
    ]

    load_all_queries()
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # codegen warmup once at the smallest SF (plan shapes, not data)
    for name in names:
        QUERY_REGISTRY[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    from mysql_hbase_replicator_spark.session import apply_volume_tuning

    out: dict[str, dict[str, float]] = {}
    for label, sf_dir in pairs:
        spark.catalog.clearCache()
        # r11 self-tuning: size initialPartitionNum to THIS SF's volume
        # (env SPARK_GRAFT_INIT_PARTITIONS still overrides for A/B runs)
        n_init = apply_volume_tuning(spark, sf_dir)
        print(f"# sf{label}: initialPartitionNum={n_init}", file=sys.stderr)
        col: dict[str, float] = {}
        for name in names:
            best = float("inf")
            for _rep in range(2):
                t0 = time.time()
                QUERY_REGISTRY[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            col[name] = round(best, 3)
            print(f"# {label} {name}: {col[name]}s", file=sys.stderr)
        out[label] = col
        print(f"# sf{label}: total {round(sum(col.values()), 2)}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

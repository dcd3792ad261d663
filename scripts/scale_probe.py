"""Scaling probe for SCALING.md: times the FULL bench.py HEADLINE set at
three SFs (sf0.01, sf0.1, and the make_scaled_sf.py sf~1 copy) in ONE
session, best-of-2 warm per query per SF — the same methodology as
bench.py, so the columns are comparable to BENCH_r*.json.

Usage: python scripts/scale_probe.py [sf1_dir] > /tmp/scale_probe.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    import bench
    from mysql_hbase_replicator_spark.plans.registry import (
        QUERY_REGISTRY,
        load_all_queries,
    )
    from mysql_hbase_replicator_spark.session import get_spark

    load_all_queries()
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    sfs = {"0.01": "/root/testdata/sf0.01", "0.1": "/root/testdata/sf0.1", "~1": sf1}
    # codegen warmup once at the smallest SF (plan shapes, not data)
    for name in bench.HEADLINE:
        QUERY_REGISTRY[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    out: dict[str, dict[str, float]] = {}
    for label, sf_dir in sfs.items():
        spark.catalog.clearCache()
        col: dict[str, float] = {}
        for name in bench.HEADLINE:
            best = float("inf")
            for _rep in range(2):
                t0 = time.time()
                QUERY_REGISTRY[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            col[name] = round(best, 3)
        out[label] = col
        print(f"# sf{label}: total {round(sum(col.values()), 2)}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

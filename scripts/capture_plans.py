"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag-dir> <suffix> [query ...]
  e.g. python scripts/capture_plans.py plans/r16 before dedup_minhash_lsh agg_rollup

Writes plans/r16/<query>_<suffix>.txt for each query. Uses the tuned bench
session (same confs as bench.py) at $SPARK_GRAFT_SF_DIR (default sf0.1) so
the captured plan is the one the bench actually runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(tag_dir, exist_ok=True)

    from mysql_hbase_replicator_spark.plans.registry import (
        QUERY_REGISTRY,
        load_all_queries,
    )
    from mysql_hbase_replicator_spark.session import apply_volume_tuning, get_spark

    load_all_queries()
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    apply_volume_tuning(spark, sf_dir)
    if not names:
        names = sorted(QUERY_REGISTRY)
    for name in names:
        df = QUERY_REGISTRY[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(tag_dir, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

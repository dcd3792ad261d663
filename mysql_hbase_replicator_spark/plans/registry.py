"""Named-query registry backing the driver contract (__spark_entry__.py).

Every operator from SURVEY.md §2 that we claim as implemented registers here:
a PySpark builder ``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible,
the equivalent DuckDB oracle SQL. The driver hash-compares the two at sf0.01
(row count + schema + order-insensitive value hash), so builders must be
deterministic: every top-k has a total-order tiebreak, and every float
aggregate goes through exact decimal arithmetic (see ``msum``/``mavg`` in
plans.queries) so Spark's shuffle-order-dependent double summation cannot
diverge from DuckDB's sequential one.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERY_REGISTRY: dict[str, QueryFn] = {}
ORACLE_REGISTRY: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL over the same tables
    (pre-registered views). ``oracle=None`` marks a non-SQL-expressible op —
    the driver then records a weaker rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERY_REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        QUERY_REGISTRY[name] = fn
        if oracle is not None:
            ORACLE_REGISTRY[name] = oracle
        return fn

    return deco


def load_all_queries() -> None:
    """Import every module that registers queries (idempotent)."""
    import mysql_hbase_replicator_spark.operators.dedup  # noqa: F401
    import mysql_hbase_replicator_spark.operators.dedup_stream  # noqa: F401
    import mysql_hbase_replicator_spark.operators.similarity  # noqa: F401
    import mysql_hbase_replicator_spark.plans.queries  # noqa: F401
    import mysql_hbase_replicator_spark.plans.queries_cdc  # noqa: F401
    import mysql_hbase_replicator_spark.plans.queries_corpus  # noqa: F401
    import mysql_hbase_replicator_spark.plans.queries_events  # noqa: F401
    import mysql_hbase_replicator_spark.plans.queries_extra  # noqa: F401
    import mysql_hbase_replicator_spark.plans.queries_multimodal  # noqa: F401
    import mysql_hbase_replicator_spark.plans.queries_sql  # noqa: F401
    import mysql_hbase_replicator_spark.plans.queries_text  # noqa: F401
    import mysql_hbase_replicator_spark.plans.queries_udf  # noqa: F401

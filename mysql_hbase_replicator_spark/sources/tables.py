"""Parquet table loaders for the driver-generated test data.

These play the role of the reference's post-replication query surface: once a
table is mapped (`Hbase2CataLog.scala:19-23` registers it in a Spark SQL
catalog), all queries run against the replicated store — here, parquet.

Scans stay fully declarative so Catalyst applies column pruning and predicate
pushdown at the parquet reader (verify with ``df.explain('formatted')`` —
``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. No .cache() here — callers decide lifetime.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. We read it as a long (nanos since epoch) and truncate to
    microseconds — the same floor the DuckDB oracle applies when casting
    TIMESTAMP_NS → TIMESTAMP, so both sides see identical values.
    """
    if name == "events":
        # normally set once by session.get_spark; defensive for sessions the
        # driver harness built itself (read-semantics flag, needed to scan
        # the nanos-typed column at all)
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view so spark.sql() works on the
    same names the DuckDB oracle uses."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

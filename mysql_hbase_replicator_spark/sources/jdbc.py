"""JDBC snapshot source (SURVEY.md §2.1 S3).

The reference uses JDBC twice: schema/PK/enum discovery per table
(ColInfo.scala:26-68,72-95) and nothing else — data only ever arrives via
the binlog. A Spark-native engine also wants the *initial snapshot* path:
bulk-read the current table state over JDBC, seed the keyed store, then let
the CDC stream take over from the snapshot position.

No MySQL server exists in this environment, so the `.load()` call is a thin
assembly of `spark.read.jdbc` options; everything around it — option
construction (partitioned parallel scan on the numeric PK), schema-struct
derivation from the catalog mapping, and the snapshot→store bootstrap — is
pure and tested with local DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mysql_hbase_replicator_spark.catalog.meta import HbaseTableInfo
from mysql_hbase_replicator_spark.operators.merge import ParquetKeyedStore


def build_jdbc_options(
    host: str,
    port: int,
    db: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Options for a parallel JDBC scan. With a numeric ``partition_column``
    (use the first PK column), Spark issues ``num_partitions`` range-bounded
    queries concurrently — the difference between a single-connection drain
    and a cluster-parallel snapshot at 100 TB."""
    opts = {
        "url": f"jdbc:mysql://{host}:{port}/{db}",
        "dbtable": table,
        "user": user,
        "password": password,
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read requires lower/upper bounds")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def jdbc_snapshot(spark: SparkSession, **kwargs) -> DataFrame:
    """Bulk-read the current table state (see build_jdbc_options for kwargs).
    Requires a reachable MySQL and its JDBC driver on the classpath."""
    reader = spark.read.format("jdbc")
    for k, v in build_jdbc_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader.load()


def snapshot_to_store(
    spark: SparkSession,
    snapshot: DataFrame,
    store: ParquetKeyedStore,
    info: HbaseTableInfo,
) -> int:
    """Seed the keyed store from an initial snapshot: project/rename/cast the
    source image through the catalog mapping (P2-P4 semantics, minus the
    included-columns gate — a snapshot is always complete), then overwrite
    the target bucketed by PK. Returns the row count written. After this,
    CDC replay from the snapshot position is idempotent (K2 upserts)."""
    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.functions.types import spark_type_from_name

    projected = snapshot.select(
        *[
            F.col(c.dbColumnName)
            .cast(spark_type_from_name(c.hbaseColumnType, restrict_to_six=False))
            .alias(c.hbaseColumnName)
            for c in info.cols
        ]
    )
    pks = [c.hbaseColumnName for c in info.key_columns()]
    name = info.hbaseTableName or info.full_name
    store.overwrite(spark, name, projected, pks)
    df = store.read(spark, name)
    return df.count() if df is not None else 0

"""PySpark-native analytics engine with the capabilities of
chenm11/mysql-hbase-replicator.

The reference (/root/reference) is a MySQL-binlog → HBase CDC replicator
whose query surface is delegated to Spark SQL (Hbase2CataLog.scala:19-23).
This package re-expresses both halves Spark-first:

- ``sources``     — CDC event source (batch + Structured Streaming), parquet
                    table loaders, JDBC schema discovery helpers.
- ``functions``   — the reference's type system (HbaseTableInfo.scala:158-182),
                    value normalization (MongoDBApplier.scala:99-119), plus
                    text/vector helpers for the EXT operators.
- ``catalog``     — mapping registry with the reference's JSON catalog shape
                    (HbaseTableInfo.scala:28-35) + Spark catalog registration.
- ``operators``   — the CDC merge kernel (HbaseApplier.scala:182-275 semantics
                    re-expressed as DataFrame ops), dedup, similarity search,
                    multimodal column plumbing.
- ``plans``       — the relational query surface (joins/aggs/windows/set ops/
                    scalar functions) exposed as named query builders with
                    DuckDB oracle SQL for the correctness harness.
- ``streaming``   — Structured Streaming wrapper: readStream → foreachBatch
                    (apply_cdc_batch), checkpointing, dead-letter, metrics.
"""

__version__ = "0.1.0"

from mysql_hbase_replicator_spark.session import get_spark  # noqa: F401

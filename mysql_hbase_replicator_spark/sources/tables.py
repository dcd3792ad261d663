"""Parquet table loaders for the driver-generated test data.

These play the role of the reference's post-replication query surface: once a
table is mapped (`Hbase2CataLog.scala:19-23` registers it in a Spark SQL
catalog), all queries run against the replicated store — here, parquet.

Scans stay fully declarative so Catalyst applies column pruning and predicate
pushdown at the parquet reader (verify with ``df.explain('formatted')`` —
``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations


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



def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. No .cache() here — callers decide lifetime.

    ``events.ts`` is parquet TIMESTAMP(NANOS). Depending on the Spark build
    and the ``spark.sql.legacy.parquet.nanosAsLong`` flag, that column scans
    as either a long (nanos since epoch) or a TIMESTAMP_NTZ already truncated
    to micros — so we branch on the dtype the reader actually produced and
    normalize both to a session-zone TIMESTAMP floored to microseconds, the
    same floor the DuckDB oracle applies casting TIMESTAMP_NS → TIMESTAMP.
    """
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # FLOOR division, not DIV: DIV truncates toward zero, which for
            # a pre-epoch nano value (ts < 0, ts % 1000 != 0) lands one
            # microsecond ABOVE DuckDB's TIMESTAMP_NS → TIMESTAMP floor
            # (r13 review; latent — the corpus is all 2024). pmod keeps the
            # arithmetic in exact longs.
            return df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr("(ts - pmod(ts, 1000)) DIV 1000")
                ),
            )
        if isinstance(ts_type, TimestampNTZType):
            # session tz is UTC everywhere in this engine, so NTZ → LTZ is
            # value-preserving; cast keeps downstream dtypes identical
            # across both reader behaviors
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        if isinstance(ts_type, TimestampType):
            # a reader that disables inferTimestampNTZ scans NANOS straight
            # to session-zone TIMESTAMP, already micros-floored — the target
            # dtype; nothing to normalize
            return df
        # any other dtype means a reader behavior this normalization has
        # never seen: fail loudly rather than silently drift from the oracle
        raise TypeError(
            f"events.ts scanned as unexpected dtype {ts_type}; expected "
            "LongType (legacy nanosAsLong), TimestampNTZType, or TimestampType"
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view so spark.sql() works on the
    same names the DuckDB oracle uses."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

from mysql_hbase_replicator_spark.plans.registry import (  # noqa: F401
    ORACLE_REGISTRY,
    QUERY_REGISTRY,
    query,
)

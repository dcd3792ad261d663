from mysql_hbase_replicator_spark.sources.tables import TABLES, load_table, load_tables  # noqa: F401

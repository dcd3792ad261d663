from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("engine-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture()
def student_struct():
    """The reference's canonical example table (FIXTURES.md B1;
    Mysql2HbaseCliDriver.scala:41-48): composite PK (sn, id)."""
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("sn", T.IntegerType()),
            T.StructField("id", T.IntegerType()),
            T.StructField("score", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("rem", T.StringType()),
        ]
    )


@pytest.fixture()
def student_mapping():
    from mysql_hbase_replicator_spark.catalog.meta import HbaseCollInfo, HbaseTableInfo

    return HbaseTableInfo(
        dbName="mixfs",
        dbTableName="student",
        hbaseTableName="mixfs:student2",
        hbaseNameSpace="mixfs",
        sparkTableName="student2",
        bytesUtils="Binary",
        cols=[
            HbaseCollInfo("sn", "int(11)", "sn", "IntegerType", True),
            HbaseCollInfo("id", "int(11)", "id", "IntegerType", True),
            HbaseCollInfo("score", "int(11)", "score", "IntegerType", False),
            HbaseCollInfo("name", "varchar(10)", "name", "StringType", False),
            HbaseCollInfo("rem", "varchar(2)", "rem", "StringType", False),
        ],
    )


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Alias fixture for property tests (hypothesis wraps the test function,
    so the fixture must be requested under a distinct name per file to keep
    function-scope health checks quiet with a session-scoped session)."""
    return spark

"""Type layer (SURVEY.md §1.3): the MySQL→Spark mapping table, the six-type
restriction, and the faithful-mode reproduction of the reference's matcher
quirks (HbaseTableInfo.scala:146-182)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from mysql_hbase_replicator_spark.functions.types import (
    default_name_mapping,
    mysql_type_to_spark,
    mysql_type_to_spark_name,
    spark_type_from_name,
)

# the documented mapping table (SURVEY.md §1.3), intended semantics
INTENDED = [
    ("bit(1)", "BooleanType"),
    ("bit(5)", "StringType"),
    ("tinyint", "IntegerType"),
    ("tinyint(4)", "IntegerType"),
    ("bool", "BooleanType"),
    ("boolean", "BooleanType"),
    ("smallint unsigned", "IntegerType"),
    ("smallint(6)", "IntegerType"),
    ("mediumint unsigned", "IntegerType"),
    ("mediumint", "IntegerType"),
    ("int(11)", "IntegerType"),
    ("int unsigned", "LongType"),
    ("integer unsigned", "LongType"),
    ("integer", "IntegerType"),
    ("bigint unsigned", "LongType"),
    ("bigint(20)", "LongType"),
    ("float", "FloatType"),
    ("float(7,4)", "FloatType"),
    ("double", "DoubleType"),
    ("double precision", "DoubleType"),
    ("varchar(10)", "StringType"),
    ("text", "StringType"),
    ("datetime", "StringType"),
    ("decimal(10,2)", "StringType"),
    ("enum", "StringType"),
]


@pytest.mark.parametrize("mysql_type,expected", INTENDED)
def test_intended_mapping(mysql_type, expected):
    assert mysql_type_to_spark_name(mysql_type, mode="intended") == expected


def test_faithful_reproduces_reference_quirks():
    """The Scala matcher's anchored-regex bugs, reproduced exactly:
    bit(1) parses as regex group → only 'bit1' matches; tinyint(4) falls to
    the catch-all; integer unsigned is shadowed by int.* (dead code)."""
    f = lambda s: mysql_type_to_spark_name(s, mode="faithful")
    assert f("bit1") == "BooleanType"  # the string the buggy regex actually matches
    assert f("bit(1)") == "StringType"  # real MySQL type falls through
    assert f("tinyint") == "IntegerType"
    assert f("tinyint(4)") == "StringType"  # no .* in the reference's pattern
    assert f("integer unsigned") == "IntegerType"  # int.* shadows the Long branch
    assert f("int(11)") == "IntegerType"
    assert f("bigint unsigned") == "LongType"


def test_native_widening():
    n = lambda s: mysql_type_to_spark_name(s, mode="native")
    assert n("datetime") == "TimestampType"
    assert n("timestamp(6)") == "TimestampType"
    assert n("date") == "DateType"
    assert n("decimal(12,2)") == "DecimalType(12,2)"
    assert n("numeric(5,0)") == "DecimalType(5,0)"
    assert n("blob") == "BinaryType"
    assert n("varbinary(16)") == "BinaryType"
    assert n("year") == "IntegerType"
    assert n("varchar(10)") == "StringType"
    assert mysql_type_to_spark("decimal(12,2)", mode="native") == T.DecimalType(12, 2)


def test_six_type_restriction():
    """The catalog accepts exactly six types and throws the reference's
    message otherwise (HbaseTableInfo.scala:146-156)."""
    assert spark_type_from_name("IntegerType") == T.IntegerType()
    with pytest.raises(ValueError, match="Unsupported HBase SQL Data Type"):
        spark_type_from_name("TimestampType", restrict_to_six=True)
    assert spark_type_from_name("TimestampType", restrict_to_six=False) == T.TimestampType()


def test_default_name_mapping_strips_underscores():
    assert default_name_mapping("user_id") == "userid"
    assert default_name_mapping("a_b_c") == "abc"
    assert default_name_mapping("plain") == "plain"


def test_enum_normalization_edge_cases(spark):
    """P5 / B3.8: enum 0, NULL, negative, and out-of-range → NULL; 1-based
    in-range → label (MongoDBApplier.scala:101-104, mydit issue #9)."""
    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.functions.normalize import (
        bytes_to_utf8,
        decimal_to_double,
        enum_to_string,
    )

    df = spark.createDataFrame(
        [(0,), (1,), (3,), (4,), (-2,), (None,)], "ordinal int"
    )
    labels = ["red", "green", "blue"]
    got = [
        r.label
        for r in df.orderBy(F.col("ordinal").asc_nulls_first())
        .select(enum_to_string(F.col("ordinal"), labels).alias("label"))
        .collect()
    ]
    # nulls first: None, -2, 0 → NULL; 1→red, 3→blue, 4 (out of range) → NULL
    assert got == [None, None, None, "red", "blue", None]

    one = spark.range(1).select(
        decimal_to_double(F.lit("12.3456").cast("decimal(10,4)")).alias("d"),
        bytes_to_utf8(F.encode(F.lit("héllo"), "UTF-8")).alias("s"),
    ).collect()[0]
    assert one.d == 12.3456 and one.s == "héllo"

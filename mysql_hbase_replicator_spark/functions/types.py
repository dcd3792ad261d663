"""MySQL → Spark type mapping (reference HbaseTableInfo.scala:158-182) and
the six-type sink restriction (HbaseTableInfo.scala:146-156).

Three modes:

- ``faithful``: bit-for-bit replication of the reference's Scala matcher,
  *including its bugs*. Scala's ``r\"\"\"...\"\"\"`` patterns are anchored
  full-string regexes tried in order, so:
    * ``case r"bit(1)"`` — ``(1)`` is a capture group; it matches the literal
      string ``bit1``, NOT MySQL's ``bit(1)`` (parens are metachars). Real
      ``bit(1)`` falls through to the StringType catch-all.
    * ``case r"tinyint"`` has no ``.*``: ``tinyint(4)`` doesn't match and
      falls through to the catch-all (``int.*`` is anchored, so the leading
      "tiny" blocks it too).
    * ``case r"int.*"`` precedes ``integer.*unsigned``, so the
      ``integer unsigned → LongType`` branch is dead code; every
      ``integer…`` string maps to IntegerType.
- ``intended``: what the table in the reference clearly means — the mapping
  documented in SURVEY.md §1.3 with the anchoring bugs fixed.
- ``native``: ``intended`` plus Spark-native widening for the types the
  reference collapses to StringType: DATE/DATETIME/TIMESTAMP, DECIMAL(p,s),
  and binary types (SURVEY.md §7 M1).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

SIX_TYPES = {
    "BooleanType": T.BooleanType(),
    "StringType": T.StringType(),
    "IntegerType": T.IntegerType(),
    "LongType": T.LongType(),
    "FloatType": T.FloatType(),
    "DoubleType": T.DoubleType(),
}

# (pattern, type-name) in reference source order; fullmatch semantics.
_FAITHFUL_RULES: list[tuple[str, str]] = [
    (r"bit(1)", "BooleanType"),  # group around 1 → matches "bit1" only
    (r"bit(\d+)", "StringType"),
    (r"tinyint", "IntegerType"),
    (r"bool", "BooleanType"),
    (r"boolean", "BooleanType"),
    (r"smallint.*unsigned", "IntegerType"),
    (r"smallint.*", "IntegerType"),
    (r"mediumint.*unsigned", "IntegerType"),
    (r"mediumint.*", "IntegerType"),
    (r"int.*", "IntegerType"),
    (r"integer.*unsigned", "LongType"),  # dead: shadowed by int.*
    (r"integer.*", "IntegerType"),  # dead: shadowed by int.*
    (r"bigint.*unsigned", "LongType"),
    (r"bigint.*", "LongType"),
    (r"float.*", "FloatType"),
    (r"double.*", "DoubleType"),
]

_INTENDED_RULES: list[tuple[str, str]] = [
    (r"bit\(1\)", "BooleanType"),
    (r"bit(\(\d+\))?", "StringType"),
    (r"bool(ean)?", "BooleanType"),
    # trailing ( zerofill)? everywhere the smallint/mediumint families'
    # `.*` already tolerates it — without it `int(10) unsigned zerofill`
    # fell to the StringType catch-all while `smallint(5) unsigned
    # zerofill` mapped to IntegerType (r13 review: integers silently
    # replicated stringified)
    (r"tinyint(\(\d+\))?( unsigned)?( zerofill)?", "IntegerType"),
    (r"smallint.*unsigned.*", "IntegerType"),
    (r"smallint.*", "IntegerType"),
    (r"mediumint.*unsigned.*", "IntegerType"),
    (r"mediumint.*", "IntegerType"),
    (r"(int|integer)(\(\d+\))? unsigned( zerofill)?", "LongType"),
    (r"(int|integer)(\(\d+\))?( zerofill)?", "IntegerType"),
    (r"bigint.*", "LongType"),  # unsigned bigint kept Long, as the reference does
    (r"float.*", "FloatType"),
    (r"double.*|real.*", "DoubleType"),
]

_NATIVE_EXTRA: list[tuple[str, str]] = [
    (r"date", "DateType"),
    (r"(datetime|timestamp)(\(\d+\))?", "TimestampType"),
    (r"(decimal|numeric)\((\d+)\s*,\s*(\d+)\)", "DecimalType"),
    (r"(decimal|numeric)(\(\d+\))?", "DecimalType(10,0)"),
    (r"year(\(\d+\))?", "IntegerType"),
    (r"(tiny|medium|long)?blob|(var)?binary(\(\d+\))?", "BinaryType"),
]


def mysql_type_to_spark_name(col_type: str, mode: str = "intended") -> str:
    """Map a lowercase MySQL type string to a Spark type name.

    Mirrors ``HbaseCollInfo.getDefaultTypeMapping``
    (reference HbaseTableInfo.scala:158-182); anything unmatched falls to the
    StringType catch-all (line 180), exactly like the reference.
    """
    t = col_type.strip().lower()
    rules = {"faithful": _FAITHFUL_RULES, "intended": _INTENDED_RULES}.get(mode)
    if rules is None and mode == "native":
        rules = _NATIVE_EXTRA + _INTENDED_RULES
    if rules is None:
        raise ValueError(f"unknown mode: {mode}")
    for pattern, name in rules:
        m = re.fullmatch(pattern, t)
        if m:
            if name == "DecimalType":
                return f"DecimalType({m.group(2)},{m.group(3)})"
            return name
    return "StringType"


def spark_type_from_name(name: str, restrict_to_six: bool = True) -> T.DataType:
    """Type-name → DataType. With ``restrict_to_six`` (the reference's
    catalog behavior, HbaseTableInfo.scala:146-156) anything outside the six
    supported types raises the reference's exact error message."""
    if name in SIX_TYPES:
        return SIX_TYPES[name]
    if restrict_to_six:
        raise ValueError("Unsupported HBase SQL Data Type")
    if name == "DateType":
        return T.DateType()
    if name == "TimestampType":
        return T.TimestampType()
    if name == "BinaryType":
        return T.BinaryType()
    m = re.fullmatch(r"DecimalType\((\d+),(\d+)\)", name)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    raise ValueError(f"Unsupported data type: {name}")


def mysql_type_to_spark(col_type: str, mode: str = "intended") -> T.DataType:
    """One-step MySQL type string → Spark DataType."""
    name = mysql_type_to_spark_name(col_type, mode)
    return spark_type_from_name(name, restrict_to_six=(mode != "native"))


def default_name_mapping(col_name: str) -> str:
    """Default sink column name: strip underscores
    (reference HbaseTableInfo.scala:142-144 ``getDefaultNameMapping``)."""
    return col_name.replace("_", "")

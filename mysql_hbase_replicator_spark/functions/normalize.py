"""Value normalization (P5) — the conversions the reference applies per value
(MongoDBApplier.scala:99-119), as vectorized Column expressions:

- enum ordinal → label: 1-based index into the enum's label list; ``id <= 0``
  (MySQL's representation of an invalid/NULL enum) → NULL. This is the fix
  for upstream-mydit issue #9 (CHANGELOG.md:13-14). We additionally null out
  out-of-range ordinals instead of throwing, since a bad ordinal inside a
  100 TB batch must not kill the job.
- decimal → double narrowing ("MongoDB doesn't support BigDecimal",
  MongoDBApplier.scala:107-110). Our engine keeps DecimalType natively;
  the narrowing stays available for reference-parity mode.
- text bytes → UTF-8 string (mydit issue #5, CHANGELOG.md:22-23).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def enum_to_string(ordinal: Column, labels: list[str]) -> Column:
    """MySQL enum ordinal (1-based) → label; <=0, NULL, or out-of-range → NULL."""
    arr = F.array(*[F.lit(x) for x in labels])
    valid = ordinal.isNotNull() & (ordinal >= 1) & (ordinal <= len(labels))
    return F.when(valid, F.element_at(arr, ordinal.cast("int"))).otherwise(
        F.lit(None).cast("string")
    )


def decimal_to_double(c: Column) -> Column:
    """BigDecimal → double narrowing (reference-parity mode only)."""
    return c.cast("double")


def bytes_to_utf8(c: Column) -> Column:
    """TEXT arrives from the binlog as bytes → UTF-8 string."""
    return F.decode(c, "UTF-8")

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


# Whitespace canonicalization for the text/dedup operators. The explicit
# character class (not \s) is deliberate: Java regex \s includes \x0B
# (vertical tab) while DuckDB's RE2 \s does not, so the class is spelled out
# identically for both engines. Runs collapse to one ASCII space, then
# leading/trailing space is trimmed — after this, STRING_SPLIT(text, ' ')
# and the single-space shingle/token regexes are exact on any corpus.
WS_CLASS_RX = r"[ \t\n\r\f]+"


def normalize_ws(text: Column) -> Column:
    """Collapse whitespace runs to single spaces and trim. Pre-pass for
    non-canonical corpora feeding the single-space tokenizers (see
    operators/dedup.py word_shingles CORPUS ASSUMPTION)."""
    return F.trim(F.regexp_replace(text, WS_CLASS_RX, " "))


def normalize_ws_sql(expr: str) -> str:
    """DuckDB twin of :func:`normalize_ws` — same class, global replace."""
    return f"TRIM(REGEXP_REPLACE({expr}, '[ \\t\\n\\r\\f]+', ' ', 'g'))"

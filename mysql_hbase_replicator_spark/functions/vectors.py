"""Vector math over array<float> columns, pure JVM-side (higher-order
functions, no Python). Elements are cast to double before any arithmetic and
accumulated left-to-right, which makes the results bit-identical to a
sequential fold (and hence to the DuckDB oracle's list_sum).

PRECONDITION for the bit-identity claim: non-null elements and equal-length
vectors (the `embeddings` corpus guarantees both). The engines diverge
outside it — a NULL element poisons Spark's fold to NULL while DuckDB's
LIST_SUM skips NULLs; mismatched lengths make zip_with pad with NULL (Spark
→ NULL total) while the oracle's out-of-range index yields a skipped NULL
(→ partial sum). Pipelines over untrusted vectors must filter/pad first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in double, accumulated in array order."""
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def norm_sq(a: Column) -> Column:
    """Σ a[i]^2 in double (squared L2 norm)."""
    squares = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.aggregate(squares, F.lit(0.0), lambda acc, x: acc + x)


def cosine_from_parts(dot_col: Column, norm_sq_a: Column, norm_sq_b: Column) -> Column:
    """cosine = dot / (sqrt(|a|²) * sqrt(|b|²)) — same formula as the oracle."""
    return dot_col / (F.sqrt(norm_sq_a) * F.sqrt(norm_sq_b))


# DuckDB oracle building blocks (kept adjacent so the two stay in sync).
def SQL_DOT(a: str, b: str) -> str:
    return (
        f"LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def SQL_NORM_SQ(a: str) -> str:
    return (
        f"LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)))"
    )

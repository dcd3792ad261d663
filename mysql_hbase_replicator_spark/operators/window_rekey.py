"""Re-keyed window frames for low-cardinality partition keys.

A ``Window.partitionBy(key)`` over a fact table whose key has K distinct
values caps window parallelism at K tasks, each sorting ~1/K of the table —
fine at sf0.1, a scale-killer at 100 TB (the `events` table has 5 event
types; `orders` has 5 priorities). This module re-keys such windows onto
``(key, bucket)`` — a coarse bucket over the ORDER BY dimension — and
stitches bucket boundaries so the result is *bit-identical* to the
single-key window:

- **ROWS frames** (``N PRECEDING .. CURRENT ROW``): the first rows of each
  bucket need up to N preceding rows that live in earlier buckets. We
  compute per-(key, bucket) row counts (a cheap partial-agg groupBy), turn
  them into a tiny carry *spec* — for each destination bucket, which source
  buckets must replicate how many of their trailing rows — entirely with
  DataFrame ops on the metadata-sized counts table (no driver collect),
  then broadcast-join the spec against the trailing rows and union the
  carries in, flagged so they contribute to frames but emit no output row.
  Sparse/empty buckets are handled by construction: the spec walks back as
  many source buckets as needed to cover N rows.

- **RANGE frames** (``V PRECEDING .. CURRENT ROW`` over a numeric order
  column): with bucket width W >= V, a row's frame can only reach into the
  immediately preceding bucket, and only rows in the top V of that bucket's
  value range qualify — so the carry is a single predicate, no counting
  needed. Empty intermediate buckets are irrelevant because RANGE frames
  are defined by value distance, not row adjacency.

Cost model: one extra shuffle of the fact table (the rank-from-end pass for
ROWS; none for RANGE) plus a metadata-sized spec join, in exchange for
window parallelism of #keys x #buckets instead of #keys. Per-row window
state stays bounded (the frame) either way. Bucket width is a tunable: at
100x the data you shrink it; the stitch cost is O(#buckets x frame) carry
rows, independent of bucket size.

The reference has no window surface at all (SURVEY.md SS2.5 — windows are
part of the delegated-SQL family); this operator exists purely for the
100-TB scale story of our added analytics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec

# Helper-column names exposed to callers: after applying window expressions
# over the returned spec, filter ``~F.col(STITCH_CARRY)`` to drop the
# replicated boundary rows (they feed frames; they are not output rows).
STITCH_CARRY = "_stitch_carry"
STITCH_BUCKET = "_stitch_bucket"


def stitched_rows_frame(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    bucket: Column,
    frame_rows: int,
) -> tuple[DataFrame, WindowSpec]:
    """Re-key a ``ROWS BETWEEN frame_rows-1 PRECEDING AND CURRENT ROW``
    window from ``partitionBy(keys)`` onto ``partitionBy(keys + [bucket])``
    with exact boundary stitching.

    ``bucket`` must be a non-decreasing integer function of the ``order_by``
    prefix (e.g. a time bucket when ordering by a timestamp) so that every
    row in an earlier bucket sorts before every row in a later one.

    Returns ``(stitched_df, window_spec)``. Apply window expressions over
    ``window_spec``, then ``.where(~F.col(STITCH_CARRY))`` and drop the
    helper columns. Rows flagged as carries are exact replicas of each
    bucket's trailing rows, present only so the first rows of the next
    bucket see their full frame.
    """
    need = frame_rows - 1
    b = df.withColumn("_sb", bucket)

    # Metadata pass: per-(key, bucket) counts and per-key cumulative counts.
    # The counts table is O(#keys x #buckets) rows — the per-key window over
    # it sorts bucket *counts*, not data.
    counts = b.groupBy(*keys, "_sb").agg(F.count(F.lit(1)).alias("_n"))
    wc = (
        Window.partitionBy(*keys)
        .orderBy("_sb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("_cum", F.sum("_n").over(wc))

    # Carry spec: source bucket s must send its last `_take` rows to
    # destination bucket d when the rows strictly between them (prev_cum(d)
    # - cum(s)) don't already cover the frame. A row with reverse rank r in
    # s sits at global reverse position prev_cum(d) - cum(s) + r before d,
    # so it is needed iff r <= need - (prev_cum(d) - cum(s)).
    src = cum.select(*keys, F.col("_sb").alias("_src"), F.col("_cum").alias("_scum"))
    dst = cum.select(
        *keys, F.col("_sb").alias("_dst"), (F.col("_cum") - F.col("_n")).alias("_pcum")
    )
    spec = (
        src.join(dst, keys)
        .where((F.col("_src") < F.col("_dst")) & (F.col("_scum") > F.col("_pcum") - need))
        .select(
            *keys,
            F.col("_src").alias("_sb"),
            "_dst",
            (F.lit(need) - (F.col("_pcum") - F.col("_scum"))).alias("_take"),
        )
    )

    # Rank rows from the end of their (key, bucket) — fully parallel, then
    # replicate only the needed tails via the broadcast spec.
    wrev = Window.partitionBy(*keys, "_sb").orderBy(*[F.col(c).desc() for c in order_by])
    ranked = b.withColumn("_rev", F.row_number().over(wrev))
    carries = (
        ranked.where(F.col("_rev") <= need)
        .join(F.broadcast(spec), [*keys, "_sb"])
        .where(F.col("_rev") <= F.col("_take"))
        .withColumn(STITCH_BUCKET, F.col("_dst"))
        .withColumn(STITCH_CARRY, F.lit(True))
        .drop("_dst", "_take")
    )
    native = ranked.withColumn(STITCH_BUCKET, F.col("_sb")).withColumn(
        STITCH_CARRY, F.lit(False)
    )
    stitched = native.unionByName(carries).drop("_rev", "_sb")

    w = (
        Window.partitionBy(*keys, STITCH_BUCKET)
        .orderBy(*order_by)
        .rowsBetween(-need, Window.currentRow)
    )
    return stitched, w


def stitched_range_frame(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    bucket_width: int,
    preceding: int,
) -> tuple[DataFrame, WindowSpec]:
    """Re-key a ``RANGE BETWEEN preceding PRECEDING AND CURRENT ROW`` window
    over numeric ``order_col`` onto ``(keys, floor(order_col/bucket_width))``.

    Requires ``bucket_width >= preceding`` so a frame can only reach into
    the immediately preceding bucket: the carry is exactly the rows within
    ``preceding`` of their bucket's upper edge, replicated once. RANGE
    semantics (value distance, peer inclusion) make empty buckets a
    non-issue — correctness does not depend on row adjacency.
    """
    if bucket_width < preceding:
        raise ValueError(
            f"bucket_width ({bucket_width}) must be >= the RANGE width "
            f"({preceding}) so carries never span more than one bucket"
        )
    b = df.withColumn("_sb", F.floor(F.col(order_col) / F.lit(bucket_width)).cast("long"))
    native = b.withColumn(STITCH_BUCKET, F.col("_sb")).withColumn(
        STITCH_CARRY, F.lit(False)
    )
    carries = (
        b.where(
            F.col(order_col)
            >= (F.col("_sb") + 1) * F.lit(bucket_width) - F.lit(preceding)
        )
        .withColumn(STITCH_BUCKET, F.col("_sb") + 1)
        .withColumn(STITCH_CARRY, F.lit(True))
    )
    stitched = native.unionByName(carries).drop("_sb")
    w = (
        Window.partitionBy(*keys, STITCH_BUCKET)
        .orderBy(order_col)
        .rangeBetween(-preceding, Window.currentRow)
    )
    return stitched, w

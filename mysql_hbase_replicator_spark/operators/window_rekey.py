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


def stitched_global_rank(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    value_col: str,
    bucket_width: int,
    descending: bool = False,
    with_ties: bool = False,
) -> DataFrame:
    """Global per-key rank state without a per-key global sort: local ranks
    within (key, value-bucket) plus broadcast cumulative bucket offsets —
    the rank-family sibling of the frame stitches above, for rank /
    row_number / ntile / percent_rank / cume_dist windows whose partition
    key has a handful of values but whose input is a fact table.

    ``value_col`` is the leading (numeric) ORDER BY column; ``order_by``
    is the full ordering (must be total unless ``with_ties``). Buckets are
    ``floor(value/bucket_width)``, so an order-value tie can never span two
    buckets — which is what makes local rank/dense_rank globally correct
    after offsetting. With ``descending``, ordering and bucket accumulation
    both run high-to-low.

    Returns ``df`` with added columns:

    - ``_rn``  — global 1-based row_number (== rank when the ordering is
      total); with ``with_ties`` instead ``_rank`` and ``_dense`` (SQL RANK
      / DENSE_RANK semantics).
    - ``_n``   — per-key total row count (for percent_rank/cume_dist/ntile).

    Cost: one (key, bucket) shuffle of the fact table + two metadata
    aggregations broadcast back. Parallelism #keys x #buckets instead of
    #keys; nothing sorts more than one bucket.
    """
    bucket = F.floor(F.col(value_col) / F.lit(bucket_width)).cast("long")
    b = df.withColumn(STITCH_BUCKET, bucket)

    wloc = Window.partitionBy(*keys, STITCH_BUCKET).orderBy(*order_by)
    if with_ties:
        loc = b.withColumn("_lrank", F.rank().over(wloc)).withColumn(
            "_ldense", F.dense_rank().over(wloc)
        )
    else:
        loc = b.withColumn("_lrn", F.row_number().over(wloc))

    aggs = [F.count(F.lit(1)).alias("_cnt")]
    if with_ties:
        aggs.append(F.count_distinct(F.col(value_col)).alias("_dvals"))
    counts = b.groupBy(*keys, STITCH_BUCKET).agg(*aggs)
    border = F.col(STITCH_BUCKET).desc() if descending else F.col(STITCH_BUCKET).asc()
    wprev = (
        Window.partitionBy(*keys)
        .orderBy(border)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = counts.withColumn("_prev", F.coalesce(F.sum("_cnt").over(wprev), F.lit(0)))
    if with_ties:
        off = off.withColumn(
            "_prev_d", F.coalesce(F.sum("_dvals").over(wprev), F.lit(0))
        )
    totals = counts.groupBy(*keys).agg(F.sum("_cnt").alias("_n"))

    out = loc.join(
        F.broadcast(off.drop("_cnt", *(["_dvals"] if with_ties else []))),
        [*keys, STITCH_BUCKET],
    ).join(F.broadcast(totals), keys)
    if with_ties:
        out = (
            out.withColumn("_rank", F.col("_lrank") + F.col("_prev"))
            .withColumn("_dense", F.col("_ldense") + F.col("_prev_d"))
            .drop("_lrank", "_ldense", "_prev", "_prev_d")
        )
    else:
        out = out.withColumn("_rn", F.col("_lrn") + F.col("_prev")).drop(
            "_lrn", "_prev"
        )
    return out


def adaptive_time_bucket(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    target_rows: int = 8_000,
    min_width_us: int = 3_600_000_000,
) -> Column:
    """Pick the stitch-bucket width from the DATA instead of a constant.

    A fixed 1-day bucket was right at sf0.1 (~670 rows per (key, day)) and
    wrong at sf≈10 (~67k rows per task — the r6 probe measured the two
    day-bucketed events windows at 5.3–6.6× for 10× data because per-task
    sort grew 10× against fixed lanes). One cheap aggregate pass
    (count, min/max ts, approx key cardinality) sizes the bucket so each
    (key, bucket) window task sorts ~``target_rows`` rows:

        width = clamp(span / ceil(n / (n_keys · target_rows)),
                      min_width_us, span)

    The 1-hour floor keeps tiny SFs from fragmenting into carry-dominated
    buckets (the stitch cost is O(#buckets × frame) replicated rows).
    Correctness is bucket-width-independent — the stitch kernels are exact
    for ANY non-decreasing bucket (property-tested bit-identical), so this
    is purely a parallelism/occupancy knob, the same role AQE's target
    partition size plays for shuffles.

    target_rows=8000, from the r17 two-SF sweep (SCALING.md): at both
    sf0.1 (100k events) and sf≈1 (1M events) 8k-row tasks beat the r6 2k
    default on window_count_distinct_rolling (4.48 → 3.28 s at sf≈1) and
    match-or-beat it on events_anomaly_zscore; 32k+ regresses the z-score
    kernel hard at sf≈1 (8.6 s at 128k). The knob stays data-derived —
    the same formula at every scale, nothing tuned to the local core
    count."""
    import math

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.unix_micros(F.col(ts_col))).alias("lo"),
        F.max(F.unix_micros(F.col(ts_col))).alias("hi"),
        F.approx_count_distinct(F.concat_ws("|", *keys)).alias("k"),
    ).first()
    n, lo, hi, n_keys = row["n"], row["lo"], row["hi"], max(1, row["k"] or 1)
    if not n or lo is None or hi is None:
        # empty input, or rows exist but every ts is NULL (lo/hi aggregate
        # to NULL): fall back to the minimum width. NULL-ts rows themselves
        # bucket to NULL (floor(NULL/width)) and group together downstream —
        # callers that must exclude them filter ts IS NOT NULL first.
        width = min_width_us
    else:
        span = max(1, hi - lo + 1)
        want = max(1, math.ceil(n / (n_keys * target_rows)))
        width = max(min_width_us, math.ceil(span / want))
    return F.floor(F.unix_micros(F.col(ts_col)) / F.lit(width))


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL NTILE(k) from a global 1-based row_number and the partition row
    count: the first n % k tiles get ceil(n/k) rows, the rest floor(n/k) —
    the exact assignment every engine implements."""
    q = (n / F.lit(k)).cast("long")  # floor(n/k)
    rem = n - q * F.lit(k)
    big = (q + 1) * rem  # rows covered by the "one extra" tiles
    return (
        F.when(rank <= big, ((rank - 1) / (q + 1)).cast("long") + 1)
        .otherwise(rem + ((rank - 1 - big) / F.greatest(q, F.lit(1))).cast("long") + 1)
        .cast("int")
    )


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


def stitched_prefix_sums(
    df: DataFrame,
    keys: list[str],
    pos_col: str,
    order_cols: list[Column],
    sums: dict[str, Column],
    bucket_width: int,
) -> DataFrame:
    """Global running SUMs per key — ``SUM(expr) OVER (PARTITION BY keys
    ORDER BY pos, order_cols ROWS UNBOUNDED PRECEDING..CURRENT ROW)`` —
    WITHOUT a per-key global sort: local running sums within
    ``(keys, floor(pos/bucket_width))`` plus broadcast cumulative per-bucket
    totals (the running-aggregate sibling of stitched_global_rank).

    This is the prefix-sum backbone of the endpoint-sweep rewrites: a
    growing frame never retracts, so each bucket accumulates locally in one
    pass and the cross-bucket carry is a scalar per (key, bucket) — O(n log
    bucket_rows) total, parallelism #keys × #buckets. Unlike a bounded
    RANGE frame there is no row replication at all.

    ``sums`` maps output-column name → the summed expression (use
    ``F.lit(1)`` for a running count); each appears as ``_cum_<name>``.
    Ties in ``(pos, order_cols)`` are safe only if tied rows' contributions
    are order-independent (e.g. probe rows contributing 0) — the caller
    owns that invariant, same as any ROWS-frame ordering.
    """
    bucket = F.floor(F.col(pos_col) / F.lit(bucket_width)).cast("long")
    b = df.withColumn(STITCH_BUCKET, bucket)
    wloc = (
        Window.partitionBy(*keys, STITCH_BUCKET)
        .orderBy(F.col(pos_col), *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = b
    for name, expr in sums.items():
        loc = loc.withColumn(f"_l_{name}", F.sum(expr).over(wloc))
    totals = b.groupBy(*keys, STITCH_BUCKET).agg(
        *[F.sum(expr).alias(f"_t_{name}") for name, expr in sums.items()]
    )
    wprev = (
        Window.partitionBy(*keys)
        .orderBy(STITCH_BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = totals.select(
        *keys,
        STITCH_BUCKET,
        *[
            F.coalesce(F.sum(f"_t_{name}").over(wprev), F.lit(0)).alias(f"_p_{name}")
            for name in sums
        ],
    )
    out = loc.join(F.broadcast(off), [*keys, STITCH_BUCKET])
    for name in sums:
        out = out.withColumn(f"_cum_{name}", F.col(f"_l_{name}") + F.col(f"_p_{name}"))
        out = out.drop(f"_l_{name}", f"_p_{name}")
    return out.drop(STITCH_BUCKET)

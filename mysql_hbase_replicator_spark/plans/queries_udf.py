"""User-extensible function surface (SURVEY.md §2.9).

The reference has NO user function mechanism — its only scalar computation is
the fixed conversion set (enum decode / utf8 / decimal narrowing,
MongoDBApplier.scala:99-119). The idiomatic PySpark equivalents are exposed
here as first-class, oracle-checked operators:

- scalar ``pandas_udf``      (Arrow-vectorized elementwise; the UDF path)
- grouped-agg ``pandas_udf`` (the UDAF path)
- ``applyInPandas``          (grouped map — the UDTF/custom-operator path)

Numeric determinism: elementwise UDFs are shuffle-order-free by construction;
the grouped paths below only aggregate with order-insensitive exact
operations (integer-valued epoch seconds; medians of 2-decimal money rounded
to 4 decimals, a no-op on true values that kills 1-ulp engine skew), so the
driver's value-hash comparison is stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_hbase_replicator_spark.plans.registry import query
from mysql_hbase_replicator_spark.sources.tables import load_table


def _slug_udf():
    """Arrow-vectorized slugify: lowercase, non-alphanumeric runs → '_'.
    Built lazily — pandas_udf parses its DDL return type against the active
    session, so module import must stay session-free."""

    @F.pandas_udf("string")
    def _slug(s: pd.Series) -> pd.Series:
        return s.str.lower().str.replace(r"[^a-z0-9]+", "_", regex=True).str.strip("_")

    return _slug


@query(
    "udf_pandas_scalar_slug",
    oracle="""
    SELECT o_orderkey,
           TRIM(REGEXP_REPLACE(LOWER(o_orderpriority), '[^a-z0-9]+', '_', 'g'), '_')
             AS priority_slug
    FROM orders
    """,
)
def udf_pandas_scalar_slug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow batches, SPARK-side §2.9): slugify the order
    priority. Elementwise → embarrassingly parallel; the Arrow transfer is
    the only cost over the equivalent built-in expression, which is the
    documented trade for user-supplied Python logic."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", _slug_udf()("o_orderpriority").alias("priority_slug"))


def _median_udaf():
    """Grouped-agg pandas UDF: exact median (numpy) of the group (lazy —
    see _slug_udf)."""

    @F.pandas_udf("double")
    def _median(v: pd.Series) -> float:
        return float(np.median(v))

    return _median


@query(
    "udaf_pandas_median",
    oracle="""
    SELECT o_custkey, ROUND(MEDIAN(o_totalprice), 4) AS median_price
    FROM orders
    WHERE o_custkey % 10 = 0
    GROUP BY o_custkey
    """,
)
def udaf_pandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF path): per-customer median
    order price. One shuffle on the group key; each group is reduced in a
    single Arrow batch. np.median and DuckDB's MEDIAN both average the two
    middle values for even counts; rounding to 4 decimals (no-op on the true
    3-decimal results) removes any last-ulp skew between the engines.

    DELIBERATE EXHIBIT of the per-group-UDAF anti-shape, kept beside the
    scalable form (r15 verdict #5): grouped-agg pandas UDFs pay an Arrow
    batch + pandas reduction PER GROUP, which dominates wall when groups
    are small. The input is capped to every 10th customer so the exhibit
    stays affordable in the suite; `udaf_pandas_median_fast` below computes
    the same statistic over the FULL input with the partition-kernel shape
    — comparable walls at 10× the data IS the measured A/B. Production code
    uses the fast form (or the built-in `agg_median_exact`)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    return o.groupBy("o_custkey").agg(
        F.round(_median_udaf()("o_totalprice"), 4).alias("median_price")
    )


_MEDIAN_SCHEMA = "o_custkey long, median_price double"


def _median_partition(batches):
    """One vectorized pandas groupby-median per PARTITION (same scalable
    grouped-map shape as `_order_gaps_partition` below): the caller
    repartitions ON the key, so groups never span partitions. pandas
    Series.median averages the two middle values for even counts — the
    same rule as np.median and DuckDB MEDIAN; the 4-decimal round is a
    no-op on the true ≤3-decimal results (2-decimal money, possibly
    averaged once)."""
    parts = list(batches)
    if not parts:
        return
    pdf = pd.concat(parts, ignore_index=True)
    if pdf.empty:
        return
    out = (
        pdf.groupby("o_custkey", sort=False)["o_totalprice"]
        .median()
        .round(4)
        .reset_index(name="median_price")
    )
    yield out[["o_custkey", "median_price"]]


@query(
    "udaf_pandas_median_fast",
    oracle="""
    SELECT o_custkey, ROUND(MEDIAN(o_totalprice), 4) AS median_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def udaf_pandas_median_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION shape of the per-customer median (r15 verdict #5, the
    fast half of the A/B with `udaf_pandas_median`): repartition on the
    key + mapInPandas with ONE pandas groupby per partition, over the FULL
    orders table. No per-group Arrow/pandas setup — the same ~100× small-
    group win `udtf_apply_in_pandas_gaps` measured. Median needs no sorted
    input (pandas sorts within the group), so unlike the gaps kernel this
    skips sortWithinPartitions."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return o.repartition("o_custkey").mapInPandas(
        _median_partition, _MEDIAN_SCHEMA
    )


_GAPS_SCHEMA = (
    "o_custkey long, n_orders long, median_gap_s double, max_gap_s double"
)


def _order_gaps_partition(batches):
    """Vectorized per-PARTITION kernel: one pandas groupby over a
    key-partitioned, key-sorted Arrow stream. This is the scalable shape for
    small-group grouped maps — per-group applyInPandas pays an Arrow batch +
    pandas-frame construction per group (~ms each), which at 15k groups/SF0.1
    was 35s; one groupby per partition is ~100× cheaper. Groups never span
    partitions because the caller repartitions ON the key."""
    parts = list(batches)
    if not parts:
        return
    pdf = pd.concat(parts, ignore_index=True)
    if pdf.empty:
        return
    # rows arrive sorted by (o_custkey, o_orderdate, o_orderkey)
    epoch = pdf["o_orderdate"].astype("int64") / 1e9  # exact: midnight stamps
    by = pdf.groupby("o_custkey", sort=False)
    gap = epoch.groupby(pdf["o_custkey"], sort=False).diff()
    out = pd.DataFrame(
        {
            "n_orders": by.size(),
            "median_gap_s": gap.groupby(pdf["o_custkey"], sort=False).median(),
            "max_gap_s": gap.groupby(pdf["o_custkey"], sort=False).max(),
        }
    ).reset_index()
    # single-order customers have no gaps: NaN must surface as SQL NULL
    for c in ("median_gap_s", "max_gap_s"):
        out[c] = out[c].astype(object).where(out[c].notna(), None)
    yield out[["o_custkey", "n_orders", "median_gap_s", "max_gap_s"]]


@query(
    "udtf_apply_in_pandas_gaps",
    oracle="""
    WITH g AS (
        SELECT o_custkey,
               EPOCH(o_orderdate)
                 - LAG(EPOCH(o_orderdate)) OVER (PARTITION BY o_custkey
                                                 ORDER BY o_orderdate, o_orderkey) AS gap
        FROM orders
    )
    SELECT o_custkey, COUNT(*) AS n_orders,
           MEDIAN(gap) AS median_gap_s, MAX(gap) AS max_gap_s
    FROM g
    GROUP BY o_custkey
    """,
)
def udtf_apply_in_pandas_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map custom operator (§2.9): arbitrary per-group Python over
    each customer's order history — per-entity sessionization/resampling
    built-ins can't express. Implemented as the SCALABLE grouped-map shape:
    repartition ON the key + sortWithinPartitions + mapInPandas with one
    vectorized pandas groupby per partition. Semantically identical to
    ``groupBy(key).applyInPandas(...)`` but ~100× faster when groups are
    small (applyInPandas pays per-group Arrow/pandas setup). Gaps are
    integer-valued epoch seconds, so medians (x.0/x.5) are bit-exact in both
    engines with no rounding."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    return (
        o.repartition("o_custkey")
        .sortWithinPartitions("o_custkey", "o_orderdate", "o_orderkey")
        .mapInPandas(_order_gaps_partition, _GAPS_SCHEMA)
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS p50_qty,
           ROUND(QUANTILE_CONT(l_quantity, 0.9), 6) AS p90_qty,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 6) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SQL percentile_cont semantics) per
    return flag — the built-in complement to the UDAF path above. Exact
    percentile sorts within the group; at 100 TB prefer approx_percentile
    (t-digest, merge-able map-side) unless exactness is contractual."""
    l = load_table(spark, sf_dir, "lineitem")
    # one percentile buffer for BOTH l_quantity cuts (r16): the array form
    # sorts each group's quantities once and interpolates both fractions
    # from the same sorted run — two scalar percentile aggs each held and
    # sorted their own copy of every group value. Same interpolation
    # arithmetic, bit-identical output; the l_extendedprice cut keeps its
    # own buffer (different column).
    qty = F.percentile("l_quantity", F.array(F.lit(0.5), F.lit(0.9)))
    return l.groupBy("l_returnflag").agg(
        qty.alias("_qty_pcts"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90_price"),
    ).select(
        "l_returnflag",
        F.round(F.col("_qty_pcts")[0], 6).alias("p50_qty"),
        F.round(F.col("_qty_pcts")[1], 6).alias("p90_qty"),
        "p90_price",
    )

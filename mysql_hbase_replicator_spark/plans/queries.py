"""Relational query surface (SURVEY.md §2.4 joins, §2.5 aggs/windows/sorts/
set ops, §2.6 scalar functions).

The reference implements none of these itself — they are its DELEGATED query
surface: ``map <table>`` registers replicated tables into a Spark SQL catalog
(reference Hbase2CataLog.scala:19-23, Mysql2HbaseCliDriver.scala:81-92) and
all querying is Spark SQL. Here they are first-class, each hash-checked
against a DuckDB oracle.

Determinism conventions (the driver compares order-insensitive value hashes):

- **Float aggregates** never sum raw doubles (shuffle order would change the
  last bits). ``msum`` casts each element to DECIMAL(18,4), sums exactly, and
  casts the exact result back to double — bit-identical to DuckDB doing the
  same.
- **Top-k** always orders by a total order (explicit tiebreak keys).
- **Math funcs** avoid libm-divergent ones (ln/exp/pow differ in last ulp
  across implementations); sqrt is IEEE-correctly-rounded so it's safe.
- ANSI SQL mode (Spark 4 default) stays ON; out-of-bounds element_at etc. are
  guarded explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_hbase_replicator_spark.plans.registry import query
from mysql_hbase_replicator_spark.sources.tables import load_table

DEC = "decimal(25,6)"


def msum(c: Column) -> Column:
    """Exact 'money sum': decimal-exact accumulation, double result.

    Bit-reproducible regardless of partitioning/shuffle order, and equal to
    DuckDB's CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE).

    Scale 6 matters: the inputs are products of up-to-three 2-decimal values,
    i.e. exactly-6-decimal quantities. Casting those to scale 4 puts both
    engines on a decimal *tie* (…50) whose direction depends on their
    double→decimal conversion; at scale 6 the cast is exact and tie-free.
    """
    return F.sum(c.cast(DEC)).cast("double")


def mavg(c: Column) -> Column:
    """Exact-numerator average: decimal sum / count, evaluated in double."""
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def _scaled_long(c: Column) -> Column:
    # per-row exact scale-6 fixed-point: floor(x*1e6 + 0.5) == the integer
    # k with x == k/1e6 whenever x is (the nearest double to) an exactly-
    # 6-decimal quantity AND |x| ≤ 1e9. The bound is where the slack
    # argument actually holds: at |x| ≤ 1e9 the product x*1e6 ≤ 1e15 sits
    # inside double's exact-integer range (2^52 ≈ 4.5e15) with product-
    # rounding error ≤ ~0.25, inside the ±0.5 slack. NEAR the exact-
    # integer ceiling the argument FAILS — at |x| ≈ 9e9 the product's ulp
    # is 2 and ~62% of exact-6-decimal values mis-round (measured), so
    # the previously documented 9e9 domain was unsound. floor() keeps
    # the whole row JVM-side (no per-row BigDecimal allocation, which is
    # what makes the decimal cast ~6x slower).
    return F.floor(c * 1e6 + F.lit(0.5)).cast("long")


def msum_fast(c: Column) -> Column:
    """msum's fast twin: identical result, long-integer accumulation.

    Sums the scale-6 fixed-point representation as int64, then converts
    the ONE final integer back through exact decimal division — so the
    single long→double rounding is the same correctly-rounded step the
    decimal path takes (summing longs then casting avoids per-row
    BigDecimal work; measured 3.0 s → 0.52 s on the Q1 shape at sf0.1).

    Preconditions (assert-by-construction where used): inputs are exactly-
    6-decimal quantities (2-decimal money columns and products of up to
    three of them), per-row |x| ≤ 1e9 (see _scaled_long — the old 9e9
    bound mis-rounds near double's exact-integer ceiling), and EVERY
    group's Σ|x| < 9.2e12 (int64 headroom at scale 6). The group bound is
    per GROUP, so rollup/cube/grand-total shapes that sum the whole table
    exhaust it far earlier than their leaf groups (lineitem money sums
    blow it by ~sf29) — those shapes must use msum, whose exactness does
    not depend on magnitude. Q1's leaf groups were A/B-proven exact at
    sf≈100 (PLANS.md); re-verify the bound per column before any new use
    or scale step — a non-ANSI long SUM wraps SILENTLY on overflow."""
    k = F.sum(_scaled_long(c))
    return (k.cast("decimal(25,0)") / F.lit(1000000).cast("decimal(7,0)")).cast(
        "double"
    )


def mavg_fast(c: Column) -> Column:
    """mavg's fast twin — msum_fast numerator, same final division."""
    k = F.sum(_scaled_long(c))
    return (
        k.cast("decimal(25,0)") / F.lit(1000000).cast("decimal(7,0)")
    ).cast("double") / F.count(c)


def SQL_MSUM(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def SQL_MAVG(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr})"


def ts_str(c: Column) -> Column:
    """Canonical timestamp serialization for OUTPUT columns: fixed-width ISO
    micros string, byte-identical to the oracle's STRFTIME. Emitting strings
    sidesteps any pandas datetime64[ns]-vs-[us] representation skew in the
    driver's value hash; computation upstream stays on native timestamps."""
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")


def SQL_TS(expr: str) -> str:
    return f"STRFTIME({expr}, '%Y-%m-%d %H:%M:%S.%f')"


# --------------------------------------------------------------------------
# Flagship (M0): TPC-H Q3-shaped shipping-priority query.
# customer ⋈ orders ⋈ lineitem with selective filters on both fact scans;
# Catalyst pushes the filters into the parquet scans and AQE picks
# broadcast for the customer side after filtering.
# --------------------------------------------------------------------------
@query(
    "flagship_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {SQL_MSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           {SQL_TS("o.o_orderdate")} AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def flagship_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-06-01").cast("timestamp")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem.filter(F.col("l_shipdate") > cutoff), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(msum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey", "revenue", ts_str(F.col("o_orderdate")).alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# §2.5 Aggregations
# --------------------------------------------------------------------------
@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_MSUM("l_quantity")} AS sum_qty,
           {SQL_MSUM("l_extendedprice")} AS sum_base_price,
           {SQL_MSUM("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
           {SQL_MSUM("(l_extendedprice * (1 - l_discount)) * (1 + l_tax)")} AS sum_charge,
           {SQL_MAVG("l_quantity")} AS avg_qty,
           {SQL_MAVG("l_extendedprice")} AS avg_price,
           {SQL_MAVG("l_discount")} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial (map-side) aggregation + single shuffle on the
    tiny (flag,status) key space; at 100 TB this is the textbook scan-heavy,
    shuffle-light aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # msum_fast: bit-identical to msum on these exactly-6-decimal
            # money columns (hypothesis-tested), 6x cheaper per row
            msum_fast(F.col("l_quantity")).alias("sum_qty"),
            msum_fast(F.col("l_extendedprice")).alias("sum_base_price"),
            msum_fast(disc_price).alias("sum_disc_price"),
            msum_fast(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            mavg_fast(F.col("l_quantity")).alias("avg_qty"),
            mavg_fast(F.col("l_extendedprice")).alias("avg_price"),
            mavg_fast(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("agg_approx_count_distinct")  # no oracle: HLL sketches differ by impl
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). No DuckDB oracle — sketch
    estimates are implementation-specific; driver records rows-only, and
    tests/test_plans.py backstops the estimate to ±5% of the exact count at
    sf0.01 AND sf0.1 (r13 verdict #6). rsd=0.02 sizes the sketch at 2^12
    registers (~4 KB per group — still constant-memory at 100 TB) so the
    one-sigma bound itself sits at 2%; the default 0.05 left the observed
    error at ~5.6% (≈1.1σ), right on top of the gate."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers")
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           {SQL_MSUM("l_extendedprice")} AS sum_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    # Pre-aggregate to the ≤ R×S distinct key pairs BEFORE the rollup
    # Expand (r17, guide §2.2): Spark plans rollup as Expand×3 over the
    # INPUT stream, tripling the rows the hash aggregate consumes. Exact
    # decimal sums and counts re-aggregate associatively, so rolling up the
    # collapsed per-(flag, status) partials is value-identical (oracle-
    # checked) while Expand runs over a handful of rows instead of the
    # fact table. COALESCE matches COUNT(*)'s non-null 0 on empty input.
    #
    # msum semantics preserved, NOT msum_fast: rollup's subtotal and
    # grand-total groups sum the WHOLE table, so the fast path's int64
    # headroom (group Σ|x|·1e6 < 9.2e18) is gone by ~sf29 on
    # l_extendedprice — and a non-ANSI long SUM wraps silently. The
    # decimal re-sum keeps unconditional exactness.
    base = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    return base.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.sum("_s").cast("double").alias("sum_price"),
        F.coalesce(F.sum("_n"), F.lit(0)).alias("n"),
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           {SQL_MSUM("o_totalprice")} AS sum_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # pre-aggregate before the 4-way cube Expand — same exact
    # re-aggregation argument as agg_rollup (r17, guide §2.2)
    base = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    return base.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.sum("_s").cast("double").alias("sum_price"),
        F.coalesce(F.sum("_n"), F.lit(0)).alias("n"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_MSUM("l_quantity")} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("_gs_lineitem")
    # pre-aggregate before the 3-way grouping-sets Expand — same exact
    # re-aggregation argument as agg_rollup (r17, guide §2.2)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(s) AS DOUBLE) AS sum_qty,
               COALESCE(SUM(n), 0) AS n
        FROM (
            SELECT l_returnflag, l_linestatus,
                   SUM(CAST(l_quantity AS DECIMAL(25,6))) AS s,
                   COUNT(*) AS n
            FROM _gs_lineitem
            GROUP BY l_returnflag, l_linestatus
        )
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_having",
    oracle=f"""
    SELECT o_custkey, {SQL_MSUM("o_totalprice")} AS total_spend, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            msum(F.col("o_totalprice")).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("n_orders") >= 3)
    )


# --------------------------------------------------------------------------
# §2.4 Joins
# --------------------------------------------------------------------------
@query(
    "join_inner_equi",
    oracle=f"""
    SELECT n.n_name, COUNT(*) AS n_customers, {SQL_MSUM("c.c_acctbal")} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            msum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@query(
    "join_broadcast_dim",
    oracle=f"""
    SELECT p.p_brand,
           {SQL_MSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dim side — at 100 TB the part dim stays
    ~GBs while lineitem is the 100 TB fact: broadcast-hash avoids shuffling
    the fact table entirely."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            msum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_left_outer_histogram",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def join_left_outer_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join preserving customers with no orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(cu.nk, su.nk) AS nationkey, cu.n_cust, su.n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) cu
    FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) su
      ON cu.nk = su.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cu = c.groupBy(F.col("c_nationkey").alias("c_nk")).agg(F.count(F.lit(1)).alias("n_cust"))
    su = s.groupBy(F.col("s_nationkey").alias("s_nk")).agg(F.count(F.lit(1)).alias("n_supp"))
    return cu.join(su, cu.c_nk == su.s_nk, "full_outer").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_active_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 table-filter shape (reference MySQLExtractor.scala:225-236 keeps
    only mapped tables): semi join = filter by existence, no row multiplication."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active_customers"))
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_inactive
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_nationkey
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no *recent* order — anti join against a filtered fact
    (the date filter keeps the result non-trivial at every scale factor)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT n1.n_name AS nation_a, n2.n_name AS nation_b, n1.n_regionkey AS regionkey
    FROM nation n1
    JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi condition on top of an equi key: Catalyst plans the equi part
    as hash join and applies the range predicate as a post-filter — the
    shape that keeps theta joins tractable at scale."""
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
        & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
    ).select(
        F.col("n1.n_name").alias("nation_a"),
        F.col("n2.n_name").alias("nation_b"),
        F.col("n1.n_regionkey").alias("regionkey"),
    )


@query(
    "join_asof",
    oracle="""
    -- CAST(ts AS TIMESTAMP) floors ns → µs, matching Spark's precision
    SELECT event_id, user_id,
           STRFTIME(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts,
           STRFTIME(LAST_VALUE(CASE WHEN event_type = 'click'
                         THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts
    FROM events
    WHERE event_type IN ('click', 'purchase')
    QUALIFY event_type = 'purchase'
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (CDC point-in-time lookup, SURVEY §2.4): each purchase is
    matched to the user's latest strictly-earlier click. Implemented as the
    scalable union+window form — one shuffle on user_id, no row explosion —
    rather than the naive range self-join."""
    e = load_table(spark, sf_dir, "events")
    both = e.filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        both.withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id",
            ts_str(F.col("ts")).alias("ts"),
            ts_str(F.col("last_click_ts")).alias("last_click_ts"),
        )
    )


# --------------------------------------------------------------------------
# §2.5 Window functions
# --------------------------------------------------------------------------
@query(
    "window_row_number_topn",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_row_number_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           CAST(RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS INT) AS bal_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS INT) AS bal_dense_rank
    FROM supplier
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK with real ties (s_acctbal DESC, no tiebreak).

    Scale shape: ~25 nation keys would cap a plain window at 25 sorts; the
    registered plan uses the stitched global-rank kernel with ties
    (operators/window_rekey.py): per-(nation, acctbal-bucket) local
    rank/dense_rank plus broadcast cumulative row/distinct-value offsets.
    A tie group shares one acctbal, hence one bucket, so local ranks offset
    to the exact global RANK/DENSE_RANK."""
    from mysql_hbase_replicator_spark.operators.window_rekey import (
        stitched_global_rank,
    )

    s = load_table(spark, sf_dir, "supplier")
    r = stitched_global_rank(
        s,
        keys=["s_nationkey"],
        order_by=[F.desc("s_acctbal")],
        value_col="s_acctbal",
        bucket_width=500,
        descending=True,
        with_ties=True,
    )
    return r.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.col("_rank").cast("int").alias("bal_rank"),
        F.col("_dense").cast("int").alias("bal_dense_rank"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value) OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id
                             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_value
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    )


# --------------------------------------------------------------------------
# §2.5 Sorts / top-k
# --------------------------------------------------------------------------
@query(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit → TakeOrderedAndProject: each partition keeps its local
    top-20, only k rows reach the driver — no global sort at any scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# §2.5 Set operations
# --------------------------------------------------------------------------
@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.intersect(o)


@query(
    "setop_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.exceptAll(o).distinct()


@query(
    "setop_drop_duplicates",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def setop_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus").dropDuplicates()


# --------------------------------------------------------------------------
# §2.6 Scalar functions
# --------------------------------------------------------------------------
@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           SUBSTRING(c_name, 10, 9) AS name_digits,
           CONCAT_WS('|', c_mktsegment, c_name) AS seg_name,
           CAST(LENGTH(c_name) AS INT) AS name_len
    FROM customer
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 10, 9).alias("name_digits"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.length("c_name").alias("name_len"),
    )


@query(
    "scalar_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAY(o_orderdate) AS INT) AS order_day,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d %H:%M:%S.%f') AS order_month_start,
           CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch
    FROM orders
    """,
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        ts_str(F.date_trunc("month", "o_orderdate")).alias("order_month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch"
        ),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * 0.5, 1) AS half_price,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           SQRT(l_quantity) AS qty_sqrt,
           l_orderkey % 7 AS key_mod
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 0.5, 1).alias("half_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INT) AS k_value,
           event_type
    FROM events
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the events.props JSON column — the engine-side
    equivalent of the reference's lift-json catalog (HbaseTableInfo.scala:14-17)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        "event_type",
    )


@query(
    "scalar_conditional_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_returnflag = 'R' THEN 'returned'
                WHEN l_linestatus = 'O' THEN 'open'
                ELSE 'closed' END AS status_label,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    """,
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_returnflag") == "R", "returned")
        .when(F.col("l_linestatus") == "O", "open")
        .otherwise("closed")
        .alias("status_label"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    )


@query(
    "scalar_name_mapping",
    oracle="""
    SELECT n_nationkey,
           REPLACE(n_name, '_', '') AS hbase_name,
           CONCAT('testdb', '.', LOWER(n_name)) AS qualified_name
    FROM nation
    """,
)
def scalar_name_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's default column-name mapping strips underscores
    (HbaseTableInfo.scala:142-144) and qualifies tables as db.table
    (TableInfo.scala:61-63) — here as plain string expressions."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.regexp_replace("n_name", "_", "").alias("hbase_name"),
        F.concat(F.lit("testdb"), F.lit("."), F.lower("n_name")).alias("qualified_name"),
    )


@query(
    "scalar_value_normalization",
    oracle="""
    SELECT p_partkey,
           CASE WHEN (p_partkey % 7) BETWEEN 1 AND 5
                THEN ['AMERICA','ASIA','EUROPE','AFRICA','MIDDLE EAST'][CAST(p_partkey % 7 AS INT)]
                ELSE NULL END AS enum_label,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_decimal,
           DECODE(ENCODE(p_name)) AS name_utf8_roundtrip
    FROM part
    """,
)
def scalar_value_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 value normalization (reference MongoDBApplier.scala:99-119) via the
    engine's normalize library: enum ordinal → 1-based label lookup with
    id<=0 / out-of-range → NULL (mydit issue #9), decimal narrowing, and
    UTF-8 byte→string decode (mydit issue #5)."""
    from mysql_hbase_replicator_spark.functions.normalize import (
        bytes_to_utf8,
        decimal_to_double,
        enum_to_string,
    )

    p = load_table(spark, sf_dir, "part")
    labels = ["AMERICA", "ASIA", "EUROPE", "AFRICA", "MIDDLE EAST"]
    return p.select(
        "p_partkey",
        enum_to_string(F.col("p_partkey") % 7, labels).alias("enum_label"),
        decimal_to_double(F.col("p_retailprice").cast("decimal(12,2)")).alias(
            "price_decimal"
        ),
        bytes_to_utf8(F.encode(F.col("p_name"), "UTF-8")).alias("name_utf8_roundtrip"),
    )


@query(
    "agg_rollup_grouping_id",
    oracle=f"""
    SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
           COALESCE(l_linestatus, '(all)') AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
             AS grouping_level,
           COUNT(*) AS n_rows,
           {SQL_MSUM("l_quantity")} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING disambiguation (§2.5): the GROUPING() bitmask
    distinguishes a real NULL group key from a rollup subtotal row — the
    detail COALESCE alone cannot provide when the grouped column is
    nullable. Emitted as the standard grouping_level int
    (2·GROUPING(col1) + GROUPING(col2), 0 = detail row, 3 = grand total),
    the same expression text on both engines. Same pre-aggregated
    rollup plan as agg_rollup (r17, guide §2.2)."""
    l = load_table(spark, sf_dir, "lineitem")
    base = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.coalesce(F.sum("_n"), F.lit(0)).alias("n_rows"),
            F.sum("_s").cast("double").alias("sum_qty"),
            (
                F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
            ).cast("int").alias("grouping_level"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("(all)")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("(all)")).alias("linestatus"),
            "grouping_level",
            "n_rows",
            "sum_qty",
        )
    )


@query(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) columns in one aggregate (§2.5): Spark
    plans this with an Expand node — each input row is replicated once per
    distinct-aggregate branch with a grouping id, so both distinct sets and
    the plain count resolve in a single two-phase aggregate pipeline
    instead of one self-join per distinct column (the classic rewrite this
    shape exists to avoid). Expand multiplies shuffle input by the branch
    count, which is the documented trade against N separate scans — at
    100 TB, 3× one shuffle beats 3 full passes."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )

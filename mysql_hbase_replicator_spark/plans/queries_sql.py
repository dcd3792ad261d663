"""SQL front-end surface (SURVEY.md §2.4/2.5 DELEGATED): the subquery and
multi-join forms a reference user writes as SQL strings against the
replicated tables (reference `Hbase2CataLog.scala:14-23` registers tables
precisely so users can run arbitrary Spark SQL over them).

These queries are deliberately expressed through ``spark.sql(...)`` — not
the DataFrame API — because the operators under test live in the ANALYZER:
EXISTS/IN rewrite to semi/anti joins, NOT IN to a null-aware anti join,
correlated scalar subqueries get decorrelated into aggregates + joins.
DataFrames are passed via parameterized ``{placeholder}`` substitution
(no temp-view registration, so the shared session is never mutated).

The oracle SQL is near-verbatim the same text — the whole point of the
delegated surface is that ANSI SQL means the same thing on both engines.
Float aggregates still go through the decimal-exact msum form (see
plans/queries.py) so value hashes cannot diverge under shuffle order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mysql_hbase_replicator_spark.plans.registry import query
from mysql_hbase_replicator_spark.sources.tables import load_table

# decimal-exact money sum, identical text on both engines (SQL_MSUM twin)
_MSUM = "CAST(SUM(CAST({e} AS DECIMAL(25,6))) AS DOUBLE)"


@query(
    "sql_multiway_join_regional_volume",
    oracle=f"""
    SELECT n.n_name,
           {_MSUM.format(e="l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           COUNT(*) AS n_lineitems
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def sql_multiway_join_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped six-table join: local-supplier revenue per nation in
    one region, where customer and supplier must share a nation. Exercises
    Catalyst's join reordering + AQE broadcast selection across a
    fact-fact-dim chain: region/nation are broadcast, the
    customer⋈orders⋈lineitem⋈supplier chain shuffles on the fact keys only,
    and the region filter prunes before any fact join (check: the nation
    scan feeds a BroadcastExchange)."""
    return spark.sql(
        f"""
        SELECT n.n_name,
               {_MSUM.format(e="l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
               COUNT(*) AS n_lineitems
        FROM {{customer}} c
        JOIN {{orders}} o   ON c.c_custkey = o.o_custkey
        JOIN {{lineitem}} l ON l.l_orderkey = o.o_orderkey
        JOIN {{supplier}} s ON l.l_suppkey = s.s_suppkey
                           AND c.c_nationkey = s.s_nationkey
        JOIN {{nation}} n   ON c.c_nationkey = n.n_nationkey
        JOIN {{region}} r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        """,
        customer=load_table(spark, sf_dir, "customer"),
        orders=load_table(spark, sf_dir, "orders"),
        lineitem=load_table(spark, sf_dir, "lineitem"),
        supplier=load_table(spark, sf_dir, "supplier"),
        nation=load_table(spark, sf_dir, "nation"),
        region=load_table(spark, sf_dir, "region"),
    )


@query(
    "sql_subquery_exists",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    GROUP BY c.c_mktsegment
    """,
)
def sql_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: customers per market segment holding at least one
    open order. The analyzer rewrites the subquery to a left-semi join on
    c_custkey — same physical shape as the DataFrame left_semi query, but
    arriving via SQL decorrelation, which is what a reference user's query
    actually goes through."""
    return spark.sql(
        """
        SELECT c.c_mktsegment, COUNT(*) AS n_customers
        FROM {customer} c
        WHERE EXISTS (SELECT 1 FROM {orders} o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        GROUP BY c.c_mktsegment
        """,
        customer=load_table(spark, sf_dir, "customer"),
        orders=load_table(spark, sf_dir, "orders"),
    )


@query(
    "sql_subquery_not_in",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE c.c_custkey NOT IN (SELECT o.o_custkey FROM orders o
                              WHERE o.o_orderstatus = 'F')
    GROUP BY c.c_mktsegment
    """,
)
def sql_subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery: customers per segment holding no fully-shipped ('F')
    order (non-empty at every test SF, unlike no-orders-at-all). NOT IN
    has three-valued-logic semantics (any NULL in the subquery empties the
    result), so Spark must plan a null-aware anti join rather than a plain
    left_anti — the one subquery form with no direct DataFrame equivalent."""
    return spark.sql(
        """
        SELECT c.c_mktsegment, COUNT(*) AS n_customers
        FROM {customer} c
        WHERE c.c_custkey NOT IN (SELECT o.o_custkey FROM {orders} o
                                  WHERE o.o_orderstatus = 'F')
        GROUP BY c.c_mktsegment
        """,
        customer=load_table(spark, sf_dir, "customer"),
        orders=load_table(spark, sf_dir, "orders"),
    )


@query(
    "sql_subquery_correlated_scalar",
    oracle=f"""
    SELECT p.p_brand,
           {_MSUM.format(e="l.l_extendedprice")} AS small_lot_price,
           COUNT(*) AS n_small_lots
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p.p_brand
    """,
)
def sql_subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated scalar subquery: lineitems whose quantity
    is below 20% of their part's average, summed per brand. The analyzer
    decorrelates the per-part AVG into an aggregate + join on l_partkey —
    the rewrite that makes this run as two shuffles instead of a
    per-row subquery. AVG over l_quantity is exact (integer-valued doubles
    sum exactly in float64 regardless of order), so the 0.2× threshold
    comparison is deterministic on both engines."""
    return spark.sql(
        f"""
        SELECT p.p_brand,
               {_MSUM.format(e="l.l_extendedprice")} AS small_lot_price,
               COUNT(*) AS n_small_lots
        FROM {{lineitem}} l
        JOIN {{part}} p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                              FROM {{lineitem2}} l2
                              WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p.p_brand
        """,
        lineitem=load_table(spark, sf_dir, "lineitem"),
        lineitem2=load_table(spark, sf_dir, "lineitem"),
        part=load_table(spark, sf_dir, "part"),
    )


@query(
    "sql_subquery_scalar_uncorrelated",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_above_avg,
           {_MSUM.format(e="c.c_acctbal")} AS total_balance
    FROM customer c
    WHERE c.c_acctbal > (SELECT {_MSUM.format(e="c2.c_acctbal")} / COUNT(*)
                         FROM customer c2)
    GROUP BY c.c_mktsegment
    """,
)
def sql_subquery_scalar_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: customers above the global average
    account balance, profiled per segment. Plans as a separate aggregate
    stage whose single-row result is broadcast into the filter — no
    per-row re-evaluation. The average is computed as decimal-exact sum /
    count (c_acctbal carries cents; naive double summation would be
    shuffle-order-dependent and could flip boundary rows)."""
    return spark.sql(
        f"""
        SELECT c.c_mktsegment,
               COUNT(*) AS n_above_avg,
               {_MSUM.format(e="c.c_acctbal")} AS total_balance
        FROM {{customer}} c
        WHERE c.c_acctbal > (SELECT {_MSUM.format(e="c2.c_acctbal")} / COUNT(*)
                             FROM {{customer2}} c2)
        GROUP BY c.c_mktsegment
        """,
        customer=load_table(spark, sf_dir, "customer"),
        customer2=load_table(spark, sf_dir, "customer"),
    )


@query(
    "sql_cte_window_top_orders",
    oracle="""
    WITH cust_orders AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    SELECT c.c_custkey, c.c_name,
           co.o_orderkey AS top_orderkey,
           co.o_totalprice AS top_price
    FROM cust_orders co
    JOIN customer c ON co.o_custkey = c.c_custkey
    WHERE co.rn = 1
    """,
)
def sql_cte_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + window function through the SQL text front-end: each customer's
    single most expensive order. The analyzer inlines the CTE, and the
    optimizer pushes rn = 1 into the window as a per-partition top-1
    (WindowGroupLimit in the physical plan — no full sort of every
    customer's orders survives), then joins customer on the already-reduced
    row set. Unique tiebreak (price desc, orderkey) keeps the pick
    deterministic on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return spark.sql(
        """
        WITH cust_orders AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM {orders}
        )
        SELECT c.c_custkey, c.c_name,
               co.o_orderkey AS top_orderkey,
               co.o_totalprice AS top_price
        FROM cust_orders co
        JOIN {customer} c ON co.o_custkey = c.c_custkey
        WHERE co.rn = 1
        """,
        orders=orders,
        customer=customer,
    )

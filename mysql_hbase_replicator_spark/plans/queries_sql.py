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


@query(
    "sql_promo_revenue_share",
    oracle=f"""
    SELECT {_MSUM.format(e="CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
           * 100.0 / {_MSUM.format(e="l.l_extendedprice * (1 - l.l_discount)")} AS promo_share_pct,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01'
    """,
)
def sql_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped conditional-aggregate ratio: the percentage of
    half-year revenue coming from PROMO-type parts. One broadcastable dim
    join (part is 1/300th of lineitem) with the shipdate range pushed into
    the fact scan; the CASE folds into the aggregate so there is exactly one
    shuffle-free partial agg + single-row final. Both numerator and
    denominator are decimal-exact sums, so the double division is
    bit-deterministic on both engines."""
    return spark.sql(
        f"""
        SELECT {_MSUM.format(e="CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
               * 100.0 / {_MSUM.format(e="l.l_extendedprice * (1 - l.l_discount)")} AS promo_share_pct,
               COUNT(*) AS n_lineitems
        FROM {{lineitem}} l
        JOIN {{part}} p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-07-01'
        """,
        lineitem=load_table(spark, sf_dir, "lineitem"),
        part=load_table(spark, sf_dir, "part"),
    )


@query(
    "sql_large_volume_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           {_MSUM.format(e="l.l_quantity")} AS total_qty,
           o.o_totalprice
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l2.l_orderkey FROM lineitem l2
        GROUP BY l2.l_orderkey HAVING SUM(l2.l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def sql_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume-customer query: top-20 orders whose
    total quantity exceeds 250, with the ordering customer. The IN-subquery
    is a groupBy-HAVING over the same fact table — Spark plans it as an
    aggregate + left-semi join; at 100 TB the HAVING reduces lineitem to a
    tiny keyset (0.1-1% of orders) before the 3-way join, and the final
    top-20 is a TakeOrderedAndProject (no global sort materializes).
    Threshold 250 is calibrated to be non-empty at every test SF
    (25 / 204 / 2285 qualifying orders at sf0.001/0.01/0.1)."""
    return spark.sql(
        f"""
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               {_MSUM.format(e="l.l_quantity")} AS total_qty,
               o.o_totalprice
        FROM {{customer}} c
        JOIN {{orders}} o ON c.c_custkey = o.o_custkey
        JOIN {{lineitem}} l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l2.l_orderkey FROM {{lineitem2}} l2
            GROUP BY l2.l_orderkey HAVING SUM(l2.l_quantity) > 250
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
        """,
        customer=load_table(spark, sf_dir, "customer"),
        orders=load_table(spark, sf_dir, "orders"),
        lineitem=load_table(spark, sf_dir, "lineitem"),
        lineitem2=load_table(spark, sf_dir, "lineitem"),
    )


@query(
    "sql_parts_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#9'
      AND l.l_suppkey NOT IN (
          SELECT s.s_suppkey FROM supplier s WHERE s.s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    LIMIT 50
    """,
)
def sql_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier diversity count: distinct suppliers able to
    supply each (brand, size), excluding one brand and all negative-balance
    ("complaint") suppliers via NOT IN. The exclusion subquery is a tiny
    null-aware anti join (s_suppkey is non-null, so it degenerates to a
    broadcast anti join); COUNT(DISTINCT) plans as the two-phase
    partial-distinct expand — at scale the distinct set per (brand,size)
    group is bounded by supplier cardinality, not fact rows. Empty exclusion
    set at sf0.001 (0 negative balances) exercises the empty-subquery edge."""
    return spark.sql(
        """
        SELECT p.p_brand, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM {lineitem} l
        JOIN {part} p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#9'
          AND l.l_suppkey NOT IN (
              SELECT s.s_suppkey FROM {supplier} s WHERE s.s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
        LIMIT 50
        """,
        lineitem=load_table(spark, sf_dir, "lineitem"),
        part=load_table(spark, sf_dir, "part"),
        supplier=load_table(spark, sf_dir, "supplier"),
    )


@query(
    "sql_top_supplier_revenue",
    oracle=f"""
    WITH revenue AS (
        SELECT l.l_suppkey AS supplier_no,
               {_MSUM.format(e="l.l_extendedprice * (1 - l.l_discount)")} AS total_revenue
        FROM lineitem l
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def sql_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: the supplier(s) achieving the maximum
    quarterly revenue, via a CTE referenced twice (once joined, once under a
    scalar MAX subquery). Spark evaluates the CTE as a shared subplan; the
    scalar subquery's single-row result broadcasts into the filter. Revenue
    is decimal-exact so the MAX comparison (double equality!) is safe: both
    sides are the same exact-decimal-rounded value. The reference user
    writes exactly this text against mapped tables."""
    return spark.sql(
        f"""
        WITH revenue AS (
            SELECT l.l_suppkey AS supplier_no,
                   {_MSUM.format(e="l.l_extendedprice * (1 - l.l_discount)")} AS total_revenue
            FROM {{lineitem}} l
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l.l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM {{supplier}} s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
        """,
        lineitem=load_table(spark, sf_dir, "lineitem"),
        supplier=load_table(spark, sf_dir, "supplier"),
    )


@query(
    "sql_returned_top_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {_MSUM.format(e="l.l_extendedprice * (1 - l.l_discount)")} AS returned_revenue,
           COUNT(*) AS n_returned_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY returned_revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def sql_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item ranking: the 20 customers generating
    the most returned ('R') revenue in a year, with their nation. The
    returnflag filter (1/3 selectivity) and the orderdate range push into
    the two fact scans; nation broadcasts; the top-20 is a
    TakeOrderedAndProject over the per-customer aggregate — the global sort
    never materializes, which is what makes a rank-the-customers query
    viable when `customer` itself is billions of rows."""
    return spark.sql(
        f"""
        SELECT c.c_custkey, c.c_name, n.n_name,
               {_MSUM.format(e="l.l_extendedprice * (1 - l.l_discount)")} AS returned_revenue,
               COUNT(*) AS n_returned_items
        FROM {{customer}} c
        JOIN {{orders}} o ON c.c_custkey = o.o_custkey
        JOIN {{lineitem}} l ON o.o_orderkey = l.l_orderkey
        JOIN {{nation}} n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY returned_revenue DESC, c.c_custkey
        LIMIT 20
        """,
        customer=load_table(spark, sf_dir, "customer"),
        orders=load_table(spark, sf_dir, "orders"),
        lineitem=load_table(spark, sf_dir, "lineitem"),
        nation=load_table(spark, sf_dir, "nation"),
    )


@query(
    "sql_order_priority_checking",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_late_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    AND l.l_shipdate > TIMESTAMP '1997-01-01' + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def sql_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped priority check: orders placed in a half-year window
    with at least one lineitem shipped more than 60 days after the order
    date, counted per priority. The correlated EXISTS carries a NON-equi
    conjunct referencing the outer row (l_shipdate > o_orderdate + 60d):
    Spark decorrelates it into a left-semi join whose condition mixes the
    o_orderkey equality (the hash key) with the shipdate inequality (a
    post-join filter) — the equi part keeps it a hash/SMJ semi join, so
    the 100 TB plan is one key-partitioned semi join, not a nested loop.
    Date arithmetic is exact interval math on both engines.

    The redundant static bound `l_shipdate > '1997-01-01' + 60d` is hand-
    propagated constraint transitivity (implied by the correlated
    inequality + the orders window, so the result is provably unchanged —
    oracle carries the same text): Catalyst doesn't derive scan predicates
    through correlations, and without it the EXISTS side scans and
    shuffles the ENTIRE lineitem table — measured 6.2× for ×10 data at
    sf≈1; with the bound pushed to the parquet scan the probe drops to
    ~2× (see SCALING.md)."""
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS n_late_orders
        FROM {orders} o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-07-01'
          AND EXISTS (SELECT 1 FROM {lineitem} l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                        AND l.l_shipdate > TIMESTAMP '1997-01-01' + INTERVAL 60 DAY)
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
        """,
        orders=load_table(spark, sf_dir, "orders"),
        lineitem=load_table(spark, sf_dir, "lineitem"),
    )


@query(
    "sql_discounted_revenue_disjunctive",
    oracle=f"""
    SELECT {_MSUM.format(e="l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           COUNT(*) AS n_matched
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def sql_discounted_revenue_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate join: revenue over three OR'd
    brand/size/quantity bands spanning both tables. The optimizer must
    (1) keep the p_partkey equality as the hash-join key — the OR bands are
    a post-join filter, never a reason to fall back to a nested loop — and
    (2) push the single-table residues down: each disjunct constrains
    p_brand/p_size (part side) and l_quantity (lineitem side), so the
    derived `p_brand IN (...)` / `l_quantity BETWEEN global bounds` prune
    both scans before the join. The plan gate pins the hash join."""
    return spark.sql(
        f"""
        SELECT {_MSUM.format(e="l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
               COUNT(*) AS n_matched
        FROM {{lineitem}} l
        JOIN {{part}} p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity >= 1 AND l.l_quantity <= 20)
           OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity >= 10 AND l.l_quantity <= 30)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity >= 20 AND l.l_quantity <= 40)
        """,
        lineitem=load_table(spark, sf_dir, "lineitem"),
        part=load_table(spark, sf_dir, "part"),
    )


@query(
    "sql_nation_pair_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           {_MSUM.format(e="l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
        OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY ns.n_name, nc.n_name, YEAR(l.l_shipdate)
    """,
)
def sql_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral trade volume: revenue shipped between two
    specific nations (both directions) per year. Six-table join where the
    two nation filters are maximally selective 1-row dims: Catalyst pushes
    each n_name predicate into its broadcast side, which turns the
    supplier/customer joins into semi-filtering broadcast joins (only rows
    belonging to the two nations survive into the fact chain), and the
    disjunctive direction pair becomes a residual on the already-tiny
    result. YEAR() is exact integer extraction on both engines."""
    return spark.sql(
        f"""
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
               {_MSUM.format(e="l.l_extendedprice * (1 - l.l_discount)")} AS revenue
        FROM {{lineitem}} l
        JOIN {{orders}} o   ON o.o_orderkey = l.l_orderkey
        JOIN {{customer}} c ON c.c_custkey = o.o_custkey
        JOIN {{supplier}} s ON s.s_suppkey = l.l_suppkey
        JOIN {{nation}} ns  ON ns.n_nationkey = s.s_nationkey
        JOIN {{nation2}} nc ON nc.n_nationkey = c.c_nationkey
        WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
            OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY ns.n_name, nc.n_name, YEAR(l.l_shipdate)
        """,
        lineitem=load_table(spark, sf_dir, "lineitem"),
        orders=load_table(spark, sf_dir, "orders"),
        customer=load_table(spark, sf_dir, "customer"),
        supplier=load_table(spark, sf_dir, "supplier"),
        nation=load_table(spark, sf_dir, "nation"),
        nation2=load_table(spark, sf_dir, "nation"),
    )


@query(
    "sql_dormant_rich_customers",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_dormant,
           {_MSUM.format(e="c.c_acctbal")} AS dormant_balance
    FROM customer c
    WHERE c.c_acctbal > (SELECT {_MSUM.format(e="c2.c_acctbal")} / COUNT(*)
                         FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def sql_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped dormant-capital query: customers whose balance
    exceeds the average POSITIVE balance but who placed no order since
    1999, profiled per segment. Completes the subquery family: the scalar
    average is a filtered single-row broadcast, and NOT EXISTS (the one
    form not yet registered — EXISTS and null-aware NOT IN are) plans as a
    left-ANTI join on c_custkey with the orderdate predicate pushed into
    the anti side's scan — at 100 TB the anti join probes only the
    since-1999 order keys, not order history."""
    return spark.sql(
        f"""
        SELECT c.c_mktsegment,
               COUNT(*) AS n_dormant,
               {_MSUM.format(e="c.c_acctbal")} AS dormant_balance
        FROM {{customer}} c
        WHERE c.c_acctbal > (SELECT {_MSUM.format(e="c2.c_acctbal")} / COUNT(*)
                             FROM {{customer2}} c2 WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM {{orders}} o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
        """,
        customer=load_table(spark, sf_dir, "customer"),
        customer2=load_table(spark, sf_dir, "customer"),
        orders=load_table(spark, sf_dir, "orders"),
    )


@query(
    "sql_revenue_forecast",
    oracle=f"""
    SELECT {_MSUM.format(e="l_extendedprice * l_discount")} AS forecast_revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def sql_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecasting-revenue-change scan: the canonical
    single-table predicate+aggregate with NO join and NO grouping — the
    purest pushdown probe in the suite. All three predicates (shipdate
    range, discount band, quantity cap) must reach the parquet scan as
    PushedFilters, and the plan is one WholeStageCodegen span over a
    2-column read (extendedprice, discount survive pruning; the filter
    columns are consumed by the scan). At 100 TB this is the query whose
    entire cost IS the scan — a shipdate-partitioned layout (operators/
    layout.py) turns the date range into partition pruning and reads one
    year of files."""
    return spark.sql(
        f"""
        SELECT {_MSUM.format(e="l_extendedprice * l_discount")} AS forecast_revenue,
               COUNT(*) AS n_lineitems
        FROM {{lineitem}}
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """,
        lineitem=load_table(spark, sf_dir, "lineitem"),
    )


@query(
    "sql_national_market_share",
    oracle=f"""
    SELECT CAST(o_year AS INT) AS o_year,
           {_MSUM.format(e="CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END")}
           / {_MSUM.format(e="volume")} AS mkt_share,
           COUNT(*) AS n_lineitems
    FROM (
        SELECT YEAR(o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               ns.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = nc.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    ) all_nations
    GROUP BY o_year
    """,
)
def sql_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped national market share: NATION_7's share of
    ASIA-region customers' STANDARD-part order volume, per order year.
    Eight-table join where every dimension (part after the p_type filter,
    customer→nation→region after the region filter, supplier→nation) is
    broadcast-able and only lineitem⋈orders shuffles — the conditional
    share numerator rides the same aggregate as the denominator, so the
    market-share division touches one row per year. Both sides compute the
    share as a ratio of two decimal-exact sums evaluated once in double
    (no ROUND needed: identical operands, identical division).

    Reference parity: the reference exposes replicated tables to Spark SQL
    precisely for this class of analyst query (Hbase2CataLog.scala:14-23);
    the engine's job is that the SQL text means the same thing here."""
    return spark.sql(
        f"""
        SELECT o_year,
               {_MSUM.format(e="CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END")}
               / {_MSUM.format(e="volume")} AS mkt_share,
               COUNT(*) AS n_lineitems
        FROM (
            SELECT YEAR(o.o_orderdate) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   ns.n_name AS supp_nation
            FROM {{part}} p
            JOIN {{lineitem}} l ON l.l_partkey = p.p_partkey
            JOIN {{orders}} o   ON o.o_orderkey = l.l_orderkey
            JOIN {{customer}} c ON c.c_custkey = o.o_custkey
            JOIN {{nation}} nc  ON nc.n_nationkey = c.c_nationkey
            JOIN {{region}} r   ON r.r_regionkey = nc.n_regionkey
            JOIN {{supplier}} s ON s.s_suppkey = l.l_suppkey
            JOIN {{nation2}} ns ON ns.n_nationkey = s.s_nationkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
              AND o.o_orderdate >= TIMESTAMP '1995-01-01'
              AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        ) all_nations
        GROUP BY o_year
        """,
        part=load_table(spark, sf_dir, "part"),
        lineitem=load_table(spark, sf_dir, "lineitem"),
        orders=load_table(spark, sf_dir, "orders"),
        customer=load_table(spark, sf_dir, "customer"),
        nation=load_table(spark, sf_dir, "nation"),
        region=load_table(spark, sf_dir, "region"),
        supplier=load_table(spark, sf_dir, "supplier"),
        nation2=load_table(spark, sf_dir, "nation"),
    )


@query(
    "sql_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           {_MSUM.format(
               e="l.l_extendedprice * (1 - l.l_discount)"
               " - 0.1 * p.p_retailprice * l.l_quantity"
           )} AS sum_profit
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
    """,
)
def sql_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-type profit: per supplier-nation, per order
    year, the profit on every '%widget%' part — revenue minus a carrying
    cost modeled as 10% of retail price per unit (the test schema has no
    partsupp/ps_supplycost table, so the cost term is drawn from part,
    keeping Q9's join/aggregation shape intact). The LIKE filter prunes
    part before the fact join; nation and supplier broadcast; the only
    shuffle is lineitem⋈orders on orderkey, then the two-key aggregate.
    The infix LIKE stays JVM-side (contains → no regex compilation)."""
    return spark.sql(
        f"""
        SELECT n.n_name AS nation,
               CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
               {_MSUM.format(
                   e="l.l_extendedprice * (1 - l.l_discount)"
                   " - 0.1 * p.p_retailprice * l.l_quantity"
               )} AS sum_profit
        FROM {{part}} p
        JOIN {{lineitem}} l ON l.l_partkey = p.p_partkey
        JOIN {{supplier}} s ON s.s_suppkey = l.l_suppkey
        JOIN {{orders}} o   ON o.o_orderkey = l.l_orderkey
        JOIN {{nation}} n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY n.n_name, YEAR(o.o_orderdate)
        """,
        part=load_table(spark, sf_dir, "part"),
        lineitem=load_table(spark, sf_dir, "lineitem"),
        supplier=load_table(spark, sf_dir, "supplier"),
        orders=load_table(spark, sf_dir, "orders"),
        nation=load_table(spark, sf_dir, "nation"),
    )


@query(
    "sql_avg_yearly_small_qty",
    oracle=f"""
    SELECT {_MSUM.format(e="l.l_extendedprice")} / 7.0 AS avg_yearly,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#9'
      AND l.l_quantity < (
          SELECT 0.2 * (SUM(CAST(l2.l_quantity AS DECIMAL(25,6))) / COUNT(*))
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def sql_avg_yearly_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity-order revenue: average yearly
    revenue lost if Brand#9 orders below 20% of that part's average
    quantity were no longer taken. The correlated scalar subquery over the
    SAME fact table is the stress: Catalyst decorrelates it into a
    per-partkey aggregate joined back to the filtered scan — i.e. ONE
    extra pass over lineitem grouped by partkey, not a per-row re-scan
    (which at 100 TB is the difference between a join and a quadratic
    disaster). The threshold is a decimal-exact average scaled by 0.2, so
    both engines compare against bit-identical thresholds; the brand
    filter prunes part before the join and broadcasts."""
    return spark.sql(
        f"""
        SELECT {_MSUM.format(e="l.l_extendedprice")} / 7.0 AS avg_yearly,
               COUNT(*) AS n_lineitems
        FROM {{lineitem}} l
        JOIN {{part}} p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#9'
          AND l.l_quantity < (
              SELECT 0.2 * (SUM(CAST(l2.l_quantity AS DECIMAL(25,6))) / COUNT(*))
              FROM {{lineitem2}} l2
              WHERE l2.l_partkey = l.l_partkey)
        """,
        lineitem=load_table(spark, sf_dir, "lineitem"),
        part=load_table(spark, sf_dir, "part"),
        lineitem2=load_table(spark, sf_dir, "lineitem"),
    )


@query(
    "sql_sole_failed_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_returnflag = 'R'
      AND o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def sql_sole_failed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped sole-failing-supplier query: in finished
    multi-supplier orders, suppliers whose line came back returned ('R')
    while NO other supplier's line in the same order did — Q21's
    exists/not-exists pair re-keyed to the returnflag (the test lineitem
    has no commit/receipt dates, so 'kept waiting' becomes 'sole return';
    the correlated-subquery shape — same fact table probed twice with a
    <>-correlated predicate — is preserved verbatim). Catalyst plans the
    pair as a semi join then an anti join on l_orderkey, each with the
    suppkey-inequality as a join residual: two orderkey-shuffles of a
    2-column projection of lineitem, no per-row re-scan. Top-20 with
    (numwait DESC, s_name) total-order tiebreak."""
    return spark.sql(
        """
        SELECT s.s_name, COUNT(*) AS numwait
        FROM {supplier} s
        JOIN {lineitem} l1 ON l1.l_suppkey = s.s_suppkey
        JOIN {orders} o    ON o.o_orderkey = l1.l_orderkey
        WHERE l1.l_returnflag = 'R'
          AND o.o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM {lineitem2} l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM {lineitem3} l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
        """,
        supplier=load_table(spark, sf_dir, "supplier"),
        lineitem=load_table(spark, sf_dir, "lineitem"),
        orders=load_table(spark, sf_dir, "orders"),
        lineitem2=load_table(spark, sf_dir, "lineitem"),
        lineitem3=load_table(spark, sf_dir, "lineitem"),
    )

@query(
    "sql_shipmode_priority",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def sql_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped shipping-mode priority query, completing the
    classics to 19 of the 19 expressible without partsupp: count urgent
    vs non-urgent order lines among LATE lines in two shipping classes
    over one receipt year. Re-keyed to this schema exactly like Q21 was:
    shipmode IN ('MAIL','SHIP') becomes returnflag IN ('A','R'),
    and Q12's lateness predicate l_commitdate < l_receiptdate (the test
    lineitem has no commit/receipt dates) becomes shipped ≥60 days after
    the order date — preserving the operative shape: a fact-fact equi
    join on orderkey whose cross-table inequality is a post-join
    residual, under a CASE-conditional dual count riding ONE aggregate.

    Scale: the single-table predicates (returnflag IN-list, shipdate
    year range) are plan-gated onto the lineitem scan as PushedFilters,
    so at 100 TB the join probes one year of two ship classes, not all
    history; both counts share the same shuffle on returnflag. Counts
    are integers, so the oracle comparison is exact by construction.

    Reference parity: analyst SQL over the replicated tables
    (Hbase2CataLog.scala:14-23) — the engine's job is that the same
    ANSI text means the same thing on both engines."""
    return spark.sql(
        """
        SELECT l.l_returnflag AS ship_class,
               SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM {orders} o
        JOIN {lineitem} l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_returnflag IN ('A', 'R')
          AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_returnflag
        ORDER BY l.l_returnflag
        """,
        orders=load_table(spark, sf_dir, "orders"),
        lineitem=load_table(spark, sf_dir, "lineitem"),
    )

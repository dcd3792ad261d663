"""Coverage fill-ins for SURVEY.md §2.5/§2.6 delegated-surface rows not yet
represented one-for-one: multiset EXCEPT ALL, array-function scalars,
min_by/max_by aggregates, and the ntile/percent_rank/cume_dist window family.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql_hbase_replicator_spark.plans.registry import query
from mysql_hbase_replicator_spark.sources.tables import load_table


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT c_custkey AS custkey FROM customer
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): order rows minus one occurrence per
    customer key — duplicates preserved, unlike the set-semantics
    setop_except."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.exceptAll(c)


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS INT) AS dim,
           embedding[1] AS first_val,
           LIST_MAX(embedding) AS max_val,
           LIST_MIN(embedding) AS min_val,
           CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function representatives (§2.6 DELEGATED) over the embedding
    column: size / element_at / array_max / array_min / filter-count. Pure
    selection — no float arithmetic — so values hash-match exactly."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.array_max("embedding").alias("max_val"),
        F.array_min("embedding").alias("min_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "agg_min_max_by",
    oracle="""
    SELECT o_custkey,
           ARG_MAX(o_orderkey, o_totalprice) AS biggest_order,
           ARG_MIN(o_orderkey, o_totalprice) AS smallest_order,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (SQL ARG_MAX/ARG_MIN): the biggest and smallest order
    per customer in one pass — no self-join, no window. (o_custkey,
    o_totalprice) is tie-free in this corpus, so the arg selection is
    deterministic in both engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "window_ntile_percent",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist — the distribution window family.
    The (o_totalprice, o_orderkey) order is total, so bucket assignment is
    deterministic; percent_rank's (rank-1)/(n-1) division is the same IEEE
    op in both engines.

    Scale shape: o_orderstatus has ~3 values, so a plain window would cap
    parallelism at 3 full-partition sorts. The registered plan derives all
    three functions from the stitched global-rank kernel
    (operators/window_rekey.py): local row_number within (status, $10k
    price bucket) + broadcast cumulative offsets gives the global rank r
    and per-key total n, and with a total ordering ntile/percent_rank/
    cume_dist are closed forms of (r, n) — bit-identical to the window
    forms, nothing sorts more than one bucket."""
    from mysql_hbase_replicator_spark.operators.window_rekey import (
        ntile_from_rank,
        stitched_global_rank,
    )

    o = load_table(spark, sf_dir, "orders")
    r = stitched_global_rank(
        o,
        keys=["o_orderstatus"],
        order_by=[F.col("o_totalprice"), F.col("o_orderkey")],
        value_col="o_totalprice",
        bucket_width=10_000,
    )
    rn, n = F.col("_rn"), F.col("_n")
    return r.select(
        "o_orderkey",
        "o_orderstatus",
        ntile_from_rank(rn, n, 4).alias("quartile"),
        # SQL defines percent_rank = 0 for a single-row partition
        F.when(n > 1, (rn - 1).cast("double") / (n - 1).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("pct_rank"),
        (rn.cast("double") / n.cast("double")).alias("cume"),
    )


@query(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive salted equi-join (operators/skew.py): one sampled
    key-histogram pass assigns each oversized lineitem orderkey a salt
    width proportional to its measured share (cold keys width 1 — no
    build replication), then the same aggregate as the plain join — the
    oracle proves salting changes only the shuffle layout, never the
    result. On this data no orderkey exceeds a lane (multiplicity ≤ 7),
    so the plan degenerates to the unreplicated join plus the sampling
    pass — exactly the point: a fixed n_salts=8 replicated orders 8×
    for skew that wasn't there, which the sf≈1 probe measured at 5.23×
    for 10× data (SCALING.md r5). The explicit-salt path complements AQE
    skew splitting for streaming joins and single-dominant-key shapes."""
    from mysql_hbase_replicator_spark.operators.skew import adaptive_salted_join

    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = adaptive_salted_join(
        l, o.withColumnRenamed("o_orderkey", "l_orderkey"), ["l_orderkey"]
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).cast("double").alias("sum_price"),
    )


@query(
    "scalar_from_json_typed",
    oracle="""
    SELECT event_id, CAST(props->>'k' AS INT) AS k_value,
           CAST(props->>'k' AS INT) IS NOT NULL AS has_k
    FROM events
    """,
)
def scalar_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing via from_json (§2.6: the reference round-trips its
    mapping JSON with lift-json, HbaseTableInfo.scala:14-17): events.props
    parsed against an explicit schema into a struct, then projected — the
    schema-on-read path, vs scalar_json_funcs' stringly get_json_object."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_id",
        F.from_json(F.col("props"), "k INT").alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_value"),
        F.col("p.k").isNotNull().alias("has_k"),
    )


@query(
    "agg_variance_corr_exact",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sxy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
           ROUND((n * sxy - sx * sy)
             / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 10) AS corr_qty_price
    FROM s
    """,
)
def agg_variance_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance and Pearson correlation from exact decimal moment sums
    (§2.5 statistical aggregates). Built-in var_samp/corr use streaming
    (Welford-style) updates whose float results depend on shuffle order and
    differ between engines; moment sums in DECIMAL are order-free and exact,
    and both engines then evaluate the IDENTICAL closed-form double
    expression — so the driver's value hash is stable. Same single-shuffle
    map-side-combine shape as any sum-based aggregate at 100 TB."""
    l = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(25,6)")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(q)).cast("double").alias("sx"),
        F.sum(dec(q * q)).cast("double").alias("sxx"),
        F.sum(dec(p)).cast("double").alias("sy"),
        F.sum(dec(p * p)).cast("double").alias("syy"),
        F.sum(dec(q * p)).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    return s.select(
        "l_returnflag",
        "n",
        F.round((sxx - sx * sx / n) / (n - 1), 6).alias("var_qty"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            10,
        ).alias("corr_qty_price"),
    )


@query(
    "window_range_interval",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(25,6)))
                OVER (PARTITION BY user_id
                      ORDER BY CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS trailing_1h_value
    FROM events
    """,
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frame (§2.5): per user, the trailing-1-hour sum of
    value at each event — RANGE frames over epoch seconds, the event-time
    rolling aggregate built-ins give for free. The frame sum is decimal-exact
    so equal-timestamp tie sets (which both engines must include wholesale in
    a RANGE frame) cannot produce order-dependent float drift."""
    from pyspark.sql.window import Window

    from mysql_hbase_replicator_spark.sources.tables import load_table as _lt

    e = _lt(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(25,6)")).over(w).cast("double").alias(
            "trailing_1h_value"
        ),
    )


@query(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS region_a, r2.r_name AS region_b
    FROM region r1 CROSS JOIN region r2
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (§2.4 completeness) — only ever legitimate between
    tiny dimension tables; Spark plans it as a broadcast nested loop."""
    r = load_table(spark, sf_dir, "region")
    return r.select(F.col("r_name").alias("region_a")).crossJoin(
        r.select(F.col("r_name").alias("region_b"))
    )


@query(
    "agg_collect_list_set",
    oracle="""
    SELECT n.n_name,
           ARRAY_TO_STRING(LIST(s.s_name ORDER BY s.s_name), '|') AS supplier_names,
           ARRAY_TO_STRING(LIST(DISTINCT s.s_nationkey ORDER BY s_nationkey), '|') AS nation_keys
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def agg_collect_list_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (§2.5): collect_list/collect_set per group.
    collect_* order is shuffle-dependent by contract, so both are wrapped in
    sort_array — the only deterministic way to expose them — matching the
    oracle's ORDER BY inside LIST()."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_name")), "|").alias(
                "supplier_names"
            ),
            F.array_join(
                F.sort_array(F.collect_set("s_nationkey")).cast("array<string>"), "|"
            ).alias("nation_keys"),
        )
    )


@query(
    "join_null_safe",
    oracle="""
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b
    FROM (SELECT c_custkey, NULLIF(c_nationkey, 3) AS k FROM customer WHERE c_custkey < 50) a
    JOIN (SELECT c_custkey, NULLIF(c_nationkey, 3) AS k FROM customer WHERE c_custkey < 50) b
      ON a.k IS NOT DISTINCT FROM b.k AND a.c_custkey < b.c_custkey
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (§2.4): <=> treats NULL as a joinable value
    (NULL<=>NULL is true), unlike = which drops null keys entirely —
    the semantics needed when the join key legitimately contains nulls."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    side = c.select(
        "c_custkey", F.nullif(F.col("c_nationkey"), F.lit(3)).alias("k")
    )
    a = side.select(F.col("c_custkey").alias("cust_a"), F.col("k").alias("ka"))
    b = side.select(F.col("c_custkey").alias("cust_b"), F.col("k").alias("kb"))
    return a.join(
        b, F.col("ka").eqNullSafe(F.col("kb")) & (F.col("cust_a") < F.col("cust_b"))
    ).select("cust_a", "cust_b")


Q5_SQL = """
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
                    AND c.c_nationkey = s.s_nationkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
"""


@query("sql_local_supplier_volume", oracle=Q5_SQL)
def sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape through the SQL-TEXT entry point: the engine registers
    the replicated tables as views (the post-`map` surface,
    Hbase2CataLog.scala:19-23) and the identical ANSI string runs on both
    Spark and the oracle. Six-table join: Catalyst broadcasts the three dims,
    the fact-fact joins shuffle once each, AQE re-plans from runtime sizes."""
    from mysql_hbase_replicator_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(Q5_SQL)


@query(
    "subquery_above_customer_avg",
    oracle="""
    WITH avgs AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                 / COUNT(o_totalprice) AS avg_price
        FROM orders GROUP BY o_custkey
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o JOIN avgs a ON o.o_custkey = a.o_custkey
    WHERE o.o_totalprice > a.avg_price
    """,
)
def subquery_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (each order vs its own customer's average
    price), decorrelated into the aggregate-then-rejoin plan Catalyst itself
    produces for the correlated SQL form — one shuffle on the correlation
    key. The average is a decimal-exact sum over a double divide, so the
    comparison boundary is identical in both engines."""
    o = load_table(spark, sf_dir, "orders")
    avgs = o.groupBy(F.col("o_custkey").alias("k")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double")
         / F.count("o_totalprice")).alias("avg_price")
    )
    return (
        o.join(avgs, o.o_custkey == avgs.k)
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_extendedprice AS DECIMAL(25,6)) END) AS DOUBLE) AS O,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_extendedprice AS DECIMAL(25,6)) END) AS DOUBLE) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (§2.5): revenue by return flag spread across line-status columns.
    The value list is given explicitly, so the plan is a single pass with
    conditional aggregates — no extra job to discover pivot values (which at
    100 TB would be a full scan before the real one). Oracle uses the
    equivalent portable CASE form."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).cast("double"))
    )


@query(
    "agg_unpivot",
    oracle="""
    SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS value
    FROM supplier
    UNION ALL
    SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS value
    FROM supplier
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (§2.5): wide supplier columns to (key, metric, value)
    long form — the map-only reshape feeding per-metric pipelines. The
    oracle is the portable UNION ALL form."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey"),
    ).unpivot("s_suppkey", ["acctbal", "nationkey"], "metric", "value")


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT c_custkey, NULLIF(c_nationkey, 5) AS k
    FROM customer
    WHERE c_custkey < 200
    ORDER BY k DESC NULLS FIRST, c_custkey
    LIMIT 100
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null placement in sorts (§2.5): DESC NULLS FIRST with a
    total-order tiebreak. Spark's default for DESC is nulls LAST, so the
    explicit desc_nulls_first is semantics, not decoration."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return (
        c.select("c_custkey", F.nullif(F.col("c_nationkey"), F.lit(5)).alias("k"))
        .orderBy(F.col("k").desc_nulls_first(), "c_custkey")
        .limit(100)
    )


@query(
    "scalar_regexp_funcs",
    oracle="""
    SELECT p_partkey,
           REGEXP_EXTRACT(p_type, '([A-Z]+)$', 1) AS last_word,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
           REGEXP_MATCHES(p_type, 'BRUSHED|POLISHED') AS is_finished,
           CAST(LEN(REGEXP_EXTRACT_ALL(p_name, '[a-z]+')) AS INT) AS n_words
    FROM part
    """,
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar representatives (§2.6): extract / global replace / match
    / count-all. Patterns stay inside the Java-regex ∩ RE2 common subset so
    both engines compile them identically; all JVM-side, codegen'd."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_type").rlike("BRUSHED|POLISHED").alias("is_finished"),
        F.regexp_count("p_name", F.lit("[a-z]+")).alias("n_words"),
    )


@query(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 4096 AS with_flag,
           XOR(event_id, user_id) AS mixed,
           event_id * 4 AS shifted
    FROM events
    WHERE event_id < 1000
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar representatives (§2.6): and/or/xor/shift over ids —
    the key-manipulation primitives the rowkey/banding operators build on."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return e.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("mixed"),
        F.shiftleft("event_id", 2).alias("shifted"),
    )


@query(
    "agg_value_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS bucket_min,
           MAX(o_totalprice) AS bucket_max
    FROM orders
    GROUP BY 1
    """,
)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (§2.5): bucket = floor(value / width) — a pure
    map-side expression, so the groupBy shuffles only one row per bucket per
    partition; the distributed histogram shape for data profiling at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("bucket_min"),
        F.max("o_totalprice").alias("bucket_max"),
    )


@query(
    "join_range_binned",
    oracle="""
    WITH c AS (
        SELECT p_partkey, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
        FROM part
    )
    SELECT CAST(GREATEST(a.cents, b.cents) // 100 AS BIGINT) AS bin,
           COUNT(*) AS n_pairs,
           CAST(CAST(SUM(ABS(a.cents - b.cents)) AS DECIMAL(25,6)) / 100
                AS DOUBLE) AS sum_absdiff
    FROM c a
    JOIN c b ON a.p_partkey < b.p_partkey AND ABS(a.cents - b.cents) <= 100
    GROUP BY 1
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance self-join aggregate (all pairs with |price_a − price_b| ≤
    $1, counted and summed per price bin) with NO equi key — the shape
    Catalyst alone can only plan as a nested-loop product.

    The r5 form rewrote it as a bin-exploded EQUI join (probe row → 3
    adjacent tolerance-width bins, exact predicate as post-filter). That
    kills the cartesian product but still MATERIALIZES every qualifying
    pair, and pair count is quadratic in per-bin density: the r6 sf≈10
    probe measured it at 17× for 10× data (3.4 s → 57.8 s at sf≈1; part
    has only 1000 distinct prices, so density grows linearly with SF).

    Because the query only needs per-bin COUNT and SUM(|Δ|) — not the
    pairs — it is computed here with no pair fan-out at all: a sweep over
    the sorted price axis. Prices are exact 2-decimal values, so on an
    integer cents axis each row's qualifying partners are its RANGE frame
    [cents−100, cents]; counting each unordered pair once at its
    later-in-(cents, partkey)-order endpoint gives, per row i,

        n_pairs(i)  = frame_count − peer_count + rank_within_peers − 1
        sum|Δ|(i)   = cents_i·n_pairs(i) − (frame_sum − peers' cents)

    — prefix-sum arithmetic in exact int64 cents. The global RANGE window
    runs re-keyed through operators/window_rekey.stitched_range_frame
    (250-cent buckets ≥ the 100-cent tolerance, boundary rows carried
    once), so parallelism is #buckets, not 1. Cost: O(n log bucket) with
    zero pair materialization — the probe ratio drops from 17× to ~linear.
    The oracle still materializes every pair (DuckDB, sf0.01-sized), in
    the same cents arithmetic, proving the sweep exact; a pair's bin is
    floor(max(price_a, price_b)) — the sweep's assignment point.

    The bin-exploded equi-join rewrite remains the right shape when the
    OUTPUT is the pairs themselves (join_interval_overlap)."""
    from mysql_hbase_replicator_spark.operators.window_rekey import (
        STITCH_CARRY,
        stitched_range_frame,
    )

    TOL, BUCKET = 100, 250  # cents; bucket >= tolerance
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.round(F.col("p_retailprice") * 100).cast("long").alias("cents")
    )
    # peer stats BEFORE stitching (carries would double-count peers)
    wp = Window.partitionBy("cents").orderBy("p_partkey")
    p2 = p.withColumn("_rnk", F.row_number().over(wp)).withColumn(
        "_pcnt", F.count(F.lit(1)).over(Window.partitionBy("cents"))
    )
    stitched, w = stitched_range_frame(p2, [], "cents", BUCKET, TOL)
    framed = stitched.select(
        "*",
        F.count(F.lit(1)).over(w).alias("_fcnt"),
        F.sum("cents").over(w).alias("_fsum"),
    ).where(~F.col(STITCH_CARRY))
    c = F.col("cents")
    n_pairs_i = F.col("_fcnt") - F.col("_pcnt") + F.col("_rnk") - 1
    earlier_sum = (
        F.col("_fsum") - F.col("_pcnt") * c + (F.col("_rnk") - 1) * c
    )
    per_row = framed.select(
        F.floor(c / 100).alias("bin"),
        n_pairs_i.alias("_np"),
        (c * n_pairs_i - earlier_sum).alias("_sd"),
    )
    return (
        per_row.groupBy("bin")
        .agg(
            F.sum("_np").alias("n_pairs"),
            (F.sum("_sd").cast("decimal(25,6)") / 100)
            .cast("double")
            .alias("sum_absdiff"),
        )
        .where(F.col("n_pairs") > 0)
    )


@query(
    "window_cume_dist_first_last",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CUME_DIST() OVER w AS cd,
           FIRST_VALUE(o_orderkey) OVER wf AS cheapest_key,
           LAST_VALUE(o_orderkey) OVER wf AS running_last_key,
           NTH_VALUE(o_orderkey, 2) OVER wf AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
           wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_cume_dist_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + first_value/last_value/nth_value over an explicit running
    frame, completing the window-function family (row_number/rank/lag/ntile/
    percent_rank/range-interval live in sibling queries). The ordering key
    (o_totalprice, o_orderkey) is unique, so cume_dist is an exact rational
    count/total (bit-stable double) and the frame functions are
    deterministic.

    Scale shape: o_orderpriority has 5 values, so instead of 5 full-
    partition sorts the registered plan uses the stitched global-rank
    kernel (operators/window_rekey.py) for the rank behind cume_dist, and
    resolves the running-frame functions in closed form: over
    (UNBOUNDED PRECEDING, CURRENT ROW) first_value is the partition's rank-1
    key, last_value is the current row itself, and nth_value(2) is the
    rank-2 key once rank >= 2 — the two anchor rows per key come from a
    2-rows-per-key filter on the ranked frame, broadcast back. Bit-identical
    to the window forms."""
    from mysql_hbase_replicator_spark.operators.window_rekey import (
        stitched_global_rank,
    )

    o = load_table(spark, sf_dir, "orders")
    r = stitched_global_rank(
        o,
        keys=["o_orderpriority"],
        order_by=[F.col("o_totalprice"), F.col("o_orderkey")],
        value_col="o_totalprice",
        bucket_width=10_000,
    )
    anchors = (
        r.where(F.col("_rn") <= 2)
        .groupBy("o_orderpriority")
        .agg(
            F.min_by("o_orderkey", "_rn").alias("_first_key"),
            F.max_by("o_orderkey", "_rn").alias("_second_key"),
            F.count(F.lit(1)).alias("_n_anchor"),
        )
    )
    rn, n = F.col("_rn"), F.col("_n")
    return r.join(F.broadcast(anchors), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        (rn.cast("double") / n.cast("double")).alias("cd"),
        F.col("_first_key").alias("cheapest_key"),
        F.col("o_orderkey").alias("running_last_key"),
        # rank-1 row's frame has one row -> no 2nd value; single-row keys too
        F.when((rn >= 2) & (F.col("_n_anchor") >= 2), F.col("_second_key"))
        .cast("long")
        .alias("second_key"),
    )


@query(
    "scalar_url_funcs",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
                 || '?lang=' || lang AS url
        FROM documents
    )
    SELECT doc_id, url,
           REGEXP_EXTRACT(url, 'https?://([^/]+)', 1) AS host,
           REGEXP_EXTRACT(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
           REGEXP_EXTRACT(url, '\\?(.*)$', 1) AS query_string,
           REGEXP_EXTRACT(url, '\\?lang=(.*)$', 1) AS lang_param
    FROM u
    """,
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction — provenance/domain columns a web-corpus
    pipeline derives before domain mixing or URL-based dedup. Spark side
    uses the native parse_url (HOST/PATH/QUERY and keyed QUERY lookup, all
    JVM codegen); DuckDB mirrors with regexes over the same synthesized
    URL. Map-only, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_string"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "agg_string_agg",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_suppliers,
           STRING_AGG(s.s_name, ',' ORDER BY s.s_name) AS supplier_csv
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG): collect, sort, join
    — Spark has no ordered string_agg, so the deterministic form is
    array_sort(collect_list()) + array_join, which is also the
    shuffle-order-independent form (collect_list alone is
    partition-order-dependent and would break value hashes). The nation dim
    is broadcast; one shuffle on the group key."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "supplier_csv"
            ),
        )
    )


@query(
    "agg_count_if_bools",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT_IF(l_discount > 0.05) AS BIGINT) AS n_discounted,
           BOOL_AND(l_quantity > 0) AS all_positive_qty,
           BOOL_OR(l_tax > 0.07) AS any_high_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_count_if_bools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate aggregates: count_if / bool_and / bool_or — identical
    names and semantics on both engines (exact comparisons on 2-decimal
    parquet doubles, no float accumulation). Partial-aggregated before the
    single small-key shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH both_ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    nxt AS (
        SELECT event_id, user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                 AS next_purchase_ts
        FROM both_ev
    )
    SELECT event_id, user_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           STRFTIME(next_purchase_ts, '%Y-%m-%d %H:%M:%S.%f') AS next_purchase_ts
    FROM nxt WHERE event_type = 'click'
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each click matched to the user's next
    strictly-later purchase (time-to-convert feeds). The mirror of
    join_asof's backward lookup — same union+window rewrite, frame flipped
    to [1 FOLLOWING, ∞); one shuffle on user_id, no range self-join, no
    row explosion at any scale."""
    from pyspark.sql.window import Window

    from mysql_hbase_replicator_spark.plans.queries import ts_str

    e = load_table(spark, sf_dir, "events")
    both = e.filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    return (
        both.withColumn("next_purchase_ts", F.min(purchase_ts).over(w))
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            ts_str(F.col("ts")).alias("ts"),
            ts_str(F.col("next_purchase_ts")).alias("next_purchase_ts"),
        )
    )


@query(
    "window_range_numeric",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_within_1000,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER w AS DOUBLE)
             AS sum_within_1000
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frame: for each order, how many orders (and how much
    value) in the same priority class fall within $1000 below its price —
    the value-based sibling of the time-interval frame. RANGE peers are
    defined by value, so ties share results regardless of row order; the
    sum is decimal-exact, making the output hash-stable.

    Scale shape: o_orderpriority has 5 values, so the plain partitionBy
    window caps parallelism at 5; the registered plan re-keys on
    (priority, price bucket) via the RANGE stitch kernel
    (operators/window_rekey.py) — rows within $1000 of their bucket's
    upper edge are replicated once into the next bucket, which is
    sufficient because bucket width >= the RANGE width. Bit-identical
    output, parallelism #priorities x #price-buckets.

    Width choice, measured (r6): unlike the ROWS-frame events windows
    (where adaptive_time_bucket bought 25-30% at sf≈10), this query is
    frame-ACCUMULATION-dominated, not sort-dominated — at sf≈10 the $1000
    frame holds ~5.4k rows, so per-row running-aggregate work is the cost
    and a same-session width sweep (2.5k/10k/25k/50k → 16.2/17.7/21.4/
    22.2 s) shows the bucket width is not the lever; narrower only
    increases the carry-duplication fraction (preceding/width). The fixed
    $10k width (1000 buckets at any SF of this price span, 10% carries)
    stays; its 5.6× third-step ratio is the frame density growing 10×
    with the data — inherent to the query's semantics, linear in
    frame-row volume."""
    from mysql_hbase_replicator_spark.operators.window_rekey import (
        STITCH_CARRY,
        stitched_range_frame,
    )

    o = load_table(spark, sf_dir, "orders")
    stitched, w = stitched_range_frame(
        o,
        keys=["o_orderpriority"],
        order_col="o_totalprice",
        bucket_width=10_000,
        preceding=1000,
    )
    return (
        stitched.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.col(STITCH_CARRY),
            F.count(F.lit(1)).over(w).alias("n_within_1000"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .over(w)
            .cast("double")
            .alias("sum_within_1000"),
        )
        .where(~F.col(STITCH_CARRY))
        .drop(STITCH_CARRY)
    )


@query(
    "window_range_numeric_sweep",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_within_1000,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER w AS DOUBLE)
             AS sum_within_1000
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_numeric_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path twin of ``window_range_numeric`` (r6 verdict #6): the SAME
    numeric-RANGE result, computed as a pair-free ENDPOINT SWEEP instead of
    a bounded RANGE frame. The bounded frame is frame-accumulation-bound —
    Spark re-aggregates the sliding buffer, so cost grows with frame-row
    volume and the r6 probe measured 5.6× per 10× data as the $1000 frame
    densified. A running-total frame never retracts, so rewrite the bounded
    frame as a DIFFERENCE OF TWO PREFIX SUMS on the exact integer-cents
    axis:

        n_within(i)  = C(cents ≤ c_i) − C(cents ≤ c_i − 100001)
        sum_within(i) = S(≤ c_i) − S(≤ c_i − 100001)     (cents, int64)

    Each row emits two zero-weight PROBE rows (at its own price and at the
    lower threshold); probes sort AFTER data rows at the same position, so
    a probe's running total is exactly the inclusive prefix at that value —
    RANGE peer semantics (all ties included) fall out for free, with no
    carry replication at all. The prefixes run re-keyed through
    operators/window_rekey.stitched_prefix_sums (per-bucket locals +
    broadcast bucket offsets), so parallelism is #priorities × #price-
    buckets and per-row cost is O(log bucket_rows) regardless of frame
    density — the property the RANGE-frame form lacks. The RANGE form stays
    registered as the API representative; this is the plan to run at
    100 TB. Cents sums stay exact in int64 to ~1.6e14 orders."""
    from mysql_hbase_replicator_spark.operators.window_rekey import (
        stitched_prefix_sums,
    )

    TOL_C = 100_000  # $1000 in cents
    BUCKET_C = 1_000_000  # $10k buckets on the cents axis
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("_c"),
    )
    data = o.select(
        "o_orderpriority",
        F.col("_c").alias("_pos"),
        F.lit(0).alias("_probe"),
        F.lit(1).alias("_cnt"),
        F.col("_c").alias("_sm"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast(dict(o.dtypes)["o_totalprice"]).alias("o_totalprice"),
        F.lit(None).cast("string").alias("_side"),
    )
    probes = o.select(
        "o_orderpriority",
        F.col("_c").alias("_pos"),
        F.lit(1).alias("_probe"),
        F.lit(0).alias("_cnt"),
        F.lit(0).cast("long").alias("_sm"),
        "o_orderkey",
        "o_totalprice",
        F.lit("hi").alias("_side"),
    ).unionByName(
        o.select(
            "o_orderpriority",
            (F.col("_c") - F.lit(TOL_C + 1)).alias("_pos"),
            F.lit(1).alias("_probe"),
            F.lit(0).alias("_cnt"),
            F.lit(0).cast("long").alias("_sm"),
            "o_orderkey",
            "o_totalprice",
            F.lit("lo").alias("_side"),
        )
    )
    pref = stitched_prefix_sums(
        data.unionByName(probes),
        keys=["o_orderpriority"],
        pos_col="_pos",
        order_cols=[F.col("_probe")],  # data before probes at equal value
        sums={"cnt": F.col("_cnt"), "sm": F.col("_sm")},
        bucket_width=BUCKET_C,
    )
    hi_or_lo = lambda side, c: F.max(F.when(F.col("_side") == side, F.col(c)))  # noqa: E731
    return (
        pref.where(F.col("_probe") == 1)
        .groupBy("o_orderkey", "o_orderpriority", "o_totalprice")
        .agg(
            (hi_or_lo("hi", "_cum_cnt") - hi_or_lo("lo", "_cum_cnt")).alias(
                "n_within_1000"
            ),
            (
                (hi_or_lo("hi", "_cum_sm") - hi_or_lo("lo", "_cum_sm"))
                .cast("decimal(25,6)")
                / 100
            )
            .cast("double")
            .alias("sum_within_1000"),
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            "n_within_1000",
            "sum_within_1000",
        )
    )


@query(
    "agg_median_exact",
    oracle="""
    SELECT o_orderpriority,
           MEDIAN(o_totalprice) AS median_price,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median (interpolating between the middle pair on
    even counts — the same (a+b)/2 double arithmetic on both engines, so
    values hash-match). Spark computes it as percentile(0.5): a per-group
    sort, the only O(n log n) aggregate in the surface; at scale the groups
    shard across executors."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("median_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_mode",
    oracle="""
    SELECT o_orderpriority, o_orderstatus AS modal_status, n_rows
    FROM (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_rows,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY COUNT(*) DESC, o_orderstatus) AS rn
        FROM orders
        GROUP BY o_orderpriority, o_orderstatus
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group MODE (most frequent value, smallest value on
    ties) — expressed as count + row_number rather than a MODE() builtin
    precisely so the tie-break is explicit and engine-independent (SQL
    MODE()'s tie choice is implementation-defined).

    Scale shape: one partial-aggregated (group, value) count, then a
    per-group top-1 that plans as WindowGroupLimit — the heavy shuffle is
    over the already-collapsed count table, never the raw rows."""
    o = load_table(spark, sf_dir, "orders")
    cnt = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("n_rows"), "o_orderstatus"
    )
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", F.col("o_orderstatus").alias("modal_status"), "n_rows")
    )


@query(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS wavg_price,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag — the weighted-mean
    aggregate every metrics layer needs. Both the numerator (price×qty) and
    the denominator accumulate as exact decimals (the engine's msum
    contract), so the one double division happens on identical operands in
    both engines regardless of shuffle order.

    Scale shape: single scan, single partial-aggregated shuffle on a
    3-valued key; both sums combine map-side."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        (
            F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(25,6)")).cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double")
        ).alias("wavg_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# as-of tolerance: matches older than this are discarded (pandas
# merge_asof(tolerance=...) semantics) — 30 minutes in microseconds
ASOF_TOLERANCE_US = 30 * 60 * 1_000_000


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH both_ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    prv AS (
        SELECT event_id, user_id, ts, event_type,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS last_click_ts
        FROM both_ev
    )
    SELECT event_id, user_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           STRFTIME(CASE WHEN EPOCH_US(ts) - EPOCH_US(last_click_ts)
                              <= {ASOF_TOLERANCE_US}
                         THEN last_click_ts END,
                    '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts,
           COALESCE(EPOCH_US(ts) - EPOCH_US(last_click_ts)
                      <= {ASOF_TOLERANCE_US}, FALSE) AS matched
    FROM prv WHERE event_type = 'purchase'
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas ``merge_asof(tolerance=)``
    / kdb wj-style): each purchase takes the user's latest strictly-earlier
    click ONLY if it happened within {ASOF_TOLERANCE_US} µs; staler matches
    are nulled, and ``matched`` exposes the hit flag the filter form would
    use. Same scalable union+window shape as join_asof — one (user_id)
    shuffle, no range self-join, no row explosion; the tolerance is a
    map-side predicate on the already-computed neighbor, so it adds zero
    shuffle cost. Gap arithmetic runs in integer microseconds on both
    engines (no float boundary risk)."""
    from mysql_hbase_replicator_spark.plans.queries import ts_str

    e = load_table(spark, sf_dir, "events")
    both = e.filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    last_click = F.last(click_ts, ignorenulls=True).over(w)
    in_tol = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_click_ts"))
    ) <= ASOF_TOLERANCE_US
    return (
        both.withColumn("last_click_ts", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            ts_str(F.col("ts")).alias("ts"),
            ts_str(F.when(in_tol, F.col("last_click_ts"))).alias("last_click_ts"),
            F.coalesce(in_tol, F.lit(False)).alias("matched"),
        )
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH iv AS (
        SELECT user_id,
               CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
               MIN(CAST(ts AS TIMESTAMP)) AS lo,
               MAX(CAST(ts AS TIMESTAMP)) AS hi
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY user_id, d
        HAVING COUNT(*) >= 2
    )
    SELECT STRFTIME(a.d, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_overlapping_pairs,
           CAST(MAX(EPOCH_US(LEAST(a.hi, b.hi)) - EPOCH_US(GREATEST(a.lo, b.lo)))
                AS BIGINT) AS max_overlap_us
    FROM iv a
    JOIN iv b ON a.d = b.d AND a.user_id < b.user_id
             AND a.lo <= b.hi AND b.lo <= a.hi
    GROUP BY a.d
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap statistics: per calendar day, how many pairs of
    users had overlapping purchase-activity intervals (first-to-last
    purchase of the day), and the widest overlap.

    The r5 form was the canonical day-bucketed pair join (equi on day,
    overlap inequality as post-filter): correct, never cartesian, but the
    pair count per day is QUADRATIC in per-day interval density, and the
    r6 sf≈10 probe measured it at 11.2× for 10× data (0.86 → 9.6 s —
    events grow 10× inside the same 30 days, so density, and with it
    pairs, explodes). Because the output is only a per-day COUNT and MAX —
    never the pairs — both are computable by an O(n log n) endpoint sweep:

    - count: overlapping = C(n,2) − disjoint, and a pair is disjoint iff
      one interval ends strictly before the other starts, so disjoint =
      Σ over lo-endpoints of (# hi-endpoints strictly before it) — one
      running sum over the day's 2n sorted endpoints (his sort AFTER los
      at equal value, making the inequality strict, which matches the
      closed-interval overlap test a.lo <= b.hi AND b.lo <= a.hi).
    - max: with intervals sorted by (lo, user), the best partner for b
      among earlier-starting intervals is the one with max hi, so
      max_overlap = max over b of min(running_max_hi, b.hi) − b.lo; the
      running max always corresponds to a real pair and dominates every
      other pair ending at b.

    Both sweeps shuffle once on the day key and sort within day —
    parallelism #days here; at even higher within-day density the sweep
    re-keys on (day, value-bucket) with carried running aggregates, the
    stitched_range_frame pattern. The oracle still materializes every
    pair in DuckDB at sf0.01, proving the sweep exact. Widths are integer
    epoch-micros, so the MAX is exact on both engines. Measured: the
    sf≈10 point drops 9.6 s → ~1 s and the third-step ratio to ~2×."""
    e = load_table(spark, sf_dir, "events")
    iv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d"))
        .agg(
            F.unix_micros(F.min("ts")).alias("lo"),
            F.unix_micros(F.max("ts")).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .drop("n")
    )
    # disjoint-pair count: running count of hi-endpoints before each lo
    ends = iv.select("d", F.col("hi").alias("v"), F.lit(1).alias("is_hi"))
    starts = iv.select("d", F.col("lo").alias("v"), F.lit(0).alias("is_hi"))
    wseq = (
        Window.partitionBy("d")
        .orderBy("v", "is_hi")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    endpoints = starts.unionByName(ends).withColumn(
        "his_before", F.sum("is_hi").over(wseq) - F.col("is_hi")
    )
    disjoint = (
        endpoints.where(F.col("is_hi") == 0)
        .groupBy("d")
        .agg(F.sum("his_before").alias("n_disjoint"), F.count(F.lit(1)).alias("n_iv"))
    )
    # widest overlap: running max(hi) over earlier-starting intervals
    wprev = (
        Window.partitionBy("d")
        .orderBy("lo", "user_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # guard the empty frame explicitly: Spark's least() IGNORES nulls, so
    # least(null_running_max, hi) would silently become hi — a self-pair
    rmax = F.max("hi").over(wprev)
    cand = F.when(rmax.isNotNull(), F.least(rmax, F.col("hi")) - F.col("lo"))
    widest = (
        iv.withColumn("_cand", cand)
        .where(F.col("_cand") >= 0)  # negative/null = no overlapping partner
        .groupBy("d")
        .agg(F.max("_cand").alias("max_overlap_us"))
    )
    # integer C(n,2): float division loses exactness once n_iv*(n_iv-1)
    # exceeds 2^53 (~9.4e7 intervals/day at 100 TB) — DIV stays in longs
    n_pairs = F.expr("n_iv * (n_iv - 1) DIV 2") - F.col("n_disjoint")
    return (
        disjoint.join(widest, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            n_pairs.alias("n_overlapping_pairs"),
            "max_overlap_us",
        )
        .where(F.col("n_overlapping_pairs") > 0)
    )


@query(
    "agg_skew_kurtosis",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s2,
               CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s3,
               CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity
                             AS DECIMAL(25,6))) AS DOUBLE) AS s4
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / (SQRT(s2 / n - (s1 / n) * (s1 / n))
                    * (s2 / n - (s1 / n) * (s1 / n))), 6) AS skewness,
           ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * (s2 / n - (s1 / n) * (s1 / n))) - 3, 6) AS kurtosis_excess
    FROM s
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third/fourth-moment shape statistics (population skewness g1 and
    excess kurtosis g2) per return flag, from exact decimal raw-moment sums
    — the same order-free recipe as agg_variance_corr_exact: built-in
    skewness/kurtosis use streaming central-moment updates whose float
    results are shuffle-order-dependent; raw moments in DECIMAL are exact
    (l_quantity is integer-valued, so q²/q³/q⁴ are exact integers), and
    both engines then evaluate the IDENTICAL closed-form double expression
    (SQRT-based 3/2 power, no libm POWER), rounded to 6 dp. One
    map-side-combined shuffle regardless of corpus size."""
    l = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(25,6)")
    q = F.col("l_quantity")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(q)).cast("double").alias("s1"),
        F.sum(dec(q * q)).cast("double").alias("s2"),
        F.sum(dec(q * q * q)).cast("double").alias("s3"),
        F.sum(dec(q * q * q * q)).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    m = s1 / n
    v = s2 / n - m * m
    m3 = s3 / n - 3 * m * (s2 / n) + 2 * m * m * m
    m4 = s4 / n - 4 * m * (s3 / n) + 6 * m * m * (s2 / n) - 3 * m * m * m * m
    return s.select(
        "l_returnflag",
        "n",
        F.round(m3 / (F.sqrt(v) * v), 6).alias("skewness"),
        F.round(m4 / (v * v) - 3, 6).alias("kurtosis_excess"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH both_ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    nb AS (
        SELECT event_id, user_id, ts, event_type,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_click_ts,
               FIRST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                 AS next_click_ts
        FROM both_ev
    )
    SELECT event_id, user_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           STRFTIME(CASE
               WHEN prev_click_ts IS NOT NULL AND (next_click_ts IS NULL
                    OR EPOCH_US(ts) - EPOCH_US(prev_click_ts)
                       <= EPOCH_US(next_click_ts) - EPOCH_US(ts))
               THEN prev_click_ts ELSE next_click_ts END,
               '%Y-%m-%d %H:%M:%S.%f') AS nearest_click_ts,
           CASE
               WHEN prev_click_ts IS NOT NULL AND (next_click_ts IS NULL
                    OR EPOCH_US(ts) - EPOCH_US(prev_click_ts)
                       <= EPOCH_US(next_click_ts) - EPOCH_US(ts))
               THEN 'backward'
               WHEN next_click_ts IS NOT NULL THEN 'forward'
           END AS direction
    FROM nb WHERE event_type = 'purchase'
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof(direction=
    'nearest')``): each purchase takes the user's click closest in time —
    the latest earlier click or the earliest later one, whichever gap is
    smaller, ties to backward. Completes the as-of family (backward /
    forward / tolerance / nearest) with the same scalable shape: the union
    stream carries BOTH candidate neighbors through one (user_id)-sorted
    window pass (LAST over preceding + FIRST over following share the sort),
    and the nearest choice is a map-side comparison of two integer-µs gaps
    — no range self-join, no row explosion, exact on both engines."""
    from mysql_hbase_replicator_spark.plans.queries import ts_str

    e = load_table(spark, sf_dir, "events")
    both = e.filter(F.col("event_type").isin("click", "purchase"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    prev_c = F.last(click_ts, ignorenulls=True).over(wb)
    next_c = F.first(click_ts, ignorenulls=True).over(wf)
    nb = both.withColumn("prev_click_ts", prev_c).withColumn("next_click_ts", next_c)
    back_wins = F.col("prev_click_ts").isNotNull() & (
        F.col("next_click_ts").isNull()
        | (
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_click_ts")))
            <= (F.unix_micros(F.col("next_click_ts")) - F.unix_micros(F.col("ts")))
        )
    )
    nearest = F.when(back_wins, F.col("prev_click_ts")).otherwise(
        F.col("next_click_ts")
    )
    direction = F.when(back_wins, "backward").when(
        F.col("next_click_ts").isNotNull(), "forward"
    )
    return (
        nb.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            ts_str(F.col("ts")).alias("ts"),
            ts_str(nearest).alias("nearest_click_ts"),
            direction.alias("direction"),
        )
    )


@query(
    "agg_share_of_parent",
    oracle=f"""
    WITH rn AS (
        SELECT r.r_name, n.n_name,
               CAST(SUM(CAST(s.s_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS nation_balance,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT r_name, n_name, nation_balance, n_suppliers,
           nation_balance
             / CAST(SUM(CAST(nation_balance AS DECIMAL(25,6)))
                    OVER (PARTITION BY r_name) AS DOUBLE)
             AS share_of_region
    FROM rn
    """,
)
def agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent hierarchy metric: each nation's supplier balance as a
    fraction of its region's total — the percent-of-parent column every
    OLAP drill-down shows next to the absolute value. The parent total is a
    window SUM over the child aggregate, NOT a second rollup + join: one
    fact shuffle (the groupBy), then a window over the #nations-row
    aggregate partitioned by region — bounded by the dim hierarchy, never
    by the fact table. Sums are decimal-exact, so the share division runs
    on identical operands in both engines (the parent window SUM
    re-casts the exact-decimal children back to DECIMAL before summing, so
    the share division runs on identical operands in both engines
    regardless of partition row order)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("s_acctbal").cast("decimal(25,6)"))
            .cast("double")
            .alias("nation_balance"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )
    w = Window.partitionBy("r_name")
    return rn.select(
        "r_name",
        "n_name",
        "nation_balance",
        "n_suppliers",
        (
            F.col("nation_balance")
            / F.sum(F.col("nation_balance").cast("decimal(25,6)"))
            .over(w)
            .cast("double")
        ).alias("share_of_region"),
    )


@query(
    "scalar_date_arith_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
                AS INT) AS days_to_y2k,
           STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d')
             AS plus_3_months,
           STRFTIME(LAST_DAY(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS month_end,
           STRFTIME(DATE_TRUNC('quarter', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS quarter_start,
           CAST(DAYOFWEEK(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
           CAST(WEEKOFYEAR(CAST(o_orderdate AS DATE)) AS INT) AS week_iso
    FROM orders
    WHERE o_orderkey % 97 = 0
    """,
)
def scalar_date_arith_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-arithmetic scalar family (§2.6): day differences, calendar-aware
    month addition (clamping at month ends), LAST_DAY, quarter truncation,
    day-of-week and ISO week — the functions CDC consumers use to bucket
    replicated order history. All results are integers or formatted date
    strings, so cross-engine float drift cannot exist; the only semantic
    trap is DAYOFWEEK's convention — Spark is 1=Sunday..7=Saturday, DuckDB
    0=Sunday..6=Saturday, so the oracle adds 1; ISO weeks via WEEKOFYEAR
    match ISO-8601 on both, and both engines clamp month-end in
    add_months/+INTERVAL MONTH. The modulo sample keeps the result set
    small without a sort."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3_months"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias(
            "quarter_start"
        ),
        F.dayofweek(d).alias("dow"),
        F.weekofyear(d).alias("week_iso"),
    )


@query(
    "agg_bool_and_or",
    oracle="""
    SELECT l_returnflag,
           BOOL_AND(l_discount < 0.1) AS all_low_discount,
           BOOL_OR(l_quantity >= 49) AS any_bulk,
           CAST(SUM(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tax_free
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_bool_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean quantifier aggregates (§2.5 EVERY/ANY): per return flag, do
    ALL lineitems carry a sub-10% discount, does ANY order a near-max
    quantity, and how many are tax-free. bool_and/bool_or fold map-side
    like any other partial aggregate (a single false/true short-circuits a
    partition's partial), and the comparisons are exact (2-decimal doubles
    against exact literals)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_discount") < 0.1).alias("all_low_discount"),
        F.bool_or(F.col("l_quantity") >= 49).alias("any_bulk"),
        F.sum(F.when(F.col("l_tax") == 0, 1).otherwise(0)).alias("n_tax_free"),
    )


@query(
    "scalar_pad_translate_funcs",
    oracle="""
    SELECT s_suppkey,
           LPAD(CAST(s_suppkey AS VARCHAR), 10, '0') AS padded_key,
           RPAD(s_name, 25, '.') AS padded_name,
           TRANSLATE(s_name, '#0', '_O') AS translated,
           REVERSE(s_name) AS reversed,
           REPEAT('-', CAST(s_suppkey % 5 AS INT)) AS bar
    FROM supplier
    WHERE s_suppkey % 13 = 0
    """,
)
def scalar_pad_translate_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width formatting scalar family (§2.6): zero-padded keys
    (LPAD — the rowkey-formatting idiom the reference's composite-key
    encoding motivates), RPAD column alignment, character-set TRANSLATE,
    REVERSE, and data-driven REPEAT. Pure map-side string ops, exact on
    both engines; the modulo sample bounds the output without a sort."""
    s = load_table(spark, sf_dir, "supplier")
    return s.filter(F.col("s_suppkey") % 13 == 0).select(
        "s_suppkey",
        F.lpad(F.col("s_suppkey").cast("string"), 10, "0").alias("padded_key"),
        F.rpad(F.col("s_name"), 25, ".").alias("padded_name"),
        F.translate(F.col("s_name"), "#0", "_O").alias("translated"),
        F.reverse(F.col("s_name")).alias("reversed"),
        F.repeat(F.lit("-"), (F.col("s_suppkey") % 5).cast("int")).alias("bar"),
    )


def _volume_bucket_count(
    *paths: str, target_bucket_bytes: int = 128 << 20, floor: int = 8
) -> int:
    """Bucket count for the co-located fact layout, derived from input
    volume: enough buckets that a bucket's share of the LARGEST table
    sorts in ~``target_bucket_bytes`` of compressed input, rounded up to
    a power of two (bucket joins need equal counts on both sides, and
    powers of two re-split cleanly if a deployment later rescales), with
    a floor that keeps test SFs on the historical 8 (identical plans at
    sf≤10 — the formula only moves at probe/production volumes, same
    philosophy as session.volume_tuned_partitions). A bucketed read is
    one task per bucket, so at sf≈100 (13 GB lineitem) 8 buckets would
    sort 1.6 GB per task through one core each — the count must track
    volume for the layout to stay a win at 100 TB (there: thousands).

    The 128 MB target deliberately equals the shuffle-partition rule's
    TARGET_SHUFFLE_PARTITION_BYTES: both size one task's sort input to
    the same per-task execution-memory budget. The sf≈100 probe measured
    the mismatch — at 256 MB/bucket (64 buckets) the warm bucketed-join
    reps spilled ~13 GB/run because each task sorted ~1 GB decompressed;
    at 128 MB/bucket the sort fits and the spill is zero (SCALING.md
    r11)."""

    def _bytes(p: str) -> int:
        if os.path.isdir(p):
            total = 0
            for r, _dirs, files in os.walk(p):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(r, f))
                    except OSError:
                        pass
            return total
        try:
            return os.path.getsize(p)
        except OSError:
            return 0

    largest = max((_bytes(p) for p in paths), default=0)
    n = floor
    while n * target_bucket_bytes < largest:
        n *= 2
    return n


def materialize_bucketed_facts(spark: SparkSession, sf_dir: str):
    """Write orders + lineitem bucketed (volume-derived count, floor 8)
    and sorted by orderkey into a
    scratch warehouse keyed by (application, sf_dir), register them in the
    session catalog, and return the two bucketed reads. Idempotent AND
    fingerprint-cached per (session, sf_dir): the first call pays the
    layout write; every later call in the same app returns the registered
    tables directly when the source fingerprint still matches (r11 — the
    sf≈10 probe showed the per-call DROP+rewrite costing more than the
    exchange it saves: 22.0 s vs the plain join's 16.3 s, with the rebuild
    ~15 s of it; 'pay layout once, join forever' requires the ONCE). A
    stale or missing marker — regenerated source, crashed previous write —
    falls back to the DROP + overwrite path, so a replayed call never
    reads a half-written layout. The applicationId in the key keeps
    CONCURRENT sessions (two bench runs, pytest workers, two users on one
    box) from overwriting each other's live layout mid-scan. Scratch
    lives for the app's lifetime, like any Spark scratch dir; a
    production deployment writes the bucketed layout to a REAL warehouse
    path once, not per session (that is the whole point of the trade).
    Every orderkey join on the returned frames is exchange-free.

    Lifecycle (ADVICE r10): per-app scratch is reclaimed, not leaked — an
    atexit hook removes this process's root on exit, each root carries an
    ``_owner.pid`` marker, and every call reaps sibling roots whose owning
    process is gone (crashed sessions' multi-GB layouts would otherwise
    accumulate under /tmp forever). Roots are keyed by (app, sf_dir), so
    one process materializing for TWO sf_dirs (bench: warmup at sf0.001,
    measure at sf0.1) sees its own earlier root as a live-owner sibling —
    the reaper must keep it (regression: test_plans.py two-sf_dir reap)."""
    import hashlib

    from mysql_hbase_replicator_spark.operators.layout import _fingerprint

    app = spark.sparkContext.applicationId.replace("-", "_")
    key = hashlib.md5(
        f"{app}:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:10]
    root = f"/tmp/spark_graft_bucketed_{key}"
    _register_scratch_cleanup(root)
    _reap_dead_scratch_roots(keep=root)
    names = {
        tbl: f"spark_graft_bkt_{tbl}_{key}" for tbl in ("orders", "lineitem")
    }
    n_buckets = _volume_bucket_count(
        os.path.join(sf_dir, "orders.parquet"),
        os.path.join(sf_dir, "lineitem.parquet"),
    )
    want = f"buckets={n_buckets}\n--\n" + "\n--\n".join(
        _fingerprint(os.path.join(sf_dir, f"{tbl}.parquet"))
        for tbl in ("orders", "lineitem")
    )
    marker = os.path.join(root, "_fingerprint")
    try:
        with open(marker) as f:
            cached = f.read() == want
    except OSError:
        cached = False
    if cached and all(spark.catalog.tableExists(n) for n in names.values()):
        return spark.table(names["orders"]), spark.table(names["lineitem"])
    # (re)build: marker removed FIRST so a crash mid-write leaves an
    # invalid cache, never a valid marker over half-written tables
    try:
        os.remove(marker)
    except OSError:
        pass
    # owner marker BEFORE the (possibly >1h at production volumes) table
    # writes: a concurrent session's reaper deletes UNMARKED roots older
    # than an hour by mtime, which would rmtree a live long build
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "_owner.pid"), "w") as f:
        f.write(str(os.getpid()))
    for tbl, bucket_col in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        path = os.path.join(root, tbl)
        spark.sql(f"DROP TABLE IF EXISTS {names[tbl]}")
        (
            load_table(spark, sf_dir, tbl)
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .option("path", path)
            .saveAsTable(names[tbl])
        )
    with open(marker, "w") as f:
        f.write(want)
    return spark.table(names["orders"]), spark.table(names["lineitem"])


def fingerprint_cached_root(
    spark,
    sf_dir: str,
    tag: str,
    sources: tuple[str, ...],
    exists,
    build,
) -> str:
    """ONE definition of the fingerprint-marker scratch-cache protocol
    (r16 review: it had grown three drifting inline copies): a
    per-(app, sf_dir, tag) /tmp root under the shared
    ``spark_graft_bucketed_`` prefix (atexit cleanup + dead-pid reaping),
    rebuilt via ``build(root)`` whenever the fingerprint of ANY source
    parquet changes or ``exists(root)`` is False. Crash-safety order:
    marker removed BEFORE the rebuild (a crashed build leaves an invalid
    cache, never a valid marker over half-built artifacts) and the
    ``_owner.pid`` marker lands before the build so a sibling session's
    reaper cannot rmtree a live long build. ``build`` must clean its OWN
    artifact subdirs first — a stale streaming checkpoint beside a fresh
    landing would silently skip batches. Returns the root path."""
    import hashlib

    from mysql_hbase_replicator_spark.operators.layout import _fingerprint

    app = spark.sparkContext.applicationId.replace("-", "_")
    key = hashlib.md5(
        f"{app}:{os.path.abspath(sf_dir)}:{tag}".encode()
    ).hexdigest()[:10]
    root = f"/tmp/spark_graft_bucketed_{tag}_{key}"
    _register_scratch_cleanup(root)
    _reap_dead_scratch_roots(keep=root)
    want = "|".join(_fingerprint(os.path.join(sf_dir, s)) for s in sources)
    marker = os.path.join(root, "_fingerprint")
    try:
        with open(marker) as f:
            cached = f.read() == want
    except OSError:
        cached = False
    if not (cached and exists(root)):
        try:
            os.remove(marker)
        except OSError:
            pass
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, "_owner.pid"), "w") as f:
            f.write(str(os.getpid()))
        build(root)
        with open(marker, "w") as f:
            f.write(want)
    return root


_SCRATCH_ROOTS_REGISTERED: set[str] = set()


def _register_scratch_cleanup(root: str) -> None:
    """Remove this process's bucketed scratch root at interpreter exit
    (once per root). atexit rather than a SparkSession-stop listener: the
    layout must survive session restarts WITHIN a process (tests rebuild
    sessions), and the files are useless once the process is gone."""
    import atexit
    import shutil

    if root in _SCRATCH_ROOTS_REGISTERED:
        return
    _SCRATCH_ROOTS_REGISTERED.add(root)
    atexit.register(shutil.rmtree, root, ignore_errors=True)


def _reap_dead_scratch_roots(keep: str) -> None:
    """Delete sibling spark_graft_bucketed_* roots whose owning process no
    longer exists (crash leftovers the owner's atexit never ran for). Roots
    without an ``_owner.pid`` marker are pre-upgrade leaks: reaped only
    once they are an hour old, so a concurrent old-code session mid-write
    is never yanked. Best-effort — a reap race with a dying owner just
    double-deletes."""
    import glob
    import shutil
    import time

    for root in glob.glob("/tmp/spark_graft_bucketed_*"):
        if root == keep or not os.path.isdir(root):
            continue
        marker = os.path.join(root, "_owner.pid")
        try:
            with open(marker) as f:
                pid = int(f.read().strip())
        except (OSError, ValueError):
            try:  # unmarked: old-code root (or one mid-materialize pre-marker)
                if time.time() - os.path.getmtime(root) < 3600:
                    continue
            except OSError:
                continue
            shutil.rmtree(root, ignore_errors=True)
            continue
        try:
            os.kill(pid, 0)  # signal 0: existence probe only
        except ProcessLookupError:
            shutil.rmtree(root, ignore_errors=True)
        except (PermissionError, OSError):
            continue  # alive (owned by another user) or unknowable: keep


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderpriority, l.l_returnflag,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority, l.l_returnflag
    ORDER BY o.o_orderpriority, l.l_returnflag
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-fact join via BUCKETED LAYOUT — the 100 TB answer to
    'orders ⋈ lineitem shuffles 100 TB on every run': write both facts
    bucketed (and sorted) by orderkey ONCE, and every subsequent join on
    that key is exchange-free — each task zips bucket i of orders with
    bucket i of lineitem straight off the scan. This query materializes
    the bucketed twin of both tables (the one-time layout cost), then runs
    the join+rollup on the bucketed reads; tests/test_plans.py pins the
    no-Exchange plan property with broadcast disabled. At cluster scale
    the bucket count is sized to executors (e.g. 4096), not this test's 8,
    and the write is the same `layout.py` one-time job any warehouse runs.

    The aggregate on top reuses the decimal-exact msum form, so the result
    equals the plain shuffled join's — bucketing changes the PLAN, never
    the answer (that equality is exactly what the oracle checks)."""
    from mysql_hbase_replicator_spark.plans.queries import msum

    o, li = materialize_bucketed_facts(spark, sf_dir)
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            msum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .orderBy("o_orderpriority", "l_returnflag")
    )


@query(
    "sql_product_type_profit_bucketed",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - 0.1 * p.p_retailprice * l.l_quantity
                         AS DECIMAL(25,6))) AS DOUBLE) AS sum_profit
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
    """,
)
def sql_product_type_profit_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 (product-type profit) REPLAYED ON THE BUCKETED FACT LAYOUT —
    the layout paying off across the suite, not just in its demo query
    (r10 verdict #6): `sql_product_type_profit`'s one large shuffle is
    lineitem⋈orders on orderkey; reading both facts from the bucketed(8)/
    sorted scratch warehouse makes that join exchange-free, the dims
    broadcast as before, and the ONLY hash exchange left in the whole plan
    is the final (nation, year) aggregate — plan-gated in
    tests/test_plans.py. Same rows, same values as the shuffled twin (the
    oracle is character-identical to Q9's): bucketing changes the PLAN,
    never the answer. At 100 TB the same one-time layout serves Q9, Q12,
    Q3, the colocated rollup, and every other orderkey join — amortizing
    the write across the workload is the whole trade. part stays
    optimizer-chosen (not hint-pinned): at real scale it outgrows the
    broadcast threshold and AQE flips that edge to SMJ without touching
    the exchange-free orderkey core."""
    from mysql_hbase_replicator_spark.plans.queries import msum

    o, li = materialize_bucketed_facts(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])  # co-located, no exchange
        .join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(msum(profit).alias("sum_profit"))
    )

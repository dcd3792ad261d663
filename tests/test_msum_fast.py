"""msum_fast/mavg_fast must be BIT-IDENTICAL to the decimal-exact msum/mavg
on their declared domain (exactly-6-decimal quantities): the fast path is
only admissible because it is not an approximation."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mysql_hbase_replicator_spark.plans.queries import (
    mavg,
    mavg_fast,
    msum,
    msum_fast,
)

# 2-decimal "money" values, the raw-column regime (quantity/price/discount)
money2 = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
)


@settings(max_examples=12, deadline=None)
@given(st.lists(money2, min_size=1, max_size=40))
def test_msum_fast_bit_identical_on_money(spark, xs):
    df = spark.createDataFrame(
        [(float(x),) for x in xs], "x double"
    ).coalesce(1)
    got = df.agg(
        msum(F.col("x")).alias("a"),
        msum_fast(F.col("x")).alias("b"),
        mavg(F.col("x")).alias("c"),
        mavg_fast(F.col("x")).alias("d"),
    ).collect()[0]
    assert got["a"] == got["b"]
    assert got["c"] == got["d"]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(money2, money2), min_size=1, max_size=25))
def test_msum_fast_bit_identical_on_products(spark, pairs):
    # the product regime: extendedprice * (1 - discount)-style 4-to-6
    # decimal products computed in double, exactly the msum call sites
    # (b/100 has <=4 decimals, so a*(1-b) has <=6 — the declared domain)
    df = spark.createDataFrame(
        [(float(a), float(b) / 100.0) for a, b in pairs], "a double, b double"
    ).coalesce(1)
    prod = F.col("a") * (1 - F.col("b"))
    got = df.agg(
        msum(prod).alias("x"), msum_fast(prod).alias("y")
    ).collect()[0]
    assert got["x"] == got["y"]


# large-magnitude regime: the domain boundary the r10 review tightened.
# |x| <= 1e9 must stay bit-identical; the OLD documented bound (9e9) is
# demonstrably outside the slack argument and must stay out of the domain.
money_large = st.decimals(
    min_value=Decimal("-999999999.99"),
    max_value=Decimal("999999999.99"),
    places=2,
)


@settings(max_examples=12, deadline=None)
@given(st.lists(money_large, min_size=1, max_size=8))
def test_msum_fast_bit_identical_up_to_1e9(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double").coalesce(1)
    got = df.agg(msum(F.col("x")).alias("a"), msum_fast(F.col("x")).alias("b")).collect()[0]
    assert got["a"] == got["b"]


def test_scaled_long_misrounds_beyond_domain():
    """Documents WHY the per-row bound is 1e9, not the old 9e9: near
    double's exact-integer ceiling the x*1e6 product's ulp exceeds the
    ±0.5 rounding slack, so scale-6 longs mis-round. If this ever starts
    passing for the 9e9 regime, the domain comment can be revisited."""
    import math

    x = 8999999123.456789  # exactly-6-decimal value inside the OLD domain
    exact = Decimal(repr(x)).scaleb(6).to_integral_value()
    fast = math.floor(x * 1e6 + 0.5)
    assert fast != int(exact)  # the old 9e9 bound really was unsound
    y = 999999999.99  # inside the new 1e9 domain
    assert math.floor(y * 1e6 + 0.5) == int(Decimal(repr(y)).scaleb(6))

"""Bucketed co-located join (SURVEY.md scale notes / §4): pre-bucketing both
fact tables on the join key lets the sort-merge join read bucket-aligned
files with NO shuffle exchange — the 100 TB answer to repeated fact-fact
joins on the same key."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark):
    l = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    for t in ("bkt_lineitem", "bkt_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("bkt_lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("bkt_orders")
    yield spark.table("bkt_lineitem"), spark.table("bkt_orders")
    for t in ("bkt_lineitem", "bkt_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    bl, bo = bucketed_tables
    j = bl.hint("merge").join(bo, bl.l_orderkey == bo.o_orderkey)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket-aligned scan feeds the join directly

    # and it is the same join result as the unbucketed path
    pl = spark.read.parquet(f"{SF}/lineitem.parquet")
    po = spark.read.parquet(f"{SF}/orders.parquet")
    assert j.count() == pl.join(po, pl.l_orderkey == po.o_orderkey).count()

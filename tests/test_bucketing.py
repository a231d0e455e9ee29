"""Bucketed co-located join (SURVEY.md scale design: 'co-locate joins
via bucketing'): two tables bucketBy'd on the same key join WITHOUT a
shuffle — the plan has zero Exchange operators on either side. This is
the 100 TB strategy for the recurring lineitem⋈orders-shaped joins:
pay the partitioned write once, never shuffle the fact table again.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF0001


@pytest.fixture(scope="module")
def bucketed_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    orders = spark.read.parquet(f"{SF0001}/orders.parquet")
    li = spark.read.parquet(f"{SF0001}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bucketdb.orders_b"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bucketdb.lineitem_b"))
    yield "bucketdb"
    spark.sql("DROP DATABASE bucketdb CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed_db):
    o = spark.table("bucketdb.orders_b")
    li = spark.table("bucketdb.lineitem_b")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    # disable broadcast so the wide-join strategy (the one bucketing
    # exists for — at 100 TB neither side broadcasts) is what plans
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join consumes the bucketed layout directly: no Exchange
        # below the join (the final single-key aggregate may shuffle)
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_equals_plain_join(spark, bucketed_db):
    o = spark.table("bucketdb.orders_b")
    li = spark.table("bucketdb.lineitem_b")
    got = {
        tuple(r)
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus").count().collect()
    }
    op = spark.read.parquet(f"{SF0001}/orders.parquet")
    lip = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    want = {
        tuple(r)
        for r in lip.join(op, lip.l_orderkey == op.o_orderkey)
        .groupBy("o_orderstatus").count().collect()
    }
    assert got == want

"""Bucketed co-located join: assert the shuffle actually disappears."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)
from big_data_computing__spark.sources.readers import read_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=4)
    write_bucketed(orders, "b_orders", "l_orderkey", n_buckets=4)
    # the fixture tables are tiny, so the planner would broadcast (and
    # skip bucketing entirely); disable broadcast to exercise the path a
    # fact-fact join takes at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # sanity: result matches the plain (shuffling) join
        plain = li.join(orders, "l_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")

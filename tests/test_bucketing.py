"""Bucketing: pre-partitioned co-located joins must plan shuffle-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackml_spark.sources import load_table
from quackml_spark.sources.bucketing import (
    bucketed_join,
    join_is_shuffle_free,
    write_bucketed,
)


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    li = write_bucketed(spark, sf_dir, "lineitem", "l_orderkey", 4, "t_li_b")
    orders = write_bucketed(spark, sf_dir, "orders", "o_orderkey", 4, "t_or_b")
    joined = bucketed_join(spark, li, orders, "l_orderkey", "o_orderkey")
    assert join_is_shuffle_free(joined), "bucketed join still shuffles"

    # the same join on plain parquet DOES shuffle (or broadcasts) — the
    # bucketed layout is what removed the exchange
    plain = load_table(spark, sf_dir, "lineitem").join(
        load_table(spark, sf_dir, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plain.count()
    plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan or "Broadcast" in plan

    # and the results agree
    a = joined.agg(F.count(F.lit(1))).collect()[0][0]
    b = plain.agg(F.count(F.lit(1))).collect()[0][0]
    assert a == b

"""General asof_join vs DuckDB's native ASOF JOIN, both directions."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackml_spark.operators.joins import asof_join
from quackml_spark.sources import load_table


def _duck_pairs(duck, direction):
    op = ">=" if direction == "backward" else "<="
    rows = duck.execute(f"""
        SELECT e.event_id, o.o_orderkey
        FROM events e
        ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts {op} o.o_orderdate
        ORDER BY e.event_id
    """).fetchall()
    return {r[0]: r[1] for r in rows}


def test_asof_backward_matches_duckdb(spark, sf_dir, duck):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("timestamp").alias("ts")
    )
    out = asof_join(ev, orders, on="ts", by_left="user_id", by_right="o_custkey")
    got = {r["event_id"]: r["o_orderkey"] for r in out.collect()}
    want = _duck_pairs(duck, "backward")
    assert got == want


def test_asof_forward_matches_duckdb(spark, sf_dir, duck):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("timestamp").alias("ts")
    )
    out = asof_join(
        ev, orders, on="ts", by_left="user_id", by_right="o_custkey",
        direction="forward",
    )
    got = {r["event_id"]: r["o_orderkey"] for r in out.collect()}
    want = _duck_pairs(duck, "forward")
    assert got == want


def test_asof_tolerance_nulls_stale_matches(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("timestamp").alias("ts")
    )
    loose = asof_join(ev, orders, on="ts", by_left="user_id", by_right="o_custkey")
    tight = asof_join(
        ev, orders, on="ts", by_left="user_id", by_right="o_custkey",
        tolerance_seconds=86400.0 * 30,
    )
    n_loose = loose.where(F.col("o_orderkey").isNotNull()).count()
    n_tight = tight.where(F.col("o_orderkey").isNotNull()).count()
    assert 0 < n_tight < n_loose  # a 30-day window must drop some matches
    assert tight.count() == ev.count()  # left rows all kept


def test_asof_plan_single_shuffle_no_range_explosion(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("timestamp").alias("ts")
    )
    out = asof_join(ev, orders, on="ts", by_left="user_id", by_right="o_custkey")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

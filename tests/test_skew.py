"""AQE skew-join splitting must engage on a skewed key (SCALE.md §3)."""

from __future__ import annotations

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join_partition(spark):
    # key 0 carries 200k rows; every other key has ~100
    left = spark.range(200000).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    ).unionAll(
        spark.range(5000).select((F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v"))
    )
    right = spark.range(51).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        j = left.join(right, "k").select("k", "v", "w")
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        for k in _CONFS:
            spark.conf.unset(k)
    assert len(rows) == 205000
    assert "isFinalPlan=true" in plan
    assert plan.count("skew=true") >= 1, "AQE skew split did not engage"


def test_salted_groupby_equals_direct(spark, sf_dir):
    from quackml_spark.operators.skew import salted_groupby
    from quackml_spark.plans._exact import dec, disc_price
    from quackml_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_groupby(
        li,
        ["l_returnflag"],
        {
            "revenue": ("sum", disc_price()),
            "n": ("count", F.lit(1)),
            "min_qty": ("min", dec("l_quantity")),
            "max_qty": ("max", dec("l_quantity")),
        },
        n_salts=8,
    )
    direct = li.groupBy("l_returnflag").agg(
        F.sum(disc_price()).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
        F.min(dec("l_quantity")).alias("min_qty"),
        F.max(dec("l_quantity")).alias("max_qty"),
    )
    s = {tuple(r) for r in salted.collect()}
    d = {tuple(r) for r in direct.collect()}
    assert s == d  # DECIMAL partials make the two-phase result identical


def test_salted_groupby_rejects_non_reaggregatable():
    import pytest as _pytest

    from quackml_spark.operators.skew import salted_groupby

    with _pytest.raises(ValueError, match="non-re-aggregatable"):
        salted_groupby(None, ["k"], {"bad": ("avg", F.lit(1))})


def test_salted_join_equals_plain_join(spark):
    """Salted join must be row-identical to the plain join on a
    deliberately skewed key distribution (90% of big rows on one key)."""
    from quackml_spark.operators.skew import salted_join

    big = spark.range(10_000).selectExpr(
        "id", "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 7 END AS k",
        "id * 2 AS payload"
    )
    small = spark.range(7).selectExpr("id AS k", "id * 100 AS dim")
    plain = big.join(small, "k", "inner").selectExpr("id", "k", "payload", "dim")
    salted = salted_join(big, small, "k", n_salts=8).selectExpr(
        "id", "k", "payload", "dim"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_preserves_unmatched(spark):
    from quackml_spark.operators.skew import salted_join

    big = spark.range(100).selectExpr("id", "id % 13 AS k")
    small = spark.range(5).selectExpr("id AS k", "id AS dim")
    plain = big.join(small, "k", "left").selectExpr("id", "k", "dim")
    salted = salted_join(big, small, "k", n_salts=4, how="left").selectExpr(
        "id", "k", "dim"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0

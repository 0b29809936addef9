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

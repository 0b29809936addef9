"""Mergeable HLL rollups: union-of-parts == sketch-of-whole (the
property that makes incremental maintenance sound), persist/append
round-trip, and accuracy vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackml_spark.operators.hll import hll_merge, hll_rollup
from quackml_spark.sources import load_table


def test_union_of_daily_equals_direct_weekly(spark, sf_dir):
    """Merging daily sketches into a week gives EXACTLY the estimate of
    sketching the week's rows directly — associativity, not just
    approximation-close."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    daily = hll_rollup(ev, "user_id", F.to_date("ts"), bucket_name="day")
    merged = {
        r["period"]: r["n_distinct_est"]
        for r in hll_merge(
            daily, F.date_format(F.date_trunc("week", F.col("day")), "yyyy-MM-dd")
        ).collect()
    }
    direct = {
        r["bucket"]: r["n_est"]
        for r in ev.groupBy(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("bucket")
        )
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(12))
            ).alias("n_est")
        )
        .collect()
    }
    assert merged == direct


def test_sketch_persist_append_roundtrip(spark, sf_dir, tmp_path):
    """The sketch relation survives parquet persistence (binary column)
    and answering all-time uniques from old+appended sketches equals
    sketching everything at once."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    cutoff = ev.agg(F.expr("percentile_approx(unix_micros(ts), 0.5)")).collect()[0][0]
    old = ev.where(F.unix_micros("ts") <= cutoff)
    new = ev.where(F.unix_micros("ts") > cutoff)
    path = str(tmp_path / "sketches")
    hll_rollup(old, "user_id", F.to_date("ts"), bucket_name="day").write.parquet(path)
    hll_rollup(new, "user_id", F.to_date("ts"), bucket_name="day").write.mode(
        "append"
    ).parquet(path)
    alltime = hll_merge(
        spark.read.parquet(path), F.lit("all"), group_name="period"
    ).collect()[0]["n_distinct_est"]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id"), F.lit(12)))
    ).collect()[0][0]
    assert alltime == direct


def test_estimate_accuracy_vs_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    est = hll_merge(
        hll_rollup(ev, "user_id", F.to_date("ts"), bucket_name="day"),
        F.lit("all"),
    ).collect()[0]["n_distinct_est"]
    exact = ev.select(F.count_distinct("user_id")).collect()[0][0]
    assert abs(est - exact) <= 0.05 * exact

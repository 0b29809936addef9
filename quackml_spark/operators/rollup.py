"""Incremental rollup maintenance — the continuous-aggregate pattern.

``q22_time_rollup`` computes the hourly/daily rollup from scratch; at
100 TB of events a nightly full recompute is the thing you must never
do. This module maintains a PERSISTED hourly aggregate incrementally:

  * ``rollup_build``  — materialize (day, hour) partials, parquet
    partitioned by day;
  * ``rollup_upsert`` — merge a new event batch by recomputing ONLY
    the day partitions the batch touches (counts and exact DECIMAL
    sums are associative, so existing partials + batch partials
    combine without rescanning history), written back with Spark's
    dynamic partition overwrite so untouched partitions' files are
    not rewritten (asserted in tests via file mtimes).

The merged aggregate is row-identical to a from-scratch rollup of the
full history — the incremental path is exact, not approximate, because
sums are carried in DECIMAL (partitioning/merge-order independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hourly_partial(events: DataFrame) -> DataFrame:
    # Partition keys must be SESSION-TIMEZONE-INDEPENDENT: date_trunc/
    # date_format render in spark.sql.session.timeZone, so a build under
    # UTC and an upsert under another zone would silently land the same
    # instants in different (day, hour) buckets (code-review catch).
    # to_utc_timestamp(ts, session_tz) shifts the instant so that
    # session-zone rendering equals UTC rendering — keys are the UTC
    # calendar regardless of who runs the job.
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    ts_utc = F.to_utc_timestamp(F.col("ts"), tz)
    return events.groupBy(
        F.date_format(F.date_trunc("day", ts_utc), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", ts_utc), "HH:00").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(28,6)")
        .alias("sum_value"),
    )


def rollup_build(events: DataFrame, path: str) -> None:
    """Materialize the hourly rollup at ``path``, partitioned by day."""
    (
        _hourly_partial(events)
        .repartition("day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )


def rollup_upsert(new_events: DataFrame, path: str) -> list[str]:
    """Merge a new batch into the persisted rollup; returns the day
    partitions that were rewritten. The scan of existing state is
    partition-pruned to exactly those days; everything else on disk is
    left untouched (dynamic partition overwrite)."""
    spark = new_events.sparkSession
    # the partials feed both the day-list collect and the merged write
    # — persist so the batch (and its upstream plan) is scanned once
    part = _hourly_partial(new_events).persist()
    try:
        days = sorted(r["day"] for r in part.select("day").distinct().collect())
        if not days:
            return []
        existing = (
            spark.read.parquet(path)
            .where(F.col("day").isin(days))
            .select("day", "hour", "n_events", "sum_value")
        )
        merged = (
            existing.unionByName(part.select("day", "hour", "n_events", "sum_value"))
            .groupBy("day", "hour")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").cast("decimal(28,6)").alias("sum_value"),
            )
        )
        conf = "spark.sql.sources.partitionOverwriteMode"
        old = spark.conf.get(conf, "static")
        spark.conf.set(conf, "dynamic")
        try:
            (
                merged.repartition("day")
                .write.mode("overwrite")
                .partitionBy("day")
                .parquet(path)
            )
        finally:
            spark.conf.set(conf, old)
        return days
    finally:
        part.unpersist()


def rollup_read(spark, path: str) -> DataFrame:
    """The maintained aggregate, shaped like q22's (day, hour) level."""
    return (
        spark.read.parquet(path)
        .select(
            "day",
            "hour",
            "n_events",
            F.round("sum_value", 6).cast("double").alias("sum_value"),
        )
        .orderBy("day", "hour")
    )

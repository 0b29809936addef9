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
    # Partition keys must be SESSION-TIMEZONE-INDEPENDENT. The earlier
    # to_utc_timestamp(ts, session_tz) shift got the common case right
    # but still rendered through the session zone's CALENDAR, so a UTC
    # wall time falling inside that zone's DST spring-forward gap
    # resolved to the shifted hour — one UTC hour per year landed in
    # different buckets depending on who ran the job (review catch).
    # Pure epoch-second integer arithmetic has no calendar at all:
    # epoch-day -> DATE via date_add (tz-free), hour = pmod//3600.
    secs = F.unix_timestamp(F.col("ts"))
    epoch_day = F.floor(secs / 86400)
    day = F.date_add(
        F.to_date(F.lit("1970-01-01")), epoch_day.cast("int")
    ).cast("string")
    hour = F.concat(
        F.lpad((F.pmod(secs, 86400) / 3600).cast("int").cast("string"), 2, "0"),
        F.lit(":00"),
    )
    return events.groupBy(day.alias("day"), hour.alias("hour")).agg(
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
        day_rows = {r["day"] for r in part.select("day").distinct().collect()}
        # NULL-timestamp events roll into the NULL day bucket (Hive
        # default partition). They must join the day list explicitly:
        # sorted() over a None raises, and isin([None]) matches NOTHING
        # (NULL comparison), so the existing NULL-day partial was
        # excluded from the merge and the overwrite silently DESTROYED
        # the historical NULL-day aggregate (review catch).
        has_null_day = None in day_rows
        days = sorted(d for d in day_rows if d is not None)
        if not days and not has_null_day:
            return []
        day_filter = F.col("day").isin(days) if days else F.lit(False)
        if has_null_day:
            day_filter = day_filter | F.col("day").isNull()
        existing = (
            spark.read.parquet(path)
            .where(day_filter)
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
        return days + (["__HIVE_DEFAULT_PARTITION__"] if has_null_day else [])
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

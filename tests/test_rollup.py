"""Incremental rollup maintenance: exactness + untouched-partition
stability (the continuous-aggregate contract)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from quackml_spark.operators.rollup import rollup_build, rollup_read, rollup_upsert
from quackml_spark.sources import load_table


def _partition_mtimes(path: str) -> dict[str, float]:
    out = {}
    for d in os.listdir(path):
        if d.startswith("day="):
            full = os.path.join(path, d)
            out[d] = max(
                os.path.getmtime(os.path.join(full, f))
                for f in os.listdir(full)
                if f.endswith(".parquet")
            )
    return out


def test_incremental_equals_full_recompute(spark, sf_dir, tmp_path):
    """build(old) + upsert(new) must be row-identical to build(full) —
    the DECIMAL-sum merge is exact, not approximate."""
    events = load_table(spark, sf_dir, "events")
    cut = events.agg(F.expr("percentile(unix_seconds(ts), 0.5)")).first()[0]
    old = events.where(F.unix_seconds("ts") <= cut)
    new = events.where(F.unix_seconds("ts") > cut)
    assert old.count() > 0 and new.count() > 0

    inc_path = str(tmp_path / "inc")
    rollup_build(old, inc_path)
    rewritten = rollup_upsert(new, inc_path)
    assert rewritten, "the new batch must touch at least one day"

    full_path = str(tmp_path / "full")
    rollup_build(events, full_path)
    got = [tuple(r) for r in rollup_read(spark, inc_path).collect()]
    want = [tuple(r) for r in rollup_read(spark, full_path).collect()]
    assert got == want and len(want) > 0


def test_untouched_partitions_not_rewritten(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite must leave days outside the batch
    byte-untouched — the property that makes the upsert O(batch days),
    not O(history)."""
    import time

    events = load_table(spark, sf_dir, "events")
    days = [
        r["d"]
        for r in events.select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d")
        )
        .distinct()
        .orderBy("d")
        .collect()
    ]
    assert len(days) >= 2, "fixture needs at least two days of events"
    last_day = days[-1]
    path = str(tmp_path / "roll")
    rollup_build(events, path)
    before = _partition_mtimes(path)
    time.sleep(1.1)

    batch = events.where(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd") == last_day
    ).limit(50)
    rewritten = rollup_upsert(batch, path)
    assert rewritten == [last_day]
    after = _partition_mtimes(path)
    for part, mtime in before.items():
        if part == f"day={last_day}":
            assert after[part] > mtime, "touched partition must be rewritten"
        else:
            assert after[part] == mtime, f"untouched partition {part} was rewritten"


def test_upsert_creates_new_day_partition(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "roll2")
    rollup_build(events, path)
    future = events.limit(20).withColumn("ts", F.expr("ts + INTERVAL 3650 DAYS"))
    days = rollup_upsert(future, path)
    assert len(days) >= 1
    assert any(f"day={d}" in os.listdir(path) for d in days)


def test_rollup_keys_timezone_independent(spark, sf_dir, tmp_path):
    """A build under one session timezone and an upsert under another
    must land the same instants in the same (day, hour) buckets — the
    keys are the UTC calendar regardless of who runs the job."""
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "tzroll")
    tz_conf = "spark.sql.session.timeZone"
    orig = spark.conf.get(tz_conf)
    try:
        spark.conf.set(tz_conf, "UTC")
        rollup_build(events, path)
        utc_rows = sorted(tuple(r) for r in rollup_read(spark, path).collect())
        spark.conf.set(tz_conf, "America/New_York")
        # re-merging the same events must double every count IN PLACE —
        # no new (day, hour) buckets may appear from the zone change
        rollup_upsert(events, path)
        ny_rows = sorted(tuple(r) for r in rollup_read(spark, path).collect())
    finally:
        spark.conf.set(tz_conf, orig)
    assert len(ny_rows) == len(utc_rows)
    assert [(d, h) for d, h, *_ in ny_rows] == [(d, h) for d, h, *_ in utc_rows]
    assert all(n2 == 2 * n1 for (_, _, n1, _), (_, _, n2, _) in zip(utc_rows, ny_rows))


def test_upsert_preserves_null_day_partition(spark, tmp_path):
    """NULL-timestamp events roll into the NULL day bucket; an upsert
    touching it used to EXCLUDE the existing NULL-day partial from the
    merge (isin([None]) matches nothing) and the dynamic overwrite then
    destroyed the historical aggregate (review catch)."""
    path = str(tmp_path / "roll")
    base = spark.createDataFrame(
        [(None, 10.0), (None, 20.0), ("2024-01-01 05:00:00", 1.0)],
        "ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    rollup_build(base, path)
    batch = spark.createDataFrame(
        [(None, 5.0)], "ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    days = rollup_upsert(batch, path)
    assert "__HIVE_DEFAULT_PARTITION__" in days
    null_row = (
        spark.read.parquet(path).where(F.col("day").isNull()).collect()
    )
    assert len(null_row) == 1
    assert null_row[0]["n_events"] == 3  # 2 history + 1 batch, not 1
    assert float(null_row[0]["sum_value"]) == 35.0


def test_rollup_keys_survive_dst_gap(spark, tmp_path):
    """An instant whose UTC wall time falls in the session zone's DST
    spring-forward gap must key identically under any session timezone:
    the old to_utc_timestamp rendering resolved the nonexistent local
    hour by shifting it (review catch). 2026-03-08T02:30:00Z reads as
    local 02:30 in America/New_York's gap."""
    from quackml_spark.operators.rollup import _hourly_partial

    ev = spark.createDataFrame(
        [("2026-03-08 02:30:00", 1.0)], "ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))  # parsed under current tz

    tz_conf = "spark.sql.session.timeZone"
    old = spark.conf.get(tz_conf)
    try:
        spark.conf.set(tz_conf, "UTC")
        ev_utc = spark.createDataFrame(
            [("2026-03-08 02:30:00", 1.0)], "ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        under_utc = _hourly_partial(ev_utc).collect()[0]
        spark.conf.set(tz_conf, "America/New_York")
        under_ny = _hourly_partial(ev_utc).collect()[0]
    finally:
        spark.conf.set(tz_conf, old)
    assert (under_utc["day"], under_utc["hour"]) == (
        under_ny["day"],
        under_ny["hour"],
    ), (under_utc, under_ny)
    assert under_utc["hour"] == "02:00"

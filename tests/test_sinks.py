"""Partitioned writes must enable partition pruning on read."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackml_spark.sources import load_table
from quackml_spark.sources.sinks import (
    partition_filters,
    read_partitioned,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "events_by_day")
    write_partitioned(ev, out, ["day"])

    back = read_partitioned(spark, out)
    one_day = back.where(F.col("day") == "2024-01-05")
    pf = partition_filters(one_day)
    assert "day" in pf, f"no partition filter applied: {pf!r}"

    # pruned read returns exactly the batch-filtered rows
    expected = ev.where(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05").count()
    assert one_day.count() == expected
    assert expected > 0

"""Partitioned parquet sinks + pruning verification.

At 100 TB the dominant read optimization after column pruning is
PARTITION pruning: lay the data out by a coarse key (day, source, ...)
so a filtered scan touches only matching directories. This module
provides the write helper and a plan-level check that a filter actually
pruned (used by tests/test_sinks.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by ``partition_cols``. Rows are
    repartitioned on the partition key first so each partition directory
    is written by few tasks (avoids the many-small-files failure mode at
    scale)."""
    df.repartition(*partition_cols).write.partitionBy(*partition_cols).mode(
        mode
    ).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters the executed scan applied (empty string if
    none) — evidence that a filter pruned directories, not just rows."""
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            i = line.index("PartitionFilters: [")
            return line[i + len("PartitionFilters: [") : line.index("]", i)]
    return ""

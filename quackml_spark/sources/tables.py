"""Parquet table sources for the engine.

Handles the one physical-format wrinkle in the test data: the ``events``
table stores TIMESTAMP(NANOS) which Spark's vectorized parquet reader
rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos as LONG
(``spark.sql.legacy.parquet.nanosAsLong``) and convert to a microsecond
timestamp with integer division — the same truncation DuckDB applies when
it narrows ns to its internal µs timestamps, so oracle comparisons agree.

All other tables are plain columnar scans; filters/projections push down.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STANDARD_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


_HANDLES: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; the (immutable) DataFrame handle is cached per
    session so repeated queries skip parquet footer/schema inference."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key in _HANDLES:
        return _HANDLES[key]
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(path)
    if len(_HANDLES) > 256:
        _HANDLES.clear()
    _HANDLES[key] = df
    return _HANDLES[key]


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load and register temp views for each present table."""
    out = {}
    for name in names or STANDARD_TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out

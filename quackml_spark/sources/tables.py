"""Parquet table sources for the engine.

Handles the one physical-format wrinkle in the test data: the ``events``
table's ``ts`` column has shipped as TIMESTAMP(NANOS) (which Spark's
vectorized reader rejects → read nanos-as-LONG and truncate to µs, the
same narrowing DuckDB applies) and, in newer generations, as
``timestamp[us]`` (which Spark 4.x reads as TIMESTAMP_NTZ). Either way,
:func:`normalize_events_ts` yields ONE canonical representation — a
session-timezone TIMESTAMP with the session pinned to UTC, so epoch
math and hour bucketing agree with DuckDB's naive-timestamp semantics —
absorbing any future physical-type drift in a single place. All readers
(batch + streaming) and all ts-arithmetic call sites go through here.

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


def normalize_events_ts(spark: SparkSession, df: DataFrame, col: str = "ts") -> DataFrame:
    """Return ``df`` with ``col`` as a canonical session-tz TIMESTAMP.

    Handles every physical type the events table has shipped with:
      * ``bigint`` (nanos read as long) → truncate to µs like DuckDB;
      * ``timestamp_ntz`` (parquet timestamp[us]) → reinterpret as UTC
        wall-clock (session tz is pinned to UTC so the cast is an
        identity on the stored value, matching DuckDB's naive reads);
      * ``timestamp`` → pass through.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dtype == "timestamp_ntz":
        # NTZ→TIMESTAMP interprets wall-clock in the session timezone;
        # pin UTC so epoch math matches DuckDB's naive-as-UTC semantics.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def ts_epoch_micros(col) -> F.Column:
    """Epoch microseconds from any timestamp-ish column (TIMESTAMP,
    TIMESTAMP_NTZ, or already-long). One accessor so an engine/testdata
    type change breaks one function, not every ts-arithmetic query."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def ts_epoch_seconds(col) -> F.Column:
    """Epoch seconds (floor) from any timestamp-ish column."""
    return F.floor(ts_epoch_micros(col) / F.lit(1_000_000)).cast("long")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; the (immutable) DataFrame handle is cached per
    session so repeated queries skip parquet footer/schema inference."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key in _HANDLES:
        return _HANDLES[key]
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_events_ts(spark, spark.read.parquet(path))
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

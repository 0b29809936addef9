"""Bucketed (pre-partitioned, co-located) tables for shuffle-free joins.

At 100 TB the lineitem⋈orders shuffle dominates star-join cost. Writing
both tables bucketed on the join key once lets every subsequent join
run shuffle-free: the bucket layout IS the exchange, paid at write time
and amortized over all queries. This module materializes bucketed twins
of any parquet tables and proves the plan effect (no ShuffleExchange on
the bucketed join) — see tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from quackml_spark.sources.tables import load_table


def write_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    name: str | None = None,
) -> str:
    """Materialize a bucketed, bucket-sorted copy of a parquet table as
    a catalog-managed table; returns the table name."""
    name = name or f"{table}_bucketed"
    # a managed-table location can survive from a previous session whose
    # in-memory catalog entry is gone — drop both before writing
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if wh:
        shutil.rmtree(f"{wh}/{name.lower()}", ignore_errors=True)
    df = load_table(spark, sf_dir, table)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(name)
    )
    return name


def bucketed_join(
    spark: SparkSession, left: str, right: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two bucketed tables on their bucket keys — Catalyst sees the
    matching bucket specs and plans a sort-merge join with NO exchange
    on either side."""
    l, r = spark.table(left), spark.table(right)
    return l.join(r, l[left_key] == r[right_key])


def join_is_shuffle_free(df: DataFrame) -> bool:
    """True when the executed join plan contains no shuffle exchange."""
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan

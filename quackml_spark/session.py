"""SparkSession construction tuned for the quackml_spark engine.

Local testing runs ``local[N]`` in one JVM; the configs below are chosen so
the same code is correct and fast on a real multi-executor cluster:

  * AQE on (runtime shuffle-partition coalescing, skew-join splitting) —
    at 100 TB the static ``shuffle.partitions`` value is always wrong for
    some stage, so let the engine re-plan from runtime statistics.
  * Arrow on — every pandas UDF in the engine moves data in Arrow batches.
  * Broadcast threshold left at default but every deliberately-small
    dimension join in the engine uses an explicit ``broadcast()`` hint so
    plans do not degrade to sort-merge when stats are missing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 4


def get_spark(
    app_name: str = "quackml_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config."""
    par = _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{par}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(par, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Floor SCAN parallelism at the session's core count (guide §6):
        # Spark sizes scan splits by input BYTES, so a bench-scale
        # parquet file yields 1-3 splits and every scan-bound stage
        # runs on 1-3 of the cores. minPartitionNum derives from the
        # session parallelism (NOT a constant), so it scales with
        # SPARK_GRAFT_CPUS and is a no-op on any input whose byte size
        # already justifies >= cores splits — at 100 TB these two
        # settings change nothing (the 4 MB default openCostInBytes
        # only mattered because it floored split size above
        # small-input/32; 256 KB keeps the same many-small-files
        # packing behavior to within one task per ~4 files).
        .config("spark.sql.files.minPartitionNum", str(par))
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def local_rows(spark: SparkSession, rows, schema):
    """Driver-local rows as a DataFrame without the per-core Python
    fan-out.

    A bare ``createDataFrame(list)`` parallelizes the list into
    ``sc.defaultParallelism`` slices, and EVERY evaluation of the plan
    launches one Python-worker round-trip per slice — measured r13 at
    local[32]: ~8 s of executor time (32 tasks × ~0.25 s) to produce a
    15-row broadcast relation, vs 0.4 s through one slice, results
    byte-identical (guide §4 — don't cross the Python boundary more
    times than the data requires). Driver-local relations are small by
    construction (anything big should never live on the driver), so
    slice by size: one worker handles the common tiny case; genuinely
    large local lists still convert in parallel.
    """
    rows = rows if isinstance(rows, list) else list(rows)
    slices = max(1, min(
        spark.sparkContext.defaultParallelism, len(rows) // 8192
    ))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), schema
    )


def configure_for_scale(spark: SparkSession, target_partitions: int) -> None:
    """Re-tune the shuffle width for a known data scale.

    At 100 TB with 1000 executors you want O(2-4× total cores) shuffle
    partitions as the *initial* value and let AQE coalesce; callers that
    know their scale (e.g. bench at a given SF) can set it explicitly.
    """
    spark.conf.set("spark.sql.shuffle.partitions", str(target_partitions))



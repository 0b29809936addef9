"""Exactly-mergeable power-of-two histogram sketch — the distribution
member of the engine's sketch family (HLL = distinct counts, count-min
= frequencies, this = value distributions).

The 100 TB problem: "p99 document length per source, refreshed daily"
recomputed from raw data rescans the horizon; approx-quantile sketches
merge but are engine-specific (their estimates can't be oracle-checked
and their partials aren't bit-stable across engines). This sketch
trades resolution for EXACTNESS of the state: the bin of a value is
its binary magnitude (floor(log2 v), computed as the LENGTH OF THE
BINARY STRING — pure integer arithmetic, no IEEE log anywhere), so

  * the state is (group, bin, count) — trivially associative: the
    union of part-sketches is BIT-IDENTICAL to the sketch of the
    whole (sum of counts), pinned by test;
  * quantile estimates are deterministic integer arithmetic over the
    cumulative bin counts (rank = integer-ceil(p*n), estimate = the
    bin's inclusive upper bound 2^(b+1)-1), so DuckDB replays them
    exactly — a property no sampling-based quantile sketch offers;
  * error is bounded by the bin width: estimates are within 2x of the
    true quantile (one binary magnitude), the HDR-histogram trade.

Scale shape: one map-side-combined groupBy to <= |groups| x 64 rows;
rollup and quantile extraction touch only the sketch relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quackml_spark.plans import register
from quackml_spark.sources import load_table


def _bin_expr(value):
    """Binary-magnitude bin: floor(log2 v) for v >= 1 via
    length(binary-string) - 1; v <= 0 AND NULL land in bin -1.
    Integer-exact in Spark (conv) and DuckDB (bin()) alike.

    NULL must map explicitly: a NULL bin row would sort NULLS FIRST in
    Spark's cumulative window but NULLS LAST under DuckDB's ORDER BY,
    shifting every real bin's cumulative count and silently diverging
    the percentile estimates between the engines (review catch)."""
    return F.when(value.isNull() | (value <= 0), F.lit(-1)).otherwise(
        F.length(F.conv(value.cast("bigint"), 10, 2)) - 1
    )


def hist_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build the sketch: (group..., bin, n) — the PERSISTABLE state.
    Append-friendly: sketch new data alone and merge."""
    groups = group_cols or []
    return df.groupBy(
        *groups, _bin_expr(F.col(value_col)).alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))


def hist_merge(sketches: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Union part-sketches (e.g. per-day states) into one: exact sum
    per (group, bin). Associative and commutative by construction."""
    groups = group_cols or []
    return sketches.groupBy(*groups, "bin").agg(F.sum("n").alias("n"))


def hist_quantiles(
    sketch: DataFrame,
    percentiles: list[tuple[str, int, int]] = (
        ("p50", 1, 2),
        ("p90", 9, 10),
        ("p99", 99, 100),
    ),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic quantile estimates from the sketch: for each
    (name, p_num, p_den), the inclusive upper bound (2^(bin+1) - 1) of
    the first bin whose cumulative count reaches the integer rank
    ceil(p_num/p_den * n). Pure integer arithmetic end to end.

    The window runs over the SKETCH relation (<= |groups| x 64 rows),
    never the data."""
    groups = group_cols or []
    w = (
        Window.partitionBy(*groups).orderBy("bin")
        if groups
        else Window.partitionBy(F.lit(1)).orderBy("bin")
    )
    cum = sketch.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy(*[F.col(g) for g in groups]) if groups else Window.partitionBy(F.lit(1)))
    )
    # shiftleft()'s python wrapper only takes a literal shift count, so
    # the column-shift goes through expr
    est = F.when(F.col("bin") < 0, F.lit(0).cast("bigint")).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), bin + 1)") - 1
    )
    aggs = [F.sum("n").alias("n_rows")]
    for name, p_num, p_den in percentiles:
        rank = F.expr(f"(total * {p_num} + {p_den - 1}) div {p_den}")
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, est)).alias(name)
        )
    out = cum.groupBy(*groups).agg(*aggs)
    return out.orderBy(*groups) if groups else out


@register(
    "sketch_length_histogram",
    extra=True,
    doc="Mergeable power-of-two histogram sketch over document lengths "
    "per source: binary-magnitude bins (integer-exact, no IEEE log), "
    "deterministic p50/p90/p99 estimates from the cumulative bin "
    "counts (rank = integer-ceil(p*n), estimate = the bin's inclusive "
    "upper bound). Union-of-parts == sketch-of-whole bit-exact "
    "(test-pinned); the quantile window runs over the <= |sources|x64 "
    "row sketch, never the corpus.",
    oracle="""
WITH s AS (
  SELECT source,
         CASE WHEN n_chars IS NULL OR n_chars <= 0 THEN -1
              ELSE length(bin(n_chars)) - 1 END AS bin,
         COUNT(*) AS n
  FROM documents GROUP BY 1, 2
), c AS (
  SELECT source, bin, n,
         SUM(n) OVER (PARTITION BY source ORDER BY bin) AS cum,
         SUM(n) OVER (PARTITION BY source) AS total
  FROM s
)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_rows,
  CAST(MIN(CASE WHEN cum >= (total + 1) // 2
      THEN CASE WHEN bin < 0 THEN 0 ELSE (CAST(1 AS BIGINT) << (bin + 1)) - 1 END
      END) AS BIGINT) AS p50,
  CAST(MIN(CASE WHEN cum >= (total * 9 + 9) // 10
      THEN CASE WHEN bin < 0 THEN 0 ELSE (CAST(1 AS BIGINT) << (bin + 1)) - 1 END
      END) AS BIGINT) AS p90,
  CAST(MIN(CASE WHEN cum >= (total * 99 + 99) // 100
      THEN CASE WHEN bin < 0 THEN 0 ELSE (CAST(1 AS BIGINT) << (bin + 1)) - 1 END
      END) AS BIGINT) AS p99
FROM c GROUP BY source
ORDER BY source
""",
    tags=("textops", "sketch", "bench"),
)
def sketch_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.length("text").alias("len")
    )
    sk = hist_sketch(docs, "len", ["source"])
    return hist_quantiles(sk, group_cols=["source"]).select(
        "source",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("p50").cast("bigint").alias("p50"),
        F.col("p90").cast("bigint").alias("p90"),
        F.col("p99").cast("bigint").alias("p99"),
    )

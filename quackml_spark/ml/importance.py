"""Permutation feature importance over the deployed-model serve path.

The reference records per-model metrics but has no feature-attribution
surface; a production engine serving predict() needs one. Permutation
importance (Breiman 2001) is the model-agnostic standard: permute one
feature column, re-score, and read the metric degradation.

Scale shape:

* The permutation is EXACT and DETERMINISTIC — an md5-keyed
  order-preserving shard rank (two-phase: ≤``n_shards``-row offset
  collect + per-shard window, never a partition-less global window)
  pairs row ``i``-by-rank with value ``i``-by-an-independent-rank, i.e.
  a uniform pseudorandom derangement-in-expectation that replays
  bit-identically across engines, retries, and partition counts.
* Each feature costs one permuted-join pass + one distributed scoring
  pass; features are evaluated serially on the driver loop (k features
  → k Spark jobs), with the baseline scored once. All metric math is
  the engine's single-pass aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SHARD_BITS = 24  # 2^32 / 2^24 = 256 order-preserving shards


def _md5_rank(df: DataFrame, id_col: str, salt: str) -> DataFrame:
    """Attach ``__rank``: the global 1-based rank of md5(salt|id).

    Order-preserving two-phase rank: the top 8 bits of the 32-bit md5
    key give 256 range shards (key order == (shard, key) order), local
    row_number runs per shard, and the ≤256 shard counts collect into
    cumulative offsets — no global-orderBy window anywhere."""
    from quackml_spark.operators.text import md5_int32

    key = md5_int32(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    with_key = df.withColumn("__key", key).withColumn(
        "__shard", F.shiftright(F.col("__key"), _SHARD_BITS)
    )
    counts = sorted(
        (r["__shard"], r["n"])
        for r in with_key.groupBy("__shard").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = {}, 0
    for s, n in counts:
        offsets[s] = acc
        acc += n
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])[
        F.col("__shard")
    ]
    w = Window.partitionBy("__shard").orderBy("__key", id_col)
    return with_key.withColumn(
        "__rank", off + F.row_number().over(w)
    ).drop("__key", "__shard")


def permuted_column(
    df: DataFrame, col_name: str, id_col: str, seed: int = 0
) -> DataFrame:
    """Replace ``col_name`` with an exact deterministic permutation of
    itself (same multiset of values, md5-pseudorandom re-assignment to
    rows). Rows ranked by one salt meet values ranked by an independent
    salt via an equi-join on rank."""
    rows = _md5_rank(df, id_col, f"{seed}r")
    vals = _md5_rank(df.select(id_col, col_name), id_col, f"{seed}v").select(
        F.col("__rank").alias("__vrank"), F.col(col_name).alias("__vnew")
    )
    return (
        rows.join(vals, rows["__rank"] == vals["__vrank"])
        .drop("__rank", "__vrank", col_name)
        .withColumnRenamed("__vnew", col_name)
    )


def permutation_importance(
    df: DataFrame,
    project_name: str,
    label_col: str,
    feature_cols: list[str],
    catalog=None,
    metric: str = "rmse",
    id_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """(feature, baseline, permuted, importance) — metric degradation
    when each feature is independently permuted, scored through the
    project's DEPLOYED model (the same resolve path predict() uses).

    ``metric``: 'rmse' / 'mse' / 'mae' / 'r2' (regression) or
    'accuracy' (classification). Importance is oriented so bigger ==
    more important regardless of the metric's direction."""
    from quackml_spark.ml.metrics import regression_metrics
    from quackml_spark.ml.predict import predict

    spark = df.sparkSession
    if id_col is None:
        df = df.withColumn("__pi_id", F.monotonically_increasing_id())
        id_col = "__pi_id"
    df = df.persist()

    lower_is_better = metric in ("rmse", "mse", "mae")

    def _score(frame: DataFrame) -> float:
        scored = predict(frame, project_name, catalog)
        if metric == "accuracy":
            pred_col = (
                "prediction_label"
                if "prediction_label" in scored.columns
                else "prediction"
            )
            return float(
                scored.agg(
                    F.avg(
                        (
                            F.col(pred_col).cast("string")
                            == F.col(label_col).cast("string")
                        ).cast("double")
                    )
                ).collect()[0][0]
            )
        m = regression_metrics(scored, label_col=label_col)
        if metric not in m:
            raise ValueError(f"unknown metric {metric!r}")
        return float(m[metric])

    baseline = _score(df)
    rows = []
    for feat in feature_cols:
        permuted = _score(permuted_column(df, feat, id_col, seed))
        imp = (permuted - baseline) if lower_is_better else (baseline - permuted)
        rows.append((feat, baseline, permuted, imp))
    df.unpersist()
    return spark.createDataFrame(
        rows, "feature string, baseline double, permuted double, importance double"
    ).orderBy(F.desc("importance"), "feature")

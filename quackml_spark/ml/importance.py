"""Permutation feature importance over the deployed-model serve path.

The reference records per-model metrics but has no feature-attribution
surface; a production engine serving predict() needs one. Permutation
importance (Breiman 2001) is the model-agnostic standard: permute one
feature column, re-score, and read the metric degradation.

Scale shape:

* The permutation is EXACT and DETERMINISTIC, built from the engine's
  existing :func:`~quackml_spark.operators.text.shuffle_order`
  (md5-keyed two-phase sharded rank — never a partition-less global
  window): rows ranked under one seed meet rows ranked under an
  independent seed at the same position, yielding an id -> donor-id
  bijection that replays bit-identically across engines, retries, and
  partition counts.
* The donor mapping depends only on the id column, so
  :func:`permutation_importance` computes it ONCE and reuses it for
  every feature — k features cost k value-joins + k distributed
  scoring passes, not k rank pipelines. All metric math is the
  engine's single-pass aggregates.

Contract: ``id_col`` must be unique and non-null (the default path
generates ids with ``monotonically_increasing_id``); nulls are
rejected loudly rather than silently collapsing onto one rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from quackml_spark.session import local_rows

_METRICS = ("rmse", "mse", "mae", "r2", "accuracy")


def _donor_mapping(df: DataFrame, id_col: str, seed: int) -> DataFrame:
    """(id, donor id) bijection: the row at position p under seed-r
    receives the id at position p under seed-v."""
    from quackml_spark.operators.text import shuffle_order

    if df.where(F.col(id_col).isNull()).take(1):
        raise ValueError(
            f"permutation requires a non-null id column; {id_col!r} has NULLs"
        )
    ids = df.select(id_col)
    # Duplicate ids would collide on the md5 shuffle priority and then
    # fan out through the shuffle_pos + donor joins, silently inflating
    # row counts and biasing both metrics — enforce the documented
    # uniqueness contract loudly (one aggregate job, same cost class as
    # the null probe above).
    dup = ids.agg(
        (F.count(F.lit(1)) - F.countDistinct(id_col)).alias("d")
    ).first()["d"]
    if dup:
        raise ValueError(
            f"permutation requires a UNIQUE id column; {id_col!r} has "
            f"{dup} duplicated row(s)"
        )
    r = shuffle_order(ids, seed=f"{seed}r", id_col=id_col)
    v = shuffle_order(ids, seed=f"{seed}v", id_col=id_col).select(
        F.col("doc_id").alias("__donor"), "shuffle_pos"
    )
    return r.join(v, "shuffle_pos").select(
        F.col("doc_id").alias(id_col), "__donor"
    )


def _apply_permutation(
    df: DataFrame, mapping: DataFrame, col_name: str, id_col: str
) -> DataFrame:
    donor_vals = df.select(
        F.col(id_col).alias("__donor"), F.col(col_name).alias("__vnew")
    )
    return (
        df.drop(col_name)
        .join(mapping, id_col)
        .join(donor_vals, "__donor")
        .drop("__donor")
        .withColumnRenamed("__vnew", col_name)
    )


def permuted_column(
    df: DataFrame, col_name: str, id_col: str, seed: int = 0
) -> DataFrame:
    """Replace ``col_name`` with an exact deterministic permutation of
    itself (same multiset of values, md5-pseudorandom re-assignment to
    rows)."""
    return _apply_permutation(df, _donor_mapping(df, id_col, seed), col_name, id_col)


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

    if metric not in _METRICS:
        raise ValueError(f"unknown metric {metric!r}; one of {_METRICS}")
    spark = df.sparkSession
    if id_col is None:
        df = df.withColumn("__pi_id", F.monotonically_increasing_id())
        id_col = "__pi_id"
    df = df.persist()
    mapping = _donor_mapping(df, id_col, seed).persist()

    lower_is_better = metric in ("rmse", "mse", "mae")

    def _score(frame: DataFrame) -> float:
        scored = predict(frame, project_name, catalog)
        if metric == "accuracy":
            pred_col = (
                "prediction_label"
                if "prediction_label" in scored.columns
                else "prediction"
            )
            # NULL-safe equality: a NULL prediction (or label) must
            # count as WRONG, not drop out of the denominator — avg
            # skips NULLs, so a permutation that produced MORE NULL
            # predictions could raise measured accuracy and flip the
            # feature's importance sign (review catch)
            return float(
                scored.agg(
                    F.avg(
                        F.col(pred_col)
                        .cast("string")
                        .eqNullSafe(F.col(label_col).cast("string"))
                        .cast("double")
                    )
                ).collect()[0][0]
            )
        return float(regression_metrics(scored, label_col=label_col)[metric])

    baseline = _score(df)
    rows = []
    for feat in feature_cols:
        permuted = _score(_apply_permutation(df, mapping, feat, id_col))
        imp = (permuted - baseline) if lower_is_better else (baseline - permuted)
        rows.append((feat, baseline, permuted, imp))
    mapping.unpersist()
    df.unpersist()
    return local_rows(
        spark,
        rows,
        "feature string, baseline double, permuted double, importance double",
    ).orderBy(F.desc("importance"), "feature")

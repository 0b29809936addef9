"""Evaluation metrics — parity with the reference's inventory (§2.10).

Regression {r2, mae, mse, rmse}; classification {f1 (macro), f1_micro,
precision, recall, accuracy, mcc, roc_auc (binary), log_loss};
clustering {silhouette}; decomposition {cumulative_explained_variance}.

The confusion-matrix-derived metrics mirror metrics.rs:35-186: the
matrix is built distributed via groupBy(label, prediction).count() and
only the k×k cell counts come to the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(pred: DataFrame, label_col: str = "label", pred_col: str = "prediction"):
    rows = (
        pred.groupBy(
            F.col(label_col).cast("double").alias("y"),
            F.col(pred_col).cast("double").alias("p"),
        )
        .count()
        .collect()
    )
    classes = sorted({r["y"] for r in rows} | {r["p"] for r in rows})
    idx = {c: i for i, c in enumerate(classes)}
    k = len(classes)
    m = [[0] * k for _ in range(k)]
    for r in rows:
        m[idx[r["y"]]][idx[r["p"]]] += r["count"]
    return m, classes


def classification_metrics(
    pred: DataFrame, label_col: str = "label", pred_col: str = "prediction"
) -> dict:
    m, classes = confusion_matrix(pred, label_col, pred_col)
    k = len(classes)
    total = sum(sum(row) for row in m)
    tp = [m[i][i] for i in range(k)]
    fp = [sum(m[r][i] for r in range(k)) - m[i][i] for i in range(k)]
    fn = [sum(m[i][c] for c in range(k)) - m[i][i] for i in range(k)]

    def safe(n, d):
        return n / d if d else 0.0

    precisions = [safe(tp[i], tp[i] + fp[i]) for i in range(k)]
    recalls = [safe(tp[i], tp[i] + fn[i]) for i in range(k)]
    f1s = [safe(2 * p * r, p + r) for p, r in zip(precisions, recalls)]
    accuracy = safe(sum(tp), total)
    micro_p = safe(sum(tp), sum(tp) + sum(fp))
    micro_r = safe(sum(tp), sum(tp) + sum(fn))
    out = {
        "accuracy": accuracy,
        "f1": sum(f1s) / k if k else 0.0,  # macro (metrics.rs macro f1)
        "f1_micro": safe(2 * micro_p * micro_r, micro_p + micro_r),
        "precision": sum(precisions) / k if k else 0.0,
        "recall": sum(recalls) / k if k else 0.0,
    }
    # Matthews correlation coefficient (multiclass generalization)
    s = total
    c = sum(tp)
    t = [sum(m[i][j] for j in range(k)) for i in range(k)]  # actual per class
    p = [sum(m[i][j] for i in range(k)) for j in range(k)]  # predicted per class
    num = c * s - sum(ti * pi for ti, pi in zip(t, p))
    den = math.sqrt(s * s - sum(pi * pi for pi in p)) * math.sqrt(
        s * s - sum(ti * ti for ti in t)
    )
    out["mcc"] = num / den if den else 0.0
    return out


def binary_extra_metrics(
    pred: DataFrame, label_col: str = "label", prob_col: str = "probability_arr"
) -> dict:
    """roc_auc (trapezoidal, metrics.rs:221-253) + log_loss — binary only,
    computed from the positive-class probability."""
    out = {}
    if prob_col not in pred.columns:
        return out
    scored = pred.select(
        F.col(label_col).cast("double").alias("y"),
        F.col(prob_col)[1].cast("double").alias("s"),
    ).where(F.col("s").isNotNull())
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    tmp = scored.withColumnRenamed("s", "rawPrediction")
    ev = BinaryClassificationEvaluator(
        rawPredictionCol="rawPrediction", labelCol="y", metricName="areaUnderROC"
    )
    out["roc_auc"] = float(ev.evaluate(tmp))
    eps = 1e-15
    ll = scored.select(
        F.when(
            F.col("y") == 1.0,
            -F.log(F.greatest(F.col("s"), F.lit(eps))),
        )
        .otherwise(-F.log(F.greatest(1.0 - F.col("s"), F.lit(eps))))
        .alias("l")
    ).agg(F.avg("l")).collect()[0][0]
    out["log_loss"] = float(ll) if ll is not None else None
    return out


def regression_metrics(
    pred: DataFrame, label_col: str = "label", pred_col: str = "prediction"
) -> dict:
    # single pass: ss_tot via var_pop (Welford merge — stable) so the
    # model transform over the test split evaluates once, not twice
    agg = pred.select(
        F.col(label_col).cast("double").alias("y"),
        F.col(pred_col).cast("double").alias("p"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("y") - F.col("p")) ** 2).alias("ss_res"),
        F.avg(F.abs(F.col("y") - F.col("p"))).alias("mae"),
        F.var_pop("y").alias("vy"),
    ).collect()[0]
    ss_tot = (agg["vy"] or 0.0) * agg["n"] if agg["n"] else None
    mse = agg["ss_res"] / agg["n"] if agg["n"] else None
    return {
        "r2": 1.0 - agg["ss_res"] / ss_tot if ss_tot else 0.0,
        "mae": float(agg["mae"]) if agg["mae"] is not None else None,
        "mse": float(mse) if mse is not None else None,
        "rmse": math.sqrt(mse) if mse is not None else None,
    }


def clustering_metrics(pred: DataFrame, features_col: str = "features_vec") -> dict:
    from pyspark.ml.evaluation import ClusteringEvaluator

    ev = ClusteringEvaluator(featuresCol=features_col, predictionCol="prediction")
    return {"silhouette": float(ev.evaluate(pred))}

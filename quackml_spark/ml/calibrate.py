"""Probability calibration for served classifiers (isotonic / Platt).

The reference serves raw model probabilities (api.rs predict_proba);
production scoring pipelines calibrate them — a GBT's 0.9 is not a 90%
event rate. Two standard calibrators over a (probability, label)
validation frame:

* ``fit_isotonic`` — MLlib IsotonicRegression (distributed PAV):
  non-parametric monotone mapping, the standard choice with enough
  validation data;
* ``fit_platt`` — Platt scaling sigma(a*p + b), fit by the engine's
  numpy logistic machinery on driver-collected sufficient data? No —
  closed-form Newton iterations on the (p, y) AGGREGATES are not
  sufficient-statistics-expressible, so Platt here runs MLlib
  LogisticRegression on the single feature p (distributed, convex,
  deterministic).

Both return a PORTABLE dict (pure parameters) servable as column
expressions — streaming-legal, no model object in the serving path,
same portability contract as the snapshot preprocessing replay.
"""

from __future__ import annotations

from bisect import bisect_right

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from quackml_spark.session import local_rows


def fit_isotonic(
    scored: DataFrame,
    label_col: str = "label",
    proba_col: str = "probability",
    max_knots: int = 512,
) -> dict:
    """Distributed isotonic fit -> portable {boundaries, predictions}.

    MLlib's IsotonicRegression parallelizes pool-adjacent-violators.
    Post-PAV knot count scales with DISTINCT probability values (a GBT
    over 10^6 rows can emit thousands), so the knot arrays are
    downsampled to ``max_knots`` evenly-spaced knots (endpoints kept —
    monotonicity survives any subsequence) before collecting: the
    serving expression and driver state stay bounded whatever the
    validation-set cardinality."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    df = scored.select(
        F.col(proba_col).cast("double").alias("p"),
        F.col(label_col).cast("double").alias("y"),
    )
    va = VectorAssembler(inputCols=["p"], outputCol="features")
    iso = IsotonicRegression(labelCol="y", featuresCol="features")
    model = iso.fit(va.transform(df))
    bs = [float(x) for x in model.boundaries]
    ys = [float(x) for x in model.predictions]
    if len(bs) > max_knots:
        idx = sorted(
            {round(i * (len(bs) - 1) / (max_knots - 1)) for i in range(max_knots)}
        )
        bs = [bs[i] for i in idx]
        ys = [ys[i] for i in idx]
    return {"kind": "isotonic", "boundaries": bs, "predictions": ys}


def fit_platt(
    scored: DataFrame, label_col: str = "label", proba_col: str = "probability"
) -> dict:
    """Platt scaling: logistic regression on the single score feature
    (distributed, convex). Portable {a, b} for sigma(a*p + b)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    df = scored.select(
        F.col(proba_col).cast("double").alias("p"),
        F.col(label_col).cast("double").alias("y"),
    )
    va = VectorAssembler(inputCols=["p"], outputCol="features")
    lr = LogisticRegression(labelCol="y", featuresCol="features", regParam=0.0)
    model = lr.fit(va.transform(df))
    return {
        "kind": "platt",
        "a": float(model.coefficients[0]),
        "b": float(model.intercept),
    }


def calibrate_expr(calib: dict, proba_col: str = "probability") -> Column:
    """The calibrator as ONE column expression (pure literals — works
    in batch, streams, and any serve path with no model object).

    Isotonic serves MLlib's exact prediction semantics: linear
    interpolation between knots, clamped to the end knots outside the
    fitted range."""
    p = F.col(proba_col).cast("double")
    if calib["kind"] == "platt":
        return F.lit(1.0) / (
            F.lit(1.0) + F.exp(-(F.lit(calib["a"]) * p + F.lit(calib["b"])))
        )
    if calib["kind"] != "isotonic":
        raise ValueError(f"unknown calibrator kind {calib['kind']!r}")
    bs, ys = calib["boundaries"], calib["predictions"]
    if len(bs) == 1:
        return F.lit(ys[0])
    # piecewise-linear via ARRAY literals + a constant-size expression:
    # the knot count affects the literal arrays' length, never the
    # expression-tree depth (a per-knot nested CASE WHEN blows up
    # Catalyst analysis at a few thousand knots — code-review catch).
    # seg = #boundaries strictly below p, computed by one aggregate
    # fold over the boundary array.
    bs_arr = F.array(*[F.lit(b) for b in bs])
    ys_arr = F.array(*[F.lit(y) for y in ys])
    seg = F.aggregate(
        bs_arr,
        F.lit(0),
        lambda acc, b: acc + F.when(b < p, 1).otherwise(0),
    )
    i = F.greatest(F.least(seg, F.lit(len(bs) - 1)), F.lit(1))
    lo, hi = F.element_at(bs_arr, i), F.element_at(bs_arr, i + 1)
    ylo, yhi = F.element_at(ys_arr, i), F.element_at(ys_arr, i + 1)
    interp = F.when(hi == lo, yhi).otherwise(
        ylo + (p - lo) * (yhi - ylo) / (hi - lo)
    )
    return (
        F.when(p <= F.lit(bs[0]), F.lit(ys[0]))
        .when(p >= F.lit(bs[-1]), F.lit(ys[-1]))
        .otherwise(interp)
    )


def calibrate_py(calib: dict, p: float) -> float:
    """Pure-Python twin of calibrate_expr (test oracle + row serving)."""
    import math

    if calib["kind"] == "platt":
        return 1.0 / (1.0 + math.exp(-(calib["a"] * p + calib["b"])))
    bs, ys = calib["boundaries"], calib["predictions"]
    if len(bs) == 1:
        return ys[0]
    if p <= bs[0]:
        return ys[0]
    if p >= bs[-1]:
        return ys[-1]
    i = bisect_right(bs, p) - 1
    lo, hi, ylo, yhi = bs[i], bs[i + 1], ys[i], ys[i + 1]
    if hi == lo:
        return yhi
    return ylo + (p - lo) * (yhi - ylo) / (hi - lo)


def brier_score(
    scored: DataFrame, label_col: str = "label", proba_col: str = "probability"
) -> float:
    """Mean squared probability error — the calibration quality metric
    (one map-side-combined aggregate)."""
    return float(
        scored.agg(
            F.avg(
                (
                    F.col(proba_col).cast("double")
                    - F.col(label_col).cast("double")
                )
                ** 2
            )
        ).collect()[0][0]
    )


def split_conformal_radius(
    scored: DataFrame,
    label_col: str = "label",
    pred_col: str = "prediction",
    p_num: int = 9,
    p_den: int = 10,
    unit: int = 1_000_000,
) -> DataFrame:
    """Split-conformal interval radius from a CALIBRATION frame of
    (label, prediction) rows: the smallest r such that
    prediction ± r covers at least ceil((n+1) * p) of n calibration
    residuals — the finite-sample distribution-free coverage
    guarantee (Vovk et al.; Lei et al. 2018's split variant). New
    predictions then ship [prediction - r, prediction + r] with
    >= p coverage under exchangeability, whatever the model.

    Returns ONE row (n_cal, rank, radius) with the radius in integer
    ``unit``ths of a label unit (ppm by default): residuals are
    rounded to the unit grid BEFORE ranking, so the selected order
    statistic is an exact integer — reproducible across engines and
    aggregation orders (the engine-wide integer-exactness discipline).

    Scale shape: |label - pred| is map-side; the rank selection is
    exact_quantiles' iterative histogram selection — no sort, no
    shuffle of values, <= 4096-row collects per round. NULL labels or
    predictions are excluded from n."""
    from quackml_spark.operators.profile import exact_quantiles

    resid = scored.select(
        F.round(
            F.abs(
                F.col(label_col).cast("double")
                - F.col(pred_col).cast("double")
            )
            * unit,
            0,
        )
        .cast("bigint")
        .alias("resid")
    ).where(F.col("resid").isNotNull())
    resid = resid.localCheckpoint(eager=True)
    n = int(resid.count())
    spark = scored.sparkSession
    if n == 0:
        return local_rows(
            spark, [], "n_cal bigint, rank bigint, radius bigint"
        )
    # conformal rank: ceil((n+1) * p), clamped to n (the +1 is the
    # finite-sample correction; with it coverage >= p holds exactly,
    # not just asymptotically)
    rank = min((p_num * (n + 1) + p_den - 1) // p_den, n)
    # exact_quantiles selects rank ceil(k/n * n) == k for ps=(rank, n)
    row = exact_quantiles(resid, "resid", ps=((rank, n),)).first()
    return local_rows(
        spark,
        [(n, rank, int(row["value"]))],
        "n_cal bigint, rank bigint, radius bigint",
    )

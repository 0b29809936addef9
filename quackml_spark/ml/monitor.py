"""Model monitoring: feature-drift detection between serving windows.

The reference has no monitoring surface; a production engine needs one
— a deployed model's inputs drift, and the catalog's deployment
lifecycle (deploy/rollback) is only actionable with a drift signal.

``feature_drift_psi`` computes the Population Stability Index per
feature between a reference window and a current window:

    PSI = Σ_bins (cur% − ref%) · ln(cur% / ref%)

over ``n_bins`` equal-width bins spanning the combined min/max, with
the standard 1e-6 floor on empty-bin rates. Rule of thumb: <0.1 stable,
0.1–0.25 moderate drift, >0.25 action.

Scale shape: one min/max aggregate + one bucketize+groupBy per call —
two map-side-combined passes over the serving log, no window, no
collect beyond the tiny per-bin counts. Works identically as a batch
audit or a foreachBatch hook on a scoring stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPS = 1e-6


def feature_drift_psi(
    df: DataFrame,
    features: list[str],
    window_col: Column,
    n_bins: int = 10,
) -> DataFrame:
    """PSI per feature between window_col==false (reference) and
    window_col==true (current). Returns (feature, psi, n_bins)."""
    out = None
    win = window_col.cast("int")
    for feat in features:
        v = F.col(feat).cast("double")
        span = df.agg(
            F.min(v).alias("lo"), F.max(v).alias("hi")
        ).collect()[0]
        lo, hi = float(span["lo"]), float(span["hi"])
        width = (hi - lo) / n_bins or 1.0
        bin_expr = F.least(
            F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"),
            F.lit(n_bins - 1),
        )
        counts = (
            df.select(win.alias("win"), bin_expr.alias("bin"))
            .groupBy("bin")
            .agg(
                F.sum(F.when(F.col("win") == 0, 1).otherwise(0)).alias("ref_n"),
                F.sum(F.when(F.col("win") == 1, 1).otherwise(0)).alias("cur_n"),
            )
        )
        tot = counts.agg(
            F.sum("ref_n").alias("ref_t"), F.sum("cur_n").alias("cur_t")
        ).collect()[0]
        r = F.greatest(F.col("ref_n") / F.lit(float(tot["ref_t"])), F.lit(EPS))
        c = F.greatest(F.col("cur_n") / F.lit(float(tot["cur_t"])), F.lit(EPS))
        psi = counts.agg(
            F.round(F.sum((c - r) * F.log(c / r)), 6).alias("psi"),
            F.count(F.lit(1)).alias("nb"),
        ).collect()[0]
        row = df.sparkSession.createDataFrame(
            [(feat, float(psi["psi"]), int(psi["nb"]))],
            "feature string, psi double, n_bins bigint",
        )
        out = row if out is None else out.unionByName(row)
    return out


def feature_drift_ks(
    df: DataFrame,
    feature: str,
    window_col: Column,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    reference (window_col==false) and current (window_col==true)
    windows: max |F_ref(v) − F_cur(v)| over observed values.

    Scale shape: groupBy(value) first (map-side combine shrinks the
    relation to |distinct values| rows), THEN the CDF window runs over
    that small grouped relation — so the single ordering window never
    sees raw data. For high-cardinality continuous features, bin first
    (PSI's equal-width binning); KS over binned values is the discrete
    KS of the binned distributions."""
    v = F.col(feature).cast("double")
    win = window_col.cast("int")
    counts = (
        df.select(v.alias("v"), win.alias("win"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("win") == 0, 1).otherwise(0)).alias("ref_n"),
            F.sum(F.when(F.col("win") == 1, 1).otherwise(0)).alias("cur_n"),
        )
    )
    tot = counts.agg(
        F.sum("ref_n").alias("rt"), F.sum("cur_n").alias("ct")
    ).collect()[0]
    from pyspark.sql import Window as W

    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cdfs = counts.select(
        "v",
        (F.sum("ref_n").over(w) / F.lit(float(tot["rt"]))).alias("ref_cdf"),
        (F.sum("cur_n").over(w) / F.lit(float(tot["ct"]))).alias("cur_cdf"),
    )
    return cdfs.agg(
        F.lit(feature).alias("feature"),
        F.round(F.max(F.abs(F.col("ref_cdf") - F.col("cur_cdf"))), 6).alias("ks"),
    )

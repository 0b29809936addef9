"""Leakage-safe (out-of-fold) target encoding.

The snapshot's `encode='target'` (core/preprocess.py) is the
reference-parity whole-train-set mean — standard, but it leaks each
row's own label into its feature. The CV-safe variant every serious
tabular pipeline uses encodes each row by the target mean computed on
the OTHER folds only.

Scale shape: ONE exact-decimal sufficient-stats pass grouped by
(category, fold), category totals re-aggregated from those partials
(never a second scan), leave-one-fold-out means by exact decimal
subtraction, and one join back onto the facts keyed (category, fold) —
the encode table is |categories| x |folds| rows, so AQE broadcasts it
when small and shuffles both sides on the composite key when the
category space is web-scale. Categories unseen outside a row's fold
fall back to that fold's leave-out GLOBAL mean (deterministic, no
NULL encodings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    y_col: str,
    fold_col: str,
    out_col: str = "te",
    y_decimal: str = "decimal(18,6)",
) -> DataFrame:
    """Adds ``out_col``: the leave-one-fold-out mean of ``y_col`` per
    ``cat_col`` (global leave-out mean when the category has no rows
    outside the row's fold). Sums are exact DECIMAL, so the encoding is
    partitioning-independent; the final mean is one double division."""
    dy = F.col(y_col).cast(y_decimal)
    cf = df.groupBy(cat_col, fold_col).agg(
        F.count(F.lit(1)).alias("__n"), F.sum(dy).alias("__s")
    )
    ct = cf.groupBy(cat_col).agg(
        F.sum("__n").alias("__tn"), F.sum("__s").alias("__ts")
    )
    gf = df.groupBy(fold_col).agg(
        F.count(F.lit(1)).alias("__gn"), F.sum(dy).alias("__gs")
    )
    gt = gf.agg(F.sum("__gn").alias("__an"), F.sum("__gs").alias("__as")).first()
    enc = (
        cf.join(ct, cat_col)
        .join(gf, fold_col)
        .select(
            cat_col,
            fold_col,
            F.when(
                (F.col("__tn") - F.col("__n")) > 0,
                (F.col("__ts") - F.col("__s")).cast("double")
                / (F.col("__tn") - F.col("__n")).cast("double"),
            )
            .otherwise(
                (F.lit(gt["__as"]) - F.col("__gs")).cast("double")
                / (F.lit(gt["__an"]) - F.col("__gn")).cast("double")
            )
            .alias(out_col),
        )
    )
    return df.join(enc, [cat_col, fold_col])

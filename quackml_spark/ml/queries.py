"""ML lifecycle queries for the driver's correctness gate.

train/predict are not ANSI-SQL-expressible, so these register without
oracles (the driver records rows-only checks); the SQL-expressible core
of linear regression IS oracle-checked separately (q11_ols_closed_form).
Each query builds a throwaway warehouse so repeated driver runs are
idempotent.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackml_spark.plans import register
from quackml_spark.sources import load_table


def _fresh_catalog():
    from quackml_spark.catalog import Catalog

    return Catalog(warehouse=tempfile.mkdtemp(prefix="qml_wh_"))


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
    return spark.createDataFrame(
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
    return spark.createDataFrame(
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
    doc="kmeans over the 64-dim embeddings table; the oracle pins the "
    "deterministic facts — exactly k=5 clusters exist and every one is "
    "non-empty on this data.",
    oracle="""
SELECT CAST(range AS INT) AS cluster, true AS nonempty
FROM range(5) ORDER BY cluster
""",
    tags=("ml",),
)
def ml_clustering_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict, train

    catalog = _fresh_catalog()
    df = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    train(
        spark,
        "emb clusters",
        task="clustering",
        df=df.select("embedding"),
        catalog=catalog,
        hyperparams={"k": 5},
        test_size=0.2,
    )
    out = predict(df, "emb clusters", catalog=catalog)
    return (
        out.groupBy(F.col("prediction").cast("int").alias("cluster"))
        .agg((F.count(F.lit(1)) > 0).alias("nonempty"))
        .orderBy("cluster")
    )


@register(
    "ml_decomposition_embeddings",
    doc="PCA over embeddings: decompose() to 8 components "
    "(model.rs:988-993); width per input vector is deterministic, so "
    "the oracle derives the expected rows from the embeddings table.",
    oracle="""
SELECT vec_id, CAST(8 AS INT) AS n_components
FROM embeddings WHERE vec_id < 50 ORDER BY vec_id
""",
    tags=("ml",),
)
def ml_decomposition_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import decompose, train

    catalog = _fresh_catalog()
    df = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    train(
        spark,
        "emb pca",
        task="decomposition",
        df=df.select("embedding"),
        catalog=catalog,
        hyperparams={"n_components": 8},
        test_size=0.2,
    )
    out = decompose(df.where(F.col("vec_id") < 50), "emb pca", catalog=catalog)
    return out.select(
        "vec_id", F.size("decomposition").alias("n_components")
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
    return spark.createDataFrame(
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
    return spark.createDataFrame(
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


def json_dumps(obj) -> str:
    import json

    return json.dumps(obj, sort_keys=True)


@register(
    "ml_train_gbt",
    doc="tree-family lifecycle: GBT regression (distributed MLlib fit) "
    "+ DataFrame-path serving — trees have no portable dump, so this "
    "exercises the MLlib transform serve path (model.rs:370-448 "
    "gradient_boosting arm). Deterministic outcome row -> constant "
    "ground-truth oracle.",
    oracle="""
SELECT 'gradient_boosting_trees' AS algorithm, true AS has_r2,
       CAST(200 AS INT) AS n_scored
""",
    tags=("ml",),
)
def ml_train_gbt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict, train

    catalog = _fresh_catalog()
    df = _lineitem_training_df(spark, sf_dir).drop("l_returnflag").limit(8000)
    res = train(
        spark,
        "bench gbt",
        task="regression",
        df=df,
        y_column_name="l_extendedprice",
        algorithm="gradient_boosting_trees",
        hyperparams={"maxIter": 5, "maxDepth": 3},
        catalog=catalog,
        test_sampling="random",
    )
    out = predict(df.limit(200), "bench gbt", catalog=catalog)
    return spark.createDataFrame(
        [
            (
                res.algorithm,
                "r2" in res.metrics,
                int(out.where(F.col("prediction").isNotNull()).count()),
            )
        ],
        "algorithm string, has_r2 boolean, n_scored int",
    )


@register(
    "ml_predict_joint",
    doc="joint (multi-target) regression: one submodel per target, "
    "predictions packed as array<double> (model.rs:967-979). "
    "Deterministic shape row -> constant ground-truth oracle.",
    oracle="""
SELECT CAST(2 AS INT) AS n_targets, CAST(100 AS BIGINT) AS n_rows
""",
    tags=("ml",),
)
def ml_predict_joint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict_joint, train

    catalog = _fresh_catalog()
    df = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_tax", "l_extendedprice"
    ).limit(4000)
    train(
        spark,
        "joint reg",
        task="regression",
        df=df,
        y_column_name=["l_extendedprice", "l_tax"],
        catalog=catalog,
        test_sampling="random",
    )
    out = predict_joint(df.limit(100), "joint reg", catalog=catalog)
    return (
        out.select(F.size("predictions").alias("n_targets"))
        .groupBy("n_targets")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


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
    return spark.createDataFrame(
        [
            (
                round(float(trained.portable["coef"][0]), 4),
                round(float(trained.portable["intercept"]), 4),
            )
        ],
        "slope double, intercept double",
    )

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
    doc="train(regression, linear) end-to-end: snapshot -> fit -> metrics "
    "-> deploy; returns the reference's train() output row shape "
    "(api.rs:364-376).",
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
    doc="predict() on the deployed model — serve-time preprocessing "
    "replay + distributed transform (api.rs:801-854).",
    tags=("ml",),
)
def ml_predict_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict, train

    catalog = _fresh_catalog()
    df = _lineitem_training_df(spark, sf_dir).drop("l_returnflag")
    train(
        spark,
        "pred regression",
        task="regression",
        df=df,
        y_column_name="l_extendedprice",
        catalog=catalog,
        test_sampling="random",
    )
    out = predict(df.limit(100), "pred regression", catalog=catalog)
    return out.select(
        F.col("l_quantity"),
        F.col("l_discount"),
        F.col("prediction").isNotNull().alias("has_prediction"),
    )


@register(
    "ml_train_classification",
    doc="train(classification) on a categorical label with stratified "
    "sampling; returns macro-f1 presence (api.rs:2979-3017 shape).",
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
    doc="kmeans over the 64-dim embeddings table; returns cluster sizes.",
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
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cluster")
    )


@register(
    "ml_decomposition_embeddings",
    doc="PCA over embeddings: decompose() to 8 components "
    "(model.rs:988-993).",
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
    out = decompose(df.limit(50), "emb pca", catalog=catalog)
    return out.select(
        "vec_id", F.size("decomposition").alias("n_components")
    ).orderBy("vec_id")


@register(
    "ml_deploy_lifecycle",
    doc="two models -> best_score/most_recent/rollback deploy strategies "
    "(api.rs:695-799); returns the deployments ledger.",
    tags=("ml",),
)
def ml_deploy_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import deploy, train

    catalog = _fresh_catalog()
    df = _lineitem_training_df(spark, sf_dir).drop("l_returnflag").limit(5000)
    for algo in ("linear", "ridge"):
        train(
            spark,
            "lifecycle",
            task="regression",
            df=df,
            y_column_name="l_extendedprice",
            algorithm=algo,
            catalog=catalog,
            test_sampling="random",
        )
    deploy("lifecycle", "best_score", catalog=catalog)
    deploy("lifecycle", "most_recent", catalog=catalog)
    deploy("lifecycle", "rollback", catalog=catalog)
    deps = catalog.read("deployments")
    return spark.createDataFrame(
        [(int(r["id"]), r["strategy"]) for _, r in deps.iterrows()],
        "deployment_id long, strategy string",
    )


@register(
    "ml_search_grid",
    doc="grid search + 3-fold CV over regParam (model.rs:454-506, "
    ":747-763); returns per-combination mean CV scores from the "
    "sklearn-style search_results payload (model.rs:768-872).",
    tags=("ml",),
)
def ml_search_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import train

    df = _lineitem_training_df(spark, sf_dir).drop("l_returnflag").limit(4000)
    res = train(
        spark,
        "bench search",
        task="regression",
        df=df,
        y_column_name="l_extendedprice",
        catalog=_fresh_catalog(),
        test_sampling="random",
        search="grid",
        search_params={"regParam": [0.0, 0.1]},
        search_args={"cv": 3},
    )
    sr = res.metrics["search_results"]
    rows = [
        (i, json_dumps(p), float(s))
        for i, (p, s) in enumerate(zip(sr["params"], sr["mean_test_score"]))
    ]
    return spark.createDataFrame(
        rows, "combo_id long, params string, mean_test_score double"
    )


@register(
    "ml_predict_proba",
    doc="predict_proba(): full per-class probability vector — consciously "
    "fixes the reference's truncation to class 0 (api.rs:894-898).",
    tags=("ml",),
)
def ml_predict_proba(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackml_spark.ml import predict_proba, train

    catalog = _fresh_catalog()
    df = _lineitem_training_df(spark, sf_dir).limit(4000)
    train(
        spark,
        "proba clf",
        task="classification",
        df=df,
        y_column_name="l_returnflag",
        catalog=catalog,
    )
    out = predict_proba(df.limit(100), "proba clf", catalog=catalog)
    return out.select(
        F.size("probability_arr").alias("n_classes"),
        (F.abs(F.aggregate("probability_arr", F.lit(0.0), lambda a, x: a + x) - 1.0) < 1e-6).alias("sums_to_one"),
    ).groupBy("n_classes", "sums_to_one").agg(F.count(F.lit(1)).alias("n_rows"))


def json_dumps(obj) -> str:
    import json

    return json.dumps(obj, sort_keys=True)


@register(
    "ml_train_gbt",
    doc="tree-family lifecycle: GBT regression (distributed MLlib fit) "
    "+ DataFrame-path serving — trees have no portable dump, so this "
    "exercises the MLlib transform serve path (model.rs:370-448 "
    "gradient_boosting arm).",
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
    "predictions packed as array<double> (model.rs:967-979).",
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

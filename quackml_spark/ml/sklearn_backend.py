"""sklearn long-tail backend — driver-side fit, distributed serving.

The reference runs EVERY algorithm single-node (sklearn via PyO3,
src/bindings/sklearn/mod.rs:132-179); its task x algorithm inventory is
_ALGORITHM_MAP (src/bindings/sklearn/sklearn.py:37-99). This module
mirrors that inventory for the algorithms MLlib lacks:

  * fit: collect the (already distributively-preprocessed) feature
    matrix to the driver under an explicit row budget — same fidelity
    as the reference, which materializes the whole training relation
    in memory (snapshot.rs:1254-1473) — and fit the sklearn estimator.
  * serve: the pickled model ships to executors inside a pandas-UDF
    closure; inference is Arrow-batched and fully distributed.

Everything is import-gated: without sklearn installed, resolve() raises
the actionable error instead. Clusterers without a predict() method
(dbscan/optics/spectral*/feature_agglomeration) are unmapped HERE —
they are unreachable in the reference's dispatch (model.rs:435-441
todo!) — but the numpy backend implements them anyway (numpy_backend.py
"reference-unreachable seven"), so they execute in this container.
"""

from __future__ import annotations

import importlib
import inspect
import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from quackml_spark.catalog import Algorithm, Task

# (task, algorithm) -> "module:Class", mirroring sklearn.py:37-99.
SKLEARN_MAP: dict[tuple[Task, Algorithm], str] = {
    (Task.regression, Algorithm.least_angle): "sklearn.linear_model:Lars",
    (Task.regression, Algorithm.lasso_least_angle): "sklearn.linear_model:LassoLars",
    (Task.regression, Algorithm.orthogonal_matching_pursuit): "sklearn.linear_model:OrthogonalMatchingPursuit",
    (Task.regression, Algorithm.bayesian_ridge): "sklearn.linear_model:BayesianRidge",
    (Task.regression, Algorithm.automatic_relevance_determination): "sklearn.linear_model:ARDRegression",
    (Task.regression, Algorithm.stochastic_gradient_descent): "sklearn.linear_model:SGDRegressor",
    (Task.regression, Algorithm.passive_aggressive): "sklearn.linear_model:PassiveAggressiveRegressor",
    (Task.regression, Algorithm.ransac): "sklearn.linear_model:RANSACRegressor",
    (Task.regression, Algorithm.theil_sen): "sklearn.linear_model:TheilSenRegressor",
    (Task.regression, Algorithm.huber): "sklearn.linear_model:HuberRegressor",
    (Task.regression, Algorithm.quantile): "sklearn.linear_model:QuantileRegressor",
    (Task.regression, Algorithm.kernel_ridge): "sklearn.kernel_ridge:KernelRidge",
    (Task.regression, Algorithm.gaussian_process): "sklearn.gaussian_process:GaussianProcessRegressor",
    (Task.regression, Algorithm.svm): "sklearn.svm:SVR",
    (Task.regression, Algorithm.nu_svm): "sklearn.svm:NuSVR",
    (Task.regression, Algorithm.linear_svm): "sklearn.svm:LinearSVR",
    (Task.regression, Algorithm.ada_boost): "sklearn.ensemble:AdaBoostRegressor",
    (Task.regression, Algorithm.bagging): "sklearn.ensemble:BaggingRegressor",
    (Task.regression, Algorithm.xgboost): "xgboost:XGBRegressor",
    (Task.regression, Algorithm.xgboost_random_forest): "xgboost:XGBRFRegressor",
    (Task.regression, Algorithm.lightgbm): "lightgbm:LGBMRegressor",
    (Task.regression, Algorithm.catboost): "catboost:CatBoostRegressor",
    (Task.classification, Algorithm.ridge): "sklearn.linear_model:RidgeClassifier",
    (Task.classification, Algorithm.stochastic_gradient_descent): "sklearn.linear_model:SGDClassifier",
    (Task.classification, Algorithm.perceptron): "sklearn.linear_model:Perceptron",
    (Task.classification, Algorithm.passive_aggressive): "sklearn.linear_model:PassiveAggressiveClassifier",
    (Task.classification, Algorithm.gaussian_process): "sklearn.gaussian_process:GaussianProcessClassifier",
    (Task.classification, Algorithm.svm): "sklearn.svm:SVC",
    (Task.classification, Algorithm.nu_svm): "sklearn.svm:NuSVC",
    (Task.classification, Algorithm.ada_boost): "sklearn.ensemble:AdaBoostClassifier",
    (Task.classification, Algorithm.bagging): "sklearn.ensemble:BaggingClassifier",
    (Task.classification, Algorithm.xgboost): "xgboost:XGBClassifier",
    (Task.classification, Algorithm.xgboost_random_forest): "xgboost:XGBRFClassifier",
    (Task.classification, Algorithm.lightgbm): "lightgbm:LGBMClassifier",
    (Task.classification, Algorithm.catboost): "catboost:CatBoostClassifier",
    (Task.clustering, Algorithm.affinity_propagation): "sklearn.cluster:AffinityPropagation",
    (Task.clustering, Algorithm.birch): "sklearn.cluster:Birch",
    (Task.clustering, Algorithm.mean_shift): "sklearn.cluster:MeanShift",
    (Task.clustering, Algorithm.mini_batch_kmeans): "sklearn.cluster:MiniBatchKMeans",
}

ROW_BUDGET = int(os.environ.get("QML_SKLEARN_ROW_BUDGET", "2000000"))


def class_for(task: Task, algorithm: Algorithm):
    """Import and return the mapped class (raises ImportError if the
    backing library is absent)."""
    spec = SKLEARN_MAP[(task, algorithm)]
    module, name = spec.split(":")
    return getattr(importlib.import_module(module), name)


def available(task: Task, algorithm: Algorithm) -> bool:
    if (task, algorithm) not in SKLEARN_MAP:
        return False
    try:
        class_for(task, algorithm)
        return True
    except ImportError:
        return False


class SklearnEstimator:
    """MLlib-shaped estimator: .fit(df with features/label) -> model."""

    def __init__(self, task: Task, algorithm: Algorithm, hyperparams: dict, seed: int):
        self.task = task
        self.algorithm = algorithm
        self.hyperparams = dict(hyperparams or {})
        self.seed = seed

    def fit(self, df: DataFrame) -> "SklearnModel":
        n = df.count()
        if n > ROW_BUDGET:
            raise ValueError(
                f"sklearn backend fits on the driver; {n} rows exceed the "
                f"QML_SKLEARN_ROW_BUDGET ({ROW_BUDGET}). Sample the relation "
                f"(test_size / materialized snapshot) or use a distributed "
                f"MLlib algorithm instead."
            )
        cols = ["features"] + (["label"] if "label" in df.columns else [])
        pdf = df.select(*cols).toPandas()
        X = np.array(pdf["features"].tolist(), dtype="float64")
        cls = class_for(self.task, self.algorithm)
        params = dict(self.hyperparams)
        # seeded determinism when supported and not user-set
        if "random_state" not in params:
            try:
                if "random_state" in inspect.signature(cls.__init__).parameters:
                    params["random_state"] = self.seed
            except (TypeError, ValueError):
                pass
        est = cls(**params)
        if self.task in (Task.regression, Task.classification):
            est.fit(X, pdf["label"].to_numpy(dtype="float64"))
        else:
            est.fit(X)
        return SklearnModel(self.task, est)


class SklearnModel:
    """MLlib-shaped model: .transform(df) adds prediction columns via an
    Arrow-batched pandas UDF (the model rides in the UDF closure)."""

    def __init__(self, task: Task, model):
        self.task = task
        self.model = model

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F
        from pyspark.sql.types import ArrayType, DoubleType

        model = self.model
        has_proba = hasattr(model, "predict_proba")
        is_decomp = self.task == Task.decomposition

        @F.pandas_udf(DoubleType())
        def _pred(feats: pd.Series) -> pd.Series:
            X = np.array(feats.tolist(), dtype="float64")
            return pd.Series(model.predict(X).astype("float64"))

        if is_decomp:

            @F.pandas_udf(ArrayType(DoubleType()))
            def _decomp(feats: pd.Series) -> pd.Series:
                X = np.array(feats.tolist(), dtype="float64")
                return pd.Series([list(map(float, r)) for r in model.transform(X)])

            return df.withColumn("decomposition", _decomp(F.col("features")))

        out = df.withColumn("prediction", _pred(F.col("features")))
        if has_proba:

            @F.pandas_udf(ArrayType(DoubleType()))
            def _proba(feats: pd.Series) -> pd.Series:
                X = np.array(feats.tolist(), dtype="float64")
                return pd.Series([list(map(float, r)) for r in model.predict_proba(X)])

            out = out.withColumn("probability_arr", _proba(F.col("features")))
        return out

    # -- persistence hooks used by TrainedModel ------------------------
    def save_pickle(self, path: str) -> None:
        from pyspark import cloudpickle

        with open(path, "wb") as f:
            cloudpickle.dump({"task": self.task.value, "model": self.model}, f)

    @classmethod
    def load_pickle(cls, path: str) -> "SklearnModel":
        from pyspark import cloudpickle

        with open(path, "rb") as f:
            d = cloudpickle.load(f)
        return cls(Task(d["task"]), d["model"])

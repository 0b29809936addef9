"""TrainedModel: a fitted estimator + its serving/persistence contract.

Parity with the reference's Model (orm/model.rs): the fitted estimator is
persisted to the warehouse (MLlib's native save — the analog of the
serialized-bytes rows in quackml.files, model.rs:877-894) together with a
meta.json carrying task/algorithm/backend and, for linear-family models, a
**portable** parameter dump (coefficients/centers/components). The
portable dump is what the SQL-callable predict UDF evaluates on executors
— MLlib models only run driver-side via transform(), so the UDF path
needs plain numpy-evaluable weights.
"""

from __future__ import annotations

import importlib
import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from quackml_spark.catalog import Task


def _extract_portable(spark_model: Any) -> dict | None:
    name = type(spark_model).__name__
    if name == "NumpyModel":
        return spark_model.portable
    try:
        if name == "LinearRegressionModel":
            return {
                "kind": "linear_regression",
                "coef": list(spark_model.coefficients.toArray().tolist()),
                "intercept": float(spark_model.intercept),
            }
        if name == "LogisticRegressionModel":
            return {
                "kind": "logistic_regression",
                "coef": [list(row) for row in spark_model.coefficientMatrix.toArray().tolist()],
                "intercept": list(spark_model.interceptVector.toArray().tolist()),
                "num_classes": int(spark_model.numClasses),
            }
        if name == "LinearSVCModel":
            return {
                "kind": "linear_svc",
                "coef": list(spark_model.coefficients.toArray().tolist()),
                "intercept": float(spark_model.intercept),
            }
        if name == "KMeansModel":
            return {
                "kind": "kmeans",
                "centers": [list(c.tolist()) for c in spark_model.clusterCenters()],
            }
        if name == "PCAModel":
            return {
                "kind": "pca",
                "components": [list(r) for r in spark_model.pc.toArray().tolist()],
                "explained_variance": list(
                    spark_model.explainedVariance.toArray().tolist()
                ),
            }
    except Exception:
        return None
    return None


@dataclass
class TrainedModel:
    task: Task
    algorithm: str
    backend: str
    spark_model: Any  # one fitted model, or a list for joint regression
    portable: dict | None = None
    meta: dict = field(default_factory=dict)

    @property
    def is_joint(self) -> bool:
        return isinstance(self.spark_model, list)

    def transform(self, df: DataFrame) -> DataFrame:
        """df must carry ``features_vec``; returns predictions with
        normalized columns (prediction double / probability_arr array /
        predictions array for joint regression)."""
        from pyspark.sql import functions as F

        from pyspark.ml.functions import vector_to_array

        if self.is_joint:
            # multi-target regression (predict_joint, model.rs:967-979):
            # one submodel per target, outputs packed into an array.
            names = []
            for i, sub in enumerate(self.spark_model):
                df = (
                    sub.transform(df)
                    .withColumnRenamed("prediction", f"__qml_pred_{i}")
                )
                names.append(f"__qml_pred_{i}")
            df = df.withColumn("predictions", F.array(*[F.col(n) for n in names]))
            return df.drop(*names)
        out = self.spark_model.transform(df)
        if "probability" in out.columns:
            out = out.withColumn("probability_arr", vector_to_array("probability"))
        if "pca_features" in out.columns:
            out = out.withColumn("decomposition", vector_to_array("pca_features"))
        return out

    # -- persistence --------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        classes = None
        if self.is_joint:
            classes = []
            for i, sub in enumerate(self.spark_model):
                sub.write().overwrite().save(os.path.join(path, f"mllib_{i}"))
                c = type(sub)
                classes.append(f"{c.__module__}:{c.__name__}")
            model_class = None
        elif self.backend == "sklearn":
            # pickled estimator (the reference stores pickle bytes in
            # quackml.files, sklearn.py:200-209 / model.rs:877-894)
            self.spark_model.save_pickle(os.path.join(path, "sklearn.pkl"))
            model_class = "sklearn"
        elif self.backend.startswith("numpy"):
            # plain-JSON parameter dump — no pickle needed for numpy models
            self.spark_model.save_json(os.path.join(path, "numpy.json"))
            model_class = "numpy"
        else:
            self.spark_model.write().overwrite().save(os.path.join(path, "mllib"))
            c = type(self.spark_model)
            model_class = f"{c.__module__}:{c.__name__}"
        meta = {
            "task": self.task.value,
            "algorithm": self.algorithm,
            "backend": self.backend,
            "model_class": model_class,
            "joint_classes": classes,
            "portable": self.portable,
            **self.meta,
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "TrainedModel":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)

        def _load_one(spec: str, sub: str):
            module, name = spec.split(":")
            model_cls = getattr(importlib.import_module(module), name)
            return model_cls.load(os.path.join(path, sub))

        if meta.get("joint_classes"):
            spark_model: Any = [
                _load_one(spec, f"mllib_{i}")
                for i, spec in enumerate(meta["joint_classes"])
            ]
        elif meta.get("model_class") == "sklearn":
            from quackml_spark.ml.sklearn_backend import SklearnModel

            spark_model = SklearnModel.load_pickle(os.path.join(path, "sklearn.pkl"))
        elif meta.get("model_class") == "numpy":
            from quackml_spark.ml.numpy_backend import NumpyModel

            spark_model = NumpyModel.load_json(os.path.join(path, "numpy.json"))
        else:
            spark_model = _load_one(meta["model_class"], "mllib")
        reserved = {
            "task", "algorithm", "backend", "model_class", "joint_classes", "portable",
        }
        return cls(
            task=Task(meta["task"]),
            algorithm=meta["algorithm"],
            backend=meta["backend"],
            spark_model=spark_model,
            portable=meta.get("portable"),
            meta={k: v for k, v in meta.items() if k not in reserved},
        )
